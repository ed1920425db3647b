"""In-circuit verifier: the aggregation circuit verifies a real inner proof.

The reference's headline milestone ("a circuit that can check if a proof is
valid using vk", README.md:5): build the simple-example inner proof, run
the full in-circuit verifier over it, and check (a) the in-circuit quad
equals the native verifier's (e, f, w, zw) bit-exactly, and (b) all
constraints hold (MockProver, full or sampled via H2A_FULL_MOCK)."""

import os

import pytest

from halo2_aggregation_tpu.models import simple_example as se
from halo2_aggregation_tpu.models import aggregation_circuit as ac
from halo2_aggregation_tpu.plonk import kzg
from halo2_aggregation_tpu.plonk.keygen import keygen
from halo2_aggregation_tpu.plonk.prover import create_proof
from halo2_aggregation_tpu.plonk.verifier import verify_proof


@pytest.fixture(scope="module")
def inner_proof():
    k = 9
    params = kzg.setup(k)
    circuit = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=k)
    vk, pk = keygen(params, cs_e, asg_e)
    _, _, asg = se.build(circuit, k=k)
    pub = [circuit.public_output()]
    proof = create_proof(params, pk, asg, [pub], seed=42)
    ok, efw = verify_proof(params, vk, [pub], proof)
    assert ok
    inst_comm = params.commit_lagrange(pub)
    return params, vk, proof, pub, inst_comm, efw


@pytest.mark.slow
def test_in_circuit_verifier_quad_matches(inner_proof):
    """Witness-level first: the in-circuit computation reproduces the
    native verifier's quad exactly (the reference's `debug`-feature
    diff, SURVEY.md §4), on a full-width (254-bit mul) synthesis."""
    params, vk, proof, pub, inst_comm, efw = inner_proof
    outer_k = 23
    circuit = ac.SingleProofCircuit(vk, proof)
    public_inputs = circuit.public_inputs(inst_comm, efw)
    cs, cfg, asg, ctx, quad = ac.build(circuit, outer_k, public_inputs)
    got = [quad.e.value(), quad.f.value(), quad.w.value(), quad.zw.value()]
    assert got == list(efw), "in-circuit quad != native verifier quad"
    print(f"rows used: {ctx.offset} (k={outer_k} capacity {1 << outer_k})")
    assert ctx.offset <= cs.usable_rows(1 << outer_k)

    # Full constraint check is default-on for the slow suite (the single
    # most important correctness property of the in-circuit verifier);
    # H2A_FULL_MOCK=0 opts out for quick local iteration.
    if os.environ.get("H2A_FULL_MOCK", "1") == "1":
        from halo2_aggregation_tpu.plonk.mock import mock_verify_fast

        failures = mock_verify_fast(cs, asg)
        assert failures == [], failures[:5]
