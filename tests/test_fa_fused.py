"""Fused field-algebra kernel body vs the XLA path (bit-exact).

The pallas_call itself only runs on the real chip (bench.py gates the
production step's quad against the host verifier, which flows through
it); here the IDENTICAL body runs as plain jnp ops
(`field_algebra_fused_emulated`) — the same strategy test_ec_pallas.py
uses for the EC kernels."""

import numpy as np
import pytest

from halo2_aggregation_tpu.models import simple_example as se
from halo2_aggregation_tpu.plonk import kzg
from halo2_aggregation_tpu.plonk.keygen import keygen
from halo2_aggregation_tpu.plonk.prover import create_proof
from halo2_aggregation_tpu.plonk.verifier import parse_proof
from halo2_aggregation_tpu.plonk.fa_fused import (
    fa_gather,
    fa_schedule,
    field_algebra_fused_emulated,
)
from halo2_aggregation_tpu.plonk.verifier_tpu import (
    batch_proofs,
    field_algebra,
)


@pytest.fixture(scope="module")
def batch8():
    params = kzg.setup(9)
    circuit = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=9)
    vk, pk = keygen(params, cs_e, asg_e)
    protos = []
    for a, b in [(2, 3), (4, 5)]:
        c = se.MyCircuit(constant=7, a=a, b=b)
        _, _, asg = se.build(c, k=9)
        pub = [c.public_output()]
        proof = create_proof(params, pk, asg, [pub], seed=30 + a)
        protos.append((pub, proof))
    B = 8
    parsed = [
        parse_proof(
            vk,
            [params.commit_lagrange(protos[i % 2][0])],
            protos[i % 2][1],
        )
        for i in range(B)
    ]
    return vk, batch_proofs(vk, parsed), B


def test_fused_body_matches_xla_bitexact(batch8):
    vk, batch, B = batch8
    h1, xn1, xs1 = (np.asarray(a) for a in field_algebra(vk, batch, B))
    h2, xn2, xs2 = (
        np.asarray(a) for a in field_algebra_fused_emulated(vk, batch, B)
    )
    assert np.array_equal(h1, h2), "h_eval mismatch"
    assert np.array_equal(xn1, xn2), "x^n mismatch"
    assert np.array_equal(xs1, xs2), "x^n - 1 mismatch"


def test_fa_schedule_covers_gather(batch8):
    """Schedule tags and gathered arrays stay in lockstep (the kernel
    indexes the stacked input by schedule position)."""
    vk, batch, B = batch8
    sched = fa_schedule(vk)
    arrs = fa_gather(vk, batch)
    assert len(sched) == len(arrs)
    for tag, a in zip(sched, arrs):
        assert a is not None, f"missing array for {tag}"
        assert np.asarray(a).shape == (B, 32), tag
