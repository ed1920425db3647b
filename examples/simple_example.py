"""End-to-end demo mirroring the reference's `examples/simple-example.rs`.

Phase A: build + prove the inner circuit (k=9, constant=7, a=2, b=3);
         native verify -> (ok, (e,f,w,zw))
Phase B: construct the outer SingleProofCircuit with the proof transcript
Phase C: MockProver-equivalent on the outer circuit (H2A_FULL_MOCK=1;
         witness-level quad equality is always checked)
Phase D: the REAL outer proof (simple-example.rs:678-730): keygen, prove,
         and verify the aggregation circuit through the scaled native
         prover — quotient on the TPU by default (Pallas NTT engine;
         ~11-15 min at the default k=21 incl. keygen, ~19 min host-only
         with H2A_DEVICE_QUOTIENT=0; H2A_OUTER_K overrides k).
         Gated by H2A_PHASE_D=1.

Run: python examples/simple_example.py
     H2A_PHASE_D=1 python examples/simple_example.py   # + the outer proof
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from halo2_aggregation_tpu.config import H2AConfig
    from halo2_aggregation_tpu.models import aggregation_circuit as ac
    from halo2_aggregation_tpu.models import simple_example as se
    from halo2_aggregation_tpu.plonk import kzg
    from halo2_aggregation_tpu.plonk.keygen import keygen
    from halo2_aggregation_tpu.plonk.mock import mock_verify_fast
    from halo2_aggregation_tpu.plonk.prover import create_proof
    from halo2_aggregation_tpu.plonk.verifier import verify_proof
    from halo2_aggregation_tpu.utils.transcript import (
        Blake2bRead,
        Blake2bWrite,
        PoseidonRead,
        PoseidonWrite,
    )

    cfg = H2AConfig.from_env()
    # Constrained Fiat-Shamir is the DEFAULT mode: Poseidon transcript end
    # to end, with challenge derivation ENFORCED in-circuit — our upgrade
    # over the reference's witnessed-unconstrained challenges
    # (transcript.rs:62-65).  H2A_CONSTRAINED_FS=0 selects the
    # reference-parity Blake2b mode (challenges unconstrained in-circuit).
    cfs = cfg.constrained_fs
    t_write = PoseidonWrite if cfs else Blake2bWrite
    t_read = PoseidonRead if cfs else Blake2bRead

    # --- Phase A: inner proof (simple-example.rs:560-644) ------------------
    k = cfg.k_inner
    t0 = time.time()
    params = kzg.setup(k)
    circuit = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=k)
    vk, pk = keygen(params, cs_e, asg_e)
    _, _, asg = se.build(circuit, k=k)
    pub = [circuit.public_output()]

    cs_w, _, asg_w = se.build(circuit, k=k)
    assert mock_verify_fast(cs_w, asg_w) == []
    print(f"inner mock prover succeeded ({time.time()-t0:.1f}s)")

    proof = create_proof(params, pk, asg, [pub], seed=42, transcript_cls=t_write)
    print(f"proof size is {len(proof)} bytes")
    ok, efw = verify_proof(params, vk, [pub], proof, transcript_cls=t_read)
    assert ok
    print(f"simple-circuit proof valid! (transcript: {t_write.__name__})")
    inst_comm = params.commit_lagrange(pub)

    # --- Phase B: outer circuit (simple-example.rs:645-672) ----------------
    # k=21: GLV + windowed mul_var + shared-doubling multiopen MSMs cut
    # the verifier circuit from round-1's 4.58M rows @ k=23 to ~1.23M;
    # the reference needs k=23 (simple-example.rs:654) for the same
    # statement.
    outer_k = cfg.k_outer
    outer = ac.SingleProofCircuit(vk, proof, constrained_fs=cfs)
    public_inputs = outer.public_inputs(inst_comm, efw)
    print(f"outer public inputs: {len(public_inputs)} scalars")

    # --- Phase C: constraint check (simple-example.rs:674-676) -------------
    t0 = time.time()
    cs_o, cfg_o, asg_o, ctx_o, quad = ac.build(outer, outer_k, public_inputs)
    assert [quad.e.value(), quad.f.value(), quad.w.value(), quad.zw.value()] == list(
        efw
    ), "in-circuit quad != native quad"
    print(
        f"in-circuit verifier synthesized: {ctx_o.offset} rows @ k={outer_k} "
        f"({time.time()-t0:.1f}s); quad matches native verifier"
    )
    if os.environ.get("H2A_FULL_MOCK", "0") == "1":
        t0 = time.time()
        failures = mock_verify_fast(cs_o, asg_o)
        assert failures == [], failures[:5]
        print(f"outer mock prover succeeded ({time.time()-t0:.1f}s)")

    # --- Phase D: the real outer proof (simple-example.rs:678-730) ---------
    if cfg.phase_d:
        from halo2_aggregation_tpu.plonk.keygen import keygen_native
        from halo2_aggregation_tpu.plonk.prover_native import (
            create_proof_native,
        )

        t0 = time.time()
        params_o = kzg.setup(outer_k)
        print(f"outer SRS ready ({time.time()-t0:.0f}s)")
        t0 = time.time()
        cs_e2, _, asg_e2, _, _ = ac.build(outer.without_witnesses(), outer_k)
        vk_o, pk_o = keygen_native(params_o, cs_e2, asg_e2)
        del asg_e2
        print(f"outer keygen done ({time.time()-t0:.0f}s)")
        t0 = time.time()

        def prog(msg):
            print(f"  [prove {time.time()-t0:7.0f}s] {msg}", flush=True)

        outer_proof = create_proof_native(
            params_o, pk_o, asg_o, [public_inputs], seed=1, progress=prog
        )
        print(
            f"outer proof size is {len(outer_proof)} bytes "
            f"({time.time()-t0:.0f}s)"
        )
        t0 = time.time()
        ok_o, efw_o = verify_proof(params_o, vk_o, [public_inputs], outer_proof)
        assert ok_o, "outer aggregation proof rejected"
        print(f"aggregation proof valid! ({time.time()-t0:.0f}s)")

    print("done.")


if __name__ == "__main__":
    main()
