"""Two-level aggregation tree probe (VERDICT r3 item 5).

Level 2 of the N=64 tree (docs/AGGREGATION_SCALING.md): a circuit whose
VerifierChip verifies FIRST-LEVEL OUTER proofs under the OUTER vk — the
chip is vk-generic (every commitment/eval it consumes is driven by
`vk.cs`, `aggregation/chips.py:232-506`), so recursion is just
`AggregationCircuit(outer_vk, outer_proofs, ...)`.  This probe loads the
real level-1 artifacts saved by
`H2A_PHASE_D=1 H2A_ARTIFACTS_DIR=docs/artifacts python examples/simple_example.py`
and:

  1. builds the level-2 circuit verifying the outer proof TWICE (two
     level-1 slots fed by one proof, the same pattern the 2-proof tests
     use), with the documented [40*i .. ) instance layout;
  2. checks both in-circuit quads equal the native verifier's quad on
     the outer proof, and the in-circuit lambda-fold matches
     `fold_quads_host`;
  3. prints the row count and the smallest k that fits (the tree's
     level-2 cost per verified level-1 proof);
  4. H2A_FULL_MOCK=1 additionally runs the full constraint check.

Usage: python tools/level2_probe.py [artifact_dir=docs/artifacts]
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")


def load_artifacts(adir):
    stems = sorted(
        f[: -len(".proof")]
        for f in os.listdir(adir)
        if f.endswith(".proof")
    )
    if not stems:
        raise SystemExit(
            f"no level-1 artifacts under {adir}/ — run "
            "H2A_PHASE_D=1 H2A_ARTIFACTS_DIR=... examples/simple_example.py first"
        )
    stem = os.path.join(adir, stems[-1])
    proof = open(f"{stem}.proof", "rb").read()
    vk = pickle.load(open(f"{stem}.vk.pkl", "rb"))
    meta = json.load(open(f"{stem}.meta.json"))
    pis = [int(v) for v in meta["public_inputs"]]
    efw = tuple(tuple(int(c) for c in p) for p in meta["efw"])
    inst_comm = tuple(int(c) for c in meta["inst_comm"])
    return stem, proof, vk, meta, pis, efw, inst_comm


def main():
    adir = sys.argv[1] if len(sys.argv) > 1 else "docs/artifacts"
    stem, proof, vk_o, meta, pis, efw, inst_comm = load_artifacts(adir)
    print(
        f"level-1 artifact: {stem} (k={meta['k']}, "
        f"N={meta['num_proofs']}, {len(proof)} bytes)"
    )

    from halo2_aggregation_tpu.models import aggregation_circuit as ac
    from halo2_aggregation_tpu.plonk import kzg
    from halo2_aggregation_tpu.plonk.verifier import verify_proof

    # re-verify natively first: the artifact must be a valid outer proof
    params_o = kzg.setup(meta["k"])
    t0 = time.time()
    ok, efw_native = verify_proof(params_o, vk_o, [pis], proof)
    assert ok, "artifact proof does not verify natively"
    assert tuple(map(tuple, efw_native)) == efw, "artifact quad mismatch"
    print(f"native re-verify ok ({time.time()-t0:.1f}s)")

    # level-2 circuit: TWO level-1 slots (the tree's branching factor),
    # both fed by the real outer proof
    n2 = 2
    circ = ac.AggregationCircuit(vk_o, [proof] * n2, num_proofs=n2)
    pis2 = circ.public_inputs([inst_comm] * n2, [efw] * n2)
    assert len(pis2) == 40 * n2 + 16
    # headroom k for synthesis (k=24 ~ the N=8 test's footprint, ~55GB);
    # the smallest fitting k is reported below
    t0 = time.time()
    cs2, cfg2, asg2, ctx2, (quads, W, RHS) = ac.build(circ, 24, pis2)
    for q in quads:
        got = (q.e.value(), q.f.value(), q.w.value(), q.zw.value())
        assert got == efw, "level-2 in-circuit quad != native level-1 quad"
    W_want, RHS_want = ac.fold_quads_host([efw] * n2)
    assert (W.value(), RHS.value()) == (W_want, RHS_want), "level-2 fold"
    import math

    k_fit = next(
        k for k in range(18, 27) if ctx2.offset <= cs2.usable_rows(1 << k)
    )
    print(
        f"level-2 circuit: {ctx2.offset} rows for {n2} level-1 proofs "
        f"@ fits k={k_fit} ({time.time()-t0:.0f}s); quads + fold match"
    )
    per = ctx2.offset / n2
    print(
        f"rows per verified level-1 proof: {per:.0f} -> a 64-leaf tree "
        f"(32 x N=2 level-1 + 16+8+4+2+1 level-2 nodes) is "
        f"{31 * ctx2.offset + 32 * 2673963:.3g} total rows across 63 proofs"
    )

    if os.environ.get("H2A_FULL_MOCK", "0") == "1":
        from halo2_aggregation_tpu.plonk.mock import mock_verify_fast

        t0 = time.time()
        failures = mock_verify_fast(cs2, asg2)
        assert failures == [], failures[:5]
        print(f"level-2 mock prover succeeded ({time.time()-t0:.0f}s)")

    print("done.")


if __name__ == "__main__":
    main()
