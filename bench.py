"""Benchmark: B simple-example proofs -> one accumulator, on TPU.

Prints ONE JSON line:
  {"metric": "proofs_aggregated_per_s", "value": N, "unit": "proofs/s",
   "vs_baseline": M, "detail": {...}}

The metric is the end-to-end aggregation pipeline at batch B on one chip:
per-proof Blake2b transcript replay (host) -> batched verification
algebra (device: Lagrange evals, all constraint expressions, the
single-MSM GWC multiopen fold via the VMEM-resident Pallas ladder) ->
quad extraction -> ONE folded pairing check for the whole batch
(native C++ pairing).  This is BASELINE.json's headline
("proofs aggregated/sec").

The reference publishes no numbers (BASELINE.md: "none exist"), so
vs_baseline is measured against this repo's own single-threaded host-int
verifier doing the same algebra.

Methodology (VERDICT r1 items 4/7-nits):
  * medians over trials, not best-of;
  * every timed region ends in a device-to-host materialization
    (np.asarray) — on the axon backend block_until_ready does NOT force
    execution;
  * the field-mul micro-bench chains 128 dependent muls over 2^16 lanes
    between D2H transfers, so timed work >> tunnel latency, and reports
    the fraction of a documented VPU speed-of-light model;
  * per-stage timings (parse/prep/device/D2H/pairing) in the detail.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def median_rate(fn, work, trials):
    ts = []
    for _ in range(trials):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return work / statistics.median(ts), statistics.median(ts)


def median_rate_spread(fn, work, trials):
    """(median_rate, [per-trial rates]) — the spread is reported so docs
    can state tunnel variance instead of a best-day number (VERDICT r2
    weak-2)."""
    ts = []
    for _ in range(trials):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return work / statistics.median(ts), [round(work / t, 3) for t in ts]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/h2a_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from halo2_aggregation_tpu.config import H2AConfig
    from halo2_aggregation_tpu.models import simple_example as se
    from halo2_aggregation_tpu.ops import curve_ops as co
    from halo2_aggregation_tpu.ops import field_ops as fo
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs
    from halo2_aggregation_tpu.plonk import kzg
    from halo2_aggregation_tpu.plonk.keygen import keygen
    from halo2_aggregation_tpu.plonk.prover import create_proof
    from halo2_aggregation_tpu.plonk.verifier import parse_proof, verify_proof
    from halo2_aggregation_tpu.plonk.verifier_tpu import (
        _fast_device_gathered_jitted,
        batch_proofs,
        check_aggregate,
        fast_prep,
        fast_prep_gathered,
    )

    cfg = H2AConfig.from_env()
    B = cfg.batch
    k = cfg.k_inner

    # --- build real proofs, cycle to a batch of B -------------------------
    params = kzg.setup(k)
    circuit = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=k)
    vk, pk = keygen(params, cs_e, asg_e)
    protos = []
    for a, b in [(2, 3), (4, 5), (1, 255), (6, 6)]:
        c = se.MyCircuit(constant=7, a=a, b=b)
        _, _, asg = se.build(c, k=k)
        pub = [c.public_output()]
        proof = create_proof(params, pk, asg, [pub], seed=40 + a)
        protos.append((pub, proof, [params.commit_lagrange(pub)]))

    stage = {}

    def full_aggregate_once(record=False):
        """parse B transcripts -> device algebra -> quads -> ONE folded
        pairing: the end-to-end 'B proofs -> one accumulator' pipeline."""
        t0 = time.time()
        parsed = [
            parse_proof(vk, protos[i % 4][2], protos[i % 4][1])
            for i in range(B)
        ]
        t1 = time.time()
        batch = batch_proofs(vk, parsed)
        descs, lane_ss, hc, kn = fast_prep_gathered(vk, parsed)
        t2 = time.time()
        step = _fast_device_gathered_jitted(vk, B, descs)
        stacked, _h = step(batch, lane_ss, hc, kn)
        arr = np.asarray(stacked)  # ONE D2H transfer for all 12 coords
        quads_cols = [
            co.jac_to_ints(co.JacPoint(arr[3 * i], arr[3 * i + 1], arr[3 * i + 2]))
            for i in range(4)
        ]
        t3 = time.time()
        quads = [tuple(qc[i] for qc in quads_cols) for i in range(B)]
        ok = check_aggregate(quads, params)
        t4 = time.time()
        assert ok
        if record:
            stage.update(
                parse_s=round(t1 - t0, 3),
                prep_s=round(t2 - t1, 3),
                device_and_d2h_s=round(t3 - t2, 3),
                pairing_s=round(t4 - t3, 3),
            )

    full_aggregate_once()  # warmup + compile
    agg_rate, agg_spread = median_rate_spread(
        full_aggregate_once, B, trials=int(os.environ.get("H2A_BENCH_TRIALS", "5"))
    )
    # profiler capture (SURVEY §5 tracing row): H2A_PROFILE=<dir> records a
    # jax.profiler trace of one end-to-end aggregation for TensorBoard
    prof_dir = os.environ.get("H2A_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            full_aggregate_once(record=True)
    else:
        full_aggregate_once(record=True)

    # --- device verification algebra alone --------------------------------
    parsed = [parse_proof(vk, protos[i % 4][2], protos[i % 4][1]) for i in range(B)]
    batch = batch_proofs(vk, parsed)
    lanes = fast_prep(vk, parsed)  # coordinate-materializing (ladder diag)
    descs_g, lane_ss_g, hc_g, kn_g = fast_prep_gathered(vk, parsed)

    step = _fast_device_gathered_jitted(vk, B, descs_g)

    def algebra_once():
        stacked, _h = step(batch, lane_ss_g, hc_g, kn_g)
        np.asarray(stacked)  # force execution (axon defers until D2H)

    algebra_once()
    tpu_rate, _ = median_rate(algebra_once, B, trials=3)

    # --- EC ladder diagnostic: the Pallas kernel's scalar-mul rate --------
    from halo2_aggregation_tpu.ops.ec_pallas import scalar_mul_auto

    n_lanes = int(lanes[0].x.shape[0] * lanes[0].x.shape[1])

    def ladder_once():
        out = scalar_mul_auto(lanes[0], lanes[1], 254)
        np.asarray(out.x)

    ladder_once()
    # parity gate before timing: the compiled Mosaic kernel must agree
    # with the Python-int oracle on real verifier lanes (affine equality —
    # the windowed kernel's Jacobian representative differs from the scan)
    from halo2_aggregation_tpu.oracle import curve as _oc
    from halo2_aggregation_tpu.ops.limbs import limbs_to_ints

    par_n = 8
    sl = co.JacPoint(
        lanes[0].x.reshape(-1, 32)[:par_n],
        lanes[0].y.reshape(-1, 32)[:par_n],
        lanes[0].z.reshape(-1, 32)[:par_n],
    )
    sl_ks = lanes[1].reshape(-1, 32)[:par_n]
    got = co.jac_to_ints(scalar_mul_auto(sl, sl_ks, 254))
    want = [
        _oc.g1_mul(p, int(k))
        for p, k in zip(co.jac_to_ints(sl), limbs_to_ints(np.asarray(sl_ks)))
    ]
    assert got == want, "Pallas ladder diverges from the oracle on real lanes"
    ladder_rate, _ = median_rate(ladder_once, n_lanes, trials=3)

    # Wide-tile variant: the same lanes through a 256-lane kernel (the
    # H2A_PALLAS_TILE=256 probe measured +11% in one run — amortized
    # per-grid-step overhead, docs/bench_r4_t256.log).  The HEADLINE
    # rate is the PRODUCTION tile's (what the pipeline actually runs:
    # max-of-noisy-medians across tiles inflated it under the ~2x tunnel
    # variance, ADVICE r4); the probe tiles stay as auxiliary fields.
    import halo2_aggregation_tpu.ops.ec_pallas as _ep

    ladder_rates = {_ep.PALLAS_TILE: ladder_rate}
    for probe_tile in (256,):
        if probe_tile == _ep.PALLAS_TILE:
            continue
        _saved_tile = _ep.PALLAS_TILE
        _ep.PALLAS_TILE = probe_tile
        try:
            ladder_once()  # warm (one-time Mosaic compile, then cached)
            r, _ = median_rate(ladder_once, n_lanes, trials=3)
            ladder_rates[probe_tile] = r
        finally:
            _ep.PALLAS_TILE = _saved_tile
    ladder_tile = _ep.PALLAS_TILE

    # --- device bucket MSM: Mpoint-adds/s/chip -----------------------------
    # 2^n_msm random points x 254-bit scalars through msm_mod.msm (which
    # dispatches to the Pallas bucket kernel on TPU).  Add counts are the
    # algorithmic point-adds of the active formulation: N per 4-bit window
    # x 64 windows (Pallas), ~2N per 8-bit window x 32 (XLA sort+scan).
    # The result is parity-gated against the native C++ Pippenger before
    # any timing is trusted.
    from halo2_aggregation_tpu.ops import msm as msm_mod
    from halo2_aggregation_tpu.oracle import curve as oc_
    from halo2_aggregation_tpu.utils import native as native_
    from halo2_aggregation_tpu.utils.u64 import (
        ints_to_u64,
        u64_to_limbs8,
        u64_to_points,
    )

    n_msm = 1 << int(os.environ.get("H2A_BENCH_MSM_LOG2", "17"))
    base = oc_.g1_generator()
    base_u64 = ints_to_u64([base[0], base[1]]).reshape(-1)
    msm_rng = np.random.default_rng(5)
    msm_ks = ints_to_u64(
        [int(msm_rng.integers(1, 1 << 62)) for _ in range(n_msm)]
    )
    aff_u64, inf_u64 = native_.g1_batch_mul_win(base_u64, msm_ks)
    msm_pts = co.AffinePoint(
        jnp.asarray(fo.to_mont(jnp.asarray(u64_to_limbs8(aff_u64[:, :4])), fo.FQ)),
        jnp.asarray(fo.to_mont(jnp.asarray(u64_to_limbs8(aff_u64[:, 4:])), fo.FQ)),
        jnp.asarray(inf_u64.astype(bool)),
    )
    msm_scalar_ints = [
        int.from_bytes(msm_rng.bytes(31), "little") for _ in range(n_msm)
    ]
    msm_ss = jnp.asarray(u64_to_limbs8(ints_to_u64(msm_scalar_ints)))

    def msm_once():
        r = msm_mod.msm(msm_pts, msm_ss, 254)
        return np.asarray(r.x), np.asarray(r.y), np.asarray(r.z)

    mx, my, mz = msm_once()  # warmup/compile + parity input
    got_msm = co.jac_to_ints(
        co.JacPoint(jnp.asarray(mx)[None], jnp.asarray(my)[None], jnp.asarray(mz)[None])
    )[0]
    want_msm = native_.g1_msm(
        u64_to_points(aff_u64, inf_u64), msm_scalar_ints
    )
    assert got_msm == want_msm, "device MSM diverges from native Pippenger"
    pallas_msm = os.environ.get("H2A_PALLAS_MSM", "1") == "1"
    # algorithmic point-adds: one per point per window — 52 signed 5-bit
    # windows (default kernel) / 64 unsigned 4-bit / ~2N per 8-bit XLA window
    msm_signed = os.environ.get("H2A_MSM_SIGNED", "1") == "1"
    msm_adds = (
        n_msm * (52 if msm_signed else 64) if pallas_msm else 2 * n_msm * 32
    )
    msm_rate, msm_t = median_rate(lambda: msm_once(), msm_adds, trials=2)

    # --- Pallas NTT engine: butterfly throughput vs speed-of-light --------
    # A (C*32, 2^k_ntt)-u8 batched DIT NTT (the device quotient's engine,
    # ops/ntt_pallas.py) chained `ntt_chain` times between D2H forces so
    # timed work >> tunnel latency.  Twiddle-mul count per transform is
    # C * (n/2) * k (one mont-mul per butterfly); adds/subs and the final
    # canonicalization ride along uncounted, so the reported roofline
    # fraction is conservative.
    from halo2_aggregation_tpu.ops import ntt_pallas as ntp
    from halo2_aggregation_tpu.ops.ntt import _bit_reverse_indices
    from halo2_aggregation_tpu.plonk.quotient_device import native_twiddles

    k_ntt = int(os.environ.get("H2A_BENCH_NTT_LOG2", "16"))
    C_ntt = 8
    ntt_chain = 4
    n_ntt = 1 << k_ntt
    ntt_rng = np.random.default_rng(7)
    cols_u64 = [
        np.frombuffer(ntt_rng.bytes(n_ntt * 32), dtype="<u8")
        .view("<u2")
        .astype(np.uint64)
        .reshape(n_ntt, 16)[:, :4]  # 4x16-bit per u64 limb: values << p
        for _ in range(C_ntt)
    ]
    X0 = jnp.asarray(
        ntp.pack_columns_bitrev(cols_u64, _bit_reverse_indices(k_ntt))
    )
    from halo2_aggregation_tpu.utils import native as _native

    if _native.available():
        ntt_tws = native_twiddles(k_ntt)
    else:
        # no C++ engine: build the natural-order omega series on-device
        # and take the documented prep_twiddles_dev fallback
        from halo2_aggregation_tpu.plonk.quotient_device import fr_omega

        omega_nat = ntp.pow_series_u8(
            fr_omega(k_ntt), k_ntt, np.arange(n_ntt, dtype=np.int64)
        )
        ntt_tws = native_twiddles(k_ntt, omega_nat_u8=omega_nat)
    np.asarray(X0[:1, :1])  # force upload before timing

    def ntt_once():
        X = X0
        for _ in range(ntt_chain):
            X = ntp.ntt_batched_u8(X, ntt_tws, k_ntt, C_ntt)
        np.asarray(X[:1, :128])  # force (axon defers until D2H)

    ntt_once()  # warm + compile
    ntt_muls = ntt_chain * C_ntt * (n_ntt // 2) * k_ntt
    ntt_mul_rate, ntt_t = median_rate(ntt_once, ntt_muls, trials=3)

    # --- host baseline: same algebra, single thread, python ints ----------
    pub, proof = protos[0][0], protos[0][1]
    t0 = time.time()
    host_iters = 2
    for _ in range(host_iters):
        ok, _ = verify_proof(params, vk, [pub], proof)
        assert ok
    host_full = (time.time() - t0) / host_iters
    # subtract the (now native) pairing cost — deferred in production
    from halo2_aggregation_tpu.oracle import curve as oc
    from halo2_aggregation_tpu.oracle.pairing import multi_pairing_check_fast

    g = oc.g1_generator()
    t0 = time.time()
    multi_pairing_check_fast([(g, params.s_g2), (oc.g1_neg(g), params.g2)])
    pairing_t = time.time() - t0
    host_rate = 1.0 / max(host_full - pairing_t, 1e-9)

    # --- field-mul micro-bench: chained work >> tunnel latency ------------
    rng = np.random.default_rng(0)
    m = 1 << 16
    chain = 128
    a = jnp.asarray(
        ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % fo.FR.p for _ in range(256)]
        )
    )
    a = jnp.tile(a, (m // 256, 1))

    import functools

    @functools.partial(jax.jit)
    def chain_mul(x, y):
        for _ in range(chain):
            x = fo.mont_mul(x, y, fo.FR)
        return x

    r = chain_mul(a, a)
    np.asarray(r[0])  # warm + force
    t0 = time.time()
    r = chain_mul(r, a)
    np.asarray(r[0])
    fmul_t = time.time() - t0
    fmul_rate = chain * m / fmul_t

    # VPU speed-of-light model for one 32x8-bit-limb Montgomery mul
    # (documented, conservative): 2.2 limb convolutions of 32 shifted MACs
    # over 64-wide columns (mul+add = 2 ops each) plus ~3 carry chains of
    # ~12 elementwise ops over 64 limbs:
    #   ops = 2.2 * 32 * 2 * 64 + 3 * 12 * 64 ~= 11300 int32 lane-ops.
    # v5e VPU peak ~= 8 sublanes * 128 lanes * 4 ALUs * 1.74 GHz
    #   ~= 7.1e12 int32 ops/s  =>  SoL ~= 630M mont-muls/s.
    ops_per_mont = 2.2 * 32 * 2 * 64 + 3 * 12 * 64
    vpu_peak = 8 * 128 * 4 * 1.74e9
    sol_rate = vpu_peak / ops_per_mont
    roofline_frac = fmul_rate / sol_rate

    # In-KERNEL mont-mul throughput implied by the measured Pallas ladder:
    # the 4-bit windowed kernel does 3,474 Fq mont-muls per 254-bit
    # scalar-mul (64 x (4 jac_double@9 + jac_add@16) + 210 table-build;
    # ops/ec_pallas.py).  Unlike the chained XLA micro-bench above (which
    # round-trips HBM between muls and is bandwidth-bound), this measures
    # the VMEM-resident compute rate — the honest kernel-efficiency
    # number for BASELINE.md's roofline row.
    muls_per_ladder = 3474
    kernel_mont_rate = ladder_rate * muls_per_ladder
    kernel_roofline_frac = kernel_mont_rate / sol_rate

    # MSM bucket-kernel roofline: each algorithmic point-add is a mixed
    # (affine+Jacobian) add at 18 Fq mont-muls (signed-5-bit kernel) /
    # a full Jacobian add at 23 (unsigned 4-bit); digit recoding and the
    # in-kernel fold ride along uncounted, so the fraction is conservative.
    msm_muls_per_add = 18 if msm_signed else 23
    msm_mont_rate = msm_rate * msm_muls_per_add
    msm_roofline_frac = msm_mont_rate / sol_rate
    ntt_roofline_frac = ntt_mul_rate / sol_rate
    # The butterfly kernels EXECUTE 2x the algorithmic n/2 muls per
    # stage: every lane computes its pair's product (SIMD butterflies —
    # both the masked-roll local stages and the output-tile-centric
    # global schedule).  ntt_kernel_roofline_frac above charges the
    # ALGORITHMIC count (the honest end-to-end number); the executed
    # fraction below is the kernel-efficiency number comparable to the
    # EC ladder/MSM rows.  Halving the gap for real needs a pair-packed
    # (constant-geometry) layout — ROADMAP round-5 notes.
    ntt_exec_roofline_frac = 2 * ntt_mul_rate / sol_rate

    print(
        json.dumps(
            {
                "metric": "proofs_aggregated_per_s",
                "value": round(agg_rate, 3),
                "unit": "proofs/s",
                "vs_baseline": round(agg_rate / host_rate, 3),
                "detail": {
                    "batch": B,
                    "verify_algebra_proofs_per_s": round(tpu_rate, 3),
                    "pallas_scalar_muls_per_s": round(ladder_rate, 1),
                    "pallas_kernel_tile": ladder_tile,
                    "pallas_scalar_muls_per_s_by_tile": {
                        str(t): round(r, 1) for t, r in ladder_rates.items()
                    },
                    "multiopen_lanes": n_lanes,
                    "host_algebra_proofs_per_s": round(host_rate, 3),
                    "msm_mpoint_adds_per_s_per_chip": round(msm_rate / 1e6, 3),
                    "msm_n_points": n_msm,
                    "msm_wall_s": round(msm_t, 3),
                    "native_pairing_s": round(pairing_t, 3),
                    "fr_mont_mul_per_s": round(fmul_rate, 1),
                    "fr_mont_mul_roofline_frac": round(roofline_frac, 4),
                    "fr_mont_mul_sol_per_s": round(sol_rate, 1),
                    "pallas_kernel_mont_mul_per_s": round(kernel_mont_rate, 1),
                    "pallas_kernel_roofline_frac": round(kernel_roofline_frac, 4),
                    "msm_kernel_mont_mul_per_s": round(msm_mont_rate, 1),
                    "msm_kernel_roofline_frac": round(msm_roofline_frac, 4),
                    "ntt_k": k_ntt,
                    "ntt_batch_cols": C_ntt,
                    "ntt_wall_s_per_transform": round(ntt_t / ntt_chain, 4),
                    "ntt_mont_mul_per_s": round(ntt_mul_rate, 1),
                    "ntt_kernel_roofline_frac": round(ntt_roofline_frac, 4),
                    "ntt_executed_roofline_frac": round(
                        ntt_exec_roofline_frac, 4
                    ),
                    "agg_trials_proofs_per_s": agg_spread,
                    "stages": stage,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
