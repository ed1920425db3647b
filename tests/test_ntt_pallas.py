"""Pallas NTT engine: schedule + twiddle indexing vs the trusted XLA NTT.

Mosaic interpret mode is unusable on this host (CLAUDE.md), so — like
test_ec_pallas.py — these tests validate the kernel's MATH and SCHEDULE
on CPU and leave the fused on-chip parity to the chip-side probe
(tools/ntt_probe.py) and the end-to-end Phase D proof:

  * the butterfly field math is the already-tested ec_pallas limb ops;
  * what's new and risky is the block/lane INDEX SCHEDULE (local-stage
    lane rolls, global-stage partner/twiddle block maps) and the
    bitrev-upload convention — all pure index functions, simulated here
    exactly as the kernels execute them, over Python-int field math,
    and compared against ops/ntt's _ntt_core.
"""

import numpy as np
import jax.numpy as jnp

from halo2_aggregation_tpu.fields import R, fr_omega
from halo2_aggregation_tpu.ops import ntt as nt
from halo2_aggregation_tpu.ops import ntt_pallas as ntp
from halo2_aggregation_tpu.ops.field_ops import FR

RNG = np.random.default_rng(0x17717)
RINV = pow(1 << 256, -1, R)


def _u64_to_int(row):
    return int(row[0]) | int(row[1]) << 64 | int(row[2]) << 128 | int(row[3]) << 192


def _tw_int(tw32):
    """(32,) int32 8-bit limbs -> int (montgomery residue kept as-is)."""
    return sum(int(v) << (8 * i) for i, v in enumerate(tw32))


def _simulate_schedule(coeffs, k):
    """Execute the EXACT kernel schedule (bitrev upload + local lane
    rolls + global partner/twiddle block maps) with Python-int field
    math.  Values are tracked as plain ints mod R (not limbs); mont_mul
    is a*b*2^-256."""
    n = 1 << k
    plan = nt.NttPlan(k, fr_omega(k))
    nloc = min(ntp.LOCAL_STAGES, k)
    TL = ntp.TL

    # host upload: bitrev-permuted coefficients (mont residues as ints)
    x = [coeffs[plan.bitrev[j]] for j in range(n)]

    # twiddles exactly as prep_twiddles lays them out (global tables
    # lane-concatenated u8, stage s at offset 2^s - 2^nloc)
    local_tws, tw_cat = ntp.prep_twiddles(plan)
    local_tws = np.asarray(local_tws)
    tw_cat = np.asarray(tw_cat)
    g_tws = [
        tw_cat[:, (1 << s) - (1 << nloc) : (1 << (s + 1)) - (1 << nloc)]
        for s in range(nloc, k)
    ]

    mm = lambda a, b: a * b * RINV % R

    # local stages: per 128-lane tile, masked rolls
    for s in range(nloc):
        half = 1 << s
        tw_band = local_tws[s * 32 : (s + 1) * 32, :]  # (32, TL) periodic
        nx = list(x)
        for t0 in range(0, n, TL):
            for j in range(TL):
                gj = t0 + j
                is_lo = (j % (2 * half)) < half
                hi = x[t0 + (j + half) % TL] if is_lo else x[gj]
                lo = x[gj] if is_lo else x[t0 + (j - half) % TL]
                tw = _tw_int(tw_band[:, j])
                t = mm(hi, tw)
                nx[gj] = (lo + t) % R if is_lo else (lo - t) % R
        x = nx

    # global stages: block partner/twiddle maps
    for i, s in enumerate(range(nloc, k)):
        half = 1 << s
        hb = half // TL
        twarr = g_tws[i]  # (32, half)
        nx = list(x)
        for g in range(n // TL):
            pg = ntp.gstage_partner_block(g, hb)
            twb = ntp.gstage_tw_block(g, hb)
            is_lo = g % (2 * hb) < hb
            for j in range(TL):
                own = x[g * TL + j]
                part = x[pg * TL + j]
                lo, hi = (own, part) if is_lo else (part, own)
                tw = _tw_int(twarr[:, twb * TL + j])
                t = mm(hi, tw)
                nx[g * TL + j] = (lo + t) % R if is_lo else (lo - t) % R
        x = nx
    return x


def test_schedule_matches_xla_ntt_k7():
    _check(7)


def test_schedule_matches_xla_ntt_k9():
    _check(9)


def _check(k):
    n = 1 << k
    vals = [int.from_bytes(RNG.bytes(40), "little") % R for _ in range(n)]
    mont = [v * (1 << 256) % R for v in vals]

    # trusted reference: the tested XLA NTT (natural-order output)
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs

    plan = nt.NttPlan(k, fr_omega(k))
    ref = np.asarray(nt._ntt_core(jnp.asarray(ints_to_limbs(mont)), plan))
    ref_ints = [
        sum(int(ref[i, l]) << (8 * l) for l in range(32)) for i in range(n)
    ]

    got = _simulate_schedule(mont, k)
    assert [g % R for g in got] == ref_ints


def test_pack_columns_bitrev_layout():
    """pack_columns_bitrev: row band c holds column c's limbs on
    sublanes, bitrev-permuted along lanes."""
    k = 7
    n = 1 << k
    plan = nt.NttPlan(k, fr_omega(k))
    cols = [
        np.arange(n * 4, dtype=np.uint64).reshape(n, 4) + 1000 * c
        for c in range(3)
    ]
    X = ntp.pack_columns_bitrev(cols, plan.bitrev)
    assert X.shape == (3 * 32, n)
    for c in range(3):
        for j in (0, 1, n - 1):
            want = _u64_to_int(cols[c][plan.bitrev[j]])
            got = sum(int(X[c * 32 + l, j]) << (8 * l) for l in range(32))
            assert got == want


def _simulate_dif(evals, k):
    """The intt_batched_u8 schedule (DIF, natural-in / bitrev-out) with
    Python-int field math, inverse-omega twiddles, no ninv scale."""
    n = 1 << k
    plan_inv = nt.NttPlan(k, pow(fr_omega(k), -1, R))
    nloc = min(ntp.LOCAL_STAGES, k)
    TL = ntp.TL
    local_tws, tw_cat = ntp.prep_twiddles(plan_inv)
    local_tws = np.asarray(local_tws)
    tw_cat = np.asarray(tw_cat)
    g_tws = [
        tw_cat[:, (1 << s) - (1 << nloc) : (1 << (s + 1)) - (1 << nloc)]
        for s in range(nloc, k)
    ]
    mm = lambda a, b: a * b * RINV % R
    x = list(evals)

    for s in range(k - 1, nloc - 1, -1):
        half = 1 << s
        hb = half // TL
        twarr = g_tws[s - nloc]
        nx = list(x)
        for g in range(n // TL):
            pg = ntp.gstage_partner_block(g, hb)
            twb = ntp.gstage_tw_block(g, hb)
            is_lo = g % (2 * hb) < hb
            for j in range(TL):
                own, part = x[g * TL + j], x[pg * TL + j]
                lo, hi = (own, part) if is_lo else (part, own)
                if is_lo:
                    nx[g * TL + j] = (lo + hi) % R
                else:
                    tw = _tw_int(twarr[:, twb * TL + j])
                    nx[g * TL + j] = mm(lo - hi, tw)
        x = nx

    for s in range(nloc - 1, -1, -1):
        half = 1 << s
        tw_band = local_tws[s * 32 : (s + 1) * 32, :]
        nx = list(x)
        for t0 in range(0, n, TL):
            for j in range(TL):
                gj = t0 + j
                is_lo = (j % (2 * half)) < half
                hi = x[t0 + (j + half) % TL] if is_lo else x[gj]
                lo = x[gj] if is_lo else x[t0 + (j - half) % TL]
                if is_lo:
                    nx[gj] = (lo + hi) % R
                else:
                    nx[gj] = mm(lo - hi, _tw_int(tw_band[:, j]))
        x = nx
    return x


def test_dif_intt_schedule_matches_xla():
    """intt_batched_u8's DIF schedule: natural evals -> bitrev coeffs,
    equal to the trusted XLA inverse NTT."""
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs

    k = 7
    n = 1 << k
    vals = [int.from_bytes(RNG.bytes(40), "little") % R for _ in range(n)]
    mont = [v * (1 << 256) % R for v in vals]

    plan = nt.NttPlan(k, fr_omega(k))
    plan_inv = nt.NttPlan(k, pow(fr_omega(k), -1, R))
    ref = np.asarray(nt._ntt_core(jnp.asarray(ints_to_limbs(mont)), plan_inv))
    ninv = pow(n, -1, R)
    ref_ints = [
        sum(int(ref[i, l]) << (8 * l) for l in range(32)) * ninv % R
        for i in range(n)
    ]

    got = _simulate_dif(mont, k)
    ninv_m = ninv * (1 << 256) % R
    got = [g * ninv_m * RINV % R for g in got]  # the final ew scalar mul
    assert got == [ref_ints[plan.bitrev[j]] for j in range(n)]

    # roundtrip: DIF intt output IS valid DIT input (no permutation)
    back = _simulate_schedule([0] * n, k)  # smoke the helper exists
    assert len(back) == n
