"""Pallas TPU NTT engine — the prover's polynomial transforms on-chip.

The XLA limb NTT (ops/ntt.py:ntt_dyn) is HBM-bound: every mont_mul
materializes (rows, 32, 64)-int32 convolution temps, measured ~3M
muls/s — a 2^21-point NTT (22M muls) costs ~18s/column, no better than
the host C++ engine.  The Pallas EC kernels run the same limb math
VMEM-resident at ~107M muls/s, so this module brings the NTT into the
same regime.

Layout contract (shared with plonk/quotient_device.py):

  * A BATCH of C columns lives as ONE (C*32, n) uint8 array: column c's
    value at position j occupies rows [32c, 32c+32) (8-bit limbs on
    sublanes), positions on lanes.  uint8 is byte-dense in HBM, so a
    k=21 23-column batch is 1.5GB resident instead of 6GB as int32.
  * Coefficients are uploaded in BIT-REVERSED lane order (the host
    permutes the numpy array before packing); the DIT butterfly
    schedule then yields NATURAL-order evaluations with no device
    gather anywhere.
  * Stage values stay in the redundant [0, 2p) Montgomery domain
    between kernels (any 256-bit pattern packs to u8); the final stage
    canonicalizes to [0, p), making results bit-identical to the host
    engine.

Kernel schedule for n = 2^k (DIT, half = 2^s ascending):

  * stages 0..6 ("local", half < 128): one kernel, butterflies inside
    each 128-lane tile via masked lane-rolls; periodic (32, 128)
    twiddle tiles.
  * stages 7..k-1 ("global", half >= 128): one kernel per stage; the
    grid walks butterfly PAIRS and the BlockSpec index maps fetch the
    lo/hi lane-tiles (and the (j mod half) twiddle tile) directly — the
    cross-tile data movement is expressed entirely in the block
    schedule, not in the kernel body.

The reference's NTTs live inside its private halo2 fork's prover
(SURVEY.md §2b `create_proof`); this is their TPU-native replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import NLIMBS, R
from .ec_pallas import (
    _add,
    _carry,
    _cond_sub,
    _ints_to_cols,
    _mont_mul_r,
    _sub,
    _sub_const_cols,
)
from .field_ops import FR

TL = 128  # lane tile
LOCAL_STAGES = 7  # stages with half < TL


def _fr_consts(tile=TL):
    tconst = lambda v: np.tile(
        np.asarray(v, np.int32).reshape(NLIMBS, 1), (1, tile)
    )
    return (
        tconst(FR.p_limbs),
        tconst(FR.p_inv_neg),
        tconst(_sub_const_cols(R)),
        tconst(_ints_to_cols((1 << 256) - 2 * R, NLIMBS)),
        tconst(FR.one_mont),
        tconst(_ints_to_cols((1 << 256) - R, NLIMBS)),  # comp_p (canon)
    )


_CONSTS = None


def _consts_dev():
    # NUMPY arrays, not jnp: this is called inside jit traces, where a
    # jnp.asarray would produce (and cache!) tracers.  As numpy they are
    # baked into each executable as tiny (32, 128) literals.
    global _CONSTS
    if _CONSTS is None:
        _CONSTS = _fr_consts()
    return _CONSTS


# -- index schedule (pure functions: unit-tested on CPU) ---------------------
# A global stage's grid walks OUTPUT lane-tiles.  Tile g sits in a
# butterfly group of 2*hb tiles (hb = half // TL); the first hb are "lo"
# tiles, the rest "hi".  Each tile's partner is hb tiles across.


def gstage_partner_block(g: int, hb: int) -> int:
    base = (g // (2 * hb)) * (2 * hb)
    q = g % (2 * hb)
    return base + (q + hb) % (2 * hb)


def gstage_is_lo(g: int, hb: int):
    return g % (2 * hb) < hb


def gstage_tw_block(g: int, hb: int) -> int:
    return g % hb


# -- kernels ------------------------------------------------------------------


def _local_kernel(nstages, canon,
                  p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref, compp_ref,
                  x_ref, tws_ref, o_ref):
    """Stages 0..nstages-1 inside one 128-lane tile.  Butterflies via
    masked lane-rolls: every lane computes its pair's (lo, hi), multiplies
    hi by the periodic twiddle, and keeps add or sub by lane parity.

    The twiddle product uses the RELAXED Montgomery variant (limbs
    <= 257, value < 2p — VERDICT r4 item 5): `_add`/`_sub` accept
    relaxed operands and their exact carries re-canonicalize every
    butterfly output, so the u8 store contract is unchanged while each
    mul drops the ~3K-op exact-carry ending."""
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    x = x_ref[:].astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (1, TL), 1)
    for s in range(nstages):
        half = 1 << s
        xh = jnp.roll(x, -half, axis=1)
        xl = jnp.roll(x, half, axis=1)
        is_lo = (lane % (2 * half)) < half
        hi_v = jnp.where(is_lo, xh, x)
        lo_v = jnp.where(is_lo, x, xl)
        tw = tws_ref[s * NLIMBS : (s + 1) * NLIMBS, :]
        t = _mont_mul_r(fc, hi_v, tw)
        x = jnp.where(is_lo, _add(fc, lo_v, t), _sub(fc, lo_v, t))
    if canon:
        x = _cond_sub(compp_ref[:], x)
    o_ref[:] = x.astype(jnp.uint8)


def _gstage_sp_kernel(s_ref,
                      p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                      compp_ref, own_ref, part_ref, tw_ref, o_ref):
    """ONE global butterfly stage kernel for ALL stages, output-tile
    centric: each grid step owns ONE output tile, fetches its pair
    partner via the block schedule, and keeps the add (lo role) or sub
    (hi role) half.  The pair's product is computed by both tiles of the
    pair — 2x muls, but muls are ~10ms per 2^21 at VMEM speeds and the
    schedule stays a pure function of the grid index (every output block
    written exactly once).

    The stage parameters arrive by SCALAR PREFETCH (s_ref = [hb,
    tw_base_block, canon]) instead of as Python statics, and the stage
    twiddle tables are lane-concatenated into one u8 array — so Mosaic
    compiles this kernel ONCE per (C, n) instead of once per stage
    (measured 1-3 min per stage compile through the axon relay; a k=23
    transform has 16 global stages)."""
    g = pl.program_id(1)
    hb = s_ref[0]
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    own = own_ref[:].astype(jnp.int32)
    part = part_ref[:].astype(jnp.int32)
    is_lo = g % (2 * hb) < hb  # scalar, traced
    lo = jnp.where(is_lo, own, part)
    hi = jnp.where(is_lo, part, own)
    # relaxed product: _add/_sub re-canonicalize before the u8 store
    t = _mont_mul_r(fc, hi, tw_ref[:].astype(jnp.int32))
    r = jnp.where(is_lo, _add(fc, lo, t), _sub(fc, lo, t))
    r = jnp.where(s_ref[2] != 0, _cond_sub(compp_ref[:], r), r)
    o_ref[:] = r.astype(jnp.uint8)


def _ew_mul_kernel(canon,
                   p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref, compp_ref,
                   a_ref, b_ref, o_ref):
    """Elementwise Montgomery product of a u8 batch tile with a shared
    u8 multiplier tile (both limbs-on-sublanes).  Relaxed mul + one
    32-limb exact carry (the output feeds a u8 store)."""
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    r = _carry(
        _mont_mul_r(
            fc, a_ref[:].astype(jnp.int32), b_ref[:].astype(jnp.int32)
        ),
        NLIMBS,
    )
    if canon:
        r = _cond_sub(compp_ref[:], r)
    o_ref[:] = r.astype(jnp.uint8)


# -- drivers ------------------------------------------------------------------


def _cspec():
    return pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (0, 0), memory_space=pltpu.VMEM
    )


def _run_gstages(X, tw_cat, k: int, C: int, canon: bool, dif: bool):
    """Run every global butterfly stage through the ONE scalar-prefetch
    kernel (DIT ascending or DIF descending).  tw_cat is the u8
    lane-concatenation of all global stage tables; stage s's table
    starts at lane 2^s - 2^nloc."""
    n = 1 << k
    nloc = min(LOCAL_STAGES, k)
    consts = _consts_dev()
    kern = _gstage_dif_sp_kernel if dif else _gstage_sp_kernel
    own = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g, s: (c, g), memory_space=pltpu.VMEM
    )
    part = pl.BlockSpec(
        (NLIMBS, TL),
        lambda c, g, s: (c, gstage_partner_block(g, s[0])),
        memory_space=pltpu.VMEM,
    )
    tw = pl.BlockSpec(
        (NLIMBS, TL),
        lambda c, g, s: (0, s[1] + g % s[0]),
        memory_space=pltpu.VMEM,
    )
    csp = lambda: pl.BlockSpec(
        (NLIMBS, TL), lambda c, g, s: (0, 0), memory_space=pltpu.VMEM
    )
    stages = range(k - 1, nloc - 1, -1) if dif else range(nloc, k)
    for s in stages:
        hb = (1 << s) // TL
        base_blk = ((1 << s) - (1 << nloc)) // TL
        can = 1 if (canon and not dif and s == k - 1) else 0
        sarr = jnp.asarray([hb, base_blk, can], jnp.int32)
        X = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(C, n // TL),
                in_specs=[csp() for _ in range(6)] + [own, part, tw],
                out_specs=own,
            ),
            out_shape=jax.ShapeDtypeStruct((C * NLIMBS, n), jnp.uint8),
        )(sarr, *consts, X, X, tw_cat)
    return X


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ntt_batched_u8(X, tws, k: int, C: int, canon: bool = True):
    """Batched DIT NTT over a (C*32, n)-u8 stacked column array whose
    lanes hold coefficients in bit-reversed order; returns natural-order
    evaluations (canonical limbs when `canon`).

    tws = (local_tws, tw_cat): local_tws a (LOCAL*32, 128)-i32 array of
    periodic early-stage twiddles; tw_cat a (32, n - 2^LOCAL)-u8
    lane-concatenation of every global stage's table (stage s at lane
    offset 2^s - 2^LOCAL).  Build both with `prep_twiddles` /
    `native_twiddles` (u8 tables are 4x smaller resident than the
    round-3 i32 per-stage arrays — 268MB vs 1.07GB at k=23)."""
    n = 1 << k
    assert k >= LOCAL_STAGES, "ntt_batched_u8 requires n >= 128 lanes"
    local_tws, tw_cat = tws
    nloc = min(LOCAL_STAGES, k)
    consts = _consts_dev()

    xspec = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
    )
    lts = pl.BlockSpec(
        (nloc * NLIMBS, TL), lambda c, g: (0, 0), memory_space=pltpu.VMEM
    )
    X = pl.pallas_call(
        functools.partial(_local_kernel, nloc, canon and k <= nloc),
        grid=(C, n // TL),
        in_specs=[_cspec() for _ in range(6)] + [xspec, lts],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((C * NLIMBS, n), jnp.uint8),
    )(*consts, X, local_tws)

    if k > nloc:
        X = _run_gstages(X, tw_cat, k, C, canon, dif=False)
    return X


@functools.partial(jax.jit, static_argnums=(2, 3))
def ew_mul_u8(A, B, C: int = 1, canon: bool = False):
    """(C*32, n)-u8 batch x (32, n)-u8 shared multiplier, elementwise
    Montgomery mul (used for the per-coset shift-power scaling)."""
    n = A.shape[1]
    consts = _consts_dev()
    aspec = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
    )
    bspec = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (0, g), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_ew_mul_kernel, canon),
        grid=(C, n // TL),
        in_specs=[_cspec() for _ in range(6)] + [aspec, bspec],
        out_specs=aspec,
        out_shape=jax.ShapeDtypeStruct(A.shape, jnp.uint8),
    )(*consts, A, B)


def _local_dif_kernel(nstages, canon,
                      p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                      compp_ref, x_ref, tws_ref, o_ref):
    """DIF (decimation in frequency) counterpart of _local_kernel:
    stages nstages-1 .. 0 inside one tile.  Butterfly: lo' = lo + hi,
    hi' = (lo - hi) * tw."""
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    x = x_ref[:].astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (1, TL), 1)
    for s in range(nstages - 1, -1, -1):
        half = 1 << s
        xh = jnp.roll(x, -half, axis=1)
        xl = jnp.roll(x, half, axis=1)
        is_lo = (lane % (2 * half)) < half
        hi_v = jnp.where(is_lo, xh, x)
        lo_v = jnp.where(is_lo, x, xl)
        tw = tws_ref[s * NLIMBS : (s + 1) * NLIMBS, :]
        # relaxed products between stages (_add/_sub/_mont_mul_r all
        # accept limbs <= 257); ONE exact 32-limb carry at the end
        # re-canonicalizes the mul-path lanes for the u8 store
        x = jnp.where(
            is_lo,
            _add(fc, lo_v, hi_v),
            _mont_mul_r(fc, _sub(fc, lo_v, hi_v), tw),
        )
    x = _carry(x, NLIMBS)
    if canon:
        x = _cond_sub(compp_ref[:], x)
    o_ref[:] = x.astype(jnp.uint8)


def _gstage_dif_sp_kernel(s_ref,
                          p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                          compp_ref, own_ref, part_ref, tw_ref, o_ref):
    """DIF global butterfly stage (output-tile centric, same
    scalar-prefetch schedule as _gstage_sp_kernel; one Mosaic compile
    for all stages)."""
    g = pl.program_id(1)
    hb = s_ref[0]
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    own = own_ref[:].astype(jnp.int32)
    part = part_ref[:].astype(jnp.int32)
    is_lo = g % (2 * hb) < hb
    lo = jnp.where(is_lo, own, part)
    hi = jnp.where(is_lo, part, own)
    # the DIF product IS the stored output, so the relaxed mul gets a
    # cheap 32-limb exact carry (vs the 64-limb ending inside _mont_mul)
    r = jnp.where(
        is_lo,
        _add(fc, lo, hi),
        _carry(
            _mont_mul_r(fc, _sub(fc, lo, hi), tw_ref[:].astype(jnp.int32)),
            NLIMBS,
        ),
    )
    o_ref[:] = r.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(3, 4))
def intt_batched_u8(X, tws, ninv_tile, k: int, C: int):
    """Batched inverse NTT via DIF: (C*32, n)-u8 NATURAL-order
    evaluations -> BIT-REVERSED-order canonical coefficients — exactly
    the layout `ntt_batched_u8` consumes, so an INTT -> coset-NTT
    pipeline needs no permutation anywhere.

    tws: prep_twiddles/native_twiddles of an INVERSE-omega plan;
    ninv_tile: n^{-1} Montgomery (32, TL)-i32 tile
    (scalar_tile(mont-int of 1/n))."""
    n = 1 << k
    assert k >= LOCAL_STAGES
    local_tws, tw_cat = tws
    nloc = min(LOCAL_STAGES, k)
    consts = _consts_dev()

    if k > nloc:
        X = _run_gstages(X, tw_cat, k, C, False, dif=True)

    xspec = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
    )
    lts = pl.BlockSpec(
        (nloc * NLIMBS, TL), lambda c, g: (0, 0), memory_space=pltpu.VMEM
    )
    X = pl.pallas_call(
        functools.partial(_local_dif_kernel, nloc, False),
        grid=(C, n // TL),
        in_specs=[_cspec() for _ in range(6)] + [xspec, lts],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((C * NLIMBS, n), jnp.uint8),
    )(*consts, X, local_tws)
    return ew_mul_scalar_u8(X, ninv_tile, C, True)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ew_mul_scalar_u8(A, b_tile, C: int = 1, canon: bool = False):
    """(C*32, n)-u8 batch x one scalar ((32, TL)-i32 tile, same value in
    every lane), elementwise Montgomery mul."""
    n = A.shape[1]
    consts = _consts_dev()
    aspec = pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_ew_mul_scalar_kernel, canon),
        grid=(C, n // TL),
        in_specs=[_cspec() for _ in range(6)] + [aspec, _cspec()],
        out_specs=aspec,
        out_shape=jax.ShapeDtypeStruct(A.shape, jnp.uint8),
    )(*consts, A, b_tile)


def _ew_mul_scalar_kernel(canon,
                          p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                          compp_ref, a_ref, b_ref, o_ref):
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    r = _carry(_mont_mul_r(fc, a_ref[:].astype(jnp.int32), b_ref[:]), NLIMBS)
    if canon:
        r = _cond_sub(compp_ref[:], r)
    o_ref[:] = r.astype(jnp.uint8)


def scalar_tile(v_mont_int: int):
    """Python-int Montgomery residue -> (32, TL) int32 broadcast tile."""
    return jnp.asarray(
        np.tile(_ints_to_cols(v_mont_int, NLIMBS).reshape(NLIMBS, 1), (1, TL))
    )


def pow_series_u8(base_int: int, k: int, idx: np.ndarray):
    """[base^idx(j)]_j as a (32, n)-u8 limbs-on-sublanes array.

    idx = bitrev gives the per-coset coefficient scaling in the engine's
    bitrev lane order; idx = arange gives the natural-order power series
    (evaluation points).  The scalar square chain base^(2^b) runs in
    Python ints (exact); per bit one ew Pallas mul + an XLA lane select.
    Output values are in [0, 2p) (redundant ok: consumers are mont
    muls)."""
    n = 1 << k
    one_col = _ints_to_cols(FR.r_mod_p, NLIMBS).astype(np.uint8)
    acc = jnp.asarray(np.tile(one_col.reshape(NLIMBS, 1), (1, n)))
    sq = base_int % R
    idx = np.asarray(idx)
    for b in range(k):
        m = ew_mul_scalar_u8(acc, scalar_tile(sq * (1 << 256) % R), 1, False)
        take = jnp.asarray(((idx >> b) & 1).astype(bool))[None, :]
        acc = jnp.where(take, m, acc)
        sq = sq * sq % R
    return acc


def pow_series_bitrev_u8(base_int: int, k: int, bitrev: np.ndarray):
    return pow_series_u8(base_int, k, bitrev)


def _empty_tw_cat():
    """Placeholder global table for k <= LOCAL_STAGES (never read)."""
    return jnp.zeros((NLIMBS, TL), jnp.uint8)


def prep_twiddles_dev(omega_nat_u8, k: int):
    """Device-built twiddle tables from the natural-order omega power
    series: stage s of a size-2^k DIT NTT uses w_m^j = omega^{(n/m) j}
    (m = 2^{s+1}) — strided lane slices of the series.  Replaces the
    host NttPlan twiddle loop, which is ~2^k Python pow() calls (~90s at
    k=21 on this 2-core host).  Twiddle values are in [0, 2p) (mul
    operands; redundancy is absorbed by the final canonicalization)."""
    n = 1 << k
    nloc = min(LOCAL_STAGES, k)
    loc = []
    for s in range(nloc):
        m = 1 << (s + 1)
        t = omega_nat_u8[:, :: n // m][:, : 1 << s].astype(jnp.int32)
        loc.append(jnp.tile(t, (1, TL // (1 << s))))
    local_tws = jnp.concatenate(loc, axis=0)
    if k <= nloc:
        return local_tws, _empty_tw_cat()
    tw_cat = jnp.concatenate(
        [
            omega_nat_u8[:, :: n // (1 << (s + 1))][:, : 1 << s]
            for s in range(nloc, k)
        ],
        axis=1,
    )
    return local_tws, tw_cat


# -- twiddle / permutation prep ----------------------------------------------


def prep_twiddles(plan):
    """From an ops/ntt.NttPlan (host-computed tables), build the device
    twiddle structures for ntt_batched_u8: (local_tws i32, tw_cat u8
    lane-concatenation of the global stage tables)."""
    k = plan.k
    nloc = min(LOCAL_STAGES, k)
    loc = []
    for s in range(nloc):
        t = np.asarray(plan.stage_twiddles[s], np.int32)  # (2^s, 32)
        reps = TL // t.shape[0]
        loc.append(np.tile(t.T, (1, reps)))  # (32, TL) periodic
    local_tws = jnp.asarray(np.concatenate(loc, axis=0))
    if k <= nloc:
        return local_tws, _empty_tw_cat()
    tw_cat = jnp.asarray(
        np.concatenate(
            [
                np.asarray(plan.stage_twiddles[s], np.uint8).T
                for s in range(nloc, k)
            ],
            axis=1,
        )
    )
    return local_tws, tw_cat


def pack_columns_bitrev(cols_u64, bitrev):
    """Host-side: list of (n, 4)-u64 mont coefficient columns -> one
    (C*32, n) uint8 stacked array in engine layout (limbs on sublanes),
    coefficients bit-reverse permuted (so the DIT kernels emit
    natural-order evaluations).  ~1s/column on this host at k=21; an
    XLA u8 transpose of the same data on-device measured ~15 MINUTES
    (pathological u8 relayout), so the transpose stays on the host."""
    n = cols_u64[0].shape[0]
    out = np.empty((len(cols_u64) * NLIMBS, n), np.uint8)
    for c, col in enumerate(cols_u64):
        a = np.ascontiguousarray(col, dtype="<u8")[bitrev]
        out[c * NLIMBS : (c + 1) * NLIMBS] = (
            a.view(np.uint8).reshape(n, 32).T
        )
    return out
