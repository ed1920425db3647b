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
    _cond_sub,
    _ints_to_cols,
    _mont_mul,
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
    hi by the periodic twiddle, and keeps add or sub by lane parity."""
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
        t = _mont_mul(fc, hi_v, tw)
        x = jnp.where(is_lo, _add(fc, lo_v, t), _sub(fc, lo_v, t))
    if canon:
        x = _cond_sub(compp_ref[:], x)
    o_ref[:] = x.astype(jnp.uint8)


def _gstage_kernel(hb, canon,
                   p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref, compp_ref,
                   own_ref, part_ref, tw_ref, o_ref):
    """One global butterfly stage, output-tile centric: each grid step
    owns ONE output tile, fetches its pair partner via the block
    schedule, and keeps the add (lo role) or sub (hi role) half.  The
    pair's product is computed by both tiles of the pair — 2x muls, but
    muls are ~10ms per 2^21 at VMEM speeds and the schedule stays a pure
    function of the grid index (every output block written exactly
    once)."""
    g = pl.program_id(1)
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    own = own_ref[:].astype(jnp.int32)
    part = part_ref[:].astype(jnp.int32)
    is_lo = g % (2 * hb) < hb  # scalar, traced
    lo = jnp.where(is_lo, own, part)
    hi = jnp.where(is_lo, part, own)
    t = _mont_mul(fc, hi, tw_ref[:])
    r = jnp.where(is_lo, _add(fc, lo, t), _sub(fc, lo, t))
    if canon:
        r = _cond_sub(compp_ref[:], r)
    o_ref[:] = r.astype(jnp.uint8)


def _ew_mul_kernel(canon,
                   p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref, compp_ref,
                   a_ref, b_ref, o_ref):
    """Elementwise Montgomery product of a u8 batch tile with a shared
    u8 multiplier tile (both limbs-on-sublanes)."""
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    r = _mont_mul(fc, a_ref[:].astype(jnp.int32), b_ref[:].astype(jnp.int32))
    if canon:
        r = _cond_sub(compp_ref[:], r)
    o_ref[:] = r.astype(jnp.uint8)


# -- drivers ------------------------------------------------------------------


def _cspec():
    return pl.BlockSpec(
        (NLIMBS, TL), lambda c, g: (0, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ntt_batched_u8(X, tws, k: int, C: int, canon: bool = True):
    """Batched DIT NTT over a (C*32, n)-u8 stacked column array whose
    lanes hold coefficients in bit-reversed order; returns natural-order
    evaluations (canonical limbs when `canon`).

    tws = (local_tws, g_tw_list): local_tws a (LOCAL*32, 128)-i32 array
    of periodic early-stage twiddles; g_tw_list[i] a (32, 2^s)-i32 array
    for global stage s = LOCAL_STAGES + i.  Build both with
    `prep_twiddles`."""
    n = 1 << k
    assert k >= LOCAL_STAGES, "ntt_batched_u8 requires n >= 128 lanes"
    local_tws, g_tws = tws
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

    for i, s in enumerate(range(nloc, k)):
        half = 1 << s
        hb = half // TL
        own = pl.BlockSpec(
            (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
        )
        part = pl.BlockSpec(
            (NLIMBS, TL),
            lambda c, g, hb=hb: (c, gstage_partner_block(g, hb)),
            memory_space=pltpu.VMEM,
        )
        tw = pl.BlockSpec(
            (NLIMBS, TL),
            lambda c, g, hb=hb: (0, gstage_tw_block(g, hb)),
            memory_space=pltpu.VMEM,
        )
        X = pl.pallas_call(
            functools.partial(_gstage_kernel, hb, canon and s == k - 1),
            grid=(C, n // TL),
            in_specs=[_cspec() for _ in range(6)] + [own, part, tw],
            out_specs=own,
            out_shape=jax.ShapeDtypeStruct((C * NLIMBS, n), jnp.uint8),
        )(*consts, X, X, g_tws[i])
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
        x = jnp.where(
            is_lo,
            _add(fc, lo_v, hi_v),
            _mont_mul(fc, _sub(fc, lo_v, hi_v), tw),
        )
    if canon:
        x = _cond_sub(compp_ref[:], x)
    o_ref[:] = x.astype(jnp.uint8)


def _gstage_dif_kernel(hb, canon,
                       p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                       compp_ref, own_ref, part_ref, tw_ref, o_ref):
    """DIF global butterfly stage (output-tile centric, same schedule as
    _gstage_kernel)."""
    g = pl.program_id(1)
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    own = own_ref[:].astype(jnp.int32)
    part = part_ref[:].astype(jnp.int32)
    is_lo = g % (2 * hb) < hb
    lo = jnp.where(is_lo, own, part)
    hi = jnp.where(is_lo, part, own)
    r = jnp.where(
        is_lo,
        _add(fc, lo, hi),
        _mont_mul(fc, _sub(fc, lo, hi), tw_ref[:]),
    )
    if canon:
        r = _cond_sub(compp_ref[:], r)
    o_ref[:] = r.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(3, 4))
def intt_batched_u8(X, tws, ninv_tile, k: int, C: int):
    """Batched inverse NTT via DIF: (C*32, n)-u8 NATURAL-order
    evaluations -> BIT-REVERSED-order canonical coefficients — exactly
    the layout `ntt_batched_u8` consumes, so an INTT -> coset-NTT
    pipeline needs no permutation anywhere.

    tws: prep_twiddles of an INVERSE-omega NttPlan; ninv_tile: n^{-1}
    Montgomery (32, TL)-i32 tile (scalar_tile(FR.to_mont-int of 1/n))."""
    n = 1 << k
    assert k >= LOCAL_STAGES
    local_tws, g_tws = tws
    nloc = min(LOCAL_STAGES, k)
    consts = _consts_dev()

    for i, s in enumerate(range(k - 1, nloc - 1, -1)):
        half = 1 << s
        hb = half // TL
        own = pl.BlockSpec(
            (NLIMBS, TL), lambda c, g: (c, g), memory_space=pltpu.VMEM
        )
        part = pl.BlockSpec(
            (NLIMBS, TL),
            lambda c, g, hb=hb: (c, gstage_partner_block(g, hb)),
            memory_space=pltpu.VMEM,
        )
        tw = pl.BlockSpec(
            (NLIMBS, TL),
            lambda c, g, hb=hb: (0, gstage_tw_block(g, hb)),
            memory_space=pltpu.VMEM,
        )
        X = pl.pallas_call(
            functools.partial(_gstage_dif_kernel, hb, False),
            grid=(C, n // TL),
            in_specs=[_cspec() for _ in range(6)] + [own, part, tw],
            out_specs=own,
            out_shape=jax.ShapeDtypeStruct((C * NLIMBS, n), jnp.uint8),
        )(*consts, X, X, g_tws[s - nloc])

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
    r = _mont_mul(fc, a_ref[:].astype(jnp.int32), b_ref[:])
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
    g_tws = [
        omega_nat_u8[:, :: n // (1 << (s + 1))][:, : 1 << s].astype(jnp.int32)
        for s in range(nloc, k)
    ]
    return local_tws, g_tws


# -- twiddle / permutation prep ----------------------------------------------


def prep_twiddles(plan):
    """From an ops/ntt.NttPlan (host-computed tables), build the device
    twiddle structures for ntt_batched_u8."""
    k = plan.k
    nloc = min(LOCAL_STAGES, k)
    loc = []
    for s in range(nloc):
        t = np.asarray(plan.stage_twiddles[s], np.int32)  # (2^s, 32)
        reps = TL // t.shape[0]
        loc.append(np.tile(t.T, (1, reps)))  # (32, TL) periodic
    local_tws = jnp.asarray(np.concatenate(loc, axis=0))
    g_tws = [
        jnp.asarray(np.asarray(plan.stage_twiddles[s], np.int32).T)
        for s in range(nloc, k)
    ]
    return local_tws, g_tws


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
