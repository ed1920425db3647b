"""Pallas TPU kernel v2 for the hot EC path: VMEM-resident scalar-mul.

Replaces the round-1 v1 kernel (removed) whose (tile, 32) blocks put the
32-limb axis on the 128-wide lane dimension — 75% of the VPU idle and a
lane-rotation fixup per convolution shift (measured 995 scalar-muls/s,
BELOW the XLA scan's 2.9K/s).  v2 transposes the layout:

    (LIMBS, T): limbs on sublanes, batch lanes on the 128-lane axis.

Every field op then runs on fully-populated vregs, and the convolution's
pad-shifts move along sublanes (cheap vreg-row offsets).  Two more wins
over v1, both classic redundant-Montgomery tricks:

  * values live in [0, 2p) — mont_mul output is < 2p whenever the input
    value-bound product c1*c2 <= 5 (here always 4), so the conditional
    subtraction v1 paid on EVERY op happens only in add/sub;
  * the exact carry+lookahead runs once per mont_mul; the two inner
    convolution operands are only RELAXED (2 rounds of partial carry,
    limbs <= 287 < 2^9, conv terms < 2^21.3 — no int32 overflow).

Zero-checks use mod-p semantics (v == 0 or v == p) because [0, 2p)
admits two representatives of 0̄ — the h/r equality and infinity tests in
jac_add would otherwise mistake a p-representative for nonzero.

Cited reference cost center: `/root/reference/src/multiopen.rs:393`'s
mul_var ladder — this kernel is its batched device replacement inside
verify_algebra_fast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import LIMB_BITS, NLIMBS, Q
from .field_ops import FQ

_MASK = (1 << LIMB_BITS) - 1

# constant indices into the fc (field-constant) tuple; slot 2 (_SUBK)
# holds the _sub constant 2p - 2S (see _sub_const_cols), NOT plain 2p
_P, _PINV, _SUBK, _COMP2P, _ONE = range(5)

#: S = 0x0101...01 = (2^256 - 1)/255 — the all-ones-bytes integer; the
#: per-limb complement (257 - b_i) contributes 257*S = (2^256 - 1) + 2S,
#: so _sub's constant pre-subtracts the 2S surplus
_SUB_BIAS = ((1 << 256) - 1) // 255


def _ints_to_cols(x: int, nlimbs: int) -> np.ndarray:
    return np.array(
        [(x >> (LIMB_BITS * i)) & _MASK for i in range(nlimbs)], np.int32
    )


def _sub_const_cols(p_int: int) -> np.ndarray:
    """Limbs of 2p - 2S, the fc[_SUBK] constant: with the 257-complement
    in `_sub`, columns stay non-negative for ANY modulus p and any
    relaxed operand limbs <= 257 (the old 255-complement + plain-2p form
    needed every byte of 2p to be >= 2, which holds for Fq but NOT for
    Fr — 2R has a zero byte)."""
    return _ints_to_cols(2 * p_int - 2 * _SUB_BIAS, NLIMBS)


def _shift_dn(e, k=1):
    """Shift limbs toward higher index along the sublane (limb) axis."""
    return jnp.pad(e, [(k, 0)] + [(0, 0)] * (e.ndim - 1))[: e.shape[0]]


def _relax(x, rounds):
    """Partial carry: after r rounds limbs <= 255 + max_in >> (8*r).
    Carry out of the top limb is dropped (callers rely on mod-2^256
    semantics or have headroom)."""
    for _ in range(rounds):
        x = (x & _MASK) + _shift_dn(x >> LIMB_BITS)
    return x


def _carry(x, n_out, rounds=1):
    """Exact carry propagation (non-negative cols) -> canonical limbs of
    value mod 2^(8*n_out); Kogge-Stone lookahead along sublanes.

    `rounds` ripple rounds must bring every column <= 511 — the final
    built-in round then yields s in [0, 256], which the lookahead
    resolves exactly (g = s>>8 in {0,1}, p = s==255).  Call-site bounds
    (derived in ROADMAP 'relaxed-domain mont-mul'):
      * rounds=1 covers cols <= 65.5K (r1: 255 + C>>8 <= 511 iff
        C <= 65.5K; the actual users are _add/_sub/_cond_sub at
        C <= 770);
      * rounds=2 covers cols <= ~16.7M (mont's t+u at <= 4.6M).
    The round-3 kernel spent 5 ripple rounds on every carry; these were
    pure issue-rate overhead at the real bounds."""
    k = x.shape[0]
    if k < n_out:
        x = jnp.pad(x, [(0, n_out - k)] + [(0, 0)] * (x.ndim - 1))
    elif k > n_out:
        x = x[:n_out]
    for _ in range(rounds):
        x = (x & _MASK) + _shift_dn(x >> LIMB_BITS)
    s = (x & _MASK) + _shift_dn(x >> LIMB_BITS)  # cols in [0, 256]
    g = s >> LIMB_BITS
    p = (s == _MASK).astype(x.dtype)
    shift = 1
    while shift < n_out:
        gs = jnp.pad(g, [(shift, 0)] + [(0, 0)] * (g.ndim - 1))[:n_out]
        ps = jnp.pad(p, [(shift, 0)] + [(0, 0)] * (p.ndim - 1))[:n_out]
        g = g | (p & gs)
        p = p & ps
        shift *= 2
    return (s + _shift_dn(g)) & _MASK


_CONV_GROUP = 4


def _conv(a, b, n_out):
    """Limb convolution along sublanes: out[k] = sum_{i+j=k} a[i]*b[j],
    truncated to n_out columns (n_out=32 is the mod-2^256 low half).

    MACs run in groups of G=4: four pre-shifted copies of b (one-time
    +0..+3 sublane pads) let each group accumulate in a (NLIMBS+3, T)
    block with ONE large sublane pad per group instead of per product.
    The pads are register shuffles that occupy ALU issue slots without
    doing arithmetic (ROADMAP 'issue rate'); grouping cuts them 4x for
    +3 zero rows per multiply."""
    t = b.shape[-1]
    G = _CONV_GROUP
    rows = NLIMBS + G - 1
    bs = [jnp.pad(b, [(j, G - 1 - j), (0, 0)]) for j in range(G)]
    out = jnp.zeros((n_out, t), jnp.int32)
    for i0 in range(0, NLIMBS, G):
        take = min(rows, n_out - i0)
        if take <= 0:
            break
        acc = a[i0 : i0 + 1, :] * bs[0]
        for j in range(1, G):
            acc = acc + a[i0 + j : i0 + j + 1, :] * bs[j]
        out = out + jnp.pad(acc[:take], [(i0, n_out - i0 - take), (0, 0)])
        del acc
    return out


def _mont_mul(fc, a, b):
    """Exact Montgomery product: limbs in [0, 2^9), values < 2p each ->
    CANONICAL 8-bit limbs, value < 2p.  The NTT engine stores results as
    u8, so this variant keeps the exact carry; the EC formulas use
    `_mont_mul_r` except for z-coordinates (whose canonical rep feeds
    `_is_zero`)."""
    t = _conv(a, b, 2 * NLIMBS)  # cols < 32*257^2 < 2^21.1
    tl = _relax(t[:NLIMBS], 2)  # <= 288, value mod 2^256 preserved
    m = _relax(_conv(tl, fc[_PINV], NLIMBS), 2)  # <= 291
    u = _conv(m, fc[_P], 2 * NLIMBS)  # cols < 2^21.2
    s = _carry(t + u, 2 * NLIMBS, rounds=2)  # t+u <= 4.6M
    return s[NLIMBS:]


def _low_nonzero(x):
    """(NLIMBS, T) non-negative columns -> (1, T) int32: 1 iff any col
    is nonzero (sum-reduce: cols <= 2^9 so no overflow at 32 rows)."""
    return (jnp.sum(x, axis=0, keepdims=True) != 0).astype(jnp.int32)


def _mont_mul_r(fc, a, b):
    """RELAXED-domain Montgomery product (ROADMAP round-4 item: the
    issue-rate fix).  Same contract as `_mont_mul` — limbs < 2^9, value
    < 2p in, value < 2p out — but the result is a possibly NON-canonical
    limb representation (limbs <= 257), so it must not feed `_is_zero`
    or a u8 store; `_add`/`_sub`/`_conv`/`_final_kernel` all accept it.

    Replaces the exact ~3K-op `_carry` ending (5 ripple rounds + 6-level
    Kogge-Stone over 64 limbs) with 3 partial-carry rounds + ONE
    carry-out detect: after relaxing, the low half V_low has limbs
    <= 256, is ≡ 0 mod 2^256 (Montgomery construction), and is
    < 1.004 * 2^256, hence V_low ∈ {0, 2^256} — the carry into the high
    half is simply any(low != 0)."""
    t = _conv(a, b, 2 * NLIMBS)
    tl = _relax(t[:NLIMBS], 2)
    m = _relax(_conv(tl, fc[_PINV], NLIMBS), 2)
    u = _conv(m, fc[_P], 2 * NLIMBS)
    s = _relax(t + u, 3)  # limbs <= 256 (t+u cols <= 4.6M < 2^24)
    carry = _low_nonzero(s[:NLIMBS])
    hi = s[NLIMBS:]
    one_hot0 = lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0) == 0
    return hi + jnp.where(one_hot0, carry, 0)


def _cond_sub(fc_comp, a):
    """a (32, T) canonical limbs, value < 2M; subtract M when a >= M.
    fc_comp = limbs of 2^256 - M."""
    s = _carry(a + fc_comp, NLIMBS + 1)
    ge = s[NLIMBS:].astype(bool)  # (1, T)
    return jnp.where(ge, s[:NLIMBS], a)


def _add(fc, a, b):
    t = _carry(a + b, NLIMBS)  # value < 4p < 2^256
    return _cond_sub(fc[_COMP2P], t)


def _sub(fc, a, b):
    # a - b + 2p (+ 2^256, dropped by the mod-2^256 carry), via the
    # 257-complement: t_i = a_i + (2p - 2S)_i + (257 - b_i) + [i == 0],
    # whose total is a - b + 2p + 2^256 (257*S = 2^256 - 1 + 2S) and
    # whose columns are non-negative for ANY modulus and any RELAXED
    # operand limbs <= 257 (`_mont_mul_r`'s bound).
    one_hot0 = (
        lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0) == 0
    ).astype(jnp.int32)
    t = a + fc[_SUBK] + ((_MASK + 2) - b) + one_hot0
    return _cond_sub(fc[_COMP2P], _carry(t, NLIMBS))


def _is_zero(fc, a):
    """v == 0̄ (mod p) for v in [0, 2p): v == 0 or v == p.  (1, T) bool."""
    eq0 = jnp.all(a == 0, axis=0, keepdims=True)
    eqp = jnp.all(a == fc[_P], axis=0, keepdims=True)
    return eq0 | eqp


def _sel(mask, a, b):
    """mask (1, T) bool, sublane-broadcast select."""
    return jnp.where(mask, a, b)


def _jac_double(fc, x, y, z):
    # all intermediates relaxed (_mont_mul_r); x3/y3 exit through _sub
    # (canonical), z3 through the exact _mont_mul (feeds _is_zero)
    A = _mont_mul_r(fc, x, x)
    Bb = _mont_mul_r(fc, y, y)
    C = _mont_mul_r(fc, Bb, Bb)
    t = _add(fc, x, Bb)
    t = _mont_mul_r(fc, t, t)
    D = _sub(fc, _sub(fc, t, A), C)
    D = _add(fc, D, D)
    E = _add(fc, _add(fc, A, A), A)
    F = _mont_mul_r(fc, E, E)
    x3 = _sub(fc, F, _add(fc, D, D))
    c8 = _add(fc, C, C)
    c8 = _add(fc, c8, c8)
    c8 = _add(fc, c8, c8)
    y3 = _sub(fc, _mont_mul_r(fc, E, _sub(fc, D, x3)), c8)
    z3 = _mont_mul(fc, _add(fc, y, y), z)
    return x3, y3, z3


def _jac_add(fc, x1, y1, z1, x2, y2, z2):
    # intermediates relaxed; z3's OUTER product exact (feeds _is_zero)
    z1z1 = _mont_mul_r(fc, z1, z1)
    z2z2 = _mont_mul_r(fc, z2, z2)
    u1 = _mont_mul_r(fc, x1, z2z2)
    u2 = _mont_mul_r(fc, x2, z1z1)
    s1 = _mont_mul_r(fc, y1, _mont_mul_r(fc, z2, z2z2))
    s2 = _mont_mul_r(fc, y2, _mont_mul_r(fc, z1, z1z1))
    h = _sub(fc, u2, u1)
    r = _sub(fc, s2, s1)
    h2 = _mont_mul_r(fc, h, h)
    h3 = _mont_mul_r(fc, h2, h)
    u1h2 = _mont_mul_r(fc, u1, h2)
    x3 = _sub(fc, _sub(fc, _mont_mul_r(fc, r, r), h3), _add(fc, u1h2, u1h2))
    y3 = _sub(fc, _mont_mul_r(fc, r, _sub(fc, u1h2, x3)), _mont_mul_r(fc, s1, h3))
    z3 = _mont_mul(fc, _mont_mul_r(fc, z1, z2), h)

    p_inf = _is_zero(fc, z1)
    q_inf = _is_zero(fc, z2)
    h0 = _is_zero(fc, h)
    r0 = _is_zero(fc, r)
    dbl = _jac_double(fc, x1, y1, z1)
    use_dbl = (~p_inf) & (~q_inf) & h0 & r0
    x3 = _sel(use_dbl, dbl[0], x3)
    y3 = _sel(use_dbl, dbl[1], y3)
    z3 = _sel(use_dbl, dbl[2], z3)
    x3 = _sel(q_inf, x1, _sel(p_inf, x2, x3))
    y3 = _sel(q_inf, y1, _sel(p_inf, y2, y3))
    z3 = _sel(q_inf, z1, _sel(p_inf, z2, z3))
    return x3, y3, z3


def _jac_add_mixed(fc, x1, y1, z1, x2, y2):
    """Jacobian + affine (z2 == 1) add: 11 mont_muls vs _jac_add's 16
    (plus the shared branchless double path), the classic 'madd'
    saving — the MSM kernel's streamed points are always affine.
    Handles bucket-at-infinity (z1 == 0 -> (x2, y2, 1)) and the
    bucket==point case (h == r == 0 -> double); P + (-P) falls out as
    z3 = z1*h = 0."""
    z1z1 = _mont_mul_r(fc, z1, z1)
    u2 = _mont_mul_r(fc, x2, z1z1)
    s2 = _mont_mul_r(fc, y2, _mont_mul_r(fc, z1, z1z1))
    h = _sub(fc, u2, x1)
    r = _sub(fc, s2, y1)
    h2 = _mont_mul_r(fc, h, h)
    h3 = _mont_mul_r(fc, h2, h)
    u1h2 = _mont_mul_r(fc, x1, h2)
    x3 = _sub(fc, _sub(fc, _mont_mul_r(fc, r, r), h3), _add(fc, u1h2, u1h2))
    y3 = _sub(fc, _mont_mul_r(fc, r, _sub(fc, u1h2, x3)), _mont_mul_r(fc, y1, h3))
    z3 = _mont_mul(fc, z1, h)

    p_inf = _is_zero(fc, z1)
    h0 = _is_zero(fc, h)
    r0 = _is_zero(fc, r)
    dbl = _jac_double(fc, x1, y1, z1)
    use_dbl = (~p_inf) & h0 & r0
    x3 = _sel(use_dbl, dbl[0], x3)
    y3 = _sel(use_dbl, dbl[1], y3)
    z3 = _sel(use_dbl, dbl[2], z3)
    x3 = _sel(p_inf, x2, x3)
    y3 = _sel(p_inf, y2, y3)
    z3 = _sel(p_inf, fc[_ONE], z3)
    return x3, y3, z3


def _ladder_kernel(nbits, p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                   px_ref, py_ref, pz_ref, s_ref,
                   ox_ref, oy_ref, oz_ref):
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    s = s_ref[:]
    t = px.shape[1]
    one = fc[_ONE]
    acc_x = jnp.zeros((NLIMBS, t), jnp.int32) + one
    acc_y = acc_x
    acc_z = jnp.zeros((NLIMBS, t), jnp.int32)

    limb_ids = lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0)

    def body(i, carry):
        ax, ay, az = carry
        bit_idx = nbits - 1 - i
        limb = bit_idx // LIMB_BITS
        off = bit_idx % LIMB_BITS
        # no dynamic sublane slicing in Mosaic: mask + reduce instead
        limb_val = jnp.sum(
            jnp.where(limb_ids == limb, s, 0), axis=0, keepdims=True
        )
        take = ((limb_val >> off) & 1).astype(bool)  # (1, T)
        ax, ay, az = _jac_double(fc, ax, ay, az)
        nx, ny, nz = _jac_add(fc, ax, ay, az, px, py, pz)
        ax = _sel(take, nx, ax)
        ay = _sel(take, ny, ay)
        az = _sel(take, nz, az)
        return ax, ay, az

    acc_x, acc_y, acc_z = lax.fori_loop(0, nbits, body, (acc_x, acc_y, acc_z))
    ox_ref[:] = acc_x
    oy_ref[:] = acc_y
    oz_ref[:] = acc_z


def _win_kernel(n_win, p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                px_ref, py_ref, pz_ref, w_ref,
                ox_ref, oy_ref, oz_ref):
    """4-bit windowed ladder: 64 iterations of (4 doubles + 1 table add)
    instead of 254 of (double + add) — ~2.2x fewer mont_muls (3474 vs
    7620 per scalar-mul, incl. the 16-entry table build's 210).  The
    table lives in VMEM (16 points x 3 coords x (32, T) i32 = 768 KB at
    T=128) and the per-window entry is picked by a 4-level branchless
    select tree; entry 0 is the identity, which `_jac_add` absorbs, so a
    zero window needs no special case.  Replaces the reference cost
    center `/root/reference/src/multiopen.rs:393` (mul_var)."""
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    wins = w_ref[:]  # (n_win, T) values in [0, 16)
    t = px.shape[1]
    one = fc[_ONE]
    zero = jnp.zeros((NLIMBS, t), jnp.int32)
    ident = (zero + one, zero + one, zero)

    # table[k] = k*P: evens by doubling, odds by adding P
    tbl = [ident, (px, py, pz)]
    for k in range(2, 16):
        if k % 2 == 0:
            tbl.append(_jac_double(fc, *tbl[k // 2]))
        else:
            tbl.append(_jac_add(fc, *tbl[k - 1], px, py, pz))

    win_ids = lax.broadcasted_iota(jnp.int32, (n_win, 1), 0)

    def body(i, carry):
        ax, ay, az = carry
        w_idx = n_win - 1 - i
        # no dynamic sublane slicing in Mosaic: mask + reduce
        wval = jnp.sum(
            jnp.where(win_ids == w_idx, wins, 0), axis=0, keepdims=True
        )  # (1, T)
        for _ in range(4):
            ax, ay, az = _jac_double(fc, ax, ay, az)
        cur = tbl
        for bit in range(4):
            b = ((wval >> bit) & 1).astype(bool)
            cur = [
                tuple(_sel(b, h, l) for l, h in zip(lo, hi))
                for lo, hi in zip(cur[0::2], cur[1::2])
            ]
        tx, ty, tz = cur[0]
        return _jac_add(fc, ax, ay, az, tx, ty, tz)

    acc = lax.fori_loop(0, n_win, body, ident)
    ox_ref[:] = acc[0]
    oy_ref[:] = acc[1]
    oz_ref[:] = acc[2]


def _msm_kernel(n_steps, wpg, p_ref, pinv_ref, twop_ref, comp2p_ref, one_ref,
                px_ref, py_ref, s_ref,
                obx_ref, oby_ref, obz_ref,
                bx_ref, by_ref, bz_ref):
    """Bucket-accumulation pass of the Pippenger MSM (one window-group).

    Grid (n_groups, n_steps): for window-group g, stream the points in
    (NLIMBS, T) tiles; every lane owns a private 16-entry bucket table
    per window (scratch refs, wpg x 16 x (32, T) i32 per coordinate =
    3 MB at wpg=4, T=128).  Per step and window: extract the 4-bit digit
    from the scalar limbs (mask+reduce — no dynamic sublane slicing in
    Mosaic), gather bucket[digit] with a branchless select tree, ONE
    jac_add with the streamed point, scatter back with 16 masked writes.
    Select traffic is ~3 mont_muls-equivalent vs the add's ~24, so the
    VPU stays on field math.  Bucket 0 is a dump (never folded), which
    makes zero digits, zero scalars, padding lanes and infinity inputs
    (their scalars are pre-zeroed) all inert with no special casing.

    The reference's MSMs live inside its private halo2 fork's multiexp
    (SURVEY.md §2b, `commit_lagrange` examples/simple-example.rs:632-641);
    this kernel is the TPU-native equivalent feeding kzg.Params.

    Work: n point-adds per window x ceil(nbits/4) windows; the fold
    (suffix sums + cross-lane tree + Horner) happens outside in batched
    XLA — it is O(windows * (16 + log T)) and invariant in n."""
    g = pl.program_id(0)
    s_id = pl.program_id(1)
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    one = fc[_ONE]
    nb = 16  # buckets per 4-bit window

    @pl.when(s_id == 0)
    def _init():
        for j in range(wpg * nb):
            rows = slice(j * NLIMBS, (j + 1) * NLIMBS)
            bx_ref[rows] = one
            by_ref[rows] = one
            bz_ref[rows] = jnp.zeros_like(one)

    px, py = px_ref[:], py_ref[:]
    pz = jnp.zeros_like(px) + one
    sc = s_ref[:]
    limb_ids = lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0)

    for j in range(wpg):
        # window index g*wpg + j -> scalar limb (g*wpg + j) // 2; wpg is
        # even (asserted by the wrapper), so the digit parity — hence the
        # 4-bit shift below — is static in j
        limb_idx = (g * wpg + j) // 2
        lv = jnp.sum(
            jnp.where(limb_ids == limb_idx, sc, 0), axis=0, keepdims=True
        )
        dig = (lv >> (4 * (j % 2))) & 15  # (1, T) in [0, 16)

        base = j * nb
        row = lambda k: slice((base + k) * NLIMBS, (base + k + 1) * NLIMBS)
        bukx = [bx_ref[row(k)] for k in range(nb)]
        buky = [by_ref[row(k)] for k in range(nb)]
        bukz = [bz_ref[row(k)] for k in range(nb)]

        curx, cury, curz = bukx, buky, bukz
        for bit in range(4):
            m = ((dig >> bit) & 1).astype(bool)
            curx = [_sel(m, curx[2 * i + 1], curx[2 * i]) for i in range(len(curx) // 2)]
            cury = [_sel(m, cury[2 * i + 1], cury[2 * i]) for i in range(len(cury) // 2)]
            curz = [_sel(m, curz[2 * i + 1], curz[2 * i]) for i in range(len(curz) // 2)]

        nx, ny, nz = _jac_add(fc, curx[0], cury[0], curz[0], px, py, pz)

        for k in range(nb):
            m = dig == k
            bx_ref[row(k)] = _sel(m, nx, bukx[k])
            by_ref[row(k)] = _sel(m, ny, buky[k])
            bz_ref[row(k)] = _sel(m, nz, bukz[k])

    @pl.when(s_id == n_steps - 1)
    def _dump():
        obx_ref[:] = bx_ref[:]
        oby_ref[:] = by_ref[:]
        obz_ref[:] = bz_ref[:]


def _msm_kernel_s5(n_steps, wpg, kfold, p_ref, pinv_ref, twop_ref, comp2p_ref,
                   one_ref, px_ref, py_ref, d_ref,
                   obx_ref, oby_ref, obz_ref,
                   bx_ref, by_ref, bz_ref):
    """Signed 5-bit-digit bucket pass with mixed (affine) adds.

    Two upgrades over `_msm_kernel` (ROADMAP 'Device MSM status'):
      * signed 5-bit windows: 52 windows instead of 64 -> 19% fewer
        point-adds, the kernel's dominant cost.  Digits are recoded to
        d in [-16, 15] on-device in XLA (`signed_windows_dev`) and
        streamed as (n_win, T) encoded tiles (|d| in bits 0-4, sign in
        bit 5); negation is one `_sub` per step (y -> -y), shared by
        all windows.
      * `_jac_add_mixed` (z2 == 1): 18 mont_muls per bucket add vs the
        full add's 23.

    Buckets per window: 17 (|d| = 0..16; 0 is the dump row, never
    folded — zero digits, zero scalars, padding lanes and pre-zeroed
    infinity inputs are all inert).  Bucket gather is a 4-level select
    tree over |d| bits 0-3 plus one final select for |d| == 16."""
    g = pl.program_id(0)
    s_id = pl.program_id(1)
    fc = (p_ref[:], pinv_ref[:], twop_ref[:], comp2p_ref[:], one_ref[:])
    one = fc[_ONE]
    nb = 17  # buckets per signed 5-bit window

    @pl.when(s_id == 0)
    def _init():
        for j in range(wpg * nb):
            rows = slice(j * NLIMBS, (j + 1) * NLIMBS)
            bx_ref[rows] = one
            by_ref[rows] = one
            bz_ref[rows] = jnp.zeros_like(one)

    px, py = px_ref[:], py_ref[:]
    pyn = _sub(fc, jnp.zeros_like(py), py)  # -y, shared across windows
    enc = d_ref[:]  # (n_win, T) encoded digits
    n_win = enc.shape[0]
    win_ids = lax.broadcasted_iota(jnp.int32, (n_win, 1), 0)

    for j in range(wpg):
        widx = g * wpg + j
        ev = jnp.sum(
            jnp.where(win_ids == widx, enc, 0), axis=0, keepdims=True
        )  # (1, T)
        mag = ev & 31
        sign = ((ev >> 5) & 1).astype(bool)

        base = j * nb
        row = lambda k: slice((base + k) * NLIMBS, (base + k + 1) * NLIMBS)
        bukx = [bx_ref[row(k)] for k in range(nb)]
        buky = [by_ref[row(k)] for k in range(nb)]
        bukz = [bz_ref[row(k)] for k in range(nb)]

        curx, cury, curz = bukx[:16], buky[:16], bukz[:16]
        for bit in range(4):
            m = ((mag >> bit) & 1).astype(bool)
            curx = [_sel(m, curx[2 * i + 1], curx[2 * i]) for i in range(len(curx) // 2)]
            cury = [_sel(m, cury[2 * i + 1], cury[2 * i]) for i in range(len(cury) // 2)]
            curz = [_sel(m, curz[2 * i + 1], curz[2 * i]) for i in range(len(curz) // 2)]
        m16 = mag >= 16
        cx = _sel(m16, bukx[16], curx[0])
        cy = _sel(m16, buky[16], cury[0])
        cz = _sel(m16, bukz[16], curz[0])

        y_eff = _sel(sign, pyn, py)
        nx, ny, nz = _jac_add_mixed(fc, cx, cy, cz, px, y_eff)

        for k in range(nb):
            m = mag == k
            bx_ref[row(k)] = _sel(m, nx, bukx[k])
            by_ref[row(k)] = _sel(m, ny, buky[k])
            bz_ref[row(k)] = _sel(m, nz, bukz[k])

    @pl.when(s_id == n_steps - 1)
    def _dump():
        if not kfold:
            obx_ref[:] = bx_ref[:]
            oby_ref[:] = by_ref[:]
            obz_ref[:] = bz_ref[:]
            return
        # in-kernel Pippenger fold: tot_j = sum_{m=1}^{16} m * bucket_m
        # via running + suffix sums (fori_loop keeps the trace to 2 adds;
        # bucket[m] gathered with 16 scalar-predicate selects).  Replaces
        # ~0.9s of tiny sequential XLA point-ops with ~ms of VMEM work.
        t = px_ref[:].shape[1]
        zero = jnp.zeros((NLIMBS, t), jnp.int32)
        ident = (zero + one, zero + one, zero)
        for j in range(wpg):
            base = j * nb
            row = lambda k: slice((base + k) * NLIMBS, (base + k + 1) * NLIMBS)

            def fbody(i, carry):
                rx, ry, rz, tx, ty, tz = carry
                m = 16 - i
                sx = bx_ref[row(1)]
                sy = by_ref[row(1)]
                sz = bz_ref[row(1)]
                for k in range(2, nb):
                    cond = m == k
                    sx = jnp.where(cond, bx_ref[row(k)], sx)
                    sy = jnp.where(cond, by_ref[row(k)], sy)
                    sz = jnp.where(cond, bz_ref[row(k)], sz)
                rx, ry, rz = _jac_add(fc, rx, ry, rz, sx, sy, sz)
                tx, ty, tz = _jac_add(fc, tx, ty, tz, rx, ry, rz)
                return rx, ry, rz, tx, ty, tz

            out = lax.fori_loop(0, nb - 1, fbody, (*ident, *ident))
            orow = slice(j * NLIMBS, (j + 1) * NLIMBS)
            obx_ref[orow] = out[3]
            oby_ref[orow] = out[4]
            obz_ref[orow] = out[5]


def _final_kernel(comp_p_ref, x_ref, o_ref):
    """[0,2p) -> [0,p) canonicalization as a tiny second kernel, so host
    decode and XLA-op consumers agree bit-for-bit with the scan path."""
    o_ref[:] = _cond_sub(comp_p_ref[:], x_ref[:])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scalar_mul_pallas2(points_jac, scalars, nbits=254, tile=128, interpret=False):
    """Batched Jacobian scalar-mul, transposed-layout VMEM kernel.

    points_jac: curve_ops.JacPoint with (N, 32) mont coords; scalars
    (N, 32) plain limbs; N a multiple of `tile`.  Output coords are
    canonical [0, p), bit-identical to curve_ops.scalar_mul."""
    from .curve_ops import JacPoint

    n = points_jac.x.shape[0]
    assert n % tile == 0
    grid = (n // tile,)

    def tconst(vals32):
        return jnp.asarray(
            np.tile(np.asarray(vals32, np.int32).reshape(NLIMBS, 1), (1, tile))
        )

    p_int = Q
    consts = [
        tconst(FQ.p_limbs),
        tconst(FQ.p_inv_neg),
        tconst(_sub_const_cols(p_int)),
        tconst(_ints_to_cols((1 << 256) - 2 * p_int, NLIMBS)),
        tconst(FQ.one_mont),
    ]
    comp_p = tconst(_ints_to_cols((1 << 256) - p_int, NLIMBS))

    bs = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cs_spec = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    tr = lambda a: a.T  # (N, 32) -> (32, N)
    out = pl.pallas_call(
        functools.partial(_ladder_kernel, nbits),
        grid=grid,
        in_specs=[cs_spec() for _ in range(5)] + [bs() for _ in range(4)],
        out_specs=(bs(), bs(), bs()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32) for _ in range(3)
        ),
        interpret=interpret,
    )(*consts, tr(points_jac.x), tr(points_jac.y), tr(points_jac.z), tr(scalars))

    canon = lambda a: pl.pallas_call(
        _final_kernel,
        grid=grid,
        in_specs=[cs_spec(), bs()],
        out_specs=bs(),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32),
        interpret=interpret,
    )(comp_p, a)
    return JacPoint(*(canon(c).T for c in out))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scalar_mul_pallas_win(points_jac, scalars, nbits=254, tile=128, interpret=False):
    """Batched Jacobian scalar-mul via the 4-bit windowed VMEM kernel.

    Same point VALUE as `curve_ops.scalar_mul` / `scalar_mul_pallas2`,
    but a different Jacobian representative (different Z) — callers that
    need coordinates go through the affine conversion (`jac_to_ints`),
    which all production consumers already do.  Window values are
    extracted from the 8-bit limb scalars in plain XLA before the kernel
    (each limb holds two windows)."""
    from .curve_ops import JacPoint

    n = points_jac.x.shape[0]
    assert n % tile == 0
    grid = (n // tile,)
    n_win = (nbits + 3) // 4

    def tconst(vals32):
        return jnp.asarray(
            np.tile(np.asarray(vals32, np.int32).reshape(NLIMBS, 1), (1, tile))
        )

    p_int = Q
    consts = [
        tconst(FQ.p_limbs),
        tconst(FQ.p_inv_neg),
        tconst(_sub_const_cols(p_int)),
        tconst(_ints_to_cols((1 << 256) - 2 * p_int, NLIMBS)),
        tconst(FQ.one_mont),
    ]
    comp_p = tconst(_ints_to_cols((1 << 256) - p_int, NLIMBS))

    wins = jnp.stack(
        [(scalars[:, w // 2] >> (4 * (w % 2))) & 15 for w in range(n_win)],
        axis=0,
    )  # (n_win, N)

    bs = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    ws = pl.BlockSpec((n_win, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cs_spec = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    tr = lambda a: a.T
    out = pl.pallas_call(
        functools.partial(_win_kernel, n_win),
        grid=grid,
        in_specs=[cs_spec() for _ in range(5)] + [bs() for _ in range(3)] + [ws],
        out_specs=(bs(), bs(), bs()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32) for _ in range(3)
        ),
        interpret=interpret,
    )(*consts, tr(points_jac.x), tr(points_jac.y), tr(points_jac.z), wins)

    canon = lambda a: pl.pallas_call(
        _final_kernel,
        grid=grid,
        in_specs=[cs_spec(), bs()],
        out_specs=bs(),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32),
        interpret=interpret,
    )(comp_p, a)
    return JacPoint(*(canon(c).T for c in out))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def msm_bucket_pallas(xs, ys, scalars, nbits=254, tile=128, interpret=False):
    """Pippenger MSM: sum_i s_i * (xs_i, ys_i) on the chip.

    xs, ys: (N, 32) Montgomery affine Fq limbs (infinity not allowed —
    callers zero the scalar instead, see ops/msm.py); scalars: (N, 32)
    plain limbs; N a multiple of `tile`.  Returns one JacPoint with
    (32,) canonical-form coords, bit-identical to the XLA bucket path.

    Cost model: the kernel does N * ceil(nbits/4) lane-parallel jac_adds
    (4-bit windows, each point visits every window once); the XLA-side
    fold is O(windows * (16 + log2 tile)) adds, invariant in N."""
    from .curve_ops import JacPoint, jac_add, jac_double, jac_identity

    n = xs.shape[0]
    assert n % tile == 0
    wpg = 4  # windows per kernel pass (must be even: digit parity static)
    n_win = -(-nbits // 4)
    n_win += (-n_win) % wpg
    n_grp = n_win // wpg
    n_steps = n // tile
    rows_pg = wpg * 16 * NLIMBS  # scratch/out rows per group

    def tconst(vals32):
        return jnp.asarray(
            np.tile(np.asarray(vals32, np.int32).reshape(NLIMBS, 1), (1, tile))
        )

    p_int = Q
    consts = [
        tconst(FQ.p_limbs),
        tconst(FQ.p_inv_neg),
        tconst(_sub_const_cols(p_int)),
        tconst(_ints_to_cols((1 << 256) - 2 * p_int, NLIMBS)),
        tconst(FQ.one_mont),
    ]
    comp_p = tconst(_ints_to_cols((1 << 256) - p_int, NLIMBS))

    bs = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda g, s: (0, s), memory_space=pltpu.VMEM
    )
    cs_spec = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda g, s: (0, 0), memory_space=pltpu.VMEM
    )
    os_spec = lambda: pl.BlockSpec(
        (rows_pg, tile), lambda g, s: (g, 0), memory_space=pltpu.VMEM
    )

    tr = lambda a: a.T  # (N, 32) -> (32, N)
    buckets = pl.pallas_call(
        functools.partial(_msm_kernel, n_steps, wpg),
        grid=(n_grp, n_steps),
        in_specs=[cs_spec() for _ in range(5)] + [bs() for _ in range(3)],
        out_specs=(os_spec(), os_spec(), os_spec()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_grp * rows_pg, tile), jnp.int32)
            for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_pg, tile), jnp.int32) for _ in range(3)
        ],
        interpret=interpret,
    )(*consts, tr(xs), tr(ys), tr(scalars))

    fin_bs = pl.BlockSpec(
        (NLIMBS, tile), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fin_cs = pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    canon = lambda a: pl.pallas_call(
        _final_kernel,
        grid=(n_grp * rows_pg // NLIMBS,),
        in_specs=[fin_cs, fin_bs],
        out_specs=fin_bs,
        out_shape=jax.ShapeDtypeStruct((n_grp * rows_pg, tile), jnp.int32),
        interpret=interpret,
    )(comp_p, a)

    # (rows, T) -> (n_win, 16, T, 32) bucket points
    shape = lambda a: jnp.transpose(
        canon(a).reshape(n_win, 16, NLIMBS, tile), (0, 1, 3, 2)
    )
    B = JacPoint(*(shape(c) for c in buckets))

    # Pippenger bucket fold per window: sum_{d=1}^{15} d * bucket_d via
    # running + suffix sums, batched over (n_win, T)
    rev = JacPoint(
        B.x[:, :0:-1], B.y[:, :0:-1], B.z[:, :0:-1]
    )  # buckets 15..1, scan axis second
    rev = JacPoint(
        jnp.moveaxis(rev.x, 1, 0), jnp.moveaxis(rev.y, 1, 0), jnp.moveaxis(rev.z, 1, 0)
    )
    ident = jac_identity((n_win, tile))

    def fstep(carry, b):
        run, tot = carry
        run = jac_add(run, b)
        tot = jac_add(tot, run)
        return (run, tot), None

    (_, tot), _ = lax.scan(fstep, (ident, ident), rev)

    # cross-lane tree reduction over T, batched over windows
    t = tile
    while t > 1:
        t //= 2
        tot = jac_add(
            JacPoint(tot.x[:, :t], tot.y[:, :t], tot.z[:, :t]),
            JacPoint(tot.x[:, t:], tot.y[:, t:], tot.z[:, t:]),
        )
    wsums = JacPoint(tot.x[:, 0], tot.y[:, 0], tot.z[:, 0])  # (n_win, 32)

    # Horner across windows, high -> low: acc = 16*acc + w
    wrev = JacPoint(wsums.x[::-1], wsums.y[::-1], wsums.z[::-1])

    def hstep(acc, w):
        for _ in range(4):
            acc = jac_double(acc)
        return jac_add(acc, w), None

    acc, _ = lax.scan(hstep, jac_identity(()), wrev)
    return acc


def signed_windows_dev(scalars, nbits=254, width=5, pad_to=4):
    """Recode (N, 32) 8-bit-limb scalars into signed `width`-bit digits,
    on-device in XLA: d_j in [-2^(w-1), 2^(w-1)) with
    sum_j d_j * 2^(w*j) == scalar.  Returns (n_win, N) int32 encoded as
    |d| | (sign << 5); n_win = ceil(nbits/width) + 1 (carry headroom),
    padded to a multiple of `pad_to` with zero digits (dump-bucket
    inert)."""
    scalars = jnp.asarray(scalars, jnp.int32)
    n = scalars.shape[0]
    n_win = -(-nbits // width) + 1
    n_win += (-n_win) % pad_to
    mask = (1 << width) - 1
    raws = []
    for w in range(n_win):
        lo = width * w
        limb0 = lo // LIMB_BITS
        off = lo % LIMB_BITS
        if limb0 >= NLIMBS:
            raws.append(jnp.zeros((n,), jnp.int32))
            continue
        v = scalars[:, limb0] >> off
        if off + width > LIMB_BITS and limb0 + 1 < NLIMBS:
            v = v | (scalars[:, limb0 + 1] << (LIMB_BITS - off))
        raws.append(v & mask)
    raw = jnp.stack(raws, axis=0)  # (n_win, N)
    half = 1 << (width - 1)

    def step(c, r):
        d = r + c
        co = (d >= half).astype(jnp.int32)
        d = d - (co << width)
        encd = jnp.abs(d) | (jnp.where(d < 0, 1, 0) << 5)
        return co, encd

    _, enc = lax.scan(step, jnp.zeros((n,), jnp.int32), raw)
    return enc


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def msm_bucket_pallas_s5(xs, ys, scalars, nbits=254, tile=128, interpret=False,
                         kfold=True, wpg=4):
    """Pippenger MSM with signed 5-bit digits + mixed adds — the upgraded
    default over `msm_bucket_pallas` (52 windows instead of 64, 18
    mont_muls per bucket add instead of 23; ~1.6x fewer VPU multiplies
    per point).  Same contract: (N, 32) Montgomery affine limbs
    (infinity via zeroed scalars), (N, 32) plain scalar limbs, returns
    one canonical-form JacPoint.

    kfold=True runs the per-window bucket fold inside the kernel's last
    grid step (VMEM-resident) and dumps only one folded point per window;
    the XLA side then just tree-reduces lanes and Horners windows.

    (tile, wpg) set the VMEM working set (wpg*17 bucket tiles of
    (32, tile) i32 per coordinate: 3.3MB total at (128, 4), 6.7MB at
    (256, 4) — inside the ~16MB/core budget) and the grid-step count
    n/tile * ceil(52/wpg); wider tiles amortize per-step overhead."""
    from .curve_ops import JacPoint, jac_add, jac_double, jac_identity

    n = xs.shape[0]
    assert n % tile == 0
    enc = signed_windows_dev(scalars, nbits, 5, wpg)
    n_win = enc.shape[0]
    n_grp = n_win // wpg
    n_steps = n // tile
    nb = 17
    rows_pg = wpg * nb * NLIMBS
    out_rows_pg = wpg * NLIMBS if kfold else rows_pg

    def tconst(vals32):
        return jnp.asarray(
            np.tile(np.asarray(vals32, np.int32).reshape(NLIMBS, 1), (1, tile))
        )

    p_int = Q
    consts = [
        tconst(FQ.p_limbs),
        tconst(FQ.p_inv_neg),
        tconst(_sub_const_cols(p_int)),
        tconst(_ints_to_cols((1 << 256) - 2 * p_int, NLIMBS)),
        tconst(FQ.one_mont),
    ]
    comp_p = tconst(_ints_to_cols((1 << 256) - p_int, NLIMBS))

    bs = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda g, s: (0, s), memory_space=pltpu.VMEM
    )
    ds = pl.BlockSpec((n_win, tile), lambda g, s: (0, s), memory_space=pltpu.VMEM)
    cs_spec = lambda: pl.BlockSpec(
        (NLIMBS, tile), lambda g, s: (0, 0), memory_space=pltpu.VMEM
    )
    os_spec = lambda: pl.BlockSpec(
        (out_rows_pg, tile), lambda g, s: (g, 0), memory_space=pltpu.VMEM
    )

    tr = lambda a: a.T  # (N, 32) -> (32, N)
    buckets = pl.pallas_call(
        functools.partial(_msm_kernel_s5, n_steps, wpg, kfold),
        grid=(n_grp, n_steps),
        in_specs=[cs_spec() for _ in range(5)] + [bs(), bs(), ds],
        out_specs=(os_spec(), os_spec(), os_spec()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_grp * out_rows_pg, tile), jnp.int32)
            for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_pg, tile), jnp.int32) for _ in range(3)
        ],
        interpret=interpret,
    )(*consts, tr(xs), tr(ys), enc)

    fin_bs = pl.BlockSpec(
        (NLIMBS, tile), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fin_cs = pl.BlockSpec(
        (NLIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    canon = lambda a: pl.pallas_call(
        _final_kernel,
        grid=(n_grp * out_rows_pg // NLIMBS,),
        in_specs=[fin_cs, fin_bs],
        out_specs=fin_bs,
        out_shape=jax.ShapeDtypeStruct((n_grp * out_rows_pg, tile), jnp.int32),
        interpret=interpret,
    )(comp_p, a)

    if kfold:
        # already folded per window in-kernel: (n_win*NLIMBS, T) -> (n_win, T, 32)
        shape = lambda a: jnp.transpose(
            canon(a).reshape(n_win, NLIMBS, tile), (0, 2, 1)
        )
        tot = JacPoint(*(shape(c) for c in buckets))
    else:
        # (rows, T) -> (n_win, nb, T, 32) bucket points; drop the dump row
        shape = lambda a: jnp.transpose(
            canon(a).reshape(n_win, nb, NLIMBS, tile), (0, 1, 3, 2)
        )
        B = JacPoint(*(shape(c) for c in buckets))

        # fold per window: sum_{m=1}^{16} m * bucket_m via running+suffix sums
        rev = JacPoint(
            B.x[:, :0:-1], B.y[:, :0:-1], B.z[:, :0:-1]
        )  # magnitudes 16..1
        rev = JacPoint(
            jnp.moveaxis(rev.x, 1, 0),
            jnp.moveaxis(rev.y, 1, 0),
            jnp.moveaxis(rev.z, 1, 0),
        )
        ident = jac_identity((n_win, tile))

        def fstep(carry, b):
            run, tot_ = carry
            run = jac_add(run, b)
            tot_ = jac_add(tot_, run)
            return (run, tot_), None

        (_, tot), _ = lax.scan(fstep, (ident, ident), rev)

    # cross-lane tree reduction over T, batched over windows
    t = tile
    while t > 1:
        t //= 2
        tot = jac_add(
            JacPoint(tot.x[:, :t], tot.y[:, :t], tot.z[:, :t]),
            JacPoint(tot.x[:, t:], tot.y[:, t:], tot.z[:, t:]),
        )
    wsums = JacPoint(tot.x[:, 0], tot.y[:, 0], tot.z[:, 0])  # (n_win, 32)

    # Horner across windows, high -> low: acc = 32*acc + w
    wrev = JacPoint(wsums.x[::-1], wsums.y[::-1], wsums.z[::-1])

    def hstep(acc, w):
        for _ in range(5):
            acc = jac_double(acc)
        return jac_add(acc, w), None

    acc, _ = lax.scan(hstep, jac_identity(()), wrev)
    return acc


def scalar_mul_auto(points_jac, scalars, nbits=254):
    """Dispatch a batched Jacobian scalar-mul to the best backend for the
    current platform: the VMEM-resident transposed-layout Pallas ladder
    (ops/ec_pallas.py) on TPU, the XLA scan elsewhere (CPU tests; Mosaic
    interpret mode would be far slower).  H2A_PALLAS_EC=0 forces the scan.

    Accepts any leading batch shape (..., 32); pads the flattened lane
    count to a tile multiple with identity points (identity is absorbing
    under the kernel's branchless jac_add, so padding lanes are inert)."""
    import os

    from .curve_ops import JacPoint, scalar_mul

    on_tpu = any(
        k in jax.default_backend().lower() for k in ("tpu", "axon")
    ) or jax.devices()[0].platform.lower() in ("tpu", "axon")
    if not on_tpu or os.environ.get("H2A_PALLAS_EC", "1") != "1":
        return scalar_mul(points_jac, scalars, nbits)

    lead = points_jac.x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    tile = PALLAS_TILE
    pad = (-n) % tile
    flat = lambda a: a.reshape(n, NLIMBS)

    def padded(a, fill):
        a = flat(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(fill, (pad, NLIMBS)).astype(a.dtype)], 0
            )
        return a

    one_mont = jnp.asarray(FQ.one_mont)
    zero = jnp.zeros((NLIMBS,), jnp.int32)
    P = JacPoint(
        padded(points_jac.x, one_mont),
        padded(points_jac.y, one_mont),
        padded(points_jac.z, zero),
    )
    s = padded(scalars, zero)
    if os.environ.get("H2A_PALLAS_WIN", "1") == "1":
        out = scalar_mul_pallas_win(P, s, nbits, tile, False)
    else:
        out = scalar_mul_pallas2(P, s, nbits, tile, False)
    unflat = lambda a: a[:n].reshape(*lead, NLIMBS)
    return JacPoint(unflat(out.x), unflat(out.y), unflat(out.z))


#: lanes per ladder-kernel tile; H2A_PALLAS_TILE=256 widens the tile to
#: amortize per-grid-step overheads (win table = 16 pts x 3 coords x
#: (32, T) i32 = 1.5MB VMEM at T=256 — fits).  Each new tile value is a
#: fresh (tile, nbits, grid) Mosaic compile: minutes via the relay,
#: one-time in /tmp/h2a_jax_cache; don't thrash casually (CLAUDE.md).
import os as _os

PALLAS_TILE = int(_os.environ.get("H2A_PALLAS_TILE", "128"))
