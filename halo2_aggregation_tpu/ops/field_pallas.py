"""Pallas TPU kernels for the hot EC path.

The XLA-op formulation of `scalar_mul` round-trips every intermediate
(~19 mont-muls per ladder step) through HBM-visible buffers; this kernel
keeps the entire 254-step double-and-add ladder resident in VMEM: one
`pallas_call` per batch tile, a `fori_loop` over scalar bits inside, and
all field algebra as int32 VPU ops on (TILE, 32) blocks.

The in-kernel field library mirrors ops/field_ops.py exactly (same limb
layout, same skew-trick convolution, same relaxation+lookahead carries) but
uses only Mosaic-friendly primitives (no associative_scan — the lookahead
is 5 explicit doubling steps).
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


def _shift_up(e):
    return jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(1, 0)])[..., :-1]


def _carry(x, n_out):
    """Exact carry propagation (non-negative cols < 2^30) -> canonical
    limbs of value mod 2^(8*n_out); lookahead via log-depth doubling."""
    k = x.shape[-1]
    if k < n_out:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_out - k)])
    for _ in range(4):
        x = (x & _MASK) + _shift_up(x >> LIMB_BITS)
    s = (x & _MASK) + _shift_up(x >> LIMB_BITS)  # cols in [0, 256]
    g = s >> LIMB_BITS
    p = (s == _MASK).astype(x.dtype)
    # Kogge-Stone style (g,p) doubling: after step d, (g,p)[i] summarizes
    # the window of length 2^d ending at i.
    shift = 1
    while shift < n_out:
        gs = jnp.pad(g, [(0, 0)] * (g.ndim - 1) + [(shift, 0)])[..., :-shift]
        ps = jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(shift, 0)])[..., :-shift]
        g = g | (p & gs)
        p = p & ps
        shift *= 2
    carry_in = _shift_up(g)
    return (s + carry_in) & _MASK


def _conv(a, b):
    """32x32 limb convolution as 32 pad-shifted multiply-accumulates —
    Mosaic's layout inference rejects the skew-reshape formulation used in
    field_ops, but concat/add lower fine."""
    a = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
    b = jnp.broadcast_to(b, a.shape)
    out = None
    for i in range(NLIMBS):
        prod = a[..., i : i + 1] * b  # (..., 32)
        shifted = jnp.pad(
            prod, [(0, 0)] * (prod.ndim - 1) + [(i, NLIMBS - 1 - i)]
        )
        out = shifted if out is None else out + shifted
    return out


# field constants arrive as kernel inputs (pallas kernels cannot capture
# array constants); helpers take them via the `fc` tuple (p, pinv, comp).


def _cond_sub_p(fc, a):
    s = _carry(a + fc[2], NLIMBS + 1)
    ge = s[..., NLIMBS:].astype(bool)
    return jnp.where(ge, s[..., :NLIMBS], a)


def _mont_mul(fc, a, b):
    t = _carry(_conv(a, b), 2 * NLIMBS)
    m = _carry(_conv(t[..., :NLIMBS], fc[1])[..., :NLIMBS], NLIMBS)
    u = _conv(m, fc[0])
    s = t + jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(0, 1)])
    s = _carry(s, 2 * NLIMBS)
    return _cond_sub_p(fc, s[..., NLIMBS:])


def _add(fc, a, b):
    return _cond_sub_p(fc, _carry(a + b, NLIMBS))


def _sub(fc, a, b):
    t = a + fc[0] + (_MASK - b)
    # +1 at limb 0 without scatter (Mosaic has no scatter-add): iota mask
    one_hot0 = (
        lax.broadcasted_iota(jnp.int32, (1, NLIMBS), 1) == 0
    ).astype(jnp.int32)
    t = t + one_hot0
    return _cond_sub_p(fc, _carry(t, NLIMBS))


def _is_zero(a):
    return jnp.all(a == 0, axis=-1, keepdims=True)


def _sel(mask, a, b):
    """mask: (..., 1) bool."""
    return jnp.where(mask, a, b)


def _jac_double(fc, x, y, z):
    A = _mont_mul(fc, x, x)
    Bb = _mont_mul(fc, y, y)
    C = _mont_mul(fc, Bb, Bb)
    t = _add(fc, x, Bb)
    t = _mont_mul(fc, t, t)
    D = _sub(fc, _sub(fc, t, A), C)
    D = _add(fc, D, D)
    E = _add(fc, _add(fc, A, A), A)
    F = _mont_mul(fc, E, E)
    x3 = _sub(fc, F, _add(fc, D, D))
    c8 = _add(fc, C, C)
    c8 = _add(fc, c8, c8)
    c8 = _add(fc, c8, c8)
    y3 = _sub(fc, _mont_mul(fc, E, _sub(fc, D, x3)), c8)
    z3 = _mont_mul(fc, _add(fc, y, y), z)
    return x3, y3, z3


def _jac_add(fc, x1, y1, z1, x2, y2, z2):
    z1z1 = _mont_mul(fc, z1, z1)
    z2z2 = _mont_mul(fc, z2, z2)
    u1 = _mont_mul(fc, x1, z2z2)
    u2 = _mont_mul(fc, x2, z1z1)
    s1 = _mont_mul(fc, y1, _mont_mul(fc, z2, z2z2))
    s2 = _mont_mul(fc, y2, _mont_mul(fc, z1, z1z1))
    h = _sub(fc, u2, u1)
    r = _sub(fc, s2, s1)
    h2 = _mont_mul(fc, h, h)
    h3 = _mont_mul(fc, h2, h)
    u1h2 = _mont_mul(fc, u1, h2)
    x3 = _sub(fc, _sub(fc, _mont_mul(fc, r, r), h3), _add(fc, u1h2, u1h2))
    y3 = _sub(fc, _mont_mul(fc, r, _sub(fc, u1h2, x3)), _mont_mul(fc, s1, h3))
    z3 = _mont_mul(fc, _mont_mul(fc, z1, z2), h)

    p_inf = _is_zero(z1)
    q_inf = _is_zero(z2)
    h0 = _is_zero(h)
    r0 = _is_zero(r)
    dbl = _jac_double(fc, x1, y1, z1)
    use_dbl = (~p_inf) & (~q_inf) & h0 & r0
    x3 = _sel(use_dbl, dbl[0], x3)
    y3 = _sel(use_dbl, dbl[1], y3)
    z3 = _sel(use_dbl, dbl[2], z3)
    x3 = _sel(q_inf, x1, _sel(p_inf, x2, x3))
    y3 = _sel(q_inf, y1, _sel(p_inf, y2, y3))
    z3 = _sel(q_inf, z1, _sel(p_inf, z2, z3))
    return x3, y3, z3


def _scalar_mul_kernel(nbits, p_ref, pinv_ref, comp_ref, one_ref, px_ref, py_ref, pz_ref, s_ref, ox_ref, oy_ref, oz_ref):
    fc = (p_ref[0], pinv_ref[0], comp_ref[0])
    one_mont = one_ref[0]
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    s = s_ref[:]
    tile = px.shape[0]
    acc_x = jnp.zeros((tile, NLIMBS), jnp.int32) + one_mont
    acc_y = acc_x
    acc_z = jnp.zeros((tile, NLIMBS), jnp.int32)

    limb_ids = lax.broadcasted_iota(jnp.int32, (1, NLIMBS), 1)

    def body(i, carry):
        ax, ay, az = carry
        bit_idx = nbits - 1 - i
        limb = bit_idx // LIMB_BITS
        off = bit_idx % LIMB_BITS
        # Mosaic has no dynamic_slice on values: select the limb with an
        # iota-compare mask and a 32-wide reduce instead.
        limb_val = jnp.sum(jnp.where(limb_ids == limb, s, 0), axis=1, keepdims=True)
        bit = (limb_val >> off) & 1
        ax, ay, az = _jac_double(fc, ax, ay, az)
        nx, ny, nz = _jac_add(fc, ax, ay, az, px, py, pz)
        take = bit.astype(bool)
        ax = _sel(take, nx, ax)
        ay = _sel(take, ny, ay)
        az = _sel(take, nz, az)
        return ax, ay, az

    acc_x, acc_y, acc_z = lax.fori_loop(0, nbits, body, (acc_x, acc_y, acc_z))
    ox_ref[:] = acc_x
    oy_ref[:] = acc_y
    oz_ref[:] = acc_z


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
    from .ec_pallas import scalar_mul_pallas2

    out = scalar_mul_pallas2(P, s, nbits, tile, False)
    unflat = lambda a: a[:n].reshape(*lead, NLIMBS)
    return JacPoint(unflat(out.x), unflat(out.y), unflat(out.z))


PALLAS_TILE = 128


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scalar_mul_pallas(points_jac, scalars, nbits=254, tile=256, interpret=False):
    """Batched Jacobian scalar-mul as a single VMEM-resident Pallas kernel.

    points_jac: curve_ops.JacPoint with (N, 32) coords; scalars (N, 32)
    plain limbs; N must be a multiple of `tile`."""
    from .curve_ops import JacPoint

    n = points_jac.x.shape[0]
    assert n % tile == 0
    grid = (n // tile,)
    bs = lambda: pl.BlockSpec((tile, NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cs_spec = lambda: pl.BlockSpec((1, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)
    consts = [
        jnp.asarray(FQ.p_limbs)[None, :],
        jnp.asarray(FQ.p_inv_neg)[None, :],
        jnp.asarray(FQ.comp_limbs)[None, :],
        jnp.asarray(FQ.one_mont)[None, :],
    ]
    out = pl.pallas_call(
        functools.partial(_scalar_mul_kernel, nbits),
        grid=grid,
        in_specs=[cs_spec(), cs_spec(), cs_spec(), cs_spec(), bs(), bs(), bs(), bs()],
        out_specs=(bs(), bs(), bs()),
        out_shape=(
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
        ),
        interpret=interpret,
    )(*consts, points_jac.x, points_jac.y, points_jac.z, scalars)
    return JacPoint(*out)
