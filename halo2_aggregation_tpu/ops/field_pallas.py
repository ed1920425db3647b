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
    """32x32 limb convolution via the skew trick (see field_ops)."""
    bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    prods = jnp.broadcast_to(
        a[..., :, None] * b[..., None, :], (*bshape, NLIMBS, NLIMBS)
    )
    padded = jnp.pad(prods, [(0, 0)] * (prods.ndim - 1) + [(0, NLIMBS)])
    flat = padded.reshape(*bshape, NLIMBS * 2 * NLIMBS)
    skew = flat[..., : NLIMBS * (2 * NLIMBS - 1)].reshape(
        *bshape, NLIMBS, 2 * NLIMBS - 1
    )
    return jnp.sum(skew, axis=-2)


_P = jnp.asarray(FQ.p_limbs)
_PINV = jnp.asarray(FQ.p_inv_neg)
_COMP = jnp.asarray(FQ.comp_limbs)
_ONE_MONT = jnp.asarray(FQ.one_mont)


def _cond_sub_p(a):
    s = _carry(a + _COMP, NLIMBS + 1)
    ge = s[..., NLIMBS:].astype(bool)
    return jnp.where(ge, s[..., :NLIMBS], a)


def _mont_mul(a, b):
    t = _carry(_conv(a, b), 2 * NLIMBS)
    m = _carry(_conv(t[..., :NLIMBS], _PINV)[..., :NLIMBS], NLIMBS)
    u = _conv(m, _P)
    s = t + jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(0, 1)])
    s = _carry(s, 2 * NLIMBS)
    return _cond_sub_p(s[..., NLIMBS:])


def _add(a, b):
    return _cond_sub_p(_carry(a + b, NLIMBS))


def _sub(a, b):
    t = a + _P + (_MASK - b)
    t = t.at[..., 0].add(1)
    return _cond_sub_p(_carry(t, NLIMBS))


def _is_zero(a):
    return jnp.all(a == 0, axis=-1, keepdims=True)


def _sel(mask, a, b):
    """mask: (..., 1) bool."""
    return jnp.where(mask, a, b)


def _jac_double(x, y, z):
    A = _mont_mul(x, x)
    Bb = _mont_mul(y, y)
    C = _mont_mul(Bb, Bb)
    t = _add(x, Bb)
    t = _mont_mul(t, t)
    D = _sub(_sub(t, A), C)
    D = _add(D, D)
    E = _add(_add(A, A), A)
    F = _mont_mul(E, E)
    x3 = _sub(F, _add(D, D))
    c8 = _add(C, C)
    c8 = _add(c8, c8)
    c8 = _add(c8, c8)
    y3 = _sub(_mont_mul(E, _sub(D, x3)), c8)
    z3 = _mont_mul(_add(y, y), z)
    return x3, y3, z3


def _jac_add(x1, y1, z1, x2, y2, z2):
    z1z1 = _mont_mul(z1, z1)
    z2z2 = _mont_mul(z2, z2)
    u1 = _mont_mul(x1, z2z2)
    u2 = _mont_mul(x2, z1z1)
    s1 = _mont_mul(y1, _mont_mul(z2, z2z2))
    s2 = _mont_mul(y2, _mont_mul(z1, z1z1))
    h = _sub(u2, u1)
    r = _sub(s2, s1)
    h2 = _mont_mul(h, h)
    h3 = _mont_mul(h2, h)
    u1h2 = _mont_mul(u1, h2)
    x3 = _sub(_sub(_mont_mul(r, r), h3), _add(u1h2, u1h2))
    y3 = _sub(_mont_mul(r, _sub(u1h2, x3)), _mont_mul(s1, h3))
    z3 = _mont_mul(_mont_mul(z1, z2), h)

    p_inf = _is_zero(z1)
    q_inf = _is_zero(z2)
    h0 = _is_zero(h)
    r0 = _is_zero(r)
    dbl = _jac_double(x1, y1, z1)
    use_dbl = (~p_inf) & (~q_inf) & h0 & r0
    x3 = _sel(use_dbl, dbl[0], x3)
    y3 = _sel(use_dbl, dbl[1], y3)
    z3 = _sel(use_dbl, dbl[2], z3)
    x3 = _sel(q_inf, x1, _sel(p_inf, x2, x3))
    y3 = _sel(q_inf, y1, _sel(p_inf, y2, y3))
    z3 = _sel(q_inf, z1, _sel(p_inf, z2, z3))
    return x3, y3, z3


def _scalar_mul_kernel(nbits, px_ref, py_ref, pz_ref, s_ref, ox_ref, oy_ref, oz_ref):
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    s = s_ref[:]
    tile = px.shape[0]
    acc_x = jnp.zeros((tile, NLIMBS), jnp.int32) + _ONE_MONT
    acc_y = acc_x
    acc_z = jnp.zeros((tile, NLIMBS), jnp.int32)

    def body(i, carry):
        ax, ay, az = carry
        bit_idx = nbits - 1 - i
        limb = bit_idx // LIMB_BITS
        off = bit_idx % LIMB_BITS
        bit = (lax.dynamic_slice_in_dim(s, limb, 1, axis=1) >> off) & 1
        ax, ay, az = _jac_double(ax, ay, az)
        nx, ny, nz = _jac_add(ax, ay, az, px, py, pz)
        take = bit.astype(bool)
        ax = _sel(take, nx, ax)
        ay = _sel(take, ny, ay)
        az = _sel(take, nz, az)
        return ax, ay, az

    acc_x, acc_y, acc_z = lax.fori_loop(0, nbits, body, (acc_x, acc_y, acc_z))
    ox_ref[:] = acc_x
    oy_ref[:] = acc_y
    oz_ref[:] = acc_z


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scalar_mul_pallas(points_jac, scalars, nbits=254, tile=256, interpret=False):
    """Batched Jacobian scalar-mul as a single VMEM-resident Pallas kernel.

    points_jac: curve_ops.JacPoint with (N, 32) coords; scalars (N, 32)
    plain limbs; N must be a multiple of `tile`."""
    from .curve_ops import JacPoint

    n = points_jac.x.shape[0]
    assert n % tile == 0
    grid = (n // tile,)
    bs = lambda: pl.BlockSpec((tile, NLIMBS), lambda i: (i, 0), memory_space=pltpu.ANY if False else pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scalar_mul_kernel, nbits),
        grid=grid,
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=(bs(), bs(), bs()),
        out_shape=(
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
            jax.ShapeDtypeStruct((n, NLIMBS), jnp.int32),
        ),
        interpret=interpret,
    )(points_jac.x, points_jac.y, points_jac.z, scalars)
    return JacPoint(*out)
