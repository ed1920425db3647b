"""Fused field-algebra Pallas kernel for the batched verifier.

`verifier_tpu.field_algebra` (steps 20-24 of SURVEY §3.2: x^n, Lagrange
l_evals by Fermat inversion, every gate/permutation/lookup constraint
expression, the y-fold, and the vanishing division) traces to tens of
thousands of TINY XLA ops on (B, 32) arrays — two lax.scan Fermat chains
plus a few hundred mont-muls, each a dozen HLO ops.  On the chip that
whole region is latency-bound dispatch, not math: it dominates the
aggregation pipeline's 0.5-0.6 s device step (ROADMAP item 0,
tools/step_profile.py).

This module runs the SAME program as ONE Pallas kernel over transposed
(32, B) redundant-Montgomery tiles, reusing plonk/protocol.py's formulas
verbatim over a ScalarOps backend built on the ec_pallas limb primitives
(the quotient engine's TileOps pattern, quotient_device.py:423).  All
~(2+bf)+1 field inversions run as ONE in-kernel Fermat chain over
lane-concatenated operands.  Outputs are canonicalized to [0, p), so
they are bit-identical to the XLA path's (parity pinned by
tests/test_fa_fused.py on CPU via the body-as-jnp emulation, and
on-chip by bench.py's h_eval gate).

The kernel body is a pure function over (32, T) jnp arrays — the
pallas_call wrapper and the CPU emulation call the identical code, the
same strategy test_ec_pallas.py uses for the EC kernels.

Reference cost center: the verifier's scalar work in
`/root/reference/src/verifier.rs:512-628` (expression evaluation and
h fold), executed there once per proof on the CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import R
from ..ops import field_ops as fo
from ..ops import ec_pallas as ep
from .protocol import (
    LookupEvals,
    PermutationSetEvals,
    fold_y,
    gate_expressions,
    lookup_expressions,
    permutation_expressions,
)
from .verifier import num_perm_chunks

FR = fo.FR
NL = fo.NLIMBS


def _const_tile(v_limbs, shape):
    """Build a (32, T) limb-constant tile IN-TRACE from scalar literals
    (Pallas kernels cannot capture array constants): iota + selects."""
    ids = lax.broadcasted_iota(jnp.int32, shape, 0)
    out = jnp.zeros(shape, jnp.int32)
    for l in range(NL):
        lv = int(v_limbs[l])
        if lv:
            out = jnp.where(ids == l, lv, out)
    return out


class _FrTileOps:
    """ScalarOps over (32, T) Fr tiles: relaxed-domain products (`_sub`'s
    257-complement makes relaxed limbs safe for ANY modulus)."""

    def __init__(self, fc, shape):
        self.fc = fc
        self.shape = shape

    def constant(self, v):
        return _const_tile(FR.to_mont(v % R), self.shape)

    def add(self, a, b):
        return ep._add(self.fc, a, b)

    def sub(self, a, b):
        return ep._sub(self.fc, a, b)

    def mul(self, a, b):
        return ep._mont_mul_r(self.fc, a, b)

    def neg(self, a):
        return ep._sub(self.fc, jnp.zeros_like(a), a)

    def scale(self, a, v):
        return self.mul(a, self.constant(v))


def _fermat_inv(fc, a):
    """a^(R-2) on a (32, T) tile via an L2R square-and-multiply
    lax.fori_loop (506 runtime muls but a ~500-op trace — an unrolled
    chain would be ~95K traced ops and a multi-minute Mosaic compile on
    this host).  The static exponent's bytes live in an in-trace
    constant tile; per-iteration bits are extracted with the ladder
    kernel's mask+reduce idiom (no dynamic sublane slicing in Mosaic)."""
    e = R - 2
    nbits = e.bit_length()
    ebytes = [(e >> (8 * i)) & 255 for i in range(NL)]
    etile = _const_tile(ebytes, a.shape)
    limb_ids = lax.broadcasted_iota(jnp.int32, (NL, 1), 0)
    # the chain runs on a lane-CONCATENATED tile wider than the kernel's
    # constants; broadcast them to a's width (uniform across lanes)
    fc = tuple(jnp.broadcast_to(c[:, :1], a.shape) for c in fc)

    def body(i, acc):
        acc = ep._mont_mul_r(fc, acc, acc)
        bit_idx = nbits - 1 - i
        limb = bit_idx // 8
        off = bit_idx % 8
        limb_val = jnp.sum(
            jnp.where(limb_ids == limb, etile, 0), axis=0, keepdims=True
        )
        take = ((limb_val >> off) & 1).astype(bool)
        with_mul = ep._mont_mul_r(fc, acc, a)
        return jnp.where(take, with_mul, acc)

    acc = jnp.zeros_like(a) + fc[ep._ONE]
    return lax.fori_loop(0, nbits, body, acc)


def fa_schedule(vk):
    """Static ordered tags of the kernel's scalar inputs (part of the
    jit/pallas cache key via the vk)."""
    cs = vk.cs
    num_chunks = num_perm_chunks(cs)
    tags = [("x",), ("theta",), ("beta",), ("gamma",), ("y",)]
    tags += [("inst", i) for i in range(len(cs.instance_queries))]
    tags += [("adv", i) for i in range(len(cs.advice_queries))]
    tags += [("fix", i) for i in range(len(cs.fixed_queries))]
    tags += [("sigma", i) for i in range(len(cs.permutation_columns))]
    for ci in range(num_chunks):
        tags += [("perm_z", ci), ("perm_zn", ci)]
        if ci < num_chunks - 1:
            tags.append(("perm_zl", ci))
    for li in range(len(cs.lookups)):
        tags += [
            ("lk_z", li),
            ("lk_zn", li),
            ("lk_a", li),
            ("lk_ap", li),
            ("lk_s", li),
        ]
    return tuple(tags)


def fa_gather(vk, b):
    """VerifierBatch -> list of (B, 32) arrays in fa_schedule order."""
    cs = vk.cs
    num_chunks = num_perm_chunks(cs)
    out = [b.x, b.theta, b.beta, b.gamma, b.y]
    out += list(b.inst_evals)
    out += list(b.adv_evals)
    out += list(b.fix_evals)
    out += list(b.sigma_evals)
    for ci in range(num_chunks):
        ps = b.perm_sets[ci]
        out += [ps.z, ps.z_next]
        if ci < num_chunks - 1:
            out.append(ps.z_last)
    for lv in b.lookup_evs:
        out += [lv.z, lv.z_next, lv.a_prime, lv.a_prime_prev, lv.s_prime]
    return out


def fa_body(vk, fc, comp_p, vals):
    """The fused program over (32, T) tiles.  `vals` maps fa_schedule
    tags to tiles; returns (h_eval, xn, xn_sub_one) CANONICAL [0, p)
    tiles — bit-identical to verifier_tpu.field_algebra's outputs."""
    cs = vk.cs
    k = vk.k
    n = vk.n
    omega_inv = pow(vk.omega, -1, R)
    bf = cs.blinding_factors()
    chunk_len = cs.degree() - 2
    num_chunks = num_perm_chunks(cs)
    x = vals[("x",)]
    shape = x.shape
    T = shape[1]
    ops = _FrTileOps(fc, shape)

    # step 20: x^n by k squarings
    xn = x
    for _ in range(k):
        xn = ops.mul(xn, xn)
    xn_sub_one = ops.sub(xn, ops.constant(1))

    # l_evals: numerators + ONE lane-concatenated Fermat chain for all
    # 2+bf denominators and 1/(x^n - 1)
    numers, denoms = [], []
    w_pow = 1
    for i in range(2 + bf):
        numers.append(ops.mul(xn_sub_one, ops.constant(w_pow)))
        term = ops.sub(x, ops.constant(w_pow))
        denoms.append(ops.mul(term, ops.constant(n)))
        w_pow = w_pow * omega_inv % R
    stack = jnp.concatenate(denoms + [xn_sub_one], axis=1)
    inv_stack = _fermat_inv(fc, stack)
    l_evals = [
        ops.mul(numers[i], inv_stack[:, i * T : (i + 1) * T])
        for i in range(2 + bf)
    ]
    vinv = inv_stack[:, (2 + bf) * T :]
    l_evals.reverse()
    l_last = l_evals[0]
    l_blind = l_evals[1]
    for i in range(2, 1 + bf):
        l_blind = ops.add(l_blind, l_evals[i])
    l_0 = l_evals[1 + bf]

    # steps 21-23: the shared protocol formulas
    adv = [vals[("adv", i)] for i in range(len(cs.advice_queries))]
    fix = [vals[("fix", i)] for i in range(len(cs.fixed_queries))]
    inst = [vals[("inst", i)] for i in range(len(cs.instance_queries))]
    sigma = [vals[("sigma", i)] for i in range(len(cs.permutation_columns))]
    perm_sets = [
        PermutationSetEvals(
            z=vals[("perm_z", ci)],
            z_next=vals[("perm_zn", ci)],
            z_last=(
                vals[("perm_zl", ci)] if ci < num_chunks - 1 else None
            ),
        )
        for ci in range(num_chunks)
    ]
    exprs = gate_expressions(ops, cs, adv, fix, inst)
    exprs += permutation_expressions(
        ops, cs, perm_sets, sigma, adv, fix, inst,
        l_0, l_last, l_blind, vals[("beta",)], vals[("gamma",)], x, chunk_len,
    )
    for li, arg in enumerate(cs.lookups):
        ev = LookupEvals(
            z=vals[("lk_z", li)],
            z_next=vals[("lk_zn", li)],
            a_prime=vals[("lk_a", li)],
            a_prime_prev=vals[("lk_ap", li)],
            s_prime=vals[("lk_s", li)],
        )
        exprs += lookup_expressions(
            ops, ev, arg, l_0, l_last, l_blind,
            vals[("theta",)], vals[("beta",)], vals[("gamma",)],
            adv, fix, inst,
        )

    # step 24: y-fold + vanishing division
    h_eval = fold_y(ops, exprs, vals[("y",)])
    h_eval = ops.mul(h_eval, vinv)

    canon = lambda a: ep._cond_sub(comp_p, ep._carry(a, NL))
    return canon(h_eval), canon(xn), canon(xn_sub_one)


def _fr_fc_np():
    """The 5 Fr kernel constants + comp_p, as (32,) int32 limb rows."""
    return (
        [
            np.asarray(FR.p_limbs, np.int32),
            np.asarray(FR.p_inv_neg, np.int32),
            ep._sub_const_cols(R),
            ep._ints_to_cols((1 << 256) - 2 * R, NL),
            np.asarray(FR.one_mont, np.int32),
        ],
        ep._ints_to_cols((1 << 256) - R, NL),
    )


def _fa_kernel(vk, schedule, *refs):
    ns = len(schedule)
    fc = tuple(r[:] for r in refs[:5])
    comp_p = refs[5][:]
    big = refs[6][:]
    out_ref = refs[7]
    vals = {
        tag: big[i * NL : (i + 1) * NL] for i, tag in enumerate(schedule)
    }
    h, xn, xs1 = fa_body(vk, fc, comp_p, vals)
    out_ref[:] = jnp.concatenate([h, xn, xs1], axis=0)


def field_algebra_fused(vk, b, B: int):
    """Drop-in replacement for verifier_tpu.field_algebra on TPU: ONE
    pallas_call instead of ~50K tiny XLA ops.  Returns (h_eval, xn,
    xn_sub_one) as (B, 32) canonical mont arrays, bit-identical to the
    XLA path.  Any B works: proofs ride the LANE axis in fixed 128-lane
    tiles (Mosaic rejects sub-128-lane tiles on the grouped-conv pad
    pattern, docs/bench_r4_run1.log), so B < 128 is zero-padded —
    zero lanes are inert through the field ops (0^(p-2) = 0)."""
    schedule = fa_schedule(vk)
    arrs = fa_gather(vk, b)
    big = jnp.concatenate(
        [jnp.transpose(jnp.asarray(a)) for a in arrs], axis=0
    )  # (S*32, B)
    # full 128-lane tiles: Mosaic mis-lays sub-128 lane vectors in the
    # grouped-conv pads (offset-64 concat rejection, bench_r4_run1.log);
    # zero lanes are inert through every field op (0^(p-2) = 0)
    tile = 128
    Bp = -(-B // tile) * tile
    if Bp != B:
        big = jnp.pad(big, [(0, 0), (0, Bp - B)])
    grid = (Bp // tile,)
    S = len(schedule)

    consts_np, comp_p_np = _fr_fc_np()
    tconst = lambda v: jnp.asarray(
        np.tile(np.asarray(v, np.int32).reshape(NL, 1), (1, tile))
    )
    consts = [tconst(c) for c in consts_np]
    comp_p = tconst(comp_p_np)

    cs_spec = lambda: pl.BlockSpec(
        (NL, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(
        (S * NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (3 * NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_fa_kernel, vk, schedule),
        grid=grid,
        in_specs=[cs_spec() for _ in range(6)] + [in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((3 * NL, Bp), jnp.int32),
    )(*consts, comp_p, big)
    out = out[:, :B]
    h = jnp.transpose(out[:NL])
    xn = jnp.transpose(out[NL : 2 * NL])
    xs1 = jnp.transpose(out[2 * NL :])
    return h, xn, xs1


def field_algebra_fused_emulated(vk, b, B: int):
    """CPU emulation: the identical fa_body over plain jnp arrays (no
    pallas_call) — the parity surface for tests."""
    schedule = fa_schedule(vk)
    arrs = fa_gather(vk, b)
    consts_np, comp_p_np = _fr_fc_np()
    tconst = lambda v: jnp.asarray(
        np.tile(np.asarray(v, np.int32).reshape(NL, 1), (1, B))
    )
    fc = tuple(tconst(c) for c in consts_np)
    comp_p = tconst(comp_p_np)
    vals = {
        tag: jnp.transpose(jnp.asarray(a))
        for tag, a in zip(schedule, arrs)
    }
    h, xn, xs1 = fa_body(vk, fc, comp_p, vals)
    return (
        jnp.transpose(h),
        jnp.transpose(xn),
        jnp.transpose(xs1),
    )
