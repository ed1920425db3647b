"""Mesh-sharded MSM: points/scalars split across chips, partial sums
combined with collectives over ICI.

The TPU-native answer to SURVEY.md §2d's "MSM/bucket parallelism" row:
each device runs the batched double-and-add over its local shard of point
lanes, reduces locally to one Jacobian partial, then the partials are
all-gathered (a point sum is not a ring `psum` — EC addition isn't an
arithmetic add — so we gather the per-device partials and tree-add them,
replicated; D points of traffic, negligible vs the local work)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import curve_ops as co
from ..ops import field_ops as fo


def sharded_msm(mesh: Mesh, axis: str, points: co.AffinePoint, scalars, nbits=254):
    """points: (N, 32) AffinePoint, scalars: (N, 32) plain limbs; N must be
    divisible by the mesh axis size.  Returns a replicated JacPoint sum."""

    def local(px, py, pinf, s):
        jac = co.affine_to_jac(co.AffinePoint(px, py, pinf))
        per = co.scalar_mul(jac, s, nbits)
        part = co.jac_sum(per)  # local partial (32,)
        # gather all partials and tree-add (replicated on every device)
        gx = jax.lax.all_gather(part.x, axis)
        gy = jax.lax.all_gather(part.y, axis)
        gz = jax.lax.all_gather(part.z, axis)
        total = co.jac_sum(co.JacPoint(gx, gy, gz))
        return total.x, total.y, total.z

    spec_sharded = P(axis)
    spec_repl = P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_sharded, spec_sharded, spec_sharded, spec_sharded),
        out_specs=(spec_repl, spec_repl, spec_repl),
        check_vma=False,
    )
    x, y, z = fn(points.x, points.y, points.inf, scalars)
    return co.JacPoint(x, y, z)
