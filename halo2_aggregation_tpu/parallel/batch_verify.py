"""Multi-proof verification sharded over a device mesh.

The batched verifier (plonk/verifier_tpu.py) is batch-polymorphic, so
scaling to many chips is pure data parallelism: shard every (B, ...) leaf
of the VerifierBatch over the `dp` mesh axis and let XLA run the identical
program on each shard — the reference's `num_proofs: 1` loop
(simple-example.rs:651-658) becomes B proofs across D chips."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..plonk.verifier_tpu import VerifierBatch, field_algebra


def shard_batch(mesh: Mesh, batch: VerifierBatch, axis: str = "dp") -> VerifierBatch:
    """device_put every leaf with the proof axis sharded over `axis`."""

    def put(leaf):
        if leaf is None:
            return None
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def sharded_field_algebra(mesh: Mesh, vk, batch: VerifierBatch, B: int):
    """Run the verifier field algebra with the proof axis sharded; XLA
    compiles one SPMD program, no collectives needed (fully data parallel)."""
    sharded = shard_batch(mesh, batch)
    return field_algebra(vk, sharded, B)


def sharded_verify_algebra_fast(mesh: Mesh, vk, batch: VerifierBatch, parsed):
    """The PRODUCTION verifier path (verifier_tpu.fast_device: field
    algebra + the single batched 254-bit multiopen ladder) under a 2-D
    mesh: proofs sharded over `dp`, multiopen lanes over `mp`.  GSPMD
    inserts the cross-`mp` collectives for the per-component tree sums.

    Host prep pads the lane axis to a multiple of mp (identity points /
    zero scalars, inert under the ladder and the tree sum)."""
    from ..ops import curve_ops as co
    from ..plonk.verifier_tpu import fast_device, fast_prep

    dp = mesh.shape["dp"]
    mp = mesh.shape["mp"]
    B = len(parsed)
    assert B % dp == 0, "proof batch must divide dp"
    lane_pts, lane_scalars, ms, h_coeff, known = fast_prep(
        vk, parsed, lane_pad=mp
    )
    b = shard_batch(mesh, batch)
    lane_spec = NamedSharding(mesh, P("dp", "mp", None))
    lane_pts = co.JacPoint(
        jax.device_put(lane_pts.x, lane_spec),
        jax.device_put(lane_pts.y, lane_spec),
        jax.device_put(lane_pts.z, lane_spec),
    )
    lane_scalars = jax.device_put(lane_scalars, lane_spec)
    vec_spec = NamedSharding(mesh, P("dp", None))
    h_coeff = jax.device_put(h_coeff, vec_spec)
    known = jax.device_put(known, vec_spec)

    def step(b_, pts_x, pts_y, pts_z, ss, hc, kn):
        return fast_device(
            vk, b_, B, ms, co.JacPoint(pts_x, pts_y, pts_z), ss, hc, kn
        )

    return jax.jit(step)(
        b, lane_pts.x, lane_pts.y, lane_pts.z, lane_scalars, h_coeff, known
    )
