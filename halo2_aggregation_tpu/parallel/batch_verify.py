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
