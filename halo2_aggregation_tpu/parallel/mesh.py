"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axes=("dp", "mp")) -> Mesh:
    """2-D mesh over the available devices: `dp` shards proof batches,
    `mp` shards MSM point lanes.  Factor n into the most-square split with
    dp >= mp (proof parallelism is the cheaper axis to shard)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    mp = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            mp = cand
            break
    dp = n // mp
    arr = np.array(devs).reshape(dp, mp)
    return Mesh(arr, axes)
