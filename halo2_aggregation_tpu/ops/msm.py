"""Multi-scalar multiplication on TPU.

The reference's MSMs hide inside its halo2 fork's prover (`create_proof`,
`commit_lagrange` — SURVEY.md §2b) and inside the in-circuit folds
(`/root/reference/src/multiopen.rs:443-492`).  Here MSM is an explicit
kernel with a roofline counter, per BASELINE.md ("MSM Mpoint-adds/s/chip").

Round-1 implementation: batched per-lane double-and-add (every lane
computes s_i * P_i in lockstep under one 256-step scan — fully parallel
across the batch) followed by a log-depth tree reduction.  A windowed
bucket (Pippenger) kernel with mesh-sharded buckets is the planned
round-2 upgrade; the API here is what parallel/sharded_msm.py shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import curve_ops as co
from . import field_ops as fo


def msm(points: co.AffinePoint, scalars, nbits: int = 256) -> co.JacPoint:
    """points: batched AffinePoint (n, 32); scalars: (n, 32) plain limbs.
    Returns the single Jacobian sum  sum_i s_i * P_i."""
    jac = co.affine_to_jac(points)
    per = co.scalar_mul(jac, scalars, nbits)
    return co.jac_sum(per)


def msm_host(points_int, scalars_int):
    """Oracle-backed MSM for tiny inputs / tests."""
    from ..oracle import curve as oc

    return oc.g1_msm(points_int, scalars_int)
