"""Mesh-sharded kernels on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halo2_aggregation_tpu.oracle import curve as oc
from halo2_aggregation_tpu.ops import curve_ops as co
from halo2_aggregation_tpu.ops.limbs import ints_to_limbs
from halo2_aggregation_tpu.parallel.mesh import make_mesh
from halo2_aggregation_tpu.parallel.sharded_msm import sharded_msm


def test_mesh_shapes():
    m = make_mesh(8)
    assert m.shape["dp"] * m.shape["mp"] == 8
    m2 = make_mesh(4)
    assert m2.shape["dp"] * m2.shape["mp"] == 4


@pytest.mark.slow
def test_sharded_msm_matches_oracle():
    mesh = make_mesh(8, axes=("dp", "mp"))
    mp = mesh.shape["mp"]
    n = mp * 4
    g = oc.g1_generator()
    rng = np.random.default_rng(3)
    pts_int = [oc.g1_mul(g, i + 2) for i in range(n)]
    ss_int = [int(rng.integers(1, 1 << 31)) for _ in range(n)]
    pts = co.affine_from_ints(pts_int)
    ss = jnp.asarray(ints_to_limbs(ss_int))
    total = sharded_msm(mesh, "mp", pts, ss, nbits=32)
    got = co.jac_to_ints(co.JacPoint(total.x[None], total.y[None], total.z[None]))[0]
    assert got == oc.g1_msm(pts_int, ss_int)
