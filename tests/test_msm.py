"""Device bucket MSM (ops/msm.py) vs the host oracle."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_aggregation_tpu.fields import R
from halo2_aggregation_tpu.ops import curve_ops as co
from halo2_aggregation_tpu.ops import msm as msm_mod
from halo2_aggregation_tpu.oracle import curve as oc
from halo2_aggregation_tpu.utils import native
from halo2_aggregation_tpu.utils.u64 import ints_to_u64, u64_to_limbs8

RNG = np.random.default_rng(11)


def _random_points(n):
    """n distinct points via the native windowed fixed-base kernel."""
    base = oc.g1_generator()
    ks = [int(RNG.integers(1, 1 << 62)) for _ in range(n)]
    if native.available():
        base_u64 = ints_to_u64([base[0], base[1]]).reshape(-1)
        aff, inf = native.g1_batch_mul_win(base_u64, ints_to_u64(ks))
        from halo2_aggregation_tpu.utils.u64 import u64_to_points

        return u64_to_points(aff, inf)
    return [oc.g1_mul(base, k) for k in ks]


def _oracle_msm(pts, ss):
    return oc.g1_msm(pts, ss)


def _on_tpu():
    import jax

    return jax.devices()[0].platform.lower() in ("tpu", "axon")


@pytest.mark.slow
@pytest.mark.skipif(
    "not _on_tpu()",
    reason="Pallas bucket MSM is TPU-targeted; interpret mode is "
    "impractically slow on this 2-core host (bench.py parity-gates it "
    "on-chip at 2^17; this test covers 2^14 when a chip is present)",
)
def test_pallas_bucket_msm_matches_native_pippenger():
    """ops/msm.py msm() on TPU -> ec_pallas.msm_bucket_pallas; full
    254-bit scalars, infinity lane, zero scalar; exact vs the native C++
    Pippenger (itself oracle-tested in test_native_engine)."""
    import jax.numpy as jnp

    n = 1 << 14
    pts = _random_points(n - 2) + [None, oc.g1_generator()]
    ss = [int.from_bytes(RNG.bytes(31), "little") for _ in range(n - 1)] + [0]
    aff = co.affine_from_ints(pts)
    got = msm_mod.msm(aff, jnp.asarray(u64_to_limbs8(ints_to_u64(ss))), 254)
    got_int = co.jac_to_ints(co.JacPoint(got.x[None], got.y[None], got.z[None]))[0]
    want = (
        native.g1_msm(pts, ss) if native.available() else _oracle_msm(pts, ss)
    )
    assert got_int == want


@pytest.mark.slow
def test_bucket_msm_small_matches_oracle():
    """64-bit scalars (8 windows); the sort+scan machinery compiles slowly
    on the CPU backend, so both MSM tests live in the slow suite (the
    kernel itself is TPU-targeted; see ROADMAP "Device MSM status")."""
    n = 256
    pts = _random_points(n - 2) + [None, oc.g1_generator()]
    ss = [int.from_bytes(RNG.bytes(8), "little") for _ in range(n - 1)]
    ss.append(0)  # zero scalar lane
    aff = co.affine_from_ints(pts)
    got = msm_mod.msm_bucket(aff, jnp.asarray(u64_to_limbs8(ints_to_u64(ss))), 64)
    got_int = co.jac_to_ints(co.JacPoint(got.x[None], got.y[None], got.z[None]))[0]
    assert got_int == _oracle_msm(pts, ss)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("H2A_MSM_LARGE", "0") != "1",
    reason="XLA-CPU execution of the sort+scan MSM is pathologically slow "
    "(>40 min at 2^14 on this 2-core host); the kernel is TPU-targeted — "
    "bench.py measures it on the chip.  Enable with H2A_MSM_LARGE=1.",
)
def test_bucket_msm_large_matches_oracle():
    n = 1 << 14  # crosses the msm() bucket threshold
    pts = _random_points(n)
    ss = [int.from_bytes(RNG.bytes(16), "little") for _ in range(n)]
    aff = co.affine_from_ints(pts)
    got = msm_mod.msm(aff, jnp.asarray(u64_to_limbs8(ints_to_u64(ss))), 128)
    got_int = co.jac_to_ints(co.JacPoint(got.x[None], got.y[None], got.z[None]))[0]
    # oracle via the (independently tested) native Pippenger
    want = (
        native.g1_msm(pts, ss) if native.available() else _oracle_msm(pts, ss)
    )
    assert got_int == want
