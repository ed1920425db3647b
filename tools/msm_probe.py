"""On-chip MSM kernel probe: parity + rate for the signed-5-bit kernel
vs the unsigned-4-bit one.

Usage (serialize with other TPU jobs!):
    python tools/msm_probe.py [log2_n ...]     # default: 14 17 20

For each size: builds random affine points + 254-bit scalars, checks the
Pallas result against the native C++ Pippenger, and reports warm wall
time + Mpoint-adds/s for both kernels (H2A_MSM_SIGNED toggles which one
`ops/msm.py` dispatches; here both are called directly).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from halo2_aggregation_tpu.ops import curve_ops as co
from halo2_aggregation_tpu.ops import ec_pallas as ep
from halo2_aggregation_tpu.ops import field_ops as fo
from halo2_aggregation_tpu.ops import msm as msm_mod
from halo2_aggregation_tpu.oracle import curve as oc
from halo2_aggregation_tpu.utils import native
from halo2_aggregation_tpu.utils.u64 import ints_to_u64, u64_to_limbs8, u64_to_points


def build(n):
    base = oc.g1_generator()
    base_u64 = ints_to_u64([base[0], base[1]]).reshape(-1)
    rng = np.random.default_rng(7)
    ks = ints_to_u64([int(rng.integers(1, 1 << 62)) for _ in range(n)])
    aff_u64, inf_u64 = native.g1_batch_mul_win(base_u64, ks)
    xs = jnp.asarray(
        fo.to_mont_chunked(jnp.asarray(u64_to_limbs8(aff_u64[:, :4])), fo.FQ)
    )
    ys = jnp.asarray(
        fo.to_mont_chunked(jnp.asarray(u64_to_limbs8(aff_u64[:, 4:])), fo.FQ)
    )
    ss_int = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    ss = jnp.asarray(u64_to_limbs8(ints_to_u64(ss_int)))
    want = native.g1_msm(u64_to_points(aff_u64, inf_u64), ss_int)
    return xs, ys, ss, want


def run(kernel, xs, ys, ss, want, label, adds):
    def once():
        if kernel == "s5":
            r = ep.msm_bucket_pallas_s5(xs, ys, ss, 254, 128, False, True)
        elif kernel == "s5_nofold":
            r = ep.msm_bucket_pallas_s5(xs, ys, ss, 254, 128, False, False)
        else:
            r = ep.msm_bucket_pallas(xs, ys, ss, 254, 128, False)
        return co.jac_to_ints(
            co.JacPoint(r.x[None], r.y[None], r.z[None])
        )[0]

    t0 = time.time()
    got = once()  # compile + parity
    compile_s = time.time() - t0
    assert got == want, f"{label}: PARITY FAIL"
    walls = []
    for _ in range(2):
        t0 = time.time()
        once()
        walls.append(time.time() - t0)
    w = min(walls)
    print(
        f"{label:12s} n=2^{int(np.log2(xs.shape[0]))}: {w:7.3f}s warm "
        f"({adds / w / 1e6:6.2f} M adds/s)  [first call {compile_s:.1f}s]  PARITY OK"
    )


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [14, 17, 20]
    for lg in sizes:
        n = 1 << lg
        xs, ys, ss, want = build(n)
        run("s5", xs, ys, ss, want, "s5+kfold", n * 52)
        run("s5_nofold", xs, ys, ss, want, "s5", n * 52)
        run("u4", xs, ys, ss, want, "u4 (old)", n * 64)
