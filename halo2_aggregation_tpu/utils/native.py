"""ctypes bindings for the C++ host runtime (native/h2a_native.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back silently to the pure-Python oracle when unavailable.  This is
the framework's native CPU runtime piece — SRS generation and host-side
commitments — around the TPU compute path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..fields import Q

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "h2a_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libh2a_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = os.path.abspath(_SRC)
        so = os.path.abspath(_SO)
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.h2a_g1_msm.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.h2a_g1_batch_mul.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _to_u64_limbs(x: int, n=4) -> list:
    return [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(n)]


def _from_u64(arr) -> int:
    return sum(int(v) << (64 * i) for i, v in enumerate(arr))


def _jac_to_affine(x, y, z):
    if z == 0:
        return None
    zinv = pow(z, -1, Q)
    zi2 = zinv * zinv % Q
    return (x * zi2 % Q, y * zi2 % Q * zinv % Q)


def g1_msm_u64(points_u64, infs, scalars_u64):
    """Native Pippenger MSM over (n,8)/(n,)/(n,4) uint64 numpy arrays —
    the zero-copy fast path used by Params.commit_lagrange."""
    lib = _load()
    if lib is None:
        return NotImplemented
    pts = np.ascontiguousarray(points_u64, dtype=np.uint64)
    inf = np.ascontiguousarray(infs, dtype=np.uint8)
    ss = np.ascontiguousarray(scalars_u64, dtype=np.uint64)
    n = pts.shape[0]
    if ss.shape[0] != n or inf.shape[0] != n:
        raise ValueError("msm input length mismatch")
    out = np.zeros(12, dtype=np.uint64)
    lib.h2a_g1_msm(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        inf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ss.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return _jac_to_affine(
        _from_u64(out[0:4]), _from_u64(out[4:8]), _from_u64(out[8:12])
    )


def g1_msm(points, scalars):
    """Native Pippenger MSM over oracle-format points; None if lib absent."""
    lib = _load()
    if lib is None:
        return NotImplemented
    n = len(points)
    pts = np.zeros((n, 8), dtype=np.uint64)
    infs = np.zeros(n, dtype=np.uint8)
    ss = np.zeros((n, 4), dtype=np.uint64)
    for i, (p, s) in enumerate(zip(points, scalars)):
        if p is None:
            infs[i] = 1
        else:
            pts[i, 0:4] = _to_u64_limbs(p[0])
            pts[i, 4:8] = _to_u64_limbs(p[1])
        ss[i] = _to_u64_limbs(int(s))
    return g1_msm_u64(pts, infs, ss)


def g1_batch_mul(base, scalars):
    """out[i] = scalars[i] * base (native); None if lib absent."""
    lib = _load()
    if lib is None:
        return NotImplemented
    n = len(scalars)
    b = np.zeros(8, dtype=np.uint64)
    b[0:4] = _to_u64_limbs(base[0])
    b[4:8] = _to_u64_limbs(base[1])
    ss = np.zeros(n * 4, dtype=np.uint64)
    for i, s in enumerate(scalars):
        ss[i * 4 : i * 4 + 4] = _to_u64_limbs(int(s))
    out = np.zeros(n * 12, dtype=np.uint64)
    lib.h2a_g1_batch_mul(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ss.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    res = []
    for i in range(n):
        res.append(
            _jac_to_affine(
                _from_u64(out[i * 12 : i * 12 + 4]),
                _from_u64(out[i * 12 + 4 : i * 12 + 8]),
                _from_u64(out[i * 12 + 8 : i * 12 + 12]),
            )
        )
    return res
