"""Pallas EC kernel math vs the Python-int oracle.

pl.pallas_call(interpret=True) on this 2-core host takes minutes per
kernel (the unrolled limb convolutions trace to ~25K-op graphs), so the
CPU tests exercise the kernel's building blocks DIRECTLY as jnp ops on
(LIMBS, T) arrays — `_mont_mul`/`_add`/`_sub`/`_jac_double`/`_jac_add`
and the [0, 2p) redundant-Montgomery representation are identical code
paths to what Mosaic compiles.  Full-ladder parity (windowed kernel vs
XLA scan vs oracle) runs on the real chip: bench.py asserts it before
timing, and the production verifier's host↔TPU quad parity tests cover
it end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from halo2_aggregation_tpu.fields import Q, R
from halo2_aggregation_tpu.oracle import curve as oc
from halo2_aggregation_tpu.ops import ec_pallas as ep
from halo2_aggregation_tpu.ops.field_ops import FQ

T = 8
RNG = np.random.default_rng(0xEC2)


def _fc():
    tconst = lambda v: jnp.asarray(
        np.tile(np.asarray(v, np.int32).reshape(ep.NLIMBS, 1), (1, T))
    )
    return (
        tconst(FQ.p_limbs),
        tconst(FQ.p_inv_neg),
        tconst(ep._ints_to_cols(2 * Q, ep.NLIMBS)),
        tconst(ep._ints_to_cols((1 << 256) - 2 * Q, ep.NLIMBS)),
        tconst(FQ.one_mont),
    )


def _enc(vals):
    """ints -> (LIMBS, T) canonical col array (plain, not mont)."""
    cols = np.zeros((ep.NLIMBS, T), np.int32)
    for t, v in enumerate(vals):
        cols[:, t] = ep._ints_to_cols(v, ep.NLIMBS)
    return jnp.asarray(cols)


def _dec(arr):
    a = np.asarray(arr, dtype=object)
    return [
        int(sum(int(a[i, t]) << (8 * i) for i in range(ep.NLIMBS)))
        for t in range(T)
    ]


_RINV = pow(1 << 256, -1, Q)


def _dec_mont_modp(arr):
    return [v * _RINV % Q for v in _dec(arr)]


def _enc_mont(vals):
    return _enc([v * (1 << 256) % Q for v in vals])


def rand_fq(n):
    return [int.from_bytes(RNG.bytes(40), "little") % Q for _ in range(n)]


def test_mont_mul_add_sub_vs_oracle():
    fc = _fc()
    a, b = rand_fq(T), rand_fq(T)
    # include the redundant representatives: x and x+p encode the same value
    a[1] = 0
    b[1] = 0
    A, B = _enc_mont(a), _enc_mont(b)
    Ap = _enc([v * (1 << 256) % Q + Q for v in a])  # [p, 2p) reps
    got = _dec_mont_modp(ep._mont_mul(fc, A, B))
    assert got == [x * y % Q for x, y in zip(a, b)]
    got2 = _dec_mont_modp(ep._mont_mul(fc, Ap, B))
    assert got2 == [x * y % Q for x, y in zip(a, b)]
    assert _dec_mont_modp(ep._add(fc, A, B)) == [(x + y) % Q for x, y in zip(a, b)]
    assert _dec_mont_modp(ep._sub(fc, A, B)) == [(x - y) % Q for x, y in zip(a, b)]
    assert _dec_mont_modp(ep._sub(fc, Ap, B)) == [(x - y) % Q for x, y in zip(a, b)]
    # outputs stay inside [0, 2p)
    for out in (ep._mont_mul(fc, A, B), ep._add(fc, Ap, Ap)):
        assert all(v < 2 * Q for v in _dec(out))


def test_is_zero_both_representatives():
    fc = _fc()
    vals = [0, Q, 1, Q - 1, Q + 1, 2 * Q - 1, 5, 7]
    Z = _enc(vals)
    got = np.asarray(ep._is_zero(fc, Z))[0].tolist()
    assert got == [v % Q == 0 for v in vals]


def _enc_jac(pts):
    """affine int points -> mont Jacobian (LIMBS, T) triple; None = inf."""
    xs = [(p[0] if p else 1) * (1 << 256) % Q for p in pts]
    ys = [(p[1] if p else 1) * (1 << 256) % Q for p in pts]
    zs = [(1 if p else 0) * (1 << 256) % Q for p in pts]
    return _enc(xs), _enc(ys), _enc(zs)


def _dec_jac(x, y, z):
    out = []
    for xv, yv, zv in zip(
        _dec_mont_modp(x), _dec_mont_modp(y), _dec_mont_modp(z)
    ):
        if zv % Q == 0:
            out.append(None)
            continue
        zi = pow(zv, -1, Q)
        out.append((xv * zi * zi % Q, yv * zi * zi % Q * zi % Q))
    return out


def test_jac_double_add_vs_oracle():
    fc = _fc()
    g = oc.g1_generator()
    ps = [oc.g1_mul(g, int(RNG.integers(1, 1 << 62))) for _ in range(T)]
    qs = [oc.g1_mul(g, int(RNG.integers(1, 1 << 62))) for _ in range(T)]
    # edge lanes: P+P, P+(-P), inf+Q, P+inf, inf+inf
    qs[0] = ps[0]
    qs[1] = oc.g1_neg(ps[1])
    ps[2] = None
    qs[3] = None
    ps[4] = None
    qs[4] = None
    P, Q3 = _enc_jac(ps), _enc_jac(qs)
    got_dbl = _dec_jac(*ep._jac_double(fc, *P))
    want_dbl = [oc.g1_double(p) for p in ps]
    assert got_dbl == want_dbl
    got_add = _dec_jac(*ep._jac_add(fc, *P, *Q3))
    want_add = [oc.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got_add == want_add


def test_window_extraction_matches_kernel_layout():
    """The host-side window split in scalar_mul_pallas_win must agree with
    bit order used by the scan ladder: window w = bits [4w, 4w+4)."""
    ks = [int.from_bytes(RNG.bytes(32), "little") for _ in range(T)]
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs

    s = np.asarray(ints_to_limbs(ks), np.int32)  # (T, 32)
    wins = np.stack(
        [(s[:, w // 2] >> (4 * (w % 2))) & 15 for w in range(64)], axis=0
    )
    for t, k in enumerate(ks):
        for w in range(64):
            assert wins[w, t] == (k >> (4 * w)) & 15
