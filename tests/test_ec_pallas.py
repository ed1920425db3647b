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
        tconst(ep._sub_const_cols(Q)),
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


def test_jac_add_mixed_vs_oracle():
    """_jac_add_mixed (z2 == 1 madd, the s5 MSM kernel's add) vs the
    oracle, including every branch: generic, double (P+P), inverse
    (P + (-P) -> inf), and bucket-at-infinity."""
    fc = _fc()
    g = oc.g1_generator()
    ps = [oc.g1_mul(g, int(RNG.integers(1, 1 << 62))) for _ in range(T)]
    qs = [oc.g1_mul(g, int(RNG.integers(1, 1 << 62))) for _ in range(T)]
    qs[0] = ps[0]  # double branch
    qs[1] = oc.g1_neg(ps[1])  # h == 0, r != 0 -> infinity
    ps[2] = None  # empty bucket + Q -> Q
    P = _enc_jac(ps)
    # affine operand: mont x, y with implicit z = 1 (no infinity allowed)
    qx = _enc_mont([q[0] for q in qs])
    qy = _enc_mont([q[1] for q in qs])
    got = _dec_jac(*ep._jac_add_mixed(fc, *P, qx, qy))
    want = [oc.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_signed_windows_recode():
    """signed_windows_dev: digits reassemble to the scalar, magnitudes
    stay in [0, 16], top window has no carry out."""
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs

    ks = [int.from_bytes(RNG.bytes(32), "little") % R for _ in range(16)]
    ks[0] = 0
    ks[1] = R - 1
    ks[2] = (1 << 254) - 1 if (1 << 254) - 1 < R else R - 2
    s = jnp.asarray(np.asarray(ints_to_limbs(ks), np.int32))
    enc = np.asarray(ep.signed_windows_dev(s, 254, 5, 4))
    assert enc.shape[0] == 52
    mag = enc & 31
    sign = enc >> 5
    assert mag.max() <= 16 and sign.max() <= 1
    for t, k in enumerate(ks):
        total = sum(
            int(m) * (-1 if sg else 1) * (1 << (5 * j))
            for j, (m, sg) in enumerate(zip(mag[:, t], sign[:, t]))
        )
        assert total == k, f"lane {t}"


def test_s5_bucket_fold_algorithm_vs_oracle():
    """End-to-end algorithm check of the signed-digit MSM (recode ->
    17-bucket accumulate -> suffix-sum fold -> Horner) with the oracle
    doing the point math — validates everything the Pallas kernel does
    except the in-VMEM field ops (covered by the tests above).  The
    fused kernel itself is parity-gated on the real chip by bench.py."""
    from halo2_aggregation_tpu.ops.limbs import ints_to_limbs

    n = 24
    g = oc.g1_generator()
    pts = [oc.g1_mul(g, int(RNG.integers(1, 1 << 62))) for _ in range(n)]
    ks = [int.from_bytes(RNG.bytes(32), "little") % R for _ in range(n)]
    ks[0] = 0
    enc = np.asarray(
        ep.signed_windows_dev(
            jnp.asarray(np.asarray(ints_to_limbs(ks), np.int32)), 254, 5, 4
        )
    )
    n_win = enc.shape[0]
    acc = None  # Horner accumulator, high window first
    for j in range(n_win - 1, -1, -1):
        buckets = [None] * 17
        for i in range(n):
            m = int(enc[j, i] & 31)
            sg = int(enc[j, i] >> 5)
            if m == 0:
                continue
            p = oc.g1_neg(pts[i]) if sg else pts[i]
            buckets[m] = oc.g1_add(buckets[m], p)
        run, tot = None, None
        for m in range(16, 0, -1):
            run = oc.g1_add(run, buckets[m])
            tot = oc.g1_add(tot, run)
        for _ in range(5):
            acc = oc.g1_double(acc)
        acc = oc.g1_add(acc, tot)
    want = oc.g1_msm(pts, ks)
    assert acc == want


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


def test_mont_mul_relaxed_contract():
    """_mont_mul_r (round-4 issue-rate fix): same VALUE as the exact
    product, limbs bounded by 257 (the _sub headroom limit — the
    smallest byte of 2p is 2), stable under deep chaining, and accepted
    by _add/_sub/_cond_sub/_mont_mul without canonicalizing first."""
    fc = _fc()
    a, b = rand_fq(T), rand_fq(T)
    A, B = _enc_mont(a), _enc_mont(b)
    r = ep._mont_mul_r(fc, A, B)
    assert _dec_mont_modp(r) == [x * y % Q for x, y in zip(a, b)]
    assert int(np.asarray(r).max()) <= 257
    assert all(v < 2 * Q for v in _dec(r))
    # chain 32 squarings through the relaxed domain: bounds must hold at
    # the fixed point, value must track the oracle
    want = [x * y % Q for x, y in zip(a, b)]
    for _ in range(32):
        r = ep._mont_mul_r(fc, r, r)
        want = [v * v % Q for v in want]
    assert int(np.asarray(r).max()) <= 257
    assert _dec_mont_modp(r) == want
    # relaxed operands through the canonicalizing ops
    r2 = ep._mont_mul_r(fc, A, B)
    ab = [x * y % Q for x, y in zip(a, b)]
    assert _dec_mont_modp(ep._add(fc, r2, r2)) == [2 * v % Q for v in ab]
    assert _dec_mont_modp(ep._sub(fc, A, r2)) == [
        (x - v) % Q for x, v in zip(a, ab)
    ]
    assert _dec_mont_modp(ep._sub(fc, r2, A)) == [
        (v - x) % Q for x, v in zip(a, ab)
    ]
    # exact product of relaxed operands stays canonical 8-bit
    e = ep._mont_mul(fc, r2, r2)
    assert int(np.asarray(e).max()) <= 255
    assert _dec_mont_modp(e) == [v * v % Q for v in ab]
