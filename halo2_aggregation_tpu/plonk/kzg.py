"""KZG commitment scheme: toy SRS setup + Lagrange-basis commitments.

Replaces the fork APIs `Setup::<Bn256>::new(k, rng)`,
`Setup::verifier_params`, `Params::{read,write}`, `params.commit_lagrange`
(`/root/reference/examples/simple-example.rs:584-693`).

TPU-first design note: the whole prover works in *Lagrange space* — every
committed polynomial has degree < n, so commitments only ever need the
Lagrange SRS ``[L_i(tau)]G1``, and opening witnesses are produced pointwise
on the domain (see prover.py) rather than by sequential synthetic division.
The monomial SRS never materializes.

Like the reference (which caches `/tmp/halo2-{k}.params`), generated params
are cached on disk keyed by k and seed.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..fields import R, fr_omega
from ..oracle import curve as oc
from ..utils.serialization import g1_compress


CACHE_DIR = os.environ.get("H2A_PARAMS_CACHE", "/tmp/h2a-params")


class Params:
    """SRS for domain size n = 2^k.

    Attributes:
      g1: generator (int pair)
      g_lagrange: list of n affine points [L_i(tau)]G1 (host int pairs)
      g2, s_g2: G2 generator and [tau]G2 (Fq2 coordinate pairs)
    """

    def __init__(self, k: int, g_lagrange, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g1 = oc.g1_generator()
        self.g_lagrange = g_lagrange
        self.g2 = g2
        self.s_g2 = s_g2
        self._device_points = None

    # -- commitments --------------------------------------------------------
    def commit_lagrange(self, values) -> tuple | None:
        """Commit to a polynomial given by its evaluations on the domain.
        Host orchestration, device MSM (falls back to oracle for tiny n)."""
        assert len(values) <= self.n
        vals = [int(v) % R for v in values]
        if len(vals) < self.n:
            vals = vals + [0] * (self.n - len(vals))
        return self._msm(vals)

    def _msm(self, scalars_int):
        use_device = os.environ.get("H2A_DEVICE_MSM", "0") == "1"
        if not use_device:
            from ..utils import native

            if native.available():
                return native.g1_msm(self.g_lagrange, scalars_int)
            return oc.g1_msm(self.g_lagrange, scalars_int)
        import jax.numpy as jnp

        from ..ops import curve_ops as co
        from ..ops import msm as msm_mod
        from ..ops.limbs import ints_to_limbs

        if self._device_points is None:
            self._device_points = co.affine_from_ints(self.g_lagrange)
        res = msm_mod.msm(
            self._device_points, jnp.asarray(ints_to_limbs(scalars_int)), nbits=254
        )
        return co.jac_to_ints(co.JacPoint(res.x[None], res.y[None], res.z[None]))[0]

    # -- persistence --------------------------------------------------------
    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "k": self.k,
                    "g_lagrange": self.g_lagrange,
                    "g2": self.g2,
                    "s_g2": self.s_g2,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "Params":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return Params(d["k"], d["g_lagrange"], d["g2"], d["s_g2"])


def setup(k: int, seed: int = 0xE5BC0654) -> Params:
    """Toy (tau-known) setup, deterministic in (k, seed) — the analog of
    `Setup::new(k, XorShiftRng(seed))`.  Caches to disk."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"params-{k}-{seed:x}.pkl")
    if os.path.exists(cache):
        return Params.load(cache)

    rng = np.random.default_rng(seed)
    tau = int.from_bytes(rng.bytes(40), "little") % R
    n = 1 << k
    omega = fr_omega(k)
    # L_i(tau) = omega^i (tau^n - 1) / (n (tau - omega^i))
    tn1 = (pow(tau, n, R) - 1) % R
    n_inv = pow(n, -1, R)
    scalars = []
    wi = 1
    for _ in range(n):
        denom = (tau - wi) % R
        scalars.append(wi * tn1 % R * pow(denom * n, -1, R) % R)
        wi = wi * omega % R
    g = oc.g1_generator()
    g_lagrange = _batch_g1_mul(g, scalars)
    g2 = oc.g2_generator()
    s_g2 = oc.g2_mul(g2, tau)
    params = Params(k, g_lagrange, g2, s_g2)
    params.save(cache)
    return params


def _batch_g1_mul(base, scalars):
    """Host-or-device batched fixed-base scalar mul for SRS generation."""
    n = len(scalars)
    if n <= 1 << 10 or os.environ.get("H2A_DEVICE_MSM", "0") != "1":
        from ..utils import native

        if native.available():
            return native.g1_batch_mul(base, scalars)
        # fixed-base with shared doubling table
        table = []
        p = base
        for _ in range(254):
            table.append(p)
            p = oc.g1_double(p)
        out = []
        for s in scalars:
            acc = None
            b = 0
            while s:
                if s & 1:
                    acc = oc.g1_add(acc, table[b])
                s >>= 1
                b += 1
            out.append(acc)
        return out
    import jax.numpy as jnp

    from ..ops import curve_ops as co
    from ..ops.limbs import ints_to_limbs

    pts = co.affine_from_ints([base] * n)
    res = co.scalar_mul(co.affine_to_jac(pts), jnp.asarray(ints_to_limbs(scalars)), 254)
    return co.jac_to_ints(res)
