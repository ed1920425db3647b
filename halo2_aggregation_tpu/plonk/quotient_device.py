"""Device (TPU) quotient pass for the scaled prover.

The quotient h(X) is the prover's dominant cost at outer-circuit scale
(k=21: the 4 coset passes are ~770s of an ~1,129s host prove on 2 cores;
ROADMAP round-3 item 1).  Per coset the work is embarrassingly parallel
over the 2^k rows: a size-n coset NTT per committed column, then one big
pointwise constraint-expression evaluation — exactly the shape the TPU
VPU wants.

This module mirrors `prover_native.create_proof_native`'s per-coset block
(prover_native.py:282-345) bit-for-bit, but runs it on the chip:

  host                                  device
  ----                                  ------
  coefficient columns (mont u64) --H2D--> packed (n,32) uint8, ONCE
                                         per coset:
                                           shift-power ladder (log n muls)
                                           coset NTT per column (ntt_dyn)
                                           rolled leaves (jnp.roll)
                                           gate/perm/lookup expressions
                                             via protocol.py + LimbOps
                                           fold_y, * 1/(shift^n - 1)
  h coset evals (mont u64) <--D2H-- packed uint8 slabs

Design notes:
* Columns live in HBM as (n, 32) uint8 byte views of the (n, 4)-u64 mont
  limbs — the u64 LE byte layout IS the 32x8-bit LE limb sequence, so
  H2D costs 32B/row and unpack is a dtype widen (ops/ntt.py:unpack8).
* Twiddle tables are runtime args (ntt_dyn), never jit constants: at
  k=21 they total 256MB.
* The expression pass runs in row slabs (default 2^18) so the unpacked
  leaf working set stays ~1.5GB regardless of k.
* Every jitted function is shape-stable across cosets AND proofs of the
  same (cs, k): challenges, shift powers and the vanishing inverse are
  arguments, not constants.

The reference's analog is the rayon-parallel `create_proof` quotient
evaluation inside its private halo2 fork (SURVEY.md §2b); the reference
itself never parallelizes beyond one CPU (SURVEY.md §2d).
"""

from __future__ import annotations

import numpy as np

from ..fields import R, fr_omega
from ..ops import field_ops as fo
from ..ops import ntt as nt
from .circuit import ConstraintSystem
from .protocol import (
    LimbOps,
    LookupEvals,
    PermutationSetEvals,
    fold_y,
    gate_expressions,
    lookup_expressions,
    permutation_expressions,
)


def native_twiddles(k: int, ntp=None, omega_nat_u8=None, omega_int=None):
    """DIT/DIF twiddle tables for `ntt_pallas.ntt_batched_u8` /
    `intt_batched_u8` at size 2^k, built by the native C++ pow_series
    (milliseconds for the ~2^k total entries) + one small H2D — the
    on-device strided u8 slices of prep_twiddles_dev measured 72s at
    k=21, and the host NttPlan Python loop ~90s.  `omega_int` overrides
    the root (pass omega^{-1} for the inverse-transform tables).  The
    global tables ship and STAY u8 ((32, n - 128) lane-concatenated,
    268MB at k=23 vs 1.07GB as the round-3 per-stage i32 arrays).
    Falls back to prep_twiddles_dev when the native engine is
    unavailable (then `omega_nat_u8` must be given and must be the
    series of the same root)."""
    import jax.numpy as jnp

    from ..utils import native

    if ntp is None:
        from ..ops import ntt_pallas as ntp
    if not native.available():
        if omega_nat_u8 is None:
            raise ValueError(
                "native engine unavailable: native_twiddles needs the "
                "device omega series (omega_nat_u8) for the "
                "prep_twiddles_dev fallback"
            )
        return ntp.prep_twiddles_dev(omega_nat_u8, k)
    from . import engine

    n = 1 << k
    omega = fr_omega(k) if omega_int is None else omega_int % R
    nloc = min(ntp.LOCAL_STAGES, k)
    loc, glo = [], []
    for s in range(k):
        m = 1 << (s + 1)
        w_m = pow(omega, n // m, R)
        tab = engine.pow_series(engine.mont_scalar(w_m), 1 << s)
        t8 = (
            np.ascontiguousarray(tab, dtype="<u8")
            .view(np.uint8)
            .reshape(1 << s, 32)
            .T
        )
        if s < nloc:
            loc.append(np.tile(t8, (1, ntp.TL // (1 << s))).astype(np.int32))
        else:
            glo.append(np.ascontiguousarray(t8))
    local_tws = jnp.asarray(np.concatenate(loc, axis=0))
    if not glo:
        return local_tws, ntp._empty_tw_cat()
    # one u8 H2D for all global stages (stage s at lane 2^s - 2^nloc)
    return local_tws, jnp.asarray(np.concatenate(glo, axis=1))

MONT_R = 1 << 256


def leaf_schedule(cs: ConstraintSystem, bf: int, num_chunks: int):
    """The engine's stable, deduped (key, rot) leaf order and the
    distinct-column order derived from it — shared by DeviceQuotient
    and the keygen-time static preload so their key sets agree."""
    sched: list = []
    seen = set()

    def add(key, rot):
        if (key, rot) not in seen:
            seen.add((key, rot))
            sched.append((key, rot))

    for c, rot in cs.advice_queries:
        add(("advice", c.index), rot.value)
    for c, rot in cs.fixed_queries:
        add(("fixed", c.index), rot.value)
    for c, rot in cs.instance_queries:
        add(("instance", c.index), rot.value)
    for i in range(len(cs.permutation_columns)):
        add(("sigma", i), 0)
    for ci in range(num_chunks):
        add(("perm_z", ci), 0)
        add(("perm_z", ci), 1)
        if ci < num_chunks - 1:
            add(("perm_z", ci), -(bf + 1))
    for li in range(len(cs.lookups)):
        add(("lookup_z", li), 0)
        add(("lookup_z", li), 1)
        add(("lookup_a", li), 0)
        add(("lookup_a", li), -1)
        add(("lookup_s", li), 0)
    add(("l0", 0), 0)
    add(("llast", 0), 0)
    add(("lblind", 0), 0)
    key_order = []
    seen_k = set()
    for key, _ in sched:
        if key not in seen_k:
            seen_k.add(key)
            key_order.append(key)
    return sched, key_order


def _pallas_engine_active(k: int) -> bool:
    """Would DeviceQuotient take the Pallas path at this k?  (Mirrors
    prover_native._use_device_quotient + the use_pallas gate without
    importing the prover — no cycle.)"""
    import os

    v = os.environ.get("H2A_DEVICE_QUOTIENT", "auto")
    if v == "0":
        return False
    if v != "1" and (k < 15 or k > 23):
        return False
    if os.environ.get("H2A_PALLAS_NTT", "1") != "1":
        return False
    try:
        import jax

        from ..ops import ntt_pallas as ntp

        if k < ntp.LOCAL_STAGES:
            return False
        return any(
            kk in jax.default_backend().lower() for kk in ("tpu", "axon")
        ) or jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


class StaticPreload:
    """Device-resident natural-order mont VALUE parts for the
    proof-independent columns (fixed / sigma / selector one-hots),
    built by keygen_native and attached to the ProvingKey — their
    ~60% share of the device stack ships through the 7-14MB/s tunnel
    during the keygen commit window instead of stealing 2-core CPU
    from the prove's commit stages (the async-H2D relay is host-CPU
    bound here; docs/PHASE_D_n1_k21_r5b_run.log measured stages 1-4 at
    260s vs 142s in round 4 purely from overlapped upload).  Consumed
    by the next create_proof_native on the same pk."""

    def __init__(self, k: int):
        self.k = k
        self.n = 1 << k
        self.parts = {}  # key -> device (32, n) u8
        self.evm = {}  # key -> host (n, 4) u64 mont values
        self.tables = None  # (omega_nat_u8, tws, tws_inv, ninv_tile)

    def build_tables(self):
        """Device omega ladder + DIT/DIF twiddle tables + 1/n tile —
        k-only state the engine otherwise rebuilds per prove (~14s at
        k=21: a device pow-series ladder plus a ~70-270MB twiddle H2D)."""
        from ..ops import ntt_pallas as ntp

        omega_nat_u8 = ntp.pow_series_u8(
            fr_omega(self.k), self.k, np.arange(self.n, dtype=np.int64)
        )
        tws = native_twiddles(self.k, ntp, omega_nat_u8)
        tws_inv = native_twiddles(
            self.k, ntp, None, omega_int=pow(fr_omega(self.k), -1, R)
        )
        ninv_tile = ntp.scalar_tile(pow(1 << self.k, -1, R) * MONT_R % R)
        # FORCE everything: the axon backend defers device work until a
        # D2H, so without these the ladder compute and twiddle H2D would
        # execute inside the prove's first coset instead of during
        # keygen (measured +78s on coset 1, PHASE_D_n1_k21_r5f_run.log)
        for arr in (omega_nat_u8, tws[0], tws[1], tws_inv[0], tws_inv[1],
                    ninv_tile):
            np.asarray(arr[:1, :1])
        self.tables = (omega_nat_u8, tws, tws_inv, ninv_tile)

    def add_plain(self, key, plain_col):
        from .engine import to_mont

        self.add_mont(key, to_mont(plain_col))

    def add_mont(self, key, col_m):
        import jax

        self.evm[key] = col_m
        part = np.ascontiguousarray(
            np.ascontiguousarray(col_m, dtype="<u8")
            .view(np.uint8)
            .reshape(self.n, 32)
            .T
        )
        self.parts[key] = jax.device_put(part)


def preload_static_keys(cs: ConstraintSystem) -> list:
    """The static (proof-independent) subset of the engine key order."""
    bf = cs.blinding_factors()
    chunk_len = cs.degree() - 2
    num_chunks = (len(cs.permutation_columns) + chunk_len - 1) // chunk_len
    _, key_order = leaf_schedule(cs, bf, num_chunks)
    return [
        key
        for key in key_order
        if key[0] in ("fixed", "sigma", "l0", "llast", "lblind")
    ]


def available() -> bool:
    try:
        import jax  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def _pack_host(col_u64: np.ndarray) -> np.ndarray:
    """(n, 4) uint64 mont -> (n, 32) uint8 byte view (zero-copy)."""
    a = np.ascontiguousarray(col_u64, dtype="<u8")
    return a.view(np.uint8).reshape(a.shape[0], 32)


def _unpack_host(packed: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 -> (n, 4) uint64."""
    return (
        np.ascontiguousarray(packed, dtype=np.uint8)
        .view("<u8")
        .astype(np.uint64)
    )


class DeviceQuotient:
    """One instance per (cs, k, coefficient set) == per proof.

    `columns` maps leaf keys to (n, 4)-u64 Montgomery coefficient arrays:
      ("advice", i) / ("fixed", i) / ("instance", i)  committed columns
      ("sigma", i)                                    permutation sigmas
      ("perm_z", ci)                                  grand products
      ("lookup_a"|"lookup_s"|"lookup_z", li)          lookup polys
      ("l0"|"llast"|"lblind", 0)                      Lagrange selectors
    """

    def __init__(self, cs: ConstraintSystem, k: int, columns: dict = None):
        """`columns=None` selects INCREMENTAL mode: the prover calls
        `feed(key, coeffs)` as each column's INTT finishes — the packed
        (32, n)-u8 part ships through an ASYNC device_put so the
        ~100-200s tunnel H2D overlaps the remaining host INTT work
        instead of serializing after it (VERDICT r3 item 2 / ROADMAP
        item 1's upload half) — then `finalize()` assembles the engine
        stack on-device."""
        import os

        import jax
        import jax.numpy as jnp

        self.cs = cs
        self.k = k
        self.n = 1 << k
        self.bf = cs.blinding_factors()
        self.chunk_len = cs.degree() - 2
        self.num_chunks = (
            len(cs.permutation_columns) + self.chunk_len - 1
        ) // self.chunk_len

        # Pallas NTT engine on TPU (ops/ntt_pallas.py): the staged-XLA
        # extension below is HBM-bound (~18s per k=21 column, no better
        # than the host); the Pallas path runs all columns per coset in
        # ~16 fused-butterfly kernel calls.  CPU (tests) keeps XLA.
        from ..ops import ntt_pallas as ntp

        on_tpu = any(
            kk in jax.default_backend().lower() for kk in ("tpu", "axon")
        ) or jax.devices()[0].platform.lower() in ("tpu", "axon")
        self.use_pallas = (
            on_tpu
            and k >= ntp.LOCAL_STAGES
            and os.environ.get("H2A_PALLAS_NTT", "1") == "1"
        )
        self._ntp = ntp

        import time

        self._tlog = (
            (lambda m, t0=[time.time()]: (
                print(f"    [dq {time.time() - t0[0]:6.1f}s] {m}", flush=True),
                t0.__setitem__(0, time.time()),
            ))
            if os.environ.get("H2A_DQ_TIMING", "0") == "1"
            else (lambda m: None)
        )
        self._finalized = False
        if self.use_pallas:
            self.twiddles = None
            self.bitrev_np = nt._bit_reverse_indices(k)
            self._parts = {}  # key -> device (32, n) u8 part (async H2D)
            # columns per group stack: every NTT kernel compiles once per
            # (CG, n), and the round-trip transform's transient working
            # set is ~2 group buffers (CG*32*n bytes each) on top of the
            # one resident stack — CG=4 keeps that at ~2GB at k=23.
            self.CG = int(os.environ.get("H2A_DQ_GROUP", "4"))
        else:
            # host-computed tables (NttPlan's twiddle loop is ~2^k Python
            # pows — only paid on the CPU/XLA path)
            plan = nt.NttPlan(k, fr_omega(k))
            self.bitrev = jnp.asarray(plan.bitrev)
            self.twiddles = tuple(jnp.asarray(t) for t in plan.stage_twiddles)
            self.store = {}

        # leaf schedule: stable, deduped (key, rot) order; key_order is
        # the canonical upload / group-stack order (feed() may arrive
        # in any order)
        self.schedule, self.key_order = leaf_schedule(
            cs, self.bf, self.num_chunks
        )

        if columns is not None:
            for key, col in columns.items():
                self.feed(key, col)
            self.finalize()

        # The coset extension runs as a Python-driven pipeline of SMALL
        # jitted pieces (pre: unpack+shift-mul+bit-reverse; 3 NTT stages
        # per call; post: pack) rather than one 21-stage executable: the
        # monolithic plan keeps too many (n, 32)-int32 stage buffers live
        # at k=21 and exhausts HBM at runtime even though each op's temps
        # are slab-bounded.  Per-call liveness is ~3 stage buffers.
        self._pre_fn = jax.jit(
            lambda p, sp, br: fo.mont_mul_big(
                nt.unpack8(p), sp, fo.FR, chunk=1 << 16
            )[br]
        )
        self._stage_fn = jax.jit(self._stage_group)
        self._pack_fn = jax.jit(nt.pack8)
        self._slab_fn = jax.jit(self._make_slab_fn())
        self._mul_pack = jax.jit(
            lambda a, b: nt.pack8(
                fo.mont_mul_big(a, jnp.broadcast_to(b, a.shape), fo.FR)
            )
        )

    def feed(self, key, col_u64):
        """Pack one (n, 4)-u64 mont coefficient column and ship it — via
        an ASYNC device_put on the Pallas path, so the tunnel transfer
        overlaps the caller's remaining host INTT work."""
        import jax
        import jax.numpy as jnp

        assert not self._finalized, "feed() after finalize()"
        assert getattr(self, "_mode", "coeff") == "coeff", (
            "cannot mix feed() and feed_evals() on one engine"
        )
        self._mode = "coeff"
        if self.use_pallas:
            a = np.ascontiguousarray(col_u64, dtype="<u8")[self.bitrev_np]
            part = np.ascontiguousarray(a.view(np.uint8).reshape(self.n, 32).T)
            self._parts[key] = jax.device_put(part)
        else:
            self.store[key] = jnp.asarray(_pack_host(col_u64))

    def feed_evals(self, key, col_m):
        """Ship one column as natural-order Montgomery EVALUATIONS — the
        device does the INTT (the coupled device-prover move: the host
        never computes coefficients at all; step 7 evaluations and the
        multiopen witnesses run from values via engine.Barycentric).

        On the Pallas path this is free machinery: the group stacks
        simply start in the "eval" domain at shift 1, and the first
        run_coset takes the SAME round-trip (device DIF INTT -> ratio
        power-series scale -> DIT NTT) every later coset already takes —
        exact mod r throughout, so h stays byte-identical (and the host
        bit-reverse permutation of feed() disappears too: the DIT NTT
        wants bit-reversed coefficients, which is exactly what the
        device DIF INTT emits).  The XLA/CPU path (tests) INTTs on the
        host here — same bytes, no device INTT kernels to exercise."""
        import jax
        import jax.numpy as jnp

        assert not self._finalized, "feed_evals() after finalize()"
        assert getattr(self, "_mode", "eval") == "eval", (
            "cannot mix feed() and feed_evals() on one engine"
        )
        self._mode = "eval"
        if self.use_pallas:
            part = np.ascontiguousarray(
                np.ascontiguousarray(col_m, dtype="<u8")
                .view(np.uint8)
                .reshape(self.n, 32)
                .T
            )
            self._parts[key] = jax.device_put(part)
        else:
            from .engine import NativeDomain

            if not hasattr(self, "_host_dom"):
                self._host_dom = NativeDomain(self.k)
            self.store[key] = jnp.asarray(
                _pack_host(self._host_dom.intt(col_m))
            )

    def adopt_static(self, parts: dict, tables=None):
        """Seed the engine with device parts a keygen-time StaticPreload
        already shipped (natural-order mont VALUES, same layout as
        feed_evals) — those columns' H2D happened during keygen.
        `tables` optionally carries the preload's k-only device tables
        (omega ladder, DIT/DIF twiddles, 1/n tile) so finalize skips
        rebuilding them."""
        assert not self._finalized, "adopt_static() after finalize()"
        assert getattr(self, "_mode", "eval") == "eval", (
            "cannot mix feed() with preloaded eval parts"
        )
        assert self.use_pallas, "static preload is Pallas-path only"
        self._mode = "eval"
        self._parts.update(parts)
        self._pre_tables = tables

    def finalize(self):
        """Assemble the per-GROUP engine stacks + device tables once
        every column has been fed.

        Memory plan (the round-4 single-stack design OOM'd 16GB HBM at
        k>=22, docs/PHASE_D_n2_k22_oom.log): columns live as
        ceil(C/CG) separate (CG*32, n)-u8 group stacks.  Each group is
        concatenated from its freshly-uploaded parts and the parts are
        freed BEFORE the next group assembles, so peak here is the
        resident set + ONE group (not 2x the full stack).  The same
        stacks are then transformed IN PLACE (coefficients <-> coset
        evaluations, `run_coset`) group by group, keeping the whole
        prove at ~S + 2 group buffers — ~12GB at k=23 for the
        aggregation circuit's 39 columns vs ~34GB for the round-4
        layout."""
        import jax.numpy as jnp

        assert not self._finalized, "finalize() twice"
        self._finalized = True
        tlog = self._tlog
        if self.use_pallas:
            ntp = self._ntp
            self.keys = list(self.key_order)
            missing = set(self.keys) - set(self._parts)
            assert not missing, f"finalize before feed of {sorted(missing)}"
            self.C = len(self.keys)
            CG = self.CG
            ngroups = (self.C + CG - 1) // CG
            pad = ngroups * CG - self.C
            tlog("host pack + async H2D")
            self._locate = {}
            self._groups = []
            for gi in range(ngroups):
                gkeys = self.keys[gi * CG : (gi + 1) * CG]
                parts = [self._parts.pop(key) for key in gkeys]
                if gi == ngroups - 1 and pad:
                    # zero-pad the tail group to CG columns: one NTT
                    # kernel shape for every group (zeros are inert
                    # through the whole pipeline and never read back)
                    parts.append(
                        jnp.zeros((pad * fo.NLIMBS, self.n), jnp.uint8)
                    )
                arr = (
                    jnp.concatenate(parts, axis=0)
                    if len(parts) > 1
                    else parts[0]
                )
                np.asarray(arr[:1, :1])  # force before freeing the parts
                del parts
                for bi, key in enumerate(gkeys):
                    self._locate[key] = (gi, bi)
                self._groups.append(arr)
            self._parts = None
            tlog(f"group stacks ({ngroups} x {CG} cols)")
            # natural-order omega powers (u8, device) feed the per-coset
            # evaluation points — no host twiddle loop, no XLA ladder.
            # A keygen-time preload may carry all the k-only tables.
            pre_tables = getattr(self, "_pre_tables", None)
            if pre_tables is not None:
                (
                    self.omega_nat_u8,
                    self.tws,
                    self.tws_inv,
                    self._ninv_tile,
                ) = pre_tables
                tlog("tables adopted from keygen preload")
            else:
                self.omega_nat_u8 = ntp.pow_series_u8(
                    fr_omega(self.k), self.k, np.arange(self.n, dtype=np.int64)
                )
                np.asarray(self.omega_nat_u8[:1, :1])
                tlog("omega ladder")
                self.tws = self._twiddles_native(self.k)
                self.tws_inv = native_twiddles(
                    self.k, ntp, None, omega_int=pow(fr_omega(self.k), -1, R)
                )
                self._ninv_tile = ntp.scalar_tile(
                    pow(1 << self.k, -1, R) * MONT_R % R
                )
                np.asarray(self.tws[0][:1, :1])
                tlog("twiddles (fwd + inv)")
            # round-trip state: with feed(), the group stacks start as
            # bit-reversed COEFFICIENT columns; with feed_evals(), as the
            # shift-1 domain EVALUATIONS (the first run_coset then takes
            # the same INTT round-trip every later coset takes).  After
            # each run_coset they hold that coset's EVALUATIONS (shift
            # factor recorded), which the next run_coset round-trips back
            # through the device INTT instead of keeping a second
            # full-width stack resident
            self._domain = (
                "eval" if getattr(self, "_mode", "coeff") == "eval" else "coeff"
            )
            self._cur_shift = 1

            import jax

            k_, CG_ = self.k, CG

            def first_step(Xg, sp, tws):
                return ntp.ntt_batched_u8(
                    ntp.ew_mul_u8(Xg, sp, CG_, False), tws, k_, CG_, False
                )

            def round_step(Xg, sp, tws_f, tws_i, ninv):
                c = ntp.intt_batched_u8(Xg, tws_i, ninv, k_, CG_)
                return ntp.ntt_batched_u8(
                    ntp.ew_mul_u8(c, sp, CG_, False), tws_f, k_, CG_, False
                )

            self._first_fn = jax.jit(first_step, donate_argnums=(0,))
            self._round_fn = jax.jit(round_step, donate_argnums=(0,))

            def intt_step(Xg, tws_i, ninv):
                return ntp.intt_batched_u8(Xg, tws_i, ninv, k_, CG_)

            # keep-coefficients mode (small k): hold a pristine bitrev-
            # coefficient stack and run each coset as scale+NTT from it
            # (the round-4 schedule: ~half the per-coset butterfly work
            # of the INTT round trip) — only when TWO stacks fit HBM
            # comfortably (k<=21 for the aggregation circuits; the
            # round-trip layout remains the k=22/23 path).
            self._intt_fn = jax.jit(intt_step, donate_argnums=(0,))
            self._scale_ntt_fn = jax.jit(first_step)  # no donation
            self._cgroups = None
            import os

            v = os.environ.get("H2A_DQ_KEEP_COEFFS", "auto")
            two_stacks = 2 * len(self._groups) * CG * fo.NLIMBS * self.n
            self.keep_coeffs = v == "1" or (
                v == "auto" and two_stacks <= (11 << 30)
            )
            self._tile_fn = None  # built lazily (jitted fused kernel)
        else:
            self.keys = list(self.store.keys())
            self.key_idx = {key: i for i, key in enumerate(self.keys)}
            self.C = len(self.keys)
            # omega powers (coset_x = shift*omega^i), computed on-device
            omega_m = jnp.asarray(fo.FR.to_mont(fr_omega(self.k)))
            self.omega_pows = nt.pow_series_dev(omega_m, self.n)

    def _twiddles_native(self, k: int):
        return native_twiddles(k, self._ntp, self.omega_nat_u8)

    # -- per-column coset extension ----------------------------------------
    @staticmethod
    def _stage_group(x, tws):
        """Apply a group of consecutive CT butterfly stages; `tws` is a
        tuple of (2^s, 32) twiddle tables (shapes fix the stage indices)."""
        import jax.numpy as jnp

        n = x.shape[0]
        for tw in tws:
            half = tw.shape[0]
            m = half * 2
            a = x.reshape(n // m, m, fo.NLIMBS)
            lo = a[:, :half]
            hi = a[:, half:]
            t = fo.mont_mul_big(
                hi, jnp.broadcast_to(tw[None], hi.shape), fo.FR, chunk=1 << 16
            )
            x = jnp.concatenate(
                [fo.add(lo, t, fo.FR), fo.sub(lo, t, fo.FR)], axis=1
            ).reshape(n, fo.NLIMBS)
        return x

    def _extend(self, packed, shift_pows, stages_per_call=3):
        x = self._pre_fn(packed, shift_pows, self.bitrev)
        k = len(self.twiddles)
        for s0 in range(0, k, stages_per_call):
            x = self._stage_fn(x, tuple(self.twiddles[s0 : s0 + stages_per_call]))
        return self._pack_fn(x)

    # -- the pointwise expression pass over one row slab ---------------------
    def _make_slab_fn(self):
        cs = self.cs
        schedule = list(self.schedule)
        chunk_len = self.chunk_len
        num_chunks = self.num_chunks

        class _SlabOps(LimbOps):
            """Expression muls in lax.map slabs: at slab = 2^18 rows the
            expression DAG holds ~12 independent products live, and
            full-width conv temps (2GB each) blow HBM (measured 24.1GB
            at k=21).  Chunked muls cap each product's temps at ~256MB
            and XLA reuses the map body's buffers across iterations."""

            def mul(self, a, b):
                return self.fo.mont_mul_big(
                    a, b, self.FR, chunk=1 << 14, force=True
                )

        def slab_fn(leaves, coset_x, theta, beta, gamma, y, vinv):
            ops = _SlabOps()
            vals = {
                sk: nt.unpack8(l) for sk, l in zip(map(tuple, schedule), leaves)
            }

            def leaf(kind, idx, rot=0):
                return vals[((kind, idx), rot)]

            adv = [
                leaf("advice", c.index, rot.value)
                for c, rot in cs.advice_queries
            ]
            fix = [
                leaf("fixed", c.index, rot.value)
                for c, rot in cs.fixed_queries
            ]
            inst = [
                leaf("instance", c.index, rot.value)
                for c, rot in cs.instance_queries
            ]
            sigma = [
                leaf("sigma", i) for i in range(len(cs.permutation_columns))
            ]
            l0 = leaf("l0", 0)
            llast = leaf("llast", 0)
            lblind = leaf("lblind", 0)
            x = nt.unpack8(coset_x)

            exprs = gate_expressions(ops, cs, adv, fix, inst)
            perm_sets = [
                PermutationSetEvals(
                    z=leaf("perm_z", ci),
                    z_next=leaf("perm_z", ci, 1),
                    z_last=(
                        leaf("perm_z", ci, -(self.bf + 1))
                        if ci < num_chunks - 1
                        else None
                    ),
                )
                for ci in range(num_chunks)
            ]
            exprs += permutation_expressions(
                ops, cs, perm_sets, sigma, adv, fix, inst,
                l0, llast, lblind, beta, gamma, x, chunk_len,
            )
            for li, arg in enumerate(cs.lookups):
                ev = LookupEvals(
                    z=leaf("lookup_z", li),
                    z_next=leaf("lookup_z", li, 1),
                    a_prime=leaf("lookup_a", li),
                    a_prime_prev=leaf("lookup_a", li, -1),
                    s_prime=leaf("lookup_s", li),
                )
                exprs += lookup_expressions(
                    ops, ev, arg, l0, llast, lblind,
                    theta, beta, gamma, adv, fix, inst,
                )
            num = fold_y(ops, exprs, y)
            num = ops.mul(num, vinv)
            return nt.pack8(num)

        return slab_fn

    # -- the fused Pallas expression kernel (one dispatch per coset) ----------
    def _build_tile_fn(self):
        """The whole pointwise quotient pass — gate + permutation +
        lookup expressions, y-fold, vanishing division — as ONE Pallas
        kernel over (32, 128) tiles.  The XLA slab path (above) runs the
        same formulas at ~3M mont-muls/s, HBM-bound through materialized
        conv temps (~60s/coset at k=21); in-VMEM the pass is
        compute-bound at ~100M muls/s (~1-2s/coset).  protocol.py's
        formulas are reused verbatim over a fifth ScalarOps backend built
        on the ec_pallas limb primitives.

        Leaf access: the kernel reads the GROUP STACKS directly — each
        schedule entry (column, rotation) becomes a BlockSpec whose index
        map picks the column's sublane band and lane tile, and a rotated
        leaf fetches its neighbour tile too and reconstructs the shifted
        window with two in-kernel lane rolls.  The round-4 design
        materialized every rolled leaf as its own (32, n) array first:
        12.5GB of copies at k=23 that this layout never allocates."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ops import ec_pallas as ep

        ntp = self._ntp
        cs = self.cs
        schedule = [(tuple(key), rot) for key, rot in self.schedule]
        chunk_len = self.chunk_len
        num_chunks = self.num_chunks
        bf = self.bf
        nl = len(schedule)
        NL = fo.NLIMBS
        TLn = ntp.TL
        n = self.n
        G = n // TLn  # lane-tile count == expression grid size
        # (group, band, rot) per schedule entry, in kernel-operand order
        entries = [
            (*self._locate[key], rot) for key, rot in schedule
        ]
        for _, _, rot in entries:
            assert abs(rot) < TLn, f"rotation {rot} exceeds one lane tile"

        from jax import lax

        class TileOps:
            """ScalarOps over (32, 128) redundant-Montgomery tiles.

            Constants are built IN-TRACE from scalar literals (iota +
            selects): Pallas kernels may not capture array constants."""

            def __init__(self, fc):
                self.fc = fc

            def constant(self, v):
                limbs = np.asarray(fo.FR.to_mont(v % R), np.int64)
                ids = lax.broadcasted_iota(jnp.int32, (NL, TLn), 0)
                out = jnp.zeros((NL, TLn), jnp.int32)
                for l in range(NL):
                    lv = int(limbs[l])
                    if lv:
                        out = jnp.where(ids == l, lv, out)
                return out

            def add(self, a, b):
                return ep._add(self.fc, a, b)

            def sub(self, a, b):
                return ep._sub(self.fc, a, b)

            def mul(self, a, b):
                # relaxed-domain product (limbs <= 257): every consumer
                # in the expression DAG (add/sub/mul/the final
                # _cond_sub carry) accepts relaxed operands
                return ep._mont_mul_r(self.fc, a, b)

            def neg(self, a):
                return ep._sub(self.fc, jnp.zeros_like(a), a)

            def scale(self, a, v):
                return self.mul(a, self.constant(v))

        def kernel(*refs):
            fc = tuple(r[:] for r in refs[:5])
            compp = refs[5][:]
            lane = lax.broadcasted_iota(jnp.int32, (NL, TLn), 1)
            vals = {}
            ri = 6
            for (key, rot), (gi, bi, _) in zip(schedule, entries):
                t0 = refs[ri][:].astype(jnp.int32)
                ri += 1
                if rot > 0:
                    # window [gT+rot, gT+rot+TL): tail of tile g, head of
                    # tile g+1 — two rolls + a lane select
                    t1 = refs[ri][:].astype(jnp.int32)
                    ri += 1
                    v = jnp.where(
                        lane < TLn - rot,
                        jnp.roll(t0, -rot, axis=1),
                        jnp.roll(t1, -rot, axis=1),
                    )
                elif rot < 0:
                    r = -rot
                    t1 = refs[ri][:].astype(jnp.int32)  # tile g-1
                    ri += 1
                    v = jnp.where(
                        lane >= r,
                        jnp.roll(t0, r, axis=1),
                        jnp.roll(t1, r, axis=1),
                    )
                else:
                    v = t0
                vals[(key, rot)] = v
            cx = refs[ri][:].astype(jnp.int32)
            th = refs[ri + 1][:]
            be = refs[ri + 2][:]
            ga = refs[ri + 3][:]
            yv = refs[ri + 4][:]
            vi = refs[ri + 5][:]
            out_ref = refs[ri + 6]

            ops = TileOps(fc)

            def leaf(kind, idx, rot=0):
                return vals[((kind, idx), rot)]

            adv = [
                leaf("advice", c.index, rot.value)
                for c, rot in cs.advice_queries
            ]
            fix = [
                leaf("fixed", c.index, rot.value)
                for c, rot in cs.fixed_queries
            ]
            inst = [
                leaf("instance", c.index, rot.value)
                for c, rot in cs.instance_queries
            ]
            sigma = [
                leaf("sigma", i) for i in range(len(cs.permutation_columns))
            ]
            l0 = leaf("l0", 0)
            llast = leaf("llast", 0)
            lblind = leaf("lblind", 0)

            exprs = gate_expressions(ops, cs, adv, fix, inst)
            perm_sets = [
                PermutationSetEvals(
                    z=leaf("perm_z", ci),
                    z_next=leaf("perm_z", ci, 1),
                    z_last=(
                        leaf("perm_z", ci, -(bf + 1))
                        if ci < num_chunks - 1
                        else None
                    ),
                )
                for ci in range(num_chunks)
            ]
            exprs += permutation_expressions(
                ops, cs, perm_sets, sigma, adv, fix, inst,
                l0, llast, lblind, be, ga, cx, chunk_len,
            )
            for li, arg in enumerate(cs.lookups):
                ev = LookupEvals(
                    z=leaf("lookup_z", li),
                    z_next=leaf("lookup_z", li, 1),
                    a_prime=leaf("lookup_a", li),
                    a_prime_prev=leaf("lookup_a", li, -1),
                    s_prime=leaf("lookup_s", li),
                )
                exprs += lookup_expressions(
                    ops, ev, arg, l0, llast, lblind,
                    th, be, ga, adv, fix, inst,
                )
            num = fold_y(ops, exprs, yv)
            num = ops.mul(num, vi)
            # exact 32-limb carry first: _cond_sub's a<p branch returns
            # its input unchanged, which must be canonical for the u8
            # store (same pattern as fa_fused's `canon`)
            out_ref[:] = ep._cond_sub(compp, ep._carry(num, NL)).astype(
                jnp.uint8
            )

        lspec = lambda: pl.BlockSpec(
            (NL, TLn), lambda g: (0, g), memory_space=pltpu.VMEM
        )
        cspec = lambda: pl.BlockSpec(
            (NL, TLn), lambda g: (0, 0), memory_space=pltpu.VMEM
        )

        def band_spec(bi, dg=0):
            # column band bi of a (CG*32, n) group stack, lane tile
            # g+dg (mod G) — rotated leaves fetch the wraparound
            # neighbour tile through the block schedule, zero copies
            if dg == 0:
                imap = lambda g, bi=bi: (bi, g)
            elif dg > 0:
                imap = lambda g, bi=bi: (bi, (g + dg) % G)
            else:
                imap = lambda g, bi=bi: (bi, (g + G + dg) % G)
            return pl.BlockSpec((NL, TLn), imap, memory_space=pltpu.VMEM)

        def run(groups, cx_u8, th_t, be_t, ga_t, y_t, vi_t):
            in_specs = [cspec() for _ in range(6)]
            args = list(ntp._consts_dev())
            for gi, bi, rot in entries:
                in_specs.append(band_spec(bi))
                args.append(groups[gi])
                if rot:
                    in_specs.append(band_spec(bi, 1 if rot > 0 else -1))
                    args.append(groups[gi])
            in_specs.append(lspec())
            args.append(cx_u8)
            in_specs += [cspec() for _ in range(5)]
            args += [th_t, be_t, ga_t, y_t, vi_t]
            return pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=in_specs,
                out_specs=lspec(),
                out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint8),
            )(*args)

        return jax.jit(run)

    # -- driver --------------------------------------------------------------
    def run_coset(
        self,
        shift: int,
        theta: int,
        beta: int,
        gamma: int,
        y: int,
        slab_log2: int = 17,
    ) -> np.ndarray:
        """h-numerator/vanishing evals on the {shift * omega^i} coset,
        returned as a (n, 4) uint64 Montgomery array (matches the value
        prover_native stores into h_ext_m[cj::step])."""
        import jax.numpy as jnp

        n = self.n
        shift_m = jnp.asarray(fo.FR.to_mont(shift))

        # Force intermediates to EXECUTE before enqueueing more: the axon
        # backend defers all work until a D2H, and one giant deferred graph
        # exhausts HBM at k=21 (every slab's input slices live at once).
        def force(arr):
            np.asarray(arr[:1, :1])
            return arr

        vinv = pow((pow(shift, n, R) - 1) % R, -1, R)

        if self.use_pallas:
            ntp = self._ntp
            # Move the group stacks to this coset's evaluations.  First
            # coset: coefficients * shift^i -> NTT.  Later cosets: the
            # stacks hold the PREVIOUS coset's evaluations, so round-trip
            # each group through the device INTT, scale by the shift
            # RATIO's power series, and NTT forward again — one stack
            # stays resident instead of coefficients + extension (the
            # k>=22 OOM of the round-4 layout).  All values exact mod p
            # throughout, so h stays byte-identical to the host loop.
            if self.keep_coeffs:
                # scale+NTT from the pristine coefficient stack (built
                # once: eval-fed groups take ONE device INTT first)
                sp = force(
                    ntp.pow_series_bitrev_u8(shift % R, self.k, self.bitrev_np)
                )
                if self._cgroups is None:
                    if self._domain == "coeff":
                        self._cgroups = self._groups
                    else:
                        self._cgroups = []
                        for gi in range(len(self._groups)):
                            Xg = self._groups[gi]
                            self._groups[gi] = None
                            self._cgroups.append(
                                force(
                                    self._intt_fn(
                                        Xg, self.tws_inv, self._ninv_tile
                                    )
                                )
                            )
                    self._groups = [None] * len(self._cgroups)
                for gi in range(len(self._cgroups)):
                    self._groups[gi] = None  # previous coset's evals die
                    self._groups[gi] = force(
                        self._scale_ntt_fn(self._cgroups[gi], sp, self.tws)
                    )
                del sp
                self._domain = "eval"
                self._cur_shift = shift
            else:
                if self._domain == "coeff":
                    ratio = shift % R
                    step_fn = lambda Xg, sp: self._first_fn(Xg, sp, self.tws)
                else:
                    ratio = shift * pow(self._cur_shift, -1, R) % R
                    step_fn = lambda Xg, sp: self._round_fn(
                        Xg, sp, self.tws, self.tws_inv, self._ninv_tile
                    )
                sp = force(
                    ntp.pow_series_bitrev_u8(ratio, self.k, self.bitrev_np)
                )
                for gi in range(len(self._groups)):
                    Xg = self._groups[gi]
                    self._groups[gi] = None  # donated: old buffer is dead
                    # force each group before the next: the axon backend
                    # defers work until a D2H, and an unbounded deferred
                    # graph keeps every group's transient buffers live
                    self._groups[gi] = force(step_fn(Xg, sp))
                del sp
                self._domain = "eval"
                self._cur_shift = shift

            mont = lambda v: v * MONT_R % R
            cx_u8 = ntp.ew_mul_scalar_u8(
                self.omega_nat_u8, ntp.scalar_tile(mont(shift)), 1, False
            )
            if self._tile_fn is None:
                self._tile_fn = self._build_tile_fn()
            out = np.asarray(
                self._tile_fn(
                    self._groups,
                    cx_u8,
                    ntp.scalar_tile(mont(theta)),
                    ntp.scalar_tile(mont(beta)),
                    ntp.scalar_tile(mont(gamma)),
                    ntp.scalar_tile(mont(y)),
                    ntp.scalar_tile(mont(vinv)),
                )
            )  # (32, n) u8, canonical
            return _unpack_host(out.T)

        shift_pows = nt.pow_series_dev(shift_m, n)
        ext = {}
        for key, p in self.store.items():
            ext[key] = force(self._extend(p, shift_pows))
        leaves_full = []
        for key, rot in self.schedule:
            e = ext[key]
            leaves_full.append(jnp.roll(e, -rot, axis=0) if rot else e)
        coset_x = self._mul_pack(self.omega_pows, shift_m)

        th = jnp.asarray(fo.FR.to_mont(theta))
        be = jnp.asarray(fo.FR.to_mont(beta))
        ga = jnp.asarray(fo.FR.to_mont(gamma))
        yy = jnp.asarray(fo.FR.to_mont(y))
        vi = jnp.asarray(fo.FR.to_mont(vinv))

        slab = min(1 << slab_log2, n)
        outs = []
        for s0 in range(0, n, slab):
            sl = tuple(l[s0 : s0 + slab] for l in leaves_full)
            outs.append(
                np.asarray(
                    self._slab_fn(sl, coset_x[s0 : s0 + slab], th, be, ga, yy, vi)
                )
            )
        packed = np.concatenate(outs, axis=0)
        return _unpack_host(packed)
