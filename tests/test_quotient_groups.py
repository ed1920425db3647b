"""Unit tests for the round-5 device-quotient layout logic (CPU).

The group-wise round-trip engine (plonk/quotient_device.py) cannot run
its Pallas kernels on this host (Mosaic interpret mode is unusable,
CLAUDE.md); on-chip byte parity is gated by tools/quotient_probe.py
(docs/quotient_probe_r5b.log) and the real k=22/23 proves.  What CAN be
verified here is the pure index logic those kernels rely on:

  * the schedule -> (group, band) assignment with tail padding;
  * the rotated-leaf tile reconstruction (main tile + wraparound
    neighbour tile + two lane rolls) against jnp.roll ground truth —
    exactly the arithmetic `_build_tile_fn`'s kernel executes per tile.
"""

import numpy as np

TL = 128


def _reconstruct_tile(band, g, rot):
    """The kernel's per-tile math: out[j] = band[(g*TL + j + rot) % n]."""
    n = band.shape[1]
    G = n // TL
    t0 = band[:, g * TL : (g + 1) * TL]
    if rot > 0:
        gn = (g + 1) % G
        t1 = band[:, gn * TL : (gn + 1) * TL]
        lane = np.arange(TL)[None, :]
        return np.where(
            lane < TL - rot,
            np.roll(t0, -rot, axis=1),
            np.roll(t1, -rot, axis=1),
        )
    if rot < 0:
        r = -rot
        gn = (g + G - 1) % G
        t1 = band[:, gn * TL : (gn + 1) * TL]
        lane = np.arange(TL)[None, :]
        return np.where(
            lane >= r, np.roll(t0, r, axis=1), np.roll(t1, r, axis=1)
        )
    return t0


def test_rotated_tile_reconstruction_matches_global_roll():
    rng = np.random.default_rng(5)
    n = 512  # 4 lane tiles, same G as the k=9 on-chip probe
    band = rng.integers(0, 256, size=(32, n)).astype(np.int32)
    for rot in (-6, -1, 0, 1, 5, 127, -127):
        want = np.roll(band, -rot, axis=1)  # the round-4 leaves_full op
        for g in range(n // TL):
            got = _reconstruct_tile(band, g, rot)
            assert np.array_equal(
                got, want[:, g * TL : (g + 1) * TL]
            ), f"rot={rot} tile={g}"


def test_schedule_grouping_and_padding():
    """key_order/locate grouping: stable schedule order, CG-sized
    groups, only the tail group padded."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halo2_aggregation_tpu.models import aggregation_circuit as ac
    from halo2_aggregation_tpu.plonk.circuit import ConstraintSystem
    from halo2_aggregation_tpu.plonk.quotient_device import DeviceQuotient

    cs = ConstraintSystem()
    ac.configure(cs)
    dq = DeviceQuotient(cs, 16)  # CPU instance: use_pallas False
    # key_order: distinct keys, schedule order preserved
    keys_in_sched = []
    for key, _ in dq.schedule:
        if key not in keys_in_sched:
            keys_in_sched.append(key)
    assert dq.key_order == keys_in_sched
    # every scheduled rotation fits one lane tile (the kernel's
    # neighbour-tile reconstruction requires |rot| < 128)
    assert all(abs(rot) < TL for _, rot in dq.schedule)
    # grouping math: ceil(C/CG) groups, tail pad < CG
    C = len(dq.key_order)
    CG = 4
    ngroups = (C + CG - 1) // CG
    assert ngroups * CG - C < CG
    # the aggregation circuit's shape this design was sized for
    assert C == 39 and len(dq.schedule) == 50
