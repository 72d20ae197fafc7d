"""Counter-RNG statistical quality (the renderer's determinism rests on
this hash — validate it like the reference validates its SFMT,
src/tests/test_random.cpp)."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import chi2 as _chi2

from mitsuba_tpu.core import rng


def test_uniformity_chi2():
    n = 1_000_000
    u = np.asarray(rng.rand1(jnp.arange(n), 3, 17, 0))
    counts, _ = np.histogram(u, bins=256, range=(0, 1))
    expected = n / 256
    stat = ((counts - expected) ** 2 / expected).sum()
    p = _chi2.sf(stat, 255)
    assert p > 1e-4, (stat, p)


def test_no_correlation_between_slots():
    """Adjacent decision slots for the same lane must be independent."""
    n = 200_000
    lanes = jnp.arange(n)
    a = np.asarray(rng.rand1(lanes, 5, 40, 0))
    b = np.asarray(rng.rand1(lanes, 5, 41, 0))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01, corr


def test_no_correlation_between_lanes():
    """Sequential lanes (the common camera-ray layout) must decorrelate."""
    n = 200_000
    u = np.asarray(rng.rand1(jnp.arange(n), 0, 7, 0))
    corr = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr) < 0.01, corr


def test_avalanche():
    """Single input-bit flips must flip ~half the output bits."""
    n = 4096
    base = np.asarray(
        rng.pcg4d(
            jnp.stack(
                [jnp.arange(n, dtype=jnp.uint32)] * 4, axis=-1
            )
        )
    )
    for bit in (0, 7, 19, 31):
        flipped_in = jnp.stack(
            [jnp.arange(n, dtype=jnp.uint32) ^ jnp.uint32(1 << bit)]
            + [jnp.arange(n, dtype=jnp.uint32)] * 3,
            axis=-1,
        )
        flipped = np.asarray(rng.pcg4d(flipped_in))
        diff = np.unpackbits(
            (base ^ flipped).view(np.uint8), axis=None
        )
        frac = diff.mean()
        assert 0.45 < frac < 0.55, (bit, frac)


def test_seed_changes_everything():
    n = 10_000
    a = np.asarray(rng.rand1(jnp.arange(n), 0, 0, 0))
    b = np.asarray(rng.rand1(jnp.arange(n), 0, 0, 1))
    assert (a != b).mean() > 0.999


def test_mean_and_variance():
    n = 1_000_000
    u = np.asarray(rng.rand4(jnp.arange(n), 1, 2, 3)).ravel()
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 2e-3


def test_sobol_02_first_points():
    """(0,2)-sequence: first 4 unscrambled points are the canonical set."""
    pts = np.asarray(rng.sobol_2d(jnp.arange(4)))
    ref = np.array([[0, 0], [0.5, 0.5], [0.25, 0.75], [0.75, 0.25]])
    assert np.allclose(pts, ref)


def test_sobol_stratification():
    """Any 2^k prefix of the (0,2)-sequence is stratified on a 2^k grid."""
    n = 256
    pts = np.asarray(rng.sobol_2d(jnp.arange(n)))
    cells = (pts[:, 0] * 16).astype(int) * 16 + (pts[:, 1] * 16).astype(int)
    assert len(set(cells.tolist())) == n


def test_rand4_component_independence():
    """Components of ONE rand4 output drive different decisions (e.g.
    NEE xyz + RR w share a hash call), so pairwise independence across
    components is a hard requirement (ADVICE r1)."""
    n = 200_000
    u = np.asarray(rng.rand4(jnp.arange(n), 9, 123, 0))
    for i in range(4):
        for j in range(i + 1, 4):
            corr = np.corrcoef(u[:, i], u[:, j])[0, 1]
            assert abs(corr) < 0.01, (i, j, corr)
            # 2D chi-square on the binned joint distribution
            k = 16
            hist, _, _ = np.histogram2d(
                u[:, i], u[:, j], bins=k, range=[[0, 1], [0, 1]]
            )
            expected = n / (k * k)
            stat = ((hist - expected) ** 2 / expected).sum()
            p = _chi2.sf(stat, k * k - 1)
            assert p > 1e-4, (i, j, stat, p)


def test_stream_partition_distinct():
    """Every RNG stream tag must map a given user seed to a distinct
    seed word — the global slot partition rests on this."""
    streams = [
        rng.STREAM_PATH,
        rng.STREAM_CAMERA,
        rng.STREAM_MEDIUM_DIST,
        rng.STREAM_MEDIUM_TRANS,
        rng.STREAM_LIGHT,
        rng.STREAM_MLT,
        rng.STREAM_SSS,
    ]
    assert len(set(streams)) == len(streams)
    for seed in (0, 1, 12345, 0xFFFFFF):
        words = [int(rng.stream_seed(seed, s)) for s in streams]
        assert len(set(words)) == len(words), (seed, words)
        # user seeds stay below bit 28, so tags can't alias across seeds
        assert all((w >> 28) == s for w, s in zip(words, streams))


def test_stream_partition_no_cross_stream_collisions():
    """The concrete round-1 bugs: camera jitter slot 0 must differ from
    volpath distance-sampling slot 0; heterogeneous tracking draws must
    differ from main-loop draws at every (event, step) combination."""
    n = 4096
    lanes = jnp.arange(n)
    jitter = np.asarray(
        rng.rand2(lanes, 0, 0, rng.stream_seed(0, rng.STREAM_CAMERA))
    )
    dist0 = np.asarray(rng.rand2(lanes, 0, 0, 0))  # volpath u4(0, SLOT_DIST)
    assert (jitter != dist0).any(axis=-1).all()

    # tracking slot space: event * MAX_TRACKING_STEPS + step, own stream
    from mitsuba_tpu.medium.eval import MAX_TRACKING_STEPS

    main = {}
    for event in range(0, 96):
        for slot in range(8):
            main[(event * 8 + slot, 0)] = ("path", event, slot)
    for event in range(0, 96):
        for step in (0, 1, MAX_TRACKING_STEPS - 1):
            key = (
                event * MAX_TRACKING_STEPS + step,
                int(rng.stream_seed(0, rng.STREAM_MEDIUM_DIST)),
            )
            assert key not in main, key
            main[key] = ("dist", event, step)
    for base in range(0, 96 * 8):
        for step in (0, MAX_TRACKING_STEPS - 1):
            key = (
                base * MAX_TRACKING_STEPS + step,
                int(rng.stream_seed(0, rng.STREAM_MEDIUM_TRANS)),
            )
            assert key not in main, key
