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
