"""Chi-square tests for the sampling warps (= reference test_chisquare
over warp functions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import warp
from tests.chi2 import chi2_test


N = 200_000


@pytest.mark.parametrize(
    "sample_fn,pdf_fn",
    [
        (
            warp.square_to_uniform_sphere,
            lambda d: jnp.full(d.shape[:-1], warp.INV_FOURPI),
        ),
        (
            warp.square_to_uniform_hemisphere,
            lambda d: jnp.where(d[..., 2] >= 0, warp.INV_TWOPI, 0.0),
        ),
        (
            warp.square_to_cosine_hemisphere,
            warp.square_to_cosine_hemisphere_pdf,
        ),
        (
            # cutoff at 36 deg = a chi-square bin boundary (theta_res=10),
            # so the discontinuous pdf integrates exactly over bins
            lambda u: warp.square_to_uniform_cone(u, 0.80901699),
            lambda d: jnp.where(
                d[..., 2] >= 0.80901699,
                warp.square_to_uniform_cone_pdf(0.80901699),
                0.0,
            ),
        ),
        (
            lambda u: warp.square_to_phase_hg(u, 0.6),
            lambda d: warp.square_to_phase_hg_pdf(d[..., 2], 0.6),
        ),
        (
            lambda u: warp.square_to_phase_hg(u, -0.4),
            lambda d: warp.square_to_phase_hg_pdf(d[..., 2], -0.4),
        ),
    ],
    ids=["sphere", "hemisphere", "cosine", "cone", "hg+", "hg-"],
)
def test_warp_chi2(sample_fn, pdf_fn):
    passed, p, msg = chi2_test(sample_fn, pdf_fn, n_samples=N)
    assert passed, msg


def test_concentric_disk_in_unit_disk():
    from mitsuba_tpu.core import rng

    u = rng.rand2(jnp.arange(10000), 0, 5)
    p = warp.square_to_uniform_disk_concentric(u)
    r = np.asarray(jnp.linalg.norm(p, axis=-1))
    assert r.max() <= 1.0 + 1e-6
    # uniform on disk: E[r^2] = 1/2
    assert abs(float((r**2).mean()) - 0.5) < 0.02


def test_triangle_warp_uniform():
    from mitsuba_tpu.core import rng

    u = rng.rand2(jnp.arange(20000), 0, 6)
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # centroid of uniform barycentrics = (1/3, 1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=0.01)
