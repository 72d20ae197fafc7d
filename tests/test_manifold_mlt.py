"""Manifold-perturbation MLT (reference mut_manifold.cpp + manifold.cpp).

Validates the mutation machinery (integrator/mut_manifold.py) on the
glass-caustics configuration: eligibility classification, Newton-walk
convergence onto the old endpoint, inverse-warp state writeback, and —
the decisive check — that MLT with the manifold mutation enabled stays
in detailed balance (image mean matches an ordinary path-traced
reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu
from mitsuba_tpu.core import rng
from mitsuba_tpu.integrator import mut_manifold as mman
from mitsuba_tpu.integrator.pssmlt import dims_for
from mitsuba_tpu.scene.builder import pack_scene


@pytest.fixture(scope="module")
def caustic():
    scene = mitsuba_tpu.load_scene("scenes/glass_caustics.xml")
    scene.sensor.record.film.width = 48
    scene.sensor.record.film.height = 48
    scene.integrator.max_depth = 6
    return scene, pack_scene(scene)


def _seed_u(n, D, seed_mlt, salt=7000):
    return rng.rand4(
        jnp.arange(n * D, dtype=jnp.uint32) // D,
        jnp.arange(n * D, dtype=jnp.uint32) % D,
        jnp.uint32(salt), seed_mlt,
    )[:, 0].reshape(n, D)


def test_classify_and_solve(caustic):
    """Random paths through the glass sphere classify as manifold-
    eligible and the Newton walk re-lands on the endpoint."""
    scene, pack = caustic
    sen, integ = scene.sensor.record, scene.integrator
    w = h = 48
    cam = sen.pack(w, h)
    D = dims_for(6)
    N = 4096
    seed_mlt = rng.stream_seed(0, rng.STREAM_MLT)
    lanes = jnp.arange(N, dtype=jnp.uint32)
    U = _seed_u(N, D, seed_mlt)

    info = jax.jit(
        lambda u: mman.trace_path_info(pack, integ, cam, w, h, u, 6)
    )(U)
    c = mman.classify(info)
    elig = np.asarray(c["elig"])
    assert elig.any(), "no eligible caustic paths found"

    Up, corr, ok = jax.jit(
        lambda u: mman.propose_manifold(
            pack, integ, cam, w, h, u, jnp.uint32(3), seed_mlt, lanes
        )
    )(U)
    ok = np.asarray(ok)
    corr = np.asarray(corr)
    # most eligible walks should converge and land back on b
    assert ok[elig].mean() > 0.3, ok[elig].mean()
    # acceptance corrections are near-symmetric for small lens steps
    med = np.median(corr[ok])
    assert 0.3 < med < 3.0, med
    # rejected lanes propose their unchanged row
    np.testing.assert_array_equal(np.asarray(Up)[~ok], np.asarray(U)[~ok])


def test_mlt_manifold_mean_parity(caustic):
    """MLT with the manifold mutation must stay unbiased: the rendered
    mean matches ordinary path tracing on the caustic scene."""
    from mitsuba_tpu.integrator.mlt import render_mlt

    scene, pack = caustic
    ref = np.asarray(mitsuba_tpu.render(scene, spp=768, seed=11, pack=pack))

    scene.integrator.kind = "mlt"
    scene.integrator.manifold_perturbation = True
    img = render_mlt(scene, spp=320, seed=3, pack=pack, chains=8192)
    scene.integrator.kind = "path"

    ratio = img.mean() / ref.mean()
    assert abs(ratio - 1.0) < 0.12, ratio
