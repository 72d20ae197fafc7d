"""Multi-chip parity: the sharded renderer must produce (up to float
reassociation in the film psum) the same image as single-device, because
the counter-based RNG keys samples by (pixel, sample) — sharding is pure
work division (SURVEY.md §2.7 item 2)."""

import numpy as np
import jax
import pytest

from mitsuba_tpu.parallel.mesh import make_mesh, render_sharded
from mitsuba_tpu.renderer import render
from tests.conftest import rel_rmse


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single(cbox_scene):
    mesh = make_mesh()
    img_multi = render_sharded(cbox_scene, mesh=mesh, spp=8)
    img_single = render(cbox_scene, spp=8)
    assert rel_rmse(img_multi, img_single) < 1e-4


def test_sharded_uneven_lanes(cbox_scene):
    # 64x64 x 3spp = 12288 lanes, not divisible by 8 after chunking
    mesh = make_mesh()
    img = render_sharded(cbox_scene, mesh=mesh, spp=3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_sharded_bdpt_matches_single(cbox_scene):
    """Sharded bdpt runs the REAL bidirectional algorithm (VERDICT r2:
    multi-chip must not silently change algorithms) and matches the
    single-device bdpt image bit-for-bit up to psum reassociation."""
    from mitsuba_tpu.integrator.bdpt import render_bdpt
    from mitsuba_tpu.integrator.plugins import IntegratorRecord

    scene = cbox_scene
    saved = scene.integrator
    scene.integrator = IntegratorRecord(kind="bdpt", max_depth=4)
    try:
        mesh = make_mesh()
        img_multi = render_sharded(scene, mesh=mesh, spp=8, seed=2)
        img_single = render_bdpt(scene, spp=8, seed=2)
    finally:
        scene.integrator = saved
    assert np.isfinite(img_multi).all()
    assert rel_rmse(img_multi, img_single) < 1e-4
