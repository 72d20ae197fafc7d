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


def test_sharded_sppm_matches_single(cbox_scene, monkeypatch):
    """Sharded sppm shoots the photon subsets on separate chips and
    psum-merges flux — same algorithm, float-reassociation tolerance
    (plus per-shard cell-overflow subsampling)."""
    from mitsuba_tpu.integrator.sppm import render_sppm
    from mitsuba_tpu.integrator.plugins import IntegratorRecord

    monkeypatch.setenv("MTS_SPPM_PHOTONS", str(1 << 13))
    scene = cbox_scene
    saved = scene.integrator
    scene.integrator = IntegratorRecord(kind="sppm", max_depth=6)
    try:
        mesh = make_mesh()
        img_multi = render_sharded(scene, mesh=mesh, spp=2, seed=1)
        img_single = render_sppm(
            scene, spp=2, seed=1, photons_per_pass=1 << 13
        )
    finally:
        scene.integrator = saved
    assert np.isfinite(img_multi).all()
    assert img_multi.mean() > 0.01
    assert rel_rmse(img_multi, img_single) < 0.05


def test_sharded_volpath_matches_single():
    """Sharded volpath renders media with the real volpath trace."""
    from tests.test_volpath import _fog_scene

    scene = _fog_scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="0.6, 0.6, 0.6"/>
          <rgb name="sigmaA" value="0.1, 0.1, 0.1"/>
        </medium>
        """,
        spp=16,
        w=24,
        h=24,
    )
    from mitsuba_tpu.renderer import render

    mesh = make_mesh()
    img_multi = render_sharded(scene, mesh=mesh, spp=16, seed=0)
    img_single = render(scene, spp=16, seed=0)
    assert np.isfinite(img_multi).all()
    assert rel_rmse(img_multi, img_single) < 1e-3


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


def test_sharded_vpl_runs():
    """Sharded VPL splits pass indices across chips."""
    from mitsuba_tpu.integrator.plugins import IntegratorRecord
    from mitsuba_tpu.scene.xml_loader import load_scene
    import os

    scene = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 24
    scene.sensor.record.film.height = 24
    scene.integrator = IntegratorRecord(kind="vpl", max_depth=4)
    img = render_sharded(scene, mesh=make_mesh(), spp=8, seed=1)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
