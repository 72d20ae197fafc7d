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
