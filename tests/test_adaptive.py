"""Adaptive sampling meta-integrator (reference adaptive.cpp):
error-driven refinement must stay unbiased and concentrate work."""

import numpy as np

import mitsuba_tpu
from mitsuba_tpu.integrator.plugins import IntegratorRecord


def test_adaptive_matches_path():
    scene = mitsuba_tpu.load_scene("scenes/cbox.xml")
    scene.sensor.record.film.width = 32
    scene.sensor.record.film.height = 32
    ref = np.asarray(mitsuba_tpu.render(scene, spp=128, seed=3))

    scene2 = mitsuba_tpu.load_scene("scenes/cbox.xml")
    scene2.sensor.record.film.width = 32
    scene2.sensor.record.film.height = 32
    scene2.integrator = IntegratorRecord(
        kind="adaptive",
        max_error=0.05,
        max_sample_factor=4.0,
        sub_integrator=IntegratorRecord(kind="path"),
    )
    img = np.asarray(mitsuba_tpu.render(scene2, spp=16, seed=0))
    assert np.isfinite(img).all()
    a, b = img / (1 + img), ref / (1 + ref)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    # both sides are finite-spp MC renders: the gate is a gross-error
    # catch, not a convergence claim
    assert rmse < 0.06, rmse
    # energy agreement (unbiasedness check)
    assert abs(img.mean() / ref.mean() - 1.0) < 0.05
