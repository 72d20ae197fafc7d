"""Irradiance caching (reference irrcache.cpp / irrcache.h:44): the
cached render must agree with plain path tracing on a diffuse GI scene
(cornell box) within interpolation tolerance, much faster per sample.
"""

import numpy as np

import mitsuba_tpu


def _cbox(kind_xml, res=48, spp=8):
    scene = mitsuba_tpu.load_scene("scenes/cbox.xml")
    scene.sensor.record.film.width = res
    scene.sensor.record.film.height = res
    return scene


def test_irrcache_matches_path():
    scene = _cbox(None)
    ref = np.asarray(mitsuba_tpu.render(scene, spp=64, seed=1))

    from mitsuba_tpu.integrator.plugins import IntegratorRecord

    scene2 = _cbox(None)
    scene2.integrator = IntegratorRecord(
        kind="irrcache",
        sub_integrator=IntegratorRecord(kind="path", max_depth=8),
    )
    img = np.asarray(mitsuba_tpu.render(scene2, spp=8, seed=0))
    assert np.isfinite(img).all()
    # tone-mapped relative agreement: the cache blurs indirect light, so
    # the gate is loose but must catch gross energy errors
    a, b = img / (1 + img), ref / (1 + ref)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 0.05, rmse
    # energy within 10%
    assert abs(img.mean() / ref.mean() - 1.0) < 0.1
