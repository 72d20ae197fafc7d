"""bdpt cross-agreement with the path tracer (the reference validates
bdpt the same way: path vs bdpt on the same scene, bdpt.cpp docs)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_cbox():
    import os
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 32
    scene.sensor.record.film.height = 32
    return scene


def test_bdpt_matches_path(small_cbox):
    from mitsuba_tpu.integrator.plugins import IntegratorRecord
    from mitsuba_tpu.integrator.bdpt import render_bdpt
    from mitsuba_tpu.renderer import render

    scene = small_cbox
    scene.integrator = IntegratorRecord(kind="path", max_depth=4, rr_depth=100)
    ref = render(scene, spp=256)
    scene.integrator = IntegratorRecord(kind="bdpt", max_depth=4)
    img = render_bdpt(scene, spp=96, seed=3)

    ratio = img.mean(axis=(0, 1)) / ref.mean(axis=(0, 1))
    assert np.all(np.abs(ratio - 1.0) < 0.05), ratio
    # pixelwise agreement away from the emitter itself (the t=1 light
    # image resolves it with noisy nearest-pixel splats)
    lum = ref.mean(axis=-1)
    mask = lum < 5.0 * np.median(lum)
    d = (img - ref)[mask]
    rel = float(np.sqrt((d * d).mean()) / ref[mask].mean())
    assert rel < 0.5, rel


def test_bdpt_unsupported_scene_falls_back(small_cbox):
    """bdpt on an env-lit scene silently uses the path backend (v1
    restriction is documented in integrator/bdpt.py)."""
    from mitsuba_tpu.integrator.bdpt import supports_bdpt
    from mitsuba_tpu.scene.builder import pack_scene

    pack = pack_scene(small_cbox)
    assert supports_bdpt(pack)
