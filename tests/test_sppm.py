"""SPPM cross-agreement with the path tracer (the reference validates
photon mappers the same way: cross-integrator agreement on cbox)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_cbox():
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 24
    scene.sensor.record.film.height = 24
    return scene


def test_sppm_matches_path(small_cbox, monkeypatch):
    monkeypatch.setenv("MTS_SPPM_PHOTONS", str(1 << 14))
    from mitsuba_tpu.integrator.plugins import IntegratorRecord
    from mitsuba_tpu.integrator.sppm import render_sppm
    from mitsuba_tpu.renderer import render

    scene = small_cbox
    scene.integrator = IntegratorRecord(kind="path", max_depth=5,
                                        rr_depth=100)
    ref = render(scene, spp=384)
    scene.integrator = IntegratorRecord(kind="sppm", max_depth=5)
    img = render_sppm(scene, spp=10, seed=2)

    ratio = img.mean(axis=(0, 1)) / ref.mean(axis=(0, 1))
    # SPPM carries a finite-radius density-estimation bias that decays
    # over iterations; 8% at 10 passes is the expected envelope
    assert np.all(np.abs(ratio - 1.0) < 0.08), ratio
    lum = ref.mean(axis=-1)
    mask = lum < 5.0 * np.median(lum)
    d = (img - ref)[mask]
    rel = float(np.sqrt((d * d).mean()) / ref[mask].mean())
    assert rel < 0.45, rel
