"""Golden-image regression: the benchmark scenes must keep rendering
the same picture (SURVEY §4's reference-render comparison strategy,
applied to the rebuild's own pinned CPU outputs).

Goldens live in tests/golden/*.npy (64x64 @ 16spp, seed 0, CPU).  The
counter RNG makes same-platform renders bit-deterministic, but XLA may
legally re-order float math across versions, so the gate is a tight
RMSE, not bit equality.  Regenerate with the snippet in this file's
git history after INTENTIONAL radiometric changes, and say why in the
commit message.
"""

import os

import numpy as np
import pytest

import mitsuba_tpu

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = [
    ("cbox", "scenes/cbox.xml"),
    ("matpreview", "scenes/matpreview.xml"),
    ("glass_caustics", "scenes/glass_caustics.xml"),
]


@pytest.mark.parametrize("name,path", CASES, ids=[c[0] for c in CASES])
def test_golden(name, path):
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}_64_16.npy"))
    scene = mitsuba_tpu.load_scene(path)
    scene.sensor.record.film.width = 64
    scene.sensor.record.film.height = 64
    img = np.asarray(mitsuba_tpu.render(scene, spp=16, seed=0))
    assert img.shape == golden.shape
    # relative RMSE over a tone-mapped domain (stable against single
    # firefly pixels in the caustics scene)
    a = img / (1.0 + img)
    b = golden / (1.0 + golden)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 5e-3, (name, rmse)
