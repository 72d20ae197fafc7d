"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax
imports, and skip the axon TPU tunnel registration (sitecustomize) which
otherwise adds ~2 min of connection latency per process."""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter start (to
# register the axon TPU tunnel), so JAX_PLATFORMS=axon is already baked
# into jax.config by the time this conftest runs — update it explicitly
# or every test op round-trips through the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules that dominate the ~60-min full-suite wall clock (golden
# images, full integrator renders, multi-process bring-up).  Every
# test in them is auto-marked `slow`; iterate with
#     python -m pytest tests/ -q -m "not slow"
# (a ~5-min correctness sweep) and run the full suite before commits
# that touch integrators or the film.
_SLOW_MODULES = {
    "test_golden", "test_render", "test_volpath", "test_bdpt",
    "test_mlt", "test_manifold_mlt", "test_sppm", "test_photonmapper",
    "test_irrcache", "test_irrcache_gradients", "test_sss",
    "test_multihost", "test_service", "test_irawan", "test_adaptive",
    "test_spectral", "test_samplers", "test_motion", "test_pairs",
    "test_instancing", "test_elastic",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cbox_scene():
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 64
    scene.sensor.record.film.height = 64
    return scene


def rel_rmse(a, b):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.maximum(np.abs(b).mean(), 1e-6)
    return float(np.sqrt(np.mean((a - b) ** 2)) / denom)
