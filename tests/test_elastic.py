"""Failure detection + work re-queue (reference sched.h:143-156).

A fault hook injects a simulated TPU-worker crash mid-render; the
elastic executor must re-queue the lost passes and produce output
bit-identical to an uninterrupted render (counter RNG).
"""

import os

import numpy as np
import pytest

import mitsuba_tpu
from mitsuba_tpu.parallel import elastic


@pytest.fixture
def cbox():
    scene = mitsuba_tpu.load_scene("scenes/cbox.xml")
    scene.sensor.record.film.width = 48
    scene.sensor.record.film.height = 48
    return scene


def _render(scene, **kw):
    return np.asarray(
        mitsuba_tpu.render(
            scene, spp=8, seed=5, lanes_per_pass=48 * 48 * 2, **kw
        )
    )


def test_requeue_from_checkpoint(cbox, tmp_path):
    """Crash after the checkpoint: only the lost passes re-render."""
    clean = _render(cbox)

    fired = []

    def hook(i):
        if i == 3 and not fired:
            fired.append(i)
            raise elastic.SimulatedFault(i)

    ck = str(tmp_path / "ck.npz")
    elastic._fault_hook = hook
    try:
        img = _render(cbox, checkpoint=ck, checkpoint_every=2)
    finally:
        elastic._fault_hook = None
    assert fired == [3]
    np.testing.assert_array_equal(img, clean)


def test_requeue_from_scratch(cbox):
    """No checkpoint: the whole render re-queues and still matches."""
    clean = _render(cbox)
    fired = []

    def hook(i):
        if i == 1 and not fired:
            fired.append(i)
            raise elastic.SimulatedFault(i)

    elastic._fault_hook = hook
    try:
        img = _render(cbox)
    finally:
        elastic._fault_hook = None
    assert fired == [1]
    np.testing.assert_array_equal(img, clean)


def test_unrecoverable_raises(cbox):
    def hook(i):
        raise ValueError("a real bug, not a device failure")

    elastic._fault_hook = hook
    try:
        with pytest.raises(ValueError):
            _render(cbox)
    finally:
        elastic._fault_hook = None


def test_retry_budget_exhausted(cbox):
    """Persistent failures surface after MTS_TPU_RETRIES attempts."""
    def hook(i):
        raise elastic.SimulatedFault(i)

    elastic._fault_hook = hook
    os.environ["MTS_TPU_RETRIES"] = "1"
    try:
        with pytest.raises(elastic.SimulatedFault):
            _render(cbox)
    finally:
        elastic._fault_hook = None
        del os.environ["MTS_TPU_RETRIES"]


def test_render_elastic_shrinks_mesh(cbox):
    """Elastic sharded render: first mesh dies, retry rebuilds a
    smaller mesh from the 'surviving' devices — identical output."""
    from mitsuba_tpu.parallel.mesh import make_mesh

    ref = np.asarray(
        mitsuba_tpu.parallel.mesh.render_sharded(
            cbox, mesh=make_mesh(), spp=8, seed=5
        )
    )

    calls = []

    def mesh_fn():
        import jax

        devs = list(jax.devices())
        if not calls:
            calls.append(1)
            raise RuntimeError("UNAVAILABLE: simulated fault in mesh")
        return make_mesh(devs[: max(len(devs) // 2, 1)])

    img = elastic.render_elastic(cbox, spp=8, seed=5, mesh_fn=mesh_fn)
    assert calls == [1]
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5)
