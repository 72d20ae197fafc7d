"""Render service (parallel/service.py) — the mtssrv equivalent.

The reference's remote scheduler re-queues work units owned by a dead
worker (sched.h:143-156; sched_remote.cpp worker-death path).  Here a
3-worker service renders cbox, one worker is killed mid-render, and
the final image must still be BIT-identical to the local
single-process pass loop: units are whole passes, the counter RNG
makes any worker's unit byte-identical, and the master folds partials
in unit order (the same float-addition sequence as the local loop).
"""

import os
import signal
import sys
import threading
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "scenes", "cbox.xml")
SIZE = 32
SPP = 12
CHUNK = 1


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    pp = env.get("PYTHONPATH", "")
    if REPO not in pp.split(os.pathsep):
        env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def _local_reference():
    import mitsuba_tpu

    scene = mitsuba_tpu.load_scene(SCENE)
    scene.sensor.record.film.width = SIZE
    scene.sensor.record.film.height = SIZE
    img, film = mitsuba_tpu.render(
        scene, spp=SPP, lanes_per_pass=CHUNK * SIZE * SIZE,
        return_film=True,
    )
    return np.asarray(img), np.asarray(film)


def _service_render(n_workers, kill_one=False):
    from mitsuba_tpu.parallel.service import RenderService

    svc = RenderService(n_workers=n_workers, worker_env=_worker_env())
    try:
        sid = svc.broadcast_scene(
            SCENE, film_size={"width": SIZE, "height": SIZE}
        )
        out = {}

        def run():
            out["img"], out["film"] = svc.render(
                sid, w=SIZE, h=SIZE, spp=SPP, spp_chunk=CHUNK
            )

        t = threading.Thread(target=run)
        t.start()
        if kill_one:
            # let the render get going, then kill one worker process
            # mid-flight — its unit must re-queue to the survivors
            time.sleep(1.0)
            os.kill(svc.worker_pids()[0], signal.SIGKILL)
        t.join(timeout=600)
        assert not t.is_alive(), "service render hung"
        if kill_one:
            assert any(w.dead for w in svc.workers), (
                "killed worker was never detected dead"
            )
        return out["img"], out["film"]
    finally:
        svc.shutdown()


@pytest.mark.slow
def test_service_matches_local_bitexact():
    img_ref, film_ref = _local_reference()
    img, film = _service_render(2)
    np.testing.assert_array_equal(film, film_ref)
    np.testing.assert_array_equal(img, img_ref)


@pytest.mark.slow
def test_service_survives_worker_kill_bitexact():
    """VERDICT r4 #6 'done' criterion: a 3-process service with one
    worker killed mid-render still produces the bit-exact image."""
    img_ref, film_ref = _local_reference()
    img, film = _service_render(3, kill_one=True)
    np.testing.assert_array_equal(film, film_ref)
    np.testing.assert_array_equal(img, img_ref)
