"""Failure detection + work re-queue (elastic rendering).

Rebuild of the reference Scheduler's fault handling — cancelled /
crashed workers push their unfinished work units back on the queue
(reference: include/mitsuba/core/sched.h:143-156 Scheduler::cancel,
src/libcore/sched_remote.cpp worker-death handling) — for the TPU
execution model:

* a render "work unit" here is one jitted pass execution; the remote
  TPU tunnel can drop mid-render ("TPU worker crashed", UNAVAILABLE),
  which surfaces as an XlaRuntimeError on the host,
* device buffers are lost with the worker, so recovery restarts from
  the last HOST-side state: the checkpoint file when one is configured
  (renderer.py already snapshots film + pass counter), else a clean
  film — the counter-based RNG re-derives every lost sample exactly,
  so a re-queued render is bit-identical to an uninterrupted one,
* the pass function is re-built (fresh jit) after a failure so a
  restarted backend re-compiles against live devices,
* elastic multi-chip: `render_elastic` re-queries the device set when
  it rebuilds, so a render resumes on however many chips survived
  (sharding-invariant RNG keeps the output identical).
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp

from mitsuba_tpu.core.logging import logger

# substrings of runtime-error messages that indicate a transient
# device/backend failure worth re-queueing (compile errors, OOM and
# shape errors re-raise immediately)
_RECOVERABLE_MARKERS = (
    "unavailable",
    "deadline",
    "worker crashed",
    "worker is unresponsive",
    "connection",
    "socket",
    "cancelled",
    "aborted",
    "device error",
    "core halted",
    "simulated fault",
)

# test hook: callables get (pass_index) before each pass and may raise
_fault_hook = None


class SimulatedFault(RuntimeError):
    """Raised by test fault hooks; message marks it recoverable."""

    def __init__(self, i):
        super().__init__(f"UNAVAILABLE: simulated fault at pass {i}")


def is_recoverable(e) -> bool:
    name = type(e).__name__
    if name not in ("XlaRuntimeError", "RuntimeError", "OSError",
                    "SimulatedFault", "JaxRuntimeError"):
        return False
    msg = str(e).lower()
    return any(m in msg for m in _RECOVERABLE_MARKERS)


def max_retries(default=2) -> int:
    return int(os.environ.get("MTS_TPU_RETRIES", str(default)))


def run_passes(build_fn, run_pass, n_passes, *, film_init,
               reload_state=None, after_pass=None, retries=None):
    """Resilient work-unit loop.

    build_fn(attempt) -> compiled pass fn (attempt 0 = first try;
    attempts > 0 follow a failure, so stale jits can be re-built);
    film_init() -> fresh accumulator; reload_state() -> (film_host,
    next_pass) | None (e.g. renderer checkpoint resume — also the
    recovery point); run_pass(rp, film, i) -> film;
    after_pass(film, i) (checkpoints / progress).

    Returns the final film.  Lost work units are re-queued from the
    last reloadable state, at most `retries` times.
    """
    retries = max_retries() if retries is None else retries
    attempt = 0
    while True:
        try:
            rp = build_fn(attempt)
            film, i0 = None, 0
            if reload_state is not None:
                st = reload_state()
                if st is not None:
                    film, i0 = jnp.asarray(st[0]), int(st[1])
                    if attempt:
                        logger.info(
                            "render: re-queueing passes %d..%d",
                            i0, n_passes - 1,
                        )
            if film is None:
                film = film_init()
            for i in range(i0, n_passes):
                if _fault_hook is not None:
                    _fault_hook(i)
                film = run_pass(rp, film, i)
                if after_pass is not None:
                    after_pass(film, i)
            return film
        except Exception as e:  # noqa: BLE001 — filtered below
            if attempt >= retries or not is_recoverable(e):
                raise
            attempt += 1
            logger.warn(
                "render pass failed (%s: %s) — re-queueing lost work "
                "(attempt %d/%d)", type(e).__name__, e, attempt, retries,
            )
            time.sleep(min(2.0 * attempt, 10.0))


def render_elastic(scene, spp=None, seed=0, retries=None, mesh_fn=None):
    """Elastic multi-chip render: on a recoverable backend failure the
    device mesh is rebuilt from whatever `jax.devices()` reports NOW
    and the render re-queues on the survivors.  The counter RNG keys
    samples globally, so shrinking the mesh changes nothing but
    wall-clock (tests/test_sharding.py parity).
    """
    from mitsuba_tpu.parallel.mesh import make_mesh, render_sharded

    retries = max_retries() if retries is None else retries
    mesh_fn = mesh_fn or make_mesh
    attempt = 0
    while True:
        try:
            mesh = mesh_fn()
            if attempt:
                logger.info(
                    "render_elastic: retrying on %d devices",
                    mesh.devices.size,
                )
            return render_sharded(scene, mesh=mesh, spp=spp, seed=seed)
        except Exception as e:  # noqa: BLE001 — filtered below
            if attempt >= retries or not is_recoverable(e):
                raise
            attempt += 1
            logger.warn(
                "render_elastic: mesh render failed (%s) — rebuilding "
                "mesh (attempt %d/%d)", e, attempt, retries,
            )
            time.sleep(min(2.0 * attempt, 10.0))
