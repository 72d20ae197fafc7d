"""mitsuba_tpu — a TPU-native physically based renderer.

A from-scratch rebuild of the capabilities of Mitsuba 0.x
(reference: /root/reference) designed for TPU hardware:

* the compute path is JAX/XLA (wavefront path tracing over SoA ray
  queues, fixed-shape `lax.scan` bounce loops, counter-based RNG),
* acceleration is a flattened, threaded BVH traversed by a stackless
  batched loop (replacing the reference's SAH kd-tree,
  reference: src/librender/gkdtree.h),
* multi-chip scaling shards the sample space over a `jax.sharding.Mesh`
  with a film `psum` (replacing the reference's Scheduler/RemoteWorker
  TCP protocol, reference: src/libcore/sched.cpp, sched_remote.cpp).

Public API mirrors the reference's Python bindings surface
(reference: src/libpython/{core,render}.cpp) where it makes sense.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache — first-compile latency through
    the remote-TPU tunnel is minutes, so cache executables across
    processes (disable with MTS_TPU_NO_COMPILE_CACHE=1)."""
    import os

    if os.environ.get("MTS_TPU_NO_COMPILE_CACHE", "0") == "1":
        return
    try:
        import jax

        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/mitsuba_tpu_xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


_enable_compile_cache()


def __getattr__(name):
    # Lazy top-level API so `import mitsuba_tpu.core.math` works without
    # pulling in the full renderer (and to keep import time low).
    if name in ("load_scene", "load_scene_string"):
        from mitsuba_tpu.scene import xml_loader

        return getattr(xml_loader, name)
    if name == "render":
        from mitsuba_tpu.renderer import render

        return render
    raise AttributeError(name)
