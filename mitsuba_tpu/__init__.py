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
