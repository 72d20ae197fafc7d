"""Sweep pair-traversal knobs end-to-end (pair_closest) on real TPU.

In-context findings (prof_pairs2): cull kernel ~30 ms/262k rays,
packed-mode gathers ~35 ms (ride ~5 ms), window kernel ~1 ms,
restore ~19 ms.  This sweeps CULL_B (grid-step overhead), sort mode,
and kernel mode at full pipeline level.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pairs as prs
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

N = int(os.environ.get("N", 1 << 20))
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)

lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
center = (lo + hi) / 2
radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
u = rng.rand4(jnp.arange(N, dtype=jnp.uint32), 0, 0)
p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
d = p2 - p1
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = p1
t_max = jnp.full((N,), prs.BIG, jnp.float32)


def run(name, **env):
    for k, v in env.items():
        if k == "CULL_B":
            prs.CULL_B = v
        else:
            os.environ[k] = str(v)
    f = jax.jit(lambda o_, d_, t_: prs.pair_closest(pack, o_, d_, t_))
    jax.block_until_ready(f(o, d, t_max))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(o, d, t_max))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms   {N/best/1e6:8.1f} MRays/s",
          flush=True)


run("ride/window/B512",
    MTS_PAIR_SORT="ride", MTS_PAIR_KERNEL="window", CULL_B=512)
run("ride/window/B2048", CULL_B=2048)
run("ride/window/B4096", CULL_B=4096)
run("ride/runs/B2048", MTS_PAIR_KERNEL="runs", CULL_B=2048)
run("packed/runs/B2048", MTS_PAIR_SORT="packed")
