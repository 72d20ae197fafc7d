"""Round-2 sweep: dense cull + ride sort end-to-end on real TPU."""
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
pack = pack_scene(load_scene("scenes/bunny.xml"))
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
        if hasattr(prs, k):
            setattr(prs, k, v)
        else:
            os.environ[k] = str(v)
    f = jax.jit(lambda o_, d_, t_: prs.pair_closest(pack, o_, d_, t_))
    r0 = jax.block_until_ready(f(o, d, t_max))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(o, d, t_max))
        best = min(best, time.time() - t0)
    miss = float(jnp.mean((r0[1] < 0).astype(jnp.float32)))
    print(f"{name:40s} {best*1e3:9.2f} ms {N/best/1e6:8.1f} MRays/s"
          f"  miss={miss:.4f}", flush=True)


run("dense/ride/window", MTS_PAIR_KERNEL="window")
run("dense/ride/runs", MTS_PAIR_KERNEL="runs")
run("dense/ride/window/K2", MTS_PAIR_KERNEL="window", K=2)
run("dense/ride/window/B256", K=3, CULL_B=256)
run("twolevel/ride/window", DENSE_C=0, CULL_B=512)
