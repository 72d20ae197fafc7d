"""Stage profile of the pair-compaction traversal on real TPU.

Times each XLA stage of accel/pairs.py separately on bunny incoherent
rays so kernel vs culling vs sort cost is visible.
"""
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pairs as prs
from mitsuba_tpu.accel import pallas_bvh as pb
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

N = int(os.environ.get("N", 1 << 20))
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)
print("clusters", pack.meta["n_clusters"], "tc", pack.meta["cluster_tc"],
      "supers", pack.meta["n_supers"], "G", pack.meta["cluster_super_g"],
      "W", prs.W, "KS", prs.KS, "K", prs.K, "BUDGET", prs.BUDGET,
      "TILE", prs.TILE)

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


def timeit(name, f, *args):
    r = jax.block_until_ready(f(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms   {N/best/1e6:8.1f} MRays/s")
    return r


T = min(prs.TILE, N)
oT, dT, tT = o[:T], d[:T], t_max[:T]

# stage 1: culling -> cluster lists
f1 = jax.jit(lambda o_, d_, t_: prs._cluster_lists(pack, o_, d_, t_))
cids, ent_k, ov = timeit("cluster_lists", f1, oT, dT, tT)
n_cl = np.asarray(ov["n_cl"])
print(f"  mean clusters/ray {n_cl.mean():.2f}  p99 {np.percentile(n_cl, 99):.0f}"
      f"  overflow_sup {(np.asarray(ov['n_sup']) > prs.KS).mean()*100:.2f}%"
      f"  overflow_cl {(n_cl > prs.K).mean()*100:.2f}%")

c = pack.meta["n_clusters"]

# stage 2: queue + runs
def f2(cids_):
    q = prs._pair_queue(cids_, T, c, oT, dT, tT)
    rc, nr = prs._window_runs(q[0], c)
    return q, rc, nr

f2j = jax.jit(f2)
(q, rc, nr) = timeit("pair_queue+runs", f2j, cids)
print(f"  P = {q[0].shape[0]}  windows = {rc.shape[0]}  "
      f"mean runs/window {np.asarray(nr).mean():.1f}  "
      f"max {np.asarray(nr).max()}")

# stage 3: kernel alone (inputs precomputed)
cid_q, rays_q = q[0], q[2]
fq = prs._feats(rays_q[:, 0:3], rays_q[:, 3:6])
p = cid_q.shape[0]
feats_q = jnp.swapaxes(fq.reshape(p // prs.W, prs.W, 16), 1, 2)
tmax_q = jnp.where(cid_q < c, rays_q[:, 6], 0.0)
f3 = jax.jit(
    lambda rc_, nr_, cq, fq, tq: prs._run_kernel(
        pack, "closest", rc_, nr_, cq, fq, tq, False
    )
)
timeit("kernel", f3, rc, nr, cid_q, feats_q, tmax_q)

# stage 4: full tile
f4 = jax.jit(lambda o_, d_, t_: prs._run_tile(pack, o_, d_, t_,
                                              "closest", False))
bt, bs, ovf = timeit("run_tile(full)", f4, oT, dT, tT)
print(f"  overflow-to-fallback {np.asarray(ovf).mean()*100:.2f}%")

# stage 5: public entry (with fallback cond) on full N
f5 = jax.jit(lambda o_, d_, t_: prs.pair_closest(pack, o_, d_, t_))
timeit("pair_closest(all)", f5, o, d, t_max)

# chunk path comparison
f6 = jax.jit(lambda o_, d_, t_: pb.cluster_closest(pack, o_, d_, t_,
                                                   sort=True))
timeit("chunk cluster_closest", f6, o, d, t_max)
