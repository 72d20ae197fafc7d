"""Cumulative in-context stage profile of accel/pairs.py on real TPU.

Builds one jit per PREFIX of the run_tile pipeline so each stage's
in-context cost is the difference of adjacent rows (standalone timings
mislead: XLA fuses/overlaps stages differently inside the full graph).
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

T = int(os.environ.get("T", 1 << 18))
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)
c = pack.meta["n_clusters"]
print("clusters", c, "tc", pack.meta["cluster_tc"], "W", prs.W,
      "K", prs.K, "BUDGET", prs.BUDGET, "T", T)

lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
center = (lo + hi) / 2
radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
u = rng.rand4(jnp.arange(T, dtype=jnp.uint32), 0, 0)
p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
d = p2 - p1
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = p1
t_max = jnp.full((T,), prs.BIG, jnp.float32)


def timeit(name, f):
    fj = jax.jit(f)
    jax.block_until_ready(fj(o, d, t_max))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fj(o, d, t_max))
        best = min(best, time.time() - t0)
    print(f"{name:32s} {best*1e3:9.2f} ms   {T/best/1e6:8.1f} MRays/s",
          flush=True)


def upto(stage):
    def f(o_, d_, t_):
        cids, ent_k, ov = prs._cluster_lists_pallas(pack, o_, d_, t_,
                                                    False)
        if stage == "cull":
            return cids, ent_k
        cid_q, slot_q, rays_q, cid_tail, slot_tail = prs._pair_queue(
            cids, T, c, o_, d_, t_
        )
        if stage == "queue":
            return cid_q, rays_q
        run_cids, n_runs = prs._window_runs(cid_q, c)
        if stage == "runs":
            return run_cids, n_runs
        fq = prs._feats(rays_q[:, 0:3], rays_q[:, 3:6])
        p = cid_q.shape[0]
        feats_q = jnp.swapaxes(fq.reshape(p // prs.W, prs.W, 16), 1, 2)
        tmax_q = jnp.where(cid_q < c, rays_q[:, 6], 0.0)
        if stage == "feats":
            return feats_q, tmax_q
        outs = prs._run_kernel(pack, "closest", run_cids, n_runs,
                               cid_q, feats_q, tmax_q, False)
        if stage == "kernel":
            return outs
        return prs._run_tile(pack, o_, d_, t_, "closest", False)
    return f


timeit("A cull(pallas)", upto("cull"))
timeit("B +pair_queue", upto("queue"))
timeit("C +window_runs", upto("runs"))
timeit("D +feats", upto("feats"))
timeit("E +kernel", upto("kernel"))
timeit("F full run_tile", upto("full"))

os.environ["MTS_PAIR_SORT"] = "ride"
timeit("B' +pair_queue (ride)", upto("queue"))
os.environ["MTS_PAIR_SORT"] = "packed"

os.environ["MTS_PAIR_CULL"] = "xla"


def cull_xla(o_, d_, t_):
    return prs._cluster_lists(pack, o_, d_, t_)[0]


timeit("A' cull(xla)", cull_xla)
