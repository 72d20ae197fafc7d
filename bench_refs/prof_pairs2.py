"""Fine-grained stage profile of accel/pairs.py on the bunny (TPU).

Every stage runs K times inside ONE jit (fori_loop with a data
dependency) — the axon tunnel adds a flat ~25 ms dispatch+sync floor
to any host-timed call, so per-call timing is meaningless."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pairs as prs
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

N = 1 << 18
K_IT = 10
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)
c = pack.meta["n_clusters"]
g = pack.meta["cluster_super_g"]
s = pack.meta["n_supers"]
ks = min(prs.KS, s)

lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
center = (lo + hi) / 2
radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
u = rng.rand4(jnp.arange(N, dtype=jnp.uint32), 0, 0)
p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
dr = p2 - p1
dr = dr / jnp.linalg.norm(dr, axis=-1, keepdims=True)
t_max = jnp.full((N,), prs.BIG, jnp.float32)


def timeit(name, body):
    """body(i, carry_f32) -> f32 accumulator; loops K_IT inside jit."""

    def run(salt):
        def it(i, acc):
            return body(i + salt, acc)

        return jax.lax.fori_loop(0, K_IT, it, jnp.float32(0.0))

    f = jax.jit(run)
    jax.block_until_ready(f(jnp.int32(1)))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(jnp.int32(2)))
        best = min(best, time.time() - t0)
    per = (best - 0.025) / K_IT
    print(f"{name:34s} {per*1e3:9.2f} ms   {N/per/1e6:7.1f} MRays/s")


def perturb(i):
    o = p1 + 1e-6 * i.astype(jnp.float32)
    return o, dr


def b_cull(i, acc):
    o, d = perturb(i)
    cids, ent_k, ov = prs._cluster_lists(pack, o, d, t_max)
    return acc + jnp.sum(cids == 0).astype(jnp.float32) * 1e-9


timeit("cluster_lists", b_cull)


cids0, _, _ = jax.jit(
    lambda: prs._cluster_lists(pack, p1, dr, t_max)
)()


def b_queue(i, acc):
    cids = jnp.roll(cids0, i, axis=0)
    q = prs._pair_queue(cids, N, c, p1, dr, t_max)
    rc, nr = prs._window_runs(q[0], c)
    return acc + nr.sum().astype(jnp.float32) * 1e-9 + q[2].sum() * 1e-9


timeit("pair_queue+window_runs", b_queue)


qq = jax.jit(lambda: prs._pair_queue(cids0, N, c, p1, dr, t_max))()
rc0, nr0 = jax.jit(lambda: prs._window_runs(qq[0], c))()
kkn = cids0.shape[1]


def b_feats(i, acc):
    rq = qq[2] + 1e-9 * i.astype(jnp.float32)
    fq = prs._feats(rq[:, 0:3], rq[:, 3:6])
    return acc + fq.sum() * 1e-9


timeit("feats compute", b_feats)

fq0 = jax.jit(
    lambda: prs._feats(qq[2][:, 0:3], qq[2][:, 3:6])
)()
p = qq[0].shape[0]
feats_q0 = jnp.swapaxes(fq0.reshape(p // prs.W, prs.W, 16), 1, 2)
tmax_q0 = jnp.where(qq[0] < c, qq[2][:, 6], 0.0)


def b_kernel(i, acc):
    fq = feats_q0 + 1e-9 * i.astype(jnp.float32)
    outs = prs._run_kernel(
        pack, "closest", rc0, nr0, qq[0], fq, tmax_q0, False
    )
    return acc + outs[0].sum() * 1e-9


timeit("kernel", b_kernel)


def b_restore(i, acc):
    slot_full = jnp.concatenate([qq[1], qq[4]])
    t_full = jnp.concatenate([
        tmax_q0 + i.astype(jnp.float32) * 1e-9,
        jnp.full(qq[4].shape, prs.BIG, jnp.float32),
    ])
    s_full = jnp.concatenate([
        jnp.where(qq[0] < c, 1, -1),
        jnp.where(qq[3] < c, -2, -1),
    ])
    _, t_rk, s_rk = jax.lax.sort(
        (slot_full, t_full, s_full), num_keys=1
    )
    return acc + t_rk.sum() * 1e-9


timeit("restore sort", b_restore)


def b_tile(i, acc):
    o, d = perturb(i)
    bt, bs, ov = prs._run_tile(pack, o, d, t_max, "closest", False)
    return acc + bt.sum() * 1e-9


timeit("run_tile FULL", b_tile)

from mitsuba_tpu.accel import pallas_bvh as pb


def b_chunk(i, acc):
    o, d = perturb(i)
    bt, bp, _, _ = pb.cluster_closest(pack, o, d, t_max, sort=True)
    return acc + bt.sum() * 1e-9


timeit("chunk cluster_closest", b_chunk)
print("W", prs.W, "KS", prs.KS, "K", prs.K, "N", N)
