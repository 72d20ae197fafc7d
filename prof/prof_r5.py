"""Round-5 pair-traversal profile: where do the 31 ms/262k-ray tile go?

Everything timed IN-JIT with a fori loop over salted inputs (defeats
CSE) so the ~6 ms dispatch floor and 0.25 s tunnel sync are amortized.
Run on real TPU:  cd /root/repo && python prof/prof_r5.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pairs as prs
from mitsuba_tpu.accel import pallas_bvh as pb
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

T = int(os.environ.get("T", 1 << 18))
ITERS = int(os.environ.get("ITERS", 10))

scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)
c = pack.meta["n_clusters"]
s = pack.meta["n_supers"]
print(f"clusters={c} supers={s} tc={pack.meta['cluster_tc']} "
      f"W={prs.W} K={prs.K} KS={prs.KS} BUDGET={prs.BUDGET} T={T}",
      flush=True)

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


def bench(name, make_body, n_iters=ITERS):
    """make_body() -> fn(i, acc) -> acc; timed as fori loop in one jit."""
    body = make_body()

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    try:
        run().block_until_ready()
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)
        return
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run().block_until_ready()
        best = min(best, time.time() - t0)
    ms = best / n_iters * 1e3
    print(f"{name:42s} {ms:8.2f} ms  {T/(best/n_iters)/1e6:8.1f} MRays/s",
          flush=True)


def salt(i):
    return (o + i.astype(jnp.float32) * 1e-7, d, t_max)


def chk(*arrs):
    acc = jnp.float32(0.0)
    for a in arrs:
        acc = acc + jnp.sum(a.astype(jnp.float32)) * 1e-9
    return acc


# ---- pipeline prefixes (dense cull default path) ----

def stage_fn(stage):
    def body(i, acc):
        oo, dd, tm = salt(i)
        cids, ent_k, ov = prs._cluster_lists_dense(pack, oo, dd, tm, False)
        if stage == "cull":
            return acc + chk(cids, ent_k)
        cid_q, slot_q, rays_q, cid_tail, slot_tail = prs._pair_queue(
            cids, T, c, oo, dd, tm)
        if stage == "queue":
            return acc + chk(cid_q, rays_q)
        run_cid, run_win, run_first = prs._run_list(cid_q, c)
        if stage == "runlist":
            return acc + chk(run_cid, run_win)
        fq = prs._feats(rays_q[:, 0:3], rays_q[:, 3:6])
        p = cid_q.shape[0]
        feats_q = jnp.swapaxes(fq.reshape(p // prs.W, prs.W, 16), 1, 2)
        tmax_q = jnp.where(cid_q < c, rays_q[:, 6], 0.0)
        if stage == "feats":
            return acc + chk(feats_q, tmax_q)
        outs = prs._run_kernel_runs(pack, "closest", run_cid, run_win,
                                    run_first, cid_q, feats_q, tmax_q, False)
        if stage == "kernel":
            return acc + chk(*outs)
        bt, bs, ovf = prs._run_tile(pack, oo, dd, tm, "closest", False)
        return acc + chk(bt, bs, ovf)
    return lambda: body


for st in ("cull", "queue", "runlist", "feats", "kernel", "tile"):
    bench(f"prefix:{st}", stage_fn(st))


def full_fn():
    def body(i, acc):
        oo, dd, tm = salt(i)
        bt, bs, u_, v_ = prs.pair_closest(pack, oo, dd, tm)
        return acc + chk(bt, bs)
    return body


bench("pair_closest (full, w/ fallback)", full_fn)


# ---- cull variants ----

def cull_var(which):
    def body(i, acc):
        oo, dd, tm = salt(i)
        if which == "dense":
            cids, ent_k, ov = prs._cluster_lists_dense(pack, oo, dd, tm,
                                                       False)
        elif which == "twolevel":
            cids, ent_k, ov = prs._cluster_lists_pallas(pack, oo, dd, tm,
                                                        False)
        else:
            cids, ent_k, ov = prs._cluster_lists(pack, oo, dd, tm)
        return acc + chk(cids, ent_k)
    return lambda: body


bench("cull:dense (pallas)", cull_var("dense"))
bench("cull:twolevel (pallas)", cull_var("twolevel"))

# ---- chunk-model comparison ----

def chunk_fn():
    def body(i, acc):
        oo, dd, tm = salt(i)
        bt, bp, _, _ = pb.cluster_closest(pack, oo, dd, tm, sort=True)
        return acc + chk(bt, bp)
    return body


bench("cluster_closest (chunk, sorted)", chunk_fn)


# ---- sort microbenches ----
kk = prs.K
n = T * kk
cid0 = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, c).astype(jnp.int32)
slot0 = jnp.arange(n, dtype=jnp.int32)
f7 = [jax.random.normal(jax.random.PRNGKey(10 + j), (n,), jnp.float32)
      for j in range(7)]


def sort_fn(n_ops, length):
    def body(i, acc):
        key = (cid0[:length] + i) % c
        ops = (key, slot0[:length], *f7[: n_ops - 2])
        if n_ops == 1:
            out = jax.lax.sort(key)
            return acc + chk(out)
        out = jax.lax.sort(ops[:n_ops], num_keys=1)
        return acc + chk(out[1])
    return lambda: body


bench(f"sort:1op n={n}", sort_fn(1, n))
bench(f"sort:2op n={n}", sort_fn(2, n))
bench(f"sort:3op n={n}", sort_fn(3, n))
bench(f"sort:9op n={n}", sort_fn(9, n))
bench(f"sort:1op n={T}", sort_fn(1, T))
bench(f"sort:2op n={T}", sort_fn(2, T))
bench(f"sort:9op n={T}", sort_fn(9, T))


def bsort_fn(n_ops):
    nw = n // 256
    k2 = cid0.reshape(nw, 256)
    v2 = slot0.reshape(nw, 256)
    f2 = f7[0].reshape(nw, 256)

    def body(i, acc):
        key = (k2 + i) % c
        if n_ops == 1:
            return acc + chk(jax.lax.sort(key, dimension=1))
        out = jax.lax.sort((key, v2, f2)[:n_ops], dimension=1, num_keys=1)
        return acc + chk(out[1])
    return lambda: body


bench(f"bsort:[{n//256},256] 1op", bsort_fn(1))
bench(f"bsort:[{n//256},256] 3op", bsort_fn(3))


def gather_fn(length):
    src = f7[0]

    def body(i, acc):
        idx = (slot0[:length] * 7 + i) % n
        return acc + chk(src[idx])
    return lambda: body


bench(f"gather:1d n={n}", gather_fn(n))
bench(f"gather:1d n={T}", gather_fn(T))


def scatter_fn(length):
    def body(i, acc):
        idx = (slot0[:length] * 7 + i) % length
        out = jnp.zeros((length,), jnp.float32).at[idx].set(f7[0][:length])
        return acc + chk(out)
    return lambda: body


bench(f"scatter:1d n={n}", scatter_fn(n))

# ---- overflow / run statistics (one shot, informational) ----


@jax.jit
def stats(oo, dd, tm):
    cids, ent_k, ov = prs._cluster_lists_dense(pack, oo, dd, tm, False)
    cid_q, slot_q, rays_q, cid_tail, slot_tail = prs._pair_queue(
        cids, T, c, oo, dd, tm)
    run_cid, run_win, run_first = prs._run_list(cid_q, c)
    n_valid = jnp.sum(cids < c)
    n_runs = jnp.sum(run_cid < c)
    bt, bs, ovf = prs._run_tile(pack, oo, dd, tm, "closest", False)
    return (n_valid, n_runs, jnp.sum(ovf), jnp.mean(ov["n_cl"].astype(
        jnp.float32)), cid_q.shape[0], run_cid.shape[0])


nv, nr, novf, mean_ncl, pcap, rcap = stats(o, d, t_max)
print(f"stats: valid_pairs={int(nv)} ({int(nv)/T:.2f}/ray) "
      f"runs={int(nr)} overflow={int(novf)} ({int(novf)/T*100:.2f}%) "
      f"mean_n_cl={float(mean_ncl):.2f} P_cap={int(pcap)} r_cap={int(rcap)}",
      flush=True)
print("done", flush=True)
