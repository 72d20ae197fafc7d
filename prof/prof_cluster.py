"""Stage profile of the cluster traversal pipeline on real TPU.

Separates: sort-key+argsort, prepass, full pipeline — to find where
the kdbench milliseconds go.  Also prints per-chunk visit-count (H)
statistics, the quantity that governs kernel time.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel import pallas_bvh as pb
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene

N = 2_000_000
scene = load_scene("scenes/bunny.xml")
pack = pack_scene(scene)
print("clusters", pack.meta["n_clusters"], "tc", pack.meta["cluster_tc"])

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


def timeit(name, f, *args):
    r = jax.block_until_ready(f(*args))  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms   ({N/best/1e6:8.2f} MRays/s)")
    return r


C0 = pack.meta["n_clusters"]
slo = jnp.asarray(np.asarray(pack.cl_box)[0:3, :C0].min(axis=1))
shi = jnp.asarray(np.asarray(pack.cl_box)[3:6, :C0].max(axis=1))
key = timeit("sort_key", jax.jit(lambda o, d: pb._sort_key(o, d, slo, shi)), o, d)
perm = timeit("argsort", jax.jit(jnp.argsort), key)

chunk = pb._chunk_size(N)
pad = (-N) % chunk
permp = jnp.concatenate([perm, jnp.zeros(pad, perm.dtype)])
nc = (N + pad) // chunk
o_s = o[permp].reshape(nc, chunk, 3)
d_s = d[permp].reshape(nc, chunk, 3)
tm = jnp.full((nc, chunk), 3e38, jnp.float32)


@jax.jit
def prepass(o_s, d_s, tm):
    return jax.lax.map(
        lambda a: pb._chunk_prepass(a[0], a[1], a[2], pack.cl_box),
        (o_s, d_s, tm),
    )


order, entry, h = timeit("prepass", prepass, o_s, d_s, tm)
C = pack.meta["n_clusters"]
print("H: mean %.1f  p50 %d  p90 %d  max %d  (of %d clusters)" % (
    float(jnp.mean(h)), int(jnp.percentile(h, 50)),
    int(jnp.percentile(h, 90)), int(jnp.max(h)), C))

@jax.jit
def cone(o_s, d_s, tm):
    return pb._cone_prepass(o_s, d_s, tm, pack.cl_box)


_, _, hc = timeit("cone prepass", cone, o_s, d_s, tm)
print("H(cone): mean %.1f  p50 %d  p90 %d  max %d" % (
    float(jnp.mean(hc)), int(jnp.percentile(hc, 50)),
    int(jnp.percentile(hc, 90)), int(jnp.max(hc))))

for kern in ("vpu", "mxu"):
    for pp in ("exact", "cone"):
        pb.KERNEL = kern
        pb.PREPASS = pp
        timeit(f"closest {kern}/{pp} (sorted)",
               jax.jit(lambda o, d: pb.cluster_closest(
                   pack, o, d, jnp.inf, sort=True)[0]), o, d)
pb.KERNEL = "mxu"
pb.PREPASS = "exact"
timeit("closest mxu (sort=False)",
       jax.jit(lambda o, d: pb.cluster_closest(pack, o, d, jnp.inf, sort=False)[0]), o, d)
pb.PREPASS = "cone"
timeit("any mxu/cone (sorted)",
       jax.jit(lambda o, d: pb.cluster_any(pack, o, d, 1e30, sort=True)), o, d)
