"""Round-5 pair-traversal tuning sweep: cluster size / K / budget /
fallback isolation.  The round-4 profile (prof_r5.py) showed the MXU
kernel at ~3 ms/262k rays while cull+queue+restore+fallback burn
~35 ms — glue, not intersection.  Everything here is env-knob level:
cluster tc halves the cluster count (and with it every glue stage),
K/budget trade overflow against queue size.

Run on real TPU:  cd /root/repo && python prof/prof_r5b.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

T = int(os.environ.get("T", 1 << 18))
ITERS = int(os.environ.get("ITERS", 8))


def make_rays(pack):
    from mitsuba_tpu.core import rng, warp

    lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
    hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
    u = rng.rand4(jnp.arange(T, dtype=jnp.uint32), 0, 0)
    p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
    p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
    d = p2 - p1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return p1, d


def bench(name, fn, n_iters=ITERS):
    @jax.jit
    def run():
        def body(i, acc):
            out = fn(i)
            return acc + sum(
                jnp.sum(x.astype(jnp.float32)) * 1e-9 for x in out
            )
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    try:
        run().block_until_ready()
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run().block_until_ready()
        best = min(best, time.time() - t0)
    ms = best / n_iters * 1e3
    print(f"{name:52s} {ms:8.2f} ms  {T/(best/n_iters)/1e6:8.1f} MRays/s",
          flush=True)
    return ms


def sweep(tc, k, budget):
    """Rebuild the pack + pairs module under the given knobs and time
    pair_closest end-to-end + its overflow rate."""
    import importlib

    os.environ["MTS_CLUSTER_TC"] = str(tc)
    os.environ["MTS_PAIR_K"] = str(k)
    os.environ["MTS_PAIR_BUDGET"] = str(budget)
    import mitsuba_tpu.accel.clusters as clus
    import mitsuba_tpu.accel.pairs as prs
    importlib.reload(clus)
    importlib.reload(prs)
    import mitsuba_tpu.scene.builder as bld
    importlib.reload(bld)
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene("scenes/bunny.xml")
    pack = bld.pack_scene(scene)
    c = pack.meta["n_clusters"]
    o, d = make_rays(pack)
    t_max = jnp.full((T,), prs.BIG, jnp.float32)

    # overflow + pairs-per-ray stats (one shot)
    @jax.jit
    def stats(oo):
        cids, ent_k, ov = prs._cluster_lists_dense(pack, oo, d, t_max,
                                                   False)
        bt, bp, bu, bv, ovf = prs._run_tile(pack, oo, d, t_max,
                                            "closest", False)
        return (jnp.sum(cids < c), jnp.sum(ovf),
                jnp.mean(ov["n_cl"].astype(jnp.float32)))

    try:
        nv, novf, mean_ncl = (np.asarray(x) for x in stats(o))
        print(f"tc={tc} K={k} B={budget}: clusters={c} "
              f"pairs/ray={float(nv)/T:.2f} mean_n_cl={float(mean_ncl):.2f} "
              f"overflow={float(novf)/T*100:.2f}%", flush=True)
    except Exception as e:
        print(f"tc={tc} K={k} B={budget}: stats FAILED {e}", flush=True)
        return

    def full(i):
        oo = o + i.astype(jnp.float32) * 1e-7
        bt, bp, bu, bv = prs.pair_closest(pack, oo, d, t_max)
        return bt, bp

    def nofb(i):
        oo = o + i.astype(jnp.float32) * 1e-7
        bt, bp, bu, bv, ovf = prs._run_tile(pack, oo, d, t_max,
                                            "closest", False)
        return bt, bp

    if os.environ.get("SWEEP_NOFB", "1") == "1":
        bench(f"  tc={tc} K={k} B={budget} pipeline (no fallback)", nofb)
    bench(f"  tc={tc} K={k} B={budget} pair_closest (full)", full)


if __name__ == "__main__":
    default_cfgs = "128,3,1.25 128,2,1.25 128,4,1.5 256,3,1.25 256,2,1.25 384,2,1.25"
    cfgs = os.environ.get("SWEEP_CONFIGS", default_cfgs).split()
    for cfg in cfgs:
        tc, k, budget = cfg.split(",")
        sweep(int(tc), int(k), float(budget))
    print("done", flush=True)
