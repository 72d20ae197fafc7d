"""DENSE_C VMEM-headroom validation (ADVICE r4 low #4): compile and
run the dense one-level cull + full pair pipeline at the c=2048
ceiling on the real TPU.

_dense_cull_kernel holds several live [Cp, CULL_B] f32 temporaries
(tn, tf, key, row, hit); at c=2048, CULL_B=512 each is ~4 MiB, so the
ceiling needed a real-chip compile check (only bunny-scale c≈786 was
profiled before).  Run:  cd /root/repo && python prof/prof_dense_c.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

T = int(os.environ.get("T", 1 << 16))

from mitsuba_tpu.accel import pairs as prs
from tests.test_cluster import cluster_pack

# measured: the uniform soup packs ~87 tris/cluster at tc=128, and the
# kernel OOMed scoped vmem at Cp=3072 (19.39 MiB vs the 16 MiB limit)
# — so target the VMEM-formula ceiling itself and prove it compiles.
N_TRIS = int(os.environ.get("N_TRIS", prs.DENSE_C * 87))
pack = cluster_pack(n_tris=N_TRIS, tc=128)
c = pack.meta["n_clusters"]
prs.DENSE_C = max(c, prs.DENSE_C)  # force the dense cull at the ceiling
print(f"n_tris={pack.meta['n_tris']} clusters={c} "
      f"(DENSE_C={prs.DENSE_C})", flush=True)

rng = np.random.default_rng(7)
o = jnp.asarray(rng.uniform(-2, 2, (T, 3)).astype(np.float32))
d = rng.normal(size=(T, 3)).astype(np.float32)
d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
t_max = jnp.full((T,), prs.BIG, jnp.float32)

f = jax.jit(lambda oo: prs.pair_closest(pack, oo, d, t_max))
t0 = time.time()
bt, bp, bu, bv = f(o)
bt.block_until_ready()
print(f"compile+run ok in {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
bt, bp, bu, bv = f(o + 1e-6)
bt.block_until_ready()
dt = time.time() - t0
print(f"steady: {dt*1e3:.1f} ms  {T/dt/1e6:.1f} MRays/s  "
      f"hits={int(jnp.sum(bp >= 0))}/{T}", flush=True)
