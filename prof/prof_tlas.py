"""TLAS fast-path micro-bench: N instances of the bunny, incoherent
sphere-to-sphere rays, while-loop traversal vs the pair fast path.

Run on real TPU:  cd /root/repo && python prof/prof_tlas.py
Knobs: N_INST (default 1000), T rays (default 2^17), GRID spacing.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MTS_INSTANCE_EXPAND_MAX", "0")  # force TLAS

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string

N_INST = int(os.environ.get("N_INST", 1000))
T = int(os.environ.get("T", 1 << 17))
ITERS = int(os.environ.get("ITERS", 5))

side = int(round(N_INST ** (1.0 / 3.0)))
while side * side * side < N_INST:
    side += 1
spacing = 2.5  # bunny is ~1 unit; space them out

insts = []
k = 0
for ix in range(side):
    for iy in range(side):
        for iz in range(side):
            if k >= N_INST:
                break
            x, y, z = (
                (ix - side / 2) * spacing,
                (iy - side / 2) * spacing,
                (iz - side / 2) * spacing,
            )
            insts.append(f"""
      <shape type="instance">
        <ref id="g"/>
        <transform name="toWorld">
          <translate x="{x}" y="{y}" z="{z}"/>
        </transform>
      </shape>""")
            k += 1

scene = load_scene_string(f"""
<scene version="0.5.0">
  <integrator type="path"/>
  <sensor type="perspective">
    <sampler type="independent"><integer name="sampleCount" value="4"/>
    </sampler>
    <film type="hdrfilm">
      <integer name="width" value="8"/><integer name="height" value="8"/>
      <rfilter type="box"/></film>
  </sensor>
  <shape type="shapegroup" id="g">
    <shape type="ply">
      <string name="filename" value="/root/reference/data/tests/bunny.ply"/>
      <bsdf type="diffuse"/>
    </shape>
  </shape>
  {''.join(insts)}
  <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>""", base_dir="/root/repo")

t0 = time.time()
pack = pack_scene(scene)
print(f"pack: {time.time()-t0:.1f}s n_inst={pack.meta['n_instances']} "
      f"pairs_ok={pack.meta.get('inst_pairs_ok')} "
      f"nodes={pack.arrays['inst_nodes'].shape}", flush=True)

ext = side * spacing * 0.75
u = rng.rand4(jnp.arange(T, dtype=jnp.uint32), 0, 0)
p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * ext
p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * (ext * 0.2)
d = p2 - p1
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = p1
BIG = 1e30


def bench(name, fn):
    @jax.jit
    def run():
        def body(i, acc):
            oo = o + i.astype(jnp.float32) * 1e-6
            init = (
                jnp.full((T,), BIG, jnp.float32),
                jnp.full((T,), -1, jnp.int32),
                jnp.zeros((T,), jnp.float32),
                jnp.zeros((T,), jnp.float32),
                jnp.full((T,), -1, jnp.int32),
            )
            out = fn(pack, oo, d, *init)
            return acc + sum(jnp.sum(x.astype(jnp.float32)) * 1e-9
                             for x in out[:2])
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    try:
        t0 = time.time()
        run().block_until_ready()
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run().block_until_ready()
        best = min(best, time.time() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:28s} {ms:8.2f} ms  {T/(best/ITERS)/1e6:8.1f} MRays/s",
          flush=True)
    return ms


from mitsuba_tpu.accel.tlas import inst_closest, inst_closest_pairs

# hit-rate / parity sanity on a small slice first
init = (jnp.full((4096,), BIG, jnp.float32),
        jnp.full((4096,), -1, jnp.int32),
        jnp.zeros((4096,), jnp.float32), jnp.zeros((4096,), jnp.float32),
        jnp.full((4096,), -1, jnp.int32))
try:
    a = inst_closest_pairs(pack, o[:4096], d[:4096], *init)
    b = inst_closest(pack, o[:4096], d[:4096], *init)
    hits = int(np.sum(np.asarray(a[1]) >= 0))
    agree = int(np.sum(np.asarray(a[1]) == np.asarray(b[1])))
    print(f"sanity: hits={hits}/4096 prim-agree={agree}/4096", flush=True)
except Exception as e:
    print(f"sanity FAILED: {type(e).__name__}: {e}", flush=True)

ms_fast = bench("inst_closest_pairs", inst_closest_pairs)
ms_slow = bench("inst_closest (while-loop)", inst_closest)
if ms_fast and ms_slow:
    print(f"speedup: {ms_slow/ms_fast:.1f}x", flush=True)
print("done", flush=True)
