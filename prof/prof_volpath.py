#!/usr/bin/env python
"""Stage-level profiler for the volpath event body (smoke scene)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from mitsuba_tpu.scene.xml_loader import load_scene
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.accel.intersect import fill_interaction, intersect
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng
from mitsuba_tpu.medium import eval as med_eval
from mitsuba_tpu.integrator import volpath as vp

R = int(os.environ.get("PROF_LANES", 36864))
K = int(os.environ.get("PROF_ITERS", 20))

scene = load_scene(os.path.join(os.path.dirname(__file__), "scenes", "smoke.xml"))
pack = pack_scene(scene)
print("n_tris", pack.n_tris, "n_spheres", pack.n_spheres,
      "emitters", pack.meta["emitter_kinds"], "n_med", pack.meta["n_media"])

lane = jnp.arange(R, dtype=jnp.uint32)
key = jax.random.PRNGKey(0)
o0 = jnp.tile(jnp.asarray([[0.0, 1.0, -3.0]], jnp.float32), (R, 1))
d0 = mm.normalize(jax.random.normal(key, (R, 3)) + jnp.asarray([0., 0., 3.]))
med0 = jnp.zeros((R,), jnp.int32)


def timed(name, fn):
    f = jax.jit(fn)
    out = f(jnp.uint32(1))
    jax.block_until_ready(out)
    t0 = time.time()
    out = f(jnp.uint32(2))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / K
    print(f"{name:28s} {dt*1e3:9.3f} ms/iter")


def loop(body):
    def run(salt):
        def it(i, carry):
            return body(i + salt, carry)
        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
    return run


def tr_body(i, acc):
    d = mm.normalize(d0 + 1e-6 * acc)
    hit = intersect(pack, o0, d)
    return acc + hit.t.sum() * 1e-9
timed("intersect", loop(tr_body))


def fill_body(i, acc):
    d = mm.normalize(d0 + 1e-6 * acc)
    hit = intersect(pack, o0, d)
    its = fill_interaction(pack, o0, d, hit)
    return acc + its.p.sum() * 1e-9
timed("intersect+fill", loop(fill_body))


def sd_body(i, acc):
    u = rng.rand4(lane, i, 1, 0)
    ms = med_eval.sample_distance(
        pack, med0, o0, d0, jnp.full((R,), 4.0), u[..., :3], lane, i, 0, 0
    )
    return acc + ms.t.sum() * 1e-9 + ms.weight.sum() * 1e-9
timed("sample_distance", loop(sd_body))


def trn_body(i, acc):
    tr = med_eval.transmittance(
        pack, med0, o0, d0, jnp.full((R,), 4.0), lane, i, 1, 0
    )
    return acc + tr.sum() * 1e-9
timed("transmittance x1", loop(trn_body))


def av_body(i, acc):
    d = mm.normalize(d0 + 1e-6 * acc)
    tr = vp._attenuated_visibility(
        pack, o0, d, jnp.full((R,), 4.0), med0, lane, i, 1, 0
    )
    return acc + tr.sum() * 1e-9
timed("attenuated_visibility", loop(av_body))


integ = scene.integrator


def full_body(i, acc):
    d = mm.normalize(d0 + 1e-6 * acc)
    one = type(integ)(**{**integ.__dict__, "max_depth": 1})
    L = vp.volpath_trace(pack, one, o0, d, lane,
                         jnp.full((R,), i, jnp.uint32), None, 0)
    return acc + L.sum() * 1e-9
timed("FULL 1-event volpath", loop(full_body))
