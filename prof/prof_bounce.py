#!/usr/bin/env python
"""Stage-level profiler for the path-bounce body on the real chip.

Times each stage of the wavefront bounce in isolation: K repetitions
inside one jit (lax.fori_loop) so host dispatch (~6 ms) amortizes away.
Carries a data dependency through every iteration to defeat DCE/CSE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from mitsuba_tpu.scene.xml_loader import load_scene
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.scene.texture_eval import shading_params

R = int(os.environ.get("PROF_LANES", 1 << 18))
K = int(os.environ.get("PROF_ITERS", 50))

here = os.path.dirname(os.path.abspath(__file__))
SCENE = os.environ.get("PROF_SCENE", "cbox")
scene = load_scene(os.path.join(here, "scenes", f"{SCENE}.xml"))
pack = pack_scene(scene)
present = pack.present_types

lane = jnp.arange(R, dtype=jnp.uint32)
key = jax.random.PRNGKey(0)
if SCENE == "cbox":
    # camera-ish rays from inside the box toward random directions
    o0 = jnp.tile(jnp.array([[278.0, 273.0, -500.0]], jnp.float32), (R, 1))
    d0 = mm.normalize(
        jax.random.normal(key, (R, 3)) + jnp.array([0.0, 0.0, 2.0])
    )
else:
    # generic: shoot at the scene bbox center from outside
    import numpy as _np

    _v = _np.asarray(pack.tri_v0[: max(pack.n_tris, 1)])
    _c = (_v.min(axis=0) + _v.max(axis=0)) / 2 if pack.n_tris else _np.zeros(3)
    _r = float(_np.linalg.norm(_v.max(axis=0) - _v.min(axis=0)) / 2 + 1e-3) if pack.n_tris else 1.0
    o0 = jnp.tile(jnp.asarray(_c + _np.array([0.0, 0.6 * _r, -2.5 * _r]),
                              jnp.float32)[None, :], (R, 1))
    d0 = mm.normalize(
        jax.random.normal(key, (R, 3)) * 0.35 + jnp.asarray([0.0, -0.2, 1.0])
    )


def timed(name, fn):
    f = jax.jit(fn)
    out = f(jnp.uint32(1))
    jax.block_until_ready(out)
    t0 = time.time()
    out = f(jnp.uint32(2))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / K
    print(f"{name:28s} {dt*1e3:8.3f} ms/iter   ({dt*1e3/R*1e6:.2f} ns/lane)")
    return dt


def loop(body):
    """fori_loop wrapper: carry a perturbation so iterations can't CSE."""
    def run(salt):
        def it(i, carry):
            return body(i + salt, carry)
        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
    return run


def main():
    print(f"lanes={R}  iters={K}  backend={jax.default_backend()}")

    # 1. RNG: the two per-bounce rand4 calls
    def rng_body(i, acc):
        u_n = rng.rand4(lane, i, jnp.uint32(1), 0)
        u_b = rng.rand4(lane, i, jnp.uint32(2), 0)
        return acc + u_n[..., 0].sum() + u_b[..., 0].sum()
    timed("rng: 2x rand4", loop(rng_body))

    # 2. closest-hit trace
    def trace_body(i, acc):
        d = mm.normalize(d0 + 1e-6 * acc)
        hit = intersect(pack, o0, d)
        return acc + hit.t.sum() * 1e-9
    t_trace = timed("intersect (closest)", loop(trace_body))

    # 3. shadow trace
    def shadow_body(i, acc):
        d = mm.normalize(d0 + 1e-6 * acc)
        occ = occluded(pack, o0, d, jnp.full((R,), 500.0))
        return acc + occ.sum() * 1e-9
    timed("occluded (any-hit)", loop(shadow_body))

    # precompute a fixed hit for shading stages
    hit0 = intersect(pack, o0, d0)
    hit0 = jax.tree.map(jax.device_put, hit0)

    # 4. fill_interaction
    def fill_body(i, acc):
        t = hit0._replace(t=hit0.t + 1e-6 * acc)
        its = fill_interaction(pack, o0, d0, t)
        return acc + its.p.sum() * 1e-9
    timed("fill_interaction", loop(fill_body))

    its0 = fill_interaction(pack, o0, d0, hit0)
    frame0 = mm.Frame.from_normal(its0.ns)
    wi0 = frame0.to_local(its0.wi_world)

    # 5. shading_params gather
    def sp_body(i, acc):
        uv = its0.uv + 1e-6 * acc
        sp = shading_params(pack, its0.mat, uv)
        return acc + sp["cA"].sum() * 1e-9
    timed("shading_params", loop(sp_body))

    sp0 = shading_params(pack, its0.mat, its0.uv)

    # 6. emitter sample_direct
    def nee_sample_body(i, acc):
        u = rng.rand4(lane, i, jnp.uint32(1), 0)
        ds = em.sample_direct(pack, its0.p, u[..., :3])
        return acc + ds.pdf.sum() * 1e-9
    timed("em.sample_direct", loop(nee_sample_body))

    # 7. bsdf_eval + bsdf_pdf (NEE shading)
    def nee_shade_body(i, acc):
        u = rng.rand4(lane, i, jnp.uint32(1), 0)
        ds = em.sample_direct(pack, its0.p, u[..., :3])
        wo_l = frame0.to_local(ds.d)
        f = bsdf_eval(sp0, wi0, wo_l, present)
        b = bsdf_pdf(sp0, wi0, wo_l, present)
        return acc + f.sum() * 1e-9 + b.sum() * 1e-9
    timed("NEE shade (eval+pdf)", loop(nee_shade_body))

    # 8. bsdf_sample
    def bs_body(i, acc):
        u = rng.rand4(lane, i, jnp.uint32(2), 0)
        bs = bsdf_sample(sp0, wi0, u[..., :2], u[..., 2], present)
        return acc + bs.weight.sum() * 1e-9
    timed("bsdf_sample", loop(bs_body))

    # 8b. escaped-ray env radiance (big on envmap scenes)
    if "env" in pack.meta.get("emitter_kinds", ()):
        def env_body(i, acc):
            d = mm.normalize(d0 + 1e-6 * acc)
            Le = em.eval_env(pack, d)
            return acc + Le.sum() * 1e-9
        timed("env_radiance (miss)", loop(env_body))

    # 9. full bounce body (path_trace body once per iter, regen-style)
    from mitsuba_tpu.integrator.path import path_trace

    integ = scene.integrator

    def full_body(i, acc):
        d = mm.normalize(d0 + 1e-6 * acc)
        one = type(integ)(**{**integ.__dict__, "max_depth": 1})
        L = path_trace(pack, one, o0, d, lane, jnp.full((R,), i, jnp.uint32),
                       None, 0)
        return acc + L.sum() * 1e-9
    timed("FULL 1-bounce body", loop(full_body))


if __name__ == "__main__":
    main()
