"""Specular manifold walks (integrator/manifold.py; reference
src/libbidir/manifold.cpp SpecularManifold — Jakob & Marschner 2012).

A dielectric sphere between a start point and a receiver wall: after
moving the chain endpoint, the Newton walk must find the start
direction whose two-refraction chain lands on the new target."""

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.integrator.manifold import (
    REFLECT,
    REFRACT,
    chain_trace,
    manifold_walk,
)
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene():
    return load_scene_string("""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="dielectric">
          <float name="intIOR" value="1.5"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="6"/>
          <translate z="4"/>
        </transform>
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>""")


def test_manifold_walk_recovers_moved_target():
    pack = pack_scene(_scene())
    n = 64
    rng = np.random.default_rng(3)
    # start points on a small patch in front of the sphere, initial
    # directions roughly through the sphere center
    p0 = np.zeros((n, 3), np.float32)
    p0[:, 0] = rng.uniform(-0.2, 0.2, n)
    p0[:, 1] = rng.uniform(-0.2, 0.2, n)
    p0[:, 2] = -3.0
    d0 = -p0.copy()
    d0[:, 2] += 1.0  # aim near (but not at) the center
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    p0 = jnp.asarray(p0)
    d0 = jnp.asarray(mm.normalize(jnp.asarray(d0)))
    sig = (REFRACT, REFRACT)

    p_end, n_end, ok0 = chain_trace(pack, p0, d0, sig)
    ok0 = np.asarray(ok0)
    assert ok0.mean() > 0.9  # the chain genuinely goes through glass
    # wall normal: the receiver plane at z=4
    n_t = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], jnp.float32), (n, 3)
    )
    # displace the endpoints in the wall plane
    delta = rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32)
    p_target = np.asarray(p_end).copy()
    p_target[:, 0] += delta[:, 0]
    p_target[:, 1] += delta[:, 1]
    p_target = jnp.asarray(p_target)

    d_sol, err, ok = manifold_walk(pack, p0, d0, sig, p_target, n_t)
    ok = np.asarray(ok) & ok0
    err = np.asarray(err)
    # most walks converge to sub-millimeter on a scene of unit scale
    conv = ok & (err < 1e-3)
    assert conv.mean() > 0.75, (conv.mean(), np.median(err[ok]))

    # converged solutions really do re-trace onto the target
    p_chk, _, ok_c = chain_trace(pack, p0, d_sol, sig)
    gap = np.linalg.norm(
        np.asarray(p_chk) - np.asarray(p_target), axis=-1
    )
    assert np.median(gap[conv]) < 1e-3


def test_manifold_walk_reflection_chain():
    """Single mirror-reflection chain (conductor sphere) — the REFLECT
    branch of the deterministic chain."""
    sc = load_scene_string("""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="conductor"/>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="8"/>
          <translate z="-4"/>
        </transform>
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>""")
    pack = pack_scene(sc)
    n = 32
    rng = np.random.default_rng(5)
    p0 = np.zeros((n, 3), np.float32)
    p0[:, 0] = rng.uniform(-0.5, 0.5, n)
    p0[:, 1] = rng.uniform(-0.5, 0.5, n)
    p0[:, 2] = -3.0
    d0 = np.zeros((n, 3), np.float32)
    d0[:, 0] = -p0[:, 0] * 0.2
    d0[:, 1] = -p0[:, 1] * 0.2
    d0[:, 2] = 1.0
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    p0, d0 = jnp.asarray(p0), jnp.asarray(d0)
    sig = (REFLECT,)
    p_end, _, ok0 = chain_trace(pack, p0, d0, sig)
    n_t = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3)
    )
    delta = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    pt = np.asarray(p_end).copy()
    pt[:, 0] += delta[:, 0]
    pt[:, 1] += delta[:, 1]
    d_sol, err, ok = manifold_walk(pack, p0, d0, sig, jnp.asarray(pt),
                                   n_t)
    conv = np.asarray(ok) & np.asarray(ok0) & (np.asarray(err) < 1e-3)
    assert conv.mean() > 0.7, (conv.mean(), np.median(np.asarray(err)))
