"""Specular manifold exploration (Jakob & Marschner 2012).

Rebuild of the reference's SpecularManifold Newton-solver walks
(include/mitsuba/bidir/manifold.h:35, src/libbidir/manifold.cpp ~1,000
LoC): given a path segment start -> [k specular vertices] -> endpoint,
find the start DIRECTION whose deterministic specular chain lands on a
moved endpoint.

TPU-shaped differences from the reference:
* the reference parametrizes by the first specular vertex's surface
  position and propagates analytic constraint derivatives through a
  block-tridiagonal system; here the unknown is the 2D start direction
  and the whole chain is re-traced per Newton iteration — chain
  re-tracing is a handful of batched intersect() calls, which is the
  cheap operation on TPU, while the 2x2 Jacobian comes from two
  finite-difference traces (the reference's manifold.cpp:498 also
  falls back to FD when derivatives degrade);
* everything is fixed-iteration and batched: thousands of walks run in
  lockstep under jit, failures just flag out.

The chain SIGNATURE (reflect/refract per bounce) is static, like the
reference's path configuration strings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.integrator.path import _offset_ray

REFLECT = 0
REFRACT = 1


def _refract_world(d, n, eta_rel):
    """Deterministic refraction of unit d through normal n with
    relative IOR eta_rel (int/ext); returns (d_out, tir_mask)."""
    cos_i = -mm.dot(d, n)
    entering = cos_i > 0
    n_or = jnp.where(entering[..., None], n, -n)
    ci = jnp.abs(cos_i)
    eta = jnp.where(entering, 1.0 / eta_rel, eta_rel)
    sin2_t = eta * eta * (1.0 - ci * ci)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    d_out = eta[..., None] * d + (eta * ci - cos_t)[..., None] * n_or
    return mm.normalize(d_out), tir


def chain_trace(pack, o, d, signature, time=None):
    """Trace start ray (o, d) deterministically through `signature`
    (static tuple of REFLECT/REFRACT) specular bounces, then one more
    segment to the receiving surface, optionally at a shutter `time`
    (animated/deformable shapes; the motion integrator re-solves
    chains at the target frame).

    Returns (p_end [R,3], n_end [R,3], ok [R])."""
    ok = jnp.ones(o.shape[:1], bool)
    for s in signature:
        hit = intersect(pack, o, d, time=time)
        its = fill_interaction(pack, o, d, hit)
        ok = ok & its.valid
        n = its.ns
        if s == REFLECT:
            d = mm.normalize(d - 2.0 * mm.dot(d, n)[..., None] * n)
        else:
            eta_rel = take_rows(pack.mat_eta, jnp.maximum(its.mat, 0))
            d, tir = _refract_world(d, n, eta_rel)
            ok = ok & ~tir
        o = _offset_ray(its.p, its.ng, d)
    hit = intersect(pack, o, d, time=time)
    its = fill_interaction(pack, o, d, hit)
    ok = ok & its.valid
    return its.p, its.ns, ok


def manifold_walk(
    pack, p_start, d0, signature, p_target, n_target,
    iters=16, fd_eps=1e-4, time=None,
):
    """Newton walk: adjust the start direction until the specular chain
    endpoint lands on p_target (measured in the target's tangent
    plane).  Batched over lanes; fixed iteration count.

    Returns (d_solved [R,3], err [R] final tangent-plane distance,
    ok [R])."""
    fr_t = mm.Frame.from_normal(n_target)
    fr_d = mm.Frame.from_normal(d0)

    def residual(x):
        d = mm.normalize(
            d0 + x[..., 0:1] * fr_d.s + x[..., 1:2] * fr_d.t
        )
        p_end, _, ok = chain_trace(pack, p_start, d, signature,
                                   time=time)
        dp = p_end - p_target
        e = jnp.stack(
            [mm.dot(dp, fr_t.s), mm.dot(dp, fr_t.t)], axis=-1
        )
        return e, ok

    r = p_start.shape[0]
    x = jnp.zeros((r, 2), jnp.float32)

    def step(x, _):
        e0, ok0 = residual(x)
        ex, okx = residual(x + jnp.array([fd_eps, 0.0], jnp.float32))
        ey, oky = residual(x + jnp.array([0.0, fd_eps], jnp.float32))
        # 2x2 Jacobian columns from forward differences
        j00 = (ex[..., 0] - e0[..., 0]) / fd_eps
        j10 = (ex[..., 1] - e0[..., 1]) / fd_eps
        j01 = (ey[..., 0] - e0[..., 0]) / fd_eps
        j11 = (ey[..., 1] - e0[..., 1]) / fd_eps
        det = j00 * j11 - j01 * j10
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        dx0 = -(j11 * e0[..., 0] - j01 * e0[..., 1]) * inv_det
        dx1 = -(-j10 * e0[..., 0] + j00 * e0[..., 1]) * inv_det
        dx = jnp.stack([dx0, dx1], axis=-1)
        ok = ok0 & okx & oky
        # damped update with one backtracking halving (manifold.cpp
        # step-size control, simplified)
        x1 = x + jnp.where(ok[..., None], dx, 0.0)
        e1, ok1 = residual(x1)
        worse = (~ok1) | (
            jnp.linalg.norm(e1, axis=-1) > jnp.linalg.norm(e0, axis=-1)
        )
        x_half = x + jnp.where(ok[..., None], 0.5 * dx, 0.0)
        x_new = jnp.where(worse[..., None], x_half, x1)
        return x_new, None

    x, _ = jax.lax.scan(step, x, None, length=iters)
    e, ok = residual(x)
    d_sol = mm.normalize(
        x[..., 0:1] * fr_d.s + x[..., 1:2] * fr_d.t + d0
    )
    err = jnp.linalg.norm(e, axis=-1)
    return d_sol, err, ok
