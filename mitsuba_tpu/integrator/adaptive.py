"""Adaptive sampling meta-integrator.

Rebuild of reference src/integrators/misc/adaptive.cpp: the reference
renders blocks repeatedly and applies a per-block t-test on the sample
mean (95% confidence, maxError threshold), stopping early where the
estimate converged and spending up to maxSampleFactor extra samples
where it hasn't.  Sequential per-block loops don't map to the
wavefront, so the TPU shape is:

* base: two independent half-buffers A/B (same pixel, disjoint sample
  ranges) rendered with the regular regenerating wavefront.
* error map: e = |lum(A) - lum(B)| / max(lum(mean), eps) — a two-fold
  jackknife stand-in for the t-test statistic.
* refinement passes: every pass re-aims ALL lanes at pixels drawn
  proportionally to the remaining error mass (stratified inversion of
  the error CDF), traces one more sample there, and scatter-adds into
  (sum, count).  Per-pixel sample indices stay globally unique
  (duplicate lanes on one pixel get consecutive ranks), so the result
  is unbiased and deterministic.
* stop: when the error mass under maxError everywhere, or after
  max_sample_factor * spp total extra rounds.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import rng
from mitsuba_tpu.integrator.path import path_trace
from mitsuba_tpu.sensor.plugins import generate_rays

LUM = jnp.asarray([0.212671, 0.715160, 0.072169], jnp.float32)


def render_adaptive(scene, spp=None, seed=0, pack=None):
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    sensor = scene.sensor.record
    film = sensor.film
    sampler = sensor.sampler
    w, h = film.width, film.height
    spp = spp or sampler.sample_count
    cam = sensor.pack(w, h)
    integ = scene.integrator
    sub = integ.sub_integrator
    if sub is None:
        from mitsuba_tpu.integrator.plugins import IntegratorRecord

        sub = IntegratorRecord(kind="path")
    max_error = getattr(integ, "max_error", 0.05) or 0.05
    max_factor = getattr(integ, "max_sample_factor", 8) or 8

    n_px = w * h
    lane = jnp.arange(n_px, dtype=jnp.uint32)

    def trace_px(px, sidx):
        u2 = sampler.pixel_sample(px, sidx, spp)
        x = (px % w).astype(jnp.float32) + u2[..., 0]
        y = (px // w).astype(jnp.float32) + u2[..., 1]
        pos01 = jnp.stack([x / w, y / h], axis=-1)
        o, d = generate_rays(cam, pos01, jnp.zeros_like(u2))
        return path_trace(pack, sub, o, d, px, sidx, sampler, seed)

    half = max(spp // 2, 2)

    @jax.jit
    def base_pass(sidx0):
        acc = jnp.zeros((n_px, 3), jnp.float32)
        def body(k, acc):
            return acc + trace_px(lane, sidx0 + k.astype(jnp.uint32))
        return jax.lax.fori_loop(0, half, body, acc)

    a = base_pass(jnp.uint32(0))
    b = base_pass(jnp.uint32(half))
    sum_l = a + b
    count = jnp.full((n_px,), 2 * half, jnp.float32)

    @jax.jit
    def refine(sum_l, count, a, b, it):
        mean = sum_l / count[:, None]
        lum_m = mean @ LUM
        err = jnp.abs((a - b) @ LUM) / (2.0 * half)
        rel = err / jnp.maximum(lum_m, 1e-3)
        mass = jnp.where(rel > max_error, rel, 0.0)
        cdf = jnp.cumsum(mass)
        total = cdf[-1]
        # stratified inversion: lane i targets the pixel owning mass
        # slice (i + u)/n * total
        u = rng.rand1(lane, it, 4021, rng.stream_seed(seed, rng.STREAM_CAMERA))
        pos = (lane.astype(jnp.float32) + u) / n_px * total
        px = jnp.clip(
            jnp.searchsorted(cdf, pos, side="right"), 0, n_px - 1
        ).astype(jnp.uint32)
        # unique per-pixel sample ids: rank duplicates
        order = jnp.argsort(px)
        px_s = px[order]
        first = jnp.searchsorted(px_s, px_s, side="left")
        rank_s = jnp.arange(n_px) - first
        rank = jnp.zeros((n_px,), jnp.int32).at[order].set(
            rank_s.astype(jnp.int32)
        )
        sidx = count[px.astype(jnp.int32)].astype(jnp.uint32) + rank.astype(
            jnp.uint32
        )
        L = trace_px(px, sidx)
        live = total > 0
        scale = jnp.where(live, 1.0, 0.0)
        sum_l = sum_l.at[px.astype(jnp.int32)].add(L * scale)
        count = count.at[px.astype(jnp.int32)].add(scale)
        return sum_l, count, total

    max_rounds = int(math.ceil(max_factor * spp / 2))
    for it in range(max_rounds):
        sum_l, count, total = refine(
            sum_l, count, a, b, jnp.uint32(1000 + it)
        )
        if float(total) <= 0.0:
            break

    img = sum_l / count[:, None]
    return np.asarray(img.reshape(h, w, 3))
