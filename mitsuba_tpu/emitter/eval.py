"""Device-side emitter sampling and evaluation.

Rebuild of Scene::sampleEmitterDirect / pdfEmitterDirect / evalEnvironment
(reference: src/librender/scene.cpp:828-841, scene.h:482-760) over the
packed emitter table: pick an emitter from the scene PMF
(sampleReuse-style re-uniformization), then sample it per kind —
triangle-area CDF for area lights, 2D luminance CDF for env maps.
All quantities are per-lane arrays; the returned `value` is Le/pdf with
the emitter-selection probability folded in.
"""

from __future__ import annotations

import math as _pymath
from typing import NamedTuple

import jax.numpy as jnp


def np_ceil_log2(n: int) -> int:
    return int(_pymath.ceil(_pymath.log2(max(n, 2))))

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.gather import ONEHOT_MAX_ROWS, onehot, take_fused
from mitsuba_tpu.emitter.plugins import (
    AREA,
    COLLIMATED,
    CONSTANT,
    DIRECTIONAL,
    ENVMAP,
    POINT,
    SPOT,
)

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 0.5 / jnp.pi
INV_FOURPI = 0.25 / jnp.pi
ENV_DIST = 1e7  # pseudo-distance for env/directional lights


class DirectSample(NamedTuple):
    d: jnp.ndarray  # [R, 3] unit direction ref -> light
    dist: jnp.ndarray  # [R]
    pdf: jnp.ndarray  # [R] solid-angle pdf incl. emitter PMF (delta: mass)
    value: jnp.ndarray  # [R, 3] Le / pdf
    delta: jnp.ndarray  # [R] bool
    n: jnp.ndarray  # [R, 3] light-side normal (area lights)
    kind: jnp.ndarray  # [R] int32 emitter kind (AREA/POINT/... plugins.py)


def _searchsorted_segment(cdf, u, lo, hi, iters=None):
    """Per-lane search: smallest i in [lo, hi) with u < cdf[i]
    (clamped to hi-1).  cdf holds per-segment normalized cumulative
    sums.

    Small tables use a broadcast count (pure VPU compares, no gathers —
    gathers cost ~1000 flops each on TPU); large ones binary-search."""
    n = int(cdf.shape[0])
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    if n <= ONEHOT_MAX_ROWS:
        j = jnp.arange(n, dtype=jnp.int32)
        inseg = (j[None, :] >= lo[:, None]) & (j[None, :] < hi[:, None])
        below = inseg & (u[:, None] >= cdf[None, :])
        cnt = jnp.sum(below.astype(jnp.int32), axis=-1)
        return jnp.minimum(lo + cnt, jnp.maximum(hi - 1, lo))
    if iters is None:
        iters = np_ceil_log2(n + 1)
    left = lo
    right = jnp.maximum(hi - 1, left)  # inclusive
    for _ in range(iters):
        mid = (left + right) // 2
        go_right = u >= cdf[jnp.clip(mid, 0, cdf.shape[0] - 1)]
        left = jnp.where(go_right & (left < right), mid + 1, left)
        right = jnp.where(go_right, right, mid)
        left = jnp.minimum(left, right)
    return left


def _env_uv_from_dir(pack, d):
    """World direction -> lat-long uv (reference envmap.cpp eval)."""
    dl = d @ pack.env_to_local[:3, :3].T
    dl = mm.normalize(dl)
    u = jnp.arctan2(dl[..., 0], -dl[..., 2]) * INV_TWOPI
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = mm.safe_acos(jnp.clip(dl[..., 1], -1.0, 1.0)) * INV_PI
    return jnp.stack([u, v], axis=-1)


def _env_dir_from_uv(pack, uv):
    phi = uv[..., 0] * 2.0 * jnp.pi
    theta = uv[..., 1] * jnp.pi
    st = jnp.sin(theta)
    dl = jnp.stack(
        [st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1
    )
    return mm.normalize(dl @ pack.env_to_world[:3, :3].T)


def _env_bilinear(pack, uv):
    img = pack.env_image
    h, w = img.shape[0], img.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    flat = img.reshape(-1, img.shape[-1])  # 1D gathers: 2D-index
    # gathers lower catastrophically on TPU (~100x slower)

    def fetch(x, y):
        x = jnp.mod(x, w)
        y = jnp.clip(y, 0, h - 1)
        return flat[y * w + x]

    return (
        fetch(x0, y0) * (1 - ax) * (1 - ay)
        + fetch(x0 + 1, y0) * ax * (1 - ay)
        + fetch(x0, y0 + 1) * (1 - ax) * ay
        + fetch(x0 + 1, y0 + 1) * ax * ay
    )


def eval_env(pack, d):
    """Radiance for rays escaping to the environment
    (= Scene::evalEnvironment)."""
    if not pack.has_env:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)
    e = pack.env_idx
    base = jnp.broadcast_to(pack.em_rgb[e], d.shape[:-1] + (3,))
    if pack.has_envmap:
        return _env_bilinear(pack, _env_uv_from_dir(pack, d))
    return base


def _env_pdf_dir(pack, d):
    """Solid-angle pdf of env sampling for direction d (no PMF factor)."""
    if pack.has_envmap:
        uv = _env_uv_from_dir(pack, d)
        h, w = pack.env_density.shape
        col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        dens = pack.env_density.reshape(-1)[row * w + col]
        sin_t = jnp.maximum(jnp.sin(uv[..., 1] * jnp.pi), 1e-6)
        return dens / (2.0 * jnp.pi * jnp.pi * sin_t)
    return jnp.full(d.shape[:-1], INV_FOURPI)


def _sample_env_dir(pack, u2):
    """Importance-sample the env map's per-pixel luminance density via
    a Walker alias table (O(1): one table row per draw; the reference's
    hierarchical 2D CDF inversion, envmap.cpp sampleDirection, costs
    log2(HW) serialized per-lane gathers on TPU — measured 46 ms/pass
    vs ~3 ms for the alias formulation at 262k lanes).  Identical
    per-pixel density -> identical pdfs and MIS weights; only the
    u -> pixel mapping differs."""
    h, w = pack.env_density.shape
    n = h * w
    x = u2[..., 0] * n
    i = jnp.clip(x.astype(jnp.int32), 0, n - 1)
    jx = x - i.astype(jnp.float32)  # uniform, independent of i
    if pack.meta.get("env_alias_fused_ok", False):
        # one 16B row: [prob, alias_idx, dens_self, dens_alias]
        rowv = pack.env_alias_fused[i]
        p_i = rowv[..., 0]
        accept = u2[..., 1] < p_i
        idx = jnp.where(accept, i, rowv[..., 1].astype(jnp.int32))
        dens = jnp.where(accept, rowv[..., 2], rowv[..., 3])
    else:
        p_i = pack.env_alias_prob[i]
        accept = u2[..., 1] < p_i
        idx = jnp.where(accept, i, pack.env_alias_idx[i])
        dens = pack.env_density.reshape(-1)[idx]
    # recycle the accept uniform (conditionally uniform either way)
    jy = jnp.where(
        accept,
        u2[..., 1] / jnp.maximum(p_i, 1e-12),
        (u2[..., 1] - p_i) / jnp.maximum(1.0 - p_i, 1e-12),
    )
    jy = jnp.clip(jy, 0.0, mm.ONE_MINUS_EPS)
    row = idx // w
    col = idx - row * w
    u = (col.astype(jnp.float32) + jx) / w
    v = (row.astype(jnp.float32) + jy) / h
    uv = jnp.stack([u, v], axis=-1)
    d = _env_dir_from_uv(pack, uv)
    sin_t = jnp.maximum(jnp.sin(v * jnp.pi), 1e-6)
    pdf = dens / (2.0 * jnp.pi * jnp.pi * sin_t)
    return d, pdf


def sample_direct(pack, p_ref, u3):
    """NEE: pick emitter + sample a direction toward it.

    u3: [R, 3] uniforms (selection + 2D).  Returns DirectSample.
    """
    r = p_ref.shape[0]
    u_sel = u3[..., 0]
    u2 = u3[..., 1:3]

    kinds = pack.meta.get("emitter_kinds", None)

    # emitter selection with sample reuse (reference pmf.h sampleReuse);
    # single-emitter scenes skip the search entirely (STATIC meta)
    if pack.meta["n_emitters"] == 1:
        e = jnp.zeros((r,), jnp.int32)
    else:
        e = jnp.clip(
            jnp.searchsorted(pack.emitter_cdf, u_sel, side="right") - 1,
            0,
            pack.emitter_pmf.shape[0] - 1,
        )
    pmf, kind, rgb = take_fused(
        e, pack.emitter_pmf, pack.em_kind, pack.em_rgb
    )

    d = jnp.zeros((r, 3), jnp.float32)
    dist = jnp.full((r,), ENV_DIST, jnp.float32)
    pdf = jnp.zeros((r,), jnp.float32)
    value = jnp.zeros((r, 3), jnp.float32)
    delta = jnp.zeros((r,), bool)
    n_l = jnp.zeros((r, 3), jnp.float32)

    def put(mask, d_t, dist_t, pdf_t, val_t, delta_t, n_t=None):
        nonlocal d, dist, pdf, value, delta, n_l
        d = jnp.where(mask[..., None], d_t, d)
        dist = jnp.where(mask, dist_t, dist)
        pdf = jnp.where(mask, pdf_t, pdf)
        value = jnp.where(mask[..., None], val_t, value)
        delta = jnp.where(mask, delta_t, delta)
        if n_t is not None:
            n_l = jnp.where(mask[..., None], n_t, n_l)

    # ---- area lights: triangle from per-emitter area CDF ----
    if pack.has_area:
        em_lo, em_hi, area = take_fused(
            e, pack.em_tri_lo, pack.em_tri_hi, pack.em_area
        )
        tri_slot = _searchsorted_segment(
            pack.area_tri_cdf, u2[..., 0], em_lo, em_hi
        )
        # fused slot-indexed fetch: the winning triangle's id, its cdf
        # value, and its predecessor's (re-uniformization bounds)
        cdf_prev = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), pack.area_tri_cdf[:-1]]
        )
        tri, hi_c, prev_c = take_fused(
            tri_slot, pack.area_tri_idx, pack.area_tri_cdf, cdf_prev
        )
        lo_c = jnp.where(tri_slot > em_lo, prev_c, 0.0)
        u0 = jnp.clip(
            (u2[..., 0] - lo_c) / jnp.maximum(hi_c - lo_c, 1e-12),
            0.0,
            mm.ONE_MINUS_EPS,
        )
        bary = warp.square_to_uniform_triangle(
            jnp.stack([u0, u2[..., 1]], axis=-1)
        )
        v0, e1, e2 = take_fused(
            tri, pack.tri_v0, pack.tri_e1, pack.tri_e2
        )
        p_l = v0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2
        ng = mm.cross(e1, e2)
        ng = mm.normalize(ng)
        to_l = p_l - p_ref
        dist_a = mm.length(to_l)
        d_a = to_l / jnp.maximum(dist_a, 1e-12)[..., None]
        cos_l = -mm.dot(d_a, ng)
        # pdf_area = 1/area; convert to solid angle
        pdf_a = (
            pmf
            * (dist_a * dist_a)
            / jnp.maximum(cos_l * area, 1e-12)
        )
        ok = cos_l > 1e-6  # one-sided area emitters (reference area.cpp)
        val_a = jnp.where(
            (ok & (pdf_a > 0))[..., None],
            rgb / jnp.maximum(pdf_a, 1e-12)[..., None],
            0.0,
        )
        put(kind == AREA, d_a, dist_a, pdf_a, val_a, False, ng)

    # per-kind branches are STATICALLY gated on the scene's emitter set
    # (meta emitter_kinds) — masked dead branches are not free on TPU
    if kinds is None or POINT in kinds or SPOT in kinds:
        # ---- point ----
        em_pos, em_dir, cc, cb = take_fused(
            e, pack.em_pos, pack.em_dir, pack.em_cos_cutoff,
            pack.em_cos_beam,
        )
        to_l = em_pos - p_ref
        dist_p = mm.length(to_l)
        d_p = to_l / jnp.maximum(dist_p, 1e-12)[..., None]
        inv_d2 = 1.0 / jnp.maximum(dist_p * dist_p, 1e-12)
        val_p = rgb * (inv_d2 / jnp.maximum(pmf, 1e-12))[..., None]
        put(kind == POINT, d_p, dist_p, pmf, val_p, True)

        # ---- spot: linear falloff between beamWidth and cutoff ----
        cos_f = -mm.dot(d_p, em_dir)
        fall = jnp.clip((cos_f - cc) / jnp.maximum(cb - cc, 1e-6), 0.0, 1.0)
        fall = jnp.where(cos_f >= cb, 1.0, fall)
        fall = jnp.where(cos_f <= cc, 0.0, fall)
        val_s = val_p * fall[..., None]
        put(kind == SPOT, d_p, dist_p, pmf, val_s, True)

    if kinds is None or DIRECTIONAL in kinds or COLLIMATED in kinds:
        # ---- directional ----
        d_dir = -take_fused(e, pack.em_dir)[0]
        val_d = rgb / jnp.maximum(pmf, 1e-12)[..., None]
        put(
            kind == DIRECTIONAL,
            jnp.broadcast_to(d_dir, (r, 3)),
            jnp.full((r,), ENV_DIST),
            pmf,
            val_d,
            True,
        )

    if kinds is None or CONSTANT in kinds:
        # ---- constant env ----
        d_c = warp.square_to_uniform_sphere(u2)
        pdf_c = pmf * INV_FOURPI
        val_c = rgb / jnp.maximum(pdf_c, 1e-12)[..., None]
        put(
            kind == CONSTANT, d_c, jnp.full((r,), ENV_DIST), pdf_c, val_c,
            False,
        )

    # ---- envmap ----
    if pack.has_envmap:
        d_e, pdf_e = _sample_env_dir(pack, u2)
        le = _env_bilinear(pack, _env_uv_from_dir(pack, d_e))
        pdf_e = pmf * pdf_e
        val_e = jnp.where(
            (pdf_e > 1e-12)[..., None],
            le / jnp.maximum(pdf_e, 1e-12)[..., None],
            0.0,
        )
        put(
            kind == ENVMAP, d_e, jnp.full((r,), ENV_DIST), pdf_e, val_e, False
        )

    return DirectSample(
        d=d, dist=dist, pdf=pdf, value=value, delta=delta, n=n_l, kind=kind
    )


def pdf_direct_area(pack, emit_id, dist, cos_l):
    """Solid-angle pdf of sample_direct having produced this area-light
    hit (for MIS on BSDF-sampled rays; reference scene.cpp pdfEmitterDirect)."""
    e = jnp.maximum(emit_id, 0)
    pmf, area = take_fused(e, pack.emitter_pmf, pack.em_area)
    pdf = pmf * (dist * dist) / jnp.maximum(cos_l * area, 1e-12)
    return jnp.where((emit_id >= 0) & (cos_l > 1e-6), pdf, 0.0)


def pdf_direct_env(pack, d):
    if not pack.has_env:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    pmf = pack.emitter_pmf[pack.env_idx]
    return pmf * _env_pdf_dir(pack, d)
