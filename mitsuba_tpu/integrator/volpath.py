"""Volumetric wavefront path tracer.

Rebuild of reference src/integrators/path/volpath.cpp:76-382 as a
fixed-shape wavefront loop: each iteration is one transport EVENT —
either a medium scattering event (homogeneous closed-form distance
sampling or Woodcock delta tracking, volpath.cpp:104) or a surface
event (the `path` logic).  Per-lane state additionally tracks the
current medium id; crossing a transmissive surface with an attached
interior/exterior medium swaps it (index-matched `null` boundaries
pass straight through, volpath.cpp:292-382).

NEE from medium and surface vertices is attenuated by medium
transmittance along the shadow segment (= sampleAttenuatedEmitterDirect,
reference scene.h:558); the shadow ray passes through null boundaries
(up to a fixed number of segments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.bsdf.plugins import NULL_BSDF
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.core import rng
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.medium import eval as med_eval
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)

SHADOW_EPS = 1e-3
MAX_EVENTS_FACTOR = 3  # events can exceed maxDepth (null crossings)
SHADOW_SEGMENTS = 3  # null boundaries a shadow ray may cross

_SLOTS_PER_BOUNCE = 8
_SLOT_DIST = 0
_SLOT_NEE = 1
_SLOT_BSDF = 2
_SLOT_RR = 3
_SLOT_PHASE = 4
_SLOT_TRANS = 5


def _attenuated_visibility(pack, p, d, dist, med, lane, sidx, slot, seed):
    """Visibility * transmittance along a shadow segment, passing through
    `null`-BSDF boundaries and accumulating per-medium transmittance.

    Truncation: at most SHADOW_SEGMENTS null boundaries are crossed; a
    lane still marching after the last iteration keeps the transmittance
    accumulated so far and treats the remainder as transparent (a small
    brightening bias on >SHADOW_SEGMENTS nested interfaces, preferred
    over silently zeroing such NEE contributions — ADVICE r1)."""
    r = p.shape[0]
    tr = jnp.ones((r, 3), jnp.float32)
    o = p
    remaining = dist
    cur_med = med
    marching = jnp.ones((r,), bool)  # still advancing toward the light
    for k in range(SHADOW_SEGMENTS):
        hit = intersect(pack, o, d, remaining * (1.0 - SHADOW_EPS))
        seg_len = jnp.where(hit.valid, hit.t, remaining)
        seg_tr = med_eval.transmittance(
            pack, cur_med, o, d, seg_len, lane, sidx, slot * 8 + k, seed
        )
        tr = jnp.where(marching[..., None], tr * seg_tr, tr)

        its = fill_interaction(pack, o, d, hit)
        is_null = (
            take_rows(pack.mat_type, jnp.maximum(its.mat, 0)) == NULL_BSDF
        )
        blocked = marching & hit.valid & ~is_null
        tr = jnp.where(blocked[..., None], 0.0, tr)

        passing = marching & hit.valid & is_null & ~blocked
        entering = mm.dot(d, its.ng) < 0
        cur_med = jnp.where(
            passing,
            jnp.where(entering, its.med_in, its.med_ex),
            cur_med,
        )
        o = jnp.where(passing[..., None], its.p + d * 1e-4, o)
        remaining = jnp.where(passing, remaining - seg_len, remaining)
        # unobstructed lanes (no hit) are RESOLVED — tr stands
        marching = passing & (remaining > 1e-5)
    return tr


def volpath_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    if not pack.meta.get("has_media", False):
        return _path.path_trace(
            pack, integ, o, d, lane, sample_idx, sampler, seed
        )

    r = o.shape[0]
    present = pack.present_types
    max_depth = (
        integ.max_depth if integ.max_depth > 0 else _path.MAX_BOUNCES_CAP
    )
    max_events = max_depth * MAX_EVENTS_FACTOR
    rr_depth = max(integ.rr_depth, 1)

    def u4(event, slot):
        return rng.rand4(
            lane, sample_idx, event * _SLOTS_PER_BOUNCE + slot, seed
        )

    state = dict(
        L=jnp.zeros((r, 3), jnp.float32),
        thr=jnp.ones((r, 3), jnp.float32),
        eta=jnp.ones((r,), jnp.float32),
        o=o,
        d=d,
        active=jnp.ones((r,), bool),
        prev_pdf=jnp.ones((r,), jnp.float32),
        prev_delta=jnp.ones((r,), bool),
        depth=jnp.zeros((r,), jnp.int32),  # per-lane scattering depth
        med=jnp.full((r,), pack.meta["camera_medium"], jnp.int32),
        event=jnp.int32(0),
        n_rays=jnp.float32(0.0),
    )

    def cond(s):
        return (s["event"] < max_events) & jnp.any(s["active"])

    def body(s):
        event = s["event"]
        o, d = s["o"], s["d"]
        active = s["active"]
        thr, L = s["thr"], s["L"]
        med = s["med"]
        depth = s["depth"]
        n_rays = s["n_rays"] + jnp.sum(active.astype(jnp.float32))

        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        t_surf = jnp.where(its.valid, its.t, 1e8)

        # ---- medium distance sampling (volpath.cpp:104) ----
        u_m = u4(event, _SLOT_DIST)
        ms = med_eval.sample_distance(
            pack, med, o, d, t_surf, u_m[..., :3], lane, sample_idx,
            event, seed,
        )
        thr = thr * jnp.where(active[..., None], ms.weight, 1.0)
        medium_evt = active & ms.is_medium
        surface_evt = active & ~ms.is_medium

        # ---- escaped rays (no surface, no medium event) ----
        if pack.has_env:
            escape = surface_evt & ~its.valid
            env_l = em.eval_env(pack, d)
            w_env = jnp.where(
                s["prev_delta"],
                1.0,
                _path.mi_weight(s["prev_pdf"], em.pdf_direct_env(pack, d)),
            )
            if integ.hide_emitters:
                w_env = jnp.where(depth == 0, 0.0, w_env)
            L = L + jnp.where(
                escape[..., None], thr * env_l * w_env[..., None], 0.0
            )

        # ---- emitter hit ----
        if pack.has_area:
            cos_l = mm.dot(its.ns, its.wi_world)
            emissive = surface_evt & its.valid & (its.emit >= 0) & (cos_l > 0)
            le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
            p_direct = em.pdf_direct_area(pack, its.emit, its.t, cos_l)
            w_hit = jnp.where(
                s["prev_delta"], 1.0, _path.mi_weight(s["prev_pdf"], p_direct)
            )
            if integ.hide_emitters:
                w_hit = jnp.where(depth == 0, 0.0, w_hit)
            L = L + jnp.where(
                emissive[..., None], thr * le * w_hit[..., None], 0.0
            )

        # ============ MEDIUM EVENT ============
        p_med = o + d * ms.t[..., None]
        # phase sampling
        u_p = u4(event, _SLOT_PHASE)
        d_phase, ph_pdf, ph_w = med_eval.phase_sample(
            pack, med, d, u_p[..., :2], p=p_med
        )

        # ============ SURFACE EVENT ============
        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its), its=its)

        # ============ SHARED NEE ============
        # one emitter sample + ONE attenuated shadow trace serves both
        # event kinds (per-lane select of origin / scattering function) —
        # halves the compiled volpath body vs. two separate NEE blocks
        if pack.meta["n_emitters"] > 0:
            nee_origin = jnp.where(
                medium_evt[..., None],
                p_med,
                _path._offset_ray(its.p, its.ng, its.wi_world),
            )
            u_n = u4(event, _SLOT_NEE)
            ds = em.sample_direct(pack, nee_origin, u_n[..., :3])
            # scattering toward the light
            ph = med_eval.phase_eval(pack, med, d, ds.d, p=p_med)
            wo_l = frame.to_local(ds.d)
            f_surf = bsdf_eval(sp, wi_l, wo_l, present)
            f = jnp.where(
                medium_evt[..., None],
                ph[..., None] * jnp.ones((1, 3)),
                f_surf,
            )
            nee_origin = jnp.where(
                medium_evt[..., None],
                nee_origin,
                _path._offset_ray(its.p, its.ng, ds.d),
            )
            med_sh = jnp.where(
                medium_evt,
                med,
                jnp.where(mm.dot(ds.d, its.ng) < 0, its.med_in, its.med_ex),
            )
            n_rays = n_rays + jnp.sum(
                (medium_evt | (surface_evt & its.valid)).astype(jnp.float32)
            )
            tr = _attenuated_visibility(
                pack, nee_origin, ds.d, ds.dist, med_sh, lane, sample_idx,
                event, seed,
            )
            ph_nee_pdf = med_eval.phase_pdf(pack, med, d, ds.d, p=p_med)
            other_pdf = jnp.where(
                medium_evt, ph_nee_pdf, bsdf_pdf(sp, wi_l, wo_l, present)
            )
            other_pdf = jnp.where(ds.delta, 0.0, other_pdf)
            w_nee = jnp.where(ds.delta, 1.0, _path.mi_weight(ds.pdf, other_pdf))
            contributes = (medium_evt | (surface_evt & its.valid)) & (
                depth + 2 <= max_depth  # reference maxDepth gate
            )
            L = L + jnp.where(
                contributes[..., None],
                thr * ds.value * tr * f * w_nee[..., None],
                0.0,
            )

        u_b = u4(event, _SLOT_BSDF)
        bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
        d_surf = frame.to_world(bs.wo)

        # medium transition on transmission (incl. null passthrough):
        # crossing to the inside if the new direction opposes ng
        crossing = mm.dot(d_surf, its.ng) < 0
        new_med_surf = jnp.where(crossing, its.med_in, its.med_ex)

        # ---- merge the two event kinds ----
        surf_ok = surface_evt & its.valid
        thr = thr * jnp.where(surf_ok[..., None], bs.weight, 1.0)
        # non-perfectly-sampled phases (kkay/microflake) carry a weight
        thr = thr * jnp.where(medium_evt, ph_w, 1.0)[..., None]
        eta = s["eta"] * jnp.where(surf_ok, bs.eta, 1.0)

        d_new = jnp.where(medium_evt[..., None], d_phase, d_surf)
        o_new = jnp.where(
            medium_evt[..., None],
            p_med,
            _path._offset_ray(its.p, its.ng, d_surf),
        )
        med_new = jnp.where(
            medium_evt, med, jnp.where(surf_ok, new_med_surf, med)
        )

        # null-BSDF crossings don't increment depth (volpath.cpp:292)
        # and — crucially — must NOT reset the MIS bookkeeping: the next
        # emitter hit is still weighted against the last REAL sampling
        # event's pdf (an index-matched boundary is not a scattering event)
        is_null_cross = surf_ok & (
            pack.mat_type[jnp.maximum(its.mat, 0)] == NULL_BSDF
        )
        prev_pdf = jnp.where(
            medium_evt,
            ph_pdf,
            jnp.where(is_null_cross, s["prev_pdf"], bs.pdf),
        )
        prev_delta = jnp.where(
            medium_evt,
            False,
            jnp.where(is_null_cross, s["prev_delta"], bs.delta),
        )
        inc = (medium_evt | (surf_ok & ~is_null_cross)).astype(jnp.int32)
        depth_new = depth + inc

        active = (medium_evt | surf_ok) & (jnp.max(thr, axis=-1) > 0)
        active = active & (depth_new < max_depth)

        # ---- Russian roulette ----
        u_r = u4(event, _SLOT_RR)[..., 0]
        q = jnp.minimum(jnp.max(thr, axis=-1) * eta * eta, 0.95)
        do_rr = depth_new >= rr_depth
        keep = jnp.where(do_rr, u_r < q, True)
        thr = jnp.where(
            (do_rr & keep)[..., None],
            thr / jnp.maximum(q, 1e-6)[..., None],
            thr,
        )
        active = active & keep

        return dict(
            L=L,
            thr=thr,
            eta=eta,
            o=jnp.where(active[..., None], o_new, s["o"]),
            d=jnp.where(active[..., None], d_new, s["d"]),
            active=active,
            prev_pdf=jnp.where(active, prev_pdf, s["prev_pdf"]),
            prev_delta=jnp.where(active, prev_delta, s["prev_delta"]),
            depth=depth_new,
            med=jnp.where(active, med_new, s["med"]),
            event=event + 1,
            n_rays=n_rays,
        )

    out = jax.lax.while_loop(cond, body, state)
    volpath_trace.last_ray_count = out["n_rays"]
    return out["L"]


_path.TRACE_FNS["volpath"] = volpath_trace
