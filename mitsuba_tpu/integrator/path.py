"""Wavefront MIS path tracer.

Rebuild of MIPathTracer::Li (reference:
src/integrators/path/path.cpp:119-300) as a fixed-shape wavefront loop:
the per-ray recursion becomes a `lax.while_loop` over the whole SoA lane
batch — one closest-hit trace + one NEE shadow trace per bounce, power-
heuristic MIS between emitter and BSDF sampling, eta-scaled Russian
roulette after `rrDepth` (path.cpp:276-285).  The loop exits as soon as
every lane has terminated, so deep maxDepth costs nothing once paths die.

Also hosts the shared-machinery integrators: direct (MIDirect), ao,
field/AOV — all are one-bounce specializations of the same kernel.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.core import rng
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)

SHADOW_EPS = 1e-3
MAX_BOUNCES_CAP = 64  # hard cap when maxDepth = -1 (infinite)

# RNG decision slots per bounce (keep stable for reproducibility)
_SLOTS_PER_BOUNCE = 4
_SLOT_NEE = 1
_SLOT_BSDF = 2
_SLOT_RR = 3


def mi_weight(pdf_a, pdf_b):
    """Power heuristic, beta = 2 (reference path.cpp:296-300)."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    return jnp.where(
        pdf_a + pdf_b > 0, pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-30), 0.0
    )


def _offset_ray(p, n, d):
    """Offset a spawn point along the geometric normal to dodge
    self-intersection (cheap version of ray epsilons; RAY_EPS in the
    t-range does the rest)."""
    s = mm.sign(mm.dot(n, d))[..., None]
    return p + n * s * 1e-4


def shutter_time(pack, lane, sample_idx, seed=0):
    """Per-lane shutter time in [0,1] for animated scenes, or None.
    (= Sensor::sampleTime, reference sensor.h:275-281; the uniform
    comes from the camera stream so regen lanes stay deterministic.)"""
    if not pack.meta.get("anim_ranges", ()) and not pack.meta.get(
        "deform_ranges", ()
    ):
        return None
    u = rng.rand4(
        lane, sample_idx, 911, rng.stream_seed(seed, rng.STREAM_CAMERA)
    )[..., 0]
    return u


def path_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    """Trace a batch of camera rays to completion.

    pack: ScenePack; integ: IntegratorRecord; o, d: [R, 3];
    lane/sample_idx: int arrays for the counter RNG; sampler: SamplerRecord.
    Returns L [R, 3].
    """
    r = o.shape[0]
    time = shutter_time(pack, lane, sample_idx, seed)
    present = pack.present_types
    max_depth = integ.max_depth if integ.max_depth > 0 else MAX_BOUNCES_CAP
    rr_depth = max(integ.rr_depth, 1)

    def u4(depth, slot):
        dslot = depth * _SLOTS_PER_BOUNCE + slot
        base = rng.rand4(lane, sample_idx, dslot, seed)
        from mitsuba_tpu.sampler.plugins import ld_decision4

        return ld_decision4(sampler, lane, sample_idx, dslot, base, seed)

    state = dict(
        L=jnp.zeros((r, 3), jnp.float32),
        thr=jnp.ones((r, 3), jnp.float32),
        eta=jnp.ones((r,), jnp.float32),
        o=o,
        d=d,
        active=jnp.ones((r,), bool),
        prev_pdf=jnp.ones((r,), jnp.float32),
        prev_delta=jnp.ones((r,), bool),  # depth-0 hits count fully
        depth=jnp.int32(0),
        n_rays=jnp.float32(0.0),  # traced rays (closest-hit + shadow)
    )

    def cond(s):
        return (s["depth"] < max_depth) & jnp.any(s["active"])

    def body(s):
        depth = s["depth"]
        o, d = s["o"], s["d"]
        active = s["active"]
        thr, L = s["thr"], s["L"]
        n_rays = s["n_rays"] + jnp.sum(active.astype(jnp.float32))

        hit = intersect(pack, o, d, time=time)
        its = fill_interaction(pack, o, d, hit)
        found = its.valid & active

        # ---- escaped rays: environment radiance with MIS ----
        if pack.has_env:
            escape = active & ~its.valid
            env_l = em.eval_env(pack, d)
            w_env = jnp.where(
                s["prev_delta"],
                1.0,
                mi_weight(s["prev_pdf"], em.pdf_direct_env(pack, d)),
            )
            if integ.hide_emitters:
                w_env = jnp.where(depth == 0, 0.0, w_env)
            L = L + jnp.where(escape[..., None], thr * env_l * w_env[..., None], 0.0)

        # ---- direct emitter hit (area lights) with MIS ----
        # (reference path.cpp:148-150 and :255-263)
        if pack.has_area:
            cos_l = mm.dot(its.ns, its.wi_world)
            emissive = found & (its.emit >= 0) & (cos_l > 0)
            le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
            p_direct = em.pdf_direct_area(pack, its.emit, its.t, cos_l)
            w_hit = jnp.where(
                s["prev_delta"], 1.0, mi_weight(s["prev_pdf"], p_direct)
            )
            if integ.hide_emitters:
                w_hit = jnp.where(depth == 0, 0.0, w_hit)
            L = L + jnp.where(
                emissive[..., None], thr * le * w_hit[..., None], 0.0
            )

        active = found

        # ---- subsurface exitant radiance ----
        # (reference path.cpp:153-154 its.LoSub at every surface hit)
        if pack.meta.get("has_sss", False):
            from mitsuba_tpu.integrator.sss import single_scatter_lo, sss_lo

            sid = take_rows(pack.mat_sss, jnp.maximum(its.mat, 0))
            s_kind = take_rows(pack.sss_kind, jnp.maximum(sid, 0))
            cos_o = mm.dot(its.ns, its.wi_world)
            is_sss = found & (sid >= 0) & (cos_o > 0)
            if pack.meta.get("sss_has_dipole", True):
                lo_sss = sss_lo(pack, its.p, cos_o, sid)
                L = L + jnp.where(
                    (is_sss & (s_kind == 0))[..., None], thr * lo_sss, 0.0
                )
            if pack.meta.get("sss_has_single", False):
                lo_ss = single_scatter_lo(
                    pack, its.p, d, its.ng,
                    jnp.where(is_sss & (s_kind == 1), sid, -1),
                    lane, sample_idx, depth, seed,
                )
                L = L + jnp.where(
                    (is_sss & (s_kind == 1))[..., None], thr * lo_ss, 0.0
                )

        # ---- local frame + shading params ----
        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its), its=its)

        # strict normals: reject rays that hit shading/geo-inconsistent
        # configurations (reference path.cpp:165-172)
        if integ.strict_normals:
            wi_g = mm.dot(its.wi_world, its.ng)
            active = active & (wi_g * mm.cos_theta(wi_l) > 0)

        # ---- next-event estimation ----
        # (reference path.cpp:176-198 / scene.cpp:828-841)
        u_rr = None  # 4th NEE component doubles as the RR draw
        if pack.meta["n_emitters"] > 0:
            n_rays = n_rays + jnp.sum(active.astype(jnp.float32))
            u_n = u4(depth, _SLOT_NEE)
            u_rr = u_n[..., 3]
            ds = em.sample_direct(pack, its.p, u_n[..., :3])
            wo_l = frame.to_local(ds.d)
            f = bsdf_eval(sp, wi_l, wo_l, present)
            contributes = active & (jnp.max(ds.value, axis=-1) > 0) & (
                jnp.max(f, axis=-1) > 0
            )
            # NEE creates a (depth+2)-edge path; the reference only
            # samples it while depth < maxDepth (path.cpp:157 break
            # before direct sampling)
            contributes = contributes & (depth + 2 <= max_depth)
            o_sh = _offset_ray(its.p, its.ng, ds.d)
            shadow_t = jnp.where(
                ds.dist >= em.ENV_DIST, 1e7, ds.dist * (1.0 - SHADOW_EPS)
            )
            occ = occluded(pack, o_sh, ds.d, shadow_t, time=time)
            b_pdf = jnp.where(
                ds.delta, 0.0, bsdf_pdf(sp, wi_l, wo_l, present)
            )
            w_nee = jnp.where(ds.delta, 1.0, mi_weight(ds.pdf, b_pdf))
            L = L + jnp.where(
                (contributes & ~occ)[..., None],
                thr * ds.value * f * w_nee[..., None],
                0.0,
            )

        # ---- BSDF sampling (reference path.cpp:209-253) ----
        u_b = u4(depth, _SLOT_BSDF)
        bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
        thr = thr * jnp.where(active[..., None], bs.weight, 1.0)
        eta = s["eta"] * jnp.where(active, bs.eta, 1.0)
        d_new = frame.to_world(bs.wo)
        if integ.strict_normals:
            wo_g = mm.dot(d_new, its.ng)
            active = active & (wo_g * mm.cos_theta(bs.wo) > 0)
        o_new = _offset_ray(its.p, its.ng, d_new)

        active = active & (jnp.max(thr, axis=-1) > 0)

        # ---- Russian roulette (reference path.cpp:276-285) ----
        u_r = u_rr if u_rr is not None else u4(depth, _SLOT_RR)[..., 0]
        q = jnp.minimum(jnp.max(thr, axis=-1) * eta * eta, 0.95)
        do_rr = depth + 1 >= rr_depth
        keep = jnp.where(do_rr, u_r < q, True)
        thr = jnp.where(
            (do_rr & keep)[..., None], thr / jnp.maximum(q, 1e-6)[..., None], thr
        )
        active = active & keep

        # a null (index-matched) crossing is not a scattering event:
        # carry the previous MIS state through it
        from mitsuba_tpu.bsdf.plugins import NULL_BSDF as _NULL

        is_null = sp["type"] == _NULL
        new_pdf = jnp.where(is_null, s["prev_pdf"], bs.pdf)
        new_delta = jnp.where(is_null, s["prev_delta"], bs.delta)
        return dict(
            L=L,
            thr=thr,
            eta=eta,
            o=jnp.where(active[..., None], o_new, s["o"]),
            d=jnp.where(active[..., None], d_new, s["d"]),
            active=active,
            prev_pdf=jnp.where(active, new_pdf, s["prev_pdf"]),
            prev_delta=jnp.where(active, new_delta, s["prev_delta"]),
            depth=depth + 1,
            n_rays=n_rays,
        )

    out = jax.lax.while_loop(cond, body, state)
    path_trace.last_ray_count = out["n_rays"]
    return out["L"]


def path_trace_regen(
    pack, integ, make_ray, n_lanes, spp, lane, sampler, seed=0,
    sidx_offset=0,
):
    """Persistent-wavefront path tracing with SAME-PIXEL regeneration.

    Lane i owns pixel i.  Whenever its path terminates, the lane
    immediately starts the pixel's next sample (camera ray from
    `make_ray(lane, sample_idx)`), so occupancy stays ~100% instead of
    idling while the deepest path in the batch finishes — this replaces
    the reference's block-queue work stealing (renderproc.cpp) at the
    SIMD-lane level.  Returns (L_sum [n,3], n_samples_done [n], n_rays).
    """
    r = n_lanes
    present = pack.present_types
    max_depth = integ.max_depth if integ.max_depth > 0 else MAX_BOUNCES_CAP
    rr_depth = max(integ.rr_depth, 1)
    # generous upper bound; the `cond` below exits long before this
    max_iters = spp * max_depth + max_depth + 4

    state = dict(
        L_acc=jnp.zeros((r, 3), jnp.float32),
        L=jnp.zeros((r, 3), jnp.float32),
        thr=jnp.ones((r, 3), jnp.float32),
        eta=jnp.ones((r,), jnp.float32),
        o=jnp.zeros((r, 3), jnp.float32),
        d=jnp.zeros((r, 3), jnp.float32),
        active=jnp.zeros((r,), bool),
        prev_pdf=jnp.ones((r,), jnp.float32),
        prev_delta=jnp.ones((r,), bool),
        depth=jnp.zeros((r,), jnp.int32),
        sample_i=jnp.zeros((r,), jnp.int32),  # samples STARTED
        it=jnp.int32(0),
        n_rays=jnp.float32(0.0),
    )

    def cond(s):
        has_work = s["active"] | (s["sample_i"] < spp)
        return jnp.any(has_work) & (s["it"] < max_iters)

    # The bounce body is built by a factory so the TAIL-COMPACTION
    # phase below can re-instantiate it over a gathered lane subset.
    def mk_body(lane_v, ray_fn, sidx_off_v):
        def u4(sample_idx, depth, slot):
            dslot = depth * _SLOTS_PER_BOUNCE + slot
            base = rng.rand4(lane_v, sample_idx, dslot, seed)
            from mitsuba_tpu.sampler.plugins import ld_decision4

            return ld_decision4(
                sampler, lane_v, sample_idx, dslot, base, seed
            )

        return _mk_regen_body(u4, ray_fn, sidx_off_v, lane_v)

    def _mk_regen_body(u4, ray_fn, sidx_off_v, lane_v):
        return lambda s: body_impl(s, u4, ray_fn, sidx_off_v, lane_v)

    def body_impl(s, u4, ray_fn, sidx_off_v, lane_v):
        active = s["active"]
        L_acc, L, thr = s["L_acc"], s["L"], s["thr"]
        sample_i = s["sample_i"]

        # ---- regeneration: finished lanes start their next sample ----
        regen = ~active & (sample_i < spp)
        L_acc = L_acc + jnp.where(regen[..., None], L, 0.0)
        L = jnp.where(regen[..., None], 0.0, L)
        o_new, d_new = ray_fn(sample_i)
        o = jnp.where(regen[..., None], o_new, s["o"])
        d = jnp.where(regen[..., None], d_new, s["d"])
        thr = jnp.where(regen[..., None], 1.0, thr)
        eta = jnp.where(regen, 1.0, s["eta"])
        depth = jnp.where(regen, 0, s["depth"])
        prev_pdf = jnp.where(regen, 1.0, s["prev_pdf"])
        prev_delta = jnp.where(regen, True, s["prev_delta"])
        sample_i = sample_i + regen.astype(jnp.int32)
        active = active | regen
        # GLOBAL sample index — must include the pass/device offset or
        # successive passes would reuse the same decision randomness
        sidx = sidx_off_v + jnp.maximum(sample_i - 1, 0).astype(
            jnp.uint32
        )
        time = shutter_time(pack, lane_v, sidx, seed)

        n_rays = s["n_rays"] + jnp.sum(active.astype(jnp.float32))

        # ---- one bounce (same physics as path_trace's body) ----
        hit = intersect(pack, o, d, time=time)
        its = fill_interaction(pack, o, d, hit)
        found = its.valid & active

        if pack.has_env:
            escape = active & ~its.valid
            env_l = em.eval_env(pack, d)
            w_env = jnp.where(
                prev_delta,
                1.0,
                mi_weight(prev_pdf, em.pdf_direct_env(pack, d)),
            )
            if integ.hide_emitters:
                w_env = jnp.where(depth == 0, 0.0, w_env)
            L = L + jnp.where(
                escape[..., None], thr * env_l * w_env[..., None], 0.0
            )

        if pack.has_area:
            cos_l = mm.dot(its.ns, its.wi_world)
            emissive = found & (its.emit >= 0) & (cos_l > 0)
            le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
            p_direct = em.pdf_direct_area(pack, its.emit, its.t, cos_l)
            w_hit = jnp.where(
                prev_delta, 1.0, mi_weight(prev_pdf, p_direct)
            )
            if integ.hide_emitters:
                w_hit = jnp.where(depth == 0, 0.0, w_hit)
            L = L + jnp.where(
                emissive[..., None], thr * le * w_hit[..., None], 0.0
            )

        active = found

        # subsurface hit radiance (see path_trace)
        if pack.meta.get("has_sss", False):
            from mitsuba_tpu.integrator.sss import single_scatter_lo, sss_lo

            sid = take_rows(pack.mat_sss, jnp.maximum(its.mat, 0))
            s_kind = take_rows(pack.sss_kind, jnp.maximum(sid, 0))
            cos_o = mm.dot(its.ns, its.wi_world)
            is_sss = found & (sid >= 0) & (cos_o > 0)
            if pack.meta.get("sss_has_dipole", True):
                lo_sss = sss_lo(pack, its.p, cos_o, sid)
                L = L + jnp.where(
                    (is_sss & (s_kind == 0))[..., None], thr * lo_sss, 0.0
                )
            if pack.meta.get("sss_has_single", False):
                lo_ss = single_scatter_lo(
                    pack, its.p, -its.wi_world, its.ng,
                    jnp.where(is_sss & (s_kind == 1), sid, -1),
                    lane_v, sidx, depth, seed,
                )
                L = L + jnp.where(
                    (is_sss & (s_kind == 1))[..., None], thr * lo_ss, 0.0
                )

        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its), its=its)
        if integ.strict_normals:
            wi_g = mm.dot(its.wi_world, its.ng)
            active = active & (wi_g * mm.cos_theta(wi_l) > 0)

        u_rr = None  # 4th NEE component doubles as the RR draw
        if pack.meta["n_emitters"] > 0:
            n_rays = n_rays + jnp.sum(active.astype(jnp.float32))
            u_n = u4(sidx, depth, _SLOT_NEE)
            u_rr = u_n[..., 3]
            ds = em.sample_direct(pack, its.p, u_n[..., :3])
            wo_l = frame.to_local(ds.d)
            f = bsdf_eval(sp, wi_l, wo_l, present)
            o_sh = _offset_ray(its.p, its.ng, ds.d)
            shadow_t = jnp.where(
                ds.dist >= em.ENV_DIST, 1e7, ds.dist * (1.0 - SHADOW_EPS)
            )
            occ = occluded(pack, o_sh, ds.d, shadow_t, time=time)
            b_pdf = jnp.where(
                ds.delta, 0.0, bsdf_pdf(sp, wi_l, wo_l, present)
            )
            w_nee = jnp.where(ds.delta, 1.0, mi_weight(ds.pdf, b_pdf))
            # reference maxDepth gate (see path_trace)
            contributes = active & ~occ & (depth + 2 <= max_depth)
            L = L + jnp.where(
                contributes[..., None],
                thr * ds.value * f * w_nee[..., None],
                0.0,
            )

        u_b = u4(sidx, depth, _SLOT_BSDF)
        bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
        thr = thr * jnp.where(active[..., None], bs.weight, 1.0)
        eta = eta * jnp.where(active, bs.eta, 1.0)
        d_bounce = frame.to_world(bs.wo)
        if integ.strict_normals:
            wo_g = mm.dot(d_bounce, its.ng)
            active = active & (wo_g * mm.cos_theta(bs.wo) > 0)
        o_bounce = _offset_ray(its.p, its.ng, d_bounce)
        active = active & (jnp.max(thr, axis=-1) > 0)

        depth = depth + 1
        active = active & (depth < max_depth)

        u_r = u_rr if u_rr is not None else u4(sidx, depth, _SLOT_RR)[..., 0]
        q = jnp.minimum(jnp.max(thr, axis=-1) * eta * eta, 0.95)
        do_rr = depth >= rr_depth
        keep = jnp.where(do_rr, u_r < q, True)
        thr = jnp.where(
            (do_rr & keep)[..., None],
            thr / jnp.maximum(q, 1e-6)[..., None],
            thr,
        )
        active = active & keep

        from mitsuba_tpu.bsdf.plugins import NULL_BSDF as _NULL

        is_null = sp["type"] == _NULL
        new_pdf = jnp.where(is_null, prev_pdf, bs.pdf)
        new_delta = jnp.where(is_null, prev_delta, bs.delta)
        return dict(
            L_acc=L_acc,
            L=L,
            thr=thr,
            eta=eta,
            o=jnp.where(active[..., None], o_bounce, o),
            d=jnp.where(active[..., None], d_bounce, d),
            active=active,
            prev_pdf=jnp.where(active, new_pdf, prev_pdf),
            prev_delta=jnp.where(active, new_delta, prev_delta),
            depth=depth,
            sample_i=sample_i,
            it=s["it"] + 1,
            n_rays=n_rays,
        )

    body = mk_body(
        lane,
        lambda si: make_ray(si),
        jnp.broadcast_to(jnp.asarray(sidx_offset, jnp.uint32), (r,)),
    )

    # ---- tail compaction ----
    # Same-pixel regeneration makes a lane's total work the sum of ITS
    # pixel's path lengths, so deep-path pixels straggle: measured cbox
    # occupancy is ~32% because most iterations run for a shrinking
    # minority of lanes.  Remedy: once the fraction of lanes with work
    # drops below 1/TAIL_DIV, gather the survivors into an r/TAIL_DIV
    # batch and finish them there — identical per-lane state and RNG
    # keys, so the output is bit-identical; iterations just stop paying
    # for finished lanes.  (The reference never has this problem —
    # its block queue retires threads; this is the wavefront analogue.)
    tail_div = int(os.environ.get("MTS_TPU_TAIL_DIV", "8"))
    tail_min = int(os.environ.get("MTS_TPU_TAIL_MIN", "4096"))
    levels = []
    c = r
    while tail_div > 1 and c % tail_div == 0 and c // tail_div >= tail_min:
        c = c // tail_div
        levels.append(c)
        if len(levels) >= 2:
            break

    def frac_cond(thresh):
        def cond_t(s):
            has_work = s["active"] | (s["sample_i"] < spp)
            return (
                jnp.any(has_work)
                & (s["it"] < max_iters)
                & (jnp.mean(has_work.astype(jnp.float32)) > thresh)
            )

        return cond_t

    if not levels:
        out = jax.lax.while_loop(cond, body, state)
        path_trace_regen.last_iters = out["it"]
        L_acc = out["L_acc"] + out["L"]
        return L_acc, out["sample_i"], out["n_rays"]

    sidx_off_full = jnp.broadcast_to(
        jnp.asarray(sidx_offset, jnp.uint32), (r,)
    )
    out = jax.lax.while_loop(frac_cond(levels[0] / r), body, state)
    L_acc_full = out["L_acc"] + out["L"]
    sample_full = out["sample_i"]
    sel_chain = None  # composed selection into the FULL lane array
    for li, c in enumerate(levels):
        has_work = out["active"] | (out["sample_i"] < spp)
        sel = jnp.argsort(~has_work)[:c]  # stable: workers first
        sel_full = sel if sel_chain is None else sel_chain[sel]
        out = {
            k: (
                v[sel]
                if hasattr(v, "ndim") and v.ndim >= 1
                else v
            )
            for k, v in out.items()
        }
        body_c = mk_body(
            lane[sel_full],
            lambda si, s=sel_full: make_ray(si, s),
            sidx_off_full[sel_full],
        )
        last = li == len(levels) - 1
        nxt = (levels[li + 1] / c) if not last else 0.0
        out = jax.lax.while_loop(
            cond if last else frac_cond(nxt), body_c, out
        )
        L_acc_full = L_acc_full.at[sel_full].set(out["L_acc"] + out["L"])
        sample_full = sample_full.at[sel_full].set(out["sample_i"])
        sel_chain = sel_full
    path_trace_regen.last_iters = out["it"]
    return L_acc_full, sample_full, out["n_rays"]


def direct_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    """MIDirect: emitter + BSDF sampling of direct illumination only
    (reference src/integrators/direct/direct.cpp)."""
    one_bounce = type(integ)(**{**integ.__dict__, "max_depth": 2, "rr_depth": 100})
    return path_trace(pack, one_bounce, o, d, lane, sample_idx, sampler, seed)


def ao_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    """Ambient occlusion (reference src/integrators/direct/ao.cpp)."""
    hit = intersect(pack, o, d)
    its = fill_interaction(pack, o, d, hit)
    frame = shading_frame(pack, its)
    u = rng.rand4(lane, sample_idx, 1, seed)
    from mitsuba_tpu.core import warp

    wo_l = warp.square_to_cosine_hemisphere(u[..., :2])
    wo = frame.to_world(wo_l)
    length = (
        integ.ray_length
        if integ.ray_length > 0
        else 1e7  # reference: bsphere-derived default
    )
    o_sh = _offset_ray(its.p, its.ng, wo)
    occ = occluded(pack, o_sh, wo, jnp.full(o.shape[0], length))
    vis = jnp.where(its.valid & ~occ, 1.0, 0.0)
    vis = jnp.where(its.valid, vis, 0.0)
    return jnp.repeat(vis[..., None], 3, axis=-1)


def field_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    """AOV extraction (reference src/integrators/misc/field.cpp)."""
    hit = intersect(pack, o, d)
    its = fill_interaction(pack, o, d, hit)
    name = integ.field_name
    if name == "position":
        v = its.p
    elif name == "relPosition":
        v = its.p - o
    elif name == "distance":
        v = jnp.repeat(its.t[..., None], 3, -1)
    elif name in ("geoNormal",):
        v = its.ng
    elif name in ("shNormal", "normal"):
        v = its.ns
    elif name == "uv":
        v = jnp.concatenate(
            [its.uv, jnp.zeros(its.uv.shape[:-1] + (1,))], axis=-1
        )
    elif name == "albedo":
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its), its=its)
        v = sp["cA"]
    elif name == "primIndex":
        v = jnp.repeat(its.prim[..., None].astype(jnp.float32), 3, -1)
    elif name == "emission":
        le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
        v = jnp.where((its.emit >= 0)[..., None], le, 0.0)
    else:
        raise ValueError(f"field: unknown field '{name}'")
    return jnp.where(its.valid[..., None], v, 0.0)


def _motion_advance(pack, prim, p0, uu, vv, tri_hit, t_target):
    """Advance surface points to the target time through their shape's
    animation (rigid keyframe M1 affine or deformable keyframe lerp)."""
    p1 = p0
    for a, (first, count) in enumerate(pack.meta.get("anim_ranges", ())):
        in_r = tri_hit & (prim >= first) & (prim < first + count)
        m1 = pack.anim_m1[a]
        L1 = m1[:9].reshape(3, 3)
        b1 = m1[9:12]
        # M(t) = I + t (M1 - I)
        pt = p0 + t_target * ((p0 @ L1.T + b1[None]) - p0)
        p1 = jnp.where(in_r[..., None], pt, p1)

    for rr_, (first, count, times) in enumerate(
        pack.meta.get("deform_ranges", ())
    ):
        frames = pack.arrays[f"deform_tri9_{rr_}"]  # [K, T, 9]
        # bracket the target time (static python: times is a tuple)
        import bisect as _bisect

        seg = max(
            0, min(
                _bisect.bisect_right(times, t_target) - 1,
                len(times) - 2,
            )
        )
        w = (t_target - times[seg]) / max(
            times[seg + 1] - times[seg], 1e-9
        )
        row = jnp.clip(prim - first, 0, count - 1)
        tri = frames[seg][row] + w * (
            frames[seg + 1][row] - frames[seg][row]
        )
        pt = (
            tri[..., 0:3]
            + uu[..., None] * tri[..., 3:6]
            + vv[..., None] * tri[..., 6:9]
        )
        in_r = tri_hit & (prim >= first) & (prim < first + count)
        p1 = jnp.where(in_r[..., None], pt, p1)
    return p1


def motion_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    """Screen-space motion vectors (reference
    src/integrators/misc/motion.cpp).  config "d": the primary hit
    advances to the target time through its shape's animation and both
    positions project through the camera.  Specular chain configs
    ("rd", "ttd", ...) trace the configured reflect/refract chain at
    time 0, advance the END vertex to the target time, and re-solve
    the chain against the moved endpoint at the target time with the
    batched Newton manifold walk (integrator/manifold.py) — the
    vectorized stand-in for the reference's DScalar time-stepping
    (motion.cpp:137,215-258).  Channels = (dx_pixels, dy_pixels,
    depth_delta)."""
    t_target = float(getattr(integ, "motion_time", 1.0))
    config = (getattr(integ, "motion_config", "d") or "d").lower()
    r = o.shape[0]
    time0 = jnp.zeros((r,), jnp.float32)
    hit = intersect(pack, o, d, time=time0)
    its = fill_interaction(pack, o, d, hit)

    if len(config) == 1:
        p0 = its.p
        prim = its.prim
        tri_hit = its.valid & ~hit.is_sphere & (
            ~hit.is_cyl if hit.is_cyl is not None else True)
        p1 = _motion_advance(
            pack, prim, p0, hit.u, hit.v, tri_hit, t_target
        )
        ok = its.valid
    else:
        # ---- specular chain: trace config at t=0 ----
        from mitsuba_tpu.bsdf.plugins import (
            CONDUCTOR, DIELECTRIC, THINDIELECTRIC,
        )
        from mitsuba_tpu.integrator import manifold as mf

        sig = tuple(
            mf.REFLECT if ch == "r" else mf.REFRACT
            for ch in config[:-1]
        )
        o_cur, d_cur = o, d
        ok = jnp.ones((r,), bool)
        p0 = jnp.zeros((r, 3), jnp.float32)
        p_end = n_end = None
        prim_end = u_end = v_end = tri_end = None
        for i, ch in enumerate(config):
            h = hit if i == 0 else intersect(pack, o_cur, d_cur,
                                             time=time0)
            it2 = its if i == 0 else fill_interaction(
                pack, o_cur, d_cur, h
            )
            ok = ok & it2.valid
            if i == 0:
                p0 = it2.p
            mat_t = take_rows(pack.mat_type, jnp.maximum(it2.mat, 0))
            if ch == "d":
                p_end, n_end = it2.p, it2.ns
                prim_end, u_end, v_end = it2.prim, h.u, h.v
                tri_end = it2.valid & ~h.is_sphere & (
                    ~h.is_cyl if h.is_cyl is not None else True)
            elif ch == "r":
                ok = ok & (
                    (mat_t == CONDUCTOR) | (mat_t == DIELECTRIC)
                    | (mat_t == THINDIELECTRIC)
                )
                n = it2.ns
                d_cur = mm.normalize(
                    d_cur - 2.0 * mm.dot(d_cur, n)[..., None] * n
                )
                o_cur = _offset_ray(it2.p, it2.ng, d_cur)
            else:  # 't'
                ok = ok & (mat_t == DIELECTRIC)
                eta_rel = take_rows(
                    pack.mat_eta, jnp.maximum(it2.mat, 0)
                )
                d_cur, tir = mf._refract_world(d_cur, it2.ns, eta_rel)
                ok = ok & ~tir
                o_cur = _offset_ray(it2.p, it2.ng, d_cur)

        # ---- move the end vertex, re-solve the chain at t_target ----
        p_end1 = _motion_advance(
            pack, prim_end, p_end, u_end, v_end, tri_end, t_target
        )
        t1 = jnp.full((r,), t_target, jnp.float32)
        d_sol, err, ok_w = mf.manifold_walk(
            pack, o, d, sig, p_end1, n_end, iters=10, time=t1
        )
        h1 = intersect(pack, o, d_sol, time=t1)
        it1 = fill_interaction(pack, o, d_sol, h1)
        scale = jnp.linalg.norm(p_end - o, axis=-1) + 1.0
        ok = ok & ok_w & it1.valid & (err < 1e-3 * scale)
        p1 = it1.p

    w2c = pack.cam_w2c
    th = pack.meta.get("cam_tan_half", 0.0) or 1.0
    fw, fh = pack.meta.get("cam_film", (1, 1))
    aspect = fw / max(fh, 1)

    from mitsuba_tpu.sensor.plugins import ORTHOGRAPHIC, TELECENTRIC

    ortho = pack.meta.get("cam_kind", 0) in (ORTHOGRAPHIC, TELECENTRIC)

    def project(p):
        v = p @ w2c[:3, :3].T + w2c[:3, 3]
        if ortho:
            # extent [-1,1] x aspect (sensor/plugins.py ORTHOGRAPHIC)
            sx = 0.5 * (1.0 - v[..., 0])
            sy = 0.5 * (1.0 - v[..., 1] * aspect)
        else:
            z = jnp.maximum(v[..., 2], 1e-6)
            sx = 0.5 * (1.0 - v[..., 0] / z / th)
            sy = 0.5 * (1.0 - v[..., 1] * aspect / z / th)
        return sx, sy

    sx0, sy0 = project(p0)
    sx1, sy1 = project(p1)
    out = jnp.stack(
        [(sx1 - sx0) * fw, (sy1 - sy0) * fh, jnp.zeros_like(sx0)],
        axis=-1,
    )
    return jnp.where(its.valid[..., None], out, 0.0)


TRACE_FNS = {
    "path": path_trace,
    "volpath": None,  # filled by integrator/volpath.py on import
    "direct": direct_trace,
    "ao": ao_trace,
    "field": field_trace,
    "motion": motion_trace,
    # bdpt/pssmlt/mlt/erpt/ptracer/sppm/ppm/photonmapper/vpl have real
    # single-chip implementations (integrator/{bdpt,pssmlt,mlt,ptracer,
    # sppm,vpl}.py) AND real sharded dispatch (parallel/mesh.py
    # render_sharded) — no path-fallback rows remain
}
