"""Bidirectional path tracer (wavefront, fixed-max-depth SoA subpaths).

Rebuild of reference src/integrators/bdpt/{bdpt.cpp:133,
bdpt_proc.cpp:140-268} + the libbidir path machinery
(include/mitsuba/bidir/vertex.h:272 sampleNext, path.cpp randomWalk,
pathsampler.cpp MIS): instead of per-path vertex pools, both subpaths
are UNROLLED walks over the whole lane batch — vertex k of every lane
lives in one SoA tensor set — and the (s,t) connection strategies are
enumerated statically, each one a vectorized connection + one shadow
trace over all lanes.  The light image (t=1 strategies) splats through
the same pinhole-importance kernel as the particle tracer.

MIS weights follow Veach's formulation via the standard forward/reverse
area-pdf ratio walk (the `ri` recurrence), with the per-strategy
junction-pdf overrides (what the reference computes with cached
vertex pdfs in both directions, vertex.h "pdf[EImportance/ERadiance]").

Scope (v1): surfaces only (no media), AREA emitters only — scenes with
other emitter kinds fall back to the path backend in renderer.render.
Subpath lengths are capped at MTS_BDPT_MAX_EDGES (default 8) edges;
path-space beyond the cap is truncated (documented, not silent: the
renderer warns when maxDepth exceeds the cap).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.emitter.plugins import AREA
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)

_SLOTS = 4  # RNG slots per walk step
_SLOT_BSDF = 2


def _remap0(x):
    """pdf ratios treat zero (delta transition) as 1 (Veach/pbrt remap)."""
    return jnp.where(x > 0, x, 1.0)


def _to_area(pdf_w, p_from, p_to, ns_to):
    """Solid-angle pdf at p_from toward p_to -> area pdf at p_to."""
    v = p_to - p_from
    d2 = jnp.maximum(mm.dot(v, v), 1e-12)
    w = v / jnp.sqrt(d2)[..., None]
    return pdf_w * jnp.abs(mm.dot(ns_to, w)) / d2


def supports_bdpt(pack):
    """v1 restriction: only area emitters, no media."""
    return (
        pack.meta["n_emitters"] > 0
        and pack.meta.get("all_area_emitters", False)
        and not pack.meta.get("has_media", False)
    )


# -----------------------------------------------------------------------------
# subpath random walks (the SoA analogue of Path::randomWalk, path.cpp)
# -----------------------------------------------------------------------------

def _walk(pack, o0, d0, beta0, pdf_w0, lane, sidx, seed, n_steps, present,
          delta0):
    """Unrolled random walk of up to n_steps surface vertices.

    o0/d0: start ray; beta0: throughput arriving along it; pdf_w0:
    solid-angle pdf of d0 at the origin.  Returns a python list of
    vertex dicts (length n_steps); vertex k has:
      valid, p, ns, ng, wi (unit, toward predecessor), sp (shading
      params dict), beta (throughput INTO the vertex), pdf_fwd (area),
      pdf_rev (area, from successor; 0 where unknown/delta), delta
      (transition sampled at this vertex was a Dirac lobe), emit.
    delta0: whether the generating distribution of d0 is delta in
    direction (unused for camera/light v1 but kept for parity).
    """
    r = o0.shape[0]
    verts = []
    o, d = o0, d0
    beta = beta0
    pdf_w = pdf_w0
    active = jnp.max(beta0, axis=-1) > 0
    prev_p = o0
    prev_delta_transition = delta0

    for k in range(n_steps):
        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        valid = active & its.valid

        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its))

        pdf_fwd = jnp.where(
            prev_delta_transition,
            0.0,
            _to_area(pdf_w, prev_p, its.p, its.ns),
        )

        u_b = rng.rand4(lane, sidx, k * _SLOTS + _SLOT_BSDF, seed)
        bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)

        v = dict(
            valid=valid,
            p=its.p,
            ns=its.ns,
            ng=its.ng,
            wi=its.wi_world,
            sp=sp,
            beta=beta,
            pdf_fwd=pdf_fwd,
            pdf_rev=jnp.zeros((r,), jnp.float32),
            delta=bs.delta,
            emit=its.emit,
        )

        # reverse pdf of the PREDECESSOR: density of this vertex's bsdf
        # sampling back toward it (vertex.h pdf[1-mode] caching)
        if k > 0:
            p_rev_w = jnp.where(
                bs.delta, 0.0, bsdf_pdf(sp, bs.wo, wi_l, present)
            )
            verts[k - 1]["pdf_rev"] = jnp.where(
                valid,
                _to_area(p_rev_w, its.p, verts[k - 1]["p"],
                         verts[k - 1]["ns"]),
                verts[k - 1]["pdf_rev"],
            )
        else:
            v["_rev_w_to_origin"] = jnp.where(
                bs.delta, 0.0, bsdf_pdf(sp, bs.wo, wi_l, present)
            )

        verts.append(v)

        d_new = frame.to_world(bs.wo)
        beta = beta * jnp.where(valid[..., None], bs.weight, 0.0)
        prev_p = its.p
        prev_delta_transition = bs.delta
        pdf_w = bs.pdf
        o = _path._offset_ray(its.p, its.ng, d_new)
        d = d_new
        active = valid & (jnp.max(beta, axis=-1) > 0)

    return verts


def _sample_area_light_vertex(pack, lane, sidx, seed):
    """Light subpath vertex 0 on an area emitter + first direction.

    Returns (v0 dict, o1, d1, beta1, pdf_w1).  v0.beta = Le /
    (pdf_pos * pmf); the emitted-direction factor cos/pdf_dir = pi for
    cosine sampling (AbstractEmitter::samplePosition/sampleDirection).
    """
    from mitsuba_tpu.emitter.eval import _searchsorted_segment

    r = lane.shape[0]
    u = rng.rand4(lane, sidx, 0, seed)
    u2 = rng.rand4(lane, sidx, 1, seed)

    e = jnp.clip(
        jnp.searchsorted(pack.emitter_cdf, u[..., 0], side="right") - 1,
        0,
        pack.emitter_pmf.shape[0] - 1,
    )
    pmf = pack.emitter_pmf[e]

    tri_slot = _searchsorted_segment(
        pack.area_tri_cdf, u[..., 1], pack.em_tri_lo[e], pack.em_tri_hi[e]
    )
    tri = pack.area_tri_idx[tri_slot]
    bary = warp.square_to_uniform_triangle(u[..., 2:4])
    p0 = (
        pack.tri_v0[tri]
        + bary[..., 0:1] * pack.tri_e1[tri]
        + bary[..., 1:2] * pack.tri_e2[tri]
    )
    n0 = mm.normalize(mm.cross(pack.tri_e1[tri], pack.tri_e2[tri]))

    area = pack.em_area[e]
    pdf_pos = pmf / jnp.maximum(area, 1e-12)  # area measure incl. PMF
    le = take_rows(pack.em_rgb, e)
    beta0 = le / jnp.maximum(pdf_pos, 1e-12)[..., None]

    frame = mm.Frame.from_normal(n0)
    d_local = warp.square_to_cosine_hemisphere(u2[..., 0:2])
    d1 = frame.to_world(d_local)
    pdf_w1 = jnp.maximum(mm.cos_theta(d_local), 1e-12) / jnp.pi
    # beta arriving at vertex 1 = Le * cos / (pdf_pos * pdf_dir) and the
    # cosine cancels against the cosine-hemisphere pdf up to pi
    beta1 = beta0 * jnp.pi

    v0 = dict(
        valid=jnp.ones((r,), bool),
        p=p0,
        ns=n0,
        emit=e,
        beta=beta0,
        pdf_fwd=pdf_pos,
        pdf_rev=jnp.zeros((r,), jnp.float32),
        delta=jnp.zeros((r,), bool),
    )
    o1 = p0 + n0 * 1e-4
    return v0, o1, d1, beta1, pdf_w1


# -----------------------------------------------------------------------------
# MIS (Veach ri-walk with junction overrides, = bdpt_proc.cpp miWeight)
# -----------------------------------------------------------------------------

def _mis_weight(s, t, cam, light, over_rev, false_arr):
    """1 / (1 + sum of pdf ratios of all competing (s', t') strategies).

    cam/light: vertex dict lists; over_rev: {(side, k): overridden
    pdf_rev array} for the junction vertices of THIS strategy."""

    def rev(side, k, verts):
        return over_rev.get((side, k), verts[k]["pdf_rev"])

    def dlt(side, k, verts):
        # junction vertices are treated as connectible (delta forced off)
        if side == "c" and k == t - 2:
            return false_arr
        if side == "l" and k == s - 1:
            return false_arr
        return verts[k]["delta"]

    sum_ri = jnp.zeros_like(false_arr, jnp.float32)
    # camera side: strategies shortening the camera subpath
    ri = jnp.ones_like(sum_ri)
    for k in range(t - 2, -1, -1):
        ri = ri * _remap0(rev("c", k, cam)) / _remap0(cam[k]["pdf_fwd"])
        nd_i = ~dlt("c", k, cam)
        nd_prev = ~dlt("c", k - 1, cam) if k >= 1 else ~false_arr
        sum_ri = sum_ri + jnp.where(nd_i & nd_prev, ri, 0.0)
    # light side
    ri = jnp.ones_like(sum_ri)
    for k in range(s - 1, -1, -1):
        ri = ri * _remap0(rev("l", k, light)) / _remap0(light[k]["pdf_fwd"])
        nd_i = ~dlt("l", k, light)
        # k == 0: competing strategy is s'=0 (BSDF hits the light) —
        # always possible for area lights
        nd_prev = ~dlt("l", k - 1, light) if k >= 1 else ~false_arr
        sum_ri = sum_ri + jnp.where(nd_i & nd_prev, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


# -----------------------------------------------------------------------------
# the renderer
# -----------------------------------------------------------------------------

def render_bdpt(scene, spp=None, seed=0, pack=None):
    """Full bidirectional render; image units match the path tracer."""
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    if not supports_bdpt(pack):
        from mitsuba_tpu.renderer import render as _render
        from mitsuba_tpu.integrator.plugins import IntegratorRecord

        sub = IntegratorRecord(
            kind="path",
            max_depth=scene.integrator.max_depth,
            rr_depth=scene.integrator.rr_depth,
        )
        saved = scene.integrator
        scene.integrator = sub
        try:
            return _render(scene, spp=spp, seed=seed, pack=pack)
        finally:
            scene.integrator = saved

    sen = scene.sensor.record
    film_rec = sen.film
    integ = scene.integrator
    w, h = film_rec.width, film_rec.height
    present = pack.present_types

    cap = int(os.environ.get("MTS_BDPT_MAX_EDGES", 8))
    max_edges = integ.max_depth if integ.max_depth > 0 else cap
    if max_edges > cap:
        print(
            f"[bdpt] maxDepth {max_edges} capped to {cap} edges "
            f"(MTS_BDPT_MAX_EDGES)"
        )
        max_edges = cap
    n_cam = max_edges  # camera surface vertices (t-1 <= max_edges)
    n_light = max_edges  # light vertices incl. emitter (t=1: s <= edges)

    # pinhole camera data (shared with ptracer's validated kernel)
    th = math.tan(math.radians(sen.xfov_deg) / 2.0)
    aspect = w / h
    tw = np.asarray(sen.to_world.m, np.float32)
    cam_pos = jnp.asarray(tw[:3, 3])
    world_to_cam = jnp.asarray(np.asarray(sen.to_world.inv, np.float32))
    cam_fwd = jnp.asarray(tw[:3, 2])

    def cam_k(d_unit):
        """Per-pixel-sample direction pdf of the camera (solid angle):
        K(w) = W*H*aspect / (4 tan^2(fx/2) cos^3)."""
        cos_c = jnp.maximum(jnp.abs(mm.dot(d_unit, cam_fwd)), 1e-6)
        return (w * h * aspect) / (4.0 * th * th * cos_c**3)

    spp = spp or sen.sampler.sample_count
    n_px = w * h
    lane_budget = int(os.environ.get("MTS_BDPT_LANES", 1 << 17))
    spp_chunk = max(1, min(spp, lane_budget // n_px))
    n_chunks = math.ceil(spp / spp_chunk)
    sampler_rec = sen.sampler

    def one_pass(films, sample_base):
        film, light_film = films
        px = jnp.arange(n_px, dtype=jnp.uint32)
        lane = jnp.broadcast_to(px[None, :], (spp_chunk, n_px)).reshape(-1)
        sidx = sample_base + jnp.arange(spp_chunk, dtype=jnp.uint32)[:, None]
        sidx = jnp.broadcast_to(sidx, (spp_chunk, n_px)).reshape(-1)
        r = lane.shape[0]
        false_arr = jnp.zeros((r,), bool)

        # ---- camera subpath ----
        jitter = sampler_rec.pixel_sample(lane, sidx, sampler_rec.sample_count)
        x = (lane % w).astype(jnp.float32) + jitter[..., 0]
        y = (lane // w).astype(jnp.float32) + jitter[..., 1]
        pos01 = jnp.stack([x / w, y / h], axis=-1)
        from mitsuba_tpu.sensor.plugins import generate_rays

        cam_packed = sen.pack(w, h)
        o0, d0 = generate_rays(
            cam_packed, pos01, sampler_rec.lens_sample(lane, sidx)
        )
        cam = _walk(
            pack, o0, d0,
            jnp.ones((r, 3), jnp.float32),
            cam_k(d0),
            lane, sidx, jnp.uint32(seed), n_cam, present,
            delta0=false_arr,
        )
        # reverse pdf of cam_v[0] toward the camera is never needed
        # (the pinhole vertex has no pdf_rev slot)

        # ---- light subpath ----
        seed_l = rng.stream_seed(seed, rng.STREAM_LIGHT)
        lv0, o1, d1, beta1, pdf_w1 = _sample_area_light_vertex(
            pack, lane, sidx, seed_l
        )
        lwalk = _walk(
            pack, o1, d1, beta1, pdf_w1, lane, sidx, seed_l,
            max(n_light - 1, 1), present, delta0=false_arr,
        )
        # light vertex 0's reverse pdf from vertex 1's bsdf:
        if lwalk:
            rw = lwalk[0].get("_rev_w_to_origin")
            lv0 = dict(lv0)
            lv0["pdf_rev"] = jnp.where(
                lwalk[0]["valid"],
                _to_area(rw, lwalk[0]["p"], lv0["p"], lv0["ns"]),
                0.0,
            )
        light = [lv0] + lwalk

        L = jnp.zeros((r, 3), jnp.float32)
        lf = light_film

        # ================= strategy enumeration =================
        for t in range(2, n_cam + 2):  # camera-side vertices incl. camera
            pt = cam[t - 2]
            fr_pt = mm.Frame.from_normal(pt["ns"])
            wi_pt = fr_pt.to_local(pt["wi"])

            # ---- s = 0: camera path hits the light (edges = t-1) ----
            if t - 1 >= 1 and t - 1 <= max_edges:
                cos_e = mm.dot(pt["ns"], pt["wi"])
                hit_l = pt["valid"] & (pt["emit"] >= 0) & (cos_e > 0)
                le = pack.em_rgb[jnp.maximum(pt["emit"], 0)]
                e = jnp.maximum(pt["emit"], 0)
                over = {
                    ("c", t - 2): pack.emitter_pmf[e]
                    / jnp.maximum(pack.em_area[e], 1e-12)
                }
                if t >= 3:
                    ptm = cam[t - 3]
                    pdf_w = jnp.maximum(cos_e, 0.0) / jnp.pi
                    over[("c", t - 3)] = _to_area(
                        pdf_w, pt["p"], ptm["p"], ptm["ns"]
                    )
                w_mis = _mis_weight(0, t, cam, light, over, false_arr)
                L = L + jnp.where(
                    hit_l[..., None],
                    pt["beta"] * le * w_mis[..., None],
                    0.0,
                )

            # ---- s >= 1, t >= 2: connections (edges = s+t-1) ----
            for s in range(1, len(light) + 1):
                if s + t - 1 > max_edges:
                    break
                qs = light[s - 1]
                v = qs["p"] - pt["p"]
                d2 = jnp.maximum(mm.dot(v, v), 1e-12)
                dist = jnp.sqrt(d2)
                dc = v / dist[..., None]

                wo_pt = fr_pt.to_local(dc)
                f_pt = bsdf_eval(pt["sp"], wi_pt, wo_pt, present)

                if s == 1:
                    cos_l = mm.dot(qs["ns"], -dc)
                    f_qs = qs["beta"] * jnp.maximum(cos_l, 0.0)[..., None]
                    geo = 1.0 / d2
                    ok = qs["valid"] & (cos_l > 1e-6)
                else:
                    fr_qs = mm.Frame.from_normal(qs["ns"])
                    wi_qs = fr_qs.to_local(qs["wi"])
                    wo_qs = fr_qs.to_local(-dc)
                    f_qs = qs["beta"] * bsdf_eval(
                        qs["sp"], wi_qs, wo_qs, present
                    )
                    geo = 1.0 / d2
                    ok = qs["valid"]

                contrib = pt["beta"] * f_pt * f_qs * geo[..., None]
                ok = (
                    ok
                    & pt["valid"]
                    & (jnp.max(contrib, axis=-1) > 0)
                )
                o_sh = _path._offset_ray(pt["p"], pt["ng"], dc)
                occ = occluded(pack, o_sh, dc, dist * (1.0 - 1e-3))
                ok = ok & ~occ

                # junction pdf overrides
                over = {}
                if s == 1:
                    pdf_w = jnp.maximum(mm.dot(qs["ns"], -dc), 0.0) / jnp.pi
                    over[("c", t - 2)] = _to_area(
                        pdf_w, qs["p"], pt["p"], pt["ns"]
                    )
                else:
                    fr_qs = mm.Frame.from_normal(qs["ns"])
                    wi_qs = fr_qs.to_local(qs["wi"])
                    wo_qs = fr_qs.to_local(-dc)
                    pdf_w = bsdf_pdf(qs["sp"], wi_qs, wo_qs, present)
                    over[("c", t - 2)] = _to_area(
                        pdf_w, qs["p"], pt["p"], pt["ns"]
                    )
                    # qs-1 seen from qs (incoming now from pt)
                    qsm = light[s - 2]
                    pdf_w2 = bsdf_pdf(qs["sp"], wo_qs, wi_qs, present)
                    over[("l", s - 2)] = _to_area(
                        pdf_w2, qs["p"], qsm["p"], qsm["ns"]
                    )
                # qs seen from pt (incoming from pt's predecessor)
                pdf_w3 = bsdf_pdf(pt["sp"], wi_pt, wo_pt, present)
                over[("l", s - 1)] = _to_area(
                    pdf_w3, pt["p"], qs["p"], qs["ns"]
                )
                if t >= 3:
                    ptm = cam[t - 3]
                    pdf_w4 = bsdf_pdf(pt["sp"], wo_pt, wi_pt, present)
                    over[("c", t - 3)] = _to_area(
                        pdf_w4, pt["p"], ptm["p"], ptm["ns"]
                    )

                w_mis = _mis_weight(s, t, cam, light, over, false_arr)
                L = L + jnp.where(
                    ok[..., None], contrib * w_mis[..., None], 0.0
                )

        # ---- t = 1: light-image splats (edges = s) ----
        for s in range(1, len(light) + 1):
            if s > max_edges:
                break
            qs = light[s - 1]
            v = cam_pos[None, :] - qs["p"]
            d2 = jnp.maximum(mm.dot(v, v), 1e-12)
            dist = jnp.sqrt(d2)
            dc = v / dist[..., None]  # qs -> camera

            if s == 1:
                cos_l = mm.dot(qs["ns"], dc)
                val = qs["beta"] * jnp.maximum(cos_l, 0.0)[..., None]
                ok = qs["valid"] & (cos_l > 1e-6)
            else:
                fr_qs = mm.Frame.from_normal(qs["ns"])
                wi_qs = fr_qs.to_local(qs["wi"])
                wo_qs = fr_qs.to_local(dc)
                val = qs["beta"] * bsdf_eval(qs["sp"], wi_qs, wo_qs, present)
                ok = qs["valid"]

            # project into the image
            pv = qs["p"] @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
            behind = pv[..., 2] <= 1e-6
            x_c = pv[..., 0] / jnp.maximum(pv[..., 2], 1e-6)
            y_c = pv[..., 1] / jnp.maximum(pv[..., 2], 1e-6)
            sx = 0.5 * (1.0 - x_c / th)
            sy = 0.5 * (1.0 - y_c * aspect / th)
            inside = (sx >= 0) & (sx < 1) & (sy >= 0) & (sy < 1) & ~behind
            ok = ok & inside & (jnp.max(val, axis=-1) > 0)

            if s >= 2:
                o_sh = _path._offset_ray(qs["p"], qs["ng"], dc)
            else:
                o_sh = qs["p"] + qs["ns"] * 1e-4
            occ = occluded(pack, o_sh, dc, dist * (1.0 - 1e-3))
            ok = ok & ~occ

            # overrides: qs seen from the camera; qs-1 seen from qs
            over = {("l", s - 1): _to_area(
                cam_k(-dc), cam_pos[None, :], qs["p"], qs["ns"]
            )}
            if s >= 2:
                fr_qs = mm.Frame.from_normal(qs["ns"])
                wi_qs = fr_qs.to_local(qs["wi"])
                wo_qs = fr_qs.to_local(dc)
                qsm = light[s - 2]
                pdf_w2 = bsdf_pdf(qs["sp"], wo_qs, wi_qs, present)
                over[("l", s - 2)] = _to_area(
                    pdf_w2, qs["p"], qsm["p"], qsm["ns"]
                )
            w_mis = _mis_weight(s, 1, cam, light, over, false_arr)

            splat = val * (cam_k(-dc) / d2 * w_mis)[..., None]
            splat = jnp.where(ok[..., None], splat, 0.0)
            px_i = jnp.clip((sx * w).astype(jnp.int32), 0, w - 1)
            py_i = jnp.clip((sy * h).astype(jnp.int32), 0, h - 1)
            lf = lf.at[py_i, px_i].add(splat)

        film = film + L.reshape(spp_chunk, h, w, 3).sum(axis=0)
        return film, lf

    run = jax.jit(one_pass, donate_argnums=(0,))
    film = jnp.zeros((h, w, 3), jnp.float32)
    light_film = jnp.zeros((h, w, 3), jnp.float32)
    base = 0
    done = 0
    for _ in range(n_chunks):
        film, light_film = run((film, light_film), jnp.uint32(base))
        base += spp_chunk
        done += spp_chunk
    img = film / done + light_film / (done * n_px)
    img.block_until_ready()
    return np.asarray(img)
