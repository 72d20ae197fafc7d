"""Stochastic progressive photon mapping (+ ppm/photonmapper aliases).

Rebuild of reference src/integrators/photonmapper/sppm.cpp:72-92 and the
photon-map infrastructure (include/mitsuba/render/photonmap.h:34,
particleproc.h:128, gatherproc.h:35) in TPU form:

* The reference's left-balanced kd-tree + kNN gather becomes a
  HASH-GRID FIXED-RADIUS gather: photons of a pass are sorted by grid
  cell (one XLA sort), and each visible point scans a bounded window of
  the 8 cells of the 2x2x2 neighborhood whose cell size is 2*r_max —
  fully vectorized, no pointer chasing (SURVEY §7 stage 9).
* The reference's per-block eye passes + photon-shooting ParallelProcess
  become two wavefront passes per iteration over the whole film.
* Radius/flux progression follows SPPM exactly: alpha = 0.7
  (sppm.cpp:92), N_i+1 = N_i + alpha*M_i, r²_i+1 = r²_i (N+alpha M)/(N+M),
  tau scaled accordingly (Hachisuka & Jensen 2009).

Eye paths: camera rays walk through specular bounces (storing throughput)
until the first connectible (non-delta) surface, which becomes the
pixel's VISIBLE POINT; emitted radiance and direct NEE lighting are
accumulated by the eye pass itself (the photon map estimates indirect
only, matching photonmapper.cpp's separation of direct light).
Per-cell scan window is bounded (PHOTONS_PER_CELL); overflow photons in
a cell are dropped and counted, never silently (self.dropped stat).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.core import rng
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.integrator.ptracer import _sample_emitter_ray
from mitsuba_tpu.scene.texture_eval import shading_frame, shading_params

ALPHA = 0.7  # radius-shrink exponent (reference sppm.cpp:92)
PHOTONS_PER_CELL = 32  # bounded per-cell scan window
_EYE_SLOTS = 4
_PH_SLOTS = 4


def _grid_cell(p, origin, inv_cell, dims):
    q = jnp.floor((p - origin) * inv_cell).astype(jnp.int32)
    q = jnp.clip(q, 0, jnp.asarray(dims) - 1)
    return q


def _cell_id(q, dims):
    return (q[..., 2] * dims[1] + q[..., 1]) * dims[0] + q[..., 0]


def _scene_grid_bounds(pack):
    """Hash-grid bounds + initial radius scale from the scene extent.
    NOTE: tri arrays are PADDED past n_tris with 1e30 sentinels —
    slice to the real primitive count."""
    nt = int(pack.n_tris)
    v0 = np.asarray(pack.tri_v0[:nt])
    v1 = v0 + np.asarray(pack.tri_e1[:nt])
    v2 = v0 + np.asarray(pack.tri_e2[:nt])
    pts = np.concatenate([v0, v1, v2], axis=0)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    extent = float(np.max(hi - lo)) or 1.0
    return lo, hi, extent


def make_sppm_passes(pack, integ, sen, w, h, seed):
    """Factory for the two wavefront passes, parameterized over lane
    arrays so both the single-chip loop and the sharded renderer
    (parallel/mesh.py) drive the SAME algorithm:

      eye_fn(lane_px, it)  -> (L [n,3], vps tuple)     — lanes = pixels
      photon_fn(lane_ph, it, vps, r2) -> (M, tau, overflow)
          — lanes = photons; vps/r2 cover the FULL film (replicated in
            the sharded case; each shard's photon subset contributes
            additively and M/tau psum-merge)
    """
    n_px = w * h
    present = pack.present_types
    max_depth = integ.max_depth if integ.max_depth > 0 else 12
    sampler_rec = sen.sampler
    lo, hi, extent = _scene_grid_bounds(pack)

    cam_packed = sen.pack(w, h)
    from mitsuba_tpu.sensor.plugins import generate_rays

    seed_eye = jnp.uint32(seed)
    seed_ph = rng.stream_seed(seed, rng.STREAM_LIGHT)

    # ---------------- eye pass: find visible points ----------------
    def eye_pass(lane_px, it):
        """One camera sample per pixel -> visible points + direct light."""
        n_lanes = lane_px.shape[0]
        sidx = jnp.broadcast_to(it, (n_lanes,)).astype(jnp.uint32)
        jitter = sampler_rec.pixel_sample(
            lane_px, sidx, sampler_rec.sample_count
        )
        x = (lane_px % w).astype(jnp.float32) + jitter[..., 0]
        y = (lane_px // w).astype(jnp.float32) + jitter[..., 1]
        pos01 = jnp.stack([x / w, y / h], axis=-1)
        o, d = generate_rays(
            cam_packed, pos01, sampler_rec.next2d(lane_px, sidx, 1009)
        )

        L = jnp.zeros((n_lanes, 3), jnp.float32)
        thr = jnp.ones((n_lanes, 3), jnp.float32)
        active = jnp.ones((n_lanes,), bool)
        vp_valid = jnp.zeros((n_lanes,), bool)
        vp_p = jnp.zeros((n_lanes, 3), jnp.float32)
        vp_ns = jnp.zeros((n_lanes, 3), jnp.float32)
        vp_wi = jnp.zeros((n_lanes, 3), jnp.float32)
        vp_beta = jnp.zeros((n_lanes, 3), jnp.float32)
        vp_mat = jnp.zeros((n_lanes,), jnp.int32)
        vp_uv = jnp.zeros((n_lanes, 2), jnp.float32)
        prev_delta = jnp.ones((n_lanes,), bool)
        prev_pdf = jnp.ones((n_lanes,), jnp.float32)

        from mitsuba_tpu.bsdf.eval import DELTA_TYPES

        for depth in range(max_depth):
            hit = intersect(pack, o, d)
            its = fill_interaction(pack, o, d, hit)
            found = active & its.valid

            # env + emitter-hit radiance (direct component, MIS vs the
            # eye NEE below — same bookkeeping as the path tracer)
            if pack.has_env:
                esc = active & ~its.valid
                w_env = jnp.where(
                    prev_delta, 1.0,
                    _path.mi_weight(prev_pdf, em.pdf_direct_env(pack, d)),
                )
                L = L + jnp.where(
                    esc[..., None],
                    thr * em.eval_env(pack, d) * w_env[..., None],
                    0.0,
                )
            if pack.has_area:
                cos_l = mm.dot(its.ns, its.wi_world)
                emis = found & (its.emit >= 0) & (cos_l > 0)
                le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
                p_dir = em.pdf_direct_area(pack, its.emit, its.t, cos_l)
                w_hit = jnp.where(
                    prev_delta, 1.0, _path.mi_weight(prev_pdf, p_dir)
                )
                L = L + jnp.where(
                    emis[..., None], thr * le * w_hit[..., None], 0.0
                )

            active = found
            sp = shading_params(pack, its.mat, its.uv, its=its)
            frame = shading_frame(pack, its)
            wi_l = frame.to_local(its.wi_world)

            is_delta_mat = jnp.zeros((n_lanes,), bool)
            for tname in DELTA_TYPES:
                is_delta_mat = is_delta_mat | (sp["type"] == tname)

            # record the visible point at the first non-delta surface
            store = active & ~is_delta_mat & ~vp_valid
            vp_valid = vp_valid | store
            vp_p = jnp.where(store[..., None], its.p, vp_p)
            vp_ns = jnp.where(store[..., None], its.ns, vp_ns)
            vp_wi = jnp.where(store[..., None], its.wi_world, vp_wi)
            vp_beta = jnp.where(store[..., None], thr, vp_beta)
            vp_mat = jnp.where(store, its.mat, vp_mat)
            vp_uv = jnp.where(store[..., None], its.uv, vp_uv)

            # direct lighting at the visible point (one NEE sample);
            # photons then only carry indirect flux
            u_n = rng.rand4(
                lane_px, sidx, depth * _EYE_SLOTS + 1, seed_eye
            )
            if pack.meta["n_emitters"] > 0:
                ds = em.sample_direct(pack, its.p, u_n[..., :3])
                wo_l = frame.to_local(ds.d)
                f = bsdf_eval(sp, wi_l, wo_l, present)
                o_sh = _path._offset_ray(its.p, its.ng, ds.d)
                sh_t = jnp.where(
                    ds.dist >= em.ENV_DIST, 1e7, ds.dist * (1.0 - 1e-3)
                )
                occ = occluded(pack, o_sh, ds.d, sh_t)
                # NO MIS down-weighting: the eye path stops at the VP,
                # so NEE is the ONLY direct-light technique there (the
                # photon map carries indirect flux exclusively) — the
                # plain estimator has weight 1
                L = L + jnp.where(
                    (store & ~occ)[..., None],
                    thr * ds.value * f,
                    0.0,
                )

            # specular lanes continue walking; stored lanes stop
            active = active & is_delta_mat & ~vp_valid
            u_b = rng.rand4(
                lane_px, sidx, depth * _EYE_SLOTS + 2, seed_eye
            )
            bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
            thr = thr * jnp.where(active[..., None], bs.weight, 1.0)
            d = jnp.where(
                active[..., None], frame.to_world(bs.wo), d
            )
            o = jnp.where(
                active[..., None],
                _path._offset_ray(its.p, its.ng, frame.to_world(bs.wo)),
                o,
            )
            prev_pdf = jnp.where(active, bs.pdf, prev_pdf)
            prev_delta = jnp.where(active, bs.delta, prev_delta)
            active = active & (jnp.max(thr, axis=-1) > 0)

        return L, (vp_valid, vp_p, vp_ns, vp_wi, vp_beta, vp_mat, vp_uv)

    # ---------------- photon pass ----------------
    def photon_pass(lane_ph, it, vps, r2):
        """Shoot lane_ph photons and gather flux onto visible points.

        Returns (M_i [n_vp] photon counts, tau_i [n_vp,3] unnormalized
        flux sums, dropped count)."""
        (vp_valid, vp_p, vp_ns, vp_wi, vp_beta, vp_mat, vp_uv) = vps
        n_ph = lane_ph.shape[0]
        n_vp = vp_p.shape[0]
        sidx = jnp.broadcast_to(it, (n_ph,)).astype(jnp.uint32)
        p0, n0, d0, beta0, is_area, e0 = _sample_emitter_ray(
            pack, lane_ph, sidx, seed
        )

        r_max = jnp.sqrt(jnp.max(jnp.where(vp_valid, r2, 0.0)))
        cell = 2.0 * jnp.maximum(r_max, 1e-6)
        inv_cell = 1.0 / cell
        origin = jnp.asarray(lo, jnp.float32)
        dims_f = jnp.ceil((jnp.asarray(hi - lo, jnp.float32)) * inv_cell)
        # clamp so cell-id arithmetic can't overflow int32 as radii shrink
        dims = jnp.clip(dims_f.astype(jnp.int32), 1, 1024)

        # --- collect photon hits over the walk (bounded depth) ---
        ph_p = []
        ph_d = []
        ph_pow = []
        ph_ok = []
        o, d, beta = p0 + n0 * 1e-4, d0, beta0
        active = jnp.max(beta0, axis=-1) > 0
        for depth in range(max_depth):
            hit = intersect(pack, o, d)
            its = fill_interaction(pack, o, d, hit)
            active = active & its.valid
            # photons record INDIRECT flux only after the first bounce
            # (direct light is handled by the eye pass NEE), except on
            # specular-connected paths which NEE can't see — handled by
            # storing photons at depth>=1 always, plus depth-0 photons
            # landing after a specular eye chain (the vp carries that).
            store = active & (depth >= 1)
            ph_p.append(its.p)
            ph_d.append(d)
            ph_pow.append(beta)
            ph_ok.append(store)

            sp = shading_params(pack, its.mat, its.uv, its=its)
            frame = shading_frame(pack, its)
            wi_l = frame.to_local(its.wi_world)
            u_b = rng.rand4(
                lane_ph, sidx, depth * _PH_SLOTS + 2, seed_ph
            )
            bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
            beta = beta * jnp.where(active[..., None], bs.weight, 0.0)
            d = frame.to_world(bs.wo)
            o = _path._offset_ray(its.p, its.ng, d)
            # RR after a few bounces keeps the walk bounded in energy
            u_r = rng.rand4(
                lane_ph, sidx, depth * _PH_SLOTS + 3, seed_ph
            )[..., 0]
            if depth >= 3:
                q = jnp.clip(jnp.max(beta, axis=-1), 0.05, 0.95)
                keep = u_r < q
                beta = jnp.where(
                    keep[..., None], beta / q[..., None], 0.0
                )
                active = active & keep
            active = active & (jnp.max(beta, axis=-1) > 0)

        P = n_ph * len(ph_p)
        ph_p = jnp.concatenate(ph_p)
        ph_d = jnp.concatenate(ph_d)
        ph_pow = jnp.concatenate(ph_pow)
        ph_ok = jnp.concatenate(ph_ok)

        # --- sort photons by grid cell ---
        q = _grid_cell(ph_p, origin, inv_cell, dims)
        cid = _cell_id(q, dims)
        n_cells = dims[0] * dims[1] * dims[2]
        cid = jnp.where(ph_ok, cid, n_cells)  # dead photons sort last
        # shuffle before the stable cell sort: concatenation order is
        # by DEPTH, so the bounded first-K scan would otherwise be a
        # biased (bright, low-depth) subsample of each cell
        shuffle = jnp.argsort(
            rng.pcg4d(
                jnp.stack(
                    [jnp.arange(cid.shape[0], dtype=jnp.uint32)] * 4, -1
                )
            )[:, 0]
        )
        cid = cid[shuffle]
        order = shuffle[jnp.argsort(cid, stable=True)]
        cid_s = jnp.sort(cid, stable=True)
        ph_p = ph_p[order]
        ph_d = ph_d[order]
        ph_pow = ph_pow[order]

        # --- gather at visible points: scan 8 neighbor cells ---
        vq_f = (vp_p - origin) * inv_cell - 0.5
        vq0 = jnp.floor(vq_f).astype(jnp.int32)
        sp_v = shading_params(pack, vp_mat, vp_uv)
        frame_v = mm.Frame.from_normal(vp_ns)
        wi_v = frame_v.to_local(vp_wi)

        M = jnp.zeros((n_vp,), jnp.float32)
        tau = jnp.zeros((n_vp, 3), jnp.float32)
        overflow = jnp.zeros((), jnp.float32)
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    qn = vq0 + jnp.asarray([dx, dy, dz], jnp.int32)
                    ok_cell = jnp.all(
                        (qn >= 0) & (qn < jnp.asarray(dims)), axis=-1
                    )
                    c = _cell_id(jnp.maximum(qn, 0), dims)
                    start = jnp.searchsorted(cid_s, c, side="left")
                    end_ = jnp.searchsorted(cid_s, c, side="right")
                    count = end_ - start
                    # bounded scan = UNBIASED SUBSAMPLE of the cell:
                    # photon lane order is independent of position/flux
                    # within a cell, so scanning the first K and scaling
                    # by count/K keeps the estimator unbiased (instead
                    # of silently dropping the tail)
                    scale = jnp.maximum(
                        count.astype(jnp.float32) / PHOTONS_PER_CELL, 1.0
                    )
                    overflow = overflow + jnp.mean(
                        (count > PHOTONS_PER_CELL).astype(jnp.float32)
                    )
                    for k in range(PHOTONS_PER_CELL):
                        idx = jnp.minimum(start + k, P - 1)
                        in_range = (k < count) & ok_cell & vp_valid
                        pp = ph_p[idx]
                        dd = ph_d[idx]
                        pw = ph_pow[idx]
                        dist2 = jnp.sum((pp - vp_p) ** 2, axis=-1)
                        inside = in_range & (dist2 <= r2)
                        # photon arrives along dd; contribution =
                        # beta_eye * f(wi_eye, -dd) * power  (the |cos|
                        # in bsdf_eval's convention is divided back out:
                        # photon estimators use f, not f*cos)
                        wo_l = frame_v.to_local(-dd)
                        f = bsdf_eval(sp_v, wi_v, wo_l, present)
                        cos_o = jnp.maximum(
                            jnp.abs(mm.cos_theta(wo_l)), 1e-6
                        )
                        contrib = (
                            vp_beta * f / cos_o[..., None] * pw
                            * scale[..., None]
                        )
                        tau = tau + jnp.where(
                            inside[..., None], contrib, 0.0
                        )
                        M = M + jnp.where(inside, scale, 0.0)
        return M, tau, overflow

    return eye_pass, photon_pass, extent


def render_sppm(scene, spp=None, seed=0, pack=None, photons_per_pass=None):
    """Progressive render: `spp` = number of SPPM iterations (each is one
    eye pass at 1 sample/pixel + one photon pass)."""
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    if pack.meta["n_emitters"] == 0:
        return np.zeros(
            (scene.sensor.record.film.height, scene.sensor.record.film.width,
             3),
            np.float32,
        )

    sen = scene.sensor.record
    film_rec = sen.film
    integ = scene.integrator
    w, h = film_rec.width, film_rec.height
    n_px = w * h
    sampler_rec = sen.sampler

    n_iters = spp or sampler_rec.sample_count
    n_photons = photons_per_pass or int(
        os.environ.get("MTS_SPPM_PHOTONS", 1 << 18)
    )

    eye_pass, photon_pass, extent = make_sppm_passes(
        pack, integ, sen, w, h, seed
    )
    r0 = float(
        os.environ.get("MTS_SPPM_R0", extent / max(w, h) * 2.0)
    )

    lane_px = jnp.arange(n_px, dtype=jnp.uint32)
    lane_ph = jnp.arange(n_photons, dtype=jnp.uint32)
    eye_j = jax.jit(lambda it: eye_pass(lane_px, it))
    photon_j = jax.jit(
        lambda it, vps, r2: photon_pass(lane_ph, it, vps, r2)
    )

    r2 = jnp.full((n_px,), r0 * r0, jnp.float32)
    N = jnp.zeros((n_px,), jnp.float32)
    tau = jnp.zeros((n_px, 3), jnp.float32)
    L_direct = jnp.zeros((n_px, 3), jnp.float32)
    total_photons = 0
    dropped_total = 0.0

    debug = os.environ.get("MTS_SPPM_DEBUG") == "1"
    for it in range(n_iters):
        L_i, vps = eye_j(jnp.uint32(it))
        L_direct = L_direct + L_i
        M, tau_i, dropped = photon_j(jnp.uint32(it), vps, r2)
        if debug:
            print(
                f"[sppm it {it}] vp_valid={float(jnp.mean(vps[0])):.3f} "
                f"M.mean={float(M.mean()):.3f} tau.mean="
                f"{float(tau_i.mean()):.5f} r2.mean={float(r2.mean()):.2e} "
                f"Ld.mean={float(L_i.mean()):.4f}"
            )
        dropped_total += float(dropped)
        # SPPM radius/flux update (Hachisuka & Jensen 2009 eq. 8-10)
        M = jnp.maximum(M, 0.0)
        grow = N + ALPHA * M
        denom = jnp.maximum(N + M, 1e-6)
        ratio = jnp.where(M > 0, grow / denom, 1.0)
        tau = (tau + tau_i) * ratio[..., None]
        r2 = r2 * ratio
        N = grow
        total_photons += n_photons

    if dropped_total > 0.05 * n_iters:
        print(
            f"[sppm] per-cell scan window often overflowed "
            f"({dropped_total / n_iters:.2f} mean cells/px/pass); gather "
            f"used unbiased count/K subsampling — variance is elevated"
        )

    # radiance = tau / (N_emitted * pi r^2), plus averaged direct light
    indirect = tau / (
        jnp.maximum(r2, 1e-12)[..., None] * (np.pi * total_photons)
    )
    img = L_direct / n_iters + indirect
    return np.asarray(img.reshape(h, w, 3))
