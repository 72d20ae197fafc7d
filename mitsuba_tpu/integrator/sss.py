"""Dipole subsurface scattering: irradiance pass + diffusion query.

Rebuild of the reference's dipole pipeline
(src/subsurface/dipole.cpp, src/librender/irrproc.cpp):

* `prepare_sss` — the preprocess: estimates irradiance E at every
  packed surface point with an NEE direct pass plus a cosine-weighted
  recursive pass through the existing path tracer (the reference runs
  IrradianceSamplingProcess with irrSamples rays/point and optional
  indirect gathering).
* `sss_lo` — the shading-time query: Lo(xo, wo) = Ft(eta, cos_o)/pi *
  sum_i dMo(|xo - xi|) E_i A_i with the isotropic dipole kernel
  dMo = 1/(4pi) [ C1 e^{-s d_r}/d_r^2 + C2 e^{-s d_v}/d_v^2 ]
  (dipole.cpp IsotropicDipoleQuery:40-58, Lo:336-349).  The octree is
  replaced by a dense masked reduction over the (<=4096-entry) point
  set, scanned in chunks so XLA keeps the footprint in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.gather import take_fused, take_rows
from mitsuba_tpu.emitter import eval as em

INV_PI = 1.0 / jnp.pi
INV_FOURPI = 0.25 / jnp.pi
_CHUNK = 128  # points per scan step of the dense dipole sum


def compute_sss_irradiance(pack, integ, seed=0):
    """E [P,3] at every packed subsurface sample point."""
    from mitsuba_tpu.accel.intersect import occluded
    from mitsuba_tpu.integrator.path import path_trace

    pts = pack.sss_p  # [P,3]
    nrm = pack.sss_n
    p_cnt = pts.shape[0]
    k = int(pack.meta.get("sss_irr_samples", 16))
    sseed = rng.stream_seed(seed, rng.STREAM_SSS)

    lane = jnp.repeat(jnp.arange(p_cnt, dtype=jnp.uint32), k)  # [P*K]
    sidx = jnp.tile(jnp.arange(k, dtype=jnp.uint32), p_cnt)
    p_l = jnp.repeat(pts, k, axis=0)
    n_l = jnp.repeat(nrm, k, axis=0)

    e_direct = jnp.zeros((p_cnt * k, 3), jnp.float32)
    if pack.meta["n_emitters"] > 0:
        u3 = rng.rand4(lane, sidx, 0, sseed)[..., :3]
        ds = em.sample_direct(pack, p_l, u3)
        cos_i = mm.dot(n_l, ds.d)
        o_sh = p_l + n_l * 1e-4
        shadow_t = jnp.where(
            ds.dist >= em.ENV_DIST, 1e7, ds.dist * (1.0 - 1e-3)
        )
        occ = occluded(pack, o_sh, ds.d, shadow_t)
        e_direct = jnp.where(
            ((cos_i > 0) & ~occ)[..., None],
            ds.value * jnp.maximum(cos_i, 0.0)[..., None],
            0.0,
        )

    e_total = e_direct
    if pack.meta.get("sss_indirect", True):
        # indirect irradiance: cosine-hemisphere rays handed to the
        # path tracer with hidden depth-0 emitters (those are the
        # direct term above); E_ind = pi * mean(Li) under cosine
        # sampling (reference irrproc.cpp:73-90)
        from mitsuba_tpu.core import warp

        u2 = rng.rand4(lane, sidx, 1, sseed)[..., :2]
        local = warp.square_to_cosine_hemisphere(u2)
        fr = mm.Frame.from_normal(n_l)
        d = fr.to_world(local)
        o = p_l + n_l * 1e-4
        from dataclasses import replace as _dc_replace

        integ_ind = _dc_replace(integ, hide_emitters=True, max_depth=4)
        li = path_trace(
            pack, integ_ind, o, d, lane, sidx, None, seed=sseed ^ 0x1D
        )
        e_total = e_total + jnp.pi * li

    return e_total.reshape(p_cnt, k, 3).mean(axis=1)


def prepare_sss(pack, integ, seed=0):
    """Run the irradiance pass and return a pack whose sss_E is live."""
    fn = jax.jit(lambda pk, sd: compute_sss_irradiance(pk, integ, sd))
    e_pts = fn(pack, seed)
    arrays = dict(pack.arrays)
    arrays["sss_E"] = e_pts
    return type(pack)(arrays, dict(pack.meta))


def sss_lo(pack, p, cos_o, sid):
    """Exitant subsurface radiance at p [R,3] with outgoing cosine
    cos_o [R] for lanes whose material maps to dipole object sid [R]
    (callers mask sid < 0 lanes)."""
    s = jnp.maximum(sid, 0)
    zr, zv, s_tr, eta = take_fused(
        s, pack.sss_zr, pack.sss_zv, pack.sss_str, pack.sss_eta
    )  # [R,3]x3, [R]

    r_lanes = p.shape[0]
    p_cnt = pack.sss_p.shape[0]
    n_chunks = (p_cnt + _CHUNK - 1) // _CHUNK
    pad = n_chunks * _CHUNK - p_cnt
    pts = jnp.pad(pack.sss_p, ((0, pad), (0, 0)))
    e_pts = jnp.pad(pack.sss_E, ((0, pad), (0, 0)))
    area = jnp.pad(pack.sss_area, (0, pad))
    obj = jnp.pad(pack.sss_obj, (0, pad), constant_values=-2)

    pts_c = pts.reshape(n_chunks, _CHUNK, 3)
    e_c = e_pts.reshape(n_chunks, _CHUNK, 3)
    area_c = area.reshape(n_chunks, _CHUNK)
    obj_c = obj.reshape(n_chunks, _CHUNK)

    def step(acc, chunk):
        cp, ce, ca, co = chunk
        # [R, C] squared distances
        d2 = jnp.sum(
            (p[:, None, :] - cp[None, :, :]) ** 2, axis=-1
        )
        mask = (co[None, :] == s[:, None]).astype(jnp.float32)
        # dipole kernel per channel: dr/dv [R, C, 3]
        d2e = d2[..., None]
        dr = jnp.sqrt(d2e + (zr * zr)[:, None, :])
        dv = jnp.sqrt(d2e + (zv * zv)[:, None, :])
        st = s_tr[:, None, :]
        c1 = zr[:, None, :] * (st + 1.0 / dr)
        c2 = zv[:, None, :] * (st + 1.0 / dv)
        dmo = INV_FOURPI * (
            c1 * jnp.exp(-st * dr) / (dr * dr)
            + c2 * jnp.exp(-st * dv) / (dv * dv)
        )
        contrib = dmo * ce[None, :, :] * (ca[None, :] * mask)[..., None]
        return acc + contrib.sum(axis=1), None

    mo, _ = jax.lax.scan(
        step,
        jnp.zeros((r_lanes, 3), jnp.float32),
        (pts_c, e_c, area_c, obj_c),
    )

    # boundary transmittance (dipole.cpp:Lo — skipped for eta == 1)
    fr, _, _ = mm.fresnel_dielectric(jnp.maximum(cos_o, 0.0), eta)
    ft = jnp.where(jnp.abs(eta - 1.0) < 1e-5, 1.0, 1.0 - fr)
    return mo * (INV_PI * ft)[..., None]


def single_scatter_lo(pack, p, d_in, ng, sid, lane, sidx, depth, seed):
    """Classical single scattering along the refracted camera ray
    (reference src/subsurface/singlescatter.cpp LoSingle:1326-1480,
    fastSingleScatter branch): refract the view ray into the object,
    draw exponential distance samples along the internal ray, connect
    each to an emitter through the straight exit point with boundary
    Fresnel and Beer-Lambert attenuation on both internal segments.

    The reference's internal-reflection recursion (LoSingle calling
    itself with the specularly reflected direction until
    m_singleScatterDepth, singlescatter.cpp:1326,1378-1400) is unrolled
    as a static bounce loop: at each far boundary the ray reflects with
    the inside Fresnel weight, the whole-segment Beer-Lambert factor
    multiplies the carried throughput, and the next segment draws its
    own distance/light samples.  The refracted-connection Newton solver
    is not ported (documented approximation).

    p: surface hit [R,3]; d_in: incident ray direction (toward the
    surface) [R,3]; ng: outward geometric normal [R,3]; sid: SSS
    object id per lane (mask <0 outside)."""
    from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded

    r = p.shape[0]
    s = jnp.maximum(sid, 0)
    sigs, sigt, g, eta = take_fused(
        s, pack.sss_sigs, pack.sss_sigt, pack.sss_g, pack.sss_eta
    )
    ns = int(pack.meta.get("sss_ss_samples", 2))
    n_bounce = int(pack.meta.get("sss_ss_depth", 4))
    sseed = rng.stream_seed(seed, rng.STREAM_SSS)

    # refract the view ray into the medium (frame: +z = outward normal)
    frame = mm.Frame.from_normal(ng)
    wi_l = frame.to_local(-d_in)
    cos_i = mm.cos_theta(wi_l)
    fr_in, _, _ = mm.fresnel_dielectric(jnp.abs(cos_i), eta)
    ft_in = 1.0 - fr_in
    wt_l, tir, _ = mm.refract_local(wi_l, eta)
    d_int = frame.to_world(wt_l)  # points into the object
    valid0 = (sid >= 0) & (cos_i > 0) & ~tir

    # exponential sampling radius = mean free path (ref m_radius)
    radius = 1.0 / jnp.maximum(jnp.mean(sigt, axis=-1), 1e-6)

    lo = jnp.zeros((r, 3), jnp.float32)
    o_seg = p + d_int * 1e-4  # segment origin (entry point)
    d_seg = d_int
    # carried throughput into the segment: entry transmittance times
    # the product of reflection Fresnels and per-segment Beer-Lambert
    # factors of all PREVIOUS internal bounces (ref: bsdfAtt *
    # attenuation(m_sigmaT, -thickness) applied as the recursion
    # unwinds, singlescatter.cpp:1393-1397)
    thr = ft_in[..., None] * jnp.ones((r, 3), jnp.float32)
    alive = valid0

    for b in range(n_bounce):
        # internal span: distance to the far boundary of this segment
        hit2 = intersect(pack, o_seg, d_seg)
        thickness = jnp.where(hit2.valid, hit2.t, 0.0)
        seg_ok = alive & hit2.valid & (thickness > 1e-6)
        s_max = 1.0 - jnp.exp(-thickness / radius)

        for k in range(ns):
            slot = 64 + ((depth * 8 + b) * ns + k) * 2
            u = rng.rand4(lane, sidx, slot, sseed)
            dist = -radius * jnp.log(
                jnp.maximum(1.0 - u[..., 0] * s_max, 1e-20)
            )
            dist = jnp.minimum(dist, thickness * (1.0 - 1e-4))
            # 1/pdf of the truncated-exponential distance sample
            w_dist = radius * s_max * jnp.exp(dist / radius) / ns
            v = o_seg + d_seg * dist[..., None]

            u2 = rng.rand4(lane, sidx, slot + 1, sseed)
            ds = em.sample_direct(pack, v, u2[..., :3])

            # straight exit point toward the light
            hit3 = intersect(pack, v, ds.d)
            s_exit = jnp.where(hit3.valid, hit3.t, 0.0)
            # the connection must leave through a boundary closer than
            # the light itself
            ok = seg_ok & hit3.valid & (s_exit < ds.dist - 1e-4)

            # Fresnel transmittance at the exit crossing
            its3 = fill_interaction(pack, v, ds.d, hit3)
            cos_x = jnp.abs(mm.dot(ds.d, its3.ng))
            fr_out, _, _ = mm.fresnel_dielectric(cos_x, eta)
            ft_out = 1.0 - fr_out

            # occlusion from the exit point to the emitter
            o_sh = its3.p + ds.d * 1e-4
            rem = jnp.where(
                ds.dist >= em.ENV_DIST, 1e7,
                (ds.dist - s_exit) * (1.0 - 1e-3),
            )
            occ = occluded(pack, o_sh, ds.d, jnp.maximum(rem, 0.0))
            ok = ok & ~occ & (jnp.max(ds.value, axis=-1) > 0)

            # phase function at the internal vertex (HG, g=0 -> iso)
            cos_ph = mm.dot(d_seg, ds.d)
            denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_ph, 1e-6)
            ph = INV_FOURPI * (1.0 - g * g) / (denom * jnp.sqrt(denom))

            att = jnp.exp(-sigt * (dist + s_exit)[..., None])
            contrib = (
                (eta * eta * ph * w_dist)[..., None]
                * ft_out[..., None] * thr * sigs * att * ds.value
            )
            lo = lo + jnp.where(ok[..., None], contrib, 0.0)

        if b + 1 >= n_bounce:
            break
        # internal (Fresnel/total) reflection at the far boundary:
        # reflect d_seg about the boundary normal, carry F and the
        # whole-segment attenuation (singlescatter.cpp:1378-1400)
        its2 = fill_interaction(pack, o_seg, d_seg, hit2)
        n2 = its2.ng
        cos2 = mm.dot(d_seg, n2)  # >0: n2 points along travel? sign-safe below
        # cosine of incidence measured from inside: negative cos flags
        # the inside branch of fresnel_dielectric
        fr2, _, _ = mm.fresnel_dielectric(-jnp.abs(cos2), eta)
        d_seg = d_seg - 2.0 * cos2[..., None] * n2
        thr = thr * fr2[..., None]
        thr = thr * jnp.exp(-sigt * thickness[..., None])
        o_seg = jnp.where(
            seg_ok[..., None], its2.p + d_seg * 1e-4, o_seg
        )
        alive = seg_ok & (fr2 > 1e-4)

    return lo
