"""VPL / instant-radiosity integrator.

Rebuild of reference src/librender/vpl.cpp:76 (generateVPLs) +
src/integrators/vpl/vpl.cpp: light subpaths deposit virtual point
lights (the emitter sample itself + every surface vertex), and each
camera visible point sums the direct contribution of EVERY VPL with a
clamped geometry term — the wavefront form is one [n_px, V] shadow
batch per pass instead of the reference's one-GL-pass-per-VPL.

Radiometric bookkeeping matches the validated particle tracer
(integrator/ptracer.py): an emitter VPL contributes
    f_cam * Le * (A/pmf) * cos_l / d^2 / V
and a surface VPL
    f_cam * f_vpl(wi_vpl -> x) * beta / d^2 / V,
our bsdf_eval convention folding both G cosines.  1/d^2 is clamped at
(clamping * scene_radius)^2 (the reference's relative clamping).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import DELTA_TYPES, bsdf_eval, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.integrator.ptracer import _sample_emitter_ray
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)

_SLOTS = 4


def _generate_vpls(pack, n_vpl, vpl_depth, pass_i, seed, present):
    """Light random walk -> SoA VPL set (= generateVPLs, vpl.cpp:76).

    Returns dict of [n_vpl * (vpl_depth+1)] arrays: kind (0 emitter /
    1 surface, -1 invalid), p, n, wi (surface), weight [.,3], mat, uv.
    """
    lane = jnp.arange(n_vpl, dtype=jnp.uint32)
    sidx = jnp.full((n_vpl,), pass_i, jnp.uint32)
    seed_l = rng.stream_seed(seed, rng.STREAM_LIGHT)
    p0, n0, d0, beta, is_area, e0 = _sample_emitter_ray(
        pack, lane, sidx, seed
    )

    le = take_rows(pack.em_rgb, e0)
    area = pack.em_area[e0]
    pmf = pack.emitter_pmf[e0]
    w_emit = le * (area / jnp.maximum(pmf, 1e-12))[..., None]
    # point lights: intensity/pmf (no cosine, area weight n/a)
    w_point = le / jnp.maximum(pmf, 1e-12)[..., None]

    kinds = [jnp.where(is_area, 0, 2).astype(jnp.int32)]
    ps = [p0]
    ns = [n0]
    wis = [d0]
    ws = [jnp.where(is_area[..., None], w_emit, w_point)]
    mats = [jnp.zeros((n_vpl,), jnp.int32)]
    uvs = [jnp.zeros((n_vpl, 2), jnp.float32)]

    o, d = p0 + n0 * 1e-4, d0
    active = jnp.max(beta, axis=-1) > 0
    for depth in range(vpl_depth):
        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        active = active & its.valid
        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, its=its)

        kinds.append(jnp.where(active, 1, -1).astype(jnp.int32))
        ps.append(its.p)
        ns.append(its.ns)
        wis.append(its.wi_world)
        ws.append(jnp.where(active[..., None], beta, 0.0))
        mats.append(its.mat)
        uvs.append(its.uv)

        u_b = rng.rand4(lane, sidx, depth * _SLOTS + 2, seed_l)
        bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
        beta = beta * jnp.where(active[..., None], bs.weight, 0.0)
        d = frame.to_world(bs.wo)
        o = _path._offset_ray(its.p, its.ng, d)
        active = active & (jnp.max(beta, axis=-1) > 0)

    return dict(
        kind=jnp.concatenate(kinds),
        p=jnp.concatenate(ps),
        n=jnp.concatenate(ns),
        wi=jnp.concatenate(wis),
        w=jnp.concatenate(ws),
        mat=jnp.concatenate(mats),
        uv=jnp.concatenate(uvs),
    )


def make_vpl_pass(pack, integ, sen, w, h, seed):
    """One VPL pass fn(film, pass_i) -> film + this pass's image.
    Passes are independent (pass_i keys the RNG), so the sharded
    renderer simply splits pass indices across chips."""
    from mitsuba_tpu.sensor.plugins import generate_rays

    n_px = w * h
    present = pack.present_types
    sampler_rec = sen.sampler

    n_vpl = int(os.environ.get("MTS_VPL_COUNT", 64))
    vpl_depth = min(
        (integ.max_depth - 2) if integ.max_depth > 0 else 3, 6
    )
    vpl_depth = max(vpl_depth, 0)
    clamping = getattr(integ, "clamping", 0.1) or 0.1
    b2 = (clamping * pack.meta["scene_radius"]) ** 2

    cam_packed = sen.pack(w, h)
    lane_px = jnp.arange(n_px, dtype=jnp.uint32)

    @jax.jit
    def one_pass(film, pass_i):
        vpls = _generate_vpls(
            pack, n_vpl, vpl_depth, pass_i, seed, present
        )
        nv = vpls["p"].shape[0]

        sidx = jnp.full((n_px,), pass_i, jnp.uint32)
        jitter = sampler_rec.pixel_sample(
            lane_px, sidx, sampler_rec.sample_count
        )
        x = (lane_px % w).astype(jnp.float32) + jitter[..., 0]
        y = (lane_px // w).astype(jnp.float32) + jitter[..., 1]
        pos01 = jnp.stack([x / w, y / h], axis=-1)
        o, d = generate_rays(
            cam_packed, pos01, sampler_rec.lens_sample(lane_px, sidx)
        )

        L = jnp.zeros((n_px, 3), jnp.float32)
        thr = jnp.ones((n_px, 3), jnp.float32)
        active = jnp.ones((n_px,), bool)
        done_p = jnp.zeros((n_px, 3), jnp.float32)
        done_ns = jnp.zeros((n_px, 3), jnp.float32)
        done_ng = jnp.zeros((n_px, 3), jnp.float32)
        done_wi = jnp.zeros((n_px, 3), jnp.float32)
        done_mat = jnp.zeros((n_px,), jnp.int32)
        done_uv = jnp.zeros((n_px, 2), jnp.float32)
        done_thr = jnp.zeros((n_px, 3), jnp.float32)
        vp_ok = jnp.zeros((n_px,), bool)

        # eye walk through delta surfaces to the first connectible point
        for depth in range(4):
            hit = intersect(pack, o, d)
            its = fill_interaction(pack, o, d, hit)
            found = active & its.valid
            if pack.has_env:
                esc = active & ~its.valid
                L = L + jnp.where(
                    esc[..., None], thr * em.eval_env(pack, d), 0.0
                )
            cos_l = mm.dot(its.ns, its.wi_world)
            emis = found & (its.emit >= 0) & (cos_l > 0)
            le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
            L = L + jnp.where(emis[..., None], thr * le, 0.0)

            active = found
            sp = shading_params(
                pack, its.mat, its.uv, mip_footprint(pack, its), its=its
            )
            is_delta = jnp.zeros((n_px,), bool)
            for t in DELTA_TYPES:
                is_delta = is_delta | (sp["type"] == t)
            store = active & ~is_delta & ~vp_ok
            vp_ok = vp_ok | store
            done_p = jnp.where(store[..., None], its.p, done_p)
            done_ns = jnp.where(store[..., None], its.ns, done_ns)
            done_ng = jnp.where(store[..., None], its.ng, done_ng)
            done_wi = jnp.where(store[..., None], its.wi_world, done_wi)
            done_mat = jnp.where(store, its.mat, done_mat)
            done_uv = jnp.where(store[..., None], its.uv, done_uv)
            done_thr = jnp.where(store[..., None], thr, done_thr)

            active = active & is_delta & ~vp_ok
            frame = shading_frame(pack, its)
            wi_l = frame.to_local(its.wi_world)
            u_b = rng.rand4(lane_px, sidx, depth * _SLOTS + 2,
                            jnp.uint32(seed))
            bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
            thr = thr * jnp.where(active[..., None], bs.weight, 1.0)
            d = jnp.where(active[..., None], frame.to_world(bs.wo), d)
            o = jnp.where(
                active[..., None],
                _path._offset_ray(its.p, its.ng, frame.to_world(bs.wo)),
                o,
            )
            active = active & (jnp.max(thr, axis=-1) > 0)

        sp_v = shading_params(pack, done_mat, done_uv)
        frame_v = mm.Frame.from_normal(done_ns)
        wi_lv = frame_v.to_local(done_wi)

        # VPL shading params once per VPL
        sp_l = shading_params(pack, vpls["mat"], vpls["uv"])
        fr_l = mm.Frame.from_normal(vpls["n"])
        wi_ll = fr_l.to_local(vpls["wi"])

        def vpl_body(j, L):
            to_l = vpls["p"][j][None, :] - done_p
            d2 = jnp.sum(to_l * to_l, axis=-1)
            dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
            dir_l = to_l / dist[..., None]
            f_cam = bsdf_eval(
                sp_v, wi_lv, frame_v.to_local(dir_l), present
            )
            kind_j = vpls["kind"][j]
            # emitter VPL: one-sided cosine emission; point: isotropic
            cos_l = jnp.maximum(mm.dot(-dir_l, vpls["n"][j][None, :]), 0.0)
            e_emit = jnp.where(kind_j == 0, cos_l, 1.0)[..., None]
            # surface VPL: bsdf at the VPL toward the eye point
            spj = jax.tree.map(lambda a: a[j][None], sp_l)
            f_vpl = bsdf_eval(
                spj,
                jnp.broadcast_to(wi_ll[j], dir_l.shape),
                mm.Frame(
                    jnp.broadcast_to(fr_l.s[j], dir_l.shape),
                    jnp.broadcast_to(fr_l.t[j], dir_l.shape),
                    jnp.broadcast_to(fr_l.n[j], dir_l.shape),
                ).to_local(-dir_l),
                present,
            )
            e_j = jnp.where((kind_j == 1)[None, None], f_vpl, e_emit)
            geo = 1.0 / jnp.maximum(d2, b2)  # relative clamping
            contrib = (
                done_thr * f_cam * e_j * vpls["w"][j][None, :]
                * geo[..., None]
            )
            ok = (
                vp_ok
                & (kind_j >= 0)
                & (jnp.max(contrib, axis=-1) > 0)
            )
            o_sh = _path._offset_ray(done_p, done_ng, dir_l)
            occ = occluded(pack, o_sh, dir_l, dist * (1.0 - 1e-3))
            ok = ok & ~occ
            return L + jnp.where(ok[..., None], contrib, 0.0)

        L_vpl = jax.lax.fori_loop(
            0, nv, vpl_body, jnp.zeros((n_px, 3), jnp.float32)
        )
        L = L + L_vpl / n_vpl
        return film + L.reshape(h, w, 3)

    return one_pass


def render_vpl(scene, spp=None, seed=0, pack=None):
    """Instant-radiosity render: `spp` eye passes, each with a fresh
    VPL set (pass-averaged, so VPL structure noise averages out)."""
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    sen = scene.sensor.record
    w, h = sen.film.width, sen.film.height
    spp = spp or sen.sampler.sample_count
    one_pass = make_vpl_pass(pack, scene.integrator, sen, w, h, seed)
    film = jnp.zeros((h, w, 3), jnp.float32)
    for i in range(spp):
        film = one_pass(film, jnp.uint32(i))
    return np.asarray(film) / spp
