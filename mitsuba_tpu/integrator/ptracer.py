"""Adjoint particle tracer: light paths connected to the sensor.

Rebuild of reference src/integrators/ptracer/{ptracer.cpp,
ptracer_proc.cpp} + the generic particle tracer
(src/librender/particleproc.cpp): particles start on emitters, random-
walk through the scene, and every vertex is connected to the (pinhole)
camera — the measurement splat is the wavefront's only scatter, exactly
like the reference's sensor splats.

Pinhole importance: a pixel's value is its mean radiance, so the kernel
over camera directions is
    K(omega) = (W*H*aspect) / (4*tan(fx/2)^2 * cos^3(theta_c))
inside the frustum (integrates to 1 over each pixel), and a surface
vertex p with particle throughput beta splats
    beta * f(wi->cam)*|cos_p| * V(p,cam) * K / dist^2 / N_particles.

This module is also the light-subpath machinery for the upcoming bdpt.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.emitter.plugins import (
    AREA,
    COLLIMATED,
    CONSTANT,
    DIRECTIONAL,
    ENVMAP,
    POINT,
    SPOT,
)
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.scene.texture_eval import shading_frame, shading_params

_SLOTS = 4


def _sample_emitter_ray(pack, lane, sidx, seed):
    """Sample (position, normal, direction, power-throughput beta) for
    particle/photon emission — every emitter kind (reference:
    AbstractEmitter::samplePosition/sampleDirection + each emitter's
    sampleRay: area.cpp cosine, point.cpp uniform sphere, spot.cpp
    uniform cone x falloff, directional.cpp + constant.cpp + envmap.cpp
    bounding-sphere disk origins, collimated.cpp delta/delta).

    Per-kind branches are statically gated on meta emitter_kinds.
    """
    r = lane.shape[0]
    kinds = pack.meta.get("emitter_kinds", ())
    # Light-subpath randomness has its own stream (core/rng.py partition)
    seed = rng.stream_seed(seed, rng.STREAM_LIGHT)
    u = rng.rand4(lane, sidx, 0, seed)
    u2 = rng.rand4(lane, sidx, 1, seed)

    e = jnp.clip(
        jnp.searchsorted(pack.emitter_cdf, u[..., 0], side="right") - 1,
        0,
        pack.emitter_pmf.shape[0] - 1,
    )
    pmf = pack.emitter_pmf[e]
    kind = pack.em_kind[e]

    p = jnp.zeros((r, 3), jnp.float32)
    n = jnp.zeros((r, 3), jnp.float32)
    d = jnp.zeros((r, 3), jnp.float32)
    beta = jnp.zeros((r, 3), jnp.float32)

    # --- area emitters ---
    if pack.has_area:
        from mitsuba_tpu.emitter.eval import _searchsorted_segment

        tri_slot = _searchsorted_segment(
            pack.area_tri_cdf, u[..., 1], pack.em_tri_lo[e], pack.em_tri_hi[e]
        )
        tri = pack.area_tri_idx[tri_slot]
        bary = warp.square_to_uniform_triangle(u[..., 2:4])
        v0 = pack.tri_v0[tri]
        p_a = (
            v0
            + bary[..., 0:1] * pack.tri_e1[tri]
            + bary[..., 1:2] * pack.tri_e2[tri]
        )
        n_a = mm.normalize(mm.cross(pack.tri_e1[tri], pack.tri_e2[tri]))
        frame = mm.Frame.from_normal(n_a)
        d_local = warp.square_to_cosine_hemisphere(u2[..., 0:2])
        d_a = frame.to_world(d_local)
        # beta = Le * cos / (pdf_pos * pdf_dir * pmf)
        #      = Le * pi * area / pmf      (cosine pdf cancels the cos)
        area = pack.em_area[e]
        beta_a = pack.em_rgb[e] * (jnp.pi * area / jnp.maximum(pmf, 1e-12))[
            ..., None
        ]
        sel = kind == AREA
        p = jnp.where(sel[..., None], p_a, p)
        n = jnp.where(sel[..., None], n_a, n)
        d = jnp.where(sel[..., None], d_a, d)
        beta = jnp.where(sel[..., None], beta_a, beta)

    inv_pmf = 1.0 / jnp.maximum(pmf, 1e-12)

    # --- point emitters ---
    if not kinds or POINT in kinds:
        d_p = warp.square_to_uniform_sphere(u2[..., 0:2])
        beta_p = pack.em_rgb[e] * (4.0 * jnp.pi * inv_pmf)[..., None]
        sel = kind == POINT
        p = jnp.where(sel[..., None], pack.em_pos[e], p)
        n = jnp.where(sel[..., None], d_p, n)
        d = jnp.where(sel[..., None], d_p, d)
        beta = jnp.where(sel[..., None], beta_p, beta)

    # --- spot: uniform cone within the cutoff, linear falloff ---
    if SPOT in kinds:
        axis = pack.em_dir[e]
        cc = pack.em_cos_cutoff[e]
        cb = pack.em_cos_beam[e]
        local = warp.square_to_uniform_cone(u2[..., 0:2], cc)
        d_s = mm.Frame.from_normal(axis).to_world(local)
        cos_f = mm.dot(d_s, axis)
        fall = jnp.clip((cos_f - cc) / jnp.maximum(cb - cc, 1e-6), 0.0, 1.0)
        fall = jnp.where(cos_f >= cb, 1.0, fall)
        pdf_cone = warp.square_to_uniform_cone_pdf(cc)
        beta_s = pack.em_rgb[e] * (
            fall / jnp.maximum(pdf_cone, 1e-12) * inv_pmf
        )[..., None]
        sel = kind == SPOT
        p = jnp.where(sel[..., None], pack.em_pos[e], p)
        n = jnp.where(sel[..., None], d_s, n)
        d = jnp.where(sel[..., None], d_s, d)
        beta = jnp.where(sel[..., None], beta_s, beta)

    # --- collimated beam: delta position AND direction ---
    if COLLIMATED in kinds:
        sel = kind == COLLIMATED
        d_b = pack.em_dir[e]
        p = jnp.where(sel[..., None], pack.em_pos[e], p)
        n = jnp.where(sel[..., None], d_b, n)
        d = jnp.where(sel[..., None], d_b, d)
        beta = jnp.where(sel[..., None], pack.em_rgb[e] * inv_pmf[..., None],
                         beta)

    # infinite lights launch from a scene-bounding-sphere disk
    # perpendicular to the emission direction (pdf_pos = 1/(pi R^2))
    center = jnp.asarray(pack.meta["scene_center"], jnp.float32)
    radius = jnp.float32(pack.meta["scene_radius"])

    def disk_origin(d_emit, uv):
        fr = mm.Frame.from_normal(d_emit)
        xy = warp.square_to_uniform_disk(uv) * radius
        offs = fr.to_world(
            jnp.stack(
                [xy[..., 0], xy[..., 1], jnp.zeros_like(xy[..., 0])],
                axis=-1,
            )
        )
        return center[None, :] - d_emit * (1.1 * radius) + offs

    disk_area = jnp.pi * radius * radius

    if DIRECTIONAL in kinds:
        sel = kind == DIRECTIONAL
        d_dir = pack.em_dir[e]
        p_dir = disk_origin(d_dir, u[..., 1:3])
        beta_d = pack.em_rgb[e] * (disk_area * inv_pmf)[..., None]
        p = jnp.where(sel[..., None], p_dir, p)
        n = jnp.where(sel[..., None], d_dir, n)
        d = jnp.where(sel[..., None], d_dir, d)
        beta = jnp.where(sel[..., None], beta_d, beta)

    if CONSTANT in kinds:
        sel = kind == CONSTANT
        d_c = warp.square_to_uniform_sphere(u2[..., 0:2])
        p_c = disk_origin(d_c, u[..., 1:3])
        beta_c = pack.em_rgb[e] * (
            4.0 * jnp.pi * disk_area * inv_pmf
        )[..., None]
        p = jnp.where(sel[..., None], p_c, p)
        n = jnp.where(sel[..., None], d_c, n)
        d = jnp.where(sel[..., None], d_c, d)
        beta = jnp.where(sel[..., None], beta_c, beta)

    if pack.has_envmap:
        from mitsuba_tpu.emitter.eval import (
            _env_bilinear,
            _env_uv_from_dir,
            _sample_env_dir,
        )

        sel = kind == ENVMAP
        d_to_env, pdf_env = _sample_env_dir(pack, u2)
        le = _env_bilinear(pack, _env_uv_from_dir(pack, d_to_env))
        d_e = -d_to_env  # photons travel INTO the scene
        p_e = disk_origin(d_e, u[..., 1:3])
        beta_e = le * (
            disk_area / jnp.maximum(pdf_env, 1e-12) * inv_pmf
        )[..., None]
        p = jnp.where(sel[..., None], p_e, p)
        n = jnp.where(sel[..., None], d_e, n)
        d = jnp.where(sel[..., None], d_e, d)
        beta = jnp.where(sel[..., None], beta_e, beta)

    is_area = kind == AREA
    return p, n, d, beta, is_area, e


def _connect_to_camera(pack, cam_info, p, value_rgb, film, active):
    """Splat value * K * V / dist^2 into the film at p's projection."""
    cam_pos, world_to_cam, th, aspect, w, h, cam_fwd = cam_info
    to_cam = cam_pos[None, :] - p
    dist = mm.length(to_cam)
    d_c = to_cam / jnp.maximum(dist, 1e-12)[..., None]

    # camera-space position (affine inverse of to_world)
    v = p @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
    behind = v[..., 2] <= 1e-6
    x_cam = v[..., 0] / jnp.maximum(v[..., 2], 1e-6)
    y_cam = v[..., 1] / jnp.maximum(v[..., 2], 1e-6)
    sx = 0.5 * (1.0 - x_cam / th)
    sy = 0.5 * (1.0 - y_cam * aspect / th)
    inside = (
        (sx >= 0.0) & (sx < 1.0) & (sy >= 0.0) & (sy < 1.0) & ~behind
    )

    cos_c = jnp.abs(mm.dot(d_c, cam_fwd))  # angle off the camera axis
    kern = (w * h * aspect) / (
        4.0 * th * th * jnp.maximum(cos_c, 1e-6) ** 3
    )

    contributes = active & inside
    o_sh = p + d_c * 1e-4
    occ = occluded(
        pack, o_sh, d_c, dist * (1.0 - 1e-3)
    )
    contributes = contributes & ~occ

    val = value_rgb * (kern / jnp.maximum(dist * dist, 1e-12))[..., None]
    val = jnp.where(contributes[..., None], val, 0.0)

    px = jnp.clip((sx * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((sy * h).astype(jnp.int32), 0, h - 1)
    return film.at[py, px].add(val)


def make_ptracer_batch(pack, integ, sen, w, h, seed):
    """Per-batch particle tracing kernel fn(film, lane, sidx) -> film —
    shared by the single-chip host loop and the sharded pass (each
    device runs its own lane range; counter RNG keys by (lane, sidx) so
    the split is pure work division)."""
    max_depth = integ.max_depth if integ.max_depth > 0 else 16
    rr_depth = max(integ.rr_depth, 1)
    present = pack.present_types

    th = math.tan(math.radians(sen.xfov_deg) / 2.0)
    aspect = w / h
    tw = np.asarray(sen.to_world.m, np.float32)
    cam_pos = jnp.asarray(tw[:3, 3])
    world_to_cam = jnp.asarray(
        np.asarray(sen.to_world.inv, np.float32)
    )
    cam_fwd = jnp.asarray(tw[:3, 2])  # camera +z (forward) in world space
    cam_info = (cam_pos, world_to_cam, th, aspect, w, h, cam_fwd)

    def run_batch(film, lane, sidx):
        p0, n0, d0, beta, is_area, e0 = _sample_emitter_ray(
            pack, lane, sidx, seed
        )
        # t=1 connection: emitted radiance visible directly.
        # beta_pos = Le * area / pmf; splat Le (radiance) * cos_p ... the
        # direct connection uses Le itself with position-sampling pdf:
        le = pack.em_rgb[e0]
        area = pack.em_area[e0]
        pmf = pack.emitter_pmf[e0]
        to_cam = cam_pos[None, :] - p0
        d_c = mm.normalize(to_cam)
        cos_p = jnp.maximum(mm.dot(n0, d_c), 0.0)
        val0 = le * (
            (area / jnp.maximum(pmf, 1e-12)) * cos_p
        )[..., None]
        film = _connect_to_camera(
            pack, cam_info, p0 + n0 * 1e-4, val0, film, is_area
        )

        state = dict(
            film=film,
            o=p0 + n0 * 1e-4,
            d=d0,
            beta=beta,
            active=jnp.max(beta, axis=-1) > 0,
            depth=jnp.int32(0),
        )

        def cond(s):
            return (s["depth"] < max_depth) & jnp.any(s["active"])

        def body(s):
            depth = s["depth"]
            o, d, beta, active = s["o"], s["d"], s["beta"], s["active"]
            film = s["film"]

            hit = intersect(pack, o, d)
            its = fill_interaction(pack, o, d, hit)
            active = active & its.valid

            frame = shading_frame(pack, its)
            wi_l = frame.to_local(its.wi_world)
            sp = shading_params(pack, its.mat, its.uv, its=its)

            # connect this vertex to the camera
            to_cam = cam_pos[None, :] - its.p
            d_c = mm.normalize(to_cam)
            wo_l = frame.to_local(d_c)
            f = bsdf_eval(sp, wi_l, wo_l, present)
            film = _connect_to_camera(
                pack,
                cam_info,
                _path._offset_ray(its.p, its.ng, d_c),
                beta * f,
                film,
                active,
            )

            # continue the walk (importance transport)
            u_b = rng.rand4(
                lane, sidx, depth * _SLOTS + 2,
                rng.stream_seed(seed, rng.STREAM_LIGHT),
            )
            bs = bsdf_sample(sp, wi_l, u_b[..., :2], u_b[..., 2], present)
            beta = beta * jnp.where(active[..., None], bs.weight, 1.0)
            d_new = frame.to_world(bs.wo)
            o_new = _path._offset_ray(its.p, its.ng, d_new)
            active = active & (jnp.max(beta, axis=-1) > 0)

            u_r = rng.rand4(
                lane, sidx, depth * _SLOTS + 3,
                rng.stream_seed(seed, rng.STREAM_LIGHT),
            )[..., 0]
            q = jnp.minimum(jnp.max(beta, axis=-1) * 0.0 + 0.95, 0.95)
            do_rr = depth + 1 >= rr_depth
            keep = jnp.where(do_rr, u_r < q, True)
            beta = jnp.where(
                (do_rr & keep)[..., None], beta / q[..., None], beta
            )
            active = active & keep

            return dict(
                film=film,
                o=jnp.where(active[..., None], o_new, o),
                d=jnp.where(active[..., None], d_new, d),
                beta=beta,
                active=active,
                depth=depth + 1,
            )

        out = jax.lax.while_loop(cond, body, state)
        return out["film"]

    return run_batch


def render_ptracer(scene, spp=None, seed=0, pack=None):
    """Full particle-traced render; image units match the path tracer.
    `spp` = particles per pixel."""
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    sen = scene.sensor.record
    film_rec = sen.film
    w, h = film_rec.width, film_rec.height

    spp = spp or sen.sampler.sample_count
    n_particles_total = spp * w * h
    batch = min(n_particles_total, 1 << 20)
    n_batches = max(n_particles_total // batch, 1)
    run = make_ptracer_batch(pack, scene.integrator, sen, w, h, seed)

    @jax.jit
    def run_batch(film, batch_idx):
        lane = jnp.arange(batch, dtype=jnp.uint32)
        sidx = jnp.broadcast_to(batch_idx, lane.shape).astype(jnp.uint32)
        return run(film, lane, sidx)

    film = jnp.zeros((h, w, 3), jnp.float32)
    for b in range(n_batches):
        film = run_batch(film, jnp.uint32(b))
    n_used = n_batches * batch
    return np.asarray(film) * (1.0 / n_used)
