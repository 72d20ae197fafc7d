"""Device-side medium sampling: distance sampling, transmittance,
phase functions.

Rebuilds reference src/medium/homogeneous.cpp (closed-form channel-
balance distance sampling, :149-330) and heterogeneous.cpp (Woodcock /
delta tracking, :172) as masked wavefront loops, plus src/phase/{
isotropic,hg,rayleigh}.cpp.

All functions operate per-lane; `med` is the per-lane medium id
(-1 = vacuum, which yields no interaction and transmittance 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import warp
from mitsuba_tpu.medium.plugins import HG, HETEROGENEOUS, RAYLEIGH

INV_FOURPI = 0.25 / jnp.pi
MAX_TRACKING_STEPS = 256


class MediumSample(NamedTuple):
    is_medium: jnp.ndarray  # [R] bool — scattered inside the medium
    t: jnp.ndarray  # [R] sampled distance (== t_max on failure)
    weight: jnp.ndarray  # [R, 3] throughput factor (both outcomes)


def _het_density(pack, p):
    """Trilinear grid lookup of sigma_t at world position p
    (reference gridvolume.cpp lookupFloat)."""
    g = pack.het_grid  # [D, H, W]
    m = pack.het_world_to_grid
    q = p @ m[:3, :3].T + m[:3, 3]  # [R, 3] in [0,1]^3
    d_, h_, w_ = g.shape
    fx = q[..., 0] * w_ - 0.5
    fy = q[..., 1] * h_ - 0.5
    fz = q[..., 2] * d_ - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    ax, ay, az = fx - x0, fy - y0, fz - z0

    def fetch(xi, yi, zi):
        ok = (
            (xi >= 0) & (xi < w_) & (yi >= 0) & (yi < h_)
            & (zi >= 0) & (zi < d_)
        )
        v = g[
            jnp.clip(zi, 0, d_ - 1),
            jnp.clip(yi, 0, h_ - 1),
            jnp.clip(xi, 0, w_ - 1),
        ]
        return jnp.where(ok, v, 0.0)

    c000 = fetch(x0, y0, z0)
    c100 = fetch(x0 + 1, y0, z0)
    c010 = fetch(x0, y0 + 1, z0)
    c110 = fetch(x0 + 1, y0 + 1, z0)
    c001 = fetch(x0, y0, z0 + 1)
    c101 = fetch(x0 + 1, y0, z0 + 1)
    c011 = fetch(x0, y0 + 1, z0 + 1)
    c111 = fetch(x0 + 1, y0 + 1, z0 + 1)
    c00 = c000 * (1 - ax) + c100 * ax
    c10 = c010 * (1 - ax) + c110 * ax
    c01 = c001 * (1 - ax) + c101 * ax
    c11 = c011 * (1 - ax) + c111 * ax
    return (c00 * (1 - ay) + c10 * ay) * (1 - az) + (
        c01 * (1 - ay) + c11 * ay
    ) * az


def sample_distance(pack, med, o, d, t_max, u3, lane, sidx, slot, seed):
    """Sample a scattering distance along each lane's ray.

    Homogeneous: channel-balance analytic sampling
    (reference homogeneous.cpp:275-330).
    Heterogeneous: Woodcock delta tracking — iterate tentative
    collisions; unbiased, weight = single-channel albedo at the real
    collision (reference heterogeneous.cpp:172-199).
    """
    from mitsuba_tpu.core import rng

    r = med.shape[0]
    in_medium = med >= 0
    m = jnp.maximum(med, 0)
    sigma_s = pack.med_sigma_s[m]
    sigma_t = sigma_s + pack.med_sigma_a[m]
    # medium sampling weight: probability of even attempting a medium
    # event (reference homogeneous.cpp:168-181 + :280) — makes purely
    # absorbing media a zero-variance transmittance multiply
    w_med = pack.med_sampling_w[m]

    # --- homogeneous (channel balance) ---
    attempt = u3[..., 0] < w_med
    u_resc = jnp.clip(
        u3[..., 0] / jnp.maximum(w_med, 1e-8), 0.0, mm.ONE_MINUS_EPS
    )
    ch = jnp.minimum((u_resc * 3).astype(jnp.int32), 2)
    st_c = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]
    t_h = -jnp.log(jnp.maximum(1.0 - u3[..., 1], 1e-20)) / jnp.maximum(
        st_c, 1e-20
    )
    success_h = attempt & (t_h < t_max) & (st_c > 0)
    t_h = jnp.where(success_h, t_h, t_max)
    tr_t = jnp.exp(-sigma_t * t_h[..., None])
    pdf_success = w_med * jnp.mean(sigma_t * tr_t, axis=-1)
    tr_max = jnp.exp(-sigma_t * t_max[..., None]) if hasattr(t_max, "shape") and t_max.ndim else jnp.exp(-sigma_t * jnp.broadcast_to(t_max, (r,))[..., None])
    pdf_failure = (1.0 - w_med) + w_med * jnp.mean(tr_max, axis=-1)
    w_success = sigma_s * tr_t / jnp.maximum(pdf_success, 1e-20)[..., None]
    w_failure = tr_max / jnp.maximum(pdf_failure, 1e-20)[..., None]
    w_h = jnp.where(success_h[..., None], w_success, w_failure)

    out_t = jnp.where(in_medium & success_h, t_h, t_max)
    out_w = jnp.where(in_medium[..., None], w_h, 1.0)
    out_med = in_medium & success_h

    # --- heterogeneous (delta tracking) ---
    het_id = pack.meta["het_med_id"]
    if het_id >= 0:
        sigma_max = jnp.float32(max(pack.meta["het_sigma_max"], 1e-9))
        is_het = med == het_id
        # Tracking randomness lives in its own stream so per-step slots
        # can never alias integrator-loop or camera slots (ADVICE r1).
        seed_t = rng.stream_seed(seed, rng.STREAM_MEDIUM_DIST)

        def cond(s):
            t, alive, step, _ = s
            return jnp.any(alive) & (step < MAX_TRACKING_STEPS)

        def body(s):
            t, alive, step, hit_real = s
            u = rng.rand2(
                lane, sidx, slot * MAX_TRACKING_STEPS + step, seed_t
            )
            t_new = t - jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20)) / sigma_max
            beyond = t_new >= t_max
            dens = _het_density(pack, o + d * t_new[..., None])
            real = u[..., 1] < dens / sigma_max
            stop = beyond | real
            hit_real = jnp.where(alive & real & ~beyond, True, hit_real)
            t = jnp.where(alive, jnp.minimum(t_new, t_max), t)
            alive = alive & ~stop
            return t, alive, step + 1, hit_real

        t0 = jnp.zeros(r, jnp.float32)
        alive0 = is_het & in_medium
        t_het, _, _, real_het = jax.lax.while_loop(
            cond, body, (t0, alive0, jnp.int32(0), jnp.zeros(r, bool))
        )
        # Woodcock: transmittance estimator is 1 on failure; on a real
        # collision the scatter weight is the albedo
        w_het = jnp.where(
            real_het[..., None],
            jnp.broadcast_to(pack.het_albedo, (r, 3)),
            jnp.ones((r, 3), jnp.float32),
        )
        out_t = jnp.where(is_het, jnp.where(real_het, t_het, t_max), out_t)
        out_w = jnp.where(is_het[..., None], w_het, out_w)
        out_med = jnp.where(is_het, real_het, out_med)

    return MediumSample(is_medium=out_med, t=out_t, weight=out_w)


def transmittance(pack, med, o, d, dist, lane, sidx, slot, seed):
    """Tr along a segment inside a single medium (shadow rays).

    Homogeneous: closed form.  Heterogeneous: ratio tracking
    (unbiased; reference heterogeneous.cpp evalTransmittance)."""
    from mitsuba_tpu.core import rng

    in_medium = med >= 0
    m = jnp.maximum(med, 0)
    sigma_t = pack.med_sigma_s[m] + pack.med_sigma_a[m]
    tr = jnp.exp(-sigma_t * dist[..., None])

    het_id = pack.meta["het_med_id"]
    if het_id >= 0:
        sigma_max = jnp.float32(max(pack.meta["het_sigma_max"], 1e-9))
        is_het = med == het_id
        seed_t = rng.stream_seed(seed, rng.STREAM_MEDIUM_TRANS)

        def cond(s):
            t, w, alive, step = s
            return jnp.any(alive) & (step < MAX_TRACKING_STEPS)

        def body(s):
            t, w, alive, step = s
            u = rng.rand1(
                lane, sidx, slot * MAX_TRACKING_STEPS + step, seed_t
            )
            t_new = t - jnp.log(jnp.maximum(1.0 - u, 1e-20)) / sigma_max
            beyond = t_new >= dist
            dens = _het_density(pack, o + d * t_new[..., None])
            ratio = jnp.maximum(1.0 - dens / sigma_max, 0.0)
            w = jnp.where(alive & ~beyond, w * ratio, w)
            t = jnp.where(alive, t_new, t)
            alive = alive & ~beyond & (w > 1e-5)
            return t, w, alive, step + 1

        w0 = jnp.ones_like(dist)
        _, w_het, _, _ = jax.lax.while_loop(
            cond,
            body,
            (jnp.zeros_like(dist), w0, is_het, jnp.int32(0)),
        )
        tr = jnp.where(is_het[..., None], w_het[..., None], tr)

    return jnp.where(in_medium[..., None], tr, 1.0)


# --- phase functions ---------------------------------------------------------

def phase_eval(pack, med, wo_dot_wi):
    """Phase value AND pdf (they coincide for normalized phases).

    wo_dot_wi = cos of the angle between the incoming propagation
    direction and the outgoing direction (reference hg.cpp eval uses
    dot(wi, wo) with wi pointing along propagation)."""
    m = jnp.maximum(med, 0)
    g = pack.med_g[m]
    hg = warp.square_to_phase_hg_pdf(wo_dot_wi, g)
    iso = jnp.full_like(wo_dot_wi, INV_FOURPI)
    return jnp.where(jnp.abs(g) > 1e-4, hg, iso)


def phase_sample(pack, med, d_in, u2):
    """Sample an outgoing direction; returns (d_out, pdf).  Weight is 1
    (perfect importance sampling for iso/HG)."""
    m = jnp.maximum(med, 0)
    g = pack.med_g[m]
    # frame around the propagation direction (+z = forward scattering)
    fr = mm.Frame.from_normal(d_in)
    local = warp.square_to_phase_hg(u2, g)
    d_out = fr.to_world(local)
    pdf = phase_eval(pack, med, mm.dot(d_out, d_in))
    return d_out, pdf
