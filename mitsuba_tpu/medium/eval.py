"""Device-side medium sampling: distance sampling, transmittance,
phase functions.

Rebuilds reference src/medium/homogeneous.cpp (closed-form channel-
balance distance sampling, :149-330) and heterogeneous.cpp (Woodcock /
delta tracking, :172) as masked wavefront loops, plus src/phase/{
isotropic,hg,rayleigh}.cpp.

Heterogeneous tracking is TPU-restructured (round 2):
* densities are CORNER-PACKED — each grid base point stores its 2x2x2
  neighborhood as one 8-wide row, so a trilinear lookup is ONE row
  gather instead of 8 scalar gathers (gathers cost ~1000 flops each);
* a SUPERGRID of local majorants (8^3 grid cells per supercell, maxima
  dilated by one cell for trilinear support) drives DDA delta tracking:
  empty/thin supercells are crossed in a single step instead of
  sigma_max-rate null collisions, and any number of heterogeneous
  media per scene is supported (per-lane grid descriptors).

All functions operate per-lane; `med` is the per-lane medium id
(-1 = vacuum, which yields no interaction and transmittance 1).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.gather import take_fused, take_rows
from mitsuba_tpu.medium.plugins import HG, HETEROGENEOUS, RAYLEIGH

INV_FOURPI = 0.25 / jnp.pi
MAX_TRACKING_STEPS = 256  # total tentative collisions (RNG slot space)
# tentative collisions per sequential loop iteration — sequential-loop
# latency dominates tracking cost, so bigger batches trade one larger
# corner gather for fewer iterations
TRACK_BATCH = int(os.environ.get("MTS_TRACK_BATCH", 4))


class MediumSample(NamedTuple):
    is_medium: jnp.ndarray  # [R] bool — scattered inside the medium
    t: jnp.ndarray  # [R] sampled distance (== t_max on failure)
    weight: jnp.ndarray  # [R, 3] throughput factor (both outcomes)


def _het_params(pack, med):
    """Per-lane heterogeneous-grid descriptors (multi-medium)."""
    m = jnp.maximum(med, 0)
    slot = jnp.where(med >= 0, take_rows(pack.med_het_slot, m), -1)
    s = jnp.maximum(slot, 0)
    w2g, albedo, dims, sdims, cbase, sbase, smax = take_fused(
        s, pack.het_w2g, pack.het_albedo, pack.het_dims, pack.het_sdims,
        pack.het_cbase, pack.het_sbase, pack.het_smax,
    )
    return {
        "slot": slot,
        "w2g": w2g,  # [R, 12] row-major 3x4
        "albedo": albedo,
        "dims": dims.astype(jnp.float32),  # [R, 3] (D, H, W)
        "sdims": sdims,  # [R, 3] int
        "cbase": cbase,
        "sbase": sbase,
        "smax": smax,
    }


def _to_grid(hp, p):
    """World position -> grid-normalized coords q in [0,1]^3 (per-lane
    affine 3x4)."""
    w = hp["w2g"]
    x = (
        w[..., 0] * p[..., 0] + w[..., 1] * p[..., 1]
        + w[..., 2] * p[..., 2] + w[..., 3]
    )
    y = (
        w[..., 4] * p[..., 0] + w[..., 5] * p[..., 1]
        + w[..., 6] * p[..., 2] + w[..., 7]
    )
    z = (
        w[..., 8] * p[..., 0] + w[..., 9] * p[..., 1]
        + w[..., 10] * p[..., 2] + w[..., 11]
    )
    return jnp.stack([x, y, z], axis=-1)


def _to_grid_dir(hp, d):
    w = hp["w2g"]
    x = w[..., 0] * d[..., 0] + w[..., 1] * d[..., 1] + w[..., 2] * d[..., 2]
    y = w[..., 4] * d[..., 0] + w[..., 5] * d[..., 1] + w[..., 6] * d[..., 2]
    z = w[..., 8] * d[..., 0] + w[..., 9] * d[..., 1] + w[..., 10] * d[..., 2]
    return jnp.stack([x, y, z], axis=-1)


def _het_density_q(pack, hp, q):
    """Trilinear density at grid-normalized q — ONE corner-row gather
    (reference gridvolume.cpp lookupFloat)."""
    D_ = hp["dims"][..., 0]
    H_ = hp["dims"][..., 1]
    W_ = hp["dims"][..., 2]
    fx = q[..., 0] * W_ - 0.5
    fy = q[..., 1] * H_ - 0.5
    fz = q[..., 2] * D_ - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    ax, ay, az = fx - x0, fy - y0, fz - z0
    inb = (
        (x0 >= -1.0) & (x0 <= W_ - 1.0)
        & (y0 >= -1.0) & (y0 <= H_ - 1.0)
        & (z0 >= -1.0) & (z0 <= D_ - 1.0)
    )
    xi = jnp.clip(x0, -1.0, W_ - 1.0) + 1.0
    yi = jnp.clip(y0, -1.0, H_ - 1.0) + 1.0
    zi = jnp.clip(z0, -1.0, D_ - 1.0) + 1.0
    cell = hp["cbase"] + (
        (zi * (H_ + 1.0) + yi) * (W_ + 1.0) + xi
    ).astype(jnp.int32)
    n = pack.het_corners.shape[0]
    c8 = pack.het_corners[jnp.clip(cell, 0, n - 1)]  # [R, 8]
    bx, by, bz = ax[..., None], ay[..., None], az[..., None]
    c_y = c8[..., 0::2] * (1 - bx) + c8[..., 1::2] * bx  # [R,4] (z,y)
    c_z = c_y[..., 0::2] * (1 - by) + c_y[..., 1::2] * by  # [R,2] (z)
    dens = c_z[..., 0] * (1 - az) + c_z[..., 1] * az
    return jnp.where(inb, dens, 0.0)


def _super_lookup(pack, hp, q, B):
    """Local majorant + supercell exit bounds at grid-normalized q.
    Returns (sigma_loc, lo_q [R,3], hi_q [R,3])."""
    # grid-index coords per axis (x, y, z) with dims (D, H, W)
    gx = q[..., 0] * hp["dims"][..., 2]
    gy = q[..., 1] * hp["dims"][..., 1]
    gz = q[..., 2] * hp["dims"][..., 0]
    sD = hp["sdims"][..., 0]
    sH = hp["sdims"][..., 1]
    sW = hp["sdims"][..., 2]
    sx = jnp.clip(jnp.floor(gx / B).astype(jnp.int32), 0, sW - 1)
    sy = jnp.clip(jnp.floor(gy / B).astype(jnp.int32), 0, sH - 1)
    sz = jnp.clip(jnp.floor(gz / B).astype(jnp.int32), 0, sD - 1)
    scell = hp["sbase"] + (sz * sH + sy) * sW + sx
    n = pack.het_super.shape[0]
    sig = pack.het_super[jnp.clip(scell, 0, n - 1)]
    lo = jnp.stack(
        [
            sx.astype(jnp.float32) * B / hp["dims"][..., 2],
            sy.astype(jnp.float32) * B / hp["dims"][..., 1],
            sz.astype(jnp.float32) * B / hp["dims"][..., 0],
        ],
        axis=-1,
    )
    hi = jnp.stack(
        [
            (sx + 1).astype(jnp.float32) * B / hp["dims"][..., 2],
            (sy + 1).astype(jnp.float32) * B / hp["dims"][..., 1],
            (sz + 1).astype(jnp.float32) * B / hp["dims"][..., 0],
        ],
        axis=-1,
    )
    return sig, lo, hi


def _slab(qo, qd, lo, hi):
    """Ray-box slab test in grid coords; returns (t_enter, t_exit)."""
    inv = 1.0 / jnp.where(jnp.abs(qd) < 1e-12, 1e-12, qd)
    t0 = (lo - qo) * inv
    t1 = (hi - qo) * inv
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    return tn, tf


def _het_track(pack, hp, o, d, t_max, lane, sidx, slot, seed_t, ratio):
    """Supergrid-DDA delta tracking shared by distance sampling
    (ratio=False: stop at the first real collision) and transmittance
    estimation (ratio=True: accumulate null ratios).

    Each sequential loop iteration draws TRACK_BATCH tentative
    collisions inside the current supercell at once (their densities
    come back in one batched corner gather) — sequential-loop latency,
    not per-step flops, dominates tracking cost on TPU.

    Returns (t, hit_real, w_ratio)."""
    from mitsuba_tpu.core import rng

    r = o.shape[0]
    B = float(pack.meta["het_super_b"])
    K = TRACK_BATCH
    qo = _to_grid(hp, o)
    qd = _to_grid_dir(hp, d)
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)

    is_het = hp["slot"] >= 0
    tn, tf = _slab(qo, qd, jnp.zeros_like(qo), jnp.ones_like(qo))
    t_enter = jnp.maximum(tn, 0.0)
    t_lim = jnp.minimum(t_max, tf)
    hits_box = is_het & (tf > t_enter) & (t_enter < t_max)

    # boundary-crossing epsilon: a small fraction of one supercell
    cell_t = B / jnp.maximum(
        (jnp.abs(qd) * hp["dims"][..., ::-1]).max(axis=-1), 1e-12
    )
    eps_t = 1e-3 * cell_t
    max_iters = MAX_TRACKING_STEPS // K

    hp_k = {
        k: (v[:, None] if v.ndim == 1 else v[:, None, :])
        for k, v in hp.items()
    }

    def cond(s):
        t, alive, step, hit_real, w = s
        return jnp.any(alive) & (step < max_iters)

    n4 = (K + 3) // 4  # rand4 calls per K-batch

    def body(s):
        t, alive, step, hit_real, w = s

        def draw(base):
            parts = []
            for j in range(n4):
                u_ = rng.rand4(
                    lane, sidx,
                    slot * MAX_TRACKING_STEPS
                    + (2 * step + base) * n4 + j,
                    seed_t,
                )
                parts.append(jnp.stack(
                    [u_[..., 0], u_[..., 1], u_[..., 2], u_[..., 3]],
                    axis=-1,
                ))
            return jnp.concatenate(parts, axis=-1)[..., :K]

        u_jump = draw(0)  # [R, K]
        u_acc = draw(1)
        q = qo + qd * t[..., None]
        sig, lo, hi = _super_lookup(pack, hp, q, B)
        _, t_exit = _slab(qo, qd, lo, hi)
        # the local majorant only bounds density INSIDE this supercell —
        # candidates past the boundary are free flights to the next cell
        t_exit = jnp.maximum(t_exit, t)

        # K cumulative exponential jumps with the cell's majorant
        delta = -jnp.log(jnp.maximum(1.0 - u_jump, 1e-20)) / jnp.maximum(
            sig, 1e-20
        )[..., None]
        t_c = t[..., None] + jnp.cumsum(delta, axis=-1)  # [R, K]
        in_cell = (
            (sig > 0.0)[..., None]
            & (t_c <= t_exit[..., None])
            & (t_c < t_lim[..., None])
        )
        # densities at all K candidates — one batched corner gather
        q_c = qo[:, None, :] + qd[:, None, :] * t_c[..., None]  # [R, K, 3]
        dens = _het_density_q(pack, hp_k, q_c)  # [R, K]
        frac = dens / jnp.maximum(sig, 1e-20)[..., None]

        if ratio:
            # ratio tracking: every in-cell candidate is a null collision
            mult = jnp.where(in_cell, jnp.maximum(1.0 - frac, 0.0), 1.0)
            w = jnp.where(alive, w * jnp.prod(mult, axis=-1), w)
            # advance to the cell boundary once the batch leaves the cell,
            # else continue from the last candidate
            all_in = in_cell[..., K - 1]
            t_new = jnp.where(all_in, t_c[..., K - 1], t_exit + eps_t)
            beyond = t_new >= t_lim
            t = jnp.where(alive, jnp.minimum(t_new, t_lim), t)
            alive = alive & ~beyond & (w > 1e-5)
        else:
            real_k = in_cell & (u_acc < frac)
            any_real = jnp.any(real_k, axis=-1)
            first = jnp.argmax(real_k, axis=-1)
            t_real = jnp.take_along_axis(t_c, first[..., None], -1)[..., 0]
            all_in = in_cell[..., K - 1]
            t_new = jnp.where(
                any_real,
                t_real,
                jnp.where(all_in, t_c[..., K - 1], t_exit + eps_t),
            )
            beyond = t_new >= t_lim
            hit_real = hit_real | (alive & any_real & ~beyond)
            t = jnp.where(alive, jnp.minimum(t_new, t_lim), t)
            alive = alive & ~beyond & ~any_real
        return t, alive, step + 1, hit_real, w

    state = (
        t_enter,
        hits_box,
        jnp.int32(0),
        jnp.zeros(r, bool),
        jnp.ones(r, jnp.float32),
    )
    t, _, _, hit_real, w = jax.lax.while_loop(cond, body, state)
    return t, hit_real, w


def sample_distance(pack, med, o, d, t_max, u3, lane, sidx, slot, seed):
    """Sample a scattering distance along each lane's ray.

    Homogeneous: channel-balance analytic sampling
    (reference homogeneous.cpp:275-330).
    Heterogeneous: Woodcock delta tracking over supergrid majorants —
    unbiased, weight = albedo at the real collision
    (reference heterogeneous.cpp:172-199).
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

    # --- homogeneous free-path sampling ---
    # Strategies (reference homogeneous.cpp:149-153 + :275-345):
    #   0 balance — exponential with a uniformly-picked channel's rate
    #   1 fixed   — exponential with one rate (ESingle / EManual)
    #   2 maximum — max-of-exponentials mixture (maxexp.h)
    # All are wrapped by the medium sampling weight w_med.  pdf always
    # describes the realized density, so any strategy is unbiased; the
    # choice only moves variance.
    strategies = pack.meta.get("hom_strategies", (0,))
    attempt = u3[..., 0] < w_med
    u_resc = jnp.clip(
        u3[..., 0] / jnp.maximum(w_med, 1e-8), 0.0, mm.ONE_MINUS_EPS
    )

    # balance: pick a channel, sample its exponential
    ch = jnp.minimum((u_resc * 3).astype(jnp.int32), 2)
    st_c = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]

    strat = pack.med_strategy[m]
    if 1 in strategies:
        dens = pack.med_density[m]
        st_c = jnp.where(strat == 1, dens, st_c)
    neg_log = -jnp.log(jnp.maximum(1.0 - u3[..., 1], 1e-20))
    t_h = neg_log / jnp.maximum(st_c, 1e-20)

    if 2 in strategies:
        # max-of-exponentials: pick the dominating interval by CDF,
        # then invert that interval's exponential (maxexp.h:60-74)
        mxs = pack.med_mx_sigma[m]  # [R, 3] descending rates
        mxi = pack.med_mx_istart[m]  # [R, 3]
        mxc = pack.med_mx_cdf[m]  # [R, 4] normalized knots
        mxn = pack.med_mx_norm[m]  # [R]
        u1 = jnp.clip(u3[..., 1], 0.0, mm.ONE_MINUS_EPS)
        idx = jnp.sum(
            (u1[..., None] >= mxc[..., 1:3]).astype(jnp.int32), axis=-1
        )
        s_i = jnp.take_along_axis(mxs, idx[..., None], -1)[..., 0]
        i_i = jnp.take_along_axis(mxi, idx[..., None], -1)[..., 0]
        c_i = jnp.take_along_axis(mxc, idx[..., None], -1)[..., 0]
        arg = jnp.exp(-i_i * s_i) - mxn * (u1 - c_i)
        t_mx = -jnp.log(jnp.maximum(arg, 1e-30)) / jnp.maximum(
            s_i, 1e-20
        )
        t_h = jnp.where(strat == 2, t_mx, t_h)
        st_c = jnp.where(strat == 2, s_i, st_c)

    success_h = attempt & (t_h < t_max) & (st_c > 0)
    t_h = jnp.where(success_h, t_h, t_max)
    tr_t = jnp.exp(-sigma_t * t_h[..., None])
    t_max_b = jnp.broadcast_to(t_max, (r,))
    tr_max = jnp.exp(-sigma_t * t_max_b[..., None])

    # balance pdfs (mean over channels)
    pdf_success = jnp.mean(sigma_t * tr_t, axis=-1)
    pdf_failure_g = jnp.mean(tr_max, axis=-1)
    if 1 in strategies:
        dens = pack.med_density[m]
        ps_fx = dens * jnp.exp(-dens * t_h)
        pf_fx = jnp.exp(-dens * t_max_b)
        pdf_success = jnp.where(strat == 1, ps_fx, pdf_success)
        pdf_failure_g = jnp.where(strat == 1, pf_fx, pdf_failure_g)
    if 2 in strategies:
        # pdf(t) = s_k e^{-s_k t}/Z on the interval containing t;
        # failure pdf = 1 - CDF(t_max) (maxexp.h:77-97)
        def _mx_pdf_cdf(t):
            k = jnp.sum(
                (t[..., None] >= mxi[..., 1:3]).astype(jnp.int32),
                axis=-1,
            )
            s_k = jnp.take_along_axis(mxs, k[..., None], -1)[..., 0]
            c_k = jnp.take_along_axis(mxc, k[..., None], -1)[..., 0]
            s_km1 = jnp.take_along_axis(
                mxs, jnp.maximum(k - 1, 0)[..., None], -1
            )[..., 0]
            lower = jnp.where(
                k == 0,
                -1.0,
                -jnp.power(
                    s_k / jnp.maximum(s_km1, 1e-20),
                    -s_k / jnp.where(
                        jnp.abs(s_k - s_km1) > 1e-20, s_k - s_km1, 1.0
                    ),
                ),
            )
            upper = -jnp.exp(-s_k * t)
            pdf = s_k * jnp.exp(-s_k * t) / jnp.maximum(mxn, 1e-20)
            cdf = c_k + (upper - lower) / jnp.maximum(mxn, 1e-20)
            return pdf, cdf
        ps_mx, _ = _mx_pdf_cdf(t_h)
        _, cdf_max = _mx_pdf_cdf(t_max_b)
        pdf_success = jnp.where(strat == 2, ps_mx, pdf_success)
        pdf_failure_g = jnp.where(
            strat == 2, jnp.clip(1.0 - cdf_max, 0.0, 1.0), pdf_failure_g
        )

    pdf_success = w_med * pdf_success
    pdf_failure = (1.0 - w_med) + w_med * pdf_failure_g
    w_success = sigma_s * tr_t / jnp.maximum(pdf_success, 1e-20)[..., None]
    w_failure = tr_max / jnp.maximum(pdf_failure, 1e-20)[..., None]
    w_h = jnp.where(success_h[..., None], w_success, w_failure)

    out_t = jnp.where(in_medium & success_h, t_h, t_max)
    out_w = jnp.where(in_medium[..., None], w_h, 1.0)
    out_med = in_medium & success_h

    # --- heterogeneous (supergrid delta tracking) ---
    if pack.meta.get("n_het", 0) > 0:
        hp = _het_params(pack, med)
        is_het = in_medium & (hp["slot"] >= 0)
        # Tracking randomness lives in its own stream so per-step slots
        # can never alias integrator-loop or camera slots (ADVICE r1).
        seed_t = rng.stream_seed(seed, rng.STREAM_MEDIUM_DIST)
        t_het, real_het, _ = _het_track(
            pack, hp, o, d, t_max, lane, sidx, slot, seed_t, ratio=False
        )
        # Woodcock: transmittance estimator is 1 on failure; on a real
        # collision the scatter weight is the albedo
        w_het = jnp.where(
            real_het[..., None], hp["albedo"], jnp.ones((r, 3), jnp.float32)
        )
        out_t = jnp.where(
            is_het,
            jnp.where(real_het, t_het, jnp.broadcast_to(t_max, (r,))),
            out_t,
        )
        out_w = jnp.where(is_het[..., None], w_het, out_w)
        out_med = jnp.where(is_het, real_het & is_het, out_med)

    return MediumSample(is_medium=out_med, t=out_t, weight=out_w)


# composite-Simpson intervals for method="simpson" transmittance.
# Measured on the 128^3 smoke bench: 64 -> 32 cuts the 64spp frame
# from 199 s to 126 s at identical RMSE (16 gives 104 s, also
# indistinguishable there, but the bias budget thins — keep 32 unless
# the grid is coarse)
QUAD_STEPS = int(os.environ.get("MTS_QUAD_STEPS", 32))


def _het_transmittance_quad(pack, hp, o, d, dist, n_steps=None):
    """Deterministic composite-Simpson transmittance
    (reference heterogeneous.cpp:546-548 ESimpsonQuadrature /
    integrateDensity).  One batched corner gather over n_steps+1
    points replaces 10-20 sequential tracking iterations — and the
    zero-variance Tr removes tracking noise from every NEE estimate."""
    n_steps = n_steps or QUAD_STEPS
    r = o.shape[0]
    qo = _to_grid(hp, o)
    qd = _to_grid_dir(hp, d)
    dist = jnp.broadcast_to(dist, (r,)).astype(jnp.float32)
    tn, tf = _slab(qo, qd, jnp.zeros_like(qo), jnp.ones_like(qo))
    t0 = jnp.maximum(tn, 0.0)
    t1 = jnp.minimum(dist, tf)
    seg = jnp.maximum(t1 - t0, 0.0)

    m = n_steps  # even number of Simpson intervals
    frac = jnp.arange(m + 1, dtype=jnp.float32) / m  # [M+1]
    ts = t0[:, None] + seg[:, None] * frac[None, :]  # [R, M+1]
    hp_k = {
        k: (v[:, None] if v.ndim == 1 else v[:, None, :])
        for k, v in hp.items()
    }
    q = qo[:, None, :] + qd[:, None, :] * ts[..., None]  # [R, M+1, 3]
    dens = _het_density_q(pack, hp_k, q)  # [R, M+1]
    w = np.ones(m + 1, np.float32)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    tau = (dens * jnp.asarray(w)[None, :]).sum(-1) * (seg / (3.0 * m))
    return jnp.exp(-tau)


def transmittance(pack, med, o, d, dist, lane, sidx, slot, seed):
    """Tr along a segment inside a single medium (shadow rays).

    Homogeneous: closed form.  Heterogeneous: ratio tracking with local
    majorants (unbiased; reference heterogeneous.cpp evalTransmittance),
    or deterministic Simpson quadrature when the scene's media request
    method="simpson" (static per-scene dispatch)."""
    from mitsuba_tpu.core import rng

    in_medium = med >= 0
    m = jnp.maximum(med, 0)
    sigma_t = pack.med_sigma_s[m] + pack.med_sigma_a[m]
    tr = jnp.exp(-sigma_t * dist[..., None])

    if pack.meta.get("n_het", 0) > 0:
        hp = _het_params(pack, med)
        is_het = in_medium & (hp["slot"] >= 0)
        if pack.meta.get("het_simpson", False):
            w_het = _het_transmittance_quad(pack, hp, o, d, dist)
        else:
            seed_t = rng.stream_seed(seed, rng.STREAM_MEDIUM_TRANS)
            _, _, w_het = _het_track(
                pack, hp, o, d, dist, lane, sidx, slot, seed_t, ratio=True
            )
        tr = jnp.where(is_het[..., None], w_het[..., None], tr)

    return jnp.where(in_medium[..., None], tr, 1.0)


# --- phase functions ---------------------------------------------------------

def _phase_eval_one(kind, g, wo_dot_wi):
    """Single-component phase value/pdf (iso / HG / Rayleigh)."""
    hg = warp.square_to_phase_hg_pdf(wo_dot_wi, g)
    iso = jnp.full_like(wo_dot_wi, INV_FOURPI)
    # Rayleigh: 3/(16 pi) (1 + cos^2)  (reference src/phase/rayleigh.cpp)
    ray = 3.0 / (16.0 * jnp.pi) * (1.0 + wo_dot_wi * wo_dot_wi)
    out = jnp.where((kind == HG) & (jnp.abs(g) > 1e-4), hg, iso)
    return jnp.where(kind == RAYLEIGH, ray, out)


def _phase_eval_dot(pack, med, wo_dot_wi):
    """Scalar-kind phase value AND pdf (they coincide for normalized
    phases; an N-ary mixturephase blends by its leaf weights).

    wo_dot_wi = cos of the angle between the incoming propagation
    direction and the outgoing direction (reference hg.cpp eval uses
    dot(wi, wo) with wi pointing along propagation)."""
    m = jnp.maximum(med, 0)
    kinds = pack.med_ph_kinds[m]  # [R, C]
    gs = pack.med_ph_gs[m]
    ws = pack.med_ph_ws[m]
    out = jnp.zeros_like(wo_dot_wi)
    for ci in range(kinds.shape[-1]):
        p_i = _phase_eval_one(kinds[..., ci], gs[..., ci], wo_dot_wi)
        out = out + jnp.where(kinds[..., ci] >= 0, ws[..., ci] * p_i, 0.0)
    return out


# --- fiber phases (kkay / microflake) on orientation volumes ----------------

def _has_fiber_phases(pack):
    from mitsuba_tpu.medium.plugins import KKAY, MICROFLAKE

    meta = getattr(pack, "meta", None) or {}
    pk = meta.get("phase_kinds", ())
    return (KKAY in pk) or (MICROFLAKE in pk)


def _orient_at(pack, med, p):
    """Unit fiber orientation at world position p from the medium's
    corner-packed orientation grid (trilinear, normalized after
    interpolation like the reference gridvolume lookupVector).
    Returns (axis [R,3], valid [R])."""
    hp = _het_params(pack, med)
    m = jnp.maximum(med, 0)
    slot = jnp.maximum(hp["slot"], 0)
    obase = pack.het_obase[slot]
    odims = pack.het_odims[slot].astype(jnp.float32)
    q = _to_grid(hp, p)
    D_, H_, W_ = odims[..., 0], odims[..., 1], odims[..., 2]
    fx = q[..., 0] * W_ - 0.5
    fy = q[..., 1] * H_ - 0.5
    fz = q[..., 2] * D_ - 0.5
    x0, y0, z0 = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    ax, ay, az = fx - x0, fy - y0, fz - z0
    xi = jnp.clip(x0, -1.0, W_ - 1.0) + 1.0
    yi = jnp.clip(y0, -1.0, H_ - 1.0) + 1.0
    zi = jnp.clip(z0, -1.0, D_ - 1.0) + 1.0
    cell = obase + (
        (zi * (H_ + 1.0) + yi) * (W_ + 1.0) + xi
    ).astype(jnp.int32)
    n = pack.het_ocorners.shape[0]
    c = pack.het_ocorners[jnp.clip(cell, 0, n - 1)]  # [R, 24]
    c = c.reshape(c.shape[:-1] + (8, 3))
    bx, by = ax[..., None, None], ay[..., None, None]
    cy = c[..., 0::2, :] * (1 - bx) + c[..., 1::2, :] * bx  # [R,4,3]
    cz = cy[..., 0::2, :] * (1 - by) + cy[..., 1::2, :] * by  # [R,2,3]
    v = (
        cz[..., 0, :] * (1 - az)[..., None]
        + cz[..., 1, :] * az[..., None]
    )
    ln = jnp.linalg.norm(v, axis=-1)
    valid = (obase >= 0) & (ln > 1e-6) & (hp["slot"] >= 0)
    axis = v / jnp.maximum(ln, 1e-12)[..., None]
    return axis, valid


def _flake_d(pack, m, c):
    """Gaussian fiber flake-normal density D(cos) on the sphere."""
    s = pack.med_flake_stddev[m]
    return pack.med_flake_norm[m] * jnp.exp(
        -c * c / (2.0 * s * s)
    )


def _flake_sigt(pack, m, cos_w):
    """sigma_t(|cos theta_w|) from the per-medium quadrature LUT."""
    lut = pack.med_flake_sigt[m]  # [R, FLAKE_LUT]
    n = lut.shape[-1]
    x = jnp.clip(jnp.abs(cos_w), 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    fr = x - i0.astype(jnp.float32)
    a = jnp.take_along_axis(lut, i0[..., None], axis=-1)[..., 0]
    b = jnp.take_along_axis(lut, (i0 + 1)[..., None], axis=-1)[..., 0]
    return a * (1.0 - fr) + b * fr


def _kkay_eval(pack, m, axis, valid, wi, wo):
    """Kajiya-Kay: kd/4pi + ks*norm*max(0, cos(cone angle))^exp with the
    specular cone mirrored about the fiber plane (kkay.cpp eval).  The
    cone dot collapses to zR*zo + sqrt((1-zR^2)(1-zo^2)) because R
    shares wo's azimuth about the fiber."""
    kd = pack.med_ph_kd[m]
    ks = pack.med_ph_ks[m]
    zR = -mm.dot(wi, axis)
    zo = mm.dot(wo, axis)
    cone = zR * zo + jnp.sqrt(
        jnp.maximum((1.0 - zR * zR) * (1.0 - zo * zo), 0.0)
    )
    spec = (
        jnp.maximum(cone, 0.0) ** pack.med_ph_exp[m]
        * pack.med_ph_knorm[m] * ks
    )
    diff = kd * INV_FOURPI
    return jnp.where(valid, spec + diff, diff)


def _microflake_eval(pack, m, axis, valid, wi, wo):
    """Specular microflakes: 0.5 D(cos_H)/sigma_t(cos_wi) in the fiber
    frame (microflake.cpp eval)."""
    h = wi + wo
    hl = jnp.linalg.norm(h, axis=-1)
    ch = mm.dot(h, axis) / jnp.maximum(hl, 1e-9)
    cwi = mm.dot(wi, axis)
    val = 0.5 * _flake_d(pack, m, ch) / jnp.maximum(
        _flake_sigt(pack, m, cwi), 1e-9
    )
    return jnp.where(valid & (hl > 1e-9), val, 0.0)


def phase_eval(pack, med, d_in, d_out, p=None):
    """Phase function value.  d_in = propagation direction INTO the
    event, d_out = outgoing direction, p = world position (fiber phases
    read the orientation volume there)."""
    from mitsuba_tpu.medium.plugins import KKAY, MICROFLAKE

    m = jnp.maximum(med, 0)
    out = _phase_eval_dot(pack, med, mm.dot(d_out, d_in))
    if _has_fiber_phases(pack) and p is not None:
        axis, valid = _orient_at(pack, med, p)
        wi = -d_in
        kind = pack.med_phase[m]
        pk = pack.meta.get("phase_kinds", ())
        if KKAY in pk:
            out = jnp.where(
                kind == KKAY,
                _kkay_eval(pack, m, axis, valid, wi, d_out), out,
            )
        if MICROFLAKE in pk:
            out = jnp.where(
                kind == MICROFLAKE,
                _microflake_eval(pack, m, axis, valid, wi, d_out), out,
            )
    return out


def phase_pdf(pack, med, d_in, d_out, p=None):
    """Directional sampling density of phase_sample (for MIS): equals
    phase_eval for the perfectly-sampled kinds; kkay samples uniformly
    (kkay.cpp sample); microflake samples flake normals from D."""
    from mitsuba_tpu.medium.plugins import KKAY, MICROFLAKE

    m = jnp.maximum(med, 0)
    out = _phase_eval_dot(pack, med, mm.dot(d_out, d_in))
    if _has_fiber_phases(pack) and p is not None:
        axis, valid = _orient_at(pack, med, p)
        wi = -d_in
        kind = pack.med_phase[m]
        pk = pack.meta.get("phase_kinds", ())
        if KKAY in pk:
            out = jnp.where(kind == KKAY, INV_FOURPI, out)
        if MICROFLAKE in pk:
            h = wi + d_out
            hl = jnp.maximum(jnp.linalg.norm(h, axis=-1), 1e-9)
            hn = h / hl[..., None]
            ch = mm.dot(hn, axis)
            # both flake normals +-m mirror wi onto the same wo, so
            # the wo-density doubles: D/(2|wi.h|)
            pdf_m = _flake_d(pack, m, ch) / jnp.maximum(
                2.0 * jnp.abs(mm.dot(wi, hn)), 1e-6
            )
            out = jnp.where(
                kind == MICROFLAKE, jnp.where(valid, pdf_m, 0.0), out
            )
    return out


def _rayleigh_sample_cos(u):
    """Invert the Rayleigh CDF: mu^3 + 3 mu = 8u - 4 (Cardano, single
    real root; reference rayleigh.cpp:sample)."""
    q_half = 2.0 - 4.0 * u  # = q/2 with q = -(8u-4)
    a = -q_half + jnp.sqrt(q_half * q_half + 1.0)
    cb = jnp.cbrt(a)
    return jnp.clip(cb - 1.0 / cb, -1.0, 1.0)


def _phase_local_dir(kind, g, u2):
    """Local direction (+z = forward) for a single phase component."""
    local = warp.square_to_phase_hg(u2, g)  # handles iso via g=0
    ct_r = _rayleigh_sample_cos(u2[..., 0])
    st_r = jnp.sqrt(jnp.maximum(1.0 - ct_r * ct_r, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    local_r = jnp.stack(
        [st_r * jnp.cos(phi), st_r * jnp.sin(phi), ct_r], axis=-1
    )
    return jnp.where((kind == RAYLEIGH)[..., None], local_r, local)


def phase_sample(pack, med, d_in, u2, p=None):
    """Sample an outgoing direction; returns (d_out, pdf, weight).

    weight = phase/pdf: 1 for the perfectly-sampled scalar kinds
    (mixtures pick a component stochastically with the first uniform,
    so the pdf is the blended density of the drawn direction); kkay
    samples uniformly with weight = 4pi * eval (kkay.cpp sample);
    microflake draws a flake normal from D by erfinv inversion and
    mirrors, weight = 2|wi.m|/sigma_t."""
    from mitsuba_tpu.medium.plugins import KKAY, MICROFLAKE

    m = jnp.maximum(med, 0)
    kind = pack.med_phase[m]
    kinds = pack.med_ph_kinds[m]  # [R, C]
    gs = pack.med_ph_gs[m]
    ws = pack.med_ph_ws[m]
    # stochastic leaf selection over the weight CDF, remapping u0 to
    # preserve stratification within the chosen leaf
    cum = jnp.cumsum(ws, axis=-1)  # [R, C]
    u0 = u2[..., 0]
    sel = jnp.sum(
        (u0[..., None] >= cum[..., :-1]).astype(jnp.int32), axis=-1
    )
    sel = jnp.minimum(
        sel, jnp.maximum(jnp.sum((kinds >= 0).astype(jnp.int32), -1) - 1, 0)
    )
    lo_c = jnp.where(
        sel > 0,
        jnp.take_along_axis(
            cum, jnp.maximum(sel - 1, 0)[..., None], -1
        )[..., 0],
        0.0,
    )
    w_sel = jnp.take_along_axis(ws, sel[..., None], -1)[..., 0]
    u0 = (u0 - lo_c) / jnp.maximum(w_sel, 1e-8)
    u2r = jnp.stack([jnp.clip(u0, 0.0, mm.ONE_MINUS_EPS), u2[..., 1]], -1)
    kind_sel = jnp.maximum(
        jnp.take_along_axis(kinds, sel[..., None], -1)[..., 0], 0
    )
    g_sel = jnp.take_along_axis(gs, sel[..., None], -1)[..., 0]
    # frame around the propagation direction (+z = forward scattering)
    fr = mm.Frame.from_normal(d_in)
    local = _phase_local_dir(kind_sel, g_sel, u2r)
    d_out = fr.to_world(local)
    pdf = _phase_eval_dot(pack, med, mm.dot(d_out, d_in))
    weight = jnp.ones_like(pdf)

    if _has_fiber_phases(pack) and p is not None:
        from jax.scipy.special import erf, erfinv

        axis, valid = _orient_at(pack, med, p)
        wi = -d_in
        pk = pack.meta.get("phase_kinds", ())
        if KKAY in pk:
            d_uni = warp.square_to_uniform_sphere(u2)
            f_k = _kkay_eval(pack, m, axis, valid, wi, d_uni)
            is_k = kind == KKAY
            d_out = jnp.where(is_k[..., None], d_uni, d_out)
            pdf = jnp.where(is_k, INV_FOURPI, pdf)
            weight = jnp.where(is_k, f_k * (4.0 * jnp.pi), weight)
        if MICROFLAKE in pk:
            s_ = pack.med_flake_stddev[m]
            t = 2.0 * u2[..., 0] - 1.0
            c = jnp.sqrt(2.0) * s_ * erfinv(
                jnp.clip(t, -mm.ONE_MINUS_EPS, mm.ONE_MINUS_EPS)
                * erf(1.0 / (jnp.sqrt(2.0) * s_))
            )
            c = jnp.clip(c, -mm.ONE_MINUS_EPS, mm.ONE_MINUS_EPS)
            st_ = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
            phi = 2.0 * jnp.pi * u2[..., 1]
            fr_f = mm.Frame.from_normal(axis)
            m_fl = fr_f.to_world(jnp.stack(
                [st_ * jnp.cos(phi), st_ * jnp.sin(phi), c], axis=-1
            ))
            dwm = mm.dot(wi, m_fl)
            wo_f = 2.0 * dwm[..., None] * m_fl - wi
            pdf_f = _flake_d(pack, m, c) / jnp.maximum(
                2.0 * jnp.abs(dwm), 1e-6
            )
            w_f = jnp.abs(dwm) / jnp.maximum(
                _flake_sigt(pack, m, mm.dot(wi, axis)), 1e-9
            )
            is_f = kind == MICROFLAKE
            ok_f = valid & (jnp.abs(dwm) > 1e-6)
            d_out = jnp.where(is_f[..., None], wo_f, d_out)
            pdf = jnp.where(is_f, jnp.where(ok_f, pdf_f, 0.0), pdf)
            weight = jnp.where(is_f, jnp.where(ok_f, w_f, 0.0), weight)
    return d_out, pdf, weight
