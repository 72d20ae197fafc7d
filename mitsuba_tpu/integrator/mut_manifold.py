"""Manifold perturbation for MLT (Jakob & Marschner 2012, MEMLT).

Rebuild of the reference's manifold mutation strategy
(include/mitsuba/bidir/mut_manifold.h:36, src/libbidir/mut_manifold.cpp)
for the primary-sample chain machinery in integrator/mlt.py:

The move targets paths of the form  camera - D - S..S - B - ...  where
D is a cosine-sampled vertex (diffuse/roughdiffuse), S..S is a chain of
1..KMAX delta vertices (smooth conductor/dielectric), and B is the
first non-delta vertex after the chain (a light surface or another
scatterer).  It perturbs the image-plane position (moving D across its
surface) and re-solves the delta chain with a batched Newton manifold
walk (integrator/manifold.py machinery, generalized to per-lane
reflect/refract signatures) so the chain still lands EXACTLY on B —
the move primary-space perturbations cannot make, because wiggling D's
outgoing direction almost never re-hits a small light through glass.

The solved world direction at D is written back into the chain's
primary-sample tensor by inverting the cosine-hemisphere warp
(core/warp.py cosine_hemisphere_to_square), so the chain state stays a
plain U row and every other mutation keeps working on it.

Acceptance: with the path re-parametrized by (image position, B, the
path suffix), the target density transforms by the cosine sampling pdf
at D and the generalized geometric factor |det d(B-tangent-offset)/
d(direction)| of the specular chain (the reference's
SpecularManifold::G / det() of the constraint block, manifold.cpp).
Both Jacobians come from the same forward-difference machinery the
Newton solver uses, so

    a = min(1, I'/I * (pdf'_cos / pdf_cos) * (|det J| / |det J'|)).

Structure mismatches after the re-trace (lobe flips, chain escaping,
endpoint off target) reject the proposal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect
from mitsuba_tpu.bsdf.eval import bsdf_sample
from mitsuba_tpu.bsdf.plugins import (
    CONDUCTOR,
    DIELECTRIC,
    DIFFUSE,
    ROUGHDIFFUSE,
)
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng, warp
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.integrator.manifold import _refract_world
from mitsuba_tpu.integrator.path import _offset_ray
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)
from mitsuba_tpu.sensor.plugins import generate_rays

# maximum delta-chain length the mutation solves (the reference's walks
# handle arbitrary chains; caustic configurations are 1-4 bounces)
KMAX = 4

REFLECT = 0
REFRACT = 1


def trace_path_info(pack, integ, cam, w, h, U, dmax):
    """Re-trace the first `dmax` vertices of every chain's path,
    replicating path_from_primary's sampling decisions exactly (same U
    dims, same RR), and record per-vertex geometry + lobe structure.

    Returns a dict of [N, dmax(, 3)] arrays."""
    from mitsuba_tpu.integrator.pssmlt import _HEAD, _PER_DEPTH

    n = U.shape[0]
    present = pack.present_types
    rr_depth = max(integ.rr_depth, 1)
    pos01 = U[:, 0:2]
    o, d = generate_rays(cam, pos01, U[:, 2:4])

    thr = jnp.ones((n, 3), jnp.float32)
    eta = jnp.ones((n,), jnp.float32)
    active = jnp.ones((n,), bool)
    rec = {
        k: []
        for k in (
            "valid", "delta", "refract", "type", "p", "ns", "ng",
            "d_out", "cos_o", "mat",
        )
    }
    for depth in range(dmax):
        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        found = its.valid & active
        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(
            pack, its.mat, its.uv, mip_footprint(pack, its), its=its
        )
        base = _HEAD + _PER_DEPTH * depth
        u_b = U[:, base + 3:base + 6]
        bs = bsdf_sample(sp, wi_l, u_b[:, 0:2], u_b[:, 2], present)
        typ = sp["type"]
        if "mix" in sp:
            # mixture lanes sample a stochastic component — the
            # deterministic solve/inversion below does not apply
            typ = jnp.where(sp["mix"]["wb"] > 0, -1, typ)
        rec["valid"].append(found)
        rec["delta"].append(bs.delta & found)
        rec["refract"].append((bs.wo[..., 2] * wi_l[..., 2]) < 0)
        rec["type"].append(typ)
        rec["p"].append(its.p)
        rec["ns"].append(frame.n)
        rec["ng"].append(its.ng)
        rec["d_out"].append(frame.to_world(bs.wo))
        rec["cos_o"].append(bs.wo[..., 2])
        rec["mat"].append(its.mat)

        thr = thr * jnp.where(found[..., None], bs.weight, 1.0)
        eta = eta * jnp.where(found, bs.eta, 1.0)
        d_new = frame.to_world(bs.wo)
        o_new = _offset_ray(its.p, its.ng, d_new)
        active = found & (jnp.max(thr, axis=-1) > 0)
        u_r = U[:, base + 6]
        q = jnp.minimum(jnp.max(thr, axis=-1) * eta * eta, 0.95)
        do_rr = depth + 1 >= rr_depth
        keep = jnp.where(do_rr, u_r < q, True)
        thr = jnp.where(
            (do_rr & keep)[..., None],
            thr / jnp.maximum(q, 1e-6)[..., None],
            thr,
        )
        active = active & keep
        o = jnp.where(active[..., None], o_new, o)
        d = jnp.where(active[..., None], d_new, d)

    return {k: jnp.stack(v, axis=1) for k, v in rec.items()}


def classify(info, kmax=KMAX):
    """Find the  D - S..S - B  pattern per lane.

    Returns dict with elig [N], klen [N], sig [N, kmax] (REFLECT/
    REFRACT), v0 data (p/ns/ng/d_out/cos), s1_p, b_p, b_n."""
    valid = info["valid"]
    delta = info["delta"]
    typ = info["type"]

    chain_t = (typ == CONDUCTOR) | (typ == DIELECTRIC)
    run = jnp.ones(valid.shape[0], bool)
    klen = jnp.zeros(valid.shape[0], jnp.int32)
    for i in range(1, kmax + 1):
        run = run & delta[:, i] & chain_t[:, i] & valid[:, i]
        klen = klen + run.astype(jnp.int32)

    b_idx = jnp.minimum(1 + klen, valid.shape[1] - 1)

    def at(x, idx):
        if x.ndim == 3:
            return jnp.take_along_axis(
                x, idx[:, None, None], axis=1
            )[:, 0]
        return jnp.take_along_axis(x, idx[:, None], axis=1)[:, 0]

    cos0 = info["cos_o"][:, 0]
    elig = (
        valid[:, 0]
        & ((typ[:, 0] == DIFFUSE) | (typ[:, 0] == ROUGHDIFFUSE))
        & ~delta[:, 0]
        & (klen >= 1)
        & at(valid, b_idx)
        & ~at(delta, b_idx)
        & (cos0 > 1e-4)
    )
    return dict(
        elig=elig,
        klen=klen,
        sig=info["refract"][:, 1:kmax + 1].astype(jnp.int32),
        p0=info["p"][:, 0],
        ns0=info["ns"][:, 0],
        ng0=info["ng"][:, 0],
        d0_out=info["d_out"][:, 0],
        cos0=cos0,
        s1_p=info["p"][:, 1],
        b_p=at(info["p"], b_idx),
        b_n=at(info["ns"], b_idx),
    )


def _chain_end(pack, p0, ng0, d, sig, klen, kmax):
    """Trace the delta chain deterministically from (p0, d) through the
    per-lane signature, then one more segment to the receiver.
    Returns (p_end, ok)."""
    o = _offset_ray(p0, ng0, d)
    ok = jnp.ones(p0.shape[:1], bool)
    for i in range(kmax):
        live = i < klen
        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        frame = shading_frame(pack, its)
        nsh = frame.n
        refl = mm.normalize(d - 2.0 * mm.dot(d, nsh)[..., None] * nsh)
        eta_rel = take_rows(pack.mat_eta, jnp.maximum(its.mat, 0))
        refr, tir = _refract_world(d, nsh, eta_rel)
        want_refr = sig[:, i] == REFRACT
        d_new = jnp.where(want_refr[..., None], refr, refl)
        ok = ok & jnp.where(live, its.valid & ~(want_refr & tir), True)
        o_new = _offset_ray(its.p, its.ng, d_new)
        o = jnp.where(live[..., None], o_new, o)
        d = jnp.where(live[..., None], d_new, d)
    hit = intersect(pack, o, d)
    its = fill_interaction(pack, o, d, hit)
    ok = ok & its.valid
    return its.p, ok


def _residual(pack, p0, ng0, d, sig, klen, kmax, b_p, fr_t):
    p_end, ok = _chain_end(pack, p0, ng0, d, sig, klen, kmax)
    dp = p_end - b_p
    e = jnp.stack([mm.dot(dp, fr_t.s), mm.dot(dp, fr_t.t)], axis=-1)
    return e, ok


def _fd_jacobian(pack, p0, ng0, d_c, sig, klen, kmax, b_p, fr_t, eps):
    """FD Jacobian of the tangent-plane endpoint offset wrt 2D direction
    offsets around d_c.  Returns (e0, det, ok)."""
    fr_d = mm.Frame.from_normal(d_c)

    def ev(x0, x1):
        d = mm.normalize(d_c + x0 * fr_d.s + x1 * fr_d.t)
        return _residual(pack, p0, ng0, d, sig, klen, kmax, b_p, fr_t)

    e0, ok0 = ev(0.0, 0.0)
    ex, okx = ev(eps, 0.0)
    ey, oky = ev(0.0, eps)
    j00 = (ex[..., 0] - e0[..., 0]) / eps
    j10 = (ex[..., 1] - e0[..., 1]) / eps
    j01 = (ey[..., 0] - e0[..., 0]) / eps
    j11 = (ey[..., 1] - e0[..., 1]) / eps
    det = jnp.abs(j00 * j11 - j01 * j10)
    return e0, det, ok0 & okx & oky


def solve_chain(pack, p0, ng0, d0, sig, klen, kmax, b_p, b_n,
                iters=8, eps=1e-4):
    """Newton-solve the start direction so the chain lands on b_p.
    Returns (d_sol, err, det_J, ok); det_J is evaluated in a frame
    centered at the solution (isometric near zero, so comparable
    across lanes/states)."""
    fr_t = mm.Frame.from_normal(b_n)
    fr_d = mm.Frame.from_normal(d0)

    def res(x):
        d = mm.normalize(
            d0 + x[..., 0:1] * fr_d.s + x[..., 1:2] * fr_d.t
        )
        return _residual(pack, p0, ng0, d, sig, klen, kmax, b_p, fr_t)

    n = p0.shape[0]
    x = jnp.zeros((n, 2), jnp.float32)

    def step(x, _):
        e0, ok0 = res(x)
        ex, okx = res(x + jnp.array([eps, 0.0], jnp.float32))
        ey, oky = res(x + jnp.array([0.0, eps], jnp.float32))
        j00 = (ex[..., 0] - e0[..., 0]) / eps
        j10 = (ex[..., 1] - e0[..., 1]) / eps
        j01 = (ey[..., 0] - e0[..., 0]) / eps
        j11 = (ey[..., 1] - e0[..., 1]) / eps
        det = j00 * j11 - j01 * j10
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        dx0 = -(j11 * e0[..., 0] - j01 * e0[..., 1]) * inv_det
        dx1 = -(-j10 * e0[..., 0] + j00 * e0[..., 1]) * inv_det
        dx = jnp.stack([dx0, dx1], axis=-1)
        ok = ok0 & okx & oky
        x1 = x + jnp.where(ok[..., None], dx, 0.0)
        e1, ok1 = res(x1)
        worse = (~ok1) | (
            jnp.linalg.norm(e1, axis=-1) > jnp.linalg.norm(e0, axis=-1)
        )
        x_half = x + jnp.where(ok[..., None], 0.5 * dx, 0.0)
        return jnp.where(worse[..., None], x_half, x1), None

    x, _ = jax.lax.scan(step, x, None, length=iters)
    d_sol = mm.normalize(
        d0 + x[..., 0:1] * fr_d.s + x[..., 1:2] * fr_d.t
    )
    e0, det, ok = _fd_jacobian(
        pack, p0, ng0, d_sol, sig, klen, kmax, b_p, fr_t, eps
    )
    err = jnp.linalg.norm(e0, axis=-1)
    return d_sol, err, det, ok


def propose_manifold(pack, integ, cam, w, h, U, k, seed_mlt, lanes,
                     kmax=KMAX):
    """Build the manifold proposal for every lane.

    Returns (U_prop, corr, ok):
      corr = (pdf'_cos / pdf_cos) * (|det J| / |det J'|) — the
      acceptance correction; ok=False lanes must be rejected (their
      U_prop is the unchanged U row and corr is 0)."""
    from mitsuba_tpu.integrator.mlt import _perturb_lens
    from mitsuba_tpu.integrator.pssmlt import _HEAD

    dmax = kmax + 2
    info = trace_path_info(pack, integ, cam, w, h, U, dmax)
    c = classify(info, kmax)
    elig, klen, sig = c["elig"], c["klen"], c["sig"]
    dist_b = jnp.linalg.norm(c["b_p"] - c["p0"], axis=-1)
    tol = 1e-3 * (1.0 + dist_b)

    # current-state Jacobian (already on the constraint manifold)
    fr_t = mm.Frame.from_normal(c["b_n"])
    _, det_x, okx = _fd_jacobian(
        pack, c["p0"], c["ng0"], c["d0_out"], sig, klen, kmax,
        c["b_p"], fr_t, 1e-4,
    )
    pdf_x = jnp.maximum(c["cos0"], 1e-6) / jnp.pi

    # lens perturbation -> new first vertex a'
    u_pb = rng.rand4(lanes, k, 11, seed_mlt)
    U_lens = _perturb_lens(U, w, h, u_pb)
    o_new, d_new = generate_rays(cam, U_lens[:, 0:2], U_lens[:, 2:4])
    hit = intersect(pack, o_new, d_new)
    its0 = fill_interaction(pack, o_new, d_new, hit)
    frame0 = shading_frame(pack, its0)
    sp0 = shading_params(
        pack, its0.mat, its0.uv, mip_footprint(pack, its0), its=its0
    )
    typ0 = sp0["type"]
    if "mix" in sp0:
        typ0 = jnp.where(sp0["mix"]["wb"] > 0, -1, typ0)
    ok_a = (
        its0.valid
        & ((typ0 == DIFFUSE) | (typ0 == ROUGHDIFFUSE))
    )

    # solve the chain from a' to the old endpoint b
    d0 = mm.normalize(c["s1_p"] - its0.p)
    d_sol, err, det_y, ok_w = solve_chain(
        pack, its0.p, its0.ng, d0, sig, klen, kmax, c["b_p"], c["b_n"]
    )
    cos_y = mm.dot(d_sol, frame0.n)
    pdf_y = jnp.maximum(cos_y, 1e-6) / jnp.pi
    ok = (
        elig & okx & ok_a & ok_w
        & (err < tol) & (cos_y > 1e-4)
        & (det_x > 1e-12) & (det_y > 1e-12)
    )

    # write the solved direction back as primary samples
    wo_l = frame0.to_local(d_sol)
    u2 = warp.cosine_hemisphere_to_square(wo_l)
    U_prop = U_lens.at[:, _HEAD + 3:_HEAD + 5].set(u2)
    U_prop = jnp.where(ok[:, None], U_prop, U)

    # structure verification on the proposal: same chain, lands on b
    info_p = trace_path_info(pack, integ, cam, w, h, U_prop, dmax)
    cp = classify(info_p, kmax)
    sig_pos = jnp.arange(kmax)[None, :] < klen[:, None]
    ok = (
        ok & cp["elig"] & (cp["klen"] == klen)
        & jnp.all((cp["sig"] == sig) | ~sig_pos, axis=-1)
        & (jnp.linalg.norm(cp["b_p"] - c["b_p"], axis=-1) < 4.0 * tol)
    )
    corr = jnp.where(ok, (pdf_y / pdf_x) * (det_x / det_y), 0.0)
    U_prop = jnp.where(ok[:, None], U_prop, U)
    return U_prop, corr, ok
