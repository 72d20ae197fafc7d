"""Device-side texture evaluation.

Dispatches over the packed texture table (scene/builder.py
_pack_textures).  Bitmap lookups are bilinear gathers from the shared
atlas with repeat wrapping; trilinear mip selection from the shading
cone, with fixed-probe anisotropic filtering along the projected
ellipse's major axis (the TPU-shaped stand-in for the reference's EWA
loop, mipmap.h:56-162 — probes after McCormack et al., "Feline").
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_fused, take_rows
from mitsuba_tpu.scene.textures import (
    TEX_BITMAP,
    TEX_CHECKERBOARD,
    TEX_CONSTANT,
    TEX_GRID,
)

# anisotropic probes along the footprint's major axis (1 = isotropic
# trilinear only); clamped anisotropy like the reference maxAnisotropy
TEX_ANISO = int(os.environ.get("MTS_TEX_ANISO", 4))
TEX_MAX_ANISO = float(os.environ.get("MTS_TEX_MAX_ANISO", 8.0))
# "feline": fixed probes along the major axis (fast default);
# "ewa": true elliptical weighted averaging — Gaussian-weighted texel
# loop on a static window, trilinear across levels (the reference's
# default filter, mipmap.h:296-420 evalEWA)
TEX_FILTER = os.environ.get("MTS_TEX_FILTER", "feline")
# EWA window half-size in texels; bounds the representable anisotropy
TEX_EWA_K = int(os.environ.get("MTS_TEX_EWA_K", 6))


def _bitmap_fetch(pack, rect, u, v, nearest_sel):
    """Bilinear (or nearest) gather from one atlas rect per lane."""
    w = jnp.maximum(rect[..., 2], 1)
    h = jnp.maximum(rect[..., 3], 1)
    # image row 0 = v=1 (top); mitsuba bitmap texture: uv (0,0) = top-left
    fx = (u - jnp.floor(u)) * w.astype(jnp.float32) - 0.5
    fy = (v - jnp.floor(v)) * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    atlas_w = pack.tex_atlas.shape[1]
    atlas_flat = pack.tex_atlas.reshape(-1, 3)  # 1D gathers (2D-index
    # gathers lower catastrophically on TPU)

    def fetch(xi_, yi_):
        xi_ = jnp.mod(xi_, w)
        yi_ = jnp.mod(yi_, h)
        return atlas_flat[
            (rect[..., 1] + yi_) * atlas_w + rect[..., 0] + xi_
        ]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    bilin = (
        c00 * (1 - ax) * (1 - ay)
        + c10 * ax * (1 - ay)
        + c01 * (1 - ax) * ay
        + c11 * ax * ay
    )
    nearest = fetch(
        jnp.round(fx).astype(jnp.int32), jnp.round(fy).astype(jnp.int32)
    )
    return jnp.where((nearest_sel > 0)[..., None], nearest, bilin)


def eval_texture(pack, tid, uv, default_rgb, fp=None, geom=None):
    """tid: [R] int32 texture ids (-1 -> default_rgb [R,3]); uv: [R,2].

    fp (optional [R]): isotropic uv-space footprint diameter of the
    shading sample — selects the mip level pair for trilinear
    filtering (reference mipmap.h:56-162 evalTrilinear; the EWA path
    reduces to this under the wavefront's isotropic ray cone).

    geom (optional (prim [R], bary [R,2])): triangle id + barycentrics
    for geometry-driven textures (vertexcolors/wireframe/curvature,
    reference src/textures/{vertexcolors,wireframe,curvature}.cpp)."""
    has = tid >= 0
    t = jnp.maximum(tid, 0)
    kind, c0, c1, scale, uvt, lw, rect, nearest_sel = take_fused(
        t, pack.tex_type, pack.tex_c0, pack.tex_c1, pack.tex_scale,
        pack.tex_uv, pack.tex_lw, pack.tex_rect, pack.tex_nearest,
    )  # uvt = uscale, vscale, uoffset, voffset
    u = uv[..., 0] * uvt[..., 0] + uvt[..., 2]
    v = uv[..., 1] * uvt[..., 1] + uvt[..., 3]

    out = c0  # TEX_CONSTANT

    # checkerboard (reference src/textures/checkerboard.cpp:eval —
    # integer parity of floor(u)+floor(v) over a 2x2 tile)
    xi = jnp.floor(u * 2.0).astype(jnp.int32)
    yi = jnp.floor(v * 2.0).astype(jnp.int32)
    checker = jnp.where((((xi + yi) % 2) == 0)[..., None], c0, c1)
    out = jnp.where((kind == TEX_CHECKERBOARD)[..., None], checker, out)

    # grid lines (reference src/textures/gridtexture.cpp)
    fu = u - jnp.floor(u)
    fv = v - jnp.floor(v)
    on_line = (
        (fu < lw) | (fu > 1.0 - lw) | (fv < lw) | (fv > 1.0 - lw)
    )
    grid = jnp.where(on_line[..., None], c1, c0)
    out = jnp.where((kind == TEX_GRID)[..., None], grid, out)

    # bitmap: bilinear atlas gather, trilinear across the mip pyramid
    # when a footprint is provided; with an anisotropic footprint the
    # mip level comes from the MINOR axis and TEX_ANISO probes average
    # along the major axis (Feline approximation of EWA)
    if fp is not None and pack.meta.get("has_mips", False):
        (n_lev,) = take_fused(t, pack.tex_n_lev)
        w0 = jnp.maximum(rect[..., 2], 1).astype(jnp.float32)
        h0 = jnp.maximum(rect[..., 3], 1).astype(jnp.float32)

        if isinstance(fp, tuple):
            minor_uv, major_uv = fp
            # texel lengths through the per-texture uv tiling
            def texel_len(vec):
                return jnp.sqrt(
                    (vec[..., 0] * uvt[..., 0] * w0) ** 2
                    + (vec[..., 1] * uvt[..., 1] * h0) ** 2
                )

            min_tex = texel_len(minor_uv)
            maj_tex = texel_len(major_uv)
            # clamp anisotropy (reference mipmap.h maxAnisotropy), and
            # make each probe's filter cover the inter-probe spacing
            # (major/N) so the probes can't alias between taps
            fp_tex = jnp.maximum(
                jnp.maximum(min_tex, maj_tex / TEX_MAX_ANISO),
                maj_tex / TEX_ANISO,
            )
        else:
            fp_tex = jnp.maximum(
                jnp.abs(fp * uvt[..., 0]) * w0,
                jnp.abs(fp * uvt[..., 1]) * h0,
            )
        lod = jnp.log2(jnp.clip(fp_tex, 1.0, 1e9))
        lod = jnp.minimum(lod, (n_lev - 1).astype(jnp.float32))
        l0 = jnp.floor(lod).astype(jnp.int32)
        frac = (lod - l0.astype(jnp.float32))[..., None]
        l1 = jnp.minimum(l0 + 1, n_lev - 1)
        n_mips = pack.tex_mip_rect.shape[1]
        mip_flat = pack.tex_mip_rect.reshape(-1, 4)
        rect_a = take_rows(mip_flat, t * n_mips + l0)
        rect_b = take_rows(mip_flat, t * n_mips + l1)

        def tri_fetch(uu, vv):
            return (
                _bitmap_fetch(pack, rect_a, uu, vv, nearest_sel)
                * (1.0 - frac)
                + _bitmap_fetch(pack, rect_b, uu, vv, nearest_sel) * frac
            )

        if isinstance(fp, tuple) and TEX_FILTER == "ewa":
            # exact EWA (reference mipmap.h:296-420): Gaussian-weighted
            # sum over the texels inside the footprint ellipse at the
            # two bracketing levels.  The ellipse axes come from the
            # minor/major uv vectors; the window is a static
            # (2K+1)^2 texel loop, so anisotropy is clamped to ~K.
            def ewa_level(rect_l):
                wl = jnp.maximum(rect_l[..., 2], 1).astype(jnp.float32)
                hl = jnp.maximum(rect_l[..., 3], 1).astype(jnp.float32)
                # gradient vectors in texel space at this level
                g0 = jnp.stack(
                    [major_uv[..., 0] * uvt[..., 0] * wl,
                     major_uv[..., 1] * uvt[..., 1] * hl], -1,
                )
                g1 = jnp.stack(
                    [minor_uv[..., 0] * uvt[..., 0] * wl,
                     minor_uv[..., 1] * uvt[..., 1] * hl], -1,
                )
                a = g0[..., 1] ** 2 + g1[..., 1] ** 2 + 1.0
                b = -2.0 * (g0[..., 0] * g0[..., 1]
                            + g1[..., 0] * g1[..., 1])
                cq = g0[..., 0] ** 2 + g1[..., 0] ** 2 + 1.0
                f = jnp.maximum(a * cq - 0.25 * b * b, 1e-6)
                a, b, cq = a / f, b / f, cq / f
                # texel-space center
                su = (u - jnp.floor(u)) * wl - 0.5
                sv = (v - jnp.floor(v)) * hl - 0.5
                s0 = jnp.floor(su).astype(jnp.int32)
                t0 = jnp.floor(sv).astype(jnp.int32)
                acc = jnp.zeros(u.shape + (3,), jnp.float32)
                wsum = jnp.zeros(u.shape, jnp.float32)
                for j in range(-TEX_EWA_K, TEX_EWA_K + 1):
                    for i in range(-TEX_EWA_K, TEX_EWA_K + 1):
                        di = s0.astype(jnp.float32) + i - su
                        dj = t0.astype(jnp.float32) + j - sv
                        r2 = a * di * di + b * di * dj + cq * dj * dj
                        wgt = jnp.where(
                            r2 < 1.0, jnp.exp(-2.0 * r2) - math_exp_m2,
                            0.0,
                        )
                        uu = ((s0 + i).astype(jnp.float32) + 0.5) / wl
                        vv = ((t0 + j).astype(jnp.float32) + 0.5) / hl
                        tex = _bitmap_fetch(
                            pack, rect_l, uu, vv,
                            jnp.ones_like(nearest_sel),
                        )
                        acc = acc + wgt[..., None] * tex
                        wsum = wsum + wgt
                ok = wsum > 1e-8
                fallback = _bitmap_fetch(pack, rect_l, u, v, nearest_sel)
                return jnp.where(
                    ok[..., None],
                    acc / jnp.maximum(wsum, 1e-8)[..., None],
                    fallback,
                )

            import math as _math

            math_exp_m2 = float(_math.exp(-2.0))
            bitmap = (
                ewa_level(rect_a) * (1.0 - frac)
                + ewa_level(rect_b) * frac
            )
        elif isinstance(fp, tuple) and TEX_ANISO > 1:
            n_taps = TEX_ANISO
            acc = 0.0
            for i in range(n_taps):
                c = (i + 0.5) / n_taps - 0.5
                uu = u + c * major_uv[..., 0] * uvt[..., 0]
                vv = v + c * major_uv[..., 1] * uvt[..., 1]
                acc = acc + tri_fetch(uu, vv)
            bitmap = acc / n_taps
        else:
            bitmap = tri_fetch(u, v)
    else:
        bitmap = _bitmap_fetch(pack, rect, u, v, nearest_sel)
    out = jnp.where((kind == TEX_BITMAP)[..., None], bitmap, out)

    # geometry-driven kinds (statically gated on the packed scene)
    gk = pack.meta.get("geom_tex_kinds", ())
    if gk and geom is not None:
        from mitsuba_tpu.scene.textures import (
            TEX_CURVATURE,
            TEX_VERTEXCOLORS,
            TEX_WIREFRAME,
        )

        prim, bary = geom
        pi = jnp.maximum(prim, 0)
        bu, bv = bary[..., 0], bary[..., 1]
        bw = 1.0 - bu - bv
        if TEX_VERTEXCOLORS in gk:
            vc = (
                bw[..., None] * pack.tri_c0[pi]
                + bu[..., None] * pack.tri_c1[pi]
                + bv[..., None] * pack.tri_c2[pi]
            )
            out = jnp.where((kind == TEX_VERTEXCOLORS)[..., None], vc, out)
        if TEX_WIREFRAME in gk:
            # 3D distance to the nearest triangle edge + smoothstep
            # (reference wireframe.cpp eval, stepWidth = 0.5)
            v0 = pack.tri_v0[pi]
            e1 = pack.tri_e1[pi]
            e2 = pack.tri_e2[pi]
            p = v0 + bu[..., None] * e1 + bv[..., None] * e2

            def edge_d2(c, d):
                dn = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12
                )
                r = p - c
                perp = r - dn * jnp.sum(r * dn, axis=-1, keepdims=True)
                return jnp.sum(perp * perp, axis=-1)

            d2min = jnp.minimum(
                jnp.minimum(edge_d2(v0, e1), edge_d2(v0, e2)),
                edge_d2(v0 + e1, e2 - e1),
            )
            t01 = jnp.clip(
                (jnp.sqrt(d2min) - 0.5 * lw) / jnp.maximum(0.5 * lw, 1e-12),
                0.0, 1.0,
            )
            a = t01 * t01 * (3.0 - 2.0 * t01)  # smoothstep
            wf = c1 * (1.0 - a)[..., None] + c0 * a[..., None]
            out = jnp.where((kind == TEX_WIREFRAME)[..., None], wf, out)
        if TEX_CURVATURE in gk:
            use_g = uvt[..., 2] > 0.5  # uoffset column = selector
            kv = jnp.where(
                use_g[..., None], pack.tri_kg[pi], pack.tri_kh[pi]
            )
            k_i = (
                bw * kv[..., 0] + bu * kv[..., 1] + bv * kv[..., 2]
            ) * lw  # lw column = user scale
            k_i = jnp.clip(k_i, -1.0, 1.0)
            cur = jnp.stack(
                [jnp.maximum(k_i, 0.0),
                 jnp.zeros_like(k_i),
                 jnp.maximum(-k_i, 0.0)], axis=-1,
            )
            out = jnp.where((kind == TEX_CURVATURE)[..., None], cur, out)

    out = out * scale
    return jnp.where(has[..., None], out, default_rgb)


def mip_footprint(pack, its):
    """uv-space footprint of a camera-cone shading sample, or None
    when the scene has no mip pyramids.  The cone angle is the camera
    pixel angle (ray differentials at the first hit; secondary bounces
    reuse the same cone — slightly over-sharp mirrors, never
    over-blurred).

    With MTS_TEX_ANISO > 1 (default 4) the cone is projected onto the
    surface as an ELLIPSE: minor axis = cone radius, major axis =
    radius/cos(theta) along the projected view direction, both mapped
    into uv space through the (dpdu, dpdv) metric — the fixed-probe
    approximation of the reference's EWA filter (mipmap.h evalEWA;
    probes after McCormack et al., "Feline").  Returns (minor_uv [R,2],
    major_uv [R,2]) in that mode, else the scalar isotropic diameter."""
    ang = pack.meta.get("cam_pix_angle", 0.0)
    if not pack.meta.get("has_mips", False) or ang <= 0.0:
        return None
    r = its.t * ang
    if TEX_ANISO <= 1:
        dpdu_len = jnp.linalg.norm(its.dpdu, axis=-1)
        return r / jnp.maximum(dpdu_len, 1e-8)

    dpdu, dpdv = its.dpdu, its.dpdv
    E = jnp.sum(dpdu * dpdu, axis=-1)
    F = jnp.sum(dpdu * dpdv, axis=-1)
    G = jnp.sum(dpdv * dpdv, axis=-1)
    det = jnp.maximum(E * G - F * F, 1e-24)

    w = -its.wi_world  # unit, toward the surface
    n = its.ns
    cosv = jnp.clip(jnp.abs(mm.dot(w, n)), 1.0 / TEX_MAX_ANISO, 1.0)
    m_dir = mm.cross(n, w)
    m_len = jnp.linalg.norm(m_dir, axis=-1, keepdims=True)
    dpdu_unit = dpdu / jnp.maximum(
        jnp.linalg.norm(dpdu, axis=-1, keepdims=True), 1e-12
    )
    m_dir = jnp.where(m_len > 1e-6, m_dir / jnp.maximum(m_len, 1e-12),
                      dpdu_unit)
    a_dir = mm.normalize(mm.cross(m_dir, n))

    def to_uv(x):
        pu = jnp.sum(x * dpdu, axis=-1)
        pv = jnp.sum(x * dpdv, axis=-1)
        du = (G * pu - F * pv) / det
        dv = (E * pv - F * pu) / det
        return jnp.stack([du, dv], axis=-1)

    minor_uv = to_uv(m_dir * r[..., None])
    major_uv = to_uv(a_dir * (r / cosv)[..., None])
    return (minor_uv, major_uv)


def _gather_params(pack, m, uv, fp=None, geom=None):
    (typ, cA, cB, cC, cD, a_u, a_v, eta, expo, dist, nonlin, twos,
     fdr, spw, texA, rt, rt_fdr) = take_fused(
        m, pack.mat_type, pack.mat_cA, pack.mat_cB, pack.mat_cC,
        pack.mat_cD, pack.mat_alpha_u, pack.mat_alpha_v, pack.mat_eta,
        pack.mat_exponent, pack.mat_dist, pack.mat_nonlinear,
        pack.mat_twosided, pack.mat_fdr_int, pack.mat_spec_w,
        pack.mat_texA, pack.mat_rt, pack.mat_rt_fdr,
    )
    if pack.has_textures:
        cA = eval_texture(pack, texA, uv, cA, fp, geom)
    return {
        "type": typ,
        "cA": cA,
        "cB": cB,
        "cC": cC,
        "cD": cD,
        "alpha_u": a_u,
        "alpha_v": a_v,
        "eta": eta,
        "exponent": expo,
        "dist": dist,
        # STATIC: which distributions the scene's microfacet lobes use
        # (builder mf_dists) — lets sample_m skip absent samplers
        "mf_dists": pack.meta.get("mf_dists"),
        "nonlinear": nonlin,
        "twosided": twos,
        "fdr_int": fdr,
        "spec_w": spw,
        "rt": rt,
        "rt_fdr": rt_fdr,
    }


def shading_params(pack, mat_id, uv, fp=None, its=None):
    """Gather + texture-resolve per-lane shading params for bsdf/eval.py.

    fp: optional uv footprint for trilinear mip filtering
    (mip_footprint).  its: the SurfaceInteraction — passes (prim, bary)
    through for geometry-driven textures; integrators that shade
    without an interaction (e.g. SPPM's stored visible points) fall
    back to the constant approximation for those.  For scenes with
    mixture/blend BSDFs the dict carries a second parameter set
    (`mix`) for the B component; bsdf/eval.py blends."""
    m = jnp.maximum(mat_id, 0)
    geom = None
    if its is not None and pack.meta.get("geom_tex_kinds", ()):
        geom = (its.prim, its.bary)
    sp = _gather_params(pack, m, uv, fp, geom)
    if pack.meta.get("has_irawan", False):
        from mitsuba_tpu.bsdf import irawan as _iw
        from mitsuba_tpu.core import rng as _rng

        row = jnp.maximum(pack.mat_iw[m], 0)
        tabs = {k: getattr(pack, "iw_" + k) for k in _iw.TABLE_KEYS}
        seed = _rng.stream_seed(0, _rng.STREAM_WEAVE)
        sp["iw"] = _iw.lane_params(
            jnp, tabs, row, uv,
            lambda i, j: _rng.rand1(i, j, 0, seed),
            with_noise=pack.meta.get("iw_noise", False),
        )
    if pack.meta.get("has_mixtures", False):
        # follow the mixture row chain (N-ary mixtures pack as linked
        # rows, scene/builder.py): each hop gathers the next component
        # and its renormalized tail weight; static depth from meta
        def attach(mm_ids, depth):
            mix_b, mix_wa, mix_wb = take_fused(
                mm_ids, pack.mat_mix_b, pack.mat_mix_wa, pack.mat_mix_wb
            )
            mb = jnp.where(mix_b >= 0, mix_b, mm_ids)
            spB = _gather_params(pack, mb, uv, fp, geom)
            if depth > 1:
                sub = attach(mb, depth - 1)
                if sub is not None:
                    spB["mix"] = sub
            return {
                "spB": spB,
                "wa": jnp.where(mix_b >= 0, mix_wa, 1.0),
                "wb": jnp.where(mix_b >= 0, mix_wb, 0.0),
            }

        sp["mix"] = attach(m, pack.meta.get("mix_depth", 1))
    return sp


def shading_frame(pack, its):
    """Shading frame at the hit, with bump/normal-map perturbation
    (reference src/bsdfs/{bumpmap,normalmap}.cpp getFrame).

    Scenes without bump textures compile to a plain Frame.from_normal
    (static meta gate).  Normal maps rotate the tangent-space normal
    (2c-1) into the TBN basis built from dp/du; bump maps displace the
    normal by finite-difference height gradients."""
    from mitsuba_tpu.core import math as mm
    import jax.numpy as jnp

    if not pack.meta.get("has_bumpmaps", False):
        return mm.Frame.from_normal(its.ns)

    m = jnp.maximum(its.mat, 0)
    tex_b, is_nm = take_fused(m, pack.mat_tex_bump, pack.mat_bump_nm)
    has = tex_b >= 0

    ns = its.ns
    # orthonormal TBN from the uv tangent
    t_raw = its.dpdu - ns * jnp.sum(its.dpdu * ns, axis=-1, keepdims=True)
    t_len = jnp.linalg.norm(t_raw, axis=-1, keepdims=True)
    fallback = mm.Frame.from_normal(ns)
    t = jnp.where(t_len > 1e-8, t_raw / jnp.maximum(t_len, 1e-12),
                  fallback.s)
    b = jnp.cross(ns, t)

    # normal map: c in [0,1]^3 -> tangent-space normal
    c = eval_texture(pack, tex_b, its.uv, jnp.full(its.uv.shape[:-1] + (3,),
                                                   0.5))
    n_t = 2.0 * c - 1.0
    n_nm = mm.normalize(
        t * n_t[..., 0:1] + b * n_t[..., 1:2] + ns * n_t[..., 2:3]
    )

    # bump map: central differences of the height field
    eps = 1.0 / 1024.0
    h0 = eval_texture(pack, tex_b, its.uv, jnp.zeros_like(c)).mean(-1)
    hu = eval_texture(
        pack, tex_b, its.uv + jnp.asarray([eps, 0.0]), jnp.zeros_like(c)
    ).mean(-1)
    hv = eval_texture(
        pack, tex_b, its.uv + jnp.asarray([0.0, eps]), jnp.zeros_like(c)
    ).mean(-1)
    dhdu = (hu - h0) / eps
    dhdv = (hv - h0) / eps
    n_bm = mm.normalize(
        ns - t * dhdu[..., None] - b * dhdv[..., None]
    )

    n_new = jnp.where((is_nm > 0.5)[..., None], n_nm, n_bm)
    n_new = jnp.where(has[..., None], n_new, ns)
    # keep the perturbed normal in the geometric hemisphere
    flip = jnp.sum(n_new * ns, axis=-1) < 0
    n_new = jnp.where(flip[..., None], -n_new, n_new)
    return mm.Frame.from_normal(n_new)


def eval_opacity(pack, mat_id, uv):
    m = jnp.maximum(mat_id, 0)
    op, tex_op = take_fused(m, pack.mat_opacity, pack.mat_tex_opacity)
    if pack.has_textures:
        op = eval_texture(pack, tex_op, uv, op)
    return op.mean(axis=-1)
