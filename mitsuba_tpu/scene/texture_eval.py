"""Device-side texture evaluation.

Dispatches over the packed texture table (scene/builder.py
_pack_textures).  Bitmap lookups are bilinear gathers from the shared
atlas with repeat wrapping (the reference's MIPMap EWA filtering,
mipmap.h:56-162, is planned once ray differentials are tracked).
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_tpu.scene.textures import (
    TEX_BITMAP,
    TEX_CHECKERBOARD,
    TEX_CONSTANT,
    TEX_GRID,
)


def eval_texture(pack, tid, uv, default_rgb):
    """tid: [R] int32 texture ids (-1 -> default_rgb [R,3]); uv: [R,2]."""
    has = tid >= 0
    t = jnp.maximum(tid, 0)
    kind = pack.tex_type[t]
    c0 = pack.tex_c0[t]
    c1 = pack.tex_c1[t]
    scale = pack.tex_scale[t]
    uvt = pack.tex_uv[t]  # uscale, vscale, uoffset, voffset
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
    lw = pack.tex_lw[t]
    fu = u - jnp.floor(u)
    fv = v - jnp.floor(v)
    on_line = (
        (fu < lw) | (fu > 1.0 - lw) | (fv < lw) | (fv > 1.0 - lw)
    )
    grid = jnp.where(on_line[..., None], c1, c0)
    out = jnp.where((kind == TEX_GRID)[..., None], grid, out)

    # bitmap: bilinear atlas gather with repeat wrap
    rect = pack.tex_rect[t]  # x, y, w, h
    w = jnp.maximum(rect[..., 2], 1)
    h = jnp.maximum(rect[..., 3], 1)
    # image row 0 = v=1 (top); mitsuba bitmap texture: uv (0,0) = top-left
    fx = (u - jnp.floor(u)) * w.astype(jnp.float32) - 0.5
    fy = (v - jnp.floor(v)) * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]

    def fetch(xi_, yi_):
        xi_ = jnp.mod(xi_, w)
        yi_ = jnp.mod(yi_, h)
        return pack.tex_atlas[rect[..., 1] + yi_, rect[..., 0] + xi_]

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
    bitmap = jnp.where(
        (pack.tex_nearest[t] > 0)[..., None], nearest, bilin
    )
    out = jnp.where((kind == TEX_BITMAP)[..., None], bitmap, out)

    out = out * scale
    return jnp.where(has[..., None], out, default_rgb)


def _gather_params(pack, m, uv):
    cA = pack.mat_cA[m]
    if pack.has_textures:
        cA = eval_texture(pack, pack.mat_texA[m], uv, cA)
    return {
        "type": pack.mat_type[m],
        "cA": cA,
        "cB": pack.mat_cB[m],
        "cC": pack.mat_cC[m],
        "cD": pack.mat_cD[m],
        "alpha_u": pack.mat_alpha_u[m],
        "alpha_v": pack.mat_alpha_v[m],
        "eta": pack.mat_eta[m],
        "exponent": pack.mat_exponent[m],
        "dist": pack.mat_dist[m],
        "nonlinear": pack.mat_nonlinear[m],
        "twosided": pack.mat_twosided[m],
        "fdr_int": pack.mat_fdr_int[m],
        "spec_w": pack.mat_spec_w[m],
    }


def shading_params(pack, mat_id, uv):
    """Gather + texture-resolve per-lane shading params for bsdf/eval.py.

    For scenes with mixture/blend BSDFs the dict carries a second
    parameter set (`mix`) for the B component; bsdf/eval.py blends."""
    m = jnp.maximum(mat_id, 0)
    sp = _gather_params(pack, m, uv)
    if pack.meta.get("has_mixtures", False):
        mix_b = pack.mat_mix_b[m]
        mb = jnp.where(mix_b >= 0, mix_b, m)
        sp["mix"] = {
            "spB": _gather_params(pack, mb, uv),
            "wa": jnp.where(mix_b >= 0, pack.mat_mix_wa[m], 1.0),
            "wb": jnp.where(mix_b >= 0, pack.mat_mix_wb[m], 0.0),
        }
    return sp


def eval_opacity(pack, mat_id, uv):
    m = jnp.maximum(mat_id, 0)
    op = pack.mat_opacity[m]
    if pack.has_textures:
        op = eval_texture(pack, pack.mat_tex_opacity[m], uv, op)
    return op.mean(axis=-1)
