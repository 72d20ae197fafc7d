"""Pallas TPU kernels for the ray-intersection hot path.

The XLA version of the brute-force intersector materializes [R, T]
intermediates in HBM (~28 GB moved per 1M-ray trace — bandwidth-bound
at ~35 ms).  These kernels tile rays into VMEM blocks and keep every
[TR, T] intermediate on-chip, so HBM traffic drops to the ray/hit
arrays themselves (~32 MB): the TPU equivalent of the reference's
cache-blocked TriAccel loop (reference: triaccel.h:58, skdtree.h:183).

Layout: rays and triangles are passed TRANSPOSED ([3, R], [9, T]) so
the vectorized last dimension is the 128-lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_EPS = 1e-4
RAY_TILE = 512  # rays per grid step
TRI_TILE = 128  # triangles per inner iteration


def _mt_tile(ox, oy, oz, dx, dy, dz, tri, t_ref):
    """Möller-Trumbore for a [TR, 1] ray block against a [1, T] tri tile.
    tri: [9, T] rows = v0, e1, e2 (x, y, z each).  Returns (t, hit)."""
    v0x, v0y, v0z = tri[0:1], tri[1:2], tri[2:3]
    e1x, e1y, e1z = tri[3:4], tri[4:5], tri[5:6]
    e2x, e2y, e2z = tri[6:7], tri[7:8], tri[8:9]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPS)
        & (t < t_ref)
    )
    return t, hit


def _closest_kernel(n_tri_tiles, o_ref, d_ref, tri_ref, tmax_ref, t_out, prim_out):
    ox = o_ref[0:1, :].T  # [TR, 1]
    oy = o_ref[1:2, :].T
    oz = o_ref[2:3, :].T
    dx = d_ref[0:1, :].T
    dy = d_ref[1:2, :].T
    dz = d_ref[2:3, :].T
    tr = ox.shape[0]

    best_t = tmax_ref[0:1, :].T  # [TR, 1]
    best_prim = jnp.full((tr, 1), -1, jnp.int32)

    def body(k, carry):
        best_t, best_prim = carry
        tri = tri_ref[:, pl.dslice(k * TRI_TILE, TRI_TILE)]  # [9, T]
        t, hit = _mt_tile(ox, oy, oz, dx, dy, dz, tri, best_t)
        t = jnp.where(hit, t, jnp.inf)
        tmin = jnp.min(t, axis=1, keepdims=True)  # [TR, 1]
        col = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
        better = tmin < best_t
        best_prim = jnp.where(better, k * TRI_TILE + col, best_prim)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_prim

    best_t, best_prim = jax.lax.fori_loop(
        0, n_tri_tiles, body, (best_t, best_prim)
    )
    t_out[0:1, :] = best_t.T
    prim_out[0:1, :] = best_prim.T


def _any_kernel(n_tri_tiles, o_ref, d_ref, tri_ref, tmax_ref, occ_out):
    ox = o_ref[0:1, :].T
    oy = o_ref[1:2, :].T
    oz = o_ref[2:3, :].T
    dx = d_ref[0:1, :].T
    dy = d_ref[1:2, :].T
    dz = d_ref[2:3, :].T
    tr = ox.shape[0]
    t_lim = tmax_ref[0:1, :].T

    def body(k, occ):
        tri = tri_ref[:, pl.dslice(k * TRI_TILE, TRI_TILE)]
        _, hit = _mt_tile(ox, oy, oz, dx, dy, dz, tri, t_lim)
        return occ | jnp.any(hit, axis=1, keepdims=True)

    occ = jax.lax.fori_loop(
        0, n_tri_tiles, body, jnp.zeros((tr, 1), bool)
    )
    occ_out[0:1, :] = occ.astype(jnp.int32).T


def _prep(o, d, t_max, tri_t):
    r = o.shape[0]
    pad = (-r) % RAY_TILE
    ot = jnp.concatenate(
        [o, jnp.zeros((pad, 3), o.dtype)]
    ).T  # [3, Rp]
    dt = jnp.concatenate(
        [d, jnp.ones((pad, 3), d.dtype)]
    ).T
    tm = jnp.concatenate(
        [jnp.broadcast_to(t_max, (r,)).astype(jnp.float32), jnp.zeros(pad)]
    )[None, :]
    return ot, dt, tm, r, r + pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit(o, d, t_max, tri_t, interpret=False):
    """o, d: [R, 3]; t_max: scalar or [R]; tri_t: [9, Tp] transposed
    triangle data (Tp multiple of 128, padded with far-away tris).
    Returns (t [R], prim [R] int32, -1 = miss)."""
    ot, dt, tm, r, rp = _prep(o, d, t_max, tri_t)
    n_tiles = tri_t.shape[1] // TRI_TILE
    grid = (rp // RAY_TILE,)
    t, prim = pl.pallas_call(
        functools.partial(_closest_kernel, n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_t.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        interpret=interpret,
    )(ot, dt, tri_t, tm)
    return t[0, :r], prim[0, :r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit(o, d, t_max, tri_t, interpret=False):
    """Boolean occlusion query; same conventions as closest_hit."""
    ot, dt, tm, r, rp = _prep(o, d, t_max, tri_t)
    n_tiles = tri_t.shape[1] // TRI_TILE
    grid = (rp // RAY_TILE,)
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_t.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, rp), jnp.int32)],
        interpret=interpret,
    )(ot, dt, tri_t, tm)[0]
    return occ[0, :r] > 0


def pack_triangles_transposed(tri_v0, tri_e1, tri_e2, n_tris):
    """Host/packing helper: [T, 3] x3 -> [9, Tp] with far-away padding."""
    import numpy as np

    pad_to = max(((n_tris + TRI_TILE - 1) // TRI_TILE) * TRI_TILE, TRI_TILE)
    v0 = np.full((pad_to, 3), 1e30, np.float32)
    e1 = np.zeros((pad_to, 3), np.float32)
    e2 = np.zeros((pad_to, 3), np.float32)
    v0[:n_tris] = np.asarray(tri_v0)[:n_tris]
    e1[:n_tris] = np.asarray(tri_e1)[:n_tris]
    e2[:n_tris] = np.asarray(tri_e2)[:n_tris]
    return np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, Tp]


# ===========================================================================
# MXU formulation
# ===========================================================================
#
# Möller-Trumbore is BILINEAR in the per-ray feature vector
# F = [d, w = o x d, o, 1] (10 floats):
#
#   det   = F . [-n,        0,   0, 0  ]      n  = e1 x e2
#   u_num = F . [v0 x e2,   e2,  0, 0  ]
#   v_num = F . [e1 x v0,  -e1,  0, 0  ]
#   t_num = F . [0,         0,   n, -c0]      c0 = v0 . n
#
# so testing R rays against T triangles is ONE [R,10] x [10,4T] matmul on
# the MXU (the systolic array the TPU was built around), followed by a
# cheap elementwise epilogue + min-reduction on the VPU.  This replaces
# the reference's 48-byte TriAccel scalar test (triaccel.h:38) with the
# hardware's native primitive.

MXU_RAY_TILE = 1024


def build_mt_matrix(tri_v0, tri_e1, tri_e2, n_tris):
    """Host-side: per-triangle constants -> [16, 4*Tp] matmul operand.
    Rows 0-2: d, 3-5: w, 6-8: o, 9: const, 10-15: zero pad (MXU likes
    multiples of 8 on the contraction dim).  Column blocks: [det|u|v|t].
    Padding triangles produce det == 0 -> never hit."""
    import numpy as np

    pad_to = max(((n_tris + 127) // 128) * 128, 128)
    v0 = np.zeros((pad_to, 3), np.float32)
    e1 = np.zeros((pad_to, 3), np.float32)
    e2 = np.zeros((pad_to, 3), np.float32)
    v0[:n_tris] = np.asarray(tri_v0)[:n_tris]
    e1[:n_tris] = np.asarray(tri_e1)[:n_tris]
    e2[:n_tris] = np.asarray(tri_e2)[:n_tris]

    n = np.cross(e1, e2)
    c0 = np.sum(v0 * n, axis=-1)
    m = np.zeros((16, 4, pad_to), np.float32)
    m[0:3, 0] = -n.T                    # det
    m[0:3, 1] = np.cross(v0, e2).T      # u_num (d-part)
    m[3:6, 1] = e2.T                    # u_num (w-part)
    m[0:3, 2] = np.cross(e1, v0).T      # v_num (d-part)
    m[3:6, 2] = -e1.T                   # v_num (w-part)
    m[6:9, 3] = n.T                     # t_num (o-part)
    m[9, 3] = -c0                       # t_num (const)
    return m.reshape(16, 4 * pad_to)


def _ray_features(o, d):
    w = jnp.cross(o, d)
    ones = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    zeros = jnp.zeros(o.shape[:-1] + (6,), o.dtype)
    return jnp.concatenate([d, w, o, ones, zeros], axis=-1)  # [R, 16]


def _mxu_epilogue(prod, t_ref, n_pad):
    """prod: [TR, 4T] -> (t [TR, T], hit [TR, T])."""
    det = prod[:, 0 * n_pad : 1 * n_pad]
    u_n = prod[:, 1 * n_pad : 2 * n_pad]
    v_n = prod[:, 2 * n_pad : 3 * n_pad]
    t_n = prod[:, 3 * n_pad : 4 * n_pad]
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    u = u_n * inv
    v = v_n * inv
    t = t_n * inv
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPS)
        & (t < t_ref)
    )
    return t, hit


def _mxu_closest_kernel(n_pad, f_ref, m_ref, tmax_ref, t_out, prim_out):
    feats = f_ref[...]  # [TR, 16]
    prod = jnp.dot(
        feats,
        m_ref[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_lim = tmax_ref[0:1, :].T  # [TR, 1]
    t, hit = _mxu_epilogue(prod, t_lim, n_pad)
    t = jnp.where(hit, t, jnp.inf)
    tmin = jnp.min(t, axis=1, keepdims=True)
    col = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]
    prim = jnp.where(tmin < t_lim, col, -1)
    t_out[0:1, :] = jnp.minimum(tmin, t_lim).T
    prim_out[0:1, :] = prim.T


def _mxu_any_kernel(n_pad, f_ref, m_ref, tmax_ref, occ_out):
    feats = f_ref[...]
    prod = jnp.dot(
        feats,
        m_ref[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_lim = tmax_ref[0:1, :].T
    _, hit = _mxu_epilogue(prod, t_lim, n_pad)
    occ_out[0:1, :] = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32).T


def _prep_mxu(o, d, t_max):
    r = o.shape[0]
    pad = (-r) % MXU_RAY_TILE
    feats = _ray_features(o, d)
    if pad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, 16), feats.dtype)]
        )
    tm = jnp.concatenate(
        [jnp.broadcast_to(t_max, (r,)).astype(jnp.float32), jnp.zeros(pad)]
    )[None, :]
    return feats, tm, r, r + pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_mxu(o, d, t_max, mt_matrix, interpret=False):
    """MXU variant of closest_hit.  mt_matrix: [16, 4*Tp] from
    build_mt_matrix.  Returns (t [R], prim [R], -1 = miss)."""
    feats, tm, r, rp = _prep_mxu(o, d, t_max)
    n_pad = mt_matrix.shape[1] // 4
    grid = (rp // MXU_RAY_TILE,)
    t, prim = pl.pallas_call(
        functools.partial(_mxu_closest_kernel, n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MXU_RAY_TILE, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, mt_matrix.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MXU_RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, MXU_RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MXU_RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        interpret=interpret,
    )(feats, mt_matrix, tm)
    return t[0, :r], prim[0, :r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_mxu(o, d, t_max, mt_matrix, interpret=False):
    feats, tm, r, rp = _prep_mxu(o, d, t_max)
    n_pad = mt_matrix.shape[1] // 4
    grid = (rp // MXU_RAY_TILE,)
    occ = pl.pallas_call(
        functools.partial(_mxu_any_kernel, n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MXU_RAY_TILE, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, mt_matrix.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MXU_RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, MXU_RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, rp), jnp.int32)],
        interpret=interpret,
    )(feats, mt_matrix, tm)[0]
    return occ[0, :r] > 0


# ===========================================================================
# rays-on-lanes orientation (v2)
# ===========================================================================
# The first VPU kernels put TRIANGLES on the 128-lane axis, so a
# 36-triangle scene pays for 128.  Putting RAYS on lanes and triangles
# on the 8-wide sublane axis cuts the padding waste to <12% and turns
# the closest-hit reduction into a cheap cross-sublane min.

V2_RAY_TILE = 2048
V2_TRI_SUB = 8  # triangle padding granularity (f32 sublane count)


def pack_triangles_sublane(tri_v0, tri_e1, tri_e2, n_tris):
    """[T,3] x3 -> [9, Tp] with Tp a multiple of 8 (NOT 128)."""
    import numpy as np

    pad_to = max(((n_tris + V2_TRI_SUB - 1) // V2_TRI_SUB) * V2_TRI_SUB, 8)
    v0 = np.full((pad_to, 3), 1e30, np.float32)
    e1 = np.zeros((pad_to, 3), np.float32)
    e2 = np.zeros((pad_to, 3), np.float32)
    v0[:n_tris] = np.asarray(tri_v0)[:n_tris]
    e1[:n_tris] = np.asarray(tri_e1)[:n_tris]
    e2[:n_tris] = np.asarray(tri_e2)[:n_tris]
    return np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, Tp]


def _mt_tile_v2(o_ref, d_ref, tri, t_lim):
    """[1, TR] ray components against [Tp, 1] triangle columns ->
    [Tp, TR] tests.  tri: [9, Tp]."""
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    tp = tri.shape[1]
    v0x = tri[0, :].reshape(tp, 1)
    v0y = tri[1, :].reshape(tp, 1)
    v0z = tri[2, :].reshape(tp, 1)
    e1x = tri[3, :].reshape(tp, 1)
    e1y = tri[4, :].reshape(tp, 1)
    e1z = tri[5, :].reshape(tp, 1)
    e2x = tri[6, :].reshape(tp, 1)
    e2y = tri[7, :].reshape(tp, 1)
    e2z = tri[8, :].reshape(tp, 1)

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPS)
        & (t < t_lim)
    )
    return t, hit


def _closest_kernel_v2(o_ref, d_ref, tri_ref, tmax_ref, t_out, prim_out):
    t_lim = tmax_ref[0:1, :]  # [1, TR]
    t, hit = _mt_tile_v2(o_ref, d_ref, tri_ref[...], t_lim)
    t = jnp.where(hit, t, jnp.inf)
    tmin = jnp.min(t, axis=0, keepdims=True)  # [1, TR]
    row = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
    prim = jnp.where(tmin < t_lim, row, -1)
    t_out[0:1, :] = jnp.minimum(tmin, t_lim)
    prim_out[0:1, :] = prim


def _any_kernel_v2(o_ref, d_ref, tri_ref, tmax_ref, occ_out):
    t_lim = tmax_ref[0:1, :]
    _, hit = _mt_tile_v2(o_ref, d_ref, tri_ref[...], t_lim)
    occ_out[0:1, :] = jnp.any(hit, axis=0, keepdims=True).astype(jnp.int32)


def _v2_tile(tp: int) -> int:
    """Ray-tile size bounded by VMEM: ~10 live [Tp, TILE] f32 buffers
    must fit in 16 MB (the glass scene's 264 tris @2048 rays OOMed)."""
    budget_elems = 320_000  # ~12.8 MB / (10 bufs * 4 B)
    tile = 256
    while tile * 2 * max(tp, 8) <= budget_elems and tile < 4096:
        tile *= 2
    return tile


def _call_v2(kernel, n_out, o, d, t_max, tri_s):
    r = o.shape[0]
    tp = tri_s.shape[1]
    ray_tile = _v2_tile(tp)
    pad = (-r) % ray_tile
    ot = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)]).T
    dt = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)]).T
    tm = jnp.concatenate(
        [jnp.broadcast_to(t_max, (r,)).astype(jnp.float32), jnp.zeros(pad)]
    )[None, :]
    rp = r + pad
    grid = (rp // ray_tile,)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ][:n_out]
        if n_out == 2
        else [jax.ShapeDtypeStruct((1, rp), jnp.int32)],
    )(ot, dt, tri_s, tm)
    return outs, r


@jax.jit
def closest_hit_v2(o, d, t_max, tri_s):
    """Rays-on-lanes closest hit (single sublane-tile triangle set —
    for scenes within the brute-force size cap)."""
    (t, prim), r = _call_v2(_closest_kernel_v2, 2, o, d, t_max, tri_s)
    return t[0, :r], prim[0, :r]


@jax.jit
def any_hit_v2(o, d, t_max, tri_s):
    (occ,), r = _call_v2(_any_kernel_v2, 1, o, d, t_max, tri_s)
    return occ[0, :r] > 0
