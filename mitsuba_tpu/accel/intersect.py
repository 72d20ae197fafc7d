"""Ray-scene intersection: the hot path.

Replaces the reference's kd-tree traversal + Wald TriAccel test
(reference: include/mitsuba/render/sahkdtree3.h:178-249, triaccel.h:38)
with two TPU-native strategies selected statically at scene-pack time:

* brute force — [R, T] Möller-Trumbore over triangle tiles via
  `lax.scan`; no gathers, pure VPU, optimal for small scenes;
* threaded BVH — batched stackless traversal: one node pointer per
  lane, `lax.while_loop` until every lane terminates, LEAF_SIZE
  triangles tested per leaf visit with masks.

Both return a SoA hit record.  Shadow variants track only a boolean.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.bvh import LEAF_SIZE
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_fused

RAY_EPS = 1e-4
# brute-force triangle tile; [R_tile, 128] tests vectorize on the 8x128 VPU
TRI_TILE = 128


class Hit(NamedTuple):
    valid: jnp.ndarray  # [R] bool
    t: jnp.ndarray  # [R]
    prim: jnp.ndarray  # [R] int32 (triangle id, or sphere id | SPHERE_BIT)
    is_sphere: jnp.ndarray  # [R] bool
    u: jnp.ndarray  # [R] barycentric
    v: jnp.ndarray  # [R]
    inst: jnp.ndarray | None = None  # [R] int32 instance id (-1 none)
    is_cyl: jnp.ndarray | None = None  # [R] bool (analytic segment hit)


def _moller_trumbore(o, d, v0, e1, e2, t_max):
    """Batched Möller-Trumbore; all args broadcast to [..., 3].
    Returns (hit_mask, t, u, v)."""
    pvec = mm.cross(d, e2)
    det = mm.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = mm.dot(tvec, pvec) * inv_det
    qvec = mm.cross(tvec, e1)
    v = mm.dot(d, qvec) * inv_det
    t = mm.dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPS)
        & (t < t_max)
    )
    return hit, t, u, v


def _intersect_spheres(pack, o, d, best_t):
    """Analytic sphere test (reference src/shapes/sphere.cpp rayIntersect).
    Returns (hit, t, sph_id).

    Layout: [S, R] — rays ride the 128-lane axis.  The old [R, S]
    orientation put the (tiny) sphere count on the lane axis and cost
    4.6 ms/pass at 262k lanes for THREE spheres; this form runs in
    ~0.2 ms."""
    cen = pack.sph_center  # [S, 3]
    ocx = o[None, :, 0] - cen[:, 0:1]  # [S, R]
    ocy = o[None, :, 1] - cen[:, 1:2]
    ocz = o[None, :, 2] - cen[:, 2:3]
    dx, dy, dz = d[None, :, 0], d[None, :, 1], d[None, :, 2]
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    c = (
        ocx * ocx + ocy * ocy + ocz * ocz
        - (pack.sph_radius**2)[:, None]
    )
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = 0.5 * (-b - sq)
    t1 = 0.5 * (-b + sq)
    t = jnp.where(t0 > RAY_EPS, t0, t1)
    ok = (disc >= 0.0) & (t > RAY_EPS) & (
        pack.sph_radius[:, None] > 0.0
    )
    t = jnp.where(ok, t, jnp.inf)
    sid = jnp.argmin(t, axis=0)
    tmin = jnp.min(t, axis=0)
    hit = tmin < best_t
    return hit, tmin, sid.astype(jnp.int32)


def _static_tris(pack):
    return pack.meta.get("n_static_tris", pack.meta.get("n_tris", 0))


def _brute_tiles(pack):
    n_tris = _static_tris(pack)
    n_tiles = max((n_tris + TRI_TILE - 1) // TRI_TILE, 1)
    pad_to = n_tiles * TRI_TILE
    # slice to the STATIC prefix first — animated and instance-template
    # rows live past n_static and must not leak into the static tiles
    v0 = _pad_rows(pack.tri_v0[:n_tris], pad_to, 1e30)
    e1 = _pad_rows(pack.tri_e1[:n_tris], pad_to, 0.0)
    e2 = _pad_rows(pack.tri_e2[:n_tris], pad_to, 0.0)
    return n_tiles, (
        v0.reshape(n_tiles, TRI_TILE, 3),
        e1.reshape(n_tiles, TRI_TILE, 3),
        e2.reshape(n_tiles, TRI_TILE, 3),
        jnp.arange(n_tiles, dtype=jnp.int32) * TRI_TILE,
    )


def _brute_force(pack, o, d, t_max):
    """Closest hit.  u/v are NOT tracked through the tile loop (fewer
    reductions); they're recomputed once for the winning triangle."""
    r = o.shape[0]
    n_tiles, tiles = _brute_tiles(pack)

    def body(carry, tile):
        best_t, best_prim = carry
        tv0, te1, te2, base = tile
        hit, t, _, _ = _moller_trumbore(
            o[:, None, :],
            d[:, None, :],
            tv0[None],
            te1[None],
            te2[None],
            best_t[:, None],
        )
        t = jnp.where(hit, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        better = tk < best_t
        best_prim = jnp.where(better, base + k.astype(jnp.int32), best_prim)
        best_t = jnp.minimum(best_t, tk)
        return (best_t, best_prim), None

    init = (
        jnp.broadcast_to(t_max, (r,)).astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    if n_tiles == 1:
        carry, _ = body(init, jax.tree.map(lambda a: a[0], tiles))
    else:
        carry, _ = jax.lax.scan(body, init, tiles)
    best_t, best_prim = carry

    # recompute barycentrics for the single winning triangle per lane
    pi = jnp.maximum(best_prim, 0)
    v0, e1, e2 = take_fused(pi, pack.tri_v0, pack.tri_e1, pack.tri_e2)
    _, _, u, v = _moller_trumbore(o, d, v0, e1, e2, jnp.inf)
    u = jnp.where(best_prim >= 0, u, 0.0)
    v = jnp.where(best_prim >= 0, v, 0.0)
    return best_t, best_prim, u, v


def _brute_force_any(pack, o, d, t_max):
    """Boolean any-hit: a pure masked OR-reduction, no argmin/gathers."""
    r = o.shape[0]
    n_tiles, tiles = _brute_tiles(pack)

    def body(carry, tile):
        tv0, te1, te2, _ = tile
        hit, _, _, _ = _moller_trumbore(
            o[:, None, :],
            d[:, None, :],
            tv0[None],
            te1[None],
            te2[None],
            jnp.broadcast_to(t_max, (r,))[:, None],
        )
        return carry | jnp.any(hit, axis=-1), None

    init = jnp.zeros((r,), bool)
    if n_tiles == 1:
        carry, _ = body(init, jax.tree.map(lambda a: a[0], tiles))
    else:
        carry, _ = jax.lax.scan(body, init, tiles)
    return carry


def _pad_rows(a, n, fill):
    if a.shape[0] >= n:
        return a[:n]
    pad_shape = (n - a.shape[0],) + a.shape[1:]
    return jnp.concatenate([a, jnp.full(pad_shape, fill, a.dtype)])


def _bvh_traverse(pack, o, d, t_max):
    """Batched stackless traversal over the threaded BVH.

    Node and triangle data are ROW-PACKED (bvh_nodes [K*N, 9],
    tri9 [Tp, 9]) so every traversal step costs one gather and every
    leaf visit one more — gathers are the dominant cost of TPU
    traversal (~1000 flops each).  Each lane traverses the node layout
    matching its direction-sign octant (near child first, bvh.py)."""
    r = o.shape[0]
    n_layouts = pack.meta.get("bvh_n_layouts", 1)
    end = pack.bvh_nodes.shape[0] // n_layouts
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    if n_layouts == 8:
        oct_ = (
            (d[:, 0] < 0).astype(jnp.int32)
            + 2 * (d[:, 1] < 0).astype(jnp.int32)
            + 4 * (d[:, 2] < 0).astype(jnp.int32)
        )
        layout_base = oct_ * end
    else:
        layout_base = jnp.zeros((r,), jnp.int32)

    def cond(state):
        node, *_ = state
        return jnp.any(node < end)

    def step(state):
        node, best_t, best_prim, best_u, best_v = state
        active = node < end
        ni = jnp.minimum(node, end - 1)

        nd = pack.bvh_nodes[layout_base + ni]  # [R, 9] — ONE gather
        lo, hi = nd[:, 0:3], nd[:, 3:6]
        first = nd[:, 6].astype(jnp.int32)
        count = nd[:, 7].astype(jnp.int32)
        skip = nd[:, 8].astype(jnp.int32)

        # slab test
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < best_t)

        is_leaf = count > 0
        # leaf: test LEAF_SIZE prims (padded triangles never hit)
        tidx = first[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None]
        tidx = jnp.where(
            jnp.arange(LEAF_SIZE)[None] < count[:, None],
            tidx,
            pack.tri9.shape[0] - 1,  # padded far-away triangle
        )
        do_leaf = box_hit & is_leaf & active
        t9 = pack.tri9[tidx]  # [R, LEAF, 9] — ONE gather
        v0, e1, e2 = t9[..., 0:3], t9[..., 3:6], t9[..., 6:9]
        hit, t, u, v = _moller_trumbore(
            o[:, None, :], d[:, None, :], v0, e1, e2, best_t[:, None]
        )
        hit = hit & do_leaf[:, None]
        t = jnp.where(hit, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
        better = tk < best_t
        best_prim = jnp.where(
            better,
            jnp.take_along_axis(tidx, k[:, None], -1)[:, 0],
            best_prim,
        )
        best_u = jnp.where(
            better, jnp.take_along_axis(u, k[:, None], -1)[:, 0], best_u
        )
        best_v = jnp.where(
            better, jnp.take_along_axis(v, k[:, None], -1)[:, 0], best_v
        )
        best_t = jnp.minimum(best_t, tk)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, ni + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_prim, best_u, best_v

    init = (
        jnp.zeros((r,), jnp.int32),
        jnp.broadcast_to(t_max, (r,)).astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
        cond, step, init
    )
    return best_t, best_prim, best_u, best_v


def _bvh_traverse_any(pack, o, d, t_max):
    """Any-hit shadow traversal: a lane terminates on its FIRST hit
    (node jumps past the end), so shadow rays don't pay closest-hit
    (= the reference's shadowRay path, sahkdtree3.h rayIntersect<true>)."""
    r = o.shape[0]
    n_layouts = pack.meta.get("bvh_n_layouts", 1)
    end = pack.bvh_nodes.shape[0] // n_layouts
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    # any-hit has no best_t tightening to exploit — layout 0 is fine,
    # but using the octant layout keeps node fetches shared with the
    # closest-hit pass in fused programs
    layout_base = jnp.zeros((r,), jnp.int32)

    def cond(state):
        node, _ = state
        return jnp.any(node < end)

    def step(state):
        node, occ = state
        active = node < end
        ni = jnp.minimum(node, end - 1)

        nd = pack.bvh_nodes[layout_base + ni]  # [R, 9] — ONE gather
        lo, hi = nd[:, 0:3], nd[:, 3:6]
        first = nd[:, 6].astype(jnp.int32)
        count = nd[:, 7].astype(jnp.int32)
        skip = nd[:, 8].astype(jnp.int32)

        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_max)

        is_leaf = count > 0
        tidx = first[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None]
        tidx = jnp.where(
            jnp.arange(LEAF_SIZE)[None] < count[:, None],
            tidx,
            pack.tri9.shape[0] - 1,
        )
        do_leaf = box_hit & is_leaf & active
        t9 = pack.tri9[tidx]  # [R, LEAF, 9] — ONE gather
        hit, _, _, _ = _moller_trumbore(
            o[:, None, :],
            d[:, None, :],
            t9[..., 0:3],
            t9[..., 3:6],
            t9[..., 6:9],
            t_max[:, None],
        )
        found = jnp.any(hit & do_leaf[:, None], axis=-1)
        occ = occ | found

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, ni + 1, skip)
        nxt = jnp.where(found, end, nxt)  # early exit on first hit
        node = jnp.where(active, nxt, node)
        return node, occ

    init = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool))
    _, occ = jax.lax.while_loop(cond, step, init)
    return occ


def _use_pallas():
    import jax

    return jax.default_backend() == "tpu"


def _use_clusters(pack):
    """Big-mesh scenes with a cluster pack use the Pallas
    packet-traversal kernels (accel/pallas_bvh.py) on TPU."""
    return pack.meta.get("n_clusters", 0) > 0 and _use_pallas()


import os as _os

# Coherence-sort every cluster-kernel batch by default: the argsort
# costs a few ms but cuts per-chunk cluster visits ~6x on incoherent
# bounce rays (measured bunny 2M rays: 1.9 s unsorted vs 0.31 s sorted)
CLUSTER_SORT = int(_os.environ.get("MTS_CLUSTER_SORT", 1)) != 0

# "pair": pair-compaction traversal (accel/pairs.py — every lane tests
# a (ray, cluster) pair that passed an exact slab test); "chunk": the
# round-3 chunk-union kernels (accel/pallas_bvh.py)
CLUSTER_MODE = _os.environ.get("MTS_CLUSTER_MODE", "pair")


def _use_pairs(pack):
    return CLUSTER_MODE == "pair" and "cl_sup" in pack.arrays


def _use_inst_pairs(pack):
    """Instance traversal: pair fast path (accel/tlas.py
    inst_closest_pairs) on TPU when every group built cluster tables;
    MTS_TLAS_PAIRS=0 forces the while-loop path."""
    if _os.environ.get("MTS_TLAS_PAIRS", "auto") == "0":
        return False
    return (
        pack.meta.get("inst_pairs_ok", False)
        and CLUSTER_MODE == "pair"
        and _use_pallas()
    )


# sorted-chunked traversal: lockstep while_loops pay the WORST lane's
# node-visit count, so incoherent batches are sorted by direction
# octant + quantized direction + origin morton and traversed in chunks —
# each chunk's loop exits at its own (much smaller) maximum
BVH_SORT_MIN = int(_os.environ.get("MTS_BVH_SORT_MIN", 1 << 16))
BVH_CHUNK = int(_os.environ.get("MTS_BVH_CHUNK", 1 << 15))


def _ray_sort_key(pack, o, d):
    """Coherence sort key: [octant(3) | dir-quant(6) | origin-morton(15)]."""
    oct_ = (
        (d[:, 0] < 0).astype(jnp.uint32)
        + 2 * (d[:, 1] < 0).astype(jnp.uint32)
        + 4 * (d[:, 2] < 0).astype(jnp.uint32)
    )
    ad = jnp.abs(d)
    theta = jnp.clip((ad[:, 2] * 7.999).astype(jnp.uint32), 0, 7)
    phi = jnp.clip(
        (ad[:, 1] / jnp.maximum(ad[:, 0] + ad[:, 1], 1e-9) * 7.999)
        .astype(jnp.uint32), 0, 7,
    )
    lo = pack.bvh_nodes[0, 0:3]
    hi = pack.bvh_nodes[0, 3:6]
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    qi = (q * 31.999).astype(jnp.uint32)  # 5 bits per axis

    def spread5(x):  # interleave 5 bits with 2-bit gaps
        x = (x | (x << 8)) & jnp.uint32(0x0100F)
        x = (x | (x << 4)) & jnp.uint32(0x010C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249)
        return x

    morton = (
        spread5(qi[:, 0]) | (spread5(qi[:, 1]) << 1)
        | (spread5(qi[:, 2]) << 2)
    )
    return (oct_ << 21) | (theta << 18) | (phi << 15) | morton


def _sorted_chunked(pack, o, d, t_max, traverse, n_out):
    """Sort rays by coherence key, traverse in BVH_CHUNK-sized chunks
    via lax.map (sequential — each chunk's while_loop exits on its own),
    scatter results back to original order."""
    r = o.shape[0]
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    key = _ray_sort_key(pack, o, d)
    perm = jnp.argsort(key)
    pad = (-r) % BVH_CHUNK
    if pad:
        perm = jnp.concatenate([perm, jnp.zeros(pad, perm.dtype)])
    os_ = o[perm].reshape(-1, BVH_CHUNK, 3)
    ds_ = d[perm].reshape(-1, BVH_CHUNK, 3)
    tm_s = t_max[perm]
    if pad:  # padded duplicate rays get t_max 0 -> immediate miss
        tm_s = tm_s.at[r:].set(0.0)
    tm_ = tm_s.reshape(-1, BVH_CHUNK)

    outs = jax.lax.map(
        lambda args: traverse(pack, args[0], args[1], args[2]),
        (os_, ds_, tm_),
    )
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    # scatter back to original order; pad entries land in a dummy slot
    idx = jnp.where(jnp.arange(r + pad) < r, perm, r)
    res = []
    for x in outs:
        flat = x.reshape(-1)
        full = jnp.zeros((r + 1,), flat.dtype)
        full = full.at[idx].set(flat)
        res.append(full[:r])
    return res if n_out > 1 else res[0]


def _anim_ray(o, d, m1, tt):
    """Transform world rays into an animated shape's keyframe-0 frame:
    M(t) = I + t (M1 - I) affine-lerped per lane, inverted in closed
    form (reference AnimatedTransform::eval, track.h:335-402; exact
    for translation/scale keyframes, chordal for rotations)."""
    L1 = m1[:9].reshape(3, 3)
    b1 = m1[9:12]
    tt3 = tt[..., None]
    # A = I + t (L1 - I); b = t * b1
    A = jnp.eye(3) + tt3[..., None] * (L1 - jnp.eye(3))[None]
    b = tt3 * b1[None]
    # closed-form 3x3 inverse (adjugate / det)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    def apply_inv(v):
        x = (c00 * v[..., 0] + c01 * v[..., 1] + c02 * v[..., 2])
        y = (c10 * v[..., 0] + c11 * v[..., 1] + c12 * v[..., 2])
        z = (c20 * v[..., 0] + c21 * v[..., 1] + c22 * v[..., 2])
        return jnp.stack([x, y, z], axis=-1) * inv_det[..., None]

    return apply_inv(o - b), apply_inv(d)


def _anim_closest(pack, o, d, time, best_t, best_prim, best_u, best_v):
    """Animated shapes: per-shape relative-motion ray transform +
    tiled brute force over the shape's triangle range."""
    r = o.shape[0]
    tt = (
        jnp.broadcast_to(time, (r,)).astype(jnp.float32)
        if time is not None else jnp.full((r,), 0.5, jnp.float32)
    )
    for a, (first, count) in enumerate(pack.meta["anim_ranges"]):
        o2, d2 = _anim_ray(o, d, pack.anim_m1[a], tt)
        v0 = pack.tri_v0[first:first + count]
        e1 = pack.tri_e1[first:first + count]
        e2 = pack.tri_e2[first:first + count]
        n_tiles = (count + TRI_TILE - 1) // TRI_TILE
        pad_to = n_tiles * TRI_TILE
        v0p = _pad_rows(v0, pad_to, 1e30)
        e1p = _pad_rows(e1, pad_to, 0.0)
        e2p = _pad_rows(e2, pad_to, 0.0)
        for ti in range(n_tiles):
            sl = slice(ti * TRI_TILE, (ti + 1) * TRI_TILE)
            hit, t, u, v = _moller_trumbore(
                o2[:, None, :], d2[:, None, :],
                v0p[None, sl], e1p[None, sl], e2p[None, sl],
                best_t[:, None],
            )
            t = jnp.where(hit, t, jnp.inf)
            k = jnp.argmin(t, axis=-1)
            tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
            better = tk < best_t
            best_prim = jnp.where(
                better, first + ti * TRI_TILE + k.astype(jnp.int32),
                best_prim,
            )
            best_u = jnp.where(
                better, jnp.take_along_axis(u, k[:, None], -1)[:, 0],
                best_u,
            )
            best_v = jnp.where(
                better, jnp.take_along_axis(v, k[:, None], -1)[:, 0],
                best_v,
            )
            best_t = jnp.minimum(best_t, tk)
    return best_t, best_prim, best_u, best_v


def _anim_any(pack, o, d, time, t_max):
    r = o.shape[0]
    tt = (
        jnp.broadcast_to(time, (r,)).astype(jnp.float32)
        if time is not None else jnp.full((r,), 0.5, jnp.float32)
    )
    occ = jnp.zeros((r,), bool)
    tm = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    for a, (first, count) in enumerate(pack.meta["anim_ranges"]):
        o2, d2 = _anim_ray(o, d, pack.anim_m1[a], tt)
        v0 = pack.tri_v0[first:first + count]
        e1 = pack.tri_e1[first:first + count]
        e2 = pack.tri_e2[first:first + count]
        n_tiles = (count + TRI_TILE - 1) // TRI_TILE
        pad_to = n_tiles * TRI_TILE
        v0p = _pad_rows(v0, pad_to, 1e30)
        e1p = _pad_rows(e1, pad_to, 0.0)
        e2p = _pad_rows(e2, pad_to, 0.0)
        for ti in range(n_tiles):
            sl = slice(ti * TRI_TILE, (ti + 1) * TRI_TILE)
            hit, _, _, _ = _moller_trumbore(
                o2[:, None, :], d2[:, None, :],
                v0p[None, sl], e1p[None, sl], e2p[None, sl],
                tm[:, None],
            )
            occ = occ | jnp.any(hit, axis=-1)
    return occ


def _deform_time(time, r):
    return (
        jnp.broadcast_to(time, (r,)).astype(jnp.float32)
        if time is not None else jnp.full((r,), 0.5, jnp.float32)
    )


def _deform_frames(pack, rr_, count, times, tt):
    """Per-lane keyframe-pair selector for one deformable shape.

    The reference resolves each ray's time through a 4D (space x time)
    SAH kd-tree (sahkdtree4.h:97 — a ray only visits cells of its own
    time slab).  The TPU-native equivalent of that time binning is
    lane-wise: each lane computes its segment index once, and the
    triangle rows of ITS OWN keyframe pair are fetched with a one-hot
    [R, K] x [K, tile*9] MXU contraction — so total work is
    O(rays x tris), independent of the keyframe count, instead of the
    previous masked O(rays x tris x segments) loop.

    Returns (fetch(slice) -> lerped [R, tile, 9] triangle rows, pad_to).
    """
    frames = pack.arrays[f"deform_tri9_{rr_}"]  # [K, T, 9]
    k = len(times)
    n_tiles = (count + TRI_TILE - 1) // TRI_TILE
    pad_to = n_tiles * TRI_TILE
    fp = jnp.pad(frames, ((0, 0), (0, pad_to - count), (0, 0)))
    if pad_to > count:
        fp = fp.at[:, count:, 0:3].set(1e30)

    tgrid = jnp.asarray(times, jnp.float32)
    seg = jnp.clip(
        jnp.searchsorted(tgrid, tt, side="right") - 1, 0, k - 2
    )
    t0 = tgrid[seg]
    t1 = tgrid[jnp.minimum(seg + 1, k - 1)]
    w = jnp.clip((tt - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)

    if k == 2:  # single segment: no selection needed
        def fetch(sl):
            a, b = fp[0, sl], fp[1, sl]
            return a[None] + w[:, None, None] * (b - a)[None]
    else:
        oh_a = jax.nn.one_hot(seg, k, dtype=fp.dtype)      # [R, K]
        oh_b = jax.nn.one_hot(seg + 1, k, dtype=fp.dtype)

        def fetch(sl):
            flat = fp[:, sl].reshape(k, -1)                # [K, tile*9]
            fa = oh_a @ flat
            fb = oh_b @ flat
            r = tt.shape[0]
            return (fa + w[:, None] * (fb - fa)).reshape(r, -1, 9)

    return fetch, pad_to


def _deform_closest(pack, o, d, time, best_t, best_prim, best_u, best_v):
    """Deformable shapes (reference deformable.cpp SpaceTimeKDTree):
    each lane lerps the triangle rows of its own keyframe segment
    (one-hot time binning, _deform_frames) and runs tiled brute force."""
    r = o.shape[0]
    tt = _deform_time(time, r)
    for rr_, (first, count, times) in enumerate(
        pack.meta["deform_ranges"]
    ):
        fetch, pad_to = _deform_frames(pack, rr_, count, times, tt)
        for ti in range(pad_to // TRI_TILE):
            sl = slice(ti * TRI_TILE, (ti + 1) * TRI_TILE)
            tri = fetch(sl)
            hit, t, u, v = _moller_trumbore(
                o[:, None, :], d[:, None, :],
                tri[..., 0:3], tri[..., 3:6], tri[..., 6:9],
                best_t[:, None],
            )
            t = jnp.where(hit, t, jnp.inf)
            k = jnp.argmin(t, axis=-1)
            tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
            better = tk < best_t
            best_prim = jnp.where(
                better,
                first + ti * TRI_TILE + k.astype(jnp.int32),
                best_prim,
            )
            best_u = jnp.where(
                better,
                jnp.take_along_axis(u, k[:, None], -1)[:, 0],
                best_u,
            )
            best_v = jnp.where(
                better,
                jnp.take_along_axis(v, k[:, None], -1)[:, 0],
                best_v,
            )
            best_t = jnp.minimum(best_t, tk)
    return best_t, best_prim, best_u, best_v


def _deform_any(pack, o, d, time, t_max):
    r = o.shape[0]
    tt = _deform_time(time, r)
    occ = jnp.zeros((r,), bool)
    tm = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    for rr_, (first, count, times) in enumerate(
        pack.meta["deform_ranges"]
    ):
        fetch, pad_to = _deform_frames(pack, rr_, count, times, tt)
        for ti in range(pad_to // TRI_TILE):
            sl = slice(ti * TRI_TILE, (ti + 1) * TRI_TILE)
            tri = fetch(sl)
            hit, _, _, _ = _moller_trumbore(
                o[:, None, :], d[:, None, :],
                tri[..., 0:3], tri[..., 3:6], tri[..., 6:9],
                tm[:, None],
            )
            occ = occ | jnp.any(hit, axis=-1)
    return occ


def intersect(pack, o, d, t_max=jnp.inf, sort=False, time=None) -> Hit:
    """Closest-hit query (= Scene::rayIntersect, reference scene.h:187).

    sort=True enables coherence-sorted chunked BVH traversal — a win
    for large INCOHERENT top-level batches (kdbench); never use it
    inside a bounce loop (nested sequential loops compile terribly).
    time: per-lane shutter time in [0,1] for animated shapes (None =
    shutter midpoint)."""
    if _static_tris(pack) > 0:
        if pack.use_bvh:
            if _use_clusters(pack):
                if _use_pairs(pack):
                    from mitsuba_tpu.accel import pairs as prs

                    best_t, prim, u, v = prs.pair_closest(
                        pack, o, d, t_max
                    )
                else:
                    from mitsuba_tpu.accel import pallas_bvh as pb

                    best_t, prim, u, v = pb.cluster_closest(
                        pack, o, d, t_max, sort=sort or CLUSTER_SORT
                    )
            elif sort:
                best_t, prim, u, v = _sorted_chunked(
                    pack, o, d, t_max, _bvh_traverse, 4
                )
            else:
                best_t, prim, u, v = _bvh_traverse(pack, o, d, t_max)
        elif _use_pallas():
            from mitsuba_tpu.accel import pallas_kernels as pk

            tmax_arr = jnp.where(
                jnp.isfinite(jnp.asarray(t_max)), t_max, 1e30
            )
            best_t, prim = pk.closest_hit_v2(o, d, tmax_arr, pack.tri_s)
            best_t = jnp.where(
                prim >= 0,
                best_t,
                jnp.broadcast_to(t_max, best_t.shape).astype(jnp.float32),
            )
            pi = jnp.maximum(prim, 0)
            v0, e1, e2 = take_fused(
                pi, pack.tri_v0, pack.tri_e1, pack.tri_e2
            )
            _, _, u, v = _moller_trumbore(o, d, v0, e1, e2, jnp.inf)
            u = jnp.where(prim >= 0, u, 0.0)
            v = jnp.where(prim >= 0, v, 0.0)
        else:
            best_t, prim, u, v = _brute_force(pack, o, d, t_max)
    else:
        r = o.shape[0]
        best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
        prim = jnp.full((r,), -1, jnp.int32)
        u = v = jnp.zeros((r,), jnp.float32)

    if pack.meta.get("anim_ranges", ()):
        best_t, prim, u, v = _anim_closest(
            pack, o, d, time, best_t, prim, u, v
        )

    if pack.meta.get("deform_ranges", ()):
        best_t, prim, u, v = _deform_closest(
            pack, o, d, time, best_t, prim, u, v
        )

    inst = jnp.full((o.shape[0],), -1, jnp.int32)
    if pack.meta.get("has_instances", False):
        from mitsuba_tpu.accel.tlas import inst_closest, inst_closest_pairs

        inst_fn = (
            inst_closest_pairs if _use_inst_pairs(pack) else inst_closest
        )
        best_t, prim, u, v, inst = inst_fn(
            pack, o, d, best_t, prim, u, v, inst
        )

    is_sphere = jnp.zeros(o.shape[0], bool)
    if pack.n_spheres > 0:
        sh, st, sid = _intersect_spheres(pack, o, d, best_t)
        take = sh & (st < best_t)
        best_t = jnp.where(take, st, best_t)
        prim = jnp.where(take, sid, prim)
        is_sphere = take
        inst = jnp.where(take, -1, inst)

    is_cyl = jnp.zeros(o.shape[0], bool)
    if pack.meta.get("n_cyls", 0) > 0:
        from mitsuba_tpu.accel.cyl import cyl_closest

        ch, ct, cid = cyl_closest(pack, o, d, best_t)
        take = ch & (ct < best_t)
        best_t = jnp.where(take, ct, best_t)
        prim = jnp.where(take, cid, prim)
        is_cyl = take
        is_sphere = is_sphere & ~take
        inst = jnp.where(take, -1, inst)

    valid = prim >= 0
    return Hit(valid=valid, t=best_t, prim=prim, is_sphere=is_sphere,
               u=u, v=v, inst=inst, is_cyl=is_cyl)


def occluded(pack, o, d, t_max, sort=False, time=None) -> jnp.ndarray:
    """Boolean shadow query (= rayIntersect any-hit path).

    t_max must already be shortened by the caller's epsilon.
    """
    anim = pack.meta.get("anim_ranges", ())
    if _static_tris(pack) > 0:
        if pack.use_bvh:
            if _use_clusters(pack):
                if _use_pairs(pack):
                    from mitsuba_tpu.accel import pairs as prs

                    occ = prs.pair_any(pack, o, d, t_max)
                else:
                    from mitsuba_tpu.accel import pallas_bvh as pb

                    occ = pb.cluster_any(
                        pack, o, d, t_max, sort=sort or CLUSTER_SORT
                    )
            elif sort:
                occ = _sorted_chunked(
                    pack, o, d, t_max, _bvh_traverse_any, 1
                )
            else:
                occ = _bvh_traverse_any(pack, o, d, t_max)
        elif _use_pallas():
            from mitsuba_tpu.accel import pallas_kernels as pk

            occ = pk.any_hit_v2(o, d, t_max, pack.tri_s)
        else:
            occ = _brute_force_any(pack, o, d, t_max)
        if pack.n_spheres > 0:
            sh, st, _ = _intersect_spheres(
                pack, o, d, jnp.broadcast_to(t_max, (o.shape[0],))
            )
            occ = occ | sh
        if pack.meta.get("n_cyls", 0) > 0:
            from mitsuba_tpu.accel.cyl import cyl_any

            occ = occ | cyl_any(pack, o, d, t_max)
        if anim:
            occ = occ | _anim_any(pack, o, d, time, t_max)
        if pack.meta.get("deform_ranges", ()):
            occ = occ | _deform_any(pack, o, d, time, t_max)
        if pack.meta.get("has_instances", False):
            from mitsuba_tpu.accel.tlas import inst_any, inst_any_pairs

            any_fn = (
                inst_any_pairs if _use_inst_pairs(pack) else inst_any
            )
            occ = occ | any_fn(pack, o, d, t_max)
        return occ
    hit = intersect(pack, o, d, t_max, time=time)
    return hit.valid


class SurfaceInteraction(NamedTuple):
    valid: jnp.ndarray
    t: jnp.ndarray
    p: jnp.ndarray  # [R, 3]
    ng: jnp.ndarray  # geometric normal
    ns: jnp.ndarray  # shading normal
    uv: jnp.ndarray  # [R, 2]
    mat: jnp.ndarray  # material id
    emit: jnp.ndarray  # emitter id (-1 none)
    prim: jnp.ndarray
    wi_world: jnp.ndarray  # -ray.d
    med_in: jnp.ndarray  # interior medium id (-1 vacuum)
    med_ex: jnp.ndarray  # exterior medium id
    dpdu: jnp.ndarray  # [R, 3] uv-aligned tangent (bump/normal maps)
    dpdv: jnp.ndarray  # [R, 3] second uv partial (anisotropic mip LOD)
    bary: jnp.ndarray  # [R, 2] triangle barycentrics (geom textures)


def fill_interaction(pack, o, d, hit: Hit) -> SurfaceInteraction:
    """Gather per-hit surface data (= fillIntersectionRecord,
    reference records.inl).

    All per-triangle attributes come from ONE fused one-hot matmul
    (core/gather.py) — random gathers are ~1000x more expensive than
    MXU flops on TPU, and this function was the round-1 hot spot."""
    prim = jnp.maximum(hit.prim, 0)

    # triangle branch — single fused attribute fetch
    if pack.meta.get("has_media", False):
        (e1, e2, n0, n1, n2, tuv0, tuv1, tuv2, mat_tri, emit_tri,
         med_in_t, med_ex_t) = take_fused(
            prim, pack.tri_e1, pack.tri_e2, pack.tri_n0, pack.tri_n1,
            pack.tri_n2, pack.tri_uv0, pack.tri_uv1, pack.tri_uv2,
            pack.tri_mat, pack.tri_emit, pack.tri_med_in, pack.tri_med_ex,
        )
    else:
        (e1, e2, n0, n1, n2, tuv0, tuv1, tuv2, mat_tri, emit_tri) = (
            take_fused(
                prim, pack.tri_e1, pack.tri_e2, pack.tri_n0, pack.tri_n1,
                pack.tri_n2, pack.tri_uv0, pack.tri_uv1, pack.tri_uv2,
                pack.tri_mat, pack.tri_emit,
            )
        )
    w = 1.0 - hit.u - hit.v
    ng_tri = mm.normalize(mm.cross(e1, e2))
    ns_tri = mm.normalize(
        w[:, None] * n0 + hit.u[:, None] * n1 + hit.v[:, None] * n2
    )
    uv_tri = (
        w[:, None] * tuv0 + hit.u[:, None] * tuv1 + hit.v[:, None] * tuv2
    )

    p = o + hit.t[:, None] * d

    if pack.n_spheres > 0:
        sid = prim
        center, flip_s, mat_s, emit_s = take_fused(
            sid, pack.sph_center, pack.sph_flip, pack.sph_mat, pack.sph_emit
        )
        ns_sph = mm.normalize(p - center) * flip_s[:, None]
        theta_phi_n = mm.normalize(p - center)
        theta = mm.safe_acos(theta_phi_n[..., 2])
        phi = jnp.arctan2(theta_phi_n[..., 1], theta_phi_n[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        uv_sph = jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], axis=-1)
        sphere = hit.is_sphere
        ng = jnp.where(sphere[:, None], ns_sph, ng_tri)
        ns = jnp.where(sphere[:, None], ns_sph, ns_tri)
        uv = jnp.where(sphere[:, None], uv_sph, uv_tri)
        mat = jnp.where(sphere, mat_s, mat_tri)
        emit = jnp.where(sphere, emit_s, emit_tri)
    else:
        ng, ns, uv, mat, emit = ng_tri, ns_tri, uv_tri, mat_tri, emit_tri

    if pack.meta.get("n_cyls", 0) > 0 and hit.is_cyl is not None:
        # analytic segment hit: radial normal = projection of (p - p0)
        # perpendicular to the axis (reference hair.cpp
        # fillIntersectionRecord:838-846; uv stays (0,0) like the
        # reference's hair primitive)
        cp0, cp1, cmat_r, cflip = take_fused(
            prim, pack.cyl_p0, pack.cyl_p1, pack.cyl_mat, pack.cyl_flip
        )
        cax = mm.normalize(cp1 - cp0)
        relh = p - cp0
        n_cylv = mm.normalize(
            relh - mm.dot(relh, cax)[:, None] * cax
        ) * cflip[:, None]
        cylm = hit.is_cyl
        ng = jnp.where(cylm[:, None], n_cylv, ng)
        ns = jnp.where(cylm[:, None], n_cylv, ns)
        uv = jnp.where(cylm[:, None], 0.0, uv)
        mat = jnp.where(cylm, cmat_r, mat)
        emit = jnp.where(cylm, -1, emit)

    # instanced hits: attributes were gathered in the group's LOCAL
    # space; rotate normals into the world by the instance's
    # inverse-transpose (accel/tlas.py; reference instance.cpp
    # fillIntersectionRecord applies the same frame transform)
    if pack.meta.get("has_instances", False) and hit.inst is not None:
        im = jnp.maximum(hit.inst, 0)
        sel = (hit.inst >= 0)[:, None]
        Ln = pack.inst_nrm[im].reshape(-1, 3, 3)
        ns = jnp.where(
            sel, mm.normalize(jnp.einsum("rij,rj->ri", Ln, ns)), ns
        )
        ng = jnp.where(
            sel, mm.normalize(jnp.einsum("rij,rj->ri", Ln, ng)), ng
        )

    # orient the geometric normal to the shading normal's hemisphere
    flip = mm.dot(ng, ns) < 0.0
    ng = jnp.where(flip[:, None], -ng, ng)

    if pack.meta.get("has_media", False):
        med_in, med_ex = med_in_t, med_ex_t
        if pack.n_spheres > 0:
            med_in_s, med_ex_s = take_fused(
                prim, pack.sph_med_in, pack.sph_med_ex
            )
            med_in = jnp.where(hit.is_sphere, med_in_s, med_in)
            med_ex = jnp.where(hit.is_sphere, med_ex_s, med_ex)
        if pack.meta.get("n_cyls", 0) > 0 and hit.is_cyl is not None:
            med_in = jnp.where(hit.is_cyl, -1, med_in)
            med_ex = jnp.where(hit.is_cyl, -1, med_ex)
    else:
        med_in = jnp.full(hit.t.shape, -1, jnp.int32)
        med_ex = med_in

    # uv partials: needed by bump/normal maps AND by mip LOD selection
    # (mip_footprint divides by |dpdu| — leaving it zero on mip-only
    # scenes used to force every bitmap to its coarsest level)
    if pack.meta.get("has_bumpmaps", False) or pack.meta.get(
        "has_mips", False
    ):
        dpdu, dpdv = take_fused(prim, pack.tri_dpdu, pack.tri_dpdv)
        if pack.meta.get("has_instances", False) and hit.inst is not None:
            imf = jnp.maximum(hit.inst, 0)
            Lf = pack.inst_fwd[imf].reshape(-1, 3, 3)
            isel = (hit.inst >= 0)[:, None]
            dpdu = jnp.where(
                isel, jnp.einsum("rij,rj->ri", Lf, dpdu), dpdu
            )
            dpdv = jnp.where(
                isel, jnp.einsum("rij,rj->ri", Lf, dpdv), dpdv
            )
        if pack.n_spheres > 0:
            # lat-long parameterization partials with true magnitudes:
            # |dp/du| = 2 pi r sin(theta), |dp/dv| = pi r
            radius = take_fused(prim, pack.sph_radius)[0]
            rel = mm.normalize(p - center)
            sin_t = jnp.sqrt(
                jnp.maximum(1.0 - rel[..., 2] * rel[..., 2], 1e-12)
            )
            t_phi = mm.normalize(
                jnp.stack(
                    [-(p - center)[..., 1], (p - center)[..., 0],
                     jnp.zeros_like(hit.t)], axis=-1,
                )
            )
            t_theta = mm.normalize(mm.cross(t_phi, rel))
            dpdu = jnp.where(
                hit.is_sphere[:, None],
                t_phi * (2.0 * jnp.pi * radius * sin_t)[:, None],
                dpdu,
            )
            dpdv = jnp.where(
                hit.is_sphere[:, None],
                t_theta * (jnp.pi * radius)[:, None],
                dpdv,
            )
    else:
        dpdu = jnp.zeros_like(ng)
        dpdv = jnp.zeros_like(ng)

    return SurfaceInteraction(
        valid=hit.valid,
        t=hit.t,
        p=p,
        ng=ng,
        ns=ns,
        uv=uv,
        mat=mat,
        emit=emit,
        prim=hit.prim,
        wi_world=-d,
        med_in=med_in,
        med_ex=med_ex,
        dpdu=dpdu,
        dpdv=dpdv,
        bary=jnp.stack([hit.u, hit.v], axis=-1),
    )
