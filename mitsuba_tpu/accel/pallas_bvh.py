"""Pallas cluster traversal: big-mesh intersection at wavefront rates.

The TPU-native replacement for the reference's per-ray SAH kd-tree
stack traversal (reference: include/mitsuba/render/sahkdtree3.h:178-249
and the SSE packet variant skdtree.h:183-190).  Per-lane pointer
chasing needs divergent gathers — the slowest primitive on TPU — so
instead rays are coherence-sorted into CHUNK-sized packets and each
packet visits only the treelet clusters (accel/clusters.py) its
bounding cone touches, front-to-back:

  XLA prepass (per chunk): conservative chunk-cone vs cluster-sphere
      tests -> compacted, entry-distance-sorted cluster list
  Pallas kernel (grid = chunks): while clusters remain and the nearest
      unvisited cluster could still beat some lane's best_t:
        scalar-indexed slice of the cluster's [9, Tc] triangle tile
        (no gathers — cluster ids come from SMEM), one [9,Tc]->[Tc,16]
        transpose, dense Möller-Trumbore [Tc, CHUNK] on the VPU,
        masked min-reduction into per-lane best (t, prim).

Everything stays in VMEM; HBM traffic is the ray/hit arrays only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_EPS = 1e-4
CHUNK = int(os.environ.get("MTS_CLUSTER_CHUNK", 1024))
BIG = 3e38


def _mt_cluster(ox, oy, oz, dx, dy, dz, st, t_lim, with_uv=False):
    """Möller-Trumbore: [Tc, 1] triangle columns (from the transposed
    tile st [Tc, 16]) against [1, CHUNK] ray rows -> [Tc, CHUNK]."""
    v0x, v0y, v0z = st[:, 0:1], st[:, 1:2], st[:, 2:3]
    e1x, e1y, e1z = st[:, 3:4], st[:, 4:5], st[:, 5:6]
    e2x, e2y, e2z = st[:, 6:7], st[:, 7:8], st[:, 8:9]

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
    if with_uv:
        return t, u, v, hit
    return t, hit


def _tile_t(tri_ref, cid, tc):
    """[9, Tc] lane-major slice -> [Tc, 16] sublane-major (one hardware
    transpose per cluster visit; everything downstream broadcasts)."""
    s = tri_ref[:, pl.ds(cid * tc, tc)]  # [9, Tc]
    sp = jnp.concatenate([s, jnp.zeros((7, tc), jnp.float32)], axis=0)
    return sp.T  # [Tc, 16]


def _slab(cb_ref, cid, ox, oy, oz, ix, iy, iz):
    """Per-ray AABB slab test against cluster cid's (scalar) box."""
    t0x = (cb_ref[0, cid] - ox) * ix
    t1x = (cb_ref[3, cid] - ox) * ix
    t0y = (cb_ref[1, cid] - oy) * iy
    t1y = (cb_ref[4, cid] - oy) * iy
    t0z = (cb_ref[2, cid] - oz) * iz
    t1z = (cb_ref[5, cid] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return tn, tf


def _ray_setup(o_ref, d_ref):
    # refs are [1, 3, CHUNK] blocks; components come out [1, CHUNK]
    ox, oy, oz = o_ref[0, 0:1, :], o_ref[0, 1:2, :], o_ref[0, 2:3, :]
    dx, dy, dz = d_ref[0, 0:1, :], d_ref[0, 1:2, :], d_ref[0, 2:3, :]
    eps = 1e-20

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < eps, eps, c)

    return ox, oy, oz, dx, dy, dz, inv(dx), inv(dy), inv(dz)


def _closest_kernel(tc, cp, order_ref, entry_ref, h_ref, cb_ref,
                    o_ref, d_ref, tmax_ref, tri_ref, t_out, prim_out,
                    u_out, v_out):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_setup(o_ref, d_ref)
    n_h = h_ref[0, 0, 0]
    t_init = tmax_ref[0, 0:1, :]

    def cond(state):
        h, best_t = state[0], state[1]
        ent = entry_ref[0, 0, jnp.minimum(h, cp - 1)]
        # front-to-back: once the nearest unvisited cluster is farther
        # than every lane's current best, nothing can improve
        return (h < n_h) & (ent <= jnp.max(best_t))

    def body(state):
        h, best_t, best_prim, best_u, best_v = state
        cid = order_ref[0, 0, h]
        tn, tf = _slab(cb_ref, cid, ox, oy, oz, ix, iy, iz)
        boxhit = (tf >= jnp.maximum(tn, 0.0)) & (tn < best_t)

        def visit(carry):
            best_t, best_prim, best_u, best_v = carry
            st = _tile_t(tri_ref, cid, tc)
            t_lim = jnp.where(boxhit, best_t, 0.0)
            t, u, v, hit = _mt_cluster(
                ox, oy, oz, dx, dy, dz, st, t_lim, with_uv=True
            )
            t = jnp.where(hit, t, BIG)
            tmin = jnp.min(t, axis=0, keepdims=True)
            row = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            at_min = rows == row
            u_min = jnp.max(jnp.where(at_min, u, -BIG), axis=0,
                            keepdims=True)
            v_min = jnp.max(jnp.where(at_min, v, -BIG), axis=0,
                            keepdims=True)
            better = tmin < best_t
            best_prim = jnp.where(better, cid * tc + row, best_prim)
            best_t = jnp.where(better, tmin, best_t)
            best_u = jnp.where(better, u_min, best_u)
            best_v = jnp.where(better, v_min, best_v)
            return best_t, best_prim, best_u, best_v

        carry = jax.lax.cond(
            jnp.any(boxhit), visit, lambda c: c,
            (best_t, best_prim, best_u, best_v),
        )
        return (h + 1,) + carry

    zero = jnp.zeros(t_init.shape, jnp.float32)
    _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            t_init,
            jnp.full(t_init.shape, -1, jnp.int32),
            zero,
            zero,
        ),
    )
    t_out[0, 0:1, :] = best_t
    prim_out[0, 0:1, :] = best_prim
    u_out[0, 0:1, :] = best_u
    v_out[0, 0:1, :] = best_v


def _any_kernel(tc, cp, order_ref, entry_ref, h_ref, cb_ref,
                o_ref, d_ref, tmax_ref, tri_ref, occ_out):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_setup(o_ref, d_ref)
    n_h = h_ref[0, 0, 0]
    t_lim0 = tmax_ref[0, 0:1, :]

    def cond(state):
        h, occ = state
        # occ is an int32 0/1 mask — Mosaic can't carry i1 vectors
        return (h < n_h) & (jnp.min(occ) < 1)

    def body(state):
        h, occ = state
        cid = order_ref[0, 0, h]
        tn, tf = _slab(cb_ref, cid, ox, oy, oz, ix, iy, iz)
        boxhit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_lim0) & (occ < 1)

        def visit(occ):
            st = _tile_t(tri_ref, cid, tc)
            t_lim = jnp.where(boxhit, t_lim0, 0.0)
            _, hit = _mt_cluster(ox, oy, oz, dx, dy, dz, st, t_lim)
            found = jnp.any(hit, axis=0, keepdims=True)
            return jnp.maximum(occ, found.astype(jnp.int32))

        occ = jax.lax.cond(jnp.any(boxhit), visit, lambda c: c, occ)
        return h + 1, occ

    _, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), (t_lim0 <= 0.0).astype(jnp.int32))
    )
    occ_out[0, 0:1, :] = occ


def _chunk_prepass(o, d, tmax, boxes):
    """EXACT per-chunk cluster culling: every ray slab-tests every
    cluster box, the per-cluster union over the chunk gives the visit
    mask, and min entry distance gives the front-to-back order.  At
    ~25 flops per (ray, cluster) pair this costs ~2% of one cluster
    visit — far tighter than any chunk-bounding-cone test.

    o, d: [CHUNK, 3]; boxes: [8, Cp] (lo rows 0-2, hi rows 3-5).
    Returns (order [Cp] i32, entry_sorted [Cp] f32, h [] i32)."""
    lo = boxes[0:3].T  # [Cp, 3]
    hi = boxes[3:6].T
    valid_c = boxes[3] >= boxes[0]  # padded clusters are inverted
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]  # [R, Cp, 3]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.minimum(t0, t1).max(axis=-1)  # [R, Cp]
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit_rc = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax[:, None])
    hit = jnp.any(hit_rc, axis=0) & valid_c
    entry = jnp.min(
        jnp.where(hit_rc, jnp.maximum(tn, 0.0), BIG), axis=0
    )
    key = jnp.where(hit, entry, BIG)
    order = jnp.argsort(key).astype(jnp.int32)
    entry_sorted = jnp.sort(key).astype(jnp.float32)
    return order, entry_sorted, jnp.sum(hit).astype(jnp.int32)


def _sort_key(o, d, slo, shi):
    """6D line-space Z-order coherence key: interleaved 5-bit morton of
    the ray's ENTRY and EXIT points on the scene box (paired per axis).
    Two points determine the chord, so chunks of consecutive keys are
    tight bundles of nearly-identical rays — measured 4.6x fewer
    cluster visits per chunk than direction/origin keys (the vector
    analogue of the reference's coherent packet grouping,
    skdtree.h:183)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    t0 = (slo[None, :] - o) * inv
    t1 = (shi[None, :] - o) * inv
    tn = jnp.maximum(jnp.minimum(t0, t1).max(axis=-1), 0.0)
    tf = jnp.maximum(jnp.maximum(t0, t1).min(axis=-1), tn)
    p_in = o + tn[:, None] * d
    p_out = o + tf[:, None] * d
    ext = jnp.maximum(shi - slo, 1e-9)

    def q5(p):
        q = jnp.clip((p - slo[None, :]) / ext[None, :], 0.0, 1.0)
        return (q * 31.999).astype(jnp.uint32)

    qi = q5(p_in)
    qo = q5(p_out)
    fields = [qi[:, 0], qo[:, 0], qi[:, 1], qo[:, 1], qi[:, 2], qo[:, 2]]
    key = jnp.zeros(o.shape[0], jnp.uint32)
    for b in range(4, -1, -1):
        for fld in fields:
            key = (key << 1) | ((fld >> b) & 1)
    return key


def _chunk_size(r):
    if r >= CHUNK:
        return CHUNK
    return max(((r + 127) // 128) * 128, 128)


def _run(pack, o, d, t_max, sort, mode, interpret):
    cl_tri = pack.cl_tri
    cl_box = pack.cl_box
    tc = pack.meta["cluster_tc"]
    cp = cl_box.shape[1]
    ct = cl_tri.shape[1]
    r = o.shape[0]
    chunk = _chunk_size(r)
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    t_max = jnp.where(jnp.isfinite(t_max), t_max, BIG)

    if sort:
        n_cl = pack.meta["n_clusters"]
        slo = cl_box[0:3, :n_cl].min(axis=1)
        shi = cl_box[3:6, :n_cl].max(axis=1)
        perm = jnp.argsort(_sort_key(o, d, slo, shi))
    else:
        perm = jnp.arange(r)
    pad = (-r) % chunk
    if pad:
        perm = jnp.concatenate([perm, jnp.zeros(pad, perm.dtype)])
    nc = (r + pad) // chunk
    o_s = o[perm].reshape(nc, chunk, 3)
    d_s = d[perm].reshape(nc, chunk, 3)
    tm_s = t_max[perm]
    if pad:
        tm_s = tm_s.at[r:].set(0.0)  # padded duplicates: immediate miss
    tm_c = tm_s.reshape(nc, chunk)

    # sequential map keeps the [CHUNK, Cp] slab intermediates bounded
    order, entry, h = jax.lax.map(
        lambda args: _chunk_prepass(args[0], args[1], args[2], cl_box),
        (o_s, d_s, tm_c),
    )
    # TPU block rule: last two block dims must divide (8, 128) or equal
    # the array dims — so per-chunk rows ride a leading grid axis with
    # full trailing dims
    order = order.reshape(nc, 1, cp)
    entry = entry.reshape(nc, 1, cp)
    h = h.reshape(nc, 1, 1)
    o_t = jnp.swapaxes(o_s, 1, 2).reshape(nc, 3, chunk)
    d_t = jnp.swapaxes(d_s, 1, 2).reshape(nc, 3, chunk)
    tm3 = tm_c.reshape(nc, 1, chunk)

    in_specs = [
        pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((8, cp), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, chunk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, chunk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, ct), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (order, entry, h, cl_box, o_t, d_t, tm3, cl_tri)

    if mode == "closest":
        ospec = pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_closest_kernel, tc, cp),
            grid=(nc,),
            in_specs=in_specs,
            out_specs=[ospec, ospec, ospec, ospec],
            out_shape=[
                jax.ShapeDtypeStruct((nc, 1, chunk), jnp.float32),
                jax.ShapeDtypeStruct((nc, 1, chunk), jnp.int32),
                jax.ShapeDtypeStruct((nc, 1, chunk), jnp.float32),
                jax.ShapeDtypeStruct((nc, 1, chunk), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
    else:
        outs = pl.pallas_call(
            functools.partial(_any_kernel, tc, cp),
            grid=(nc,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((nc, 1, chunk), jnp.int32)],
            interpret=interpret,
        )(*args)

    # scatter back to original ray order (pad entries -> dummy slot)
    idx = jnp.where(jnp.arange(r + pad) < r, perm, r)
    res = []
    for x in outs:
        flat = x.reshape(-1)
        full = jnp.zeros((r + 1,), flat.dtype)
        full = full.at[idx].set(flat)
        res.append(full[:r])
    return res


def cluster_closest(pack, o, d, t_max, sort=False, interpret=False):
    """Closest-hit via the cluster kernel.  Returns (t, prim, u, v) in
    the same convention as accel/intersect._bvh_traverse (t = t_max on
    miss, prim = -1).  t/u/v come straight from the kernel's exact MT
    (no winner-recompute gathers); only prim maps through the
    pad-slot -> triangle-id table (one int gather)."""
    best_t, slot, u, v = _run(pack, o, d, t_max, sort, "closest", interpret)
    prim = jnp.where(slot >= 0, pack.cl_pad2prim[jnp.maximum(slot, 0)], -1)
    miss_t = jnp.broadcast_to(t_max, best_t.shape).astype(jnp.float32)
    hitm = prim >= 0
    return (
        jnp.where(hitm, best_t, miss_t),
        prim,
        jnp.where(hitm, u, 0.0),
        jnp.where(hitm, v, 0.0),
    )


def cluster_any(pack, o, d, t_max, sort=False, interpret=False):
    """Boolean occlusion via the cluster kernel (first hit exits)."""
    (occ,) = _run(pack, o, d, t_max, sort, "any", interpret)
    return occ > 0
