"""Two-level instancing: TLAS over instances spliced with per-instance
copies of each group's BLAS into ONE threaded node array.

The reference traverses a nested kd-tree per instance
(include/mitsuba/render/shapegroup.h:34,63-76 + src/shapes/instance.cpp
rayIntersect: transform the ray into instance space, query the group's
tree).  A stackless skip-link traversal cannot re-enter a shared
subtree (skip pointers are position-dependent), so the TPU design
duplicates NODES per instance — 10 floats each, with world-space boxes
baked per instance — while TRIANGLES stay shared in local space: one
extra gather per leaf visit fetches the instance's world->local affine
and re-bases the ray (direction left unnormalized so the t parameter is
preserved across scaling).  Memory is nodes-per-instance instead of
full per-triangle attribute duplication, the flat-expansion killer.

Node row layout [N, 10]: lo(3) hi(3) first count skip inst_id; internal
rows have count=0 and inst_id=-1.  `first` indexes inst_tri9 (local
triangles in BLAS leaf order); inst_tri2prim maps those rows back to
global triangle ids for shading-attribute lookup.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.bvh import LEAF_SIZE, build_bvh


def _world_box(lo, hi, m):
    """Transform local AABBs [K,3] by affine m (3x4): world AABB of the
    8 corners (loose under rotation, always conservative)."""
    corners = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                c = np.stack(
                    [
                        (hi if cx else lo)[:, 0],
                        (hi if cy else lo)[:, 1],
                        (hi if cz else lo)[:, 2],
                    ],
                    axis=-1,
                )
                corners.append(c @ m[:3, :3].T + m[:3, 3])
    corners = np.stack(corners, axis=0)  # [8, K, 3]
    return corners.min(axis=0), corners.max(axis=0)


def build_instance_accel(groups, tri_v0, tri_e1, tri_e2):
    """groups: list of (row_lo, row_hi, [Transform, ...]) — template
    triangle row ranges (global ids, local space) and the world
    transforms of every instance of that group.

    Returns (arrays dict, meta dict)."""
    blas = []  # per group: (bvh, tri9 rows, tri2prim, n_nodes)
    g_of_inst = []
    xf_of_inst = []
    for gi, (lo_r, hi_r, xfs) in enumerate(groups):
        v0 = tri_v0[lo_r:hi_r]
        e1 = tri_e1[lo_r:hi_r]
        e2 = tri_e2[lo_r:hi_r]
        blo = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
        bhi = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
        cen = v0 + (e1 + e2) / 3.0
        bvh = build_bvh(cen, blo, bhi)
        order = bvh.order
        tri9 = np.concatenate(
            [v0[order], e1[order], e2[order]], axis=-1
        ).astype(np.float32)
        tri2prim = (lo_r + order).astype(np.int32)
        blas.append((bvh, tri9, tri2prim))
        for t in xfs:
            g_of_inst.append(gi)
            xf_of_inst.append(np.asarray(t.m, np.float64))

    n_inst = len(g_of_inst)
    # concatenated local triangle rows + the per-group base offsets
    tri9_all, t2p_all, tri_base, node_count = [], [], [], []
    base = 0
    for bvh, tri9, t2p in blas:
        tri_base.append(base)
        tri9_all.append(tri9)
        t2p_all.append(t2p)
        base += len(tri9)
        node_count.append(len(bvh.skip))
    tri9_all = (
        np.concatenate(tri9_all) if tri9_all
        else np.zeros((1, 9), np.float32)
    )
    t2p_all = (
        np.concatenate(t2p_all) if t2p_all else np.zeros(1, np.int32)
    )
    # pad with a far-away triangle for masked leaf slots
    pad = np.full((1, 9), 1e30, np.float32)
    pad[0, 3:] = 0.0
    tri9_all = np.concatenate([tri9_all, pad])
    t2p_all = np.concatenate([t2p_all, np.zeros(1, np.int32)])

    # instance world AABBs from the group BLAS root boxes
    w_lo = np.zeros((n_inst, 3))
    w_hi = np.zeros((n_inst, 3))
    inst_inv = np.zeros((n_inst, 12), np.float32)
    inst_nrm = np.zeros((n_inst, 9), np.float32)
    inst_fwd = np.zeros((n_inst, 9), np.float32)
    for i in range(n_inst):
        bvh = blas[g_of_inst[i]][0]
        m = xf_of_inst[i]
        lo_i, hi_i = _world_box(bvh.lo[:1], bvh.hi[:1], m)
        w_lo[i], w_hi[i] = lo_i[0], hi_i[0]
        inv = np.linalg.inv(m)
        inst_inv[i, :9] = inv[:3, :3].reshape(-1)
        inst_inv[i, 9:] = inv[:3, 3]
        # local normal -> world: (world->local linear)^T
        inst_nrm[i] = inv[:3, :3].T.reshape(-1)
        inst_fwd[i] = m[:3, :3].reshape(-1)  # tangents transform forward

    tlas = build_bvh(0.5 * (w_lo + w_hi), w_lo, w_hi)
    n_tlas = len(tlas.skip)

    # subtree row counts (threaded DFS: children of internal i are
    # i+1 and skip[i+1]) so the splice can be emitted in one pass
    size = np.zeros(n_tlas, np.int64)

    def subtree_size(i):
        if size[i]:
            return size[i]
        if tlas.count[i] > 0:
            s = 1
            for j in range(tlas.count[i]):
                inst = int(tlas.order[tlas.first[i] + j])
                s += node_count[g_of_inst[inst]]
        else:
            c1 = i + 1
            c2 = int(tlas.skip[c1])
            s = 1 + subtree_size(c1) + subtree_size(c2)
        size[i] = s
        return s

    import sys

    old_lim = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_lim, 10_000))
    try:
        total = subtree_size(0) if n_tlas else 0
        rows = np.zeros((max(total, 1), 10), np.float32)
        cursor = [0]

        def emit_instance(inst, exit_idx):
            gi = g_of_inst[inst]
            bvh = blas[gi][0]
            nb = node_count[gi]
            start = cursor[0]
            m = xf_of_inst[inst]
            lo_w, hi_w = _world_box(bvh.lo, bvh.hi, m)
            sk = np.where(
                bvh.skip >= nb, exit_idx, start + bvh.skip
            ).astype(np.float32)
            first = np.where(
                bvh.count > 0, tri_base[gi] + bvh.first, 0
            ).astype(np.float32)
            rows[start:start + nb, 0:3] = lo_w
            rows[start:start + nb, 3:6] = hi_w
            rows[start:start + nb, 6] = first
            rows[start:start + nb, 7] = bvh.count
            rows[start:start + nb, 8] = sk
            rows[start:start + nb, 9] = np.where(
                bvh.count > 0, float(inst), -1.0
            )
            cursor[0] += nb

        def emit_tlas(i, exit_idx):
            start = cursor[0]
            cursor[0] += 1
            if tlas.count[i] > 0:
                insts = [
                    int(tlas.order[tlas.first[i] + j])
                    for j in range(tlas.count[i])
                ]
                for k, inst in enumerate(insts):
                    nxt = (
                        exit_idx if k == len(insts) - 1
                        else cursor[0] + node_count[g_of_inst[inst]]
                    )
                    emit_instance(inst, nxt)
            else:
                c1 = i + 1
                c2 = int(tlas.skip[c1])
                c2_start = cursor[0] + int(size[c1])
                emit_tlas(c1, c2_start)
                emit_tlas(c2, exit_idx)
            rows[start, 0:3] = tlas.lo[i]
            rows[start, 3:6] = tlas.hi[i]
            rows[start, 6:8] = 0.0
            rows[start, 8] = exit_idx
            rows[start, 9] = -1.0

        if n_tlas:
            emit_tlas(0, total)
    finally:
        sys.setrecursionlimit(old_lim)

    arrays = {
        "inst_nodes": rows,
        "inst_tri9": tri9_all,
        "inst_tri2prim": t2p_all,
        "inst_inv": inst_inv,
        "inst_nrm": inst_nrm,
        "inst_fwd": inst_fwd,
    }
    meta = {"has_instances": n_inst > 0, "n_instances": n_inst}

    # ---- pair fast-path tables (instances-as-clusters front end) ----
    # Each GROUP gets its own cluster tables over the shared LOCAL
    # template triangles, so the pair-compaction traversal
    # (accel/pairs.py) can run template-space rays at full lane
    # occupancy — the reference analogue is instance.cpp rayIntersect
    # transforming the ray and querying the group's kd-tree
    # (shapegroup.h:63-76); here whole WAVEFRONTS of rebased rays hit
    # one group's tables at once instead of one ray walking one tree.
    from mitsuba_tpu.accel.clusters import pack_clusters

    ip = max(((n_inst + 7) // 8) * 8, 8)
    wbox = np.full((ip, 6), 1e30, np.float32)  # point boxes: never hit
    wbox[:n_inst, 0:3] = w_lo
    wbox[:n_inst, 3:6] = w_hi
    arrays["inst_wbox"] = wbox
    grp = np.zeros(ip, np.int32)
    grp[:n_inst] = np.asarray(g_of_inst, np.int32)
    arrays["inst_group"] = grp

    groups_meta = []
    pairs_ok = n_inst > 0
    for gi, (lo_r, hi_r, _) in enumerate(groups):
        count = hi_r - lo_r
        bvh, tri9_g, t2p_g = blas[gi]
        # bvh.first/count index BVH-leaf-ordered rows (= tri9_g)
        v0 = tri9_g[:, 0:3]
        e1 = tri9_g[:, 3:6]
        e2 = tri9_g[:, 6:9]
        # pad with LEAF_SIZE far triangles; index `count` is the far
        # triangle the cluster tables route dummy slots to
        padv = np.full((LEAF_SIZE, 3), 1e30, np.float32)
        padz = np.zeros((LEAF_SIZE, 3), np.float32)
        v0p = np.concatenate([v0, padv])
        e1p = np.concatenate([e1, padz])
        e2p = np.concatenate([e2, padz])
        cl = pack_clusters(bvh, v0p, e1p, e2p, count)
        if cl is None:
            groups_meta.append((int(lo_r), int(count), None))
            pairs_ok = False
            continue
        g_arrays, g_meta = cl
        for k_, v_ in g_arrays.items():
            arrays[f"ig{gi}_{k_}"] = v_
        arrays[f"ig{gi}_tri_v0"] = v0p
        arrays[f"ig{gi}_tri_e1"] = e1p
        arrays[f"ig{gi}_tri_e2"] = e2p
        # leaf-order row -> global prim id (pad rows -> -1)
        arrays[f"ig{gi}_t2p"] = np.concatenate(
            [t2p_g, np.full(LEAF_SIZE, -1, np.int32)]
        )
        groups_meta.append(
            (int(lo_r), int(count), tuple(sorted(g_meta.items())))
        )
    meta["inst_groups"] = tuple(groups_meta)
    meta["inst_pairs_ok"] = pairs_ok
    return arrays, meta


def _rebase(o, d, inv12):
    """World ray -> instance local via per-lane affine rows [R, 12];
    direction NOT renormalized so t carries over."""
    L = inv12[:, :9].reshape(-1, 3, 3)
    b = inv12[:, 9:12]
    o2 = jnp.einsum("rij,rj->ri", L, o) + b
    d2 = jnp.einsum("rij,rj->ri", L, d)
    return o2, d2


def inst_closest(pack, o, d, best_t, best_prim, best_u, best_v,
                 best_inst):
    """Closest-hit over the spliced instance hierarchy (companion of
    intersect._bvh_traverse; one extra gather per leaf for the
    instance's world->local affine)."""
    r = o.shape[0]
    nodes = pack.inst_nodes
    end = nodes.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    def cond(state):
        node = state[0]
        return jnp.any(node < end)

    def step(state):
        node, bt, bp, bu, bv, bi = state
        active = node < end
        ni = jnp.minimum(node, end - 1)
        nd = nodes[ni]
        lo, hi = nd[:, 0:3], nd[:, 3:6]
        first = nd[:, 6].astype(jnp.int32)
        count = nd[:, 7].astype(jnp.int32)
        skip = nd[:, 8].astype(jnp.int32)
        iid = nd[:, 9].astype(jnp.int32)

        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < bt)

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf & active
        o2, d2 = _rebase(o, d, pack.inst_inv[jnp.maximum(iid, 0)])
        tidx = first[:, None] + jnp.arange(
            LEAF_SIZE, dtype=jnp.int32
        )[None]
        tidx = jnp.where(
            jnp.arange(LEAF_SIZE)[None] < count[:, None],
            tidx,
            pack.inst_tri9.shape[0] - 1,
        )
        t9 = pack.inst_tri9[tidx]
        from mitsuba_tpu.accel.intersect import _moller_trumbore

        hit, t, u, v = _moller_trumbore(
            o2[:, None, :], d2[:, None, :],
            t9[..., 0:3], t9[..., 3:6], t9[..., 6:9], bt[:, None],
        )
        hit = hit & do_leaf[:, None]
        t = jnp.where(hit, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
        better = tk < bt
        row = jnp.take_along_axis(tidx, k[:, None], -1)[:, 0]
        bp = jnp.where(better, pack.inst_tri2prim[row], bp)
        bu = jnp.where(
            better, jnp.take_along_axis(u, k[:, None], -1)[:, 0], bu
        )
        bv = jnp.where(
            better, jnp.take_along_axis(v, k[:, None], -1)[:, 0], bv
        )
        bi = jnp.where(better, iid, bi)
        bt = jnp.minimum(bt, tk)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, ni + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, bt, bp, bu, bv, bi

    init = (
        jnp.zeros((r,), jnp.int32), best_t, best_prim, best_u, best_v,
        best_inst,
    )
    _, bt, bp, bu, bv, bi = jax.lax.while_loop(cond, step, init)
    return bt, bp, bu, bv, bi


def inst_any(pack, o, d, t_max):
    """Any-hit over the spliced instance hierarchy."""
    r = o.shape[0]
    nodes = pack.inst_nodes
    end = nodes.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    tm = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)

    def cond(state):
        node, _ = state
        return jnp.any(node < end)

    def step(state):
        node, occ = state
        active = node < end
        ni = jnp.minimum(node, end - 1)
        nd = nodes[ni]
        lo, hi = nd[:, 0:3], nd[:, 3:6]
        first = nd[:, 6].astype(jnp.int32)
        count = nd[:, 7].astype(jnp.int32)
        skip = nd[:, 8].astype(jnp.int32)
        iid = nd[:, 9].astype(jnp.int32)

        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tm)

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf & active
        o2, d2 = _rebase(o, d, pack.inst_inv[jnp.maximum(iid, 0)])
        tidx = first[:, None] + jnp.arange(
            LEAF_SIZE, dtype=jnp.int32
        )[None]
        tidx = jnp.where(
            jnp.arange(LEAF_SIZE)[None] < count[:, None],
            tidx,
            pack.inst_tri9.shape[0] - 1,
        )
        t9 = pack.inst_tri9[tidx]
        from mitsuba_tpu.accel.intersect import _moller_trumbore

        hit, _, _, _ = _moller_trumbore(
            o2[:, None, :], d2[:, None, :],
            t9[..., 0:3], t9[..., 3:6], t9[..., 6:9], tm[:, None],
        )
        new_occ = occ | jnp.any(hit & do_leaf[:, None], axis=-1)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, ni + 1, skip)
        # terminated lanes jump past the end
        nxt = jnp.where(new_occ, end, nxt)
        node = jnp.where(active, nxt, node)
        return node, new_occ

    init = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool))
    _, occ = jax.lax.while_loop(cond, step, init)
    return occ


# ---------------------------------------------------------------------------
# Pair fast path: instances as clusters.
#
# The while-loop traversal above serializes hundreds of skip-link steps
# of tiny [R] gathers.  The fast path replaces it with the same
# two-stage shape as the big-mesh pair traversal (accel/pairs.py):
#
#   1. dense slab cull of rays x INSTANCE world boxes -> each ray's
#      K_INST nearest-entry instances (sorted by slab entry),
#   2. per round, rebase every lane's ray into ITS instance's local
#      frame and run the whole wavefront through the GROUP's shared
#      cluster tables via pair_closest/pair_any — template geometry is
#      intersected at full lane occupancy, with the per-instance
#      transform applied once per lane (instance.cpp rayIntersect
#      semantics, vectorized over the wavefront).
#
# Rays that hit more than K_INST instance boxes fall back to the exact
# while-loop traversal (masked to those lanes), mirroring the pair
# path's overflow contract.

import os as _os

K_INST = int(_os.environ.get("MTS_TLAS_K", 4))
_CULL_R = 16384  # ray tile for the instance cull
_CULL_I = 512    # instance chunk per cull step
_BIG = 1e30


def _group_view(pack, gi, g_items):
    """ScenePack view of one group's cluster tables (keys ig{gi}_*)."""
    from mitsuba_tpu.scene.builder import ScenePack

    pre = f"ig{gi}_"
    arrays = {
        k[len(pre):]: v
        for k, v in pack.arrays.items()
        if k.startswith(pre)
    }
    return ScenePack(arrays, dict(g_items))


def _inst_lists_tile(o, d, tmax, boxes, k):
    """[rt] rays x all instance boxes -> (ids [rt, k] by ascending slab
    entry, -1 pad; overflow bool[rt])."""
    rt = o.shape[0]
    ip = boxes.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    keys = jnp.full((rt, k), _BIG, jnp.float32)
    ids = jnp.full((rt, k), -1, jnp.int32)
    cnt = jnp.zeros((rt,), jnp.int32)
    for c0 in range(0, ip, _CULL_I):
        ch = min(_CULL_I, ip - c0)
        lo = boxes[c0:c0 + ch, 0:3]
        hi = boxes[c0:c0 + ch, 3:6]
        t0 = (lo[None] - o[:, None]) * inv[:, None]   # [rt, ch, 3]
        t1 = (hi[None] - o[:, None]) * inv[:, None]
        tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
        tf = jnp.maximum(t0, t1).min(-1)
        hit = (tf >= tn) & (tn < tmax[:, None])
        cnt = cnt + hit.sum(-1).astype(jnp.int32)
        allk = jnp.concatenate([keys, jnp.where(hit, tn, _BIG)], axis=1)
        alli = jnp.concatenate(
            [ids, jnp.broadcast_to(
                jnp.arange(c0, c0 + ch, dtype=jnp.int32)[None],
                (rt, ch))],
            axis=1,
        )
        negk, idx = jax.lax.top_k(-allk, k)
        keys = -negk
        ids = jnp.take_along_axis(alli, idx, axis=1)
    ids = jnp.where(keys < _BIG, ids, -1)
    return ids, cnt > k


def _inst_lists(pack, o, d, tmax, k):
    r = o.shape[0]
    boxes = jnp.asarray(pack.inst_wbox)
    ids_t, ov_t = [], []
    for r0 in range(0, r, _CULL_R):
        sl = slice(r0, min(r0 + _CULL_R, r))
        i_, o_ = _inst_lists_tile(o[sl], d[sl], tmax[sl], boxes, k)
        ids_t.append(i_)
        ov_t.append(o_)
    if len(ids_t) == 1:
        return ids_t[0], ov_t[0]
    return jnp.concatenate(ids_t), jnp.concatenate(ov_t)


def inst_closest_pairs(pack, o, d, best_t, best_prim, best_u, best_v,
                       best_inst, interpret=False):
    """Closest hit over instances via the pair fast path (bit-identical
    to inst_closest: the overflow fallback carries exactness)."""
    from mitsuba_tpu.accel.pairs import pair_closest

    r = o.shape[0]
    ids, overflow = _inst_lists(pack, o, d, best_t, K_INST)
    grp = jnp.asarray(pack.inst_group)
    for rd in range(K_INST):
        iid = ids[:, rd]
        valid = iid >= 0
        safe = jnp.maximum(iid, 0)
        o2, d2 = _rebase(o, d, pack.inst_inv[safe])
        gsel = grp[safe]
        for gi, (lo_r, count, g_items) in enumerate(
            pack.meta["inst_groups"]
        ):
            sel = valid & (gsel == gi)
            gv = _group_view(pack, gi, g_items)
            tm = jnp.where(sel, best_t, 0.0)
            t, p, u, v = pair_closest(gv, o2, d2, tm,
                                      interpret=interpret)
            better = sel & (p >= 0) & (t < best_t)
            gp = pack.arrays[f"ig{gi}_t2p"][jnp.maximum(p, 0)]
            best_prim = jnp.where(better, gp, best_prim)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
            best_inst = jnp.where(better, iid, best_inst)
            best_t = jnp.where(better, t, best_t)

    def fb(_):
        z = jnp.zeros((r,), jnp.float32)
        return inst_closest(
            pack, o, d,
            jnp.where(overflow, best_t, 0.0),
            jnp.full((r,), -1, jnp.int32), z, z,
            jnp.full((r,), -1, jnp.int32),
        )

    def no_fb(_):
        z = jnp.zeros((r,), jnp.float32)
        return (z, jnp.full((r,), -1, jnp.int32), z, z,
                jnp.full((r,), -1, jnp.int32))

    ft, fp, fu, fv, fi = jax.lax.cond(
        jnp.any(overflow), fb, no_fb, None
    )
    use = overflow & (fp >= 0) & (ft < best_t)
    return (
        jnp.where(use, ft, best_t),
        jnp.where(use, fp, best_prim),
        jnp.where(use, fu, best_u),
        jnp.where(use, fv, best_v),
        jnp.where(use, fi, best_inst),
    )


def inst_any_pairs(pack, o, d, t_max, interpret=False):
    """Boolean occlusion over instances via the pair fast path."""
    from mitsuba_tpu.accel.pairs import pair_any

    r = o.shape[0]
    tm0 = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    ids, overflow = _inst_lists(pack, o, d, tm0, K_INST)
    occ = jnp.zeros((r,), bool)
    grp = jnp.asarray(pack.inst_group)
    for rd in range(K_INST):
        iid = ids[:, rd]
        valid = iid >= 0
        safe = jnp.maximum(iid, 0)
        o2, d2 = _rebase(o, d, pack.inst_inv[safe])
        gsel = grp[safe]
        for gi, (lo_r, count, g_items) in enumerate(
            pack.meta["inst_groups"]
        ):
            sel = valid & (gsel == gi) & ~occ
            gv = _group_view(pack, gi, g_items)
            hit = pair_any(gv, o2, d2, jnp.where(sel, tm0, 0.0),
                           interpret=interpret)
            occ = occ | (hit & sel)

    def fb(_):
        return inst_any(
            pack, o, d, jnp.where(overflow & ~occ, tm0, 0.0)
        )

    def no_fb(_):
        return jnp.zeros((r,), bool)

    return occ | jax.lax.cond(jnp.any(overflow), fb, no_fb, None)
