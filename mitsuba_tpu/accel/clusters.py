"""Treelet clusters: the scene layout behind the Pallas traversal kernel.

The reference traverses a SAH kd-tree with a per-ray stack
(reference: include/mitsuba/render/sahkdtree3.h:178-249).  Per-lane
pointer chasing is the one thing the TPU cannot do (every divergent
node fetch is a gather ~1000 flops); instead we cut the SAH BVH into
"clusters" — subtrees of <= Tc contiguous triangles — and traverse at
cluster granularity: a chunk of coherence-sorted rays visits only the
clusters its bounding cone touches, testing each cluster's triangles
as a dense [Tc, CHUNK] VPU tile (the vectorized analogue of the
reference's coherent packet traversal, skdtree.h:183-190).

Host-side output (all numpy, packed into the ScenePack):
* cl_tri   [9, C*Tc] f32 — per-cluster padded triangle tiles
  (v0, e1, e2 rows; padding triangles at 1e30 never hit)
* cl_box   [8, Cp]  f32 — cluster AABB lo(3)/hi(3) (+2 zero rows for
  sublane alignment); padded clusters get inverted boxes
* cl_sph   [4, Cp]  f32 — bounding sphere (cx, cy, cz, r); padding r<0
* cl_pad2prim [C*Tc] int32 — padded slot -> triangle id (dummy slots
  point at the builder's far-away padding triangle)
"""

from __future__ import annotations

import os

import numpy as np

# triangles per cluster tile; sublane-tiled VPU work is [Tc, CHUNK]
CLUSTER_TC = int(os.environ.get("MTS_CLUSTER_TC", 128))
# clusters per supercluster (the coarse culling level of the
# pair-compaction traversal, accel/pairs.py); consecutive cluster ids
# are spatially coherent (DFS order), so id-range grouping is tight
SUPER_G = int(os.environ.get("MTS_CLUSTER_SUPER_G", 16))
# VMEM budget for the resident triangle tiles (bytes) — the VPU kernel
# keeps cl_tri fully resident; the MXU kernel streams from HBM instead
CLUSTER_VMEM_MAX = int(os.environ.get("MTS_CLUSTER_VMEM", 6 * 1024 * 1024))
# HBM budget for the streamed per-cluster MT matrices (bytes)
CLUSTER_HBM_MAX = int(os.environ.get("MTS_CLUSTER_HBM", 768 * 1024 * 1024))


def cut_clusters(bvh, tc: int = CLUSTER_TC):
    """Cut the threaded-DFS BVH into subtrees of <= tc prims.

    Prim ranges are contiguous because both builders allocate `order`
    at leaf-creation time during a DFS (accel/bvh.py,
    native/bvh_builder.cpp) — so subtree prims form one [first, count)
    run.  Returns (first [C], count [C], lo [C,3], hi [C,3])."""
    n = len(bvh.skip)
    skip = np.asarray(bvh.skip, np.int64)
    count = np.asarray(bvh.count, np.int64)
    # exclusive prefix of leaf prim counts by node index: pre[i] = prims
    # allocated before node i in DFS = first prim of i's subtree
    pre = np.zeros(n + 1, np.int64)
    np.cumsum(count, out=pre[1:])

    firsts, counts, los, his = [], [], [], []
    i = 0
    while i < n:
        sub = pre[skip[i]] - pre[i]
        if sub <= tc or count[i] > 0:
            if sub > 0:
                firsts.append(pre[i])
                counts.append(sub)
                los.append(bvh.lo[i])
                his.append(bvh.hi[i])
            i = int(skip[i])
        else:
            i += 1
    return (
        np.asarray(firsts, np.int64),
        np.asarray(counts, np.int64),
        np.asarray(los, np.float32).reshape(-1, 3),
        np.asarray(his, np.float32).reshape(-1, 3),
    )


def _mt_matrices(v0, e1, e2, valid, c, tc):
    """Per-cluster Möller-Trumbore bilinear operands [c, 16, 4*tc].

    MT is bilinear in the ray feature vector F = [d, w=o×d, o, 1] (see
    accel/pallas_kernels.py "MXU formulation"): column blocks
    [det | u_num | v_num | t_num], each tc wide, so one
    [16, 4tc] x [16, CHUNK] contraction on the MXU tests a whole
    cluster against a whole chunk.  Invalid (padding) slots get zero
    columns -> det == 0 -> never hit."""
    n = np.cross(e1, e2)
    c0 = np.sum(v0 * n, axis=-1)
    m = np.zeros((c, tc, 16, 4), np.float32)
    vr = valid.reshape(c, tc)
    v0 = np.where(valid[:, None], v0, 0.0).reshape(c, tc, 3)
    e1 = np.where(valid[:, None], e1, 0.0).reshape(c, tc, 3)
    e2 = np.where(valid[:, None], e2, 0.0).reshape(c, tc, 3)
    n = np.where(valid[:, None], n, 0.0).reshape(c, tc, 3)
    c0 = np.where(vr, c0.reshape(c, tc), 0.0)
    m[..., 0:3, 0] = -n                          # det (d-part)
    m[..., 0:3, 1] = np.cross(v0, e2)            # u_num (d-part)
    m[..., 3:6, 1] = e2                          # u_num (w-part)
    m[..., 0:3, 2] = np.cross(e1, v0)            # v_num (d-part)
    m[..., 3:6, 2] = -e1                         # v_num (w-part)
    m[..., 6:9, 3] = n                           # t_num (o-part)
    m[..., 9, 3] = -c0                           # t_num (const)
    # [c, tc, 16, 4] -> [c, 16, 4, tc] -> [c, 16, 4*tc]
    return np.ascontiguousarray(
        m.transpose(0, 2, 3, 1).reshape(c, 16, 4 * tc)
    )


def pack_clusters(bvh, tri_v0, tri_e1, tri_e2, n_tris, tc: int = CLUSTER_TC):
    """Build the device arrays for the cluster kernels, or None when the
    scene exceeds even the HBM streaming budget (fall back to XLA BVH)."""
    first, cnt, lo, hi = cut_clusters(bvh, tc)
    c = len(first)
    if c == 0:
        return None
    if c * tc * 256 > CLUSTER_HBM_MAX:
        return None
    cp = max(((c + 7) // 8) * 8, 8)

    # triangle tiles [9, C*Tc]; dummy slots -> far triangle
    slot = np.arange(tc, dtype=np.int64)
    tri_idx = first[:, None] + slot[None, :]  # [C, Tc]
    valid = slot[None, :] < cnt[:, None]
    # the builder pads tri arrays by LEAF_SIZE with a 1e30 triangle at
    # index n_tris — route dummies there
    tri_idx = np.where(valid, tri_idx, n_tris).reshape(-1)
    valid = valid.reshape(-1)
    v0 = np.asarray(tri_v0, np.float32)[tri_idx]
    e1 = np.asarray(tri_e1, np.float32)[tri_idx]
    e2 = np.asarray(tri_e2, np.float32)[tri_idx]
    cl_tri = np.concatenate([v0.T, e1.T, e2.T], axis=0).astype(np.float32)
    # streamed MXU operand, padded clusters -> zero matrices
    cl_mt = np.zeros((cp, 16, 4 * tc), np.float32)
    cl_mt[:c] = _mt_matrices(v0, e1, e2, valid, c, tc)

    cl_box = np.zeros((8, cp), np.float32)
    cl_box[0:3, :] = 1e30  # inverted default box: never hit
    cl_box[3:6, :] = -1e30
    cl_box[0:3, :c] = lo.T
    cl_box[3:6, :c] = hi.T

    # per-cluster prim-id rows for the pair kernels' in-VMEM winner
    # select (accel/pairs.py): row 0 of [Cp, 8, Tc] holds the padded
    # slot -> triangle id as f32 (exact below 2^24; CLUSTER_HBM_MAX
    # caps slots at ~3M).  Selecting the winner's prim INSIDE the
    # kernel replaces a [R] cl_pad2prim gather measured at ~8.7 ms per
    # 262k rays on the v5e (XLA 1d gathers are the slow path).  8
    # sublane rows keep the f32 (8, 128) tiling natural; rows 1-7 are
    # zero.
    cl_primf = np.zeros((cp, 8, tc), np.float32)
    cl_primf[:c, 0, :] = tri_idx.reshape(c, tc).astype(np.float32)

    cl_sph = np.zeros((4, cp), np.float32)
    cl_sph[3, :] = -1e30
    center = (lo + hi) * 0.5
    rad = 0.5 * np.linalg.norm(hi - lo, axis=1)
    cl_sph[0:3, :c] = center.T
    cl_sph[3, :c] = rad

    # supercluster boxes: unions of SUPER_G consecutive clusters (the
    # O(R x S) coarse level of the pair traversal's exact per-ray
    # culling).  Super s covers cluster ids [s*G, (s+1)*G).
    s = (c + SUPER_G - 1) // SUPER_G
    sp = max(((s + 7) // 8) * 8, 8)
    cl_sup = np.zeros((8, sp), np.float32)
    cl_sup[0:3, :] = 1e30
    cl_sup[3:6, :] = -1e30
    for si in range(s):
        seg = slice(si * SUPER_G, min((si + 1) * SUPER_G, c))
        cl_sup[0:3, si] = lo[seg].min(axis=0)
        cl_sup[3:6, si] = hi[seg].max(axis=0)

    # member cluster boxes as one world-coords f32 table [sp, G*6]:
    # Stage B of the pair traversal reads each ray's kept supers' rows
    # through a ONE-HOT MXU MATMUL (onehot[R*ks, sp] @ table), not a
    # gather — per-lane row gathers cost ~1000 flop-equivalents each
    # on the VPU and measured 65 ms/262k rays on the v5e, vs <1 ms as
    # a [R*ks, sp] x [sp, G*6] contraction.  Padded member slots carry
    # a point box at 1e30 (never hit, and — unlike an inverted
    # sentinel — safe under a symmetric min/max slab test); they are
    # additionally masked by cid >= n_clusters downstream.
    cl_mbox = np.full((sp, SUPER_G, 6), 1e30, np.float32)
    for si in range(s):
        n_m = min((si + 1) * SUPER_G, c) - si * SUPER_G
        seg = slice(si * SUPER_G, si * SUPER_G + n_m)
        cl_mbox[si, :n_m, 0:3] = lo[seg]
        cl_mbox[si, :n_m, 3:6] = hi[seg]

    return {
        "cl_tri": cl_tri,
        "cl_mt": cl_mt,
        "cl_primf": cl_primf,
        "cl_box": cl_box,
        "cl_sph": cl_sph,
        "cl_sup": cl_sup,
        "cl_mbox": cl_mbox.reshape(sp, SUPER_G * 6),
        "cl_pad2prim": tri_idx.astype(np.int32),
    }, {
        "n_clusters": c,
        "cluster_tc": tc,
        "n_supers": s,
        "cluster_super_g": SUPER_G,
        # the VPU kernel needs cl_tri fully VMEM-resident
        "cluster_vmem_ok": 9 * c * tc * 4 <= CLUSTER_VMEM_MAX,
    }
