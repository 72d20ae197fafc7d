"""Pair-compaction cluster traversal: big-mesh intersection where every
lane tests a (ray, cluster) pair that can actually hit.

The round-3 chunk model (accel/pallas_bvh.py) visits, per CHUNK of
rays, the UNION of the clusters any of its lanes touches — measured
~8400 pair-tests/ray on the bunny against a true per-ray overlap of
0.79 clusters/ray (STATUS.md), a 30-80x lane-occupancy waste.  This
module replaces it with compacted pair queues (the vectorized analogue
of the reference's per-ray kd-tree descent, sahkdtree3.h:178-249,
which tests only the leaves each ray walks through):

  1. exact per-ray culling, two dense levels (no compaction needed):
     rays x supercluster boxes  ->  top-Ks nearest supers
     rays x their supers' member clusters -> top-K nearest clusters
  2. pair queue: flatten the [R, K] cluster lists, SORT BY CLUSTER so
     equal-cluster pairs form contiguous runs, truncate to a static
     budget (dropped rays fall back, see 5)
  3. Pallas kernel, grid = 256-pair windows: per distinct cluster in
     the window (precomputed run list), the cluster's bilinear
     Moller-Trumbore operand [16, 4*Tc] is DMA-streamed HBM->VMEM
     (double-buffered) and contracted against the window's ray
     features [16, 256] on the MXU; a short VPU epilogue reduces to a
     per-lane (t, slot) best.  Each lane belongs to exactly one
     cluster, so lanes outside the run mask off and no lane ever tests
     a cluster its ray does not overlap.
  4. results scatter back to the [R, K] lists; min over K (entry-
     sorted, so ties resolve front-to-back like the chunk kernel).
  5. rays whose cluster lists overflowed (more than Ks supers / K
     clusters hit AND no terminating hit before the kept horizon, or
     pairs dropped by the queue budget) re-run through the chunk
     traversal under lax.cond — rare by construction.

Everything dynamic (pair counts, run boundaries) is resolved XLA-side
into static-shape tensors + per-window run counts, so the kernel has
no data-dependent shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_tpu.accel.pallas_bvh import BIG, RAY_EPS

# max superclusters kept per ray (exact-culling level 1; cheap since
# the member-box fetch is a one-hot matmul, and each extra unit cuts
# the fallback rate)
KS = int(os.environ.get("MTS_PAIR_KS", 8))
# max clusters kept per ray (exact-culling level 2)
K = int(os.environ.get("MTS_PAIR_K", 3))
# pair-queue budget in pairs per ray (the queue is R*BUDGET long;
# overflow falls back) — bunny measures 0.79 pairs/ray
BUDGET = float(os.environ.get("MTS_PAIR_BUDGET", 1.25))
# pairs per kernel window (lane dimension of one MXU visit).  The
# VPU epilogue runs on runs x [4*Tc, W] whether or not a lane's pair
# is in the run, so NARROW windows win (in-jit measured: W=256
# ~1.6 ms vs W=2048 ~7.9 ms per 262k rays on the bunny)
W = int(os.environ.get("MTS_PAIR_W", 256))
# ray-tile size: stages are O(tile) memory; sorts stay ~1M entries
TILE = int(os.environ.get("MTS_PAIR_TILE", 1 << 18))

_I32MAX = jnp.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# XLA stages: exact per-ray culling -> per-ray cluster lists
# ---------------------------------------------------------------------------

def _slab_entry(o, d, inv, tmax, lo, hi):
    """Conservative slab test of rays against a box set.
    o/d/inv: [R, 3]; lo/hi: broadcastable [..., 3].
    Returns (hit [R, B], entry [R, B])."""
    t0 = (lo - o[:, None, :]) * inv[:, None, :]
    t1 = (hi - o[:, None, :]) * inv[:, None, :]
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax[:, None])
    return hit, jnp.maximum(tn, 0.0)


def _k_smallest(key, k):
    """k-pass min extraction over the last axis (cheaper than
    jax.lax.top_k, measured 5.6 ms for top_k(4) on [262k, 128] on the
    v5e — k passes of min/argmin/mask are a handful of VPU reduces).

    Returns (vals [R, k] ascending, idx [R, k])."""
    b = key.shape[-1]
    cols = jnp.arange(b, dtype=jnp.int32)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(key, axis=-1)
        i = jnp.argmin(key, axis=-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(i)
        key = jnp.where(cols[None, :] == i[:, None], BIG, key)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _cluster_lists(pack, o, d, tmax):
    """Per-ray entry-sorted cluster lists via two dense culling levels.

    Returns (cids [R, K] i32 (C = miss), entry [R, K],
             ov_info dict for the overflow gate)."""
    cl_sup = pack.cl_sup
    c = pack.meta["n_clusters"]
    g = pack.meta["cluster_super_g"]
    s = pack.meta["n_supers"]
    ks = min(KS, s)

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    # level 1: superclusters (full-precision boxes, there are few).
    # NOTE: padded entries use the "inverted box" sentinel, which a
    # symmetric slab test (min/max of t0,t1) canNOT reject — an
    # inverted box behaves like one spanning [-1e30, 1e30] and hits
    # every ray at entry 0, evicting all real supers from the top-k.
    # Padding must be masked explicitly.
    sup_lo = cl_sup[0:3].T[None]  # [1, Sp, 3]
    sup_hi = cl_sup[3:6].T[None]
    hit_s, ent_s = _slab_entry(o, d, inv, tmax, sup_lo, sup_hi)
    hit_s = hit_s & (
        jnp.arange(sup_lo.shape[1], dtype=jnp.int32)[None, :] < s
    )
    key_s = jnp.where(hit_s, ent_s, BIG)
    n_sup = jnp.sum(hit_s, axis=-1)
    ent_sup_kept, sid = _k_smallest(key_s, ks)
    kept_max_sup = ent_sup_kept[:, -1]

    # level 2: member clusters of the kept supers.  World-coords boxes
    # come from ONE one-hot MXU contraction against the [Sp, G*6]
    # table (accel/clusters.py cl_mbox) — per-lane row gathers were
    # the pipeline's dominant cost (65 ms/262k rays measured).
    mbox = pack.cl_mbox  # [Sp_g, G*6] f32
    sp_n = mbox.shape[0]
    sid_c = jnp.minimum(sid, sp_n - 1)
    r = o.shape[0]
    onehot = (
        sid_c[..., None] == jnp.arange(sp_n, dtype=jnp.int32)
    ).astype(jnp.float32)  # [R, ks, Sp]
    bx = jax.lax.dot_general(
        onehot.reshape(r * ks, sp_n), mbox,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(r, ks, g, 6)
    lo_c = bx[..., 0:3].reshape(r, ks * g, 3)
    hi_c = bx[..., 3:6].reshape(r, ks * g, 3)
    cand_cid = (sid_c[:, :, None] * g
                + jnp.arange(g, dtype=jnp.int32)[None, None, :]
                ).reshape(r, ks * g)
    sup_ok = ent_sup_kept < BIG  # [R, ks]
    cand_ok = (
        jnp.broadcast_to(sup_ok[:, :, None], (r, ks, g))
        .reshape(r, ks * g)
        & (cand_cid < c)
    )
    hit_c, ent_c = _slab_entry(o, d, inv, tmax, lo_c, hi_c)
    hit_c = hit_c & cand_ok
    key_c = jnp.where(hit_c, ent_c, BIG)
    n_cl = jnp.sum(hit_c, axis=-1)
    kk = min(K, ks * g)
    ent_k, ci = _k_smallest(key_c, kk)
    cids = jnp.where(
        ent_k < BIG,
        jnp.take_along_axis(cand_cid, ci, axis=-1),
        c,
    ).astype(jnp.int32)
    kept_max_cl = ent_k[:, -1]

    ov = dict(
        n_sup=n_sup, ks=ks, kept_max_sup=kept_max_sup,
        n_cl=n_cl, kk=kk, kept_max_cl=kept_max_cl,
    )
    return cids, ent_k, ov


# ray block width of the fused culling kernel
CULL_B = int(os.environ.get("MTS_PAIR_CULL_B", 512))
# meshes with at most this many clusters use the single-level dense
# cull (slab every cluster box per ray) instead of the two-level
# super/member walk: ~4x less VPU work at bunny scale and no
# supercluster overflow class at all.  The ceiling is a VMEM budget,
# not a constant: _dense_cull_kernel holds ~3.2 live f32 [Cp, CULL_B]
# temporaries on the scoped-vmem stack (measured: 19.39 MiB scoped
# allocation at Cp=3072, B=512 -> 6.3 KiB per cluster row -> OOM past
# ~2500 rows against the v5e's 16 MiB limit; prof/prof_dense_c.py).
# 12 MiB of the 16 leaves headroom for the rays/cid/ent blocks.
_DENSE_C_VMEM = int(12 * 2**20 / (3.25 * CULL_B * 4))
DENSE_C = int(os.environ.get("MTS_PAIR_DENSE_C", min(2048, _DENSE_C_VMEM)))


def _dense_cull_kernel(c, kk, rays_ref, box_ref, cid_ref, ent_ref,
                       ov_ref):
    """Single-level dense cull: slab-test EVERY cluster box against
    the block's rays, keep the kk nearest entries.  Replaces the
    two-level super/member kernel for small cluster counts — the
    two-level version spends most of its 30 ms/262k rays on ks=8
    member expansions (one-hot MXU fetches + per-super slabs) that a
    [C, B] dense slab avoids entirely.

    rays_ref [1, 8, B]: rows ox,oy,oz, 1/dx,1/dy,1/dz, tmax, pad.
    box_ref [6, Cp]: rows lox,loy,loz,hix,hiy,hiz (padding past c is
    masked by row index, so the inverted-box sentinel is harmless).
    outputs: cid [1, kk, B] i32 (c = miss), ent [1, kk, B],
    ov [1, 4, B] = (0, BIG, n_cl, kept_max_cl) — no super level, so
    the super-overflow class never fires."""
    rays = rays_ref[0]
    o = rays[0:3]
    inv = rays[3:6]
    tmax = rays[6:7]  # [1, B]
    boxes = box_ref[...]  # [6, Cp]
    cp = boxes.shape[1]
    b = o.shape[1]

    row = jax.lax.broadcasted_iota(jnp.int32, (cp, b), 0)
    tn = jnp.full((cp, b), -BIG, jnp.float32)
    tf = jnp.full((cp, b), BIG, jnp.float32)
    for a in range(3):
        t0 = (boxes[a][:, None] - o[a][None, :]) * inv[a][None, :]
        t1 = (boxes[3 + a][:, None] - o[a][None, :]) * inv[a][None, :]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ent = jnp.maximum(tn, 0.0)
    hit = (tf >= ent) & (tn < tmax) & (row < c)
    key = jnp.where(hit, ent, BIG)
    n_cl = jnp.sum(hit.astype(jnp.float32), axis=0)

    kept_max = None
    for j in range(kk):
        m = jnp.min(key, axis=0)
        i = jnp.argmin(key, axis=0).astype(jnp.int32)
        cid_ref[0, j] = jnp.where(m < BIG, i, c)
        ent_ref[0, j] = m
        kept_max = m
        key = jnp.where(row == i[None, :], BIG, key)

    ov_ref[0, 0] = jnp.zeros((b,), jnp.float32)
    ov_ref[0, 1] = jnp.full((b,), BIG, jnp.float32)
    ov_ref[0, 2] = n_cl
    ov_ref[0, 3] = kept_max


def _cluster_lists_dense(pack, o, d, tmax, interpret):
    """Same contract as _cluster_lists, via the dense one-level cull."""
    import functools as _ft

    c = pack.meta["n_clusters"]
    kk = min(K, c)
    r = o.shape[0]
    b = CULL_B
    nb = -(-r // b)
    pad = nb * b - r

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    rays = jnp.concatenate(
        [o.T, inv.T, tmax[None, :], jnp.zeros((1, r), jnp.float32)],
        axis=0,
    )
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.zeros((8, pad), jnp.float32)], axis=1
        )
    rays = jnp.swapaxes(rays.reshape(8, nb, b), 0, 1)  # [nb, 8, B]
    boxes = pack.cl_mbox.reshape(-1, 6).T  # [6, Sp*G] (pad masked)

    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    cid_b, ent_b, ov_b = pl.pallas_call(
        _ft.partial(_dense_cull_kernel, c, kk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(*boxes.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, kk, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, kk, b), jnp.int32),
            jax.ShapeDtypeStruct((nb, kk, b), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4, b), jnp.float32),
        ],
        interpret=interpret,
    )(rays, boxes)

    cids = jnp.swapaxes(cid_b, 1, 2).reshape(nb * b, kk)[:r]
    ent_k = jnp.swapaxes(ent_b, 1, 2).reshape(nb * b, kk)[:r]
    ov_f = jnp.swapaxes(ov_b, 1, 2).reshape(nb * b, 4)[:r]
    ov = dict(
        n_sup=ov_f[:, 0].astype(jnp.int32), ks=1,
        kept_max_sup=ov_f[:, 1],
        n_cl=ov_f[:, 2].astype(jnp.int32), kk=kk,
        kept_max_cl=ov_f[:, 3],
    )
    return cids, ent_k, ov


def _cull_kernel(s, c, g, ks, kk, rays_ref, sup_ref, mboxt_ref,
                 cid_ref, ent_ref, ov_ref):
    """Fused two-level culling for one ray block, entirely in VMEM.

    The XLA version (_cluster_lists) materializes [R, ks*G]-shaped
    intermediates in HBM — measured 27.7 ms per 262k rays on the v5e,
    the whole pipeline's dominant cost.  Here the candidate tensors
    never leave VMEM: level 1 is a dense [Sp, B] slab + k-pass min
    extraction, level 2 fetches each kept super's member boxes with a
    one-hot MXU contraction against the transposed [G*6, Sp] table and
    repeats the slab/top-k on [ks*G, B].

    rays_ref [1, 8, B]: rows ox,oy,oz, 1/dx,1/dy,1/dz, tmax, pad.
    outputs: cid [1, kk, B] i32 (c = miss), ent [1, kk, B],
    ov [1, 4, B] = (n_sup, kept_max_sup, n_cl, kept_max_cl)."""
    rays = rays_ref[0]
    o = rays[0:3]
    inv = rays[3:6]
    tmax = rays[6:7]  # [1, B]
    sup = sup_ref[...]  # [8, Sp]
    sp_n = sup.shape[1]
    b = o.shape[1]

    def slab(lo3, hi3, n_rows):
        tn = jnp.full((n_rows, b), -BIG, jnp.float32)
        tf = jnp.full((n_rows, b), BIG, jnp.float32)
        for a in range(3):
            t0 = (lo3[a] - o[a][None, :]) * inv[a][None, :]
            t1 = (hi3[a] - o[a][None, :]) * inv[a][None, :]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ent = jnp.maximum(tn, 0.0)
        return ent, (tf >= ent) & (tn < tmax)

    # ---- level 1: supers ----
    row_s = jax.lax.broadcasted_iota(jnp.int32, (sp_n, b), 0)
    ent_s, hit_s = slab(
        [sup[a][:, None] for a in range(3)],
        [sup[3 + a][:, None] for a in range(3)],
        sp_n,
    )
    hit_s = hit_s & (row_s < s)
    key_s = jnp.where(hit_s, ent_s, BIG)
    n_sup = jnp.sum(hit_s.astype(jnp.float32), axis=0)

    sids, kept_max_sup = [], None
    for _ in range(ks):
        m = jnp.min(key_s, axis=0)
        i = jnp.argmin(key_s, axis=0).astype(jnp.int32)
        sids.append((i, m))
        kept_max_sup = m
        key_s = jnp.where(row_s == i[None, :], BIG, key_s)

    # ---- level 2: members of each kept super ----
    mboxt = mboxt_ref[...]  # [G*6, Sp]
    keys, cands, nhits = [], [], []
    row_g = jax.lax.broadcasted_iota(jnp.int32, (g, b), 0)
    for (sid_j, ent_j) in sids:
        oh = (row_s == sid_j[None, :]).astype(jnp.float32)  # [Sp, B]
        mb = jax.lax.dot_general(
            mboxt, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, 6, b)  # member boxes of this super, per ray
        ent_c, hit_c = slab(
            [mb[:, a] for a in range(3)],
            [mb[:, 3 + a] for a in range(3)],
            g,
        )
        cid_j = sid_j[None, :] * g + row_g
        ok = hit_c & (ent_j < BIG)[None, :] & (cid_j < c)
        keys.append(jnp.where(ok, ent_c, BIG))
        cands.append(cid_j)
        nhits.append(jnp.sum(ok.astype(jnp.float32), axis=0))

    key_c = jnp.concatenate(keys, axis=0)  # [ks*G, B]
    cand = jnp.concatenate(cands, axis=0)
    n_cl = sum(nhits)
    row_c = jax.lax.broadcasted_iota(jnp.int32, key_c.shape, 0)

    kept_max_cl = None
    for j in range(kk):
        m = jnp.min(key_c, axis=0)
        i = jnp.argmin(key_c, axis=0).astype(jnp.int32)
        sel = jnp.sum(
            jnp.where(row_c == i[None, :], cand, 0), axis=0
        )
        cid_ref[0, j] = jnp.where(m < BIG, sel, c)
        ent_ref[0, j] = m
        kept_max_cl = m
        key_c = jnp.where(row_c == i[None, :], BIG, key_c)

    ov_ref[0, 0] = n_sup
    ov_ref[0, 1] = kept_max_sup
    ov_ref[0, 2] = n_cl
    ov_ref[0, 3] = kept_max_cl


def _cluster_lists_pallas(pack, o, d, tmax, interpret):
    """Same contract as _cluster_lists, via the fused Pallas kernel."""
    import functools as _ft

    c = pack.meta["n_clusters"]
    g = pack.meta["cluster_super_g"]
    s = pack.meta["n_supers"]
    ks = min(KS, s)
    kk = min(K, ks * g)
    r = o.shape[0]
    b = CULL_B
    nb = -(-r // b)
    pad = nb * b - r

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    rays = jnp.concatenate(
        [o.T, inv.T, tmax[None, :], jnp.zeros((1, r), jnp.float32)],
        axis=0,
    )  # [8, R]
    if pad:
        rays = jnp.concatenate(
            [rays, jnp.zeros((8, pad), jnp.float32)], axis=1
        )
    rays = jnp.swapaxes(rays.reshape(8, nb, b), 0, 1)  # [nb, 8, B]
    mboxt = pack.cl_mbox.T  # [G*6, Sp]

    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    cid_b, ent_b, ov_b = pl.pallas_call(
        _ft.partial(_cull_kernel, s, c, g, ks, kk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(*pack.cl_sup.shape),
            full(*mboxt.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, kk, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kk, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, kk, b), jnp.int32),
            jax.ShapeDtypeStruct((nb, kk, b), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4, b), jnp.float32),
        ],
        interpret=interpret,
    )(rays, pack.cl_sup, mboxt)

    cids = jnp.swapaxes(cid_b, 1, 2).reshape(nb * b, kk)[:r]
    ent_k = jnp.swapaxes(ent_b, 1, 2).reshape(nb * b, kk)[:r]
    ov_f = jnp.swapaxes(ov_b, 1, 2).reshape(nb * b, 4)[:r]
    ov = dict(
        n_sup=ov_f[:, 0].astype(jnp.int32), ks=ks,
        kept_max_sup=ov_f[:, 1],
        n_cl=ov_f[:, 2].astype(jnp.int32), kk=kk,
        kept_max_cl=ov_f[:, 3],
    )
    return cids, ent_k, ov


def _overflow(ov, best_t):
    """Rays whose result may be wrong because culling dropped
    candidates CLOSER than the best hit found (top_k keeps the
    nearest-entry supers/clusters, so anything dropped enters at
    >= the kept maximum)."""
    o1 = (ov["n_sup"] > ov["ks"]) & (best_t > ov["kept_max_sup"])
    o2 = (ov["n_cl"] > ov["kk"]) & (best_t > ov["kept_max_cl"])
    return o1 | o2


# ---------------------------------------------------------------------------
# pair queue construction
# ---------------------------------------------------------------------------

def _pair_queue(cids, r, c, o, d, tmax):
    """Flatten [R, K] lists into a cluster-sorted pair queue of static
    length P_cap.

    Two strategies for moving the per-pair ray data (o, d, t_max):

    * "ride" (default): the 9-operand kv-sort (key + slot + 7 ray
      floats); broadcasting before the sort is free and no gather is
      needed.  Measured ~5 ms/262k rays on the v5e.  Also the only
      option when cid/slot can't share an int32 (huge meshes).
    * "packed" (opt-in, MTS_PAIR_SORT=packed): ONE int32 key sort of
      (cid << slot_bits | slot) — the minimum possible sort traffic —
      followed by 7 per-component 1D gathers for only the P_cap kept
      pairs (~35 ms measured: XLA row gathers are the slow path; kept
      for cases where sort bytes dominate).

    Returns (cid_q [P], slot_q [P], rays_q [P, 7], cid_tail,
    slot_tail); the tail is the truncated remainder."""
    kk = cids.shape[1]
    n = r * kk
    flat_cid = cids.reshape(-1)
    slot = jnp.arange(n, dtype=jnp.int32)
    p_cap = min(int(r * BUDGET), n)
    p_cap = max(((p_cap + W - 1) // W) * W, W)

    slot_bits = max((n - 1).bit_length(), 1)
    fits = (c + 1) < (1 << (31 - slot_bits))
    # default "ride": in-context on the v5e the 9-operand kv-sort costs
    # ~5 ms/262k rays while packed's 7 post-sort gathers cost ~35 ms
    # (XLA row gathers are the slow path, prof_pairs2) — packed stays
    # available for cases where sort bytes dominate
    sort_mode = os.environ.get("MTS_PAIR_SORT", "ride")
    if fits and sort_mode == "packed":
        s = jax.lax.sort((flat_cid << slot_bits) | slot)
        cid_s = s >> slot_bits
        slot_s = s & ((1 << slot_bits) - 1)
        if p_cap > n:
            pad = p_cap - n
            cid_s = jnp.concatenate(
                [cid_s, jnp.full((pad,), c, jnp.int32)]
            )
            slot_s = jnp.concatenate(
                [slot_s, n + jnp.arange(pad, dtype=jnp.int32)]
            )
        ridx = jnp.minimum(slot_s[:p_cap], n - 1) // kk
        rays_q = jnp.stack(
            [o[:, 0][ridx], o[:, 1][ridx], o[:, 2][ridx],
             d[:, 0][ridx], d[:, 1][ridx], d[:, 2][ridx],
             tmax[ridx]],
            axis=-1,
        )
        return (cid_s[:p_cap], slot_s[:p_cap], rays_q,
                cid_s[p_cap:], slot_s[p_cap:])

    def rep(x):
        return jnp.broadcast_to(x[:, None], (r, kk)).reshape(-1)

    vals = [rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]),
            rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]), rep(tmax)]
    # sentinel (cid == c) sorts last
    out = jax.lax.sort((flat_cid, slot, *vals), num_keys=1)
    cid_s, slot_s, vals_s = out[0], out[1], out[2:]
    if p_cap > r * kk:
        # tiny batches: pad to one window with sentinel pairs whose
        # slot ids sort past every real slot (the restore sort slices
        # them off)
        pad = p_cap - r * kk
        cid_s = jnp.concatenate(
            [cid_s, jnp.full((pad,), c, jnp.int32)]
        )
        slot_s = jnp.concatenate(
            [slot_s, r * kk + jnp.arange(pad, dtype=jnp.int32)]
        )
        vals_s = [
            jnp.concatenate([v, jnp.zeros((pad,), jnp.float32)])
            for v in vals_s
        ]
    rays_q = jnp.stack([v[:p_cap] for v in vals_s], axis=-1)
    return (cid_s[:p_cap], slot_s[:p_cap], rays_q,
            cid_s[p_cap:], slot_s[p_cap:])


def _window_runs(cid_q, c):
    """Per-window distinct-cluster lists.  cid_q [P] sorted by cluster;
    returns (run_cids [NW, W] i32 (pad I32MAX), n_runs [NW])."""
    p = cid_q.shape[0]
    nw = p // W
    valid = cid_q < c
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cid_q[:-1]])
    lane = jnp.arange(p, dtype=jnp.int32) % W
    flag = valid & ((lane == 0) | (cid_q != prev))
    fw = flag.reshape(nw, W)
    cw = cid_q.reshape(nw, W)
    run_cids = jnp.sort(jnp.where(fw, cw, _I32MAX), axis=-1)
    n_runs = jnp.sum(fw, axis=-1).astype(jnp.int32)
    return run_cids, n_runs


def _run_list(cid_q, c):
    """Flat run list for the run-grid kernel.  A run is a maximal
    stretch of equal-cluster pairs within one W window.  Because the
    queue is sorted by cluster id with the miss sentinel (cid == c)
    last, each cluster occupies ONE contiguous range, so the number of
    runs is bounded by (#windows + #clusters) — a static cap.

    Returns (cid_raw [R] i32 (c = sentinel), win [R] i32 nondecreasing,
    first [R] i32: 1 on each window's first run — the kernel
    initializes that window's output block before accumulating)."""
    p = cid_q.shape[0]
    nw = p // W
    valid = cid_q < c
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cid_q[:-1]])
    lane = jnp.arange(p, dtype=jnp.int32) % W
    flag = valid & ((lane == 0) | (cid_q != prev))
    pos = jnp.arange(p, dtype=jnp.int32)
    pos_s = jax.lax.sort(jnp.where(flag, pos, _I32MAX))
    r_cap = min(p, c + nw)
    pos_r = pos_s[:r_cap]
    sent = pos_r >= p
    idx = jnp.minimum(pos_r, p - 1)
    cid_raw = jnp.where(sent, c, cid_q[idx])
    win = jnp.where(sent, nw - 1, idx // W).astype(jnp.int32)
    # sentinel runs (cid == c) never match a valid pair's cluster, so
    # masking makes them no-ops; they map to the last window with
    # first = 0 so they cannot re-initialize it
    first = (~sent & (idx % W == 0)).astype(jnp.int32)
    return cid_raw, win, first


# ---------------------------------------------------------------------------
# Pallas kernels (MXU bilinear Moller-Trumbore, HBM-streamed operands)
# ---------------------------------------------------------------------------

def _mt_epilogue(prod, tc, t_lim):
    """[4*Tc, W] MXU product -> (t [Tc, W] with BIG misses, u, v)."""
    det = prod[0 * tc:1 * tc]
    u_n = prod[1 * tc:2 * tc]
    v_n = prod[2 * tc:3 * tc]
    t_n = prod[3 * tc:4 * tc]
    live = jnp.abs(det) > 1e-12
    invd = jnp.where(live, 1.0, 0.0) / jnp.where(live, det, 1.0)
    u = u_n * invd
    v = v_n * invd
    t = t_n * invd
    hit = (
        live
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPS)
        & (t < t_lim)
    )
    return jnp.where(hit, t, BIG), u, v


def _winner_select(t, u, v, primf, tc):
    """Per-lane winner over the [Tc, W] candidate tile, entirely in
    VMEM: (tmin [1, W], and the winner row's prim/u/v [1, W]).

    prim rides a [1, Tc] x [Tc, W] one-hot dot (ids are exact f32);
    u/v ride masked reduces.  Selecting the winner HERE kills the
    wrapper's post-kernel gathers (cl_pad2prim + _winner_uv row
    gathers, ~15 ms per 262k rays measured on the v5e)."""
    tmin = jnp.min(t, axis=0, keepdims=True)
    row = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) == row
    )
    p_w = jax.lax.dot_general(
        primf, onehot.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, W]
    u_w = jnp.sum(jnp.where(onehot, u, 0.0), axis=0, keepdims=True)
    v_w = jnp.sum(jnp.where(onehot, v, 0.0), axis=0, keepdims=True)
    return tmin, p_w, u_w, v_w


def _pair_kernel(tc, mode, *refs):
    """One window: fori over the window's distinct clusters; per run,
    DMA the cluster's MT operand and MXU-test ALL W lanes, masking to
    the lanes whose pair is this cluster."""
    if mode == "closest":
        (rc_ref, nr_ref, cidv_ref, feats_ref, tmax_ref, mt_hbm,
         pr_hbm, t_ref, p_ref, u_ref, v_ref, scratch, sem,
         pscr, psem) = refs
    else:
        (rc_ref, nr_ref, cidv_ref, feats_ref, tmax_ref, mt_hbm,
         o1_ref, scratch, sem) = refs
    nr = nr_ref[0, 0, 0]
    feats = feats_ref[0]  # [16, W]
    cidv = cidv_ref[0, 0:1, :]  # [1, W]
    tmaxv = tmax_ref[0, 0:1, :]

    def get_dma(slot_b, rr):
        cid = rc_ref[0, 0, jnp.minimum(rr, W - 1)]
        cid = jnp.minimum(cid, mt_hbm.shape[0] - 1)
        return pltpu.make_async_copy(
            mt_hbm.at[cid], scratch.at[slot_b], sem.at[slot_b]
        )

    def get_pdma(slot_b, rr):
        cid = rc_ref[0, 0, jnp.minimum(rr, W - 1)]
        cid = jnp.minimum(cid, pr_hbm.shape[0] - 1)
        return pltpu.make_async_copy(
            pr_hbm.at[cid], pscr.at[slot_b], psem.at[slot_b]
        )

    @pl.when(nr > 0)
    def _():
        get_dma(0, 0).start()
        if mode == "closest":
            get_pdma(0, 0).start()

    if mode == "closest":
        zero = jnp.zeros(tmaxv.shape, jnp.float32)
        init = (tmaxv, jnp.full(tmaxv.shape, -1.0, jnp.float32),
                zero, zero)
    else:
        init = ((tmaxv <= 0.0).astype(jnp.int32),)

    def body(r, carry):
        @pl.when(r + 1 < nr)
        def _():
            get_dma((r + 1) % 2, r + 1).start()
            if mode == "closest":
                get_pdma((r + 1) % 2, r + 1).start()

        get_dma(r % 2, r).wait()
        if mode == "closest":
            get_pdma(r % 2, r).wait()
        cid = rc_ref[0, 0, r]
        mask_c = cidv == cid  # [1, W]
        prod = jax.lax.dot_general(
            scratch[r % 2], feats,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [4*Tc, W]
        if mode == "closest":
            t_b, p_b, u_b, v_b = carry
            t, u, v = _mt_epilogue(
                prod, tc, jnp.where(mask_c, t_b, 0.0)
            )
            tmin, p_w, u_w, v_w = _winner_select(
                t, u, v, pscr[r % 2, 0:1, :], tc
            )
            better = (tmin < t_b) & mask_c
            p_b = jnp.where(better, p_w, p_b)
            u_b = jnp.where(better, u_w, u_b)
            v_b = jnp.where(better, v_w, v_b)
            t_b = jnp.where(better, tmin, t_b)
            return t_b, p_b, u_b, v_b
        (occ,) = carry
        t, _, _ = _mt_epilogue(
            prod, tc, jnp.where(mask_c & (occ < 1), tmaxv, 0.0)
        )
        found = jnp.any(t < BIG, axis=0, keepdims=True)
        return (jnp.maximum(occ, found.astype(jnp.int32)),)

    # every started DMA is waited inside its own iteration (run r+1 is
    # prefetched by iteration r and waited by iteration r+1), so the
    # loop exits with no DMA in flight — no drain needed
    out = jax.lax.fori_loop(0, nr, body, init)

    if mode == "closest":
        t_ref[0, 0:1, :] = out[0]
        p_ref[0, 0:1, :] = out[1].astype(jnp.int32)
        u_ref[0, 0:1, :] = out[2]
        v_ref[0, 0:1, :] = out[3]
    else:
        o1_ref[0, 0:1, :] = out[0]


def _run_kernel(pack, mode, run_cids, n_runs, cid_q, feats_q, tmax_q,
                interpret):
    tc = pack.meta["cluster_tc"]
    nw = run_cids.shape[0]
    # SMEM blocks must have trailing dims equal to the array's trailing
    # dims (real-TPU tiling rule; interpret mode does not enforce it) —
    # give each operand a leading grid axis and full (1, W)/(1, 1) tails
    smem = [
        pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    vspec = lambda d1: pl.BlockSpec(  # noqa: E731
        (1, d1, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = smem + [
        vspec(1), vspec(16), vspec(1),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [
        run_cids.reshape(nw, 1, W), n_runs.reshape(nw, 1, 1),
        cid_q.reshape(nw, 1, W),
        feats_q, tmax_q.reshape(nw, 1, W),
        pack.cl_mt,
    ]
    scratch_shapes = [
        pltpu.VMEM((2, 16, 4 * tc), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    ospec = vspec(1)
    if mode == "closest":
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(pack.cl_primf)
        scratch_shapes += [
            pltpu.VMEM((2, 8, tc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_specs = [ospec, ospec, ospec, ospec]
        out_shape = [
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
        ]
    else:
        out_specs = [ospec]
        out_shape = [jax.ShapeDtypeStruct((nw, 1, W), jnp.int32)]
    return pl.pallas_call(
        functools.partial(_pair_kernel, tc, mode),
        grid=(nw,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)


def _runs_kernel(tc, mode, cidf_s, win_s, first_s, cidr_s, cidv_ref,
                 feats_ref, tmax_ref, mt_ref, *rest):
    """Run-grid kernel: ONE grid step per (window, cluster) run.  The
    cluster's MT operand block is fetched by the scalar-prefetched
    index map (mt_ref), so the pipeline double-buffers the HBM->VMEM
    copies across grid steps automatically — unlike the window kernel
    (_pair_kernel), whose manual per-run DMA serializes a full HBM
    round-trip per run (~25 us each, measured: 1280 runs = 32 ms for a
    262k-ray bunny tile; this kernel re-fetches nothing by hand).

    Output blocks are revisited: consecutive runs of the same window
    map to the same block, initialized on the window's first run."""
    r = pl.program_id(0)
    cid = cidr_s[r]  # RAW id: the sentinel (== c) matches no pair
    cidv = cidv_ref[0, 0:1, :]  # [1, W]
    tmaxv = tmax_ref[0, 0:1, :]
    mask_c = cidv == cid

    if mode == "closest":
        primf_ref = rest[0]
        t_ref, p_ref, u_ref, v_ref = rest[1:]
    else:
        (o_ref,) = rest

    @pl.when(first_s[r] == 1)
    def _():
        if mode == "closest":
            t_ref[0, 0:1, :] = tmaxv
            p_ref[0, 0:1, :] = jnp.full(tmaxv.shape, -1, jnp.int32)
            u_ref[0, 0:1, :] = jnp.zeros(tmaxv.shape, jnp.float32)
            v_ref[0, 0:1, :] = jnp.zeros(tmaxv.shape, jnp.float32)
        else:
            o_ref[0, 0:1, :] = (tmaxv <= 0.0).astype(jnp.int32)

    prod = jax.lax.dot_general(
        mt_ref[0], feats_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [4*Tc, W]

    if mode == "closest":
        t_b = t_ref[0, 0:1, :]
        t, u, v = _mt_epilogue(prod, tc, jnp.where(mask_c, t_b, 0.0))
        tmin, p_w, u_w, v_w = _winner_select(
            t, u, v, primf_ref[0, 0:1, :], tc
        )
        better = (tmin < t_b) & mask_c
        p_ref[0, 0:1, :] = jnp.where(
            better, p_w.astype(jnp.int32), p_ref[0, 0:1, :]
        )
        u_ref[0, 0:1, :] = jnp.where(better, u_w, u_ref[0, 0:1, :])
        v_ref[0, 0:1, :] = jnp.where(better, v_w, v_ref[0, 0:1, :])
        t_ref[0, 0:1, :] = jnp.where(better, tmin, t_b)
    else:
        occ = o_ref[0, 0:1, :]
        t, _, _ = _mt_epilogue(
            prod, tc, jnp.where(mask_c & (occ < 1), tmaxv, 0.0)
        )
        found = jnp.any(t < BIG, axis=0, keepdims=True)
        o_ref[0, 0:1, :] = jnp.maximum(occ, found.astype(jnp.int32))


def _run_kernel_runs(pack, mode, run_cid, run_win, run_first, cid_q,
                     feats_q, tmax_q, interpret):
    tc = pack.meta["cluster_tc"]
    nw = cid_q.shape[0] // W
    n_mt = pack.cl_mt.shape[0]
    cid_fetch = jnp.minimum(run_cid, n_mt - 1)

    wspec = lambda d1: pl.BlockSpec(  # noqa: E731
        (1, d1, W),
        lambda r, cf, ws, fs, cr: (ws[r], 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        wspec(1),  # cidv
        wspec(16),  # feats
        wspec(1),  # tmax
        pl.BlockSpec(
            (1, 16, 4 * tc),
            lambda r, cf, ws, fs, cr: (cf[r], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [
        cid_q.reshape(nw, 1, W), feats_q, tmax_q.reshape(nw, 1, W),
        pack.cl_mt,
    ]
    if mode == "closest":
        in_specs.append(
            pl.BlockSpec(
                (1, 8, tc),
                lambda r, cf, ws, fs, cr: (cf[r], 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(pack.cl_primf)
        out_specs = [wspec(1)] * 4
        out_shape = [
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.int32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((nw, 1, W), jnp.float32),
        ]
    else:
        out_specs = [wspec(1)]
        out_shape = [jax.ShapeDtypeStruct((nw, 1, W), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(run_cid.shape[0],),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(_runs_kernel, tc, mode),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cid_fetch, run_win, run_first, run_cid, *args)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _feats(o, d):
    """MT bilinear ray features [R, 16] = [d, o x d, o, 1, 0*6]
    (accel/clusters._mt_matrices operand layout)."""
    r = o.shape[0]
    return jnp.concatenate(
        [
            d, jnp.cross(o, d), o,
            jnp.ones((r, 1), jnp.float32),
            jnp.zeros((r, 6), jnp.float32),
        ],
        axis=-1,
    )


def _run_tile(pack, o, d, t_max, mode, interpret):
    """One ray tile (static shape [T]).  Returns per-ray results plus
    the overflow mask (resolved by the caller's fallback)."""
    c = pack.meta["n_clusters"]
    tc = pack.meta["cluster_tc"]
    r = o.shape[0]

    cull = os.environ.get("MTS_PAIR_CULL", "pallas")
    if cull == "pallas" and c <= DENSE_C:
        cids, ent_k, ov = _cluster_lists_dense(
            pack, o, d, t_max, interpret
        )
    elif cull == "pallas":
        cids, ent_k, ov = _cluster_lists_pallas(
            pack, o, d, t_max, interpret
        )
    else:
        cids, ent_k, ov = _cluster_lists(pack, o, d, t_max)
    kk = cids.shape[1]
    cid_q, slot_q, rays_q, cid_tail, slot_tail = _pair_queue(
        cids, r, c, o, d, t_max
    )

    fq = _feats(rays_q[:, 0:3], rays_q[:, 3:6])  # [P, 16]
    p = cid_q.shape[0]
    feats_q = jnp.swapaxes(fq.reshape(p // W, W, 16), 1, 2)
    tmax_q = jnp.where(cid_q < c, rays_q[:, 6], 0.0)

    # kernel default: the run-grid kernel sizes its grid as
    # min(P, n_clusters + n_windows) — at large cluster counts most
    # grid steps would be sentinel runs that still pay a full MXU
    # contraction, so big meshes default to the window kernel whose
    # grid is O(windows) regardless of c (ADVICE r4 #1)
    kern = os.environ.get("MTS_PAIR_KERNEL")
    if kern is None:
        kern = "runs" if c <= DENSE_C else "window"
    if kern == "runs":
        run_cid, run_win, run_first = _run_list(cid_q, c)
        outs = _run_kernel_runs(
            pack, mode, run_cid, run_win, run_first, cid_q, feats_q,
            tmax_q, interpret
        )
    else:
        run_cids, n_runs = _window_runs(cid_q, c)
        outs = _run_kernel(
            pack, mode, run_cids, n_runs, cid_q, feats_q, tmax_q,
            interpret
        )

    # restore the dense [R, K] slot order with ONE kv-sort by slot
    # (the concatenated queue + truncated tail together hold every
    # slot exactly once) — a 1M-element sort beats an element scatter
    # ~4x on the v5e.  Truncated-but-valid pairs carry the -2 marker
    # so their rays route to the fallback.
    slot_full = jnp.concatenate([slot_q, slot_tail])

    if mode == "closest":
        t_q = outs[0].reshape(-1)
        p_q = outs[1].reshape(-1)
        u_q = outs[2].reshape(-1)
        v_q = outs[3].reshape(-1)
        tail0 = jnp.zeros(slot_tail.shape, jnp.float32)
        t_full = jnp.concatenate([
            jnp.where(cid_q < c, t_q, BIG),
            jnp.full(slot_tail.shape, BIG, jnp.float32),
        ])
        p_full = jnp.concatenate([
            jnp.where(cid_q < c, p_q, -1),
            jnp.where(cid_tail < c, -2, -1),
        ])
        u_full = jnp.concatenate([u_q, tail0])
        v_full = jnp.concatenate([v_q, tail0])
        _, t_rk, p_rk, u_rk, v_rk = jax.lax.sort(
            (slot_full, t_full, p_full, u_full, v_full), num_keys=1
        )
        # pad slots (tiny batches) sort past every real slot
        t_rk = t_rk[: r * kk].reshape(r, kk)
        p_rk = p_rk[: r * kk].reshape(r, kk)
        u_rk = u_rk[: r * kk].reshape(r, kk)
        v_rk = v_rk[: r * kk].reshape(r, kk)
        dropped = jnp.any(p_rk == -2, axis=-1)
        kbest = jnp.argmin(t_rk, axis=-1)[:, None]  # ties -> nearest
        best_t = jnp.take_along_axis(t_rk, kbest, 1)[:, 0]
        best_p = jnp.take_along_axis(p_rk, kbest, 1)[:, 0]
        best_u = jnp.take_along_axis(u_rk, kbest, 1)[:, 0]
        best_v = jnp.take_along_axis(v_rk, kbest, 1)[:, 0]
        hit = best_p >= 0
        best_p = jnp.where(hit, best_p, -1)
        best_t = jnp.where(hit, best_t, jnp.broadcast_to(t_max, (r,)))
        overflow = _overflow(ov, best_t) | dropped
        return best_t, best_p, best_u, best_v, overflow

    occ_q = outs[0].reshape(-1)
    occ_full = jnp.concatenate([
        jnp.where(cid_q < c, occ_q, 0),
        jnp.where(cid_tail < c, -2, 0),
    ])
    _, occ_rk = jax.lax.sort((slot_full, occ_full), num_keys=1)
    occ_rk = occ_rk[: r * kk].reshape(r, kk)
    occ = jnp.max(occ_rk, axis=-1) > 0
    dropped = jnp.any(occ_rk == -2, axis=-1)
    # an occluded ray is final; otherwise dropped candidates matter
    overflow = (_overflow(ov, jnp.broadcast_to(t_max, (r,))) | dropped
                ) & ~occ
    return occ, overflow


def _tiles(r):
    t = min(TILE, max(((r + 127) // 128) * 128, 128))
    n = -(-r // t)
    return t, n


def pair_closest(pack, o, d, t_max, interpret=False):
    """Closest hit via pair compaction; same conventions as
    pallas_bvh.cluster_closest (t = t_max on miss, prim = -1)."""
    from mitsuba_tpu.accel import pallas_bvh as pb

    r = o.shape[0]
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    t_max = jnp.where(jnp.isfinite(t_max), t_max, BIG)
    t, n = _tiles(r)
    pad = t * n - r
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                         (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])

    ts, ps, us, vs, ovs = [], [], [], [], []
    for i in range(n):
        sl = slice(i * t, (i + 1) * t)
        bt, bp, bu, bv, ov = _run_tile(
            pack, o[sl], d[sl], t_max[sl], "closest", interpret
        )
        ts.append(bt)
        ps.append(bp)
        us.append(bu)
        vs.append(bv)
        ovs.append(ov)
    best_t = jnp.concatenate(ts)[:r]
    best_p = jnp.concatenate(ps)[:r]
    best_u = jnp.concatenate(us)[:r]
    best_v = jnp.concatenate(vs)[:r]
    overflow = jnp.concatenate(ovs)[:r]
    o, d, t_max = o[:r], d[:r], t_max[:r]

    # rare fallback: overflow rays re-run through the chunk traversal,
    # COMPACTED to a small static buffer first (the chunk path costs
    # O(R) whatever t_max says; at ~1% overflow the compacted call is
    # ~16x cheaper).  If overflow ever exceeds the buffer, the full-
    # size fallback carries correctness.
    cap = min(max(((r // 32 + 127) // 128) * 128, 2048), r)

    def fb_full(_):
        tm = jnp.where(overflow, t_max, 0.0)
        return pb.cluster_closest(
            pack, o, d, tm, sort=True, interpret=interpret
        )

    def fb_compact(_):
        order = jnp.argsort(~overflow)  # overflow rays first (stable)
        sel = order[:cap]
        tm = jnp.where(overflow[sel], t_max[sel], 0.0)
        ft, fp, fu, fv = pb.cluster_closest(
            pack, o[sel], d[sel], tm, sort=True, interpret=interpret
        )
        t_fb = jnp.full((r,), BIG, jnp.float32).at[sel].set(ft)
        p_fb = jnp.full((r,), -1, jnp.int32).at[sel].set(fp)
        u_fb = jnp.zeros((r,), jnp.float32).at[sel].set(fu)
        v_fb = jnp.zeros((r,), jnp.float32).at[sel].set(fv)
        return t_fb, p_fb, u_fb, v_fb

    def fb(_):
        return jax.lax.cond(
            jnp.sum(overflow) <= cap, fb_compact, fb_full, None
        )

    def no_fb(_):
        z = jnp.zeros((r,), jnp.float32)
        return t_max, jnp.full((r,), -1, jnp.int32), z, z

    fb_t, fb_p, fb_u, fb_v = jax.lax.cond(
        jnp.any(overflow), fb, no_fb, None
    )
    use_fb = overflow & (fb_p >= 0) & (fb_t < best_t)
    best_t = jnp.where(use_fb, fb_t, best_t)
    prim = jnp.where(use_fb, fb_p, best_p)
    u = jnp.where(use_fb, fb_u, best_u)
    v = jnp.where(use_fb, fb_v, best_v)
    hit = prim >= 0
    return (
        jnp.where(hit, best_t, t_max),
        prim,
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
    )


def pair_any(pack, o, d, t_max, interpret=False):
    """Boolean occlusion via pair compaction."""
    from mitsuba_tpu.accel import pallas_bvh as pb

    r = o.shape[0]
    t_max = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    t_max = jnp.where(jnp.isfinite(t_max), t_max, BIG)
    t, n = _tiles(r)
    pad = t * n - r
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                         (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])

    os_, ovs = [], []
    for i in range(n):
        sl = slice(i * t, (i + 1) * t)
        occ, ov = _run_tile(pack, o[sl], d[sl], t_max[sl], "any",
                            interpret)
        os_.append(occ)
        ovs.append(ov)
    occ = jnp.concatenate(os_)[:r]
    overflow = jnp.concatenate(ovs)[:r]
    o, d, t_max = o[:r], d[:r], t_max[:r]

    cap = min(max(((r // 32 + 127) // 128) * 128, 2048), r)

    def fb_full(_):
        tm = jnp.where(overflow, t_max, 0.0)
        return pb.cluster_any(pack, o, d, tm, sort=True,
                              interpret=interpret)

    def fb_compact(_):
        order = jnp.argsort(~overflow)
        sel = order[:cap]
        tm = jnp.where(overflow[sel], t_max[sel], 0.0)
        fo = pb.cluster_any(pack, o[sel], d[sel], tm, sort=True,
                            interpret=interpret)
        return jnp.zeros((r,), bool).at[sel].set(fo)

    def fb(_):
        return jax.lax.cond(
            jnp.sum(overflow) <= cap, fb_compact, fb_full, None
        )

    fb_occ = jax.lax.cond(
        jnp.any(overflow), fb, lambda _: jnp.zeros((r,), bool), None
    )
    return occ | (overflow & fb_occ)
