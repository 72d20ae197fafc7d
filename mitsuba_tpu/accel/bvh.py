"""Host-side binned-SAH BVH builder with a threaded (skip-link) layout.

Replaces the reference's SAH kd-tree (reference:
include/mitsuba/render/gkdtree.h:684-744, sahkdtree3.h:106) — on TPU a
*stackless* BVH maps far better than a kd-tree: traversal state is one
node index per lane, so the whole wavefront advances in lock-step
`lax.while_loop` iterations with pure gathers, no per-lane stacks.

Layout: nodes in depth-first order.  For node i:
* hit  -> continue at i+1 (its first child / its leaf payload)
* miss -> continue at skip[i]
* leaf -> test prims [first, first+count), then continue at skip[i]

The builder uses 16-bin SAH (the reference's min-max binning uses 128
bins above 64k prims, gkdtree.h:740; 16 is the BVH sweet spot), with the
same cost model (traversal vs. intersection cost ratio).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Max prims per leaf.  Trade-off: lockstep traversal pays the MAXIMUM
# node-visit count over all lanes per while-loop iteration, but every
# iteration also gathers LEAF_SIZE triangle rows per lane whether or not
# the lane is at a leaf — fat leaves shorten the walk yet inflate every
# step's gather traffic.  (reference gkdtree.h stops at ~4-6 prims.)
import os as _os

LEAF_SIZE = int(_os.environ.get("MTS_BVH_LEAF", 8))
_TRAVERSAL_COST = 1.0
_INTERSECT_COST = 1.0
_NUM_BINS = 16


@dataclass
class BVH:
    lo: np.ndarray  # [N, 3] node bbox min
    hi: np.ndarray  # [N, 3]
    skip: np.ndarray  # [N] int32 next-node-on-miss (N = end)
    first: np.ndarray  # [N] int32 first prim index into `order` (-1 inner)
    count: np.ndarray  # [N] int32 prim count (0 inner)
    order: np.ndarray  # [P] int32 permutation of input prims
    depth: int = 0


def build_bvh(
    centroids: np.ndarray,
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    use_native: bool = True,
) -> BVH:
    """Dispatch: native C++ builder when available, numpy fallback."""
    n = len(centroids)
    if use_native and n > 0:
        out = _build_bvh_native(centroids, prim_lo, prim_hi)
        if out is not None:
            return out
    return _build_bvh_numpy(centroids, prim_lo, prim_hi)


# cap on 8-layout octant threading: 8 copies of the node array
OCTANT_MAX_NODES = 1 << 19


def octant_node_rows(bvh: BVH) -> tuple[np.ndarray, int]:
    """Emit row-packed nodes [(K*N), 9] in K=8 direction-ordered DFS
    layouts (or K=1 above OCTANT_MAX_NODES).

    Closest-hit lockstep traversal pays for every node the WORST lane
    visits; visiting the near child first tightens best_t early so far
    boxes fail `tn < best_t` and whole subtrees are skipped.  A
    skip-pointer layout fixes the child order at build time, so we
    thread EIGHT layouts — one per ray-direction sign octant — and each
    lane traverses the one matching sign(d).  (The reference gets the
    same effect dynamically from its kd-tree stack, sahkdtree3.h:178.)

    Octant o has bit a set iff d[a] < 0; the near child along the
    children's dominant separation axis goes first."""
    n = len(bvh.skip)

    def rows(lo, hi, first, count, skip):
        return np.concatenate(
            [lo, hi,
             first[:, None].astype(np.float32),
             count[:, None].astype(np.float32),
             skip[:, None].astype(np.float32)],
            axis=1,
        ).astype(np.float32)

    base = rows(bvh.lo, bvh.hi, bvh.first, bvh.count, bvh.skip)
    if n > OCTANT_MAX_NODES or n <= 1:
        return base, 1

    # reconstruct children from the threaded DFS layout:
    # internal i -> left = i+1, right = skip[left]
    is_leaf = bvh.count > 0
    center = (bvh.lo + bvh.hi) * 0.5
    layouts = []
    for oct_ in range(8):
        neg = np.array([oct_ & 1, (oct_ >> 1) & 1, (oct_ >> 2) & 1], bool)
        # new DFS order with per-octant child ordering
        order = np.empty(n, np.int32)  # new position -> old node id
        pos_of = np.empty(n, np.int32)
        stack = [0]
        w = 0
        while stack:
            i = stack.pop()
            order[w] = i
            pos_of[i] = w
            w += 1
            if not is_leaf[i]:
                left = i + 1
                right = bvh.skip[left]
                axis = int(
                    np.argmax(np.abs(center[right] - center[left]))
                )
                near_is_left = center[left][axis] <= center[right][axis]
                if neg[axis]:
                    near_is_left = not near_is_left
                near, far = (
                    (left, right) if near_is_left else (right, left)
                )
                stack.append(far)   # visited second
                stack.append(near)  # visited first (popped next)
        # skip link in the new order: next node after my subtree.
        # With the stack DFS above, node at position w's subtree occupies
        # [w, w + size); compute sizes via the old tree.
        size = np.ones(n, np.int64)
        # old-layout subtree size = skip[i] - i (threaded DFS property)
        old_size = bvh.skip - np.arange(n)
        size = old_size[order]
        new_skip = np.arange(n) + size
        layouts.append(
            rows(
                bvh.lo[order], bvh.hi[order],
                bvh.first[order], bvh.count[order],
                new_skip.astype(np.int32),
            )
        )
    return np.concatenate(layouts, axis=0), 8


def _build_bvh_native(centroids, prim_lo, prim_hi) -> BVH | None:
    """C++ binned-SAH builder (mitsuba_tpu/native/bvh_builder.cpp)."""
    import ctypes

    from mitsuba_tpu.native import bvh_builder

    fn = bvh_builder()
    if fn is None:
        return None
    n = len(centroids)
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    cen = np.ascontiguousarray(centroids, np.float32)
    cap = 2 * n + 2
    out_lo = np.empty((cap, 3), np.float32)
    out_hi = np.empty((cap, 3), np.float32)
    out_skip = np.empty(cap, np.int32)
    out_first = np.empty(cap, np.int32)
    out_count = np.empty(cap, np.int32)
    out_order = np.empty(n, np.int32)
    out_depth = np.zeros(1, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    f32, i32 = ctypes.c_float, ctypes.c_int32
    n_nodes = fn(
        p(lo, f32), p(hi, f32), p(cen, f32), n, LEAF_SIZE,
        p(out_lo, f32), p(out_hi, f32), p(out_skip, i32),
        p(out_first, i32), p(out_count, i32), p(out_order, i32),
        p(out_depth, i32),
    )
    if n_nodes <= 0:
        return None
    return BVH(
        lo=out_lo[:n_nodes].copy(),
        hi=out_hi[:n_nodes].copy(),
        skip=out_skip[:n_nodes].copy(),
        first=out_first[:n_nodes].copy(),
        count=out_count[:n_nodes].copy(),
        order=out_order.copy(),
        depth=int(out_depth[0]),
    )


def _build_bvh_numpy(centroids: np.ndarray, prim_lo: np.ndarray, prim_hi: np.ndarray) -> BVH:
    n = len(centroids)
    if n == 0:
        return BVH(
            lo=np.zeros((1, 3), np.float32),
            hi=np.full((1, 3), -1.0, np.float32),
            skip=np.array([1], np.int32),
            first=np.array([0], np.int32),
            count=np.array([0], np.int32),
            order=np.zeros(0, np.int32),
        )

    order = np.empty(n, np.int64)
    order_pos = 0

    # iterative build with an explicit stack: (prim_index_array, parent_slot)
    # we record the tree, then thread skip links in a second pass
    tree_lo, tree_hi, tree_first, tree_count, tree_right = [], [], [], [], []

    def new_node(lo, hi, first, count):
        tree_lo.append(lo)
        tree_hi.append(hi)
        tree_first.append(first)
        tree_count.append(count)
        tree_right.append(-1)
        return len(tree_lo) - 1

    stack = [(np.arange(n, dtype=np.int64), -1, False)]
    max_depth = 0
    # each stack entry: (prims, parent_node, is_right_child)
    # we do DFS with left child visited first so nodes land in DFS order
    while stack:
        prims, parent, is_right = stack.pop()
        lo = prim_lo[prims].min(axis=0)
        hi = prim_hi[prims].max(axis=0)
        me = new_node(lo, hi, -1, 0)
        if parent >= 0 and is_right:
            tree_right[parent] = me

        if len(prims) <= LEAF_SIZE:
            tree_first[me] = order_pos
            tree_count[me] = len(prims)
            order[order_pos : order_pos + len(prims)] = prims
            order_pos += len(prims)
            continue

        # binned SAH over the centroid extent, all 3 axes at once
        c = centroids[prims]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] <= 1e-12:
            # degenerate: split in half by index
            mid = len(prims) // 2
            left, right = prims[:mid], prims[mid:]
        else:
            scale = _NUM_BINS * (1.0 - 1e-6) / extent[axis]
            bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int64)
            # per-bin bounds + counts
            bin_cnt = np.zeros(_NUM_BINS, np.int64)
            bin_lo = np.full((_NUM_BINS, 3), np.inf)
            bin_hi = np.full((_NUM_BINS, 3), -np.inf)
            np.add.at(bin_cnt, bins, 1)
            for a in range(3):
                np.minimum.at(bin_lo[:, a], bins, prim_lo[prims][:, a])
                np.maximum.at(bin_hi[:, a], bins, prim_hi[prims][:, a])

            # prefix/suffix sweep for SAH
            def area(lo_, hi_):
                d = np.maximum(hi_ - lo_, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            l_lo = np.minimum.accumulate(bin_lo, axis=0)
            l_hi = np.maximum.accumulate(bin_hi, axis=0)
            r_lo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1]
            r_hi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1]
            l_cnt = np.cumsum(bin_cnt)
            r_cnt = np.cumsum(bin_cnt[::-1])[::-1]
            cost = (
                area(l_lo, l_hi)[:-1] * l_cnt[:-1]
                + area(r_lo[1:], r_hi[1:]) * r_cnt[1:]
            )
            cost = np.where(
                (l_cnt[:-1] == 0) | (r_cnt[1:] == 0), np.inf, cost
            )
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                mid = len(prims) // 2
                left, right = prims[:mid], prims[mid:]
            else:
                mask = bins <= best
                left, right = prims[mask], prims[~mask]

        # push right first so left is processed (and laid out) first
        stack.append((right, me, True))
        stack.append((left, me, False))

    n_nodes = len(tree_lo)
    lo_arr = np.asarray(tree_lo, np.float32)
    hi_arr = np.asarray(tree_hi, np.float32)
    first_arr = np.asarray(tree_first, np.int32)
    count_arr = np.asarray(tree_count, np.int32)
    right_arr = np.asarray(tree_right, np.int64)

    # thread skip links: skip[i] = next node in DFS order that is not in
    # i's subtree.  For a leaf that's i+1's... compute via recursion-free
    # pass: skip[root] = n_nodes; for inner node i with right child r:
    # skip[left=i+1] = r, skip[r] = skip[i]
    skip = np.full(n_nodes, n_nodes, np.int64)
    # DFS order guarantee: children of i are i+1 (left) and right_arr[i]
    stack2 = [0]
    while stack2:
        i = stack2.pop()
        r = right_arr[i]
        if count_arr[i] == 0 and r >= 0:  # inner
            left = i + 1
            skip[left] = r
            skip[r] = skip[i]
            stack2.append(left)
            stack2.append(r)

    # measure depth for reporting
    depth = 0
    d_stack = [(0, 1)]
    while d_stack:
        i, d = d_stack.pop()
        depth = max(depth, d)
        r = right_arr[i]
        if count_arr[i] == 0 and r >= 0:
            d_stack.append((i + 1, d + 1))
            d_stack.append((r, d + 1))

    return BVH(
        lo=lo_arr,
        hi=hi_arr,
        skip=skip.astype(np.int32),
        first=first_arr,
        count=count_arr,
        order=order[:order_pos].astype(np.int32),
        depth=depth,
    )
