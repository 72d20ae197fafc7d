"""MXU one-hot gathers: the TPU-native replacement for small-table gathers.

Random-index gathers are the slowest primitive on the TPU VPU — measured
~1.5 ns/lane per gathered row on v5e, i.e. one gather costs as much as
~1000 vector flops.  A wavefront bounce performs ~40 of them (triangle
attributes, material tables, emitter tables), which made the round-1
renderer gather-bound (shading ~4x the intersection cost).

For small tables the MXU does the same job orders of magnitude faster:
    out[r] = table[idx[r]]  ==  onehot(idx)[r, :] @ table
One [R, T] x [T, C] matmul replaces C-column worth of gathers, and all
tables indexed by the same ids can be fused into a single [T, C_total]
matrix.  With T <= a few hundred this is ~20 us where gathers took ~3 ms.

The one-hot matrix is bit-exact: each output row sums exactly one
1.0 * value product (everything else is 0.0 * value), and the matmul
runs at Precision.HIGHEST so the f32 operands are not truncated.

Tables larger than `ONEHOT_MAX_ROWS` fall back to native gathers, where
the one-hot's O(R*T) work and [R, T] materialization stop paying off
(BVH-scale scenes index 100k-row tables with much sparser access).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# crossover measured on v5e: one-hot wins for every table that fits the
# threshold; above it HBM traffic for the [R, T] one-hot dominates
ONEHOT_MAX_ROWS = int(os.environ.get("MTS_ONEHOT_MAX", 512))


def _as_f32_col(a):
    """View a column (int or float, [T] or [T, k]) as a [T, k] f32 block."""
    if a.ndim == 1:
        a = a[:, None]
    return a.astype(jnp.float32)


def onehot(idx, n_rows, dtype=jnp.float32):
    """[R] int -> [R, n_rows] one-hot (0/1) matrix."""
    cols = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n_rows,),
                                    idx.ndim)
    return (idx[..., None].astype(jnp.int32) == cols).astype(dtype)


def take_rows(table, idx):
    """table[idx] for a [T, C] (or [T]) table; MXU one-hot when T is small.

    Exact: produces bit-identical values to a native gather."""
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    T = t2.shape[0]
    if T > ONEHOT_MAX_ROWS or not jnp.issubdtype(t2.dtype, jnp.floating):
        out = table[idx]
        return out
    oh = onehot(idx, T, t2.dtype)
    out = jax.lax.dot_general(
        oh, t2, (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[..., 0] if squeeze else out


def take_fused(idx, *tables):
    """Gather rows idx from several tables sharing the same row ids with
    ONE one-hot matmul.  Integer tables round-trip exactly through f32
    (all ids here are < 2^24).

    Returns a list of per-table results with original shapes/dtypes."""
    T = None
    cols = []
    layout = []  # (start, width, squeeze, dtype)
    at = 0
    for a in tables:
        sq = a.ndim == 1
        c = _as_f32_col(a)
        if T is None:
            T = c.shape[0]
        cols.append(c)
        layout.append((at, c.shape[1], sq, a.dtype))
        at += c.shape[1]

    if T > ONEHOT_MAX_ROWS:
        return [t[idx] for t in tables]

    fused = jnp.concatenate(cols, axis=1)  # [T, C_total] — loop-invariant
    oh = onehot(idx, T)
    out = jax.lax.dot_general(
        oh, fused, (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    res = []
    for (start, width, sq, dt) in layout:
        block = out[..., start:start + width]
        if sq:
            block = block[..., 0]
        if jnp.issubdtype(dt, jnp.integer) or dt == jnp.bool_:
            block = jnp.rint(block).astype(dt)
        elif block.dtype != dt:
            block = block.astype(dt)
        res.append(block)
    return res
