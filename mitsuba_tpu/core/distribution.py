"""Discrete and piecewise-constant distributions.

Rebuild of reference include/mitsuba/core/pmf.h (DiscreteDistribution)
plus the 2D row/column CDF used for env-map importance sampling
(reference: src/emitters/envmap.cpp:103-229).  Building happens host-side
in numpy; sampling is a pure JAX `searchsorted` on device (O(log n), fully
vectorized — the TPU analogue of `sampleReuse`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class DiscreteDistribution1D:
    """Normalized CDF over N discrete entries."""

    cdf: jnp.ndarray  # [N+1], cdf[0] = 0, cdf[N] = 1
    pmf: jnp.ndarray  # [N]
    # static (host) metadata
    total: float = 1.0

    def tree_flatten(self):
        return (self.cdf, self.pmf), (self.total,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @staticmethod
    def from_weights(weights: np.ndarray) -> "DiscreteDistribution1D":
        w = np.asarray(weights, np.float64).ravel()
        total = float(w.sum())
        if total <= 0.0:
            w = np.ones_like(w)
            total_n = w.sum()
            pmf = w / total_n
        else:
            pmf = w / total
        cdf = np.concatenate([[0.0], np.cumsum(pmf)])
        cdf[-1] = 1.0
        return DiscreteDistribution1D(
            jnp.asarray(cdf, jnp.float32),
            jnp.asarray(pmf, jnp.float32),
            total,
        )

    @property
    def size(self):
        return self.pmf.shape[0]

    def sample(self, u):
        """u in [0,1) -> index (reference pmf.h sample())."""
        idx = jnp.searchsorted(self.cdf, u, side="right") - 1
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1)

    def sample_reuse(self, u):
        """Sample an index and re-uniformize the used sample
        (reference pmf.h sampleReuse())."""
        idx = self.sample(u)
        lo = self.cdf[idx]
        width = jnp.maximum(self.cdf[idx + 1] - lo, 1e-20)
        return idx, jnp.clip((u - lo) / width, 0.0, 0.99999994)

    def pdf(self, idx):
        return self.pmf[idx]


def build_alias(weights: np.ndarray):
    """Walker alias table: O(1)-per-draw categorical sampling.

    Returns (prob [N] f32, alias [N] i32): draw i uniformly, accept i
    with probability prob[i], else take alias[i].  Identical sampling
    density to a CDF inversion over the same weights, but a draw costs
    one table row instead of log2(N) serialized per-lane gathers — the
    TPU replacement for the reference's hierarchical env-map CDFs
    (src/emitters/envmap.cpp sampleDirection).  Native O(n) Vose build
    with a pure-python fallback."""
    w = np.ascontiguousarray(
        np.maximum(np.asarray(weights, np.float64).ravel(), 0.0)
    )
    n = w.size
    prob = np.empty(n, np.float32)
    alias = np.empty(n, np.int32)

    from mitsuba_tpu.native import alias_builder

    fn = alias_builder()
    if fn is not None:
        import ctypes

        fn(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return prob, alias

    # pure-python Vose (fine for test-sized tables)
    s = w.sum()
    p = (w * (n / s)) if s > 0 else np.ones(n, np.float64)
    alias[:] = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        si = small.pop()
        li = large.pop()
        prob[si] = p[si]
        alias[si] = li
        p[li] = (p[li] + p[si]) - 1.0
        (small if p[li] < 1.0 else large).append(li)
    for i in large:
        prob[i] = 1.0
    for i in small:
        prob[i] = 1.0
    return prob, alias


@jax.tree_util.register_pytree_node_class
@dataclass
class Distribution2D:
    """Piecewise-constant 2D distribution over an [H, W] grid.

    Used for env-map importance sampling: sample a row from the marginal
    CDF, then a column from that row's conditional CDF.
    """

    marginal_cdf: jnp.ndarray  # [H+1]
    conditional_cdf: jnp.ndarray  # [H, W+1]
    density: jnp.ndarray  # [H, W] normalized so mean over grid == 1

    def tree_flatten(self):
        return (self.marginal_cdf, self.conditional_cdf, self.density), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def from_weights(weights: np.ndarray) -> "Distribution2D":
        w = np.asarray(weights, np.float64)
        h, wid = w.shape
        w = np.maximum(w, 0.0)
        if w.sum() <= 0.0:
            w = np.ones_like(w)
        row_sums = w.sum(axis=1)
        marg = row_sums / row_sums.sum()
        marg_cdf = np.concatenate([[0.0], np.cumsum(marg)])
        marg_cdf[-1] = 1.0
        cond = w / np.maximum(row_sums[:, None], 1e-300)
        cond = np.where(row_sums[:, None] > 0, cond, 1.0 / wid)
        cond_cdf = np.concatenate(
            [np.zeros((h, 1)), np.cumsum(cond, axis=1)], axis=1
        )
        cond_cdf[:, -1] = 1.0
        mean = w.mean()
        density = w / mean  # pdf(u,v) on unit square = density[y, x]
        return Distribution2D(
            jnp.asarray(marg_cdf, jnp.float32),
            jnp.asarray(cond_cdf, jnp.float32),
            jnp.asarray(density, jnp.float32),
        )

    def sample(self, u2):
        """u2 [..., 2] -> (xy in [0,1)^2 continuous, pdf on unit square)."""
        h = self.density.shape[0]
        w = self.density.shape[1]
        row = jnp.clip(
            jnp.searchsorted(self.marginal_cdf, u2[..., 1], side="right") - 1,
            0,
            h - 1,
        )
        # re-uniformize within the row bin
        lo = self.marginal_cdf[row]
        dv = jnp.maximum(self.marginal_cdf[row + 1] - lo, 1e-20)
        v = (row + jnp.clip((u2[..., 1] - lo) / dv, 0.0, 0.99999994)) / h

        cond_cdf_row = self.conditional_cdf[row]  # [..., W+1]
        col = jnp.clip(
            jax.vmap(
                lambda cdf, x: jnp.searchsorted(cdf, x, side="right") - 1
            )(
                cond_cdf_row.reshape(-1, w + 1),
                u2[..., 0].reshape(-1),
            ).reshape(row.shape),
            0,
            w - 1,
        )
        lo_c = jnp.take_along_axis(cond_cdf_row, col[..., None], axis=-1)[
            ..., 0
        ]
        hi_c = jnp.take_along_axis(
            cond_cdf_row, col[..., None] + 1, axis=-1
        )[..., 0]
        du = jnp.maximum(hi_c - lo_c, 1e-20)
        uu = (col + jnp.clip((u2[..., 0] - lo_c) / du, 0.0, 0.99999994)) / w
        pdf = self.density.reshape(-1)[row * w + col]  # 1D gather (TPU)
        return jnp.stack([uu, v], axis=-1), pdf

    def pdf(self, xy):
        """pdf at continuous unit-square coords xy [..., 2]."""
        h, w = self.density.shape
        col = jnp.clip((xy[..., 0] * w).astype(jnp.int32), 0, w - 1)
        row = jnp.clip((xy[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return self.density.reshape(-1)[row * w + col]
