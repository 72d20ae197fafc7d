"""Pair-compaction traversal (accel/pairs.py) vs the XLA BVH, in
Pallas interpret mode on CPU (same validation strategy as
tests/test_cluster.py = the reference's test_kd.cpp:95-130)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.accel import intersect as isect
from mitsuba_tpu.accel import pairs as prs
from tests.test_cluster import cluster_pack


def _rays(pack, n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _ref(pack, o, d, t_max=1e30):
    return isect._bvh_traverse(pack, o, d, jnp.asarray(t_max))


def _check_closest(pack, o, d, t_max=1e30):
    bt, bp, bu, bv = prs.pair_closest(
        pack, o, d, jnp.asarray(t_max), interpret=True
    )
    rt, rp, ru, rv = _ref(pack, o, d, t_max)
    hit_p = np.asarray(bp) >= 0
    hit_r = np.asarray(rp) >= 0
    np.testing.assert_array_equal(hit_p, hit_r)
    np.testing.assert_allclose(
        np.asarray(bt)[hit_r], np.asarray(rt)[hit_r], rtol=1e-4, atol=1e-5
    )
    # the winning primitive can differ only at exact-t ties
    diff = hit_r & (np.asarray(bp) != np.asarray(rp))
    assert (
        np.abs(np.asarray(bt)[diff] - np.asarray(rt)[diff]) <= 1e-5
    ).all()
    same = hit_r & ~diff
    np.testing.assert_allclose(
        np.asarray(bu)[same], np.asarray(ru)[same], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bv)[same], np.asarray(rv)[same], rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("kernel", ["runs", "window"])
@pytest.mark.parametrize("dense_c", [0, None])
def test_pair_closest_matches_bvh(monkeypatch, kernel, dense_c):
    """Covers every (kernel, cull) default combination: dense_c=None
    keeps the dense one-level cull (small-mesh default), dense_c=0
    forces the two-level super/member pipeline (big-mesh path)."""
    monkeypatch.setenv("MTS_PAIR_KERNEL", kernel)
    if dense_c is not None:
        monkeypatch.setattr(prs, "DENSE_C", dense_c)
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 2048)
    _check_closest(pack, o, d)


def test_pair_closest_small_k_overflow(monkeypatch):
    """Tiny K / Ks force the overflow fallback to carry correctness."""
    monkeypatch.setattr(prs, "KS", 1)
    monkeypatch.setattr(prs, "K", 1)
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 1024, seed=7)
    _check_closest(pack, o, d)


def test_pair_queue_budget_drop(monkeypatch):
    """A starved pair budget must flag dropped rays into the fallback,
    not silently miss."""
    monkeypatch.setattr(prs, "BUDGET", 0.25)
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 1024, seed=11)
    _check_closest(pack, o, d)


def test_pair_any_matches_bvh():
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 2048, seed=3)
    occ_p = prs.pair_any(
        pack, o, d, jnp.asarray(0.7), interpret=True
    )
    occ_r = isect._bvh_traverse_any(pack, o, d, jnp.asarray(0.7))
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_r))


def test_pair_finite_tmax_and_padding():
    """Non-multiple-of-tile ray counts and finite per-ray t_max."""
    pack = cluster_pack(n_tris=1500, tc=64)
    o, d = _rays(pack, 777, seed=5)
    t_max = jnp.asarray(
        np.random.default_rng(5).uniform(0.05, 3.0, (777,)).astype(
            np.float32
        )
    )
    bt, bp, _, _ = prs.pair_closest(pack, o, d, t_max, interpret=True)
    rt, rp, _, _ = isect._bvh_traverse(pack, o, d, t_max)
    hit_r = np.asarray(rp) >= 0
    np.testing.assert_array_equal(np.asarray(bp) >= 0, hit_r)
    np.testing.assert_allclose(
        np.asarray(bt)[hit_r], np.asarray(rt)[hit_r], rtol=1e-4,
        atol=1e-5,
    )


def test_pair_fast_path_engages():
    """Regression for the inverted-padded-super bug: a symmetric slab
    test can't reject inverted sentinel boxes (they behave as
    [-1e30, 1e30] and hit every ray at entry 0), which silently
    evicted every REAL supercluster and sent 100% of rays to the
    fallback.  Assert culling actually finds clusters and the
    overflow-to-fallback rate stays small on a real mesh."""
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 4096)
    t_max = jnp.broadcast_to(jnp.asarray(1e30), (4096,))
    cids, ent_k, ov = prs._cluster_lists(pack, o, d, t_max)
    n_cl = np.asarray(ov["n_cl"])
    assert n_cl.mean() > 0.3, n_cl.mean()
    *_, overflow = prs._run_tile(pack, o, d, t_max, "closest", True)
    assert np.asarray(overflow).mean() < 0.20, np.asarray(overflow).mean()


def test_dense_cull_matches_xla():
    """The one-level dense cull must keep the same k smallest entry
    distances as the two-level XLA culling (cluster ids can differ
    only where entries tie — e.g. rays starting inside several
    boxes), and its kept ids must all be real slab hits."""
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 1024, seed=9)
    t_max = jnp.broadcast_to(jnp.asarray(1e30), (1024,))
    cx, ex, ovx = prs._cluster_lists(pack, o, d, t_max)
    cd, ed, ovd = prs._cluster_lists_dense(pack, o, d, t_max, True)
    np.testing.assert_allclose(
        np.asarray(ex), np.asarray(ed), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(ovx["n_cl"]), np.asarray(ovd["n_cl"])
    )
    # where entries are unique within the row, ids must agree exactly
    exn = np.asarray(ex)
    unique = np.array([
        len(np.unique(row)) == len(row) for row in exn
    ])
    np.testing.assert_array_equal(
        np.asarray(cx)[unique], np.asarray(cd)[unique]
    )


def test_pallas_cull_matches_xla():
    """The fused Pallas culling kernel must reproduce the XLA two-level
    culling exactly (same slab math, same k-pass min extraction)."""
    pack = cluster_pack(n_tris=3000, tc=64)
    o, d = _rays(pack, 1024, seed=5)
    t_max = jnp.broadcast_to(jnp.asarray(1e30), (1024,))
    cx, ex, ovx = prs._cluster_lists(pack, o, d, t_max)
    cp_, ep, ovp = prs._cluster_lists_pallas(pack, o, d, t_max, True)
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp_))
    np.testing.assert_allclose(
        np.asarray(ex), np.asarray(ep), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(ovx["n_sup"]), np.asarray(ovp["n_sup"])
    )
    np.testing.assert_array_equal(
        np.asarray(ovx["n_cl"]), np.asarray(ovp["n_cl"])
    )
