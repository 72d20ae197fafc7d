"""Cluster packet-traversal kernel (accel/pallas_bvh.py) vs the XLA
BVH, in Pallas interpret mode on CPU (= the reference's kd-tree
validation strategy, test_kd.cpp:95-130)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.accel import intersect as isect
from mitsuba_tpu.accel import pallas_bvh as pb
from mitsuba_tpu.accel.bvh import build_bvh
from mitsuba_tpu.accel.clusters import cut_clusters, pack_clusters
from mitsuba_tpu.scene.builder import ScenePack


def cluster_pack(n_tris=3000, seed=0, tc=64):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.15, 0.15, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.15, 0.15, (n_tris, 3)).astype(np.float32)

    lo = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    hi = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    cen = v0 + (e1 + e2) / 3
    bvh = build_bvh(cen, lo, hi)
    perm = bvh.order
    v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]

    def padded(a, fill=0.0):
        return np.concatenate(
            [a, np.full((4,) + a.shape[1:], fill, a.dtype)]
        )

    tv0, te1, te2 = padded(v0p, 1e30), padded(e1p), padded(e2p)
    bvh_nodes = np.concatenate(
        [
            bvh.lo, bvh.hi,
            bvh.first[:, None].astype(np.float32),
            bvh.count[:, None].astype(np.float32),
            bvh.skip[:, None].astype(np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    cl_arrays, cl_meta = pack_clusters(bvh, tv0, te1, te2, n_tris, tc=tc)
    arrays = {
        "tri_v0": jnp.asarray(tv0),
        "tri_e1": jnp.asarray(te1),
        "tri_e2": jnp.asarray(te2),
        "tri9": jnp.asarray(np.concatenate([tv0, te1, te2], axis=1)),
        "bvh_nodes": jnp.asarray(bvh_nodes),
        **{k: jnp.asarray(v) for k, v in cl_arrays.items()},
    }
    meta = {"n_tris": n_tris, "n_spheres": 0, "use_bvh": True, **cl_meta}
    return ScenePack(arrays, meta)


def test_cluster_cut_covers_all_prims():
    rng = np.random.default_rng(3)
    v0 = rng.uniform(-1, 1, (777, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (777, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (777, 3)).astype(np.float32)
    lo = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    hi = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    bvh = build_bvh(v0 + (e1 + e2) / 3, lo, hi)
    first, cnt, clo, chi = cut_clusters(bvh, 64)
    assert cnt.sum() == 777
    assert (cnt <= 64).all() and (cnt > 0).all()
    # contiguous, disjoint coverage
    order = np.argsort(first)
    f, c = first[order], cnt[order]
    assert f[0] == 0
    assert (f[1:] == f[:-1] + c[:-1]).all()


def _rays(n_rays=4096, seed=7):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


@pytest.mark.parametrize("kernel", ["vpu", "mxu"])
def test_cluster_closest_matches_bvh(kernel, monkeypatch):
    monkeypatch.setattr(pb, "KERNEL", kernel)
    # pin the exact prepass: "auto" would pick the cone prepass for
    # the unsorted case, which visits every cluster on these
    # incoherent test rays (correct but interpret-mode slow)
    monkeypatch.setattr(pb, "PREPASS", "exact")
    pack = cluster_pack()
    o, d = _rays()
    ref = isect.intersect(pack, o, d)  # XLA BVH path on CPU

    for sort in (False, True):
        t, prim, u, v = pb.cluster_closest(
            pack, o, d, jnp.inf, sort=sort, interpret=True
        )
        valid = np.asarray(prim) >= 0
        rvalid = np.asarray(ref.valid)
        assert (valid == rvalid).all(), (
            f"sort={sort}: {np.sum(valid != rvalid)} validity mismatches"
        )
        tb, tr = np.asarray(t)[valid], np.asarray(ref.t)[valid]
        assert np.allclose(tb, tr, rtol=1e-4, atol=1e-5)
        mismatch = (np.asarray(prim) != np.asarray(ref.prim)) & valid
        assert (np.abs(np.asarray(t) - np.asarray(ref.t))[mismatch] < 1e-4).all()
        # barycentrics of agreeing prims match (kernel-side MT vs the
        # XLA recompute differ by fusion order, not algorithm)
        agree = valid & ~mismatch
        assert np.allclose(
            np.asarray(u)[agree], np.asarray(ref.u)[agree],
            rtol=1e-2, atol=1e-3,
        )


@pytest.mark.parametrize("kernel", ["vpu", "mxu"])
def test_cluster_any_matches_bvh(kernel, monkeypatch):
    monkeypatch.setattr(pb, "KERNEL", kernel)
    monkeypatch.setattr(pb, "PREPASS", "exact")
    pack = cluster_pack(seed=1)
    o, d = _rays(seed=11)
    t_max = jnp.full((o.shape[0],), 1.5, jnp.float32)
    ref = isect._bvh_traverse_any(pack, o, d, t_max)
    for sort in (False, True):
        occ = pb.cluster_any(pack, o, d, t_max, sort=sort, interpret=True)
        assert (np.asarray(occ) == np.asarray(ref)).all()


def test_cluster_cone_prepass_matches_exact(monkeypatch):
    """The conservative per-chunk interval prepass must not lose hits
    vs the exact per-ray prepass (false positives are fine — the
    kernel's per-lane slab test rejects them)."""
    monkeypatch.setattr(pb, "PREPASS", "cone")
    monkeypatch.setattr(pb, "KERNEL", "mxu")
    pack = cluster_pack(seed=4)
    o, d = _rays(seed=13)
    ref = isect.intersect(pack, o, d)
    t, prim, u, v = pb.cluster_closest(
        pack, o, d, jnp.inf, sort=True, interpret=True
    )
    valid = np.asarray(prim) >= 0
    rvalid = np.asarray(ref.valid)
    assert (valid == rvalid).all()
    assert np.allclose(
        np.asarray(t)[valid], np.asarray(ref.t)[valid],
        rtol=1e-4, atol=1e-5,
    )
    occ_ref = isect._bvh_traverse_any(
        pack, o, d, jnp.full((o.shape[0],), 1.5, jnp.float32)
    )
    occ = pb.cluster_any(
        pack, o, d, jnp.full((o.shape[0],), 1.5, jnp.float32),
        sort=True, interpret=True,
    )
    assert (np.asarray(occ) == np.asarray(occ_ref)).all()


@pytest.mark.parametrize("kernel", ["vpu", "mxu"])
def test_cluster_finite_tmax_and_small_batch(kernel, monkeypatch):
    monkeypatch.setattr(pb, "KERNEL", kernel)
    monkeypatch.setattr(pb, "PREPASS", "exact")
    pack = cluster_pack(seed=2, n_tris=700)
    o, d = _rays(n_rays=37, seed=5)
    t_max = jnp.full((37,), 0.8, jnp.float32)
    ref = isect.intersect(pack, o, d, t_max)
    t, prim, u, v = pb.cluster_closest(
        pack, o, d, t_max, sort=False, interpret=True
    )
    assert ((np.asarray(prim) >= 0) == np.asarray(ref.valid)).all()
    both = np.asarray(ref.valid)
    assert np.allclose(np.asarray(t)[both], np.asarray(ref.t)[both],
                       rtol=1e-4, atol=1e-5)
