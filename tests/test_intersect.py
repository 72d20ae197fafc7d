"""Accelerator correctness: BVH traversal vs brute force on random
scenes (= the reference's kd-tree validation strategy, test_kd.cpp)."""

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.accel.bvh import build_bvh
from mitsuba_tpu.accel import intersect as isect
from mitsuba_tpu.scene.builder import ScenePack, pack_scene


def random_tri_pack(n_tris=900, seed=0, use_bvh=True):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (n_tris, 3)).astype(np.float32)

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

    bvh_nodes = np.concatenate(
        [
            bvh.lo, bvh.hi,
            bvh.first[:, None].astype(np.float32),
            bvh.count[:, None].astype(np.float32),
            bvh.skip[:, None].astype(np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    tv0, te1, te2 = padded(v0p, 1e30), padded(e1p), padded(e2p)
    arrays = {
        "tri_v0": jnp.asarray(tv0),
        "tri_e1": jnp.asarray(te1),
        "tri_e2": jnp.asarray(te2),
        "tri9": jnp.asarray(np.concatenate([tv0, te1, te2], axis=1)),
        "bvh_lo": jnp.asarray(bvh.lo),
        "bvh_hi": jnp.asarray(bvh.hi),
        "bvh_skip": jnp.asarray(bvh.skip),
        "bvh_first": jnp.asarray(bvh.first),
        "bvh_count": jnp.asarray(bvh.count),
        "bvh_nodes": jnp.asarray(bvh_nodes),
    }
    meta = {"n_tris": n_tris, "n_spheres": 0, "use_bvh": use_bvh}
    return ScenePack(arrays, meta), perm


def test_bvh_matches_brute_force():
    pack_bvh, perm = random_tri_pack(use_bvh=True)
    pack_bf = ScenePack(pack_bvh.arrays, {**pack_bvh.meta, "use_bvh": False})

    rng = np.random.default_rng(7)
    n_rays = 4096
    o = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    h1 = isect.intersect(pack_bvh, o, d)
    h2 = isect.intersect(pack_bf, o, d)

    v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
    assert (v1 == v2).all(), f"validity mismatch: {np.sum(v1 != v2)} rays"
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    both = v1 & v2
    assert np.allclose(t1[both], t2[both], rtol=1e-4, atol=1e-5)
    # same triangle except exact-tie cases
    p1, p2 = np.asarray(h1.prim), np.asarray(h2.prim)
    mismatch = (p1 != p2) & both
    assert (
        np.abs(t1[mismatch] - t2[mismatch]) < 1e-4
    ).all(), "different prim with different t"


def test_bvh_shadow_rays():
    pack_bvh, _ = random_tri_pack(use_bvh=True)
    pack_bf = ScenePack(pack_bvh.arrays, {**pack_bvh.meta, "use_bvh": False})
    rng = np.random.default_rng(11)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.full((n,), 1.5)
    o1 = np.asarray(isect.occluded(pack_bvh, o, d, t_max))
    o2 = np.asarray(isect.occluded(pack_bf, o, d, t_max))
    assert (o1 == o2).all()


def test_sphere_intersection_analytic(cbox_scene=None):
    """Ray-sphere hit positions lie on the sphere surface."""
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    scene = load_scene_string(
        """
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
        </film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1.3"/>
        <bsdf type="diffuse"/>
      </shape>
    </scene>"""
    )
    pack = pack_scene(scene)
    n = 64
    ang = np.linspace(-0.3, 0.3, n)
    d = np.stack([np.sin(ang), np.zeros(n), np.cos(ang)], -1).astype(
        np.float32
    )
    o = np.tile(np.array([[0, 0, -4]], np.float32), (n, 1))
    hit = isect.intersect(pack, jnp.asarray(o), jnp.asarray(d))
    its = isect.fill_interaction(pack, jnp.asarray(o), jnp.asarray(d), hit)
    p = np.asarray(its.p)[np.asarray(hit.valid)]
    r = np.linalg.norm(p, axis=-1)
    assert np.allclose(r, 1.3, atol=1e-3)
    # normals point outward (toward the camera side)
    ns = np.asarray(its.ns)[np.asarray(hit.valid)]
    assert (np.sum(ns * (p / r[:, None]), axis=-1) > 0.999).all()


def test_pallas_kernels_match_xla():
    """The Pallas VMEM-tiled intersector (used on real TPU) must agree
    with the XLA brute-force reference (interpret mode on CPU)."""
    import jax.numpy as jnp
    from mitsuba_tpu.accel import pallas_kernels as pk
    from mitsuba_tpu.accel.intersect import _brute_force, _brute_force_any

    pack, _ = random_tri_pack(n_tris=300, use_bvh=False)
    rng = np.random.default_rng(3)
    n = 1000
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tri_t = jnp.asarray(
        pk.pack_triangles_transposed(
            pack.tri_v0, pack.tri_e1, pack.tri_e2, 300
        )
    )

    t1, p1 = pk.closest_hit(o, d, jnp.inf, tri_t, interpret=True)
    t2, p2, _, _ = _brute_force(pack, o, d, jnp.inf)
    assert ((np.asarray(p1) >= 0) == (np.asarray(p2) >= 0)).all()
    both = (np.asarray(p1) >= 0) & (np.asarray(p2) >= 0)
    assert np.allclose(np.asarray(t1)[both], np.asarray(t2)[both], rtol=1e-4)
    assert (np.asarray(p1)[both] == np.asarray(p2)[both]).all()

    occ1 = pk.any_hit(o, d, jnp.full(n, 1.5), tri_t, interpret=True)
    occ2 = _brute_force_any(pack, o, d, jnp.full(n, 1.5))
    assert (np.asarray(occ1) == np.asarray(occ2)).all()


def test_native_bvh_builder_matches_numpy():
    """The C++ builder must produce a tree whose traversal results agree
    with the numpy builder's (trees may differ; hits may not)."""
    from mitsuba_tpu.accel.bvh import (
        _build_bvh_native,
        _build_bvh_numpy,
    )

    rng = np.random.default_rng(5)
    n = 5000
    v0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    lo = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    hi = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    cen = v0 + (e1 + e2) / 3

    nat = _build_bvh_native(cen, lo, hi)
    if nat is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    ref = _build_bvh_numpy(cen, lo, hi)
    assert sorted(nat.order.tolist()) == sorted(ref.order.tolist())
    assert nat.count.sum() == n and ref.count.sum() == n

    # traverse both trees, compare hits
    def mk(bvh):
        perm = bvh.order
        def padded(a, fill=0.0):
            return np.concatenate([a, np.full((4,) + a.shape[1:], fill, a.dtype)])
        nodes = np.concatenate(
            [bvh.lo, bvh.hi,
             bvh.first[:, None].astype(np.float32),
             bvh.count[:, None].astype(np.float32),
             bvh.skip[:, None].astype(np.float32)], axis=1,
        ).astype(np.float32)
        tv0, te1, te2 = padded(v0[perm], 1e30), padded(e1[perm]), padded(e2[perm])
        arrays = {
            "tri_v0": jnp.asarray(tv0),
            "tri_e1": jnp.asarray(te1),
            "tri_e2": jnp.asarray(te2),
            "tri9": jnp.asarray(np.concatenate([tv0, te1, te2], axis=1)),
            "bvh_lo": jnp.asarray(bvh.lo),
            "bvh_hi": jnp.asarray(bvh.hi),
            "bvh_skip": jnp.asarray(bvh.skip),
            "bvh_first": jnp.asarray(bvh.first),
            "bvh_count": jnp.asarray(bvh.count),
            "bvh_nodes": jnp.asarray(nodes),
        }
        return ScenePack(arrays, {"n_tris": n, "n_spheres": 0, "use_bvh": True}), perm

    pack_n, perm_n = mk(nat)
    pack_r, perm_r = mk(ref)
    m = 4096
    o = jnp.asarray(rng.uniform(-2, 2, (m, 3)).astype(np.float32))
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    h1 = isect.intersect(pack_n, o, d)
    h2 = isect.intersect(pack_r, o, d)
    assert (np.asarray(h1.valid) == np.asarray(h2.valid)).all()
    both = np.asarray(h1.valid)
    assert np.allclose(
        np.asarray(h1.t)[both], np.asarray(h2.t)[both], rtol=1e-4
    )
    # same original primitive
    p1 = perm_n[np.asarray(h1.prim)[both]]
    p2 = perm_r[np.asarray(h2.prim)[both]]
    tie = ~np.isclose(np.asarray(h1.t)[both], np.asarray(h2.t)[both])
    assert ((p1 == p2) | tie).all()
