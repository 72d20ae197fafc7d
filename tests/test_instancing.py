"""Two-level instancing (accel/tlas.py; reference shapegroup.h:34 +
src/shapes/instance.cpp): above MTS_INSTANCE_EXPAND_MAX the group
geometry packs ONCE and instances traverse a TLAS spliced with
per-instance BLAS node copies.  The TLAS path must render identically
to flat expansion."""

import numpy as np
import pytest

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene(spp=32):
    # three instances of a two-triangle card group: translated, rotated,
    # and non-uniformly scaled; lit by an area light so both camera and
    # shadow rays exercise the instanced traversal
    return load_scene_string(f"""
    <scene version="0.5.0">
      <integrator type="path">
        <integer name="maxDepth" value="3"/>
      </integrator>
      <sensor type="perspective">
        <float name="fov" value="55"/>
        <transform name="toWorld">
          <lookat origin="0,1.5,-4" target="0,0.4,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="{spp}"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="48"/>
          <integer name="height" value="48"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="-90"/>
          <scale value="5"/>
        </transform>
        <bsdf type="diffuse">
          <rgb name="reflectance" value="0.5, 0.5, 0.5"/>
        </bsdf>
      </shape>
      <shape type="shapegroup" id="grp">
        <shape type="rectangle">
          <transform name="toWorld">
            <scale value="0.4"/>
            <rotate y="1" angle="180"/>
            <translate y="0.45"/>
          </transform>
          <bsdf type="diffuse">
            <rgb name="reflectance" value="0.7, 0.3, 0.2"/>
          </bsdf>
        </shape>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld"><translate x="-1.1"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld">
          <rotate y="1" angle="40"/>
          <translate x="0.2" z="0.5"/>
        </transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld">
          <scale x="1.6" y="0.7" z="1.0"/>
          <translate x="1.3" z="-0.3"/>
        </transform>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="90"/>
          <scale value="1.5"/>
          <translate y="3"/>
        </transform>
        <emitter type="area">
          <rgb name="radiance" value="6, 6, 6"/>
        </emitter>
      </shape>
    </scene>""")


def test_tlas_matches_flat_expansion(monkeypatch):
    ref = render(_scene(), spp=32, seed=4)  # flat (below threshold)
    monkeypatch.setenv("MTS_INSTANCE_EXPAND_MAX", "0")
    sc = _scene()
    pack = pack_scene(sc)
    assert pack.meta["has_instances"]
    assert pack.meta["n_instances"] == 3
    img = render(sc, spp=32, seed=4, pack=pack)
    # identical geometry through a different accelerator: tight match
    d = np.abs(img - ref)
    assert d.max() < 5e-3, d.max()


def test_tlas_pack_shares_templates(monkeypatch):
    monkeypatch.setenv("MTS_INSTANCE_EXPAND_MAX", "0")
    pack = pack_scene(_scene())
    # 3 instances but the group's 2 triangles are stored once: template
    # rows = 2, plus floor (2) + light (2) world triangles
    n_world = pack.meta["n_static_tris"]
    assert pack.meta["n_tris"] - n_world == 2  # shared templates
    assert pack.arrays["inst_inv"].shape[0] == 3
    # spliced nodes: TLAS wrapper rows + one BLAS copy per instance
    assert pack.arrays["inst_nodes"].shape[0] >= 4


def test_group_restrictions(monkeypatch):
    monkeypatch.setenv("MTS_INSTANCE_EXPAND_MAX", "0")
    sc = load_scene_string("""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="shapegroup" id="g">
        <shape type="rectangle">
          <emitter type="area"><rgb name="radiance" value="1,1,1"/>
          </emitter>
        </shape>
      </shape>
      <shape type="instance"><ref id="g"/></shape>
    </scene>""")
    with pytest.raises(ValueError, match="instanced shapegroup"):
        pack_scene(sc)


def _rays_toward_instances(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    o = np.array([0.0, 1.5, -4.0], np.float32) + 0.2 * rng.standard_normal(
        (n, 3)
    ).astype(np.float32)
    tgt = np.stack(
        [
            rng.uniform(-1.8, 1.8, n),
            rng.uniform(0.0, 1.0, n),
            rng.uniform(-0.6, 0.8, n),
        ],
        -1,
    ).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_inst_pairs_matches_while_loop(monkeypatch):
    """The pair fast path (instances-as-clusters + per-group cluster
    tables, interpret mode) must agree with the exact skip-link
    traversal on both closest and any-hit."""
    import jax.numpy as jnp

    from mitsuba_tpu.accel.tlas import (
        inst_any,
        inst_any_pairs,
        inst_closest,
        inst_closest_pairs,
    )

    monkeypatch.setenv("MTS_INSTANCE_EXPAND_MAX", "0")
    pack = pack_scene(_scene())
    assert pack.meta["inst_pairs_ok"]
    o, d = _rays_toward_instances(512)
    r = o.shape[0]
    bt0 = jnp.full((r,), 1e30, jnp.float32)
    init = (
        bt0,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    ref = inst_closest(pack, o, d, *init)
    got = inst_closest_pairs(pack, o, d, *init, interpret=True)
    assert int(np.sum(np.asarray(ref[1]) >= 0)) > 50  # rays do hit
    for a, b, name in zip(ref, got, "t prim u v inst".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )
    occ_ref = np.asarray(inst_any(pack, o, d, 1e30))
    occ_got = np.asarray(inst_any_pairs(pack, o, d, 1e30,
                                        interpret=True))
    np.testing.assert_array_equal(occ_ref, occ_got)


def test_inst_pairs_overflow_fallback(monkeypatch):
    """With K_INST forced to 1, rays crossing several instance boxes
    overflow and must be completed exactly by the while-loop fallback."""
    import jax.numpy as jnp

    from mitsuba_tpu.accel import tlas

    monkeypatch.setenv("MTS_INSTANCE_EXPAND_MAX", "0")
    monkeypatch.setattr(tlas, "K_INST", 1)
    pack = pack_scene(_scene())
    # horizontal rays that sweep across all three instances
    n = 64
    ys = np.linspace(0.1, 0.8, n).astype(np.float32)
    o = np.stack([np.full(n, -3.0), ys, np.full(n, 0.1)], -1)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    r = o.shape[0]
    init = (
        jnp.full((r,), 1e30, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    ref = tlas.inst_closest(pack, o, d, *init)
    got = tlas.inst_closest_pairs(pack, o, d, *init, interpret=True)
    for a, b, name in zip(ref, got, "t prim u v inst".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )
