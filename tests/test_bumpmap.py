"""Bump/normal map evaluation (reference src/bsdfs/{bumpmap,normalmap}.cpp)
and the row-packed multi-grid heterogeneous media machinery."""

import numpy as np
import jax.numpy as jnp
import pytest


def _flat_rect_scene(bsdf_xml, emitter="constant"):
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    if emitter == "constant":
        em = '<emitter type="constant"><spectrum name="radiance" value="1"/></emitter>'
    else:
        # oblique directional light: first-bounce shading is n.l-sensitive
        em = ('<emitter type="directional">'
              '<vector name="direction" x="0.6" y="-0.5" z="-0.8"/>'
              '<spectrum name="irradiance" value="2"/></emitter>')
    return load_scene_string(f"""
<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="perspective">
    <transform name="toWorld">
      <lookat origin="0,0,4" target="0,0,0" up="0,1,0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="32"/>
    </film>
  </sensor>
  {em}
  <shape type="rectangle">{bsdf_xml}</shape>
</scene>""")


def test_flat_normalmap_is_identity():
    """A constant (0.5, 0.5, 1) normal map must not change the render."""
    from mitsuba_tpu.renderer import render

    plain = _flat_rect_scene('<bsdf type="diffuse"/>')
    mapped = _flat_rect_scene("""
      <bsdf type="normalmap">
        <texture type="checkerboard">
          <rgb name="color0" value="0.5,0.5,1"/>
          <rgb name="color1" value="0.5,0.5,1"/>
        </texture>
        <bsdf type="diffuse"/>
      </bsdf>""")
    a = render(plain, spp=16)
    b = render(mapped, spp=16)
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_tilted_normalmap_changes_shading():
    """A tilted normal map must visibly change the first-bounce shading
    and stay finite/energy-bounded."""
    from mitsuba_tpu.renderer import render

    plain = _flat_rect_scene('<bsdf type="diffuse"/>', emitter="directional")
    mapped = _flat_rect_scene("""
      <bsdf type="normalmap">
        <texture type="checkerboard">
          <rgb name="color0" value="0.9,0.5,0.6"/>
          <rgb name="color1" value="0.1,0.5,0.6"/>
        </texture>
        <bsdf type="diffuse"/>
      </bsdf>""", emitter="directional")
    a = render(plain, spp=32, seed=2)
    b = render(mapped, spp=32, seed=2)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # shading actually changed


def test_multiple_heterogeneous_media_pack(tmp_path):
    """Two heterogeneous media in one scene pack into disjoint grid
    slots and sample independently (round-1 limit was one per scene)."""
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string
    from mitsuba_tpu.medium import eval as med_eval
    from mitsuba_tpu.medium.plugins import save_vol

    g1 = np.full((4, 4, 4), 3.0, np.float32)
    g2 = np.zeros((8, 8, 8), np.float32)
    g2[2:6] = 10.0
    save_vol(tmp_path / "g1.vol", g1)
    save_vol(tmp_path / "g2.vol", g2)

    scene = load_scene_string(f"""
<scene version="0.5.0">
  <integrator type="volpath"/>
  <sensor type="perspective">
    <film type="hdrfilm">
      <integer name="width" value="8"/><integer name="height" value="8"/>
    </film>
  </sensor>
  <shape type="cube">
    <bsdf type="null"/>
    <medium name="interior" type="heterogeneous">
      <volume name="density" type="gridvolume">
        <string name="filename" value="{tmp_path}/g1.vol"/>
      </volume>
    </medium>
  </shape>
  <shape type="cube">
    <transform name="toWorld"><translate x="5"/></transform>
    <bsdf type="null"/>
    <medium name="interior" type="heterogeneous">
      <volume name="density" type="gridvolume">
        <string name="filename" value="{tmp_path}/g2.vol"/>
      </volume>
    </medium>
  </shape>
</scene>""")
    pack = pack_scene(scene)
    assert pack.meta["n_het"] == 2
    assert pack.het_dims.shape[0] == 2
    assert int(pack.het_cbase[1]) > 0

    # transmittance through each unit grid (ratio tracking, many lanes)
    R = 2048
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32), (R, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (R, 1))
    lane = jnp.arange(R, dtype=jnp.uint32)
    for mid, expect in ((0, np.exp(-3.0)), (1, np.exp(-10.0 * 0.5))):
        med = jnp.full((R,), mid, jnp.int32)
        tr = med_eval.transmittance(
            pack, med, o, d, jnp.full((R,), 3.0), lane, 0, 0, 0
        )
        got = float(tr.mean())
        assert abs(got - expect) < 0.12, (mid, got, expect)


def test_hgridvolume_loader(tmp_path):
    """hgridvolume dictionary + block .vol files flatten to one grid."""
    import struct
    from mitsuba_tpu.medium.plugins import save_vol
    from mitsuba_tpu.scene.registry import create
    from mitsuba_tpu.scene.properties import Properties

    # two blocks along x, 4^3 voxels each
    b0 = np.full((4, 4, 4), 1.0, np.float32)
    b1 = np.full((4, 4, 4), 2.0, np.float32)
    save_vol(tmp_path / "blk000_000_000.vol", b0)
    save_vol(tmp_path / "blk001_000_000.vol", b1)
    dic = tmp_path / "dict.hvol"
    with open(dic, "wb") as f:
        f.write(struct.pack("<6f", 0, 0, 0, 2, 1, 1))
        f.write(struct.pack("<3i", 2, 1, 1))
        f.write(struct.pack("<3i", 0, 0, 0))
        f.write(struct.pack("<3i", 1, 0, 0))
    props = Properties("hgridvolume")
    props.set("filename", str(dic))
    props.set("prefix", "blk")
    props.set("postfix", ".vol")
    vol = create("volume", "hgridvolume", props)
    g = vol.record.grid
    assert g.shape == (4, 4, 8)
    assert np.allclose(g[:, :, :4], 1.0)
    assert np.allclose(g[:, :, 4:], 2.0)
    assert np.allclose(vol.record.aabb_max, [2, 1, 1])
