"""Motion blur: animated rigid transforms + shutter time sampling
(reference include/mitsuba/core/track.h:335-402 AnimatedTransform +
sensor shutter, sensor.h:275-281).  A translating emissive card's blur
streak must match the analytic per-pixel coverage."""

import numpy as np

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene(spp=64):
    # emissive card sweeping symmetrically x in [-0.75, +0.75] over the
    # shutter; orthographic camera, black background
    return load_scene_string(f"""
    <scene version="0.5.0">
      <integrator type="path">
        <integer name="maxDepth" value="2"/>
      </integrator>
      <sensor type="orthographic">
        <transform name="toWorld">
          <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
        </transform>
        <float name="shutterOpen" value="0"/>
        <float name="shutterClose" value="1"/>
        <sampler type="independent">
          <integer name="sampleCount" value="{spp}"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="64"/>
          <integer name="height" value="64"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <animation name="toWorld">
          <transform time="0">
            <scale x="0.25" y="0.6" z="1"/>
            <rotate y="1" angle="180"/>
            <translate x="-0.75"/>
          </transform>
          <transform time="1">
            <scale x="0.25" y="0.6" z="1"/>
            <rotate y="1" angle="180"/>
            <translate x="0.75"/>
          </transform>
        </animation>
        <emitter type="area">
          <rgb name="radiance" value="1, 1, 1"/>
        </emitter>
      </shape>
    </scene>""")


def test_animated_pack_partitions():
    pack = pack_scene(_scene())
    assert pack.meta.get("anim_ranges")
    (first, count), = pack.meta["anim_ranges"]
    assert count == 2  # the rectangle's two triangles
    assert pack.meta["n_static_tris"] == first


def test_motion_blur_coverage_matches_analytic():
    """Pixel brightness = Le * (fraction of shutter the moving card
    covers it).  Card x-extent [-0.25+1.5t, 0.25+1.5t]: a point at x
    is covered for duration min((x+0.25)/1.5, 1) - max((x-0.25)/1.5, 0)
    clamped to [0, 1]."""
    img = render(_scene(spp=256), spp=256)
    h, w = img.shape[:2]
    row = img[h // 2].mean(axis=-1)  # y=0 row
    # ortho extent [-1,1]; screen-x sign is orientation-dependent but
    # the sweep is symmetric about x=0, so |x| suffices
    xs = np.abs(1.0 - 2.0 * (np.arange(w) + 0.5) / w)

    def coverage(x):
        # card center c(t) = -0.75 + 1.5 t; covered while |x - c| < 0.25
        lo = np.maximum((x - 0.25 + 0.75) / 1.5, 0.0)
        hi = np.minimum((x + 0.25 + 0.75) / 1.5, 1.0)
        return np.clip(hi - lo, 0.0, 1.0)

    expect = coverage(xs)
    sel = expect > 0.02
    err = np.abs(row - expect)
    assert err[sel].max() < 0.12, (
        float(err[sel].max()),
        row[sel][:5], expect[sel][:5],
    )
    # total energy matches the analytic integral
    assert abs(row.sum() - expect.sum()) / expect.sum() < 0.03


def test_static_scene_unaffected():
    """Scenes without animation produce no anim ranges and keep the
    static intersection paths."""
    sc = load_scene_string("""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="sphere"><bsdf type="diffuse"/></shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>""")
    pack = pack_scene(sc)
    assert pack.meta["anim_ranges"] == ()
    assert pack.meta["n_static_tris"] == pack.meta["n_tris"]


def _motion_scene(config, with_glass):
    glass = """
      <shape type="cube">
        <transform name="toWorld">
          <scale x="1.5" y="1.5" z="0.02"/>
        </transform>
        <bsdf type="dielectric"/>
      </shape>""" if with_glass else ""
    return load_scene_string(f"""
    <scene version="0.5.0">
      <integrator type="motion">
        <float name="time" value="1.0"/>
        <string name="config" value="{config}"/>
      </integrator>
      <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
          <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="1"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="32"/>
          <integer name="height" value="32"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      {glass}
      <shape type="rectangle">
        <animation name="toWorld">
          <transform time="0">
            <rotate y="1" angle="180"/>
            <translate z="1"/>
          </transform>
          <transform time="1">
            <rotate y="1" angle="180"/>
            <translate x="0.5" z="1"/>
          </transform>
        </animation>
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
    </scene>""")


def test_motion_config_chain_through_glass():
    """config 'ttd': motion of a translating card seen THROUGH a thin
    glass slab (reference motion.cpp chain configs).  For a very thin
    plate the refraction offset vanishes, so the chain-solved motion
    of the glass vertex must match the slab-free config 'd' motion of
    the card scaled by the depth ratio of the two vertices (a
    perspective pencil through the origin: lateral shift is
    proportional to distance from the camera)."""
    ref = render(_motion_scene("d", with_glass=False), spp=1, seed=0)
    img = render(_motion_scene("ttd", with_glass=True), spp=1, seed=0)
    # central window: rays that pass through slab AND hit the card
    cr, cw = ref[12:20, 12:20], img[12:20, 12:20]
    med_d = np.median(cr[..., 0])
    assert abs(med_d) > 2.0, med_d  # the card visibly moves
    ok = np.abs(cw[..., 0]) > 1e-6  # solved lanes only
    assert ok.mean() > 0.6, ok.mean()
    # a pinhole pencil rotates as one: the projected (angular) motion
    # of the glass vertex equals the projected motion of the card the
    # pencil tracks, so config 'ttd' must match config 'd' up to the
    # (negligible) thin-plate refraction offset
    np.testing.assert_allclose(
        np.median(cw[..., 0][ok]), med_d, rtol=0.08
    )
    assert abs(np.median(cw[..., 1][ok])) < 0.5
