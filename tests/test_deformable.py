"""Deformable (per-vertex keyframe) shapes + the motion-vector
integrator (reference src/shapes/deformable.cpp 4D kd-tree ->
per-segment lerped brute force; src/integrators/misc/motion.cpp)."""

import numpy as np

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _deform_scene(spp=64):
    # emissive card whose VERTICES sweep x in [-0.75, +0.75] over the
    # shutter (same analytic setup as tests/test_motion.py but through
    # the deformable path instead of a rigid transform)
    def card(x):
        return f"""
        <shape type="rectangle">
          <transform name="toWorld">
            <scale x="0.25" y="0.6" z="1"/>
            <rotate y="1" angle="180"/>
            <translate x="{x}"/>
          </transform>
        </shape>"""

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
      <shape type="deformable">
        <string name="times" value="0, 1"/>
        {card(-0.75)}
        {card(0.75)}
        <emitter type="area">
          <rgb name="radiance" value="1, 1, 1"/>
        </emitter>
      </shape>
    </scene>""")


def test_deformable_pack():
    pack = pack_scene(_deform_scene())
    assert len(pack.meta["deform_ranges"]) == 1
    first, count, times = pack.meta["deform_ranges"][0]
    assert count == 2 and times == (0.0, 1.0)
    assert pack.meta["n_static_tris"] == first
    assert pack.arrays["deform_tri9_0"].shape == (2, 2, 9)


def test_deformable_blur_matches_analytic():
    """Same analytic shutter-coverage check as the rigid motion test:
    brightness = fraction of the shutter the lerped card covers."""
    img = render(_deform_scene(spp=256), spp=256)
    h, w = img.shape[:2]
    row = img[h // 2].mean(axis=-1)
    xs = np.abs(1.0 - 2.0 * (np.arange(w) + 0.5) / w)

    def coverage(x):
        lo = np.maximum((x - 0.25 + 0.75) / 1.5, 0.0)
        hi = np.minimum((x + 0.25 + 0.75) / 1.5, 1.0)
        return np.clip(hi - lo, 0.0, 1.0)

    expect = coverage(xs)
    sel = expect > 0.02
    err = np.abs(row - expect)
    assert err[sel].max() < 0.12, float(err[sel].max())
    assert abs(row.sum() - expect.sum()) / expect.sum() < 0.03


def _deform_scene3(spp=64):
    """Three keyframes on the same straight sweep: times 0/0.5/1 at
    x = -0.75/0/+0.75 — the motion is identical to the 2-keyframe
    scene, so the analytic coverage is unchanged, but intersection
    goes through the multi-segment (one-hot keyframe-pair) path."""
    def card(x):
        return f"""
        <shape type="rectangle">
          <transform name="toWorld">
            <scale x="0.25" y="0.6" z="1"/>
            <rotate y="1" angle="180"/>
            <translate x="{x}"/>
          </transform>
        </shape>"""

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
      <shape type="deformable">
        <string name="times" value="0, 0.5, 1"/>
        {card(-0.75)}
        {card(0.0)}
        {card(0.75)}
        <emitter type="area">
          <rgb name="radiance" value="1, 1, 1"/>
        </emitter>
      </shape>
    </scene>""")


def test_deformable_multisegment_matches_analytic():
    """K=3 keyframes (two segments) through the one-hot per-lane
    segment selection must reproduce the same analytic blur as the
    2-keyframe linear sweep."""
    img = render(_deform_scene3(spp=256), spp=256)
    h, w = img.shape[:2]
    row = img[h // 2].mean(axis=-1)
    xs = np.abs(1.0 - 2.0 * (np.arange(w) + 0.5) / w)

    def coverage(x):
        lo = np.maximum((x - 0.25 + 0.75) / 1.5, 0.0)
        hi = np.minimum((x + 0.25 + 0.75) / 1.5, 1.0)
        return np.clip(hi - lo, 0.0, 1.0)

    expect = coverage(xs)
    sel = expect > 0.02
    err = np.abs(row - expect)
    assert err[sel].max() < 0.12, float(err[sel].max())
    assert abs(row.sum() - expect.sum()) / expect.sum() < 0.03


def test_deformable_segment_selection_unit():
    """intersect() at explicit per-lane times: a lane only hits the
    card where ITS OWN segment's lerp puts it."""
    from mitsuba_tpu.accel.intersect import intersect

    pack = pack_scene(_deform_scene3())
    times = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    x_card = -0.75 + 1.5 * times  # linear sweep
    # one ray per time aimed at the card's CURRENT center, one aimed
    # at its t=0 position (should miss for t>0.33)
    o_hit = np.stack([x_card, np.zeros(5), np.full(5, -3.0)], -1)
    o_miss = np.stack([np.full(5, -0.75), np.zeros(5),
                       np.full(5, -3.0)], -1)
    o = np.concatenate([o_hit, o_miss]).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (10, 1))
    tt = np.concatenate([times, times]).astype(np.float32)
    hit = intersect(pack, o, d, time=tt)
    t = np.asarray(hit.t)
    assert np.all(np.isfinite(t[:5])), t[:5]
    np.testing.assert_allclose(t[:5], 3.0, atol=1e-3)
    # the stale-position rays only hit while the card still overlaps
    overlap = np.abs(-0.75 - x_card) < 0.25
    np.testing.assert_array_equal(np.isfinite(t[5:]), overlap)


def _motion_scene(kind):
    # rigid keyframe translation of a card by +1.5 world units in x
    return load_scene_string(f"""
    <scene version="0.5.0">
      <integrator type="{kind}"/>
      <sensor type="orthographic">
        <transform name="toWorld">
          <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="64"/>
          <integer name="height" value="64"/>
          <rfilter type="box"/></film>
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
        <bsdf type="diffuse"/>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="3"/>
          <translate z="1"/>
        </transform>
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>""")


def test_motion_integrator_vectors():
    """Moving-card pixels report its screen-space displacement; the
    static backdrop reports ~zero.  Ortho camera: world dx=1.5 over a
    [-1,1] extent = 48 pixels at 64 wide (sign depends on screen-x
    orientation, so check magnitude)."""
    img = render(_motion_scene("motion"), spp=4)
    mag = np.abs(img[..., 0])
    # card at t=0 sits at |sx| in the left or right band; find moving
    # pixels as those with large dx
    moving = mag > 10.0
    assert moving.sum() > 50, moving.sum()
    assert np.allclose(img[..., 1][moving], 0.0, atol=1.5)  # pure x
    expect = 1.5 / 2.0 * 64  # world dx / ortho extent * pixels
    got = np.median(mag[moving])
    assert abs(got - expect) < 3.0, (got, expect)
    # static background: zero motion
    static = ~moving & (mag >= 0)
    assert np.median(mag[static]) < 0.5
