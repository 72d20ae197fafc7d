"""Emission-side sampling of every emitter kind: ptracer (particle
tracing) against the path tracer, and the collimated beam (reference
src/emitters/collimated.cpp — direct sampling always fails, so only
light-transporting integrators see it) cross-checked ptracer vs bdpt."""

import numpy as np
import pytest

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene(emitter_xml, integrator, spp, max_depth=4):
    return load_scene_string(f"""
    <scene version="0.5.0">
      <integrator type="{integrator}">
        <integer name="maxDepth" value="{max_depth}"/>
        <integer name="rrDepth" value="100"/>
      </integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0,1.2,-3" target="0,0.3,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="{spp}"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="24"/>
          <integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="-90"/>
          <scale value="3"/>
        </transform>
        <bsdf type="diffuse">
          <rgb name="reflectance" value="0.6, 0.5, 0.4"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="3"/>
          <translate z="2.5"/>
        </transform>
        <bsdf type="diffuse">
          <rgb name="reflectance" value="0.4, 0.5, 0.6"/>
        </bsdf>
      </shape>
      {emitter_xml}
    </scene>""")


@pytest.mark.parametrize(
    "emitter_xml",
    [
        """<emitter type="spot">
             <transform name="toWorld">
               <lookat origin="0,2.5,-1" target="0,0,0" up="0,0,1"/>
             </transform>
             <float name="cutoffAngle" value="40"/>
             <float name="beamWidth" value="25"/>
             <rgb name="intensity" value="8, 8, 8"/>
           </emitter>""",
        """<emitter type="directional">
             <vector name="direction" x="0.3" y="-1" z="0.4"/>
             <rgb name="irradiance" value="2, 2, 2"/>
           </emitter>""",
        """<emitter type="constant">
             <rgb name="radiance" value="0.5, 0.6, 0.7"/>
           </emitter>""",
    ],
    ids=["spot", "directional", "constant"],
)
def test_ptracer_emission_matches_path(emitter_xml):
    """Particle tracing emits from spot/directional/constant emitters
    (reference spot.cpp sampleRay uniform-cone x falloff;
    directional.cpp + constant.cpp bounding-sphere disk origins) and
    agrees with the path tracer in the mean."""
    ref = render(_scene(emitter_xml, "path", 128), spp=128)
    img = render(_scene(emitter_xml, "ptracer", 256), spp=256, seed=3)
    ratio = img.mean(axis=(0, 1)) / ref.mean(axis=(0, 1))
    assert np.all(np.abs(ratio - 1.0) < 0.12), ratio


def test_collimated_ptracer_vs_bdpt():
    """The collimated beam renders identically (in the mean) through
    two independent light-transport implementations."""
    beam = """<emitter type="collimated">
        <transform name="toWorld">
          <lookat origin="0.3,2,0.3" target="0.3,0,0.3" up="1,0,0"/>
        </transform>
        <rgb name="power" value="5, 4, 3"/>
      </emitter>"""
    a = render(_scene(beam, "ptracer", 512), spp=512, seed=1)
    b = render(_scene(beam, "bdpt", 128), spp=128, seed=2)
    assert a.mean() > 1e-4  # the beam actually illuminates the scene
    ratio = b.mean(axis=(0, 1)) / a.mean(axis=(0, 1))
    assert np.all(np.abs(ratio - 1.0) < 0.15), ratio
    # the bright spot sits where the beam hits the floor in both
    pa = np.unravel_index(np.argmax(a.mean(-1)), a.shape[:2])
    pb = np.unravel_index(np.argmax(b.mean(-1)), b.shape[:2])
    assert abs(pa[0] - pb[0]) <= 2 and abs(pa[1] - pb[1]) <= 2, (pa, pb)


def test_collimated_invisible_to_path_tracer():
    """Unidirectional path tracing cannot sample a 0-D response
    (reference collimated.cpp sampleDirect pdf=0): the render is black,
    not an error."""
    beam = """<emitter type="collimated">
        <transform name="toWorld">
          <lookat origin="0,2,0" target="0,0,0" up="1,0,0"/>
        </transform>
        <rgb name="power" value="5, 5, 5"/>
      </emitter>"""
    img = render(_scene(beam, "path", 16), spp=16)
    assert np.isfinite(img).all()
    assert img.max() < 1e-6
