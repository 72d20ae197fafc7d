"""COLLADA importer tests (reference src/converter/collada.cpp).

A small hand-written .dae document (Z-up, polylist quad + triangles
cube, node transforms, lambert/phong materials, perspective camera,
point light) is converted by mtsimport and then loaded + rendered
through the normal pipeline.
"""

import os

import numpy as np
import pytest

import mitsuba_tpu
from mitsuba_tpu.mtsimport import import_dae

_DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis><unit meter="0.01"/></asset>
  <library_effects>
    <effect id="fx-red">
      <profile_COMMON><technique sid="common">
        <lambert><diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert>
      </technique></profile_COMMON>
    </effect>
    <effect id="fx-shiny">
      <profile_COMMON><technique sid="common">
        <phong>
          <diffuse><color>0.2 0.4 0.2 1</color></diffuse>
          <specular><color>0.6 0.6 0.6 1</color></specular>
          <shininess><float>40</float></shininess>
        </phong>
      </technique></profile_COMMON>
    </effect>
  </library_effects>
  <library_materials>
    <material id="mat-red" name="red">
      <instance_effect url="#fx-red"/></material>
    <material id="mat-shiny" name="shiny">
      <instance_effect url="#fx-shiny"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad" name="quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="qp" count="12">
            -100 -100 0  100 -100 0  100 100 0  -100 100 0
          </float_array>
          <technique_common>
            <accessor source="#qp" count="4" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="quad-vtx">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        <polylist material="m0" count="1">
          <input semantic="VERTEX" source="#quad-vtx" offset="0"/>
          <vcount>4</vcount>
          <p>0 1 2 3</p>
        </polylist>
      </mesh>
    </geometry>
    <geometry id="tri" name="tri">
      <mesh>
        <source id="tri-pos">
          <float_array id="tp" count="9">-30 0 0  30 0 0  0 0 60</float_array>
          <technique_common>
            <accessor source="#tp" count="3" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="tri-nrm">
          <float_array id="tn" count="9">0 -1 0  0 -1 0  0 -1 0</float_array>
          <technique_common>
            <accessor source="#tn" count="3" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="tri-vtx">
          <input semantic="POSITION" source="#tri-pos"/>
        </vertices>
        <triangles material="m1" count="1">
          <input semantic="VERTEX" source="#tri-vtx" offset="0"/>
          <input semantic="NORMAL" source="#tri-nrm" offset="1"/>
          <p>0 0 1 1 2 2</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_cameras>
    <camera id="cam">
      <optics><technique_common><perspective>
        <yfov>40</yfov><aspect_ratio>1.0</aspect_ratio>
        <znear>0.1</znear><zfar>1000</zfar>
      </perspective></technique_common></optics>
    </camera>
  </library_cameras>
  <library_lights>
    <light id="sun">
      <technique_common><point>
        <color>800 780 760</color>
      </point></technique_common>
    </light>
  </library_lights>
  <library_visual_scenes>
    <visual_scene id="vscene">
      <node id="floor"><instance_geometry url="#quad">
        <bind_material><technique_common>
          <instance_material symbol="m0" target="#mat-red"/>
        </technique_common></bind_material>
      </instance_geometry></node>
      <node id="wedge">
        <translate>0 50 0</translate>
        <rotate>0 0 1 30</rotate>
        <instance_geometry url="#tri">
          <bind_material><technique_common>
            <instance_material symbol="m1" target="#mat-shiny"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
      <node id="camnode">
        <matrix>1 0 0 0  0 0 -1 -300  0 1 0 120  0 0 0 1</matrix>
        <instance_camera url="#cam"/>
      </node>
      <node id="lamp">
        <translate>0 -100 250</translate>
        <instance_light url="#sun"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vscene"/></scene>
</COLLADA>
"""


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    d = tmp_path_factory.mktemp("dae")
    src = os.path.join(d, "test.dae")
    with open(src, "w") as f:
        f.write(_DAE)
    out = os.path.join(d, "out")
    return import_dae(src, out)


def test_dae_geometry_and_transforms(imported):
    scene = mitsuba_tpu.load_scene(imported)
    from mitsuba_tpu.scene.builder import pack_scene

    pack = pack_scene(scene)
    # quad (2 tris) + wedge (1 tri)
    assert pack.meta["n_tris"] == 3
    tri = np.asarray(pack.tri_v0)
    # unit meter=0.01: the 200x200 Z-up quad becomes 2x2 in the XZ
    # plane (y up) — its corners live at |x|,|z| = 1, y = 0
    ymin = float(np.asarray(pack.tri_v0)[:, 1].min())
    assert abs(ymin) < 1e-5, ymin
    assert np.isfinite(tri).all()


def test_dae_materials_mapped(imported):
    with open(imported) as f:
        xml = f.read()
    assert 'type="diffuse"' in xml and "0.8, 0.1, 0.1" in xml
    assert 'type="phong"' in xml and 'value="40.0"' in xml
    assert 'type="point"' in xml  # the light came through


def test_dae_render_runs(imported):
    scene = mitsuba_tpu.load_scene(imported)
    scene.sensor.record.film.width = 32
    scene.sensor.record.film.height = 32
    img = mitsuba_tpu.render(scene, spp=8, seed=1)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # the point light illuminates the red floor: image is non-black
    # and red-dominant on lit pixels
    assert img.max() > 1e-3
