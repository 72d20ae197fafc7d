"""Geometry-driven textures: vertexcolors / wireframe / curvature
(reference src/textures/{vertexcolors,wireframe,curvature}.cpp) —
validated through the `field` integrator's albedo AOV, which returns
the evaluated reflectance texture directly."""

import os

import numpy as np
import pytest

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.xml_loader import load_scene_string

SENSOR = """
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="toWorld">
      <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
    </transform>
    <sampler type="independent">
      <integer name="sampleCount" value="4"/>
    </sampler>
    <film type="hdrfilm">
      <integer name="width" value="33"/>
      <integer name="height" value="33"/>
      <rfilter type="box"/>
    </film>
  </sensor>
"""


def _ply_quad(path):
    """Unit quad in the z=0 plane with RGB corner colors."""
    txt = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar int vertex_indices
end_header
-1 -1 0 255 0 0
1 -1 0 0 255 0
1 1 0 0 0 255
-1 1 0 255 255 255
3 0 1 2
3 0 2 3
"""
    with open(path, "w") as f:
        f.write(txt)


def test_vertexcolors_interpolates(tmp_path):
    ply = str(tmp_path / "quad.ply")
    _ply_quad(ply)
    scene = load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="field">
        <string name="field" value="albedo"/>
      </integrator>
      {SENSOR}
      <shape type="ply">
        <string name="filename" value="{ply}"/>
        <bsdf type="diffuse">
          <texture name="reflectance" type="vertexcolors"/>
        </bsdf>
      </shape>
    </scene>"""
    )
    img = render(scene, spp=4)
    h, w = img.shape[:2]
    c, off = h // 2, 9  # quadrant samples inside the quad
    quads = [img[c - off, c - off], img[c - off, c + off],
             img[c + off, c - off], img[c + off, c + off]]
    # each pure corner color dominates one image quadrant
    argmaxes = {int(np.argmax(q)) for q in quads if q.max() > 0.3}
    assert argmaxes == {0, 1, 2}, quads
    # one quadrant is near-white (all channels high)
    assert any(q.min() > 0.4 for q in quads), quads
    # center: non-trivially interpolated mix
    center = img[c, c]
    assert 0.1 < center.mean() < 0.9, center


def test_wireframe_edges(tmp_path):
    ply = str(tmp_path / "quad.ply")
    _ply_quad(ply)
    scene = load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="field">
        <string name="field" value="albedo"/>
      </integrator>
      {SENSOR}
      <shape type="ply">
        <string name="filename" value="{ply}"/>
        <bsdf type="diffuse">
          <texture name="reflectance" type="wireframe">
            <rgb name="interiorColor" value="0.9, 0.9, 0.9"/>
            <rgb name="edgeColor" value="0.0, 0.0, 0.0"/>
            <float name="lineWidth" value="0.08"/>
          </texture>
        </bsdf>
      </shape>
    </scene>"""
    )
    img = render(scene, spp=4)
    h, w = img.shape[:2]
    # the quad's shared diagonal runs corner to corner -> dark pixels
    diag = img[h // 2, w // 2]
    interior = img[h // 2, w // 4]
    assert diag.mean() < 0.3, diag  # on the diagonal edge
    assert interior.mean() > 0.7, interior


def test_curvature_sphere_positive_mean(tmp_path):
    # tessellated sphere as OBJ: mean curvature 1/r > 0 -> red channel
    from mitsuba_tpu.scene.shapes import _uv_sphere

    mesh = _uv_sphere(24, 12)
    obj = str(tmp_path / "sphere.obj")
    with open(obj, "w") as f:
        for p in mesh.positions:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for tri in mesh.indices:
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    scene = load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="field">
        <string name="field" value="albedo"/>
      </integrator>
      {SENSOR}
      <shape type="obj">
        <string name="filename" value="{obj}"/>
        <bsdf type="diffuse">
          <texture name="reflectance" type="curvature">
            <string name="curvature" value="mean"/>
            <float name="scale" value="0.5"/>
          </texture>
        </bsdf>
      </shape>
    </scene>"""
    )
    img = render(scene, spp=4)
    h, w = img.shape[:2]
    c = img[h // 2, w // 2]
    # unit sphere: H = 1 -> scaled 0.5 -> red 0.5, no blue
    assert 0.3 < c[0] < 0.7, c
    assert c[2] < 0.05, c
