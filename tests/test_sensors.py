"""Sensor model correctness: telecentric and perspective_rdist were
registered-but-fake in round 2 (VERDICT weak #5) — these tests pin the
real projections (reference src/sensors/{telecentric,
perspective_rdist}.cpp)."""

import numpy as np

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene(sensor_xml, spp=8):
    return load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="field">
        <string name="field" value="albedo"/>
      </integrator>
      {sensor_xml}
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="3"/>
        </transform>
        <bsdf type="diffuse">
          <texture name="reflectance" type="checkerboard">
            <rgb name="color0" value="1, 1, 1"/>
            <rgb name="color1" value="0, 0, 0"/>
            <float name="uscale" value="6"/>
            <float name="vscale" value="6"/>
          </texture>
        </bsdf>
      </shape>
    </scene>"""
    )


def _sensor(kind, extra="", fov=True):
    fov_xml = '<float name="fov" value="45"/>' if fov else ""
    return f"""
      <sensor type="{kind}">
        {fov_xml}
        <transform name="toWorld">
          <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
        </transform>
        {extra}
        <sampler type="independent">
          <integer name="sampleCount" value="8"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="48"/>
          <integer name="height" value="48"/>
          <rfilter type="box"/>
        </film>
      </sensor>"""


def test_telecentric_zero_aperture_is_orthographic():
    img_t = render(_scene(_sensor("telecentric", fov=False)), spp=8)
    img_o = render(_scene(_sensor("orthographic", fov=False)), spp=8)
    assert np.allclose(img_t, img_o, atol=1e-5), (
        np.abs(img_t - img_o).max()
    )


def test_telecentric_aperture_blurs_defocus():
    """With a finite aperture and near focus, the far checkerboard
    blurs: pixel values leave {0,1} across checker edges."""
    sharp = render(_scene(_sensor("telecentric", fov=False)), spp=64)
    blurred = render(
        _scene(_sensor(
            "telecentric",
            extra="""<float name="apertureRadius" value="0.4"/>
                     <float name="focusDistance" value="0.5"/>""",
            fov=False,
        )),
        spp=64,
    )
    # fraction of clearly-mixed pixels (between the checker colors)
    def mixed_frac(img):
        g = img.mean(axis=-1)
        return np.mean((g > 0.15) & (g < 0.85))

    assert mixed_frac(blurred) > mixed_frac(sharp) + 0.2, (
        mixed_frac(sharp), mixed_frac(blurred)
    )


def test_rdist_zero_kc_matches_perspective():
    img_r = render(
        _scene(_sensor("perspective_rdist",
                       extra='<string name="kc" value="0, 0"/>')),
        spp=8,
    )
    img_p = render(_scene(_sensor("perspective")), spp=8)
    assert np.allclose(img_r, img_p, atol=1e-5)


def test_rdist_distorts_off_axis():
    """Barrel distortion moves off-axis samples; the image center is
    unchanged, the periphery shifts."""
    img_r = render(
        _scene(_sensor("perspective_rdist",
                       extra='<string name="kc" value="-0.3, 0"/>')),
        spp=32,
    )
    img_p = render(_scene(_sensor("perspective")), spp=32)
    h, w = img_p.shape[:2]
    c = h // 2
    # center pixels agree
    assert np.allclose(img_r[c - 1:c + 2, c - 1:c + 2],
                       img_p[c - 1:c + 2, c - 1:c + 2], atol=0.05)
    # the outer ring differs substantially (checker pattern shifted)
    border = np.abs(img_r[4] - img_p[4]).mean()
    assert border > 0.02, border


# ---------------------------------------------------------------------------
# measurement meters (reference src/sensors/{fluencemeter,
# irradiancemeter}.cpp) — constant-environment closures are exact
# (zero-variance estimators), so these pin the radiometry analytically
# ---------------------------------------------------------------------------

def _meter_scene(body, spp=64):
    return load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
      {body}
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
    </scene>"""
    )


_METER_FILM = """
        <sampler type="independent">
          <integer name="sampleCount" value="64"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="1"/>
          <integer name="height" value="1"/>
          <rfilter type="box"/>
        </film>
"""


def test_fluencemeter_constant_env():
    """Average radiance through a free point in a unit constant
    environment is exactly 1."""
    scene = _meter_scene(
        f"""
      <sensor type="fluencemeter">
        <transform name="toWorld"><translate x="0.3" y="0" z="0"/></transform>
        {_METER_FILM}
      </sensor>
    """
    )
    img = render(scene, seed=3)
    np.testing.assert_allclose(np.asarray(img), 1.0, rtol=1e-5)


def test_irradiancemeter_sphere():
    """Irradiance over a convex sphere in a unit constant environment
    is exactly pi (every cosine-hemisphere ray escapes)."""
    scene = _meter_scene(
        f"""
      <shape type="sphere">
        <float name="radius" value="0.7"/>
        <bsdf type="diffuse"/>
        <sensor type="irradiancemeter">
          {_METER_FILM}
        </sensor>
      </shape>
    """
    )
    img = render(scene, seed=3)
    np.testing.assert_allclose(np.asarray(img), np.pi, rtol=1e-3)


def test_irradiancemeter_mesh():
    """Mesh parent (rectangle): the area-CDF position sampling path;
    same closed environment gives exactly pi."""
    scene = _meter_scene(
        f"""
      <shape type="rectangle">
        <bsdf type="diffuse"/>
        <sensor type="irradiancemeter">
          {_METER_FILM}
        </sensor>
      </shape>
    """
    )
    img = render(scene, seed=5)
    np.testing.assert_allclose(np.asarray(img), np.pi, rtol=1e-3)


def test_irradiancemeter_requires_shape():
    import pytest

    with pytest.raises(ValueError):
        scene = _meter_scene(
            f"""
          <sensor type="irradiancemeter">
            {_METER_FILM}
          </sensor>
        """
        )
        render(scene, seed=1)
