"""Texture evaluation: mip pyramid + trilinear filtering
(reference include/mitsuba/render/mipmap.h:56-162).
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp


def _checker_png(path, n=64):
    from mitsuba_tpu.io.images import write_image

    yy, xx = np.mgrid[0:n, 0:n]
    img = (((xx // 2) + (yy // 2)) % 2).astype(np.float32)
    write_image(path, np.repeat(img[..., None], 3, axis=-1))
    return img


def _bitmap_scene_pack(tex_path):
    from mitsuba_tpu.scene.xml_loader import load_scene_string
    from mitsuba_tpu.scene.builder import pack_scene

    scene = load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <sampler type="independent"/>
        <film type="hdrfilm">
          <integer name="width" value="32"/>
          <integer name="height" value="32"/>
        </film>
      </sensor>
      <shape type="cube">
        <bsdf type="diffuse">
          <texture name="reflectance" type="bitmap">
            <string name="filename" value="{tex_path}"/>
            <boolean name="gamma" value="false"/>
          </texture>
        </bsdf>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
    </scene>""",
        base_dir=os.path.dirname(tex_path),
    )
    return pack_scene(scene)


def test_mip_pyramid_packed_and_trilinear_converges_to_mean():
    from mitsuba_tpu.scene.texture_eval import eval_texture

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "checker.png")
        img = _checker_png(p)
        pack = _bitmap_scene_pack(p)

        n_lev = np.asarray(pack.tex_n_lev)
        tid_row = int(np.argmax(n_lev))
        assert n_lev[tid_row] == 7  # 64 -> 1

        n = 512
        tid = jnp.full((n,), tid_row, jnp.int32)
        uv = jnp.stack(
            [jnp.linspace(0.01, 0.99, n), jnp.linspace(0.02, 0.97, n)], -1
        )
        default = jnp.zeros((n, 3), jnp.float32)

        # sharp lookup reproduces the checker extremes
        sharp = np.asarray(eval_texture(pack, tid, uv, default))
        assert sharp.min() < 0.15 and sharp.max() > 0.85

        # huge footprint -> coarsest mip == image mean
        fp = jnp.full((n,), 64.0)
        coarse = np.asarray(eval_texture(pack, tid, uv, default, fp))
        assert np.abs(coarse - img.mean()).max() < 0.02

        # mid footprint sits between the two
        fp = jnp.full((n,), 8.0 / 64.0)  # 8-texel footprint
        mid = np.asarray(eval_texture(pack, tid, uv, default, fp))
        assert mid.std() < sharp.std()

def test_anisotropic_probes_average_major_axis():
    """eval_texture with an anisotropic footprint must average the
    texture along the ellipse's MAJOR axis (the reference's EWA role,
    mipmap.h evalEWA) while keeping minor-axis sharpness: for stripes
    running across the major axis the probes return the stripe mean,
    where isotropic minor-LOD filtering aliases to the point sample."""
    import numpy as np
    import jax.numpy as jnp
    import tempfile, os as _os

    from mitsuba_tpu.io.images import write_image
    from mitsuba_tpu.scene import texture_eval
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    # horizontal stripes: value depends on v only, 8-texel period
    img = np.zeros((256, 256, 3), np.float32)
    img[(np.arange(256) // 4) % 2 == 0, :] = 1.0
    p = _os.path.join(tempfile.mkdtemp(), "hstripes.png")
    write_image(p, img)
    scene = load_scene_string(f"""
    <scene version="0.5.0"><integrator type="direct"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/></film></sensor>
      <shape type="rectangle">
        <bsdf type="diffuse">
          <texture name="reflectance" type="bitmap">
            <string name="filename" value="{p}"/>
          </texture>
        </bsdf></shape>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
    </scene>""")
    pack = pack_scene(scene)
    assert pack.meta.get("has_mips", False)

    n = 64
    tid = jnp.zeros((n,), jnp.int32)
    # centers spread along v so stripe phases vary
    uv = jnp.stack(
        [jnp.full((n,), 0.5), jnp.linspace(0.2, 0.8, n)], axis=-1
    )
    default = jnp.zeros((n, 3), jnp.float32)
    # ellipse: tiny minor along u, major spanning 32 texels along v
    minor = jnp.tile(jnp.asarray([[1.0 / 256.0, 0.0]], jnp.float32), (n, 1))
    major = jnp.tile(jnp.asarray([[0.0, 32.0 / 256.0]], jnp.float32), (n, 1))

    out_a = np.asarray(
        texture_eval.eval_texture(pack, tid, uv, default, fp=(minor, major))
    )[:, 0]
    # isotropic reference: scalar minor-sized footprint (sharp point)
    out_i = np.asarray(
        texture_eval.eval_texture(pack, tid, uv, default, fp=1.0 / 256.0)
    )[:, 0]

    # analytic mean of the stripe function over the major span (the
    # probes are a 4-point midpoint rule; 32 texels = 4 full periods,
    # so the mean is ~0.5 everywhere)
    assert np.abs(out_a - 0.5).max() < 0.13, out_a
    # the isotropic point samples swing across the full stripe range
    assert out_i.max() > 0.85 and out_i.min() < 0.15


def test_ewa_filter_matches_feline_on_stripes(monkeypatch):
    """MTS_TEX_FILTER=ewa (true elliptical weighted averaging,
    reference mipmap.h:296-420): on the stripe ellipse the Gaussian
    texel loop must reproduce the stripe mean like the probe filter,
    and stay finite/normalized everywhere."""
    import numpy as np
    import jax.numpy as jnp
    import tempfile, os as _os

    from mitsuba_tpu.io.images import write_image
    from mitsuba_tpu.scene import texture_eval
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    img = np.zeros((256, 256, 3), np.float32)
    img[(np.arange(256) // 4) % 2 == 0, :] = 1.0
    p = _os.path.join(tempfile.mkdtemp(), "hstripes2.png")
    write_image(p, img)
    scene = load_scene_string(f"""
    <scene version="0.5.0"><integrator type="direct"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/></film></sensor>
      <shape type="rectangle">
        <bsdf type="diffuse">
          <texture name="reflectance" type="bitmap">
            <string name="filename" value="{p}"/>
          </texture>
        </bsdf></shape>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
    </scene>""")
    pack = pack_scene(scene)

    n = 64
    tid = jnp.zeros((n,), jnp.int32)
    uv = jnp.stack(
        [jnp.full((n,), 0.5), jnp.linspace(0.2, 0.8, n)], axis=-1
    )
    default = jnp.zeros((n, 3), jnp.float32)
    minor = jnp.tile(jnp.asarray([[1.0 / 256.0, 0.0]], jnp.float32), (n, 1))
    major = jnp.tile(jnp.asarray([[0.0, 32.0 / 256.0]], jnp.float32), (n, 1))

    monkeypatch.setattr(texture_eval, "TEX_FILTER", "ewa")
    out_e = np.asarray(
        texture_eval.eval_texture(pack, tid, uv, default, fp=(minor, major))
    )[:, 0]
    monkeypatch.setattr(texture_eval, "TEX_FILTER", "feline")
    out_f = np.asarray(
        texture_eval.eval_texture(pack, tid, uv, default, fp=(minor, major))
    )[:, 0]

    assert np.isfinite(out_e).all()
    assert np.abs(out_e - 0.5).max() < 0.13, out_e
    assert np.abs(out_e - out_f).mean() < 0.1
