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


def test_mip_level0_matches_unfiltered():
    """fp=0 must reproduce the plain bilinear path bit-exactly."""
    from mitsuba_tpu.scene.texture_eval import eval_texture

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "checker.png")
        _checker_png(p)
        pack = _bitmap_scene_pack(p)
        tid_row = int(np.argmax(np.asarray(pack.tex_n_lev)))
        n = 256
        tid = jnp.full((n,), tid_row, jnp.int32)
        uv = jnp.stack(
            [jnp.linspace(0, 1, n), jnp.linspace(0, 1, n)], -1
        )
        default = jnp.zeros((n, 3), jnp.float32)
        a = np.asarray(eval_texture(pack, tid, uv, default))
        b = np.asarray(
            eval_texture(pack, tid, uv, default, jnp.zeros((n,)))
        )
        np.testing.assert_allclose(a, b, atol=1e-6)
