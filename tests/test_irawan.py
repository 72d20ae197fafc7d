"""Irawan-Marschner woven cloth (reference src/bsdfs/irawan.{h,cpp}).

* weave DSL parser: preset round-trip, $param substitution, comments
* specular normalization: independent-seed estimate of the normalized
  integral returns ~1 (irawan.cpp configure)
* host/device parity: the xp-generic math gives identical results under
  numpy and jax.numpy
* chi^2: cosine sampling matches pdf
* render smoke test: a cloth rectangle under a constant environment is
  non-black, finite, and deterministic
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.bsdf import irawan as iw
from mitsuba_tpu.bsdf import plugins as bp
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import rng
from tests.chi2 import chi2_test

WI = mm.normalize(jnp.array([0.35, -0.2, 0.91]))


def _pattern():
    return iw.parse_weave(iw.PRESETS["plain"])


def _cosine_dirs(n, seed):
    r = np.random.default_rng(seed)
    u1, u2 = r.random(n), r.random(n)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    return np.stack(
        [rad * np.cos(phi), rad * np.sin(phi),
         np.sqrt(np.maximum(1 - u1, 0))], -1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_preset():
    w = _pattern()
    assert w.tileWidth == 2 and w.tileHeight == 2
    assert len(w.yarns) == 4 and len(w.pattern) == 4
    assert all(0 < p <= 4 for p in w.pattern)
    assert w.yarns[0].type == iw.WARP and w.yarns[2].type == iw.WEFT
    # umax was given in degrees
    assert abs(w.yarns[0].umax - np.radians(35)) < 1e-6


def test_parse_params_and_comments():
    from mitsuba_tpu.scene.properties import Properties

    props = Properties("bsdf", "irawan")
    props.set("warp_kd", np.asarray([0.1, 0.2, 0.3], np.float32))
    props.set("crimp", 30.0)
    text = """
    /* a comment */ weave {
      name = "test", tileWidth = 1, tileHeight = 1,
      alpha = 0.1, beta = 2 /* inline */, ss = 0.0, hWidth = 0.5,
      warpArea = 0.6, weftArea = 0.4,
      pattern { 1 },
      yarn { type = warp, umax = $crimp, width = 1, length = 2,
             centerU = 0.5, centerV = 0.5,
             kd = $warp_kd, ks = { 1, 1, 1 } }
    }
    """
    w = iw.parse_weave(text, props)
    assert abs(w.yarns[0].umax - np.radians(30)) < 1e-6
    np.testing.assert_allclose(w.yarns[0].kd, [0.1, 0.2, 0.3])
    assert w.warpArea == pytest.approx(0.6)


def test_parse_rejects_bad_pattern():
    with pytest.raises(ValueError):
        iw.parse_weave(
            """weave { name = "x", tileWidth = 2, tileHeight = 1,
            alpha = 0.1, beta = 2, ss = 0, hWidth = 0.5,
            warpArea = 1, weftArea = 1,
            pattern { 1, 5 },
            yarn { type = warp, umax = 30, width = 1, length = 2,
                   centerU = 0.5, centerV = 0.5,
                   kd = {0,0,0}, ks = {1,1,1} } }"""
        )


# ---------------------------------------------------------------------------
# normalization (irawan.cpp configure:139-173)
# ---------------------------------------------------------------------------

def test_normalization_integral():
    """With the computed norm, an independent-seed cosine MC of the
    normalized specular integrand times pi returns ~1."""
    w = _pattern()
    norm = iw.compute_normalization(w, 4.0, 4.0)
    assert np.isfinite(norm) and norm > 0

    n = 40_000
    T = iw.pack_tables([(w, 4.0, 4.0, norm)])
    r = np.random.default_rng(123)
    wi = _cosine_dirs(n, 1)
    wo = _cosine_dirs(n, 2)
    uv = r.random((n, 2)).astype(np.float32)
    P = iw.lane_params(
        np, T, np.zeros(n, np.int32), uv, iw.tea_float_np, False
    )
    spec = iw.irawan_f(np, P, wi, wo, init=True)
    est = spec.sum() * norm * np.pi / n
    assert abs(est - 1.0) < 0.15, est


# ---------------------------------------------------------------------------
# host/device parity + eval properties
# ---------------------------------------------------------------------------

def _sp_device(n, seed=5, repeat=4.0):
    w = _pattern()
    norm = iw.compute_normalization(w, repeat, repeat)
    T = iw.pack_tables([(w, repeat, repeat, norm)])
    Tj = {k: jnp.asarray(v) for k, v in T.items()}
    r = np.random.default_rng(seed)
    uv = jnp.asarray(r.random((n, 2)), jnp.float32)
    seed_w = rng.stream_seed(0, rng.STREAM_WEAVE)
    iw_lane = iw.lane_params(
        jnp, Tj, jnp.zeros(n, jnp.int32), uv,
        lambda i, j: rng.rand1(i, j, 0, seed_w), False,
    )
    sp = {
        "type": jnp.full((n,), bp.IRAWAN, jnp.int32),
        "twosided": jnp.zeros(n, jnp.float32),
        "iw": iw_lane,
    }
    return sp, T, np.asarray(uv)


def test_host_device_parity():
    """The same xp-generic math under numpy and jax.numpy agrees."""
    n = 4096
    sp, T, uv = _sp_device(n)
    wi = _cosine_dirs(n, 11)
    wo = _cosine_dirs(n, 12)
    f_dev = np.asarray(
        bsdf_eval(sp, jnp.asarray(wi), jnp.asarray(wo), (bp.IRAWAN,))
    )
    P = iw.lane_params(
        np, T, np.zeros(n, np.int32), uv, iw.tea_float_np, False
    )
    f_host = iw.irawan_f(np, P, wi, wo)
    np.testing.assert_allclose(f_dev, f_host, rtol=2e-4, atol=1e-6)


def test_eval_back_side_zero():
    n = 1024
    sp, _, _ = _sp_device(n)
    wi = jnp.broadcast_to(WI, (n, 3))
    wo = _cosine_dirs(n, 3) * np.asarray([1, 1, -1], np.float32)
    f = np.asarray(bsdf_eval(sp, wi, jnp.asarray(wo), (bp.IRAWAN,)))
    assert (f == 0).all()
    p = np.asarray(bsdf_pdf(sp, wi, jnp.asarray(wo), (bp.IRAWAN,)))
    assert (p == 0).all()


def test_diffuse_floor():
    """ks=0 leaves exactly the Lambertian kd/pi * cos term."""
    w = _pattern()
    for y in w.yarns:
        y.ks = np.zeros(3, np.float32)
    T = iw.pack_tables([(w, 4.0, 4.0, 1.0)])
    n = 2048
    r = np.random.default_rng(8)
    uv = r.random((n, 2)).astype(np.float32)
    wi = _cosine_dirs(n, 21)
    wo = _cosine_dirs(n, 22)
    P = iw.lane_params(np, T, np.zeros(n, np.int32), uv,
                       iw.tea_float_np, False)
    f = iw.irawan_f(np, P, wi, wo)
    expect = P["kd"] / np.pi * wo[:, 2:3]
    np.testing.assert_allclose(f, expect, rtol=1e-5, atol=1e-7)


def test_noise_path_finite():
    """period/fineness noise enabled: everything stays finite."""
    w = _pattern()
    w.period = 3.0
    w.fineness = 2.0
    w.dWarpUmaxOverDWarp = np.radians(10)
    w.dWeftUmaxOverDWeft = np.radians(10)
    norm = iw.compute_normalization(w, 4.0, 4.0)
    T = iw.pack_tables([(w, 4.0, 4.0, norm)])
    assert iw.tables_have_noise(T)
    n = 4096
    r = np.random.default_rng(9)
    uv = r.random((n, 2)).astype(np.float32)
    P = iw.lane_params(np, T, np.zeros(n, np.int32), uv,
                       iw.tea_float_np, True)
    f = iw.irawan_f(np, P, _cosine_dirs(n, 31), _cosine_dirs(n, 32))
    assert np.isfinite(f).all() and f.max() > 0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_irawan_chi2():
    n = 200_000
    sp, _, _ = _sp_device(n, seed=777)
    wi = jnp.broadcast_to(WI, (n, 3))

    def sample_fn(u2):
        ul = rng.rand1(jnp.arange(u2.shape[0]), 99, 17)
        bs = bsdf_sample(sp, wi, u2, ul, (bp.IRAWAN,))
        ok = jnp.max(bs.weight, axis=-1) > 0
        return jnp.where(ok[..., None], bs.wo, 0.0)

    def pdf_fn(d):
        m = d.shape[0]
        spd, _, _ = _sp_device(m, seed=777)
        wim = jnp.broadcast_to(WI, (m, 3))
        return bsdf_pdf(spd, wim, d, (bp.IRAWAN,))

    passed, p, msg = chi2_test(sample_fn, pdf_fn, n_samples=n)
    assert passed, msg


def test_sample_weight_consistency():
    """weight * pdf == f (cosine importance sampling identity)."""
    n = 8192
    sp, _, _ = _sp_device(n, seed=42)
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = rng.rand2(jnp.arange(n), 7, 3)
    ul = rng.rand1(jnp.arange(n), 7, 11)
    bs = bsdf_sample(sp, wi, u2, ul, (bp.IRAWAN,))
    f = np.asarray(bsdf_eval(sp, wi, bs.wo, (bp.IRAWAN,)))
    lhs = np.asarray(bs.weight) * np.asarray(bs.pdf)[:, None]
    np.testing.assert_allclose(lhs, f, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end render
# ---------------------------------------------------------------------------

def test_render_cloth():
    from mitsuba_tpu.scene.xml_loader import load_scene_string
    from mitsuba_tpu.renderer import render

    scene = load_scene_string(
        """
    <scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="16"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="24"/>
          <integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <transform name="toWorld"><scale value="1.5"/></transform>
        <bsdf type="twosided">
          <bsdf type="irawan">
            <string name="preset" value="plain"/>
            <float name="repeatU" value="8"/>
            <float name="repeatV" value="8"/>
          </bsdf>
        </bsdf>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
    </scene>"""
    )
    img = np.asarray(render(scene, seed=1))
    assert np.isfinite(img).all()
    inner = img[6:18, 6:18]
    assert inner.mean() > 0.1  # cloth visible, not black
    assert inner.max() < 20.0  # no fireflies from the normalization
    img2 = np.asarray(render(scene, seed=1))
    np.testing.assert_array_equal(img, img2)  # deterministic
