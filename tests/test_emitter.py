"""Emitter sampling correctness (reference: scene.cpp emitter sampling +
the chi-square strategy of test_chisquare over test_emitter.xml)."""

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.emitter.eval import _searchsorted_segment, sample_direct
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string
from mitsuba_tpu.core import rng


def test_searchsorted_segment_exhaustive():
    """Brute-force check against np.searchsorted on random segments
    (regression: the first implementation always returned the segment's
    first entry, silently sampling only one triangle per area light)."""
    r = np.random.default_rng(0)
    for trial in range(20):
        n = int(r.integers(1, 40))
        vals = np.sort(r.random(n)).astype(np.float32)
        vals[-1] = 1.0
        cdf = jnp.asarray(vals)
        m = 256
        u = r.random(m).astype(np.float32)
        lo = jnp.zeros(m, jnp.int32)
        hi = jnp.full(m, n, jnp.int32)
        got = np.asarray(
            _searchsorted_segment(cdf, jnp.asarray(u), lo, hi)
        )
        want = np.minimum(np.searchsorted(vals, u, side="right"), n - 1)
        assert (got == want).all(), (trial, n)


def _plate_scene():
    return load_scene_string(
        """
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <boolean name="flipNormals" value="true"/>
        <emitter type="area"><rgb name="radiance" value="5"/></emitter>
      </shape>
    </scene>"""
    )


def test_area_sampling_covers_whole_light():
    """Direct-sampled points must cover BOTH triangles of a rectangle
    area light uniformly."""
    pack = pack_scene(_plate_scene())
    n = 20000
    p_ref = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    u = rng.rand4(jnp.arange(n), 0, 5)
    ds = sample_direct(pack, p_ref, u[:, :3])
    # reconstruct hit points on the light (plane z=0)
    t = -p_ref[:, 2] / ds.d[:, 2]
    pts = np.asarray(p_ref + ds.d * t[:, None])
    x, y = pts[:, 0], pts[:, 1]
    assert abs(x.mean()) < 0.02 and abs(y.mean()) < 0.02, (x.mean(), y.mean())
    # both diagonal halves populated equally (the rectangle's triangles)
    upper = (y > x).mean()
    assert 0.47 < upper < 0.53, upper
    # corners of all four quadrants hit
    for sx in (-1, 1):
        for sy in (-1, 1):
            frac = ((np.sign(x) == sx) & (np.sign(y) == sy)).mean()
            assert 0.2 < frac < 0.3, (sx, sy, frac)


def test_direct_sampling_value_matches_analytic():
    """Irradiance from a unit square light of radiance L at distance d
    on-axis: E = L * solid-angle-ish integral; validate E[value*cos]
    against a brute-force solid angle quadrature."""
    pack = pack_scene(_plate_scene())
    n = 200_000
    p_ref = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1))
    u = rng.rand4(jnp.arange(n), 0, 9)
    ds = sample_direct(pack, p_ref, u[:, :3])
    # E[value] estimates integral of Le over solid angle / pdf weighting:
    # mean of value * cos_theta_ref = irradiance
    cosr = np.asarray(ds.d[:, 2])  # receiver normal = +z
    est = (np.asarray(ds.value)[:, 0] * cosr).mean()
    # quadrature over the [-1,1]^2 plate at z=0 seen from (0,0,-3)
    g = np.linspace(-1, 1, 201)
    X, Y = np.meshgrid(g, g)
    d2 = X**2 + Y**2 + 9.0
    integrand = 5.0 * (3.0 / np.sqrt(d2)) * (3.0 / np.sqrt(d2)) / d2
    ref = integrand.mean() * 4.0  # area of the plate
    assert abs(est / ref - 1.0) < 0.02, (est, ref)


def test_preetham_sky_model():
    """Preetham sky: blue zenith, bright near sun, energy-conserving
    baked solar disk (reference src/emitters/sunsky)."""
    import math
    import numpy as np
    from mitsuba_tpu.emitter.sky import (
        preetham_sky_image, sun_direction_from_time, sun_irradiance_rgb,
    )

    s = np.array([0.3, 0.8, 0.2])
    s /= np.linalg.norm(s)
    img = preetham_sky_image(3.0, s, resolution=96)
    assert np.isfinite(img).all() and (img >= 0).all()
    zen = img[1].mean(axis=0)
    hor = img[45].mean(axis=0)
    assert zen[2] / zen[0] > hor[2] / hor[0]  # zenith relatively bluer

    # baked sun disk integrates to the analytic direct irradiance
    img_sun = preetham_sky_image(3.0, s, resolution=96, with_sun=True)
    h, w = img.shape[:2]
    theta = (np.arange(h) + 0.5) / h * math.pi
    omega = (
        np.sin(theta)[:, None] * (math.pi / h) * (2 * math.pi / w)
        * np.ones((1, w))
    )
    E = ((img_sun - img) * omega[..., None]).sum(axis=(0, 1))
    assert np.allclose(E, sun_irradiance_rgb(s[1], 3.0), rtol=0.02)


def test_solar_position():
    import numpy as np
    from mitsuba_tpu.emitter.sky import sun_direction_from_time

    noon = sun_direction_from_time(2010, 7, 10, 12.0, 35.7, 139.7, 9.0)
    assert noon[1] > 0.7
    morning = sun_direction_from_time(2010, 7, 10, 6.0, 35.7, 139.7, 9.0)
    assert morning[1] < 0.3 and morning[0] > 0.3  # low in the east
    winter = sun_direction_from_time(2010, 12, 21, 12.0, 35.7, 139.7, 9.0)
    assert 0 < winter[1] < noon[1]


def test_sky_plugin_renders():
    """sky/sunsky load as importance-sampled env maps and light a scene."""
    import numpy as np
    from mitsuba_tpu.scene.registry import create
    from mitsuba_tpu.scene.properties import Properties

    for name in ("sky", "sunsky", "sun"):
        props = Properties(name)
        props._values["turbidity"] = 3.0
        props._values["sunDirection"] = np.array([0.2, 0.8, 0.3])
        props._values["resolution"] = 128
        em = create("emitter", name, props)
        rec = em.record
        if name == "sun":
            assert rec.irradiance.sum() > 100.0
        else:
            assert rec.env_image is not None
            assert rec.env_image.shape[1] == rec.env_image.shape[0] * 2


def test_hosek_sky_bake():
    """Hosek-Wilkie dataset sky (reference skymodel.cpp, data packed in
    mitsuba_tpu/data/hosek_rgb.npz): finite, sun-peaked, blue zenith."""
    import numpy as np
    import math
    from mitsuba_tpu.emitter.sky import hosek_sky_image

    sun = np.array([0.3, 0.5, 0.6])
    sun /= np.linalg.norm(sun)
    img = hosek_sky_image(3.0, sun, resolution=64)
    assert np.isfinite(img).all() and (img >= 0).all()
    h, w = img.shape[:2]
    # radiance toward the sun beats the same elevation away from it
    theta_s = math.acos(sun[1])
    phi_s = math.atan2(sun[0], -sun[2]) % (2 * math.pi)
    iy = int(theta_s / math.pi * h)
    ix = int(phi_s / (2 * math.pi) * w)
    near = img[iy, ix].sum()
    far = img[iy, (ix + w // 2) % w].sum()
    assert near > 2.0 * far, (near, far)
    # zenith is blue-dominant
    zen = img[1, w // 4]
    assert zen[2] > zen[0]


def test_sky_model_selection():
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    def scene(model):
        return load_scene_string(f"""
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
          <emitter type="sky">
            <string name="model" value="{model}"/>
            <float name="turbidity" value="3"/>
            <integer name="resolution" value="64"/>
          </emitter>
        </scene>""")

    import numpy as np

    a = scene("hosek").emitters[0].env_image
    b = scene("preetham").emitters[0].env_image
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # the two models genuinely differ
    assert not np.allclose(a, b, rtol=0.05)


def test_alias_table_pmf_matches_weights():
    """Effective pmf of the alias table == normalized weights
    (pmf_eff[j] = (prob[j] + sum_{alias[i]=j} (1-prob[i])) / N)."""
    from mitsuba_tpu.core.distribution import build_alias

    r = np.random.default_rng(3)
    for n in (1, 7, 256, 4096):
        w = r.random(n) ** 3 + 1e-9
        prob, alias = build_alias(w)
        assert prob.shape == (n,) and alias.shape == (n,)
        assert (prob >= 0).all() and (prob <= 1.0 + 1e-6).all()
        assert (alias >= 0).all() and (alias < n).all()
        pmf = prob.astype(np.float64).copy()
        np.add.at(pmf, alias, np.where(prob < 1.0, 1.0 - prob, 0.0))
        pmf /= n
        want = w / w.sum()
        assert np.allclose(pmf, want, atol=1e-6), n


def test_env_alias_sampling_matches_density():
    """Empirical histogram of _sample_env_dir pixel draws matches
    env_density, and the returned pdf equals _env_pdf_dir(d)."""
    from mitsuba_tpu.emitter.eval import (
        _env_pdf_dir,
        _env_uv_from_dir,
        _sample_env_dir,
    )
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    scene = load_scene_string("""
    <scene version="0.5.0">
      <integrator type="path"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <emitter type="sky">
        <float name="turbidity" value="4"/>
        <integer name="resolution" value="16"/>
      </emitter>
    </scene>""")
    pack = pack_scene(scene)
    n = 200_000
    u = rng.rand4(jnp.arange(n, dtype=jnp.uint32), 0, 0)
    d, pdf = _sample_env_dir(pack, u[..., 0:2])
    d = np.asarray(d)
    pdf = np.asarray(pdf)
    assert np.isfinite(d).all() and (pdf > 0).all()
    # pdf consistency with the MIS-side evaluation (a tiny fraction of
    # samples roundtrip uv->dir->uv across a pixel edge -> neighbor
    # density bin; allow those)
    pdf_q = np.asarray(_env_pdf_dir(pack, jnp.asarray(d)))
    mismatch = ~np.isclose(pdf, pdf_q, rtol=1e-3, atol=1e-6)
    assert mismatch.mean() < 5e-3, mismatch.mean()
    # empirical pixel histogram ~ density * sin weighting
    h, w = pack.env_density.shape
    uv = np.asarray(_env_uv_from_dir(pack, jnp.asarray(d)))
    col = np.clip((uv[:, 0] * w).astype(int), 0, w - 1)
    row = np.clip((uv[:, 1] * h).astype(int), 0, h - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (row, col), 1.0)
    emp = counts / counts.sum()
    # pixel draw probability is proportional to the (already
    # sin-weighted) per-pixel density
    dens = np.asarray(pack.env_density)
    want = dens / dens.sum()
    sel = want > want.max() * 0.02  # skip near-empty bins
    rel = np.abs(emp[sel] - want[sel]) / want[sel]
    assert np.percentile(rel, 90) < 0.15, float(np.percentile(rel, 90))
