"""Homogeneous free-path sampling strategies (homogeneous.cpp:149-153).

Each strategy (balance / single / manual / maximum) must yield an
UNBIASED estimator: for a segment of length L through sigma_t,
  E[w * 1{fail}]          = exp(-sigma_t * L)        (transmittance)
  E[w * 1{scatter}]       = sigma_s/sigma_t (1 - exp(-sigma_t L))
regardless of which sampling density generated the distances.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import rng
from mitsuba_tpu.medium.eval import sample_distance
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string


def _scene(medium_xml):
    return load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="volpath"/>
      <sensor type="perspective">
        <float name="fov" value="30"/>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="null"/>
        {medium_xml}
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
    </scene>"""
    )


SIGMA_S = np.array([0.6, 0.9, 0.3])
SIGMA_A = np.array([0.2, 0.5, 1.4])
SIGMA_T = SIGMA_S + SIGMA_A

STRATS = [
    '<string name="strategy" value="balance"/>',
    '<string name="strategy" value="single"/>',
    '<string name="strategy" value="single"/>'
    '<integer name="channel" value="2"/>',
    '<string name="strategy" value="manual"/>'
    '<float name="samplingDensity" value="0.7"/>',
    '<string name="strategy" value="maximum"/>',
]


@pytest.mark.parametrize("strat_xml", STRATS)
def test_strategy_unbiased(strat_xml):
    scene = _scene(
        f"""
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="{",".join(map(str, SIGMA_S))}"/>
          <rgb name="sigmaA" value="{",".join(map(str, SIGMA_A))}"/>
          {strat_xml}
        </medium>"""
    )
    pack = pack_scene(scene)
    n = 400_000
    L = 1.3
    med = jnp.zeros(n, jnp.int32)
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    lane = jnp.arange(n, dtype=jnp.uint32)
    u3 = jnp.stack([rng.rand1(lane, jnp.uint32(0), jnp.uint32(5), 42),
                    rng.rand1(lane, jnp.uint32(0), jnp.uint32(6), 42),
                    rng.rand1(lane, jnp.uint32(0), jnp.uint32(7), 42)], axis=-1)
    ms = sample_distance(
        pack, med, o, d, jnp.full(n, L, jnp.float32), u3,
        lane, jnp.uint32(0), jnp.uint32(9), 42,
    )
    w = np.asarray(ms.weight)
    scat = np.asarray(ms.is_medium)

    tr_est = (w * (~scat)[..., None]).mean(axis=0)
    tr_ref = np.exp(-SIGMA_T * L)
    assert np.allclose(tr_est, tr_ref, rtol=0.03), (strat_xml, tr_est, tr_ref)

    sc_est = (w * scat[..., None]).mean(axis=0)
    sc_ref = SIGMA_S / SIGMA_T * (1 - np.exp(-SIGMA_T * L))
    assert np.allclose(sc_est, sc_ref, rtol=0.03), (strat_xml, sc_est, sc_ref)

    # sampled times must respect t <= L and be finite
    t = np.asarray(ms.t)
    assert (t <= L + 1e-5).all() and np.isfinite(t).all()


def test_monochromatic_single():
    scene = _scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="0.6,0.9,0.3"/>
          <rgb name="sigmaA" value="0.2,0.5,1.4"/>
          <string name="strategy" value="single"/>
          <integer name="channel" value="1"/>
          <boolean name="monochromatic" value="true"/>
        </medium>"""
    )
    pack = pack_scene(scene)
    ss = np.asarray(pack.med_sigma_s[0])
    sa = np.asarray(pack.med_sigma_a[0])
    assert np.allclose(ss, SIGMA_S[1]) and np.allclose(sa, SIGMA_A[1])


def test_maximum_tables_match_reference_construction():
    """MaxExpDist tables: CDF knots monotone, intervals ordered, and
    the device-side piecewise pdf integrates to ~1."""
    scene = _scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="0.6,0.9,0.3"/>
          <rgb name="sigmaA" value="0.2,0.5,1.4"/>
          <string name="strategy" value="maximum"/>
        </medium>"""
    )
    pack = pack_scene(scene)
    s = np.asarray(pack.med_mx_sigma[0])
    cdf = np.asarray(pack.med_mx_cdf[0])
    ist = np.asarray(pack.med_mx_istart[0])
    norm = float(pack.med_mx_norm[0])
    assert (np.diff(s) < 0).all()  # descending rates
    assert cdf[0] == 0 and abs(cdf[3] - 1) < 1e-6
    assert (np.diff(cdf) > 0).all() and (np.diff(ist) > 0).all()
    # numeric integral of max_k(s_k e^{-s_k t}) equals the norm
    t = np.linspace(0, 60, 400_001)
    f = np.max(s[:, None] * np.exp(-s[:, None] * t[None]), axis=0)
    assert abs(np.trapezoid(f, t) - norm) < 1e-3
