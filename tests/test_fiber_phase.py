"""Fiber phase functions (kkay / microflake) on orientation volumes
(reference src/phase/{kkay,microflake}.cpp, microflake_fiber.h):
chi-square sample-vs-pdf, normalization, and weight consistency."""

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.medium.eval import phase_eval, phase_pdf, phase_sample
from mitsuba_tpu.medium.plugins import save_vol
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string
from tests.chi2 import chi2_test

D_IN = np.asarray(
    mm.normalize(jnp.asarray([0.4, 0.2, 0.894], jnp.float32))
)


def _fiber_pack(tmp_path, phase_xml, axis=(0.0, 0.0, 1.0)):
    dens = str(tmp_path / "dens.vol")
    orient = str(tmp_path / "orient.vol")
    save_vol(dens, np.ones((4, 4, 4), np.float32),
             aabb_min=(-2, -2, -2), aabb_max=(2, 2, 2))
    og = np.tile(np.asarray(axis, np.float32), (4, 4, 4, 1))
    save_vol(orient, og, aabb_min=(-2, -2, -2), aabb_max=(2, 2, 2))
    scene = load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="volpath"/>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <sampler type="independent">
          <integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="sphere">
        <bsdf type="null"/>
        <medium name="interior" type="heterogeneous">
          <volume name="density" type="gridvolume">
            <string name="filename" value="{dens}"/>
          </volume>
          <volume name="orientation" type="gridvolume">
            <string name="filename" value="{orient}"/>
          </volume>
          {phase_xml}
        </medium>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>"""
    )
    return pack_scene(scene)


KKAY_XML = """<phase type="kkay">
  <float name="ks" value="0.5"/>
  <float name="kd" value="0.3"/>
  <float name="exponent" value="6"/>
</phase>"""
FLAKE_XML = """<phase type="microflake">
  <float name="stddev" value="0.25"/>
</phase>"""


@pytest.mark.parametrize("phase_xml", [KKAY_XML, FLAKE_XML],
                         ids=["kkay", "microflake"])
def test_fiber_phase_chi2(tmp_path, phase_xml):
    pack = _fiber_pack(tmp_path, phase_xml)

    def sample_fn(u2):
        n = u2.shape[0]
        med = jnp.zeros((n,), jnp.int32)
        din = jnp.broadcast_to(jnp.asarray(D_IN), (n, 3))
        p = jnp.zeros((n, 3), jnp.float32)
        d_out, pdf, w = phase_sample(pack, med, din, u2, p=p)
        return jnp.where((pdf > 0)[..., None], d_out, 0.0)

    def pdf_fn(d):
        n = d.shape[0]
        med = jnp.zeros((n,), jnp.int32)
        din = jnp.broadcast_to(jnp.asarray(D_IN), (n, 3))
        p = jnp.zeros((n, 3), jnp.float32)
        return phase_pdf(pack, med, din, d, p=p)

    passed, pval, msg = chi2_test(
        sample_fn, pdf_fn, n_samples=400_000, pdf_sub=32
    )
    assert passed, msg


@pytest.mark.parametrize(
    "phase_xml,expected,wi",
    [
        # kkay is normalized for PERPENDICULAR illumination only
        # (reference kkay.cpp configure comment); microflake for any wi
        (KKAY_XML, 0.8, (1.0, 0.0, 0.0)),
        (FLAKE_XML, 1.0, None),
    ],
    ids=["kkay", "microflake"],
)
def test_fiber_phase_normalization(tmp_path, phase_xml, expected, wi):
    pack = _fiber_pack(tmp_path, phase_xml)
    d_in = -np.asarray(wi, np.float32) if wi is not None else D_IN
    nt, np_ = 128, 256
    tt = (np.arange(nt) + 0.5) / nt * np.pi
    pp = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
    T, P = np.meshgrid(tt, pp, indexing="ij")
    dirs = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3).astype(np.float32)
    n = dirs.shape[0]
    med = jnp.zeros((n,), jnp.int32)
    din = jnp.broadcast_to(jnp.asarray(d_in), (n, 3))
    p = jnp.zeros((n, 3), jnp.float32)
    vals = np.asarray(phase_eval(pack, med, din, jnp.asarray(dirs), p=p))
    integral = float(
        (vals.reshape(T.shape) * np.sin(T)).sum()
        * (np.pi / nt) * (2 * np.pi / np_)
    )
    assert abs(integral - expected) < 0.02, integral


def test_fiber_weight_consistency(tmp_path):
    """sample weight == eval/pdf for the microflake draw."""
    pack = _fiber_pack(tmp_path, FLAKE_XML)
    n = 4096
    from mitsuba_tpu.core import rng

    u2 = rng.rand2(jnp.arange(n), 3, 5, 11)
    med = jnp.zeros((n,), jnp.int32)
    din = jnp.broadcast_to(jnp.asarray(D_IN), (n, 3))
    p = jnp.zeros((n, 3), jnp.float32)
    d_out, pdf, w = phase_sample(pack, med, din, u2, p=p)
    f = phase_eval(pack, med, din, d_out, p=p)
    ok = np.asarray(pdf) > 1e-6
    ratio = np.asarray(f)[ok] / np.asarray(pdf)[ok]
    assert np.allclose(ratio, np.asarray(w)[ok], rtol=2e-3, atol=1e-4)
