"""Path verification infrastructure (reference
src/libbidir/verification.cpp:84-201 Path::verify — cached vertex
pdfs/weights must agree with independently recomputed values).

The bdpt walk caches pdf_fwd from the SAMPLING side (bsdf_sample's
returned pdf, converted to area measure); here every transition is
recomputed through the EVAL side (bsdf_pdf/bsdf_eval) — disagreement
catches sample/eval pdf mismatches anywhere along real paths, which is
exactly what the reference's verify() mode does with finite checks."""

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.integrator.bdpt import _to_area, _walk
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.scene.xml_loader import load_scene_string
from mitsuba_tpu.sensor.plugins import generate_rays


def _scene():
    # mixed diffuse + isotropic glossy so several lobe families are on
    # the path (azimuth-invariant BSDFs only: the test rebuilds frames
    # from normals, which fixes z but not the tangent azimuth)
    return load_scene_string("""
    <scene version="0.5.0">
      <integrator type="bdpt"/>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0,1,-3.2" target="0,0.5,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="16"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="16"/>
          <integer name="height" value="16"/>
          <rfilter type="box"/></film>
      </sensor>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="-90"/><scale value="4"/>
        </transform>
        <bsdf type="roughconductor">
          <float name="alpha" value="0.3"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <scale value="4"/><translate z="2"/>
        </transform>
        <bsdf type="diffuse">
          <rgb name="reflectance" value="0.6, 0.5, 0.4"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <transform name="toWorld">
          <rotate x="1" angle="90"/><translate y="3"/>
        </transform>
        <emitter type="area"><rgb name="radiance" value="5,5,5"/>
        </emitter>
      </shape>
    </scene>""")


def test_walk_pdfs_match_eval_side():
    scene = _scene()
    pack = pack_scene(scene)
    present = pack.present_types
    n = 512
    rng_ = np.random.default_rng(11)
    pos01 = jnp.asarray(rng_.uniform(size=(n, 2)), jnp.float32)
    cam = scene.sensor.record.pack(16, 16)
    o, d = generate_rays(cam, pos01, jnp.zeros_like(pos01))
    lane = jnp.arange(n, dtype=jnp.uint32)
    sidx = jnp.zeros((n,), jnp.uint32)

    verts = _walk(
        pack, o, d, jnp.ones((n, 3)), jnp.ones((n,)), lane, sidx,
        seed=7, n_steps=4, present=present,
        delta0=jnp.zeros((n,), bool),
    )

    checked = 0
    for k in range(1, len(verts)):
        va, vb = verts[k - 1], verts[k]
        ok = np.asarray(
            va["valid"] & vb["valid"] & ~va["is_medium"]
            & ~vb["is_medium"] & (vb["pdf_fwd"] > 1e-7)
        )
        if not ok.any():
            continue
        wo_w = mm.normalize(vb["p"] - va["p"])
        fr = mm.Frame.from_normal(va["ns"])
        pdf_w = bsdf_pdf(
            va["sp"], fr.to_local(va["wi"]), fr.to_local(wo_w), present
        )
        pdf_area = np.asarray(_to_area(pdf_w, va["p"], vb["p"], vb["ns"]))
        cached = np.asarray(vb["pdf_fwd"])
        # delta transitions cache 0 and are excluded by the pdf floor
        rel = np.abs(pdf_area[ok] - cached[ok]) / np.maximum(
            cached[ok], 1e-6
        )
        # the eval-side wo is recomputed from vertex POSITIONS, which
        # differ from the walk's sampled direction by the ray-offset
        # epsilon; the VNDF pdf's G1(wi) factor amplifies that jitter
        # near grazing (measured q99 ~1.3e-3 with VNDF vs ~5e-4 with
        # classic D*cos sampling), so the gate allows for it
        assert np.quantile(rel, 0.99) < 3e-3, (k, np.quantile(rel, 0.99))
        checked += int(ok.sum())

        # throughput recursion: beta_k == beta_{k-1} * f/pdf
        f = np.asarray(bsdf_eval(
            va["sp"], fr.to_local(va["wi"]), fr.to_local(wo_w), present
        ))
        pw = np.asarray(pdf_w)
        beta_pred = np.asarray(va["beta"]) * f / np.maximum(
            pw[:, None], 1e-9
        )
        beta_cached = np.asarray(vb["beta"])
        okb = ok & (beta_cached.max(-1) > 1e-6) & (pw > 1e-6)
        relb = np.abs(beta_pred[okb] - beta_cached[okb]) / np.maximum(
            beta_cached[okb], 1e-4
        )
        assert np.quantile(relb, 0.99) < 2e-2, (k, np.quantile(relb, 0.99))
    assert checked > 150, checked  # the check actually exercised paths
