"""Volumetric transport correctness (reference: volpath.cpp semantics).

* Beer-Lambert: pure absorber -> exp(-sigma_a * path length), analytic
* scattering furnace: albedo-1 medium in a uniform env stays at 1
* heterogeneous constant-density grid == homogeneous medium
"""

import numpy as np

from mitsuba_tpu.renderer import render
from mitsuba_tpu.scene.xml_loader import load_scene_string
from tests.conftest import rel_rmse


def _fog_scene(medium_xml, spp=128, w=32, h=32, max_depth=48):
    return load_scene_string(
        f"""
    <scene version="0.5.0">
      <integrator type="volpath">
        <integer name="maxDepth" value="{max_depth}"/>
      </integrator>
      <sensor type="perspective">
        <float name="fov" value="30"/>
        <transform name="toWorld">
          <lookat origin="0,0,-6" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent">
          <integer name="sampleCount" value="{spp}"/>
        </sampler>
        <film type="hdrfilm">
          <integer name="width" value="{w}"/>
          <integer name="height" value="{h}"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="null"/>
        {medium_xml}
      </shape>
      <emitter type="constant">
        <rgb name="radiance" value="1, 1, 1"/>
      </emitter>
    </scene>"""
    )


def test_beer_lambert_absorption():
    """Center pixel looks through 2 units of sigma_a = (0.5, 1, 2)."""
    scene = _fog_scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaA" value="0.5, 1.0, 2.0"/>
          <rgb name="sigmaS" value="0, 0, 0"/>
        </medium>
    """,
        spp=64,
    )
    img = render(scene)
    center = img[16, 16]
    expected = np.exp(-np.array([0.5, 1.0, 2.0]) * 2.0)
    assert np.allclose(center, expected, rtol=0.05), (center, expected)
    # corner pixels miss the sphere -> exactly 1
    assert abs(float(img[1, 1].mean()) - 1.0) < 0.01


def test_scattering_furnace():
    """Purely scattering medium (albedo 1) in a unit furnace: radiance
    stays 1 regardless of optical depth or phase function."""
    for phase in ("", '<phase type="hg"><float name="g" value="0.5"/></phase>'):
        scene = _fog_scene(
            f"""
            <medium name="interior" type="homogeneous">
              <rgb name="sigmaA" value="0, 0, 0"/>
              <rgb name="sigmaS" value="2, 2, 2"/>
              {phase}
            </medium>
        """,
            spp=196,
        )
        img = render(scene)
        m = float(img.mean())
        assert abs(m - 1.0) < 0.03, (phase, m)


def test_heterogeneous_matches_homogeneous():
    """A constant-density grid volume must agree with the closed-form
    homogeneous medium (validates Woodcock tracking + ratio tracking)."""
    import tempfile, os
    from mitsuba_tpu.medium.plugins import save_vol

    tmp = tempfile.mkdtemp()
    vol_path = os.path.join(tmp, "const.vol")
    # grid covering [-1,1]^3 with constant sigma_t = 1.5
    save_vol(
        vol_path,
        np.full((8, 8, 8), 1.5, np.float32),
        aabb_min=(-1, -1, -1),
        aabb_max=(1, 1, 1),
    )
    het = _fog_scene(
        f"""
        <medium name="interior" type="heterogeneous">
          <volume name="density" type="gridvolume">
            <string name="filename" value="{vol_path}"/>
          </volume>
          <volume name="albedo" type="constvolume">
            <rgb name="value" value="0.8, 0.8, 0.8"/>
          </volume>
        </medium>
    """,
        spp=256,
    )
    hom = _fog_scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="1.2, 1.2, 1.2"/>
          <rgb name="sigmaA" value="0.3, 0.3, 0.3"/>
        </medium>
    """,
        spp=256,
    )
    i_het = render(het)
    i_hom = render(hom)
    assert rel_rmse(i_het, i_hom) < 0.03, rel_rmse(i_het, i_hom)


def test_volpath_no_media_equals_path(cbox_scene):
    """volpath on a medium-free scene runs the path backend."""
    import copy

    s2 = cbox_scene
    orig = s2.integrator.kind
    try:
        s2.integrator.kind = "volpath"
        a = render(s2, spp=4, seed=3)
        s2.integrator.kind = "path"
        b = render(s2, spp=4, seed=3)
    finally:
        s2.integrator.kind = orig
    assert np.array_equal(a, b)


def test_medium_nee_small_light():
    """NEE from medium vertices with a SMALL area light: with broken
    shadow-segment bookkeeping the plume renders nearly black because
    only rare phase-sampled paths reach the light (regression for the
    _attenuated_visibility early-resolve bug)."""
    scene = load_scene_string(
        """
    <scene version="0.5.0">
      <integrator type="volpath"><integer name="maxDepth" value="16"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="24"/><integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <bsdf type="null"/>
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="1.5, 1.5, 1.5"/>
          <rgb name="sigmaA" value="0.1, 0.1, 0.1"/>
        </medium>
      </shape>
      <shape type="sphere">
        <point name="center" x="0" y="3" z="0"/>
        <float name="radius" value="0.2"/>
        <emitter type="area"><rgb name="radiance" value="200"/></emitter>
      </shape>
    </scene>"""
    )
    img = render(scene, spp=16)
    # converged ground truth (192 spp) = 0.157; with broken NEE the fog
    # is orders of magnitude darker, with the null-crossing MIS-reset
    # bug it overshoots by ~14%
    center_mean = float(img[8:16, 8:16].mean())
    assert 0.12 < center_mean < 0.20, center_mean


def test_phase_chi2_rayleigh_and_mixture():
    """phase_sample histogram must match phase_eval for the Rayleigh
    phase and a hg+rayleigh mixturephase (reference rayleigh.cpp,
    mixturephase.cpp)."""
    import jax.numpy as jnp
    from types import SimpleNamespace
    from mitsuba_tpu.medium.eval import phase_eval, phase_sample
    from mitsuba_tpu.medium.plugins import HG, ISOTROPIC, RAYLEIGH
    from tests.chi2 import chi2_test

    d_in = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (1, 3)
    )

    def mk(kinds, gs, ws):
        pad = 4 - len(kinds)
        return dict(
            med_phase=[kinds[0]], med_g=[gs[0]],
            med_ph_kinds=[kinds + [-1] * pad],
            med_ph_gs=[gs + [0.0] * pad],
            med_ph_ws=[ws + [0.0] * pad],
        )

    cases = [
        ("rayleigh", mk([RAYLEIGH], [0.0], [1.0])),
        ("mix_hg_ray", mk([HG, RAYLEIGH], [0.6, 0.0], [0.65, 0.35])),
        ("mix_hg_iso", mk([HG, ISOTROPIC], [-0.4, 0.0], [0.3, 0.7])),
        # N-ary: 4 leaves incl. two HG lobes (the old code capped at 2)
        ("mix_4ary", mk([HG, HG, RAYLEIGH, ISOTROPIC],
                        [0.7, -0.3, 0.0, 0.0],
                        [0.4, 0.25, 0.2, 0.15])),
    ]
    for name, fields in cases:
        pack = SimpleNamespace(**{
            k: jnp.asarray(v, jnp.float32 if "g" in k or "ws" in k
                           else jnp.int32)
            for k, v in fields.items()
        })
        med = jnp.zeros((400_000,), jnp.int32)

        def sample_fn(u2, pack=pack, med=med):
            din = jnp.broadcast_to(d_in, (u2.shape[0], 3))
            d_out, _, _ = phase_sample(pack, med[: u2.shape[0]], din, u2)
            return d_out

        def pdf_fn(d, pack=pack):
            m = jnp.zeros((d.shape[0],), jnp.int32)
            din = jnp.broadcast_to(d_in, (d.shape[0], 3))
            import mitsuba_tpu.core.math as mm
            return phase_eval(pack, m, jnp.broadcast_to(din, d.shape), d)

        passed, p, msg = chi2_test(sample_fn, pdf_fn, n_samples=400_000)
        assert passed, f"{name}: {msg}"


def test_scattering_furnace_rayleigh():
    """Albedo-1 Rayleigh fog in a unit furnace stays at 1 (end-to-end
    energy conservation of the new phase)."""
    scene = _fog_scene(
        """
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaA" value="0, 0, 0"/>
          <rgb name="sigmaS" value="2, 2, 2"/>
          <phase type="rayleigh"/>
        </medium>
    """,
        spp=196,
    )
    img = render(scene)
    m = float(img.mean())
    assert abs(m - 1.0) < 0.03, m

def test_simpson_transmittance_matches_tracking():
    """Deterministic Simpson transmittance (method="simpson") must
    match a fine-grained reference integral over the same in-grid
    segment, and the expectation of unbiased ratio tracking
    (reference heterogeneous.cpp ESimpsonQuadrature vs Woodcock)."""
    import tempfile, os as _os
    import jax.numpy as jnp
    from mitsuba_tpu.medium import eval as med_eval
    from mitsuba_tpu.medium.eval import (
        _het_density_q, _het_params, _slab, _to_grid, _to_grid_dir,
    )
    from mitsuba_tpu.medium.plugins import save_vol
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    tmp = tempfile.mkdtemp()
    vol_path = _os.path.join(tmp, "smooth.vol")
    z, y, x = np.meshgrid(
        np.linspace(0, 1, 16), np.linspace(0, 1, 16),
        np.linspace(0, 1, 16), indexing="ij",
    )
    dens = (0.5 + 2.0 * np.sin(3 * x) * np.sin(2 * y) ** 2 * z).astype(
        np.float32
    )
    save_vol(vol_path, dens, aabb_min=(-1, -1, -1), aabb_max=(1, 1, 1))

    def scene(method):
        return load_scene_string(f"""
        <scene version="0.5.0">
          <integrator type="volpath"/>
          <sensor type="perspective">
            <film type="hdrfilm">
              <integer name="width" value="8"/>
              <integer name="height" value="8"/></film>
          </sensor>
          <shape type="cube">
            <bsdf type="null"/>
            <medium name="interior" type="heterogeneous">
              <string name="method" value="{method}"/>
              <volume name="density" type="gridvolume">
                <string name="filename" value="{vol_path}"/>
              </volume>
            </medium>
          </shape>
        </scene>""")

    pack_s = pack_scene(scene("simpson"))
    pack_w = pack_scene(scene("woodcock"))
    assert pack_s.meta["het_simpson"] and not pack_w.meta["het_simpson"]

    n = 256
    r = np.random.default_rng(5)
    o = jnp.asarray(
        np.stack([r.uniform(-0.9, 0.9, n), r.uniform(-0.9, 0.9, n),
                  np.full(n, -2.5)], axis=-1).astype(np.float32)
    )
    d = np.stack([r.normal(0, 0.1, n), r.normal(0, 0.1, n),
                  np.ones(n)], axis=-1)
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    dist = jnp.full((n,), 5.0, jnp.float32)
    med = jnp.zeros((n,), jnp.int32)
    lane = jnp.arange(n, dtype=jnp.uint32)

    tr_q = np.asarray(med_eval.transmittance(
        pack_s, med, o, d, dist, lane, 0, 0, 0))[:, 0]

    # fine deterministic reference over the identical in-grid segment
    hp = _het_params(pack_s, med)
    qo = _to_grid(hp, o)
    qd = _to_grid_dir(hp, d)
    tn, tf = _slab(qo, qd, jnp.zeros_like(qo), jnp.ones_like(qo))
    t0 = jnp.maximum(tn, 0.0)
    seg = jnp.maximum(jnp.minimum(dist, tf) - t0, 0.0)
    M = 4096
    ts = t0[:, None] + seg[:, None] * (
        (jnp.arange(M, dtype=jnp.float32) + 0.5) / M
    )[None, :]
    hp_k = {
        k: (v[:, None] if v.ndim == 1 else v[:, None, :])
        for k, v in hp.items()
    }
    q = qo[:, None, :] + qd[:, None, :] * ts[..., None]
    dref = np.asarray(_het_density_q(pack_s, hp_k, q))
    tr_ref = np.exp(-(dref.mean(axis=1) * np.asarray(seg)))
    err = np.abs(tr_q - tr_ref)
    assert err.max() < 5e-3, (err.mean(), err.max())

    # tracking expectation agrees within its Monte-Carlo noise
    acc = np.zeros(n)
    reps = 32
    for s in range(reps):
        acc += np.asarray(med_eval.transmittance(
            pack_w, med, o, d, dist, lane, jnp.uint32(s), 0, 3))[:, 0]
    tr_w = acc / reps
    assert np.abs(tr_q - tr_w).mean() < 0.05


def test_mixturephase_nary_nested_flattening():
    """Nested mixturephases flatten into weighted leaves
    (reference mixturephase.cpp is N-ary and nestable)."""
    from mitsuba_tpu.medium.plugins import HG, ISOTROPIC, RAYLEIGH
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    scene = load_scene_string("""
    <scene version="0.5.0">
      <integrator type="volpath"/>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/></film>
      </sensor>
      <shape type="sphere">
        <bsdf type="null"/>
        <medium name="interior" type="homogeneous">
          <rgb name="sigmaS" value="1"/><rgb name="sigmaA" value="0.1"/>
          <phase type="mixturephase">
            <string name="weights" value="0.5 0.5"/>
            <phase type="hg"><float name="g" value="0.8"/></phase>
            <phase type="mixturephase">
              <string name="weights" value="0.6 0.4"/>
              <phase type="rayleigh"/>
              <phase type="isotropic"/>
            </phase>
          </phase>
        </medium>
      </shape>
    </scene>""")
    comps = scene.shapes[0].interior_medium.phase.components
    assert comps is not None and len(comps) == 3
    d = {k: w for k, _, w in comps}
    assert abs(d[HG] - 0.5) < 1e-6
    assert abs(d[RAYLEIGH] - 0.3) < 1e-6
    assert abs(d[ISOTROPIC] - 0.2) < 1e-6

    from mitsuba_tpu.scene.builder import pack_scene
    pack = pack_scene(scene)
    import numpy as np
    ws = np.asarray(pack.med_ph_ws)[0]
    assert abs(ws.sum() - 1.0) < 1e-5
