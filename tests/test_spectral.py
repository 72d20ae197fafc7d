"""N-bin spectral mode (core/spectral.py + builder.apply_spectral_pack
+ renderer bin-group passes).  The reference's spectral build is
SPECTRUM_SAMPLES bins over 360-830nm with Smits RGB upsampling
(include/mitsuba/core/spectrum.h:63-75, spectrum.cpp fromLinearRGB)."""

import numpy as np
import pytest

from mitsuba_tpu.core.spectral import (
    SpectralBins,
    cauchy_eta,
    make_bins,
    spd_to_bins,
    upsample_rgb,
)
from mitsuba_tpu.core.spectrum import _XYZ_TO_RGB


@pytest.mark.parametrize("n", [3, 6, 12, 24, 48])
def test_upsample_roundtrip_exact(n):
    """project(upsample_illum(rgb)) == rgb, and reflectances are exact
    under the D65 whitepoint: project(d65 * upsample(rgb)) == rgb."""
    from mitsuba_tpu.core.spectral import upsample_illum

    bins = make_bins(n)
    rng = np.random.default_rng(n)
    rgb = rng.uniform(0.0, 2.0, (400, 3)).astype(np.float32)
    # include cube corners + grays
    rgb = np.concatenate(
        [rgb, np.eye(3, dtype=np.float32), np.ones((1, 3), np.float32),
         np.full((1, 3), 0.25, np.float32)]
    )
    proj = _XYZ_TO_RGB @ bins.to_xyz
    assert np.abs(upsample_illum(rgb, bins) @ proj.T - rgb).max() < 1e-4
    refl = upsample_rgb(rgb, bins)
    if not bins.identity:
        refl = refl * bins.d65
    assert np.abs(refl @ proj.T - rgb).max() < 1e-4


def test_basis_smooth_and_mostly_positive():
    bins = make_bins(24)
    # small negative lobes are tolerated (clamped at use); nothing wild
    assert bins.basis.min() > -0.25
    assert bins.basis.max() < 2.0
    # white basis is near flat (neutral grays must stay neutral under
    # repeated spectral multiplication)
    white = upsample_rgb(np.ones(3, np.float32), bins)
    assert white.std() < 0.02  # near-flat: neutrals stay neutral
    # smoothness: bounded bin-to-bin steps
    assert np.abs(np.diff(bins.basis, axis=1)).max() < 0.5


def test_three_bin_mode_is_rgb_identity():
    bins = make_bins(3)
    assert bins.identity
    rgb = np.array([[0.2, 0.5, 0.9]], np.float32)
    assert np.allclose(upsample_rgb(rgb, bins), rgb)


def test_invalid_bin_count():
    with pytest.raises(ValueError):
        make_bins(7)


def test_spd_binning_flat():
    bins = make_bins(12)
    flat = spd_to_bins(np.array([300.0, 900.0]), np.array([1.0, 1.0]), bins)
    assert np.allclose(flat, 1.0, atol=1e-5)
    rgb = _XYZ_TO_RGB @ bins.to_xyz @ flat
    # equal-energy illuminant is near-white in Rec.709 (E vs D65 shift)
    assert np.abs(rgb - 1.0).max() < 0.25


def test_cauchy_dispersion_monotone():
    etas = [cauchy_eta(1.5168, 0.0042, l) for l in (400.0, 550.0, 700.0)]
    assert etas[0] > etas[1] > etas[2]
    assert abs(cauchy_eta(1.5168, 0.0042, 587.6) - 1.5168) < 1e-3


def _cbox(spp):
    import os

    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 32
    scene.sensor.record.film.height = 32
    return scene


def test_spectral_3bin_render_matches_rgb_exactly():
    """3-bin mode routes through the full spectral plumbing but must
    reproduce the RGB render bit-near-exactly."""
    from mitsuba_tpu.renderer import render

    scene = _cbox(16)
    ref = np.asarray(render(scene, spp=16, seed=2))
    img = np.asarray(render(scene, spp=16, seed=2, spectral_bins=3))
    assert np.abs(img - ref).max() < 1e-4


def test_spectral_12bin_render_close_to_rgb():
    """12-bin spectral render of the cbox agrees with RGB mode: the
    scene's saturated red/green walls differ only through spectral
    multiplication effects (a few percent on means)."""
    from mitsuba_tpu.renderer import render

    scene = _cbox(32)
    ref = np.asarray(render(scene, spp=32, seed=2))
    img = np.asarray(render(scene, spp=32, seed=2, spectral_bins=12))
    assert np.isfinite(img).all()
    ratio = img.mean(axis=(0, 1)) / ref.mean(axis=(0, 1))
    assert np.all(np.abs(ratio - 1.0) < 0.12), ratio
    # same noise realization (shared seed) -> pixelwise agreement too
    rel = np.abs(img - ref).mean() / ref.mean()
    assert rel < 0.12, rel


def test_dispersion_separates_wavelengths():
    """A dispersive dielectric refracts bin groups differently: the
    packed mat_eta differs between the blue-most and red-most pass."""
    from mitsuba_tpu.scene.builder import apply_spectral_pack, pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    scene = load_scene_string("""
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
      <shape type="sphere">
        <bsdf type="dielectric">
          <float name="intIOR" value="1.5168"/>
          <float name="dispersion" value="0.0042"/>
        </bsdf>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1,1,1"/>
      </emitter>
    </scene>""")
    pack = pack_scene(scene)
    assert float(np.asarray(pack.arrays["mat_disp"]).max()) > 0.0
    bins = make_bins(12)
    p_blue = apply_spectral_pack(pack, bins, 0)
    p_red = apply_spectral_pack(pack, bins, 3)
    eta_b = np.asarray(p_blue.arrays["mat_eta"])
    eta_r = np.asarray(p_red.arrays["mat_eta"])
    row = int(np.asarray(pack.arrays["mat_disp"]).argmax())
    assert eta_b[row] > eta_r[row] + 0.005
    # meta unchanged -> one compile serves all groups
    assert p_blue.meta == pack.meta


def test_spectral_pack_leaves_transform():
    """em_rgb/mat_cA move to bin space; positions stay untouched."""
    from mitsuba_tpu.scene.builder import apply_spectral_pack, pack_scene

    scene = _cbox(4)
    pack = pack_scene(scene)
    bins = make_bins(6)
    pg = apply_spectral_pack(pack, bins, 1)
    assert not np.allclose(
        np.asarray(pg.arrays["mat_cA"]), np.asarray(pack.arrays["mat_cA"])
    )
    assert np.allclose(
        np.asarray(pg.arrays["tri_v0"]), np.asarray(pack.arrays["tri_v0"])
    )
    assert np.asarray(pg.arrays["mat_cA"]).min() >= 0.0
