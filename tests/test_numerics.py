"""Numeric helpers (core/numerics.py) + rough-transmittance tables
(bsdf/rtrans.py).

(= reference quad.h/brent.h/spline.h/sh.h/vmf.h unit behavior and the
rtrans.h table semantics: smooth limit -> 1 - Fresnel.)
"""

import numpy as np

from mitsuba_tpu.core import numerics as num
from mitsuba_tpu.bsdf import rtrans


def test_gauss_legendre_integral():
    # int_0^pi sin = 2
    assert abs(num.integrate_gl(np.sin, 0.0, np.pi, 32) - 2.0) < 1e-12
    assert abs(num.integrate_simpson(np.sin, 0.0, np.pi) - 2.0) < 1e-8


def test_brent_root():
    r = num.brent(lambda x: x**3 - 2 * x - 5, 1.0, 3.0)
    assert abs(r**3 - 2 * r - 5) < 1e-9


def test_spline_interpolates_smooth_function():
    x = np.linspace(0, 1, 16)
    y = np.sin(2 * np.pi * x)
    m = num.spline_coeffs(x, y)
    xq = np.linspace(0.03, 0.97, 200)
    err = np.abs(num.spline_eval(x, y, m, xq) - np.sin(2 * np.pi * xq))
    assert err.max() < 5e-3


def test_sh_orthonormality():
    # MC inner products of the real SH basis: <Yi, Yj> = delta_ij
    rng = np.random.default_rng(3)
    u = rng.uniform(size=(200_000, 2))
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(1 - z * z, 0))
    phi = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
    b = num.sh_eval(2, d)
    gram = 4 * np.pi * (b[:, :, None] * b[:, None, :]).mean(axis=0)
    assert np.abs(gram - np.eye(9)).max() < 0.05


def test_vmf_pdf_normalized_and_sample_matches():
    kappa = 8.0
    # pdf integrates to 1 over the sphere
    ct = np.linspace(-1, 1, 20001)
    integral = 2 * np.pi * np.trapezoid(num.vmf_pdf(kappa, ct), ct)
    assert abs(integral - 1.0) < 1e-3
    # sampled mean cosine matches coth(k) - 1/k
    rng = np.random.default_rng(5)
    d = num.vmf_sample(kappa, rng.uniform(size=(100_000, 2)))
    want = 1.0 / np.tanh(kappa) - 1.0 / kappa
    assert abs(d[:, 2].mean() - want) < 5e-3


def test_rtrans_smooth_limit_is_one_minus_fresnel():
    """alpha -> 0: rough transmittance degenerates to 1 - F(cos)."""
    cos_i = np.linspace(0.15, 1.0, 12)
    t = rtrans.rough_transmittance(rtrans.GGX, 0.01, 1.5, cos_i)
    f = rtrans._fresnel(cos_i, 1.5)
    assert np.abs(t - (1.0 - f)).max() < 0.03


def test_rtrans_fit_matches_table():
    coeffs, t_diff = rtrans.fit_rtrans_poly(rtrans.GGX, 0.3, 1.5)
    cos_i = np.linspace(0.1, 1.0, 32)
    t = rtrans.rough_transmittance(rtrans.GGX, 0.3, 1.5, cos_i)
    fit = np.polyval(coeffs, cos_i)
    assert np.abs(fit - t).max() < 0.04  # MC noise floor ~0.02-0.03
    assert 0.5 < t_diff < 1.0
    # internal side (entering the denser medium from inside): much
    # lower diffuse transmittance because of TIR
    _, t_diff_int = rtrans.fit_rtrans_poly(rtrans.GGX, 0.3, 1.0 / 1.5)
    assert t_diff_int < t_diff


def test_sh_arbitrary_order_orthonormal():
    """sh_eval beyond band 3 (VERDICT r3 missing #7): the real SH basis
    at l_max=8 is orthonormal under MC integration over the sphere."""
    import numpy as np
    from mitsuba_tpu.core import numerics as num

    rng = np.random.default_rng(1)
    n = 200000
    u = rng.uniform(size=(n, 2))
    z = 1 - 2 * u[:, 0]
    r = np.sqrt(np.maximum(1 - z * z, 0))
    ph = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(ph), r * np.sin(ph), z], -1)
    B = num.sh_eval(8, d)
    G = 4 * np.pi * (B.T @ B) / n
    assert np.abs(G - np.eye(G.shape[0])).max() < 0.06


def test_sh_sampler_consistency():
    """SHSampler (shvector.h:430): normalized pdf, pdf(d) consistent
    with the sampled-cell pdf, and the warp follows the lobe."""
    import numpy as np
    from mitsuba_tpu.core import numerics as num

    coeffs = np.zeros(16)
    coeffs[0] = 1.0
    coeffs[2] = 0.7
    coeffs[8] = 0.3
    s = num.SHSampler(coeffs, depth=6)
    rng = np.random.default_rng(2)
    u = rng.uniform(size=(100000, 2))
    dirs, pdf = s.sample(u)
    assert (pdf > 0).all()
    # sum over samples of 1/pdf estimates the sphere area
    assert abs((1 / pdf).mean() / (4 * np.pi) - 1.0) < 0.03
    assert np.allclose(s.pdf(dirs), pdf, rtol=1e-6)
    assert dirs[:, 2].mean() > 0.3  # the +z Y10 lobe dominates
