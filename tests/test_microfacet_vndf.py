"""Visible-normal (VNDF) microfacet sampling tests.

The reference defaults to sampleVisible=true (microfacet.h:67) and
validates it with chi-square runs; these tests do the same for the
TPU rebuild's Heitz-2018 GGX and stretch+Newton Beckmann samplers,
plus a machine-precision check of the Beckmann slope-CDF inversion.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erf

from mitsuba_tpu.bsdf import microfacet as mf
from tests.chi2 import chi2_test


def _wi(theta_deg, y=0.1):
    t = np.radians(theta_deg)
    w = np.array([np.sin(t), y, np.cos(t)])
    return jnp.asarray(w / np.linalg.norm(w), jnp.float32)


CASES = [
    (mf.BECKMANN, 0.3, 0.3, 30, False),
    (mf.BECKMANN, 0.1, 0.4, 75, False),
    (mf.BECKMANN, 0.5, 0.1, 89, False),
    (mf.GGX, 0.3, 0.3, 30, False),
    (mf.GGX, 0.1, 0.4, 75, False),
    (mf.GGX, 0.5, 0.05, 89, False),
    # incidence from below the surface (roughdielectric exit rays):
    # the sampler flips internally, m stays +z
    (mf.BECKMANN, 0.3, 0.3, 150, True),
    (mf.GGX, 0.25, 0.25, 140, True),
]


@pytest.mark.parametrize("dist,au,av,ti,below", CASES)
def test_vndf_chi2(dist, au, av, ti, below):
    wi = _wi(ti)

    def sample_fn(u2):
        n = u2.shape[0]
        W = jnp.broadcast_to(wi, (n, 3))
        return mf.sample_m_visible(
            jnp.full(n, dist), jnp.full(n, au), jnp.full(n, av), W, u2
        )

    def pdf_fn(m):
        n = m.shape[0]
        W = jnp.broadcast_to(wi, (n, 3))
        return mf.pdf_m_visible(
            jnp.full(n, dist), jnp.full(n, au), jnp.full(n, av), W, m
        )

    passed, p, msg = chi2_test(
        sample_fn, pdf_fn, n_samples=300_000, pdf_sub=32
    )
    assert passed, f"dist={dist} au={au} av={av} ti={ti}: {msg}"
    if below:
        # every sampled normal must stay +z-oriented
        u = jnp.stack(
            [jnp.linspace(0.01, 0.99, 64), jnp.linspace(0.99, 0.01, 64)],
            axis=-1,
        )
        m = sample_fn(u)
        assert float(jnp.min(m[..., 2])) > 0.0


def test_beckmann_slope_inversion_exact():
    """The Newton solve must invert the visible-slope CDF to ~f32
    machine precision across the whole u range."""
    for theta_deg in [5.0, 30.0, 60.0, 85.0]:
        ct = np.cos(np.radians(theta_deg))
        st = np.sin(np.radians(theta_deg))
        cot = ct / st
        u = np.linspace(1e-5, 1 - 1e-5, 20001)
        x = np.asarray(
            mf._beckmann_visible_slope_x(
                jnp.full(u.shape, ct, jnp.float32),
                jnp.asarray(u, jnp.float32),
            )
        ).astype(np.float64)

        def cdf(x):
            num = ct * (1 + erf(x)) / 2 + st * np.exp(-x * x) / (
                2 * np.sqrt(np.pi)
            )
            den = ct * (1 + erf(cot)) / 2 + st * np.exp(
                -cot * cot
            ) / (2 * np.sqrt(np.pi))
            return num / den

        resid = np.abs(cdf(x) - u)
        assert resid.max() < 5e-5, (theta_deg, resid.max())
        # monotone in u
        assert (np.diff(x) > -1e-5).all(), theta_deg


def test_vndf_weight_bounded():
    """f/pdf for a VNDF-sampled roughconductor is G2/G1 * F <= ~1 —
    the grazing-angle weight blowups of classic sampling are gone."""
    from mitsuba_tpu.core import rng

    n = 200_000
    u2 = rng.rand2(np.arange(n), 3, 5, 11)
    wi = _wi(82)
    W = jnp.broadcast_to(wi, (n, 3))
    for dist in (mf.BECKMANN, mf.GGX):
        d = jnp.full(n, dist)
        au = jnp.full(n, 0.15)
        m = mf.sample_m_visible(d, au, au, W, u2)
        pdf = mf.pdf_m_visible(d, au, au, W, m)
        # microfacet reflection weight without Fresnel:
        # D*G2/(4 ci) / (pdf/(4|wo.h|)) = D G2 |wi.m| / (ci pdf)
        import mitsuba_tpu.core.math as mm

        wo = 2.0 * mm.dot(W, m, keepdims=True) * m - W
        ok = (mm.cos_theta(wo) > 0) & (pdf > 1e-8)
        D = mf.microfacet_D(d, au, au, m)
        G = mf.smith_g(d, au, au, W, wo, m)
        w = (
            D
            * G
            * jnp.abs(mm.dot(W, m))
            / jnp.maximum(mm.cos_theta(W) * pdf, 1e-12)
        )
        w = jnp.where(ok, w, 0.0)
        assert float(jnp.max(w)) < 1.35, (dist, float(jnp.max(w)))
