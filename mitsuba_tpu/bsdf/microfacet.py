"""Microfacet distributions: Beckmann, GGX, Phong.

Rebuild of reference src/bsdfs/microfacet.h:45-100 as branch-free JAX —
D / G1 / full-distribution sampling + pdf.  Anisotropy is supported in
D and G; sampling currently targets the isotropic distribution (alpha =
sqrt(alpha_u*alpha_v)), with visible-normal sampling planned as a later
optimization.  All directions are in the local shading frame (+z = n).
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_tpu.core import math as mm

BECKMANN = 0
GGX = 1
PHONG = 2

_MIN_ALPHA = 1e-4


def clamp_alpha(a):
    return jnp.maximum(a, _MIN_ALPHA)


def microfacet_D(dist, alpha_u, alpha_v, m):
    """Microfacet normal distribution D(m) for all three families,
    selected per-lane by `dist`."""
    au = clamp_alpha(alpha_u)
    av = clamp_alpha(alpha_v)
    ct = mm.cos_theta(m)
    ct2 = ct * ct
    valid = ct > 0.0
    ct2s = jnp.maximum(ct2, 1e-12)
    # slope-space squared components: (mx/ct/au)^2 + (my/ct/av)^2
    sx = m[..., 0] / au
    sy = m[..., 1] / av
    exponent_arg = (sx * sx + sy * sy) / ct2s

    beckmann = jnp.exp(-exponent_arg) / (
        jnp.pi * au * av * ct2s * ct2s
    )

    root = ct2 + sx * sx + sy * sy
    ggx = 1.0 / (jnp.pi * au * av * jnp.maximum(root * root, 1e-12))

    # Phong with exponent derived from alpha (reference microfacet.h
    # interpolates alpha->exponent); use isotropic alpha
    a_iso = jnp.sqrt(au * av)
    exp_phong = 2.0 / (a_iso * a_iso) - 2.0
    phong = (
        (exp_phong + 2.0)
        * (0.5 / jnp.pi)
        * jnp.power(jnp.maximum(ct, 1e-12), exp_phong)
    )

    d = jnp.where(
        dist == BECKMANN, beckmann, jnp.where(dist == GGX, ggx, phong)
    )
    return jnp.where(valid, d, 0.0)


def smith_g1(dist, alpha_u, alpha_v, v, m):
    """Smith masking-shadowing for one direction
    (reference microfacet.h smithG1)."""
    au = clamp_alpha(alpha_u)
    av = clamp_alpha(alpha_v)
    ct = mm.cos_theta(v)
    # side check: v must be on the same side as m
    backside = mm.dot(v, m) * ct <= 0.0
    tan_theta = jnp.abs(mm.tan_theta(v))
    perp = tan_theta == 0.0

    # projected roughness along v's azimuth
    inv_sin2 = jnp.where(
        mm.sin_theta2(v) > 1e-12, 1.0 / jnp.maximum(mm.sin_theta2(v), 1e-12), 0.0
    )
    cos2_phi = v[..., 0] * v[..., 0] * inv_sin2
    sin2_phi = v[..., 1] * v[..., 1] * inv_sin2
    alpha = jnp.sqrt(cos2_phi * au * au + sin2_phi * av * av)
    alpha = jnp.where(mm.sin_theta2(v) > 1e-12, alpha, jnp.sqrt(au * av))

    a = 1.0 / jnp.maximum(alpha * tan_theta, 1e-12)
    # Beckmann rational approximation (reference microfacet.h:436)
    a2 = a * a
    beck = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2),
        1.0,
    )
    at2 = (alpha * tan_theta) ** 2
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + at2))
    # Phong: use Beckmann G with equivalent alpha (reference does the same)
    g = jnp.where(dist == GGX, ggx, beck)
    g = jnp.where(perp, 1.0, g)
    return jnp.where(backside, 0.0, g)


def smith_g(dist, alpha_u, alpha_v, wi, wo, m):
    return smith_g1(dist, alpha_u, alpha_v, wi, m) * smith_g1(
        dist, alpha_u, alpha_v, wo, m
    )


def sample_m(dist, alpha_u, alpha_v, u2):
    """Sample a microfacet normal m ~ D(m) cos(theta_m) (classic, not
    VNDF), with FULL anisotropy for Beckmann/GGX (the reference's
    microfacet.h sampleAll quadrant-corrected azimuth scheme); Phong
    uses the isotropic-equivalent alpha (as its D does)."""
    au = clamp_alpha(alpha_u)
    av = clamp_alpha(alpha_v)
    u0 = jnp.clip(u2[..., 0], 0.0, mm.ONE_MINUS_EPS)
    u1 = u2[..., 1]

    # anisotropic azimuth: phi = atan(av/au tan(pi + 2 pi u1)) +
    # pi*floor(2 u1 + 0.5)  (quadrant-correct)
    phi_a = jnp.arctan(
        av / au * jnp.tan(jnp.pi + 2.0 * jnp.pi * u1)
    ) + jnp.pi * jnp.floor(2.0 * u1 + 0.5)
    iso = jnp.abs(au - av) < 1e-7
    phi = jnp.where(iso, 2.0 * jnp.pi * u1, phi_a)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    inv_a2 = (cp * cp) / (au * au) + (sp * sp) / (av * av)
    a2 = 1.0 / jnp.maximum(inv_a2, 1e-12)

    # Beckmann: tan^2 = -a(phi)^2 ln(1-u)
    t2_beck = -a2 * jnp.log(jnp.maximum(1.0 - u0, 1e-20))
    # GGX: tan^2 = a(phi)^2 u/(1-u)
    t2_ggx = a2 * u0 / jnp.maximum(1.0 - u0, 1e-12)
    # Phong: cos = (1-u)^(1/(e+2)) with the isotropic exponent
    a_iso = jnp.sqrt(au * av)
    e_ph = 2.0 / (a_iso * a_iso) - 2.0
    ct_ph = jnp.power(jnp.maximum(1.0 - u0, 1e-20), 1.0 / (e_ph + 2.0))
    t2_ph = jnp.maximum(1.0 - ct_ph * ct_ph, 0.0) / jnp.maximum(
        ct_ph * ct_ph, 1e-12
    )

    tan2 = jnp.where(
        dist == BECKMANN, t2_beck, jnp.where(dist == GGX, t2_ggx, t2_ph)
    )
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = mm.safe_sqrt(1.0 - ct * ct)
    m = jnp.stack([st * cp, st * sp, ct], axis=-1)
    return m


def pdf_m(dist, alpha_u, alpha_v, m):
    """pdf of sample_m (solid angle over m) = D(m) * cos(theta_m) —
    the anisotropic D for Beckmann/GGX (its Phong branch is already
    isotropic-equivalent)."""
    return microfacet_D(dist, alpha_u, alpha_v, m) * jnp.maximum(
        mm.cos_theta(m), 0.0
    )


def project_roughness_to_alpha(roughness):
    """Identity for now; reference exposes `alpha` directly in most
    plugins (distributions are parameterized by Beckmann-equivalent
    alpha; microfacet.h transformRoughness applies for Phong)."""
    return roughness
