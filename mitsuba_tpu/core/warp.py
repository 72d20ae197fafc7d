"""Square-to-X sampling warps + pdfs.

Rebuild of reference include/mitsuba/core/warp.h / src/libcore/warp.cpp as
pure vectorized JAX functions.  Every warp takes uniform samples in
[0,1)^k with trailing dim k and returns points on the target domain; each
has a matching pdf (solid-angle measure for directional warps).
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_tpu.core.math import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(s):
    z = 1.0 - 2.0 * s[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf():
    return INV_FOURPI


def square_to_uniform_hemisphere(s):
    z = s[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf():
    return INV_TWOPI


def square_to_cosine_hemisphere(s):
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    # avoid exactly-grazing directions (reference warp.cpp uses the same warp)
    z = jnp.maximum(z, 1e-10)
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def uniform_disk_concentric_to_square(p):
    """Inverse of the Shirley-Chiu concentric mapping: disk point
    [..., 2] -> uniform square sample [..., 2].  Used by the manifold
    mutation to write a solved direction back into primary-sample
    space (the reference works in path space and never needs this)."""
    x, y = p[..., 0], p[..., 1]
    rr = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)  # (-pi, pi]
    q = jnp.pi / 4.0
    abs_t = jnp.abs(theta)
    # wedge 1: |theta| <= pi/4           (r1 = +r branch)
    r1_a = rr
    r2_a = rr * theta / q
    # wedge 2: pi/4 < theta < 3pi/4      (r2 = +r branch)
    r2_b = rr
    r1_b = (jnp.pi / 2.0 - theta) * rr / q
    # wedge 3: |theta| >= 3pi/4          (r1 = -r branch)
    phi_c = theta - jnp.sign(theta) * jnp.pi
    r1_c = -rr
    r2_c = -rr * phi_c / q
    # wedge 4: -3pi/4 < theta < -pi/4    (r2 = -r branch)
    phi_d = theta + jnp.pi
    r2_d = -rr
    r1_d = (jnp.pi / 2.0 - phi_d) * (-rr) / q

    in1 = abs_t <= q
    in2 = (theta > q) & (theta < 3.0 * q)
    in3 = abs_t >= 3.0 * q
    r1 = jnp.where(in1, r1_a, jnp.where(in2, r1_b, jnp.where(in3, r1_c, r1_d)))
    r2 = jnp.where(in1, r2_a, jnp.where(in2, r2_b, jnp.where(in3, r2_c, r2_d)))
    u = jnp.stack([(r1 + 1.0) * 0.5, (r2 + 1.0) * 0.5], axis=-1)
    return jnp.clip(u, 0.0, 1.0 - 1e-7)


def cosine_hemisphere_to_square(d):
    """Inverse of square_to_cosine_hemisphere for d with d_z >= 0."""
    return uniform_disk_concentric_to_square(d[..., 0:2])


def square_to_uniform_cone(s, cos_cutoff):
    """Uniform direction in a cone around +z with cos(angle) >= cos_cutoff."""
    z = 1.0 - s[..., 0] * (1.0 - cos_cutoff)
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / (1.0 - cos_cutoff)


def square_to_uniform_disk(s):
    r = jnp.sqrt(s[..., 0])
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_pdf():
    return INV_PI


def square_to_uniform_disk_concentric(s):
    """Shirley-Chiu concentric disk mapping (low distortion)."""
    r1 = 2.0 * s[..., 0] - 1.0
    r2 = 2.0 * s[..., 1] - 1.0
    use_r1 = jnp.abs(r1) > jnp.abs(r2)
    r = jnp.where(use_r1, r1, r2)
    safe_den = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        use_r1,
        (jnp.pi / 4.0) * (r2 / safe_den),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (r1 / safe_den),
    )
    phi = jnp.where(r == 0.0, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_triangle(s):
    """Barycentric warp (a = 1-sqrt(u1), b = u2*sqrt(u1))."""
    t = safe_sqrt(s[..., 0])
    return jnp.stack([1.0 - t, t * s[..., 1]], axis=-1)


def square_to_std_normal(s):
    """Box-Muller transform to a 2D standard normal."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-38)))
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWOPI * jnp.exp(-0.5 * (p[..., 0] ** 2 + p[..., 1] ** 2))


def square_to_tent(s):
    """1D tent over [-1, 1] applied per component."""

    def tent1(x):
        return jnp.where(
            x < 0.5,
            jnp.sqrt(2.0 * x) - 1.0,
            1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 0.0)),
        )

    return tent1(s)


def interval_to_nonuniform_tent(a, b, c, s):
    """Warp [0,1] to a tent on [a, c] peaking at b (reference warp.h:101)."""
    lhs = s * (c - a) < (b - a)
    f = jnp.where(lhs, a - b, c - b)
    lo = jnp.where(lhs, a, c)
    sp = jnp.where(lhs, s * (c - a) / jnp.where(b == a, 1.0, b - a),
                   (c - a) * (1.0 - s) / jnp.where(c == b, 1.0, c - b))
    return b + f * (1.0 - safe_sqrt(jnp.clip(sp, 0.0, 1.0)))


def square_to_phase_hg(s, g):
    """Henyey-Greenstein phase direction around +z (forward = +z).

    reference: src/phase/hg.cpp sample().
    """
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-4
    sqr = (1.0 - g * g) / jnp.where(
        jnp.abs(1.0 - g + 2.0 * g * s[..., 0]) < 1e-10,
        1e-10,
        1.0 - g + 2.0 * g * s[..., 0],
    )
    cos_theta_hg = (1.0 + g * g - sqr * sqr) / jnp.where(iso, 1.0, 2.0 * g)
    cos_theta = jnp.where(iso, 1.0 - 2.0 * s[..., 0], cos_theta_hg)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )


def square_to_phase_hg_pdf(cos_theta, g):
    g = jnp.asarray(g)
    tmp = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.maximum(
        tmp * safe_sqrt(tmp), 1e-20
    )
