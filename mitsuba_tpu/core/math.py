"""Vector math on trailing-dimension arrays.

The reference implements TVector/TPoint/Frame as C++ value types
(reference: include/mitsuba/core/{vector.h,frame.h,util.h}).  Here every
"vector" is simply an array whose last axis has size 3, so everything is
batched and shape-polymorphic by construction and maps onto the TPU VPU.
All functions are jit/vmap-safe pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-4
INF = jnp.inf
ONE_MINUS_EPS = 0.99999994  # largest float32 < 1


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def normalize(v):
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v, keepdims=True), 1e-30))


def lerp(a, b, t):
    return a + (b - a) * t


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def sign(x):
    """Sign that never returns 0 (matches math::signum usage on cosines)."""
    return jnp.where(x >= 0.0, 1.0, -1.0)


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Duff et al. 2017 branchless construction — numerically stable,
    no data-dependent branching (TPU friendly).  Replaces
    reference include/mitsuba/core/util.h coordinateSystem().
    Returns (s, t) with [n s t] right-handed? We return s,t such that
    s x t = n approximately; Frame uses (s, t, n).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = sign(nz)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    t2 = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    return t1, t2


class Frame:
    """Shading frame: local z = normal.  (reference: include/mitsuba/core/frame.h)

    Stored as three world-space unit vectors (s, t, n), each [..., 3].
    Pytree-compatible (registered below) so it can cross jit boundaries.
    """

    def __init__(self, s, t, n):
        self.s, self.t, self.n = s, t, n

    @staticmethod
    def from_normal(n):
        s, t = coordinate_system(n)
        return Frame(s, t, n)

    def to_local(self, v):
        return jnp.stack(
            [dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1
        )

    def to_world(self, v):
        return (
            v[..., 0:1] * self.s + v[..., 1:2] * self.t + v[..., 2:3] * self.n
        )


jax.tree_util.register_pytree_node(
    Frame,
    lambda f: ((f.s, f.t, f.n), None),
    lambda _, c: Frame(*c),
)


# --- local-frame trig helpers (reference frame.h:85-130) -------------------

def cos_theta(w):
    return w[..., 2]


def cos_theta2(w):
    return w[..., 2] * w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin_theta2(w):
    return jnp.maximum(1.0 - w[..., 2] * w[..., 2], 0.0)


def sin_theta(w):
    return jnp.sqrt(sin_theta2(w))


def tan_theta(w):
    return sin_theta(w) / jnp.where(w[..., 2] == 0.0, 1e-20, w[..., 2])


def tan_theta2(w):
    c2 = cos_theta2(w)
    return jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-20)


def sin_phi_cos_phi(w):
    st = sin_theta(w)
    inv = jnp.where(st == 0.0, 0.0, 1.0 / jnp.maximum(st, 1e-20))
    cp = jnp.clip(w[..., 0] * inv, -1.0, 1.0)
    sp = jnp.clip(w[..., 1] * inv, -1.0, 1.0)
    # degenerate (normal incidence): pick phi = 0
    cp = jnp.where(st == 0.0, 1.0, cp)
    sp = jnp.where(st == 0.0, 0.0, sp)
    return sp, cp


def spherical_direction(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def spherical_coordinates(d):
    """Return (theta, phi in [0, 2pi))."""
    theta = safe_acos(d[..., 2])
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


# --- reflection / refraction / Fresnel --------------------------------------
# reference: include/mitsuba/core/util.h + src/libcore/util.cpp fresnel*

def reflect_local(wi):
    """Mirror reflection in the local frame (around +z)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def reflect(wi, n):
    """Reflect wi (pointing away from surface) about normal n."""
    return 2.0 * dot(wi, n, keepdims=True) * n - wi


def refract_local(wi, eta):
    """Refract in the local frame; eta = int_ior/ext_ior of the interface.

    Returns (wo, total_internal_reflection_mask, eta_rel) where eta_rel is
    the relative index actually crossed (eta if entering, 1/eta if exiting).
    """
    ci = cos_theta(wi)
    entering = ci > 0.0
    eta_rel = jnp.where(entering, eta, 1.0 / eta)
    inv_eta = 1.0 / eta_rel
    sin2_t = sin_theta2(wi) * inv_eta * inv_eta
    tir = sin2_t >= 1.0
    ct = safe_sqrt(1.0 - sin2_t) * -sign(ci)
    wo = jnp.stack(
        [-wi[..., 0] * inv_eta, -wi[..., 1] * inv_eta, ct], axis=-1
    )
    return wo, tir, eta_rel


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance of a dielectric interface.

    eta = int/ext relative IOR; handles both sides by sign of cos_theta_i.
    Matches reference src/libcore/util.cpp fresnelDielectricExt semantics.
    Returns (F, cos_theta_t, eta_te) with cos_theta_t signed (transmitted side).
    """
    entering = cos_theta_i > 0.0
    eta_rel = jnp.where(entering, eta, 1.0 / eta)
    ci = jnp.abs(cos_theta_i)
    sin2_t = (1.0 - ci * ci) / (eta_rel * eta_rel)
    tir = sin2_t >= 1.0
    ct = safe_sqrt(1.0 - sin2_t)
    rs = (ci - eta_rel * ct) / jnp.maximum(ci + eta_rel * ct, 1e-20)
    rp = (eta_rel * ci - ct) / jnp.maximum(eta_rel * ci + ct, 1e-20)
    F = 0.5 * (rs * rs + rp * rp)
    F = jnp.where(tir, 1.0, F)
    cos_theta_t = jnp.where(tir, 0.0, -sign(cos_theta_i) * ct)
    return F, cos_theta_t, eta_rel


def fresnel_conductor(cos_theta_i, eta, k):
    """Exact unpolarized conductor Fresnel (eta, k broadcast over channels).

    Matches reference src/libcore/util.cpp fresnelConductorExact.
    cos_theta_i: [...], eta/k: [..., C] -> returns [..., C].
    """
    ci = jnp.abs(cos_theta_i)[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2, k2 = eta * eta, k * k
    t0 = eta2 - k2 - si2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * eta2 * k2)
    t1 = a2b2 + ci2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fresnel_diffuse_reflectance(eta):
    """Average (diffuse) Fresnel reflectance for internal scattering.

    Fitted polynomials matching reference src/libcore/util.cpp:814-855
    fresnelDiffuseReflectance (fast variant): Egan & Hilgeman (1973) for
    eta < 1, d'Eon & Irving (2011) for eta >= 1.
    """
    eta = jnp.asarray(eta)
    lt1 = -1.4399 * eta * eta + 0.7099 * eta + 0.6681 + 0.0636 / eta
    ie = 1.0 / eta
    gt1 = (
        0.919317
        - 3.4793 * ie
        + 6.75335 * ie**2
        - 7.80989 * ie**3
        + 4.98554 * ie**4
        - 1.36881 * ie**5
    )
    return jnp.where(eta < 1.0, lt1, gt1)
