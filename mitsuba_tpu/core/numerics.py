"""Numerical utilities: quadrature, root finding, splines, spherical
harmonics, von Mises-Fisher.

Rebuild of the reference's scattered numeric helpers
(reference: include/mitsuba/core/{quad.h:36-139, brent.h:38,
spline.h:41-178, sh.h:56-120, vmf.h:37}).  Host-side (numpy) for
precomputation tables; the spline evaluators also accept jnp arrays so
baked tables can be interpolated on-device.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# quadrature (reference quad.h GaussLobattoIntegrator / gauss-legendre)
# ---------------------------------------------------------------------------

def gauss_legendre(n: int):
    """Nodes/weights on [-1, 1] (reference quad.h gaussLegendre)."""
    return np.polynomial.legendre.leggauss(n)


def integrate_gl(f, a: float, b: float, n: int = 64) -> float:
    """Fixed-order Gauss-Legendre integral of a scalar function."""
    x, w = gauss_legendre(n)
    xm, xr = 0.5 * (a + b), 0.5 * (b - a)
    return float(xr * np.sum(w * f(xm + xr * x)))


def integrate_simpson(f, a: float, b: float, n: int = 129) -> float:
    """Composite Simpson (reference quad.h NDIntegrator fallback)."""
    if n % 2 == 0:
        n += 1
    x = np.linspace(a, b, n)
    y = f(x)
    h = (b - a) / (n - 1)
    return float(h / 3.0 * (y[0] + y[-1] + 4 * y[1:-1:2].sum()
                            + 2 * y[2:-1:2].sum()))


# ---------------------------------------------------------------------------
# Brent's method (reference brent.h BrentSolver:38)
# ---------------------------------------------------------------------------

def brent(f, a: float, b: float, xtol: float = 1e-10,
          max_iters: int = 100) -> float:
    """Root of f in [a, b]; f(a), f(b) must bracket the root."""
    fa, fb = f(a), f(b)
    if fa * fb > 0:
        raise ValueError("brent: root not bracketed")
    if abs(fa) < abs(fb):
        a, b, fa, fb = b, a, fb, fa
    c, fc = a, fa
    d = e = b - a
    for _ in range(max_iters):
        if fb == 0.0 or abs(b - a) < xtol:
            return b
        if fa != fc and fb != fc:
            # inverse quadratic interpolation
            s = (
                a * fb * fc / ((fa - fb) * (fa - fc))
                + b * fa * fc / ((fb - fa) * (fb - fc))
                + c * fa * fb / ((fc - fa) * (fc - fb))
            )
        else:
            s = b - fb * (b - a) / (fb - fa)  # secant
        lo, hi = min((3 * a + b) / 4, b), max((3 * a + b) / 4, b)
        if not (lo < s < hi):
            s = 0.5 * (a + b)  # bisection fallback
        fs = f(s)
        c, fc = b, fb
        if fa * fs < 0:
            b, fb = s, fs
        else:
            a, fa = s, fs
        if abs(fa) < abs(fb):
            a, b, fa, fb = b, a, fb, fa
    return b


# ---------------------------------------------------------------------------
# Catmull-Rom / natural cubic splines (reference spline.h:41-178)
# ---------------------------------------------------------------------------

def spline_coeffs(x, values):
    """Natural cubic spline second-derivative table (1D)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(values, np.float64)
    n = len(x)
    m = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * m[i - 1] + 2.0
        m[i] = (sig - 1.0) / p
        u[i] = (
            (y[i + 1] - y[i]) / (x[i + 1] - x[i])
            - (y[i] - y[i - 1]) / (x[i] - x[i - 1])
        )
        u[i] = (6.0 * u[i] / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    for i in range(n - 2, -1, -1):
        m[i] = m[i] * m[i + 1] + u[i]
    return m


def spline_eval(x, values, m, xq):
    """Evaluate the natural cubic spline at xq (numpy or jax arrays)."""
    import jax.numpy as jnp

    xp = jnp if hasattr(xq, "device") or isinstance(
        xq, type(jnp.zeros(1))
    ) else np
    x = xp.asarray(x)
    y = xp.asarray(values)
    m = xp.asarray(m)
    i = xp.clip(xp.searchsorted(x, xq) - 1, 0, len(values) - 2)
    h = x[i + 1] - x[i]
    a = (x[i + 1] - xq) / h
    b = (xq - x[i]) / h
    return (
        a * y[i] + b * y[i + 1]
        + ((a**3 - a) * m[i] + (b**3 - b) * m[i + 1]) * (h * h) / 6.0
    )


# ---------------------------------------------------------------------------
# real spherical harmonics (reference sh.h SHVector:56)
# ---------------------------------------------------------------------------

def sh_eval(l_max: int, d):
    """Real SH basis values up to band l_max at unit directions d
    [..., 3].  Returns [..., (l_max+1)^2] (numpy)."""
    d = np.asarray(d, np.float64)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = np.zeros(d.shape[:-1] + ((l_max + 1) ** 2,))
    out[..., 0] = 0.28209479177387814  # Y00
    if l_max >= 1:
        out[..., 1] = -0.4886025119029199 * y
        out[..., 2] = 0.4886025119029199 * z
        out[..., 3] = -0.4886025119029199 * x
    if l_max >= 2:
        out[..., 4] = 1.0925484305920792 * x * y
        out[..., 5] = -1.0925484305920792 * y * z
        out[..., 6] = 0.31539156525252005 * (3 * z * z - 1)
        out[..., 7] = -1.0925484305920792 * x * z
        out[..., 8] = 0.5462742152960396 * (x * x - y * y)
    if l_max >= 3:
        out[..., 9] = -0.5900435899266435 * y * (3 * x * x - y * y)
        out[..., 10] = 2.890611442640554 * x * y * z
        out[..., 11] = -0.4570457994644658 * y * (5 * z * z - 1)
        out[..., 12] = 0.3731763325901154 * z * (5 * z * z - 3)
        out[..., 13] = -0.4570457994644658 * x * (5 * z * z - 1)
        out[..., 14] = 1.445305721320277 * z * (x * x - y * y)
        out[..., 15] = -0.5900435899266435 * x * (x * x - 3 * y * y)
    if l_max >= 4:
        raise NotImplementedError("sh_eval: bands above 3")
    return out


def sh_project(l_max: int, f, n_samples: int = 10000, seed: int = 0):
    """MC-project a function of direction onto SH coefficients."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n_samples, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    phi = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
    basis = sh_eval(l_max, d)
    vals = f(d)
    return 4 * np.pi * np.mean(vals[:, None] * basis, axis=0)


# ---------------------------------------------------------------------------
# von Mises-Fisher (reference vmf.h:37)
# ---------------------------------------------------------------------------

def vmf_pdf(kappa: float, cos_theta):
    """vMF density wrt solid angle (axis at +z)."""
    cos_theta = np.asarray(cos_theta)
    if kappa < 1e-6:
        return np.full_like(cos_theta, 1.0 / (4 * np.pi))
    return (
        kappa / (2 * np.pi * (1 - np.exp(-2 * kappa)))
        * np.exp(kappa * (cos_theta - 1))
    )


def vmf_fit(mean_cos: float) -> float:
    """Concentration from the mean resultant length (Banerjee et al.
    approximation, = vmf.h forMeanCosine)."""
    r = float(np.clip(mean_cos, 0.0, 0.9999))
    return r * (3.0 - r * r) / (1.0 - r * r)


def vmf_sample(kappa: float, u2):
    """Sample directions around +z (numpy)."""
    u2 = np.asarray(u2)
    if kappa < 1e-6:
        cos_t = 1.0 - 2.0 * u2[..., 0]
    else:
        cos_t = 1.0 + np.log1p(
            np.expm1(-2.0 * kappa) * u2[..., 0]
        ) / kappa
    sin_t = np.sqrt(np.maximum(1.0 - cos_t**2, 0.0))
    phi = 2 * np.pi * u2[..., 1]
    return np.stack(
        [sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], axis=-1
    )
