"""4x4 affine/projective transforms.

Host-side construction in numpy (scene load time, mirrors reference
include/mitsuba/core/transform.h) + device-side application helpers for
point/vector/normal arrays with trailing dim 3.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Transform:
    """Matrix + inverse pair (reference transform.h:39 stores both)."""

    def __init__(self, m: np.ndarray, inv: np.ndarray | None = None):
        self.m = np.asarray(m, np.float64).reshape(4, 4)
        self.inv = (
            np.linalg.inv(self.m) if inv is None else np.asarray(inv, np.float64)
        )

    # -- constructors (reference transform.h / transform.cpp) --------------
    @staticmethod
    def identity():
        return Transform(np.eye(4))

    @staticmethod
    def translate(x, y, z):
        m = np.eye(4)
        m[:3, 3] = [x, y, z]
        return Transform(m)

    @staticmethod
    def scale(x, y, z):
        m = np.diag([x, y, z, 1.0])
        return Transform(m)

    @staticmethod
    def rotate(axis, angle_deg):
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        a = np.deg2rad(angle_deg)
        c, s = np.cos(a), np.sin(a)
        x, y, z = axis
        r = np.array(
            [
                [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
                [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
                [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
            ]
        )
        m = np.eye(4)
        m[:3, :3] = r
        return Transform(m)

    @staticmethod
    def look_at(origin, target, up):
        """Camera-to-world: +z looks at target, +y is up, +x is LEFT —
        Mitsuba's convention (reference transform.cpp lookAt: left-handed
        camera space, dir = z, right = cross(up, dir) ... actually
        newUp x dir ordering).  Matches reference Transform::lookAt."""
        origin = np.asarray(origin, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        d = target - origin
        d = d / np.linalg.norm(d)
        left = np.cross(up / np.linalg.norm(up), d)
        n = np.linalg.norm(left)
        if n < 1e-9:
            raise ValueError("lookAt: up and view direction are collinear")
        left /= n
        new_up = np.cross(d, left)
        m = np.eye(4)
        m[:3, 0] = left
        m[:3, 1] = new_up
        m[:3, 2] = d
        m[:3, 3] = origin
        return Transform(m)

    @staticmethod
    def perspective(fov_deg, near, far):
        """Projective transform used by the perspective sensor
        (reference transform.cpp Transform::perspective)."""
        recip = 1.0 / (far - near)
        cot = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
        m = np.array(
            [
                [cot, 0, 0, 0],
                [0, cot, 0, 0],
                [0, 0, far * recip, -near * far * recip],
                [0, 0, 1, 0],
            ]
        )
        return Transform(m)

    def __mul__(self, other: "Transform") -> "Transform":
        return Transform(self.m @ other.m, other.inv @ self.inv)

    def inverse(self) -> "Transform":
        return Transform(self.inv, self.m)

    @property
    def matrix(self):
        return self.m

    def transform_point_np(self, p):
        p = np.asarray(p, np.float64)
        r = p @ self.m[:3, :3].T + self.m[:3, 3]
        w = p @ self.m[3, :3].T + self.m[3, 3]
        return r / w[..., None] if np.ndim(w) else r / w

    def transform_vector_np(self, v):
        return np.asarray(v, np.float64) @ self.m[:3, :3].T

    def transform_normal_np(self, n):
        return np.asarray(n, np.float64) @ self.inv[:3, :3]

    def has_scale(self):
        lin = self.m[:3, :3]
        g = lin.T @ lin
        return not np.allclose(g, np.eye(3), atol=1e-6)

    def det3(self):
        return float(np.linalg.det(self.m[:3, :3]))


# --- device-side application -------------------------------------------------

def transform_point(m, p):
    """m: [4,4] (or broadcastable), p: [..., 3]."""
    m = jnp.asarray(m, jnp.float32)
    r = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return r / w[..., None]


def transform_vector(m, v):
    m = jnp.asarray(m, jnp.float32)
    return v @ m[:3, :3].T


def transform_normal(m_inv, n):
    """Normals transform by the inverse transpose: pass the INVERSE matrix."""
    m_inv = jnp.asarray(m_inv, jnp.float32)
    return n @ m_inv[:3, :3]
