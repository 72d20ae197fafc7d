"""Sensor (camera) plugins + device-side ray generation.

Parity: perspective, thinlens, orthographic, telecentric, spherical,
radiancemeter, fluencemeter, irradiancemeter
(reference: src/sensors/*.cpp, src/librender/sensor.cpp).

Ray generation reproduces the reference's sample->camera mapping
(reference perspective.cpp:145-157):
    d_cam ∝ ((1-2sx)·tan(xfov/2), (1-2sy)/aspect·tan(xfov/2), 1)
i.e. camera space is left-handed with +z = viewing direction and +x
pointing LEFT on screen (matches Transform.look_at's `left` column).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.scene.registry import register

PERSPECTIVE = 0
THINLENS = 1
ORTHOGRAPHIC = 2
SPHERICAL = 3
RADIANCEMETER = 4
TELECENTRIC = 5
RDIST = 6


@dataclass
class SensorRecord:
    kind: int = PERSPECTIVE
    to_world: Transform = field(default_factory=Transform.identity)
    xfov_deg: float = 40.0
    near_clip: float = 1e-2
    far_clip: float = 1e4
    focus_distance: float = 1e4
    aperture_radius: float = 0.0
    shutter_open: float = 0.0
    shutter_close: float = 0.0
    kc: tuple = (0.0, 0.0)  # radial distortion (perspective_rdist)
    film = None  # attached by the XML loader
    sampler = None

    def pack(self, width, height):
        """Device-side parameter dict for generate_rays."""
        aspect = width / height
        tan_half = math.tan(math.radians(self.xfov_deg) / 2.0)
        return {
            # static python ints/bools: only the scene's actual camera
            # model is traced into the render loop
            "kind": int(self.kind),
            "use_lens": bool(
                self.kind in (THINLENS, TELECENTRIC)
                and self.aperture_radius > 0
            ),
            "kc": (float(self.kc[0]), float(self.kc[1])),
            "to_world": jnp.asarray(self.to_world.m, jnp.float32),
            "tan_half_x": jnp.float32(tan_half),
            "aspect": jnp.float32(aspect),
            "near": jnp.float32(self.near_clip),
            "focus_dist": jnp.float32(self.focus_distance),
            "aperture": jnp.float32(self.aperture_radius),
        }


def _resolve_xfov(props, aspect):
    """fov / fovAxis / focalLength handling
    (reference src/librender/sensor.cpp:221-264)."""
    if "focalLength" in props:
        # 35mm-film equivalent focal length (36x24mm frame, diagonal fov)
        f = props.get_float("focalLength", 50.0)
        diag = math.hypot(36.0, 24.0)
        fov = math.degrees(2.0 * math.atan(diag / (2.0 * f)))
        axis = "diagonal"
    else:
        fov = props.get_float("fov", 40.0)
        axis = props.get_string("fovAxis", "x").lower()
    if axis == "smaller":
        axis = "y" if aspect > 1 else "x"
    elif axis == "larger":
        axis = "x" if aspect > 1 else "y"
    t = math.tan(math.radians(fov) / 2.0)
    if axis == "x":
        return fov
    if axis == "y":
        return math.degrees(2.0 * math.atan(t * aspect))
    if axis == "diagonal":
        tx = t / math.sqrt(1.0 + 1.0 / (aspect * aspect))
        return math.degrees(2.0 * math.atan(tx))
    raise ValueError(f"bad fovAxis '{axis}'")


class _SensorBase:
    kind = PERSPECTIVE

    def __init__(self, props):
        self.props = props
        self.record = SensorRecord(
            kind=self.kind,
            to_world=props.get_transform("toWorld"),
            near_clip=props.get_float("nearClip", 1e-2),
            far_clip=props.get_float("farClip", 1e4),
            focus_distance=props.get_float("focusDistance", 1e4),
            shutter_open=props.get_float("shutterOpen", 0.0),
            shutter_close=props.get_float("shutterClose", 0.0),
        )
        self._finish(props)

    def _finish(self, props):
        pass

    def resolve_fov(self, width, height):
        self.record.xfov_deg = _resolve_xfov(self.props, width / height)


@register("sensor", "perspective")
class Perspective(_SensorBase):
    kind = PERSPECTIVE


@register("sensor", "thinlens")
class ThinLens(_SensorBase):
    kind = THINLENS

    def _finish(self, props):
        self.record.aperture_radius = props.get_float("apertureRadius", 0.1)


@register("sensor", "orthographic")
class Orthographic(_SensorBase):
    kind = ORTHOGRAPHIC

    def resolve_fov(self, width, height):
        pass


@register("sensor", "telecentric")
class Telecentric(_SensorBase):
    """reference: src/sensors/telecentric.cpp — orthographic projection
    with a finite aperture focused at focusDistance (rays converge from
    the aperture disk to the per-pixel focus point)."""

    kind = TELECENTRIC

    def _finish(self, props):
        self.record.aperture_radius = props.get_float("apertureRadius", 0.0)

    def resolve_fov(self, width, height):
        pass


@register("sensor", "spherical")
class Spherical(_SensorBase):
    kind = SPHERICAL

    def resolve_fov(self, width, height):
        pass


@register("sensor", "radiancemeter")
class RadianceMeter(_SensorBase):
    kind = RADIANCEMETER

    def resolve_fov(self, width, height):
        pass


def generate_rays(cam, pos01, u_lens):
    """Generate world-space primary rays.

    cam: packed dict from SensorRecord.pack
    pos01: [..., 2] film position in [0,1)^2 (x right, y down)
    u_lens: [..., 2] aperture samples (thinlens)
    Returns (origins [...,3], directions [...,3]).
    """
    sx, sy = pos01[..., 0], pos01[..., 1]
    tw = cam["to_world"]
    kind = int(cam["kind"])  # STATIC — one camera model traced per scene
    th = cam["tan_half_x"]
    aspect = cam["aspect"]

    if kind in (PERSPECTIVE, THINLENS, RDIST):
        # perspective / thinlens camera-space direction
        x = (1.0 - 2.0 * sx) * th
        y = (1.0 - 2.0 * sy) * th / aspect
        if kind == RDIST:
            # undo the calibrated radial distortion: solve
            # r'(1 + kc0 r'^2 + kc1 r'^4) = r by Newton iteration
            # (reference perspective_rdist.cpp invertDistortion)
            kc0, kc1 = cam["kc"]
            r = jnp.sqrt(x * x + y * y)
            rp = r
            for _ in range(5):
                r2 = rp * rp
                f = rp * (1.0 + r2 * (kc0 + r2 * kc1)) - r
                df = 1.0 + r2 * (3.0 * kc0 + 5.0 * kc1 * r2)
                rp = rp - f / df
            corr = jnp.where(r > 1e-9, rp / jnp.maximum(r, 1e-9), 1.0)
            x = x * corr
            y = y * corr
        d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        d_cam = mm.normalize(d_cam)
        o_cam = jnp.zeros_like(d_cam)
        if cam["use_lens"]:
            # thinlens: offset origin on the aperture disk, re-aim at the
            # focal plane (reference src/sensors/thinlens.cpp sampleRay)
            p_lens = (
                warp.square_to_uniform_disk_concentric(u_lens)
                * cam["aperture"]
            )
            t_focus = cam["focus_dist"] / jnp.maximum(d_cam[..., 2], 1e-6)
            p_focus = d_cam * t_focus[..., None]
            o_cam = jnp.stack(
                [p_lens[..., 0], p_lens[..., 1], jnp.zeros_like(sx)], axis=-1
            )
            d_cam = mm.normalize(p_focus - o_cam)
    elif kind == TELECENTRIC:
        # orthographic projection + finite aperture focused at
        # focusDistance (reference telecentric.cpp sampleRay: origin on
        # the shifted aperture disk, direction toward the focus point)
        img = jnp.stack(
            [(1.0 - 2.0 * sx), (1.0 - 2.0 * sy) / aspect,
             jnp.zeros_like(sx)], axis=-1,
        )
        if cam["use_lens"]:
            p_lens = (
                warp.square_to_uniform_disk_concentric(u_lens)
                * cam["aperture"]
            )
            o_cam = img + jnp.stack(
                [p_lens[..., 0], p_lens[..., 1], jnp.zeros_like(sx)],
                axis=-1,
            )
            focus_p = img + jnp.stack(
                [jnp.zeros_like(sx), jnp.zeros_like(sx),
                 jnp.broadcast_to(cam["focus_dist"], sx.shape)], axis=-1,
            )
            d_cam = mm.normalize(focus_p - o_cam)
        else:
            o_cam = img
            d_cam = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], jnp.float32), o_cam.shape
            )
    elif kind == ORTHOGRAPHIC:
        # orthographic: parallel rays from the image plane
        # (reference src/sensors/orthographic.cpp; extent = [-1,1] x aspect)
        o_cam = jnp.stack(
            [(1.0 - 2.0 * sx), (1.0 - 2.0 * sy) / aspect, jnp.zeros_like(sx)],
            axis=-1,
        )
        d_cam = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), o_cam.shape
        )
    elif kind == SPHERICAL:
        # full lat-long panorama (reference src/sensors/spherical.cpp)
        theta = sy * jnp.pi
        phi = sx * 2.0 * jnp.pi - jnp.pi / 2.0
        d_cam = jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.cos(theta),
                jnp.sin(theta) * jnp.sin(phi),
            ],
            axis=-1,
        )
        o_cam = jnp.zeros_like(d_cam)
    elif kind == RADIANCEMETER:
        # single ray along +z
        o_cam = jnp.zeros(pos01.shape[:-1] + (3,), jnp.float32)
        d_cam = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), o_cam.shape
        )
    else:
        raise ValueError(f"generate_rays: unknown sensor kind {kind}")

    o_world = o_cam @ tw[:3, :3].T + tw[:3, 3]
    d_world = mm.normalize(d_cam @ tw[:3, :3].T)
    return o_world, d_world


@register("sensor", "fluencemeter")
class FluenceMeter(_SensorBase):
    """reference: src/sensors/fluencemeter.cpp — isotropic point probe."""

    kind = SPHERICAL

    def resolve_fov(self, width, height):
        pass


@register("sensor", "irradiancemeter")
class IrradianceMeter(_SensorBase):
    """reference: src/sensors/irradiancemeter.cpp — cosine-weighted
    hemisphere probe attached to a shape (approximated by a spherical
    capture; exact shape attachment planned)."""

    kind = SPHERICAL

    def resolve_fov(self, width, height):
        pass


@register("sensor", "perspective_rdist")
class PerspectiveRDist(_SensorBase):
    """reference: src/sensors/perspective_rdist.cpp — perspective with
    the 2nd/4th-order radial distortion polynomial kc applied during
    ray generation (Newton inversion, perspective_rdist.cpp
    invertDistortion)."""

    kind = RDIST

    def _finish(self, props):
        kc = [
            float(x)
            for x in props.get_string("kc", "0, 0").replace(",", " ").split()
        ]
        while len(kc) < 2:
            kc.append(0.0)
        self.record.kc = (kc[0], kc[1])
