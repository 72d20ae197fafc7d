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
FLUENCEMETER = 7
IRRADIANCEMETER = 8


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
    ray_weight: float = 1.0  # constant sampleRay importance (meters)
    parent_shape: object = None  # irradiancemeter's host shape
    film = None  # attached by the XML loader
    sampler = None

    def pack(self, width, height):
        """Device-side parameter dict for generate_rays."""
        aspect = width / height
        tan_half = math.tan(math.radians(self.xfov_deg) / 2.0)
        cam = {
            # static python ints/bools: only the scene's actual camera
            # model is traced into the render loop
            "kind": int(self.kind),
            "use_lens": bool(
                self.kind in (THINLENS, TELECENTRIC)
                and self.aperture_radius > 0
                # irradiancemeter: the lens stream supplies the
                # reference's `otherSample` (cosine direction draw)
                or self.kind == IRRADIANCEMETER
            ),
            "kc": (float(self.kc[0]), float(self.kc[1])),
            "to_world": jnp.asarray(self.to_world.m, jnp.float32),
            "tan_half_x": jnp.float32(tan_half),
            "aspect": jnp.float32(aspect),
            "near": jnp.float32(self.near_clip),
            "focus_dist": jnp.float32(self.focus_distance),
            "aperture": jnp.float32(self.aperture_radius),
        }
        if self.kind == IRRADIANCEMETER:
            cam.update(self._pack_irr())
        return cam

    def _pack_irr(self):
        """Position-sampling tables for the parent shape
        (reference irradiancemeter.cpp sampleRay -> samplePosition)."""
        inst = self.parent_shape
        if inst is None:
            raise ValueError(
                "irradiancemeter must be attached to a shape "
                "(reference irradiancemeter.cpp:80-83)"
            )
        if inst.spheres:
            s = inst.spheres[0]
            return {
                "irr_mode": "sphere",
                "irr_center": jnp.asarray(s.center, jnp.float32),
                "irr_radius": jnp.float32(s.radius),
                "irr_eps": jnp.float32(1e-4 * max(s.radius, 1e-3)),
            }
        if inst.meshes:
            v0l, e1l, e2l = [], [], []
            for m in inst.meshes:
                p = np.asarray(m.positions, np.float32)
                idx = np.asarray(m.indices, np.int64)
                v0l.append(p[idx[:, 0]])
                e1l.append(p[idx[:, 1]] - p[idx[:, 0]])
                e2l.append(p[idx[:, 2]] - p[idx[:, 0]])
            v0 = np.concatenate(v0l)
            e1 = np.concatenate(e1l)
            e2 = np.concatenate(e2l)
            area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
            total = max(float(area.sum()), 1e-12)
            cdf = np.cumsum(area / total).astype(np.float32)
            cdf[-1] = 1.0
            return {
                "irr_mode": "mesh",
                "irr_v0": jnp.asarray(v0),
                "irr_e1": jnp.asarray(e1),
                "irr_e2": jnp.asarray(e2),
                "irr_cdf": jnp.asarray(cdf),
                "irr_eps": jnp.float32(1e-4 * max(math.sqrt(total), 1e-3)),
            }
        raise ValueError("irradiancemeter: parent shape has no geometry")


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
    elif kind == FLUENCEMETER:
        # isotropic point probe: uniform-sphere directions, the film
        # averages the radiance through the point (reference
        # fluencemeter.cpp sampleRay — weight 1)
        z = 1.0 - 2.0 * sy
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * jnp.pi * sx
        d_cam = jnp.stack(
            [r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1
        )
        o_cam = jnp.zeros_like(d_cam)
    elif kind == IRRADIANCEMETER:
        # surface probe: origin sampled on the parent shape (pixel
        # sample -> area CDF), direction cosine-weighted about the
        # normal, constant weight pi applied at develop time
        # (reference irradiancemeter.cpp sampleRay:105-121).  The
        # parent geometry is already world space, so to_world is the
        # identity here.
        if cam["irr_mode"] == "sphere":
            z = 1.0 - 2.0 * sy
            r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            phi = 2.0 * jnp.pi * sx
            n = jnp.stack(
                [r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1
            )
            p = cam["irr_center"] + cam["irr_radius"] * n
        else:
            cdf = cam["irr_cdf"]
            ti = jnp.clip(
                jnp.searchsorted(cdf, sx, side="right"), 0, cdf.shape[0] - 1
            )
            lo = jnp.where(ti > 0, cdf[jnp.maximum(ti - 1, 0)], 0.0)
            hi = cdf[ti]
            u1 = jnp.clip((sx - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
            t = jnp.sqrt(jnp.maximum(u1, 0.0))
            b1 = 1.0 - t
            b2 = sy * t
            v0 = cam["irr_v0"][ti]
            e1 = cam["irr_e1"][ti]
            e2 = cam["irr_e2"][ti]
            p = v0 + b1[..., None] * e1 + b2[..., None] * e2
            n = mm.normalize(jnp.cross(e1, e2))
        local = warp.square_to_cosine_hemisphere(u_lens)
        frame = mm.Frame.from_normal(n)
        d_cam = frame.to_world(local)
        o_cam = p + n * cam["irr_eps"]
    else:
        raise ValueError(f"generate_rays: unknown sensor kind {kind}")

    o_world = o_cam @ tw[:3, :3].T + tw[:3, 3]
    d_world = mm.normalize(d_cam @ tw[:3, :3].T)
    return o_world, d_world


@register("sensor", "fluencemeter")
class FluenceMeter(_SensorBase):
    """reference: src/sensors/fluencemeter.cpp — isotropic point probe
    measuring the average radiance through its position (uniform-sphere
    ray directions, unit importance)."""

    kind = FLUENCEMETER

    def resolve_fov(self, width, height):
        pass


@register("sensor", "irradiancemeter")
class IrradianceMeter(_SensorBase):
    """reference: src/sensors/irradiancemeter.cpp — measures the
    average irradiance over the surface of its parent shape: position
    area-sampled on the shape, direction cosine-weighted about the
    normal, constant importance pi.  The XML loader attaches the parent
    (sensors nested in a <shape>)."""

    kind = IRRADIANCEMETER

    def _finish(self, props):
        if "toWorld" in props:
            raise ValueError(
                "irradiancemeter: 'toWorld' is not allowed — the "
                "transformation is inherited from the parent shape "
                "(reference irradiancemeter.cpp:80-83)"
            )
        self.record.ray_weight = float(np.pi)

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
