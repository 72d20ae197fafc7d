"""Emitter plugins (host-side descriptors).

Parity (reference src/emitters/*): area, point, spot, directional,
collimated, constant, envmap, sky/sun/sunsky (procedural sky planned —
currently approximated by a constant of matching average radiance).
Device-side sampling/eval lives in emitter/eval.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.scene.registry import register

AREA = 0
POINT = 1
SPOT = 2
DIRECTIONAL = 3
COLLIMATED = 4
CONSTANT = 5
ENVMAP = 6


@dataclass
class EmitterRecord:
    kind: int = AREA
    radiance: np.ndarray = field(
        default_factory=lambda: np.ones(3, np.float32)
    )  # area/constant/envmap scale
    intensity: np.ndarray = field(
        default_factory=lambda: np.ones(3, np.float32)
    )  # point/spot
    irradiance: np.ndarray = field(
        default_factory=lambda: np.ones(3, np.float32)
    )  # directional
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    direction: np.ndarray = field(
        default_factory=lambda: np.array([0, 0, 1], np.float32)
    )
    to_world: Transform = field(default_factory=Transform.identity)
    cutoff_angle_deg: float = 20.0
    beam_width_deg: float = 15.0
    sampling_weight: float = 1.0
    env_image: np.ndarray | None = None  # [H, W, 3] lat-long
    scale: float = 1.0
    # filled by the scene builder for area emitters:
    shape = None

    def is_env(self):
        return self.kind in (CONSTANT, ENVMAP)

    def is_delta(self):
        return self.kind in (POINT, SPOT, DIRECTIONAL, COLLIMATED)


class _EmitterBase:
    kind = AREA

    def __init__(self, props):
        self.props = props
        self.record = EmitterRecord(
            kind=self.kind,
            sampling_weight=props.get_float("samplingWeight", 1.0),
            to_world=props.get_transform("toWorld"),
        )
        self._finish(props)

    def _finish(self, props):
        pass


@register("emitter", "area")
class AreaEmitter(_EmitterBase):
    """reference: src/emitters/area.cpp"""

    kind = AREA

    def _finish(self, props):
        self.record.radiance = props.get_spectrum(
            "radiance", np.ones(3, np.float32)
        )


@register("emitter", "point")
class PointEmitter(_EmitterBase):
    """reference: src/emitters/point.cpp"""

    kind = POINT

    def _finish(self, props):
        self.record.intensity = props.get_spectrum(
            "intensity", np.ones(3, np.float32)
        )
        pos = props.get_point("position", None)
        if pos is not None:
            self.record.position = np.asarray(pos, np.float32)
        else:
            self.record.position = self.record.to_world.transform_point_np(
                np.zeros(3)
            ).astype(np.float32)


@register("emitter", "spot")
class SpotEmitter(_EmitterBase):
    """reference: src/emitters/spot.cpp — linear falloff between
    beamWidth and cutoffAngle."""

    kind = SPOT

    def _finish(self, props):
        self.record.intensity = props.get_spectrum(
            "intensity", np.ones(3, np.float32)
        )
        self.record.cutoff_angle_deg = props.get_float("cutoffAngle", 20.0)
        self.record.beam_width_deg = props.get_float(
            "beamWidth", self.record.cutoff_angle_deg * 3.0 / 4.0
        )
        t = self.record.to_world
        self.record.position = t.transform_point_np(np.zeros(3)).astype(
            np.float32
        )
        d = t.transform_vector_np(np.array([0.0, 0.0, 1.0]))
        self.record.direction = (d / np.linalg.norm(d)).astype(np.float32)


@register("emitter", "directional")
class DirectionalEmitter(_EmitterBase):
    """reference: src/emitters/directional.cpp"""

    kind = DIRECTIONAL

    def _finish(self, props):
        self.record.irradiance = props.get_spectrum(
            "irradiance", np.ones(3, np.float32)
        )
        d = props.get_vector("direction", None)
        if d is None:
            d = self.record.to_world.transform_vector_np(
                np.array([0.0, 0.0, 1.0])
            )
        self.record.direction = (
            np.asarray(d, np.float64) / np.linalg.norm(d)
        ).astype(np.float32)


@register("emitter", "collimated")
class CollimatedEmitter(_EmitterBase):
    """reference: src/emitters/collimated.cpp — a zero-radius beam."""

    kind = COLLIMATED

    def _finish(self, props):
        self.record.intensity = props.get_spectrum(
            "power", np.ones(3, np.float32)
        )
        t = self.record.to_world
        self.record.position = t.transform_point_np(np.zeros(3)).astype(
            np.float32
        )
        d = t.transform_vector_np(np.array([0.0, 0.0, 1.0]))
        self.record.direction = (d / np.linalg.norm(d)).astype(np.float32)


@register("emitter", "constant")
class ConstantEmitter(_EmitterBase):
    """reference: src/emitters/constant.cpp"""

    kind = CONSTANT

    def _finish(self, props):
        self.record.radiance = props.get_spectrum(
            "radiance", np.ones(3, np.float32)
        )


@register("emitter", "envmap")
class EnvMapEmitter(_EmitterBase):
    """reference: src/emitters/envmap.cpp — lat-long map with row/column
    CDF importance sampling (envmap.cpp:103-229)."""

    kind = ENVMAP

    def _finish(self, props):
        from mitsuba_tpu.io.images import read_image

        filename = props.resolve_path(props.get_string("filename"))
        img, is_ldr = read_image(filename)
        if is_ldr:
            from mitsuba_tpu.core.spectrum import srgb_degamma

            img = np.asarray(srgb_degamma(img))
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        self.record.env_image = np.asarray(img[..., :3], np.float32)
        self.record.scale = props.get_float("scale", 1.0)


def _sun_direction(props):
    """sunDirection property, or computed from date/time/location like
    the reference (src/emitters/sunsky/sun.cpp configure)."""
    from mitsuba_tpu.emitter.sky import sun_direction_from_time

    d = props.get_vector("sunDirection", None)
    if d is not None:
        d = np.asarray(d, np.float64)
        return d / np.linalg.norm(d)
    return sun_direction_from_time(
        int(props.get_int("year", 2010)),
        int(props.get_int("month", 7)),
        int(props.get_int("day", 10)),
        props.get_float("hour", 15.0)
        + props.get_float("minute", 0.0) / 60.0,
        props.get_float("latitude", 35.6894),
        props.get_float("longitude", 139.6917),
        props.get_float("timezone", 9.0),
    )


class _SkyBase(_EmitterBase):
    """Daylight model baked to a lat-long env map (= reference sky.cpp,
    which also rasterizes to a bitmap for sampling).  Default model is
    the reference's Hosek-Wilkie dataset fit (skymodel.cpp, data packed
    in mitsuba_tpu/data/hosek_rgb.npz); `model="preetham"` selects the
    older analytic model."""

    kind = ENVMAP
    _with_sun = False

    def _finish(self, props):
        from mitsuba_tpu.emitter.sky import (
            hosek_sky_image,
            preetham_sky_image,
        )

        model = props.get_string("model", "hosek").lower()
        bake = preetham_sky_image if model == "preetham" else hosek_sky_image
        sun_dir = _sun_direction(props)
        scale = props.get_float("scale", 1.0)
        self.record.env_image = bake(
            props.get_float("turbidity", 3.0),
            sun_dir,
            resolution=int(props.get_int("resolution", 512)) // 2,
            sky_scale=props.get_float("skyScale", 1.0) * scale,
            sun_scale=props.get_float("sunScale", 1.0) * scale,
            with_sun=self._with_sun,
            ground_albedo=float(
                np.mean(
                    props.get_spectrum(
                        "groundAlbedo", np.full(3, 0.15, np.float32)
                    )
                )
            ),
        )


@register("emitter", "sky")
class SkyEmitter(_SkyBase):
    """reference: src/emitters/sunsky/sky.cpp (Preetham variant)."""

    _with_sun = False


@register("emitter", "sunsky")
class SunSkyEmitter(_SkyBase):
    """reference: src/emitters/sunsky/sunsky.cpp — sky + the solar disk
    baked into the same map (the luminance CDF importance-samples it)."""

    _with_sun = True


@register("emitter", "sun")
class SunEmitter(_EmitterBase):
    """reference: src/emitters/sunsky/sun.cpp — directional sun with
    Preetham atmospheric transmittance."""

    kind = DIRECTIONAL

    def _finish(self, props):
        from mitsuba_tpu.emitter.sky import sun_irradiance_rgb

        scale = props.get_float("scale", 1.0) * props.get_float(
            "sunScale", 1.0
        )
        sun_dir = _sun_direction(props)
        turb = props.get_float("turbidity", 3.0)
        self.record.irradiance = (
            sun_irradiance_rgb(sun_dir[1], turb)
            * max(sun_dir[1], 0.0)  # irradiance on the ground plane
            * scale
        ).astype(np.float32)
        self.record.direction = (-sun_dir).astype(np.float32)
