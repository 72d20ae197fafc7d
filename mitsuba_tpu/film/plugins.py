"""Film + reconstruction-filter plugins.

Films (reference src/films/*): hdrfilm (EXR/RGBE/PFM), tiledhdrfilm
(treated as hdrfilm — out-of-core tiling is unnecessary on TPU where the
film lives in HBM), ldrfilm (PNG with gamma / Reinhard tonemap), mfilm
(numpy/ascii output for measurement sensors).

Reconstruction filters (reference src/rfilters/*, rfilter.h): box, tent,
gaussian, mitchell, catmullrom, lanczos.  The reference discretizes each
kernel into a 31-entry LUT (rfilter.h:28); we evaluate them exactly on
device inside the splat kernel — ALU is cheaper than a gather on TPU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.scene.registry import register

BOX = 0
TENT = 1
GAUSSIAN = 2
MITCHELL = 3
CATMULLROM = 4
LANCZOS = 5


@dataclass
class RFilterRecord:
    kind: int = BOX
    radius: float = 0.5
    stddev: float = 0.5
    b: float = 1.0 / 3.0
    c: float = 1.0 / 3.0
    lobes: int = 3


class _RFilterBase:
    kind = BOX

    def __init__(self, props):
        self.record = self._build(props)

    def _build(self, props):
        return RFilterRecord(kind=self.kind, radius=0.5)


@register("rfilter", "box")
class BoxFilter(_RFilterBase):
    kind = BOX


@register("rfilter", "tent")
class TentFilter(_RFilterBase):
    kind = TENT

    def _build(self, props):
        return RFilterRecord(kind=TENT, radius=1.0)


@register("rfilter", "gaussian")
class GaussianFilter(_RFilterBase):
    kind = GAUSSIAN

    def _build(self, props):
        stddev = props.get_float("stddev", 0.5)
        return RFilterRecord(kind=GAUSSIAN, radius=2.0, stddev=stddev)


@register("rfilter", "mitchell")
class MitchellFilter(_RFilterBase):
    kind = MITCHELL

    def _build(self, props):
        return RFilterRecord(
            kind=MITCHELL,
            radius=2.0,
            b=props.get_float("B", 1.0 / 3.0),
            c=props.get_float("C", 1.0 / 3.0),
        )


@register("rfilter", "catmullrom")
class CatmullRomFilter(_RFilterBase):
    kind = CATMULLROM

    def _build(self, props):
        return RFilterRecord(kind=CATMULLROM, radius=2.0, b=0.0, c=0.5)


@register("rfilter", "lanczos")
class LanczosFilter(_RFilterBase):
    kind = LANCZOS

    def _build(self, props):
        lobes = props.get_int("lobes", 3)
        return RFilterRecord(kind=LANCZOS, radius=float(lobes), lobes=lobes)


def filter_importance_sample(rec: RFilterRecord, u2):
    """Sample a film-position jitter ~ the reconstruction filter
    (filter importance sampling: each sample then contributes to exactly
    one pixel with weight 1 — the TPU-fast path, no splatting).

    Only valid for non-negative kernels (box/tent/gaussian); returns
    None for kernels with negative lobes.  u2: jnp [..., 2] uniforms.
    Offsets are relative to the pixel corner; values may leave [0,1).
    """
    import jax.numpy as jnp

    if rec.kind == BOX:
        return u2
    if rec.kind == TENT:
        from mitsuba_tpu.core.warp import square_to_tent

        return 0.5 + square_to_tent(u2)
    if rec.kind == GAUSSIAN:
        from mitsuba_tpu.core.warp import square_to_std_normal

        n = square_to_std_normal(u2) * rec.stddev
        # clamp to the kernel support (bias < 1e-4 for radius = 4 sigma)
        n = jnp.clip(n, -rec.radius, rec.radius)
        return 0.5 + n
    return None


def supports_fis(rec: RFilterRecord) -> bool:
    return rec.kind in (BOX, TENT, GAUSSIAN)


@dataclass
class FilmRecord:
    width: int = 768
    height: int = 576
    crop_offset: tuple = (0, 0)
    crop_size: tuple | None = None
    file_format: str = "openexr"
    pixel_format: str = "rgb"
    component_format: str = "float16"
    banner: bool = False
    high_quality_edges: bool = False
    rfilter: RFilterRecord = field(default_factory=lambda: RFilterRecord(GAUSSIAN, 2.0))
    # ldrfilm
    is_ldr: bool = False
    tonemap: str = "gamma"
    gamma: float = -1.0  # -1 = sRGB
    exposure: float = 0.0
    key: float = 0.18
    burn: float = 0.0
    # mfilm
    is_mfilm: bool = False
    digits: int = 4
    variable: str = "data"
    # tiledhdrfilm: banded rendering + host memory-map spill
    out_of_core: bool = False

    def develop_to_array(self, image: np.ndarray) -> np.ndarray:
        """Post-process a linear HDR image for output
        (reference src/films/{hdrfilm,ldrfilm}.cpp develop)."""
        if not self.is_ldr:
            return image
        img = image * (2.0 ** self.exposure)
        if self.tonemap == "reinhard":
            # photographic tonemapping (reference ldrfilm.cpp:267)
            from mitsuba_tpu.core.spectrum import luminance as lum_f

            lum = np.maximum(lum_f(img), 1e-8)
            log_avg = np.exp(np.mean(np.log(lum + 1e-6)))
            scale = self.key / log_avg
            lum_s = lum * scale
            burn = min(max(self.burn, 0.0), 1.0)
            lwhite = np.max(lum_s) * (1.0 - burn) + burn * 1e8
            mapped = (
                lum_s * (1.0 + lum_s / (lwhite * lwhite)) / (1.0 + lum_s)
            )
            img = img * (mapped / lum)[..., None]
        if self.gamma <= 0:
            from mitsuba_tpu.core.spectrum import srgb_gamma

            img = np.asarray(srgb_gamma(np.clip(img, 0.0, 1.0)))
        else:
            img = np.power(np.clip(img, 0.0, 1.0), 1.0 / self.gamma)
        return img

    def output_extension(self):
        if self.is_mfilm:
            return ".npy" if self.file_format == "numpy" else ".m"
        if self.is_ldr:
            return ".png"
        return {
            "openexr": ".exr",
            "rgbe": ".hdr",
            "pfm": ".pfm",
        }.get(self.file_format, ".exr")


class _FilmBase:
    def __init__(self, props):
        rec = FilmRecord(
            width=props.get_int("width", 768),
            height=props.get_int("height", 576),
            file_format=props.get_string("fileFormat", "openexr").lower(),
            pixel_format=props.get_string("pixelFormat", "rgb").lower(),
            component_format=props.get_string(
                "componentFormat", "float16"
            ).lower(),
            banner=props.get_bool("banner", False),
            high_quality_edges=props.get_bool("highQualityEdges", False),
        )
        cx = props.get_int("cropOffsetX", 0)
        cy = props.get_int("cropOffsetY", 0)
        cw = props.get_int("cropWidth", rec.width)
        ch = props.get_int("cropHeight", rec.height)
        rec.crop_offset = (cx, cy)
        rec.crop_size = (cw, ch)
        # attach rfilter child if present, else gaussian default
        for name, child in props.children:
            if getattr(child, "record", None) is not None and isinstance(
                child.record, RFilterRecord
            ):
                rec.rfilter = child.record
        self.record = rec
        self._finish(props)

    def _finish(self, props):
        pass


@register("film", "hdrfilm")
class HDRFilm(_FilmBase):
    pass


@register("film", "tiledhdrfilm")
class TiledHDRFilm(_FilmBase):
    """Out-of-core hdrfilm (reference src/films/tiledhdrfilm.cpp): the
    renderer renders row bands and flushes each developed band to a
    host memory-map, so the full film never occupies device memory."""

    def _finish(self, props):
        self.record.out_of_core = True


@register("film", "ldrfilm")
class LDRFilm(_FilmBase):
    def _finish(self, props):
        self.record.is_ldr = True
        self.record.tonemap = props.get_string("tonemapMethod", "gamma")
        self.record.gamma = props.get_float("gamma", -1.0)
        self.record.exposure = props.get_float("exposure", 0.0)
        self.record.key = props.get_float("key", 0.18)
        self.record.burn = props.get_float("burn", 0.0)
        self.record.file_format = "png"


@register("film", "mfilm")
class MFilm(_FilmBase):
    def _finish(self, props):
        self.record.is_mfilm = True
        self.record.digits = props.get_int("digits", 4)
        self.record.variable = props.get_string("variable", "data")
        self.record.file_format = props.get_string(
            "fileFormat", "matlab"
        ).lower()
        # measurement films default to 1x1 and a box filter
        if "width" not in props:
            self.record.width = 1
        if "height" not in props:
            self.record.height = 1
        self.record.rfilter = RFilterRecord(kind=BOX, radius=0.5)
