"""Texture plugins (host-side descriptors).

Rebuild of reference src/textures/* + the MIPMap-backed `bitmap`
texture (reference: src/librender/texture.cpp, mipmap.h).  Each plugin
resolves to a `TextureDesc` that the scene builder packs into the
device-side texture table (type/params/uv-transform/atlas rect).
Evaluation happens in scene/texture_eval.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.scene.registry import register
from mitsuba_tpu.core.spectrum import srgb_degamma

TEX_CONSTANT = 0
TEX_BITMAP = 1
TEX_CHECKERBOARD = 2
TEX_GRID = 3
TEX_VERTEXCOLORS = 4
TEX_WIREFRAME = 5
TEX_CURVATURE = 6


@dataclass
class TextureDesc:
    kind: int = TEX_CONSTANT
    color0: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    color1: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    image: np.ndarray | None = None  # [H, W, 3] linear float32
    uv_scale: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)
    line_width: float = 0.01
    scale: np.ndarray = field(
        default_factory=lambda: np.ones(3, np.float32)
    )  # folded <scale> wrapper
    filter_nearest: bool = False

    def average(self) -> np.ndarray:
        if self.kind == TEX_BITMAP:
            avg = self.image.reshape(-1, 3).mean(axis=0)
        elif self.kind == TEX_CONSTANT:
            avg = self.color0
        else:
            avg = 0.5 * (self.color0 + self.color1)
        return (avg * self.scale).astype(np.float32)


def _uv(props):
    return (
        (props.get_float("uscale", 1.0), props.get_float("vscale", 1.0)),
        (props.get_float("uoffset", 0.0), props.get_float("voffset", 0.0)),
    )


class _TexBase:
    def __init__(self, props):
        self.desc = self._build(props)


@register("texture", "checkerboard")
class Checkerboard(_TexBase):
    """reference: src/textures/checkerboard.cpp (color0/color1 + uv repeat)."""

    def _build(self, props):
        sc, off = _uv(props)
        return TextureDesc(
            kind=TEX_CHECKERBOARD,
            color0=props.get_spectrum("color0", np.full(3, 0.4, np.float32)),
            color1=props.get_spectrum("color1", np.full(3, 0.2, np.float32)),
            uv_scale=sc,
            uv_offset=off,
        )


@register("texture", "gridtexture")
class GridTexture(_TexBase):
    """reference: src/textures/gridtexture.cpp."""

    def _build(self, props):
        sc, off = _uv(props)
        return TextureDesc(
            kind=TEX_GRID,
            color0=props.get_spectrum("color0", np.full(3, 0.2, np.float32)),
            color1=props.get_spectrum("color1", np.full(3, 0.4, np.float32)),
            line_width=props.get_float("lineWidth", 0.01),
            uv_scale=sc,
            uv_offset=off,
        )


@register("texture", "bitmap")
class BitmapTexture(_TexBase):
    """reference: src/textures/bitmap.cpp — trilinear/EWA MIPMap lookup.

    Round 1 evaluates the finest level bilinearly (no ray differentials
    yet); the mip pyramid + ray-diff EWA filter is planned work.
    """

    def _build(self, props):
        from mitsuba_tpu.io.images import read_image

        filename = props.resolve_path(props.get_string("filename"))
        img, is_ldr = read_image(filename)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] > 3:
            img = img[..., :3]
        gamma = props.get_float("gamma", 0.0)
        if is_ldr:
            if gamma == 0.0:
                img = srgb_degamma(img)
            elif gamma > 0:
                img = np.power(np.maximum(img, 0.0), gamma)
        img = np.asarray(img, np.float32)
        sc, off = _uv(props)
        nearest = props.get_string("filterType", "bilinear") == "nearest"
        return TextureDesc(
            kind=TEX_BITMAP,
            image=img,
            uv_scale=sc,
            uv_offset=off,
            filter_nearest=nearest,
        )


@register("texture", "scale")
class ScaleTexture(_TexBase):
    """reference: src/textures/scale.cpp — folds into the nested texture."""

    def _build(self, props):
        scale = props.get_spectrum("scale", np.ones(3, np.float32))
        nested = None
        for name, child in props.children:
            if getattr(child, "desc", None) is not None:
                nested = child.desc
        if nested is None:
            value = props.get_spectrum("value", np.ones(3, np.float32))
            nested = TextureDesc(kind=TEX_CONSTANT, color0=value)
        import copy

        out = copy.copy(nested)
        out.scale = (np.asarray(nested.scale) * scale).astype(np.float32)
        return out


@register("texture", "vertexcolors")
class VertexColors(_TexBase):
    """reference: src/textures/vertexcolors.cpp — interpolated vertex colors."""

    def _build(self, props):
        return TextureDesc(kind=TEX_VERTEXCOLORS)


@register("texture", "wireframe")
class Wireframe(_TexBase):
    """reference: src/textures/wireframe.cpp."""

    def _build(self, props):
        return TextureDesc(
            kind=TEX_WIREFRAME,
            color0=props.get_spectrum(
                "interiorColor", np.full(3, 0.5, np.float32)
            ),
            color1=props.get_spectrum(
                "edgeColor", np.full(3, 0.1, np.float32)
            ),
            line_width=props.get_float("lineWidth", 0.0),
        )


@register("texture", "curvature")
class Curvature(_TexBase):
    """reference: src/textures/curvature.cpp — visualize mean/Gaussian
    curvature, red = positive / blue = negative, scaled into [-1, 1].

    Column reuse in the packed table: line_width holds the user scale,
    uv_offset[0] selects gaussian (1) vs mean (0)."""

    def _build(self, props):
        which = props.get_string("curvature", "mean")
        return TextureDesc(
            kind=TEX_CURVATURE,
            line_width=props.get_float("scale", 1.0),
            uv_offset=(1.0 if which == "gaussian" else 0.0, 0.0),
        )


def as_texture_or_spectrum(props, name, default):
    """Resolve a parameter that may be an rgb/spectrum or a nested
    texture child (the reference's Spectrum-or-Texture pattern)."""
    for child_name, child in props.children:
        if child_name == name and getattr(child, "desc", None) is not None:
            return child.desc
    if name in props:
        raw = props.raw(name)
        if isinstance(raw, TextureDesc):
            return raw
        if hasattr(raw, "desc"):
            return raw.desc
        return TextureDesc(
            kind=TEX_CONSTANT, color0=props.get_spectrum(name)
        )
    if isinstance(default, TextureDesc):
        return default
    return TextureDesc(
        kind=TEX_CONSTANT,
        color0=np.asarray(default, np.float32)
        if np.ndim(default)
        else np.full(3, float(default), np.float32),
    )
