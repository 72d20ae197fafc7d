"""Subsurface scattering plugins.

PLACEHOLDERS for reference src/subsurface/{dipole.cpp,singlescatter.cpp}:
the classical dipole BSSRDF (irradiance octree + blue-noise samples) is
planned; until then an attached subsurface integrates as a diffuse
approximation of the diffusion albedo so scenes load and render
plausibly.
"""

from __future__ import annotations

import numpy as np

from mitsuba_tpu.scene.registry import register


class _SubsurfaceBase:
    def __init__(self, props):
        self.props = props
        sigma_s = props.get_spectrum("sigmaS", np.full(3, 1.0, np.float32))
        sigma_a = props.get_spectrum("sigmaA", np.full(3, 0.05, np.float32))
        # diffusion albedo approximation
        alpha = sigma_s / np.maximum(sigma_s + sigma_a, 1e-6)
        self.approx_albedo = alpha.astype(np.float32)
        self.record = None  # not a BSDF; shapes keep their own


@register("subsurface", "dipole")
class Dipole(_SubsurfaceBase):
    pass


@register("subsurface", "singlescatter")
class SingleScatter(_SubsurfaceBase):
    pass
