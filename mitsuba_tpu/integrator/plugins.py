"""Integrator plugins (host-side configuration records).

Parity targets (reference src/integrators/*): path, volpath,
volpath_simple, direct, ao, bdpt, pssmlt, mlt, erpt, photonmapper,
ppm, sppm, ptracer, vpl, adaptive, irrcache, multichannel, field,
motion.  Round 1 wires path / volpath / direct / ao / field(depth,
normal, ...) into the wavefront renderer; the bidirectional and photon
families are planned follow-ups (SURVEY.md §7 stages 8-9).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mitsuba_tpu.scene.registry import register


@dataclass
class IntegratorRecord:
    kind: str = "path"
    max_depth: int = -1
    rr_depth: int = 5
    strict_normals: bool = False
    hide_emitters: bool = False
    # direct
    emitter_samples: int = 1
    bsdf_samples: int = 1
    # ao
    ray_length: float = -1.0
    shading_samples: int = 1
    # field
    field_name: str = "position"
    # motion
    motion_time: float = 1.0
    motion_config: str = "d"
    # bdpt / mlt family
    light_image: bool = True
    sample_direct: bool = True
    # pssmlt / mlt / erpt
    direct_samples: int = -1
    bidirectional: bool = False
    luminance_samples: int = 100000
    two_stage: bool = False
    p_large: float = 0.3
    mutations_per_pixel: int = 100
    chain_length: int = 100
    manifold_perturbation: bool = False
    sub_integrator: "IntegratorRecord | None" = None
    sub_integrators: "list | None" = None  # multichannel children
    # adaptive
    max_error: float = 0.05
    max_sample_factor: float = 8.0


class _IntBase:
    kind = "path"

    def __init__(self, props):
        self.record = IntegratorRecord(
            kind=self.kind,
            max_depth=props.get_int("maxDepth", -1),
            rr_depth=props.get_int("rrDepth", 5),
            strict_normals=props.get_bool("strictNormals", False),
            hide_emitters=props.get_bool("hideEmitters", False),
        )
        self._finish(props)

    def _finish(self, props):
        pass


@register("integrator", "path")
class PathIntegrator(_IntBase):
    """reference: src/integrators/path/path.cpp:110 (MIPathTracer)."""

    kind = "path"


@register("integrator", "volpath")
class VolPathIntegrator(_IntBase):
    """reference: src/integrators/path/volpath.cpp:76."""

    kind = "volpath"


@register("integrator", "volpath_simple")
class VolPathSimpleIntegrator(_IntBase):
    kind = "volpath"


@register("integrator", "direct")
class DirectIntegrator(_IntBase):
    """reference: src/integrators/direct/direct.cpp (MIDirect)."""

    kind = "direct"

    def _finish(self, props):
        s = props.get_int("shadingSamples", 1)
        self.record.emitter_samples = props.get_int("emitterSamples", s)
        self.record.bsdf_samples = props.get_int("bsdfSamples", s)


@register("integrator", "ao")
class AOIntegrator(_IntBase):
    """reference: src/integrators/direct/ao.cpp."""

    kind = "ao"

    def _finish(self, props):
        self.record.ray_length = props.get_float("rayLength", -1.0)
        self.record.shading_samples = props.get_int("shadingSamples", 1)


@register("integrator", "field")
class FieldIntegrator(_IntBase):
    """reference: src/integrators/misc/field.cpp — AOV extraction."""

    kind = "field"

    def _finish(self, props):
        self.record.field_name = props.get_string("field", "position")


@register("integrator", "depth")
class DepthIntegrator(_IntBase):
    kind = "field"

    def _finish(self, props):
        self.record.field_name = "distance"


@register("integrator", "motion")
class MotionIntegrator(_IntBase):
    """reference: src/integrators/misc/motion.cpp — screen-space
    motion vectors.  config "d" = first hit; chain configs ("rd",
    "ttd", ...) follow reflections/refractions and re-solve the
    specular chain at the target time with the batched Newton manifold
    walk.  `time` is the target frame."""

    kind = "motion"

    def _finish(self, props):
        self.record.motion_time = props.get_float("time", 1.0)
        cfg = props.get_string("config", "d").lower()
        if not cfg or cfg[-1] != "d" or any(
            ch not in "rtd" for ch in cfg
        ):
            raise ValueError(
                "motion: config must be of [rt]*d form, got %r" % cfg
            )
        self.record.motion_config = cfg


@register("integrator", "bdpt")
class BDPTIntegrator(_IntBase):
    """reference: src/integrators/bdpt/bdpt.cpp:133 — planned; currently
    renders with the unidirectional path backend (matching radiometry,
    without the bidirectional variance reduction)."""

    kind = "bdpt"

    def _finish(self, props):
        self.record.light_image = props.get_bool("lightImage", True)
        self.record.sample_direct = props.get_bool("sampleDirect", True)


@register("integrator", "pssmlt")
class PSSMLTIntegrator(_IntBase):
    """reference: src/integrators/pssmlt/pssmlt.cpp:150 — planned;
    currently renders with the path backend."""

    kind = "pssmlt"

    def _finish(self, props):
        self.record.bidirectional = props.get_bool("bidirectional", True)
        self.record.luminance_samples = props.get_int(
            "luminanceSamples", 100000
        )
        self.record.two_stage = props.get_bool("twoStage", False)
        self.record.p_large = props.get_float("pLarge", 0.3)
        # >= 0: render the direct component with this many ordinary
        # samples and keep MLT for indirect-only (reference
        # directSamples; -1 keeps everything in the chain target)
        self.record.direct_samples = props.get_int("directSamples", -1)


@register("integrator", "mlt")
class MLTIntegrator(PSSMLTIntegrator):
    """reference: src/integrators/mlt/mlt.cpp — Veach mutation suite
    (lens/caustic/multichain/bidirectional) over chain tensors, see
    integrator/mlt.py."""

    kind = "mlt"

    def _finish(self, props):
        super()._finish(props)
        # reference mlt.cpp:194 — manifold perturbation opt-in
        self.record.manifold_perturbation = props.get_bool(
            "manifoldPerturbation", False
        )


@register("integrator", "erpt")
class ERPTIntegrator(PSSMLTIntegrator):
    """reference: src/integrators/erpt/erpt.cpp:134 — energy
    redistribution PT with perturbation-only chains, integrator/mlt.py."""

    kind = "erpt"

    def _finish(self, props):
        super()._finish(props)
        self.record.chain_length = props.get_int("chainLength", 100)


@register("integrator", "ptracer")
class PTracerIntegrator(_IntBase):
    """reference: src/integrators/ptracer/ptracer.cpp — planned."""

    kind = "ptracer"


@register("integrator", "photonmapper")
class PhotonMapper(_IntBase):
    kind = "photonmapper"


@register("integrator", "ppm")
class PPMIntegrator(_IntBase):
    kind = "ppm"


@register("integrator", "sppm")
class SPPMIntegrator(_IntBase):
    kind = "sppm"


@register("integrator", "vpl")
class VPLIntegrator(_IntBase):
    kind = "vpl"


class _MetaIntegrator(_IntBase):
    def _finish(self, props):
        subs = [
            child.record
            for _, child in props.children
            if isinstance(getattr(child, "record", None), IntegratorRecord)
        ]
        if subs:
            self.record.sub_integrator = subs[0]
        self.record.sub_integrators = subs


@register("integrator", "adaptive")
class AdaptiveIntegrator(_MetaIntegrator):
    """reference: src/integrators/misc/adaptive.cpp — error-driven
    refinement over the nested integrator (integrator/adaptive.py)."""

    kind = "adaptive"

    def _finish(self, props):
        super()._finish(props)
        self.record.max_error = props.get_float("maxError", 0.05)
        self.record.max_sample_factor = props.get_float(
            "maxSampleFactor", 8.0
        )


@register("integrator", "irrcache")
class IrrCacheIntegrator(_MetaIntegrator):
    kind = "irrcache"


@register("integrator", "multichannel")
class MultiChannelIntegrator(_MetaIntegrator):
    kind = "multichannel"
