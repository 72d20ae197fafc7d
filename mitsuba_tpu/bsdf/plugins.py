"""BSDF plugins (host-side descriptors).

Each plugin parses `Properties` into a normalized `BSDFRecord`; the
scene builder packs records into the device material table and
bsdf/eval.py implements the vectorized sample/eval/pdf for every type.

Parity targets (reference src/bsdfs/*.cpp):
diffuse, roughdiffuse, conductor, roughconductor, dielectric,
thindielectric, roughdielectric, plastic, roughplastic, phong, ward,
difftrans, null, twosided (folded flag), mask (folded opacity),
bumpmap/normalmap (folded slot, eval planned), mixturebsdf/blendbsdf
(two-component mixtures).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.bsdf import ior as iordb
from mitsuba_tpu.bsdf.microfacet import BECKMANN, GGX, PHONG
from mitsuba_tpu.scene.registry import register
from mitsuba_tpu.scene.textures import TextureDesc, as_texture_or_spectrum

# material type enum — must match bsdf/eval.py dispatch
DIFFUSE = 0
ROUGHDIFFUSE = 1
CONDUCTOR = 2
ROUGHCONDUCTOR = 3
DIELECTRIC = 4
THINDIELECTRIC = 5
ROUGHDIELECTRIC = 6
PLASTIC = 7
ROUGHPLASTIC = 8
PHONG_BSDF = 9
WARD = 10
DIFFTRANS = 11
NULL_BSDF = 12
MIXTURE = 13
COATING = 14
HK = 15
ROUGHCOATING = 16
IRAWAN = 17

TYPE_NAMES = {
    DIFFUSE: "diffuse",
    ROUGHDIFFUSE: "roughdiffuse",
    CONDUCTOR: "conductor",
    ROUGHCONDUCTOR: "roughconductor",
    DIELECTRIC: "dielectric",
    THINDIELECTRIC: "thindielectric",
    ROUGHDIELECTRIC: "roughdielectric",
    PLASTIC: "plastic",
    ROUGHPLASTIC: "roughplastic",
    PHONG_BSDF: "phong",
    WARD: "ward",
    DIFFTRANS: "difftrans",
    NULL_BSDF: "null",
    MIXTURE: "mixture",
    COATING: "coating",
    ROUGHCOATING: "roughcoating",
    IRAWAN: "irawan",
}

_DISTS = {"beckmann": BECKMANN, "ggx": GGX, "phong": PHONG, "as": BECKMANN}


def _gray(v):
    return np.full(3, v, np.float32)


@dataclass
class BSDFRecord:
    type: int = DIFFUSE
    # colors; each may be backed by a texture (tex* field)
    cA: np.ndarray = field(default_factory=lambda: _gray(0.5))  # diffuse refl
    cB: np.ndarray = field(default_factory=lambda: _gray(1.0))  # specular refl
    cC: np.ndarray = field(default_factory=lambda: _gray(1.0))  # spec trans / eta
    cD: np.ndarray = field(default_factory=lambda: _gray(0.0))  # conductor k
    texA: TextureDesc | None = None
    texB: TextureDesc | None = None
    alpha_u: float = 0.1
    alpha_v: float = 0.1
    tex_alpha: TextureDesc | None = None
    eta: float = 1.5046  # int_ior / ext_ior
    dispersion: float = 0.0  # Cauchy B [um^2]; spectral mode only
    exponent: float = 30.0
    dist: int = BECKMANN
    nonlinear: bool = False
    twosided: bool = False
    opacity: np.ndarray | None = None  # folded <mask>
    tex_opacity: TextureDesc | None = None
    tex_bump: TextureDesc | None = None
    bump_is_normalmap: bool = False
    # plastic precompute
    fdr_int: float = 0.0
    fdr_ext: float = 0.0
    spec_sampling_weight: float = 0.5
    # mixture: children records + weights
    children: list = field(default_factory=list)
    weights: list = field(default_factory=list)
    # irawan: parsed WeavePattern + tiling + precomputed normalization
    weave: object = None
    repeat_u: float = 1.0
    repeat_v: float = 1.0
    iw_norm: float = 0.0
    id: str = ""

    def is_emitter_compatible(self):
        return True


class _BSDFBase:
    def __init__(self, props):
        self.props = props
        self.record = self._build(props)
        if props.id:
            self.record.id = props.id

    def _build(self, props) -> BSDFRecord:
        raise NotImplementedError


def _ior_pair(props, int_default="bk7", ext_default="air"):
    int_ior = iordb.lookup_dielectric(
        props.raw("intIOR") if "intIOR" in props else int_default
    )
    ext_ior = iordb.lookup_dielectric(
        props.raw("extIOR") if "extIOR" in props else ext_default
    )
    if int_ior <= 0 or ext_ior <= 0:
        raise ValueError("IORs must be positive")
    return int_ior / ext_ior


def _alpha(props, rec, default=0.1):
    if "alpha" in props:
        a = as_texture_or_spectrum(props, "alpha", default)
        if a.kind == 0 and a.image is None:  # constant
            rec.alpha_u = rec.alpha_v = float(a.color0.mean() * a.scale.mean())
        else:
            rec.tex_alpha = a
            rec.alpha_u = rec.alpha_v = float(a.average().mean())
    else:
        rec.alpha_u = props.get_float("alphaU", default)
        rec.alpha_v = props.get_float("alphaV", default)
    rec.dist = _DISTS[props.get_string("distribution", "beckmann")]


def _fdr_exact(eta: float) -> float:
    """Diffuse Fresnel reflectance by numerical integration — matches the
    reference's non-fast Gauss-Lobatto path (src/libcore/util.cpp:856)."""
    x = np.linspace(0.0, 1.0, 4097)
    ct = np.sqrt(x)
    # scalar fresnelDielectricExt
    eta_rel = eta
    sin2t = (1 - ct * ct) / (eta_rel * eta_rel)
    tir = sin2t >= 1.0
    ctt = np.sqrt(np.maximum(1 - sin2t, 0.0))
    rs = (ct - eta_rel * ctt) / np.maximum(ct + eta_rel * ctt, 1e-12)
    rp = (eta_rel * ct - ctt) / np.maximum(eta_rel * ct + ctt, 1e-12)
    F = np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return float(np.trapezoid(F, x))


@register("bsdf", "diffuse")
class Diffuse(_BSDFBase):
    """reference: src/bsdfs/diffuse.cpp"""

    def _build(self, props):
        rec = BSDFRecord(type=DIFFUSE)
        tex = as_texture_or_spectrum(props, "reflectance", _gray(0.5))
        rec.cA = tex.average()
        rec.texA = tex if tex.kind != 0 or tex.image is not None else None
        return rec


@register("bsdf", "roughdiffuse")
class RoughDiffuse(_BSDFBase):
    """reference: src/bsdfs/roughdiffuse.cpp (Oren-Nayar, fast approx;
    sigma = alpha / sqrt(2), roughdiffuse.cpp:139)."""

    def _build(self, props):
        rec = BSDFRecord(type=ROUGHDIFFUSE)
        tex = as_texture_or_spectrum(props, "reflectance", _gray(0.5))
        rec.cA = tex.average()
        rec.texA = tex if tex.kind != 0 else None
        alpha_tex = as_texture_or_spectrum(props, "alpha", 0.2)
        rec.alpha_u = rec.alpha_v = float(alpha_tex.average().mean())
        return rec


@register("bsdf", "conductor")
class Conductor(_BSDFBase):
    """reference: src/bsdfs/conductor.cpp (default material Cu :159)."""

    def _build(self, props):
        rec = BSDFRecord(type=CONDUCTOR)
        mat = props.get_string("material", "Cu")
        if "eta" in props and "k" in props:
            rec.cC = props.get_spectrum("eta")
            rec.cD = props.get_spectrum("k")
        else:
            eta, k = iordb.lookup_conductor(mat)
            rec.cC, rec.cD = np.asarray(eta), np.asarray(k)
        ext = iordb.lookup_dielectric(
            props.raw("extEta") if "extEta" in props else "air"
        )
        rec.cC = (rec.cC / ext).astype(np.float32)
        rec.cD = (rec.cD / ext).astype(np.float32)
        tex = as_texture_or_spectrum(props, "specularReflectance", _gray(1.0))
        rec.cB = tex.average()
        rec.texB = tex if tex.kind != 0 else None
        return rec


@register("bsdf", "roughconductor")
class RoughConductor(Conductor):
    """reference: src/bsdfs/roughconductor.cpp"""

    def _build(self, props):
        rec = super()._build(props)
        rec.type = ROUGHCONDUCTOR
        _alpha(props, rec)
        return rec


@register("bsdf", "dielectric")
class Dielectric(_BSDFBase):
    """reference: src/bsdfs/dielectric.cpp"""

    def _build(self, props):
        rec = BSDFRecord(type=DIELECTRIC)
        rec.eta = _ior_pair(props)
        # wavelength-dependent IOR for N-bin spectral renders
        # (core/spectral.py cauchy_eta); ignored in RGB mode
        rec.dispersion = props.get_float("dispersion", 0.0)
        rec.cB = as_texture_or_spectrum(
            props, "specularReflectance", _gray(1.0)
        ).average()
        rec.cC = as_texture_or_spectrum(
            props, "specularTransmittance", _gray(1.0)
        ).average()
        return rec


@register("bsdf", "thindielectric")
class ThinDielectric(Dielectric):
    """reference: src/bsdfs/thindielectric.cpp"""

    def _build(self, props):
        rec = super()._build(props)
        rec.type = THINDIELECTRIC
        return rec


@register("bsdf", "roughdielectric")
class RoughDielectric(Dielectric):
    """reference: src/bsdfs/roughdielectric.cpp"""

    def _build(self, props):
        rec = super()._build(props)
        rec.type = ROUGHDIELECTRIC
        _alpha(props, rec)
        return rec


@register("bsdf", "plastic")
class Plastic(_BSDFBase):
    """reference: src/bsdfs/plastic.cpp — smooth dielectric coat over
    a diffuse base with internal-scattering compensation (fdrInt)."""

    def _build(self, props):
        rec = BSDFRecord(type=PLASTIC)
        rec.eta = _ior_pair(props, int_default="polypropylene")
        tex = as_texture_or_spectrum(props, "diffuseReflectance", _gray(0.5))
        rec.cA = tex.average()
        rec.texA = tex if tex.kind != 0 else None
        rec.cB = as_texture_or_spectrum(
            props, "specularReflectance", _gray(1.0)
        ).average()
        rec.nonlinear = props.get_bool("nonlinear", False)
        rec.fdr_int = _fdr_exact(1.0 / rec.eta)
        rec.fdr_ext = _fdr_exact(rec.eta)
        d_avg = float(rec.cA.mean())
        s_avg = float(rec.cB.mean())
        rec.spec_sampling_weight = s_avg / max(s_avg + d_avg, 1e-8)
        return rec


@register("bsdf", "roughplastic")
class RoughPlastic(Plastic):
    """reference: src/bsdfs/roughplastic.cpp"""

    def _build(self, props):
        rec = super()._build(props)
        rec.type = ROUGHPLASTIC
        _alpha(props, rec)
        return rec


@register("bsdf", "phong")
class Phong(_BSDFBase):
    """reference: src/bsdfs/phong.cpp (modified Phong)."""

    def _build(self, props):
        rec = BSDFRecord(type=PHONG_BSDF)
        rec.exponent = props.get_float("exponent", 30.0)
        dt = as_texture_or_spectrum(props, "diffuseReflectance", _gray(0.5))
        rec.cA = dt.average()
        rec.texA = dt if dt.kind != 0 else None
        rec.cB = as_texture_or_spectrum(
            props, "specularReflectance", _gray(0.2)
        ).average()
        d_avg, s_avg = float(rec.cA.mean()), float(rec.cB.mean())
        rec.spec_sampling_weight = s_avg / max(s_avg + d_avg, 1e-8)
        return rec


@register("bsdf", "ward")
class Ward(_BSDFBase):
    """reference: src/bsdfs/ward.cpp (balanced variant)."""

    def _build(self, props):
        rec = BSDFRecord(type=WARD)
        rec.alpha_u = props.get_float("alphaU", props.get_float("alpha", 0.1))
        rec.alpha_v = props.get_float("alphaV", props.get_float("alpha", 0.1))
        dt = as_texture_or_spectrum(props, "diffuseReflectance", _gray(0.5))
        rec.cA = dt.average()
        rec.texA = dt if dt.kind != 0 else None
        rec.cB = as_texture_or_spectrum(
            props, "specularReflectance", _gray(0.2)
        ).average()
        d_avg, s_avg = float(rec.cA.mean()), float(rec.cB.mean())
        rec.spec_sampling_weight = s_avg / max(s_avg + d_avg, 1e-8)
        return rec


@register("bsdf", "difftrans")
class DiffTrans(_BSDFBase):
    """reference: src/bsdfs/difftrans.cpp"""

    def _build(self, props):
        rec = BSDFRecord(type=DIFFTRANS)
        tex = as_texture_or_spectrum(props, "transmittance", _gray(0.5))
        rec.cA = tex.average()
        rec.texA = tex if tex.kind != 0 else None
        return rec


@register("bsdf", "null")
class Null(_BSDFBase):
    """reference: src/bsdfs/null.cpp"""

    def _build(self, props):
        return BSDFRecord(type=NULL_BSDF)


def _nested_bsdfs(props):
    out = []
    for name, child in props.children:
        if getattr(child, "record", None) is not None and isinstance(
            child.record, BSDFRecord
        ):
            out.append(child.record)
    return out


@register("bsdf", "twosided")
class TwoSided(_BSDFBase):
    """reference: src/bsdfs/twosided.cpp — folded into a flag."""

    def _build(self, props):
        nested = _nested_bsdfs(props)
        if not nested:
            raise ValueError("twosided: requires a nested BSDF")
        import copy

        rec = copy.deepcopy(nested[0])
        rec.twosided = True
        return rec


@register("bsdf", "mask")
class Mask(_BSDFBase):
    """reference: src/bsdfs/mask.cpp — folded into an opacity slot."""

    def _build(self, props):
        nested = _nested_bsdfs(props)
        if not nested:
            raise ValueError("mask: requires a nested BSDF")
        import copy

        rec = copy.deepcopy(nested[0])
        op = as_texture_or_spectrum(props, "opacity", _gray(0.5))
        rec.opacity = op.average()
        rec.tex_opacity = op if op.kind != 0 else None
        return rec


@register("bsdf", "bumpmap")
class BumpMap(_BSDFBase):
    """reference: src/bsdfs/bumpmap.cpp — folded into a bump slot
    (device-side perturbation planned)."""

    def _build(self, props):
        nested = _nested_bsdfs(props)
        if not nested:
            raise ValueError("bumpmap: requires a nested BSDF")
        import copy

        rec = copy.deepcopy(nested[0])
        for name, child in props.children:
            if getattr(child, "desc", None) is not None:
                rec.tex_bump = child.desc
        return rec


@register("bsdf", "normalmap")
class NormalMap(BumpMap):
    """reference: src/bsdfs/normalmap.cpp"""

    def _build(self, props):
        rec = super()._build(props)
        rec.bump_is_normalmap = True
        return rec


@register("bsdf", "mixturebsdf")
class MixtureBSDF(_BSDFBase):
    """reference: src/bsdfs/mixturebsdf.cpp — N-component mixture.
    Round 1 supports two leaf components on the device path."""

    def _build(self, props):
        rec = BSDFRecord(type=MIXTURE)
        rec.children = _nested_bsdfs(props)
        w = [float(x) for x in props.get_string("weights", "").split()]
        if len(w) != len(rec.children):
            raise ValueError(
                "mixturebsdf: weight count must match nested BSDF count"
            )
        if sum(w) > 1.0 + 1e-4:
            raise ValueError("mixturebsdf: weights sum to more than one")
        rec.weights = w
        return rec


@register("bsdf", "blendbsdf")
class BlendBSDF(_BSDFBase):
    """reference: src/bsdfs/blendbsdf.cpp — two BSDFs mixed by a weight
    (possibly textured)."""

    def _build(self, props):
        rec = BSDFRecord(type=MIXTURE)
        rec.children = _nested_bsdfs(props)
        if len(rec.children) != 2:
            raise ValueError("blendbsdf: requires exactly two nested BSDFs")
        wtex = as_texture_or_spectrum(props, "weight", 0.5)
        w = float(wtex.average().mean())
        rec.weights = [1.0 - w, w]
        return rec


@register("bsdf", "coating")
class Coating(_BSDFBase):
    """reference: src/bsdfs/coating.cpp — smooth dielectric layer over
    an arbitrary nested BSDF: Snell-refracted nested directions,
    (1-R12)(1-R21) boundary transmittances, Beer absorption through the
    layer, and the invEta^2 solid-angle compression (eval.py
    _coating_*).  One nesting level (like the 2-leaf mixture)."""

    def _build(self, props):
        nested = _nested_bsdfs(props)
        if not nested:
            raise ValueError("coating: requires a nested BSDF")
        rec = BSDFRecord(type=COATING)
        rec.eta = _ior_pair(props)
        rec.cB = props.get_spectrum(
            "specularReflectance", np.ones(3)
        ).astype(np.float32)
        thickness = props.get_float("thickness", 1.0)
        sigma_a = props.get_spectrum("sigmaA", np.zeros(3))
        rec.cD = (np.asarray(sigma_a) * thickness).astype(np.float32)
        rec.children = [nested[0]]
        # specular sampling weight = sAvg/(sAvg+dAvg)
        # (coating.cpp:configure)
        d_avg = float(np.asarray(nested[0].cA).mean())
        rec.spec_sampling_weight = 1.0 / max(1.0 + d_avg, 1e-8)
        return rec


@register("bsdf", "roughcoating")
class RoughCoating(_BSDFBase):
    """reference: src/bsdfs/roughcoating.cpp — MICROFACET dielectric
    layer over a nested BSDF: glossy boundary reflection (D*F*G) plus
    the nested BSDF seen through Snell-refracted directions, weighted
    by the fitted rough-transmittance table T(cos, alpha)
    (bsdf/rtrans.py, reference rtrans.h:44-186) and Beer absorption
    (eval.py _rcoating_*).  Isotropic alpha only, like the reference
    (roughcoating.cpp:144-146 errors on anisotropy)."""

    def _build(self, props):
        nested = _nested_bsdfs(props)
        if not nested:
            raise ValueError("roughcoating: requires a nested BSDF")
        rec = BSDFRecord(type=ROUGHCOATING)
        rec.eta = _ior_pair(props)
        rec.cB = props.get_spectrum(
            "specularReflectance", np.ones(3)
        ).astype(np.float32)
        thickness = props.get_float("thickness", 1.0)
        sigma_a = props.get_spectrum("sigmaA", np.zeros(3))
        rec.cD = (np.asarray(sigma_a) * thickness).astype(np.float32)
        _alpha(props, rec, default=0.1)
        rec.alpha_v = rec.alpha_u  # isotropic only
        rec.children = [nested[0]]
        d_avg = float(np.asarray(nested[0].cA).mean())
        rec.spec_sampling_weight = 1.0 / max(1.0 + d_avg, 1e-8)
        return rec


@register("bsdf", "hk")
class HanrahanKrueger(_BSDFBase):
    """reference src/bsdfs/hk.cpp — Hanrahan-Krueger thin slab:
    attenuated delta straight-through transmission + single-scattering
    reflection/transmission with an HG phase (bsdf/eval.py _hk_*).
    sigmaT&albedo parameterization folds to sigmaS/sigmaA."""

    def _build(self, props):
        rec = BSDFRecord(type=HK)
        if "sigmaT" in props or "albedo" in props:
            sigma_t = props.get_spectrum("sigmaT", _gray(2.05))
            albedo = props.get_spectrum("albedo", _gray(2.0 / 2.05))
            sigma_s = sigma_t * albedo
            sigma_a = sigma_t - sigma_s
        else:
            sigma_s = props.get_spectrum("sigmaS", _gray(2.0))
            sigma_a = props.get_spectrum("sigmaA", _gray(0.05))
        rec.cB = np.asarray(sigma_s, np.float32)
        rec.cC = np.asarray(sigma_a, np.float32)
        g = props.get_float("g", 0.0)  # flat param or nested hg phase
        for _, child in props.children:
            r = getattr(child, "record", None)
            if r is not None and hasattr(r, "g") and hasattr(r, "kind"):
                g = float(r.g)
        rec.alpha_u = g
        rec.alpha_v = props.get_float("thickness", 1.0)
        st = np.maximum(sigma_s + sigma_a, 1e-6)
        rec.cA = (sigma_s / st).astype(np.float32)  # albedo (avg refl)
        return rec


@register("bsdf", "irawan")
class IrawanCloth(_BSDFBase):
    """reference src/bsdfs/irawan.{h,cpp} — Irawan-Marschner woven
    cloth.  Loads a weave-pattern DSL file (`filename`, with `$name`
    parameter substitution from the plugin's properties) or a built-in
    `preset`, Monte-Carlos the specular normalization at load time
    (irawan.cpp configure), and ships the pattern to the packed device
    tables (bsdf/irawan.py)."""

    def _build(self, props):
        from mitsuba_tpu.bsdf import irawan as iw

        if "filename" in props:
            path = props.resolve_path(props.get_string("filename"))
            with open(path, "r") as f:
                text = f.read()
        else:
            preset = props.get_string("preset", "plain")
            if preset not in iw.PRESETS:
                raise ValueError(
                    "irawan: unknown preset %r (have %s); pass filename= "
                    "for a weave pattern file" % (preset, list(iw.PRESETS))
                )
            text = iw.PRESETS[preset]
        pattern = iw.parse_weave(text, props)
        rec = BSDFRecord(type=IRAWAN)
        rec.weave = pattern
        rec.repeat_u = props.get_float("repeatU", 1.0)
        rec.repeat_v = props.get_float("repeatV", 1.0)
        rec.iw_norm = iw.compute_normalization(
            pattern, rec.repeat_u, rec.repeat_v
        )
        if "ksMultiplier" in props or "kdMultiplier" in props:
            raise ValueError(
                "irawan: ksMultiplier/kdMultiplier were replaced by the "
                "normalization scheme; set yarn kd/ks instead "
                "(irawan.cpp:115-118)"
            )
        # average diffuse color for tools that need a flat approximation
        rec.cA = np.mean(
            [np.asarray(y.kd, np.float32) for y in pattern.yarns], axis=0
        )
        return rec
