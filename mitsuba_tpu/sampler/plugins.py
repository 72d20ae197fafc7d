"""Sample generator plugins.

Rebuild of reference src/samplers/* in stateless, counter-based form:
a sampler is a pure function of (pixel_lane, sample_index, slot) — no
mutable per-thread state (the reference allocates one sampler clone per
worker, sched.h:395-403; here determinism is global by construction).

Pixel-position samples (the first 2 dimensions) use the sampler's
low-discrepancy pattern; all later path decisions fall back to the
scrambled PCG4D stream, mirroring how the reference samplers fall back
to uniform floats once the pre-generated arrays are exhausted
(reference: src/librender/sampler.cpp next1D/next2D).

* independent — PCG4D everywhere (reference independent.cpp, SFMT)
* stratified  — jittered NxN grid per pixel (reference stratified.cpp)
* ldsampler   — scrambled (0,2)-sequence (reference ldsampler.cpp)
* sobol       — first-two-dim Sobol' with per-pixel scramble
  (reference sobol.cpp; full-matrix high-dim Sobol planned)
* halton/hammersley — radical-inverse pairs (reference halton.cpp)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from mitsuba_tpu.core import rng
from mitsuba_tpu.scene.registry import register

INDEPENDENT = 0
STRATIFIED = 1
LDSAMPLER = 2
SOBOL = 3
HALTON = 4
HAMMERSLEY = 5


@dataclass
class SamplerRecord:
    kind: int = INDEPENDENT
    sample_count: int = 4
    seed: int = 0

    def pixel_sample(self, lane, sample_idx, spp):
        """2D sample in [0,1)^2 used for the film-position jitter."""
        if self.kind == STRATIFIED:
            # factor spp into a near-square grid, jitter within cells
            nx = int(max(1, round(spp**0.5)))
            ny = max(1, spp // nx)
            n = nx * ny
            idx = sample_idx % n
            jit = rng.rand2(lane, sample_idx, 0, self._seed())
            cx = (idx % nx).astype(jnp.float32)
            cy = (idx // nx).astype(jnp.float32)
            return jnp.stack(
                [
                    (cx + jit[..., 0]) / nx,
                    (cy + jit[..., 1]) / ny,
                ],
                axis=-1,
            )
        if self.kind in (LDSAMPLER, SOBOL):
            scr = rng.pcg4d(
                jnp.stack(
                    [
                        jnp.asarray(lane, jnp.uint32),
                        jnp.zeros_like(jnp.asarray(lane, jnp.uint32)),
                        jnp.full_like(jnp.asarray(lane, jnp.uint32), 77),
                        jnp.full_like(
                            jnp.asarray(lane, jnp.uint32), self.seed
                        ),
                    ],
                    axis=-1,
                )
            )
            return rng.sobol_2d_scrambled(
                jnp.asarray(sample_idx, jnp.uint32), scr[..., 0], scr[..., 1]
            )
        if self.kind in (HALTON, HAMMERSLEY):
            # Faure-permuted radical inverses with a per-pixel
            # Cranley-Patterson rotation (reference halton.cpp +
            # faure.cpp permutations; base-2 Faure is the identity)
            from mitsuba_tpu.core import sobol as _sobol

            i = jnp.asarray(sample_idx, jnp.uint32)
            rot = rng.rand2(lane, 0, 991, self._seed())
            if self.kind == HAMMERSLEY and spp > 0:
                # dim 0 of Hammersley enumerates i/N
                x = jnp.mod(
                    (i % jnp.uint32(spp)).astype(jnp.float32) / spp
                    + rot[..., 0],
                    1.0,
                )
            else:
                x = _sobol.halton_faure(i, 0, rot[..., 0])
            y = _sobol.halton_faure(i, 1, rot[..., 1])
            return jnp.stack([x, y], axis=-1)
        return rng.rand2(lane, sample_idx, 0, self._seed())

    def _seed(self):
        # Sampler-owned draws live in their own stream so slot integers
        # can never alias integrator decisions (see core/rng.py partition).
        return rng.stream_seed(self.seed, rng.STREAM_CAMERA)

    def lens_sample(self, lane, sample_idx):
        """2D aperture/time sample: Sobol' dims 2-3 for LD samplers
        (reference sobol.cpp consumes dims in request order),
        Faure-permuted Halton bases 5/7 for halton/hammersley, hash
        otherwise."""
        if self.kind in (HALTON, HAMMERSLEY):
            from mitsuba_tpu.core import sobol as _sobol

            i = jnp.asarray(sample_idx, jnp.uint32)
            rot = rng.rand2(lane, 0, 992, self._seed())
            return jnp.stack(
                [
                    _sobol.halton_faure(i, 2, rot[..., 0]),
                    _sobol.halton_faure(i, 3, rot[..., 1]),
                ],
                axis=-1,
            )
        if self.kind in (LDSAMPLER, SOBOL):
            from mitsuba_tpu.core import sobol as _sobol

            scr = rng.pcg4d(
                jnp.stack(
                    [
                        jnp.asarray(lane, jnp.uint32),
                        jnp.full_like(jnp.asarray(lane, jnp.uint32), 1009),
                        jnp.full_like(jnp.asarray(lane, jnp.uint32), 23),
                        jnp.full_like(
                            jnp.asarray(lane, jnp.uint32), self.seed
                        ),
                    ],
                    axis=-1,
                )
            )
            return _sobol.sobol_01(
                jnp.asarray(sample_idx, jnp.uint32), (2, 3), scr[..., :2]
            )
        return rng.rand2(lane, sample_idx, 1009, self._seed())

    def next1d(self, lane, sample_idx, slot):
        return rng.rand1(lane, sample_idx, slot, self._seed())

    def next2d(self, lane, sample_idx, slot):
        return rng.rand2(lane, sample_idx, slot, self._seed())

    def next4d(self, lane, sample_idx, slot):
        return rng.rand4(lane, sample_idx, slot, self._seed())


def ld_decision4(sampler, lane, sample_idx, dslot, fallback, seed):
    """Route an integrator decision draw through the Sobol' sequence.

    LD samplers (sobol/ldsampler) map decision slot `dslot` to Sobol'
    dimensions 4 + 4*dslot .. +3 with a per-(pixel, slot) XOR scramble
    ("padded Sobol"); slots beyond the direction-matrix table keep the
    counter-hash `fallback` — the exact analogue of the reference
    samplers handing out uniform floats once their pre-generated arrays
    run out (sampler.cpp next1D/next2D).  dslot may be a traced scalar
    (plain wavefront) or per-lane array (regenerating wavefront)."""
    if sampler is None or sampler.kind not in (LDSAMPLER, SOBOL):
        return fallback
    from mitsuba_tpu.core import sobol as _sobol

    lane_u = jnp.asarray(lane, jnp.uint32)
    dslot_u = jnp.asarray(dslot, jnp.uint32)
    dim0 = 4 + 4 * jnp.asarray(dslot, jnp.int32)
    dims = dim0[..., None] + jnp.arange(4, dtype=jnp.int32)
    scr = rng.pcg4d(
        jnp.stack(
            [
                lane_u,
                jnp.broadcast_to(dslot_u, lane_u.shape),
                jnp.full_like(lane_u, 0x50B0),
                jnp.full_like(lane_u, sampler.seed ^ seed),
            ],
            axis=-1,
        )
    )
    ld = _sobol.sobol_01_dyn(
        jnp.asarray(sample_idx, jnp.uint32), dims, scr
    )
    use = dim0 + 3 < _sobol.N_DIMS
    return jnp.where(
        jnp.broadcast_to(use, lane_u.shape)[..., None], ld, fallback
    )


class _SamplerBase:
    kind = INDEPENDENT

    def __init__(self, props):
        self.record = SamplerRecord(
            kind=self.kind,
            sample_count=props.get_int("sampleCount", 4),
            seed=props.get_int("seed", 0),
        )


@register("sampler", "independent")
class Independent(_SamplerBase):
    kind = INDEPENDENT


@register("sampler", "stratified")
class Stratified(_SamplerBase):
    kind = STRATIFIED


@register("sampler", "ldsampler")
class LowDiscrepancy(_SamplerBase):
    kind = LDSAMPLER


@register("sampler", "sobol")
class Sobol(_SamplerBase):
    kind = SOBOL


@register("sampler", "halton")
class Halton(_SamplerBase):
    kind = HALTON


@register("sampler", "hammersley")
class Hammersley(_SamplerBase):
    kind = HAMMERSLEY
