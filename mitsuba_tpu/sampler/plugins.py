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
            i = jnp.asarray(sample_idx, jnp.uint32)
            x = rng.radical_inverse_base2(
                i ^ rng.pcg4d(
                    jnp.stack([jnp.asarray(lane, jnp.uint32)] * 4, -1)
                )[..., 0]
            )
            y = _radical_inverse_base3(i, lane, self.seed)
            return jnp.stack([x, y], axis=-1)
        return rng.rand2(lane, sample_idx, 0, self._seed())

    def _seed(self):
        # Sampler-owned draws live in their own stream so slot integers
        # can never alias integrator decisions (see core/rng.py partition).
        return rng.stream_seed(self.seed, rng.STREAM_CAMERA)

    def lens_sample(self, lane, sample_idx):
        """2D aperture/time sample: Sobol' dims 2-3 for LD samplers
        (reference sobol.cpp consumes dims in request order), hash
        otherwise."""
        if self.kind in (LDSAMPLER, SOBOL, HALTON, HAMMERSLEY):
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


def _radical_inverse_base3(i, lane, seed):
    """Base-3 radical inverse with per-pixel Cranley-Patterson rotation."""
    i = jnp.asarray(i, jnp.uint32)
    x = jnp.zeros(i.shape, jnp.float32)
    f = jnp.float32(1.0 / 3.0)
    v = i
    for _ in range(20):
        x = x + (v % 3).astype(jnp.float32) * f
        v = v // 3
        f = f / 3.0
    rot = rng.rand1(lane, 0, 991, rng.stream_seed(seed, rng.STREAM_CAMERA))
    return jnp.mod(x + rot, 1.0)


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
