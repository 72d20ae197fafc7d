"""Counter-based, stateless RNG for wavefront rendering.

The reference uses a stateful SFMT Mersenne Twister with one stream per
worker core (reference: include/mitsuba/core/random.h, sched.h:395-403
registerMultiResource).  On TPU, per-lane mutable state is an
anti-pattern; instead every random number is a pure hash of its logical
coordinates (pixel, sample index, bounce, decision slot), which makes
renders bit-deterministic regardless of sharding — the multi-chip film is
exactly the single-chip film.

The hash is PCG4D (Jarzynski & Olano, JCGT 2020): 4 uint32 in, 4 uint32
out, passes BigCrush-level tests for this use, and is ~20 integer VPU ops
per 4 floats — far cheaper than threading `jax.random` keys through the
bounce loop.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

# --- global RNG stream partition ---------------------------------------------
#
# Every independent CONSUMER of randomness draws from its own stream,
# obtained by tagging the high nibble of the seed word (stream_seed).
# Within a stream, (slot) integers must be unique per decision; ACROSS
# streams, identical slots are fine because the seed word differs.  This
# is the global partition CLAUDE.md's "slot collisions are bugs"
# invariant refers to; tests/test_rng.py::test_stream_partition enforces
# it.  (Reference analogue: per-decision sample streams of the
# per-worker samplers, sched.h:395-403.)
#
# STREAM_PATH keeps the identity tag so existing path renders remain
# bit-identical to round 1.
STREAM_PATH = 0  # integrator bounce loops: slot = event * 8 + decision
STREAM_CAMERA = 1  # sampler-owned draws: film jitter, lens, halton rot
STREAM_MEDIUM_DIST = 2  # heterogeneous delta tracking (sample_distance)
STREAM_MEDIUM_TRANS = 3  # shadow-ray ratio tracking (transmittance)
STREAM_LIGHT = 4  # light-subpath walks (ptracer / bdpt light paths)
STREAM_MLT = 5  # pssmlt/mlt chain mutations & control decisions
STREAM_SSS = 6  # subsurface irradiance-point sampling (dipole preprocess)
STREAM_WEAVE = 7  # irawan weave noise: DETERMINISTIC texture hash keyed
# on lattice indices, not a sampling decision stream (bsdf/irawan.py)


def stream_seed(seed, stream):
    """Derive the seed word for an independent RNG stream.

    The stream tag lands in bits 28-31 of the seed, so user seeds (small
    integers) can never alias two streams onto the same hash inputs.
    """
    return jnp.asarray(seed, _U32) ^ (_U32(stream) << 28)


def pcg4d_mult(v):
    """PCG4D hash (Jarzynski & Olano). v: uint32 [..., 4] -> [..., 4].

    NOTE: int32 multiplies are emulated on the TPU VPU (no integer
    multiplier), making this ~3x the cost of the ChaCha-style hash
    below; kept as the reference implementation."""
    v = v.astype(_U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def _rotl(x, k):
    return ((x << k) | (x >> (32 - k))).astype(_U32)


def _quarter(a, b, c, d):
    """ChaCha quarter round — adds/xors/rotates only (TPU-fast)."""
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def pcg4d(v):
    """Counter-based 4-in/4-out hash used for all rendering decisions.

    Three ChaCha quarter-rounds with a diagonal shuffle in between —
    add/xor/rotate only, because the TPU VPU has no int32 multiplier
    (the multiply-based PCG4D costs ~3x as much here).  Avalanche and
    equidistribution are validated by tests/test_rng.py and every
    chi-square test in the suite.
    """
    v = v.astype(_U32)
    a, b, c, d = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    # key/constant injection so small counters diverge immediately
    a = a ^ _U32(0x9E3779B9)
    b = b + _U32(0x85EBCA6B)
    c = c ^ _U32(0xC2B2AE35)
    d = d + _U32(0x27D4EB2F)
    a, b, c, d = _quarter(a, b, c, d)
    b, c, d, a = _quarter(b, c, d, a)  # diagonal-style shuffle
    a, b, c, d = _quarter(a, b, c, d)
    return jnp.stack([a, b, c, d], axis=-1)


def _to_float01(bits):
    """uint32 -> float32 in [0, 1) with 24 bits of mantissa entropy."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def rand4(lane, sample_idx, slot, seed=0):
    """4 independent uniforms in [0,1) keyed on (lane, sample, slot, seed).

    All args are int32/uint32 arrays broadcastable against each other;
    `slot` is a static per-decision identifier (bounce * N + decision).
    Returns float32 [..., 4].
    """
    lane = jnp.asarray(lane)
    shape = jnp.broadcast_shapes(
        lane.shape,
        jnp.shape(jnp.asarray(sample_idx)),
        jnp.shape(jnp.asarray(slot)),
    )
    v = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(lane, _U32), shape),
            jnp.broadcast_to(jnp.asarray(sample_idx, _U32), shape),
            jnp.broadcast_to(jnp.asarray(slot, _U32), shape),
            jnp.broadcast_to(jnp.asarray(seed, _U32), shape)
            ^ _U32(0x9E3779B9),
        ],
        axis=-1,
    )
    return _to_float01(pcg4d(v))


def rand2(lane, sample_idx, slot, seed=0):
    return rand4(lane, sample_idx, slot, seed)[..., :2]


def rand1(lane, sample_idx, slot, seed=0):
    return rand4(lane, sample_idx, slot, seed)[..., 0]


# --- low-discrepancy helpers -------------------------------------------------

def radical_inverse_base2(bits):
    """Van der Corput radical inverse in base 2 (reference qmc.h:40)."""
    bits = bits.astype(_U32)
    bits = ((bits << 16) | (bits >> 16)).astype(_U32)
    bits = ((bits & _U32(0x00FF00FF)) << 8) | ((bits & _U32(0xFF00FF00)) >> 8)
    bits = ((bits & _U32(0x0F0F0F0F)) << 4) | ((bits & _U32(0xF0F0F0F0)) >> 4)
    bits = ((bits & _U32(0x33333333)) << 2) | ((bits & _U32(0xCCCCCCCC)) >> 2)
    bits = ((bits & _U32(0x55555555)) << 1) | ((bits & _U32(0xAAAAAAAA)) >> 1)
    return _to_float01(bits)


def sobol_2d_scrambled(index, scramble_x, scramble_y):
    """sobol_2d with per-lane uint32 scramble arrays (random-digit XOR
    scrambling, as in reference ldsampler.cpp sample02 usage)."""
    index = jnp.asarray(index, _U32)
    x_bits = _reverse_bits(index) ^ jnp.asarray(scramble_x, _U32)
    result = jnp.asarray(scramble_y, _U32) | jnp.zeros_like(index)
    direction = 1 << 31
    for i in range(32):
        result = jnp.where(
            (index >> i) & _U32(1), result ^ _U32(direction), result
        )
        direction = (direction ^ (direction >> 1)) & 0xFFFFFFFF
    return jnp.stack([_to_float01(x_bits), _to_float01(result)], axis=-1)


def _reverse_bits(bits):
    bits = bits.astype(_U32)
    bits = ((bits << 16) | (bits >> 16)).astype(_U32)
    bits = ((bits & _U32(0x00FF00FF)) << 8) | ((bits & _U32(0xFF00FF00)) >> 8)
    bits = ((bits & _U32(0x0F0F0F0F)) << 4) | ((bits & _U32(0xF0F0F0F0)) >> 4)
    bits = ((bits & _U32(0x33333333)) << 2) | ((bits & _U32(0xCCCCCCCC)) >> 2)
    bits = ((bits & _U32(0x55555555)) << 1) | ((bits & _U32(0xAAAAAAAA)) >> 1)
    return bits


def sobol_2d(index, scramble_x=0, scramble_y=0):
    """First two dimensions of the Sobol' (0,2)-sequence with Owen-style
    XOR scrambling (reference: src/samplers/ldsampler.cpp sample02).

    index: uint32 array; returns float32 [..., 2].
    """
    index = jnp.asarray(index, _U32)
    x = radical_inverse_base2(index ^ _U32(scramble_x))

    # Second dimension: Sobol' direction numbers of the (0,2)-sequence
    # (Kollig & Keller bit trick: v_{k+1} = v_k ^ (v_k >> 1), v_0 = 2^31).
    result = jnp.full(index.shape, _U32(scramble_y), _U32)
    direction = 1 << 31
    for i in range(32):
        result = jnp.where(
            (index >> i) & _U32(1), result ^ _U32(direction), result
        )
        direction = (direction ^ (direction >> 1)) & 0xFFFFFFFF
    y = _to_float01(result)
    return jnp.stack([x, y], axis=-1)
