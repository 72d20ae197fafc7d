"""High-dimensional Sobol' direction-number matrices + sampling.

The reference ships 108k lines of generated direction numbers
(src/samplers/sobolseq.cpp); here the matrices are COMPUTED at import:

* dim 0: van der Corput (identity matrix, radical inverse base 2)
* dim 1: the canonical (0,2)-sequence partner (qmc.h vdC/Sobol' pair)
* dims 2..9: the classic Joe-Kuo initialisation values (public data,
  Bratley-Fox ACM TOMS 659 heads)
* dims 10+: primitive polynomials found by exhaustive search over GF(2)
  (primitivity = x has order 2^s - 1 mod p), with odd initial direction
  numbers derived from a fixed splitmix hash — every dimension is a
  valid base-2 (0,1)-sequence by construction; pairwise quality is
  validated statistically in tests/test_samplers.py.

Sampling uses per-(pixel, decision) XOR scrambling ("padded Sobol"), so
each decision slot sees its own scrambled copy of the sequence — the
TPU-native replacement for the reference's per-sampler instance state.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

N_DIMS = 160
N_BITS = 32

# Joe-Kuo table head: (degree s, coeff a, [m_1..m_s]) for dims 2..9
# (public new-joe-kuo-6 data, first rows)
_JOE_KUO_HEAD = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
]


def _gf2_mulmod(a: int, b: int, p: int, s: int) -> int:
    """(a*b) mod p over GF(2)[x]; p has degree s."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> s & 1:
            a ^= p
    return r


def _prime_factors(n: int):
    out = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def _x_pow(e: int, p: int, s: int) -> int:
    """x^e mod p over GF(2)."""
    r, b = 1, 2  # 1, x
    while e:
        if e & 1:
            r = _gf2_mulmod(r, b, p, s)
        b = _gf2_mulmod(b, b, p, s)
        e >>= 1
    return r


def _is_primitive(p: int, s: int) -> bool:
    order = (1 << s) - 1
    if _x_pow(order, p, s) != 1:
        return False
    for q in _prime_factors(order):
        if _x_pow(order // q, p, s) == 1:
            return False
    return True


def _primitive_polys(count: int):
    """First `count` primitive polynomials (as (s, a) pairs) in degree
    order; `a` encodes the interior coefficients a_1..a_{s-1}."""
    out = []
    s = 1
    while len(out) < count:
        # polynomial = x^s + a_1 x^{s-1} + ... + a_{s-1} x + 1; the
        # returned `a` uses the Joe-Kuo convention (a_1 = MSB), matching
        # the recurrence in direction_matrices()
        for cand in range(1 << max(s - 1, 0)):
            p = (1 << s) | 1
            a_msb = 0
            for i in range(s - 1):
                if cand >> i & 1:
                    p |= 1 << (s - 1 - i)  # a_{i+1} set
                    a_msb |= 1 << (s - 2 - i)
            if _is_primitive(p, s):
                out.append((s, a_msb))
                if len(out) >= count:
                    break
        s += 1
    return out


def _splitmix(x: int) -> int:
    x = (x + 0x9E3779B9) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & 0xFFFFFFFF
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & 0xFFFFFFFF
    x ^= x >> 16
    return x


@functools.lru_cache(maxsize=1)
def direction_matrices() -> np.ndarray:
    """[N_DIMS, N_BITS] uint32; V[d][k] = direction number for bit k."""
    V = np.zeros((N_DIMS, N_BITS), np.uint64)

    # dim 0: identity (radical inverse)
    for k in range(N_BITS):
        V[0, k] = 1 << (31 - k)

    # dim 1: v_{k+1} = v_k ^ (v_k >> 1)  (matches rng.sobol_2d)
    v = 1 << 31
    for k in range(N_BITS):
        V[1, k] = v
        v = v ^ (v >> 1)

    polys = _primitive_polys(N_DIMS + 16)  # generous; head skips some
    head = list(_JOE_KUO_HEAD)
    pi = 0
    for d in range(2, N_DIMS):
        if head:
            s, a, m = head.pop(0)
        else:
            # skip polynomials already consumed by the head table
            while pi < len(polys) and polys[pi][0] <= 5:
                pi += 1
            s, a = polys[pi]
            pi += 1
            m = [
                (_splitmix(d * 97 + k) % (1 << k)) | 1
                for k in range(1, s + 1)
            ]
        mm_ = list(m)
        for k in range(s, N_BITS):
            new = mm_[k - s] ^ (mm_[k - s] << s)
            for i in range(1, s):
                if a >> (s - 1 - i) & 1:
                    new ^= mm_[k - i] << i
            mm_.append(new & 0xFFFFFFFF)
        for k in range(N_BITS):
            V[d, k] = (mm_[k] << (31 - k)) & 0xFFFFFFFF
    return V.astype(np.uint32)


def device_matrices():
    # NOT lru-cached as a jnp array: the first call may happen inside a
    # jit trace, and caching would leak that trace's DynamicJaxprTracer
    # into every later computation (UnexpectedTracerError).  The numpy
    # table IS cached; wrapping it per call is a free trace-time const.
    return jnp.asarray(direction_matrices())


def sobol_bits(index, dims):
    """Sobol' integer samples.

    index: uint32 [...]; dims: static tuple of dimension indices.
    Returns uint32 [..., len(dims)] — XOR of direction numbers over the
    set bits of index (qmc.h sobol'/vdC generator-matrix product).
    """
    V = device_matrices()  # [D, 32]
    cols = jnp.stack([V[d] for d in dims], axis=-1)  # [32, n]
    index = jnp.asarray(index, jnp.uint32)
    out = jnp.zeros(index.shape + (len(dims),), jnp.uint32)
    for k in range(N_BITS):
        bit = (index >> k) & jnp.uint32(1)
        out = out ^ (bit[..., None] * cols[k])
    return out


def sobol_01(index, dims, scramble=None):
    """float32 in [0,1): Sobol' points with optional XOR scrambling.
    scramble: uint32 broadcastable to [..., len(dims)]."""
    bits = sobol_bits(index, dims)
    if scramble is not None:
        bits = bits ^ scramble
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / 16777216.0
    )


def sobol_bits_dyn(index, dim_idx):
    """Sobol' integer samples with TRACED dimension indices.

    index: uint32 [...]; dim_idx: int array [..., n] (values clipped to
    [0, N_DIMS)).  Used by the integrators to route per-bounce decision
    slots through the sequence (dimension = f(depth) is loop-carried)."""
    V = device_matrices()  # [D, 32]
    cols = V[jnp.clip(dim_idx, 0, N_DIMS - 1)]  # [..., n, 32]
    index = jnp.asarray(index, jnp.uint32)
    out_shape = jnp.broadcast_shapes(
        index.shape + (1,), jnp.shape(dim_idx)
    )
    out = jnp.zeros(out_shape, jnp.uint32)
    for k in range(N_BITS):
        bit = (index >> k) & jnp.uint32(1)
        out = out ^ (bit[..., None] * cols[..., k])
    return out


def sobol_01_dyn(index, dim_idx, scramble=None):
    bits = sobol_bits_dyn(index, dim_idx)
    if scramble is not None:
        bits = bits ^ scramble
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / 16777216.0
    )


# --- Faure-permuted Halton (reference src/libcore/qmc.cpp faure.cpp) ---

_FAURE_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


@functools.lru_cache(maxsize=1)
def faure_permutations():
    """Digit permutations sigma_b for the first len(_FAURE_PRIMES)
    prime bases (Faure 1992 recursive construction; the reference
    precomputes these in faure.cpp).  Returns [n_primes, max_b] int32
    (rows padded with the identity tail)."""

    @functools.lru_cache(maxsize=None)
    def sigma(b):
        if b == 2:
            return (0, 1)
        if b % 2 == 0:
            h = sigma(b // 2)
            return tuple(2 * x for x in h) + tuple(2 * x + 1 for x in h)
        h = sigma(b - 1)
        c = (b - 1) // 2
        h2 = [x + 1 if x >= c else x for x in h]
        return tuple(h2[:c]) + (c,) + tuple(h2[c:])

    max_b = max(_FAURE_PRIMES)
    out = np.tile(np.arange(max_b, dtype=np.int32), (len(_FAURE_PRIMES), 1))
    for i, p in enumerate(_FAURE_PRIMES):
        out[i, :p] = sigma(p)
    return out


def _device_faure():
    # see device_matrices: no jnp-level cache inside traces
    return jnp.asarray(faure_permutations())


def halton_faure(index, prime_slot, rot=None):
    """Faure-permuted radical inverse in base _FAURE_PRIMES[prime_slot]
    (static slot).  index: uint32 [...]; rot: optional Cranley-Patterson
    rotation in [0,1).  (reference qmc.h scrambledRadicalInverse +
    faure.cpp permutations)."""
    p = _FAURE_PRIMES[prime_slot]
    perm = _device_faure()[prime_slot]  # [max_b]
    n_digits = int(np.ceil(32.0 / np.log2(p)))
    v = jnp.asarray(index, jnp.uint32)
    x = jnp.zeros(v.shape, jnp.float32)
    f = jnp.float32(1.0 / p)
    for _ in range(n_digits):
        digit = (v % p).astype(jnp.int32)
        x = x + perm[digit].astype(jnp.float32) * f
        v = v // p
        f = f / p
    if rot is not None:
        x = jnp.mod(x + rot, 1.0)
    return x
