"""Veach-style MLT and ERPT over primary-sample chain tensors.

Rebuild of reference src/integrators/mlt/{mlt.cpp,mlt_proc.cpp:67-224}
and src/integrators/erpt/{erpt.cpp:134,erpt_proc.cpp:120-260} with the
Veach mutation suite (include/mitsuba/bidir/mut_lens.h:36,
mut_caustic.h:36, mut_mchain.h:36) re-expressed for the TPU chain-tensor
machinery:

The reference mutates heap-allocated Path objects per chain.  Here a
chain IS a row of the dense primary-sample tensor U [CHAINS, D]
(integrator/pssmlt.py path_from_primary re-traces all chains in
lockstep), and each Veach perturbation becomes a structured move on
that row:

* lens perturbation (mut_lens.h): perturb only the image-plane dims
  U[0:2] by an exponentially distributed radius r in [r1, r2] PIXELS
  (Veach's recommended minJump=0.1 px, coveredArea=5% of the image,
  erpt_proc.cpp "Jump sizes recommended by Eric Veach").  All path
  decision dims are REUSED, so the retraced path follows the same
  reflect/refract branches — through specular chains this reproduces
  the reference's lens perturbation exactly (delta lobes consume no
  uniforms; lobe-selection uniforms are kept, so the same lobe is
  chosen), and on diffuse vertices it degrades gracefully to a local
  path move instead of failing.
* caustic perturbation (mut_caustic.h): perturb one uniformly chosen
  bounce's BSDF-direction dims with the Kelemen step size, reusing
  everything else — the "wiggle one scattering direction, keep the
  chain" move.
* multi-chain perturbation (mut_mchain.h): lens dims AND every bounce's
  BSDF dims perturbed together (the cross-chain generalization).
* bidirectional mutation (mut_bidir.h): an independent fresh path —
  in primary space an unrestricted resample of U (the PSSMLT large
  step), which can regenerate any path structure.

Every move is SYMMETRIC in primary space, so the Metropolis acceptance
stays a = min(1, I'/I) — the reference needs per-mutation transition
densities (Mutator::Q) only because it works in path space.

ERPT (Cline et al. 2005; reference erpt_proc.cpp): ordinary path-traced
seeds, each promoted to min(1, I/(e_d)) Metropolis chains of
`chainLength` perturbation-only mutations, each step depositing the
fixed quantum e_d split (1-a)/a between current and proposed states.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.core import rng
from mitsuba_tpu.core.spectrum import luminance
from mitsuba_tpu.integrator.pssmlt import (
    _HEAD,
    _PER_DEPTH,
    _S1,
    _S2,
    _kelemen_mutate,
    _splat,
    bootstrap_chains,
    dims_for,
    path_from_primary,
)

# Veach's lens-perturbation jump sizes (erpt_proc.cpp:117-118):
# minJump = 0.1 px, covered area = 5% of the image
_LENS_R1_PX = 0.1
_LENS_AREA = 0.05


def _exp_step(u, r1, r2):
    """Exponentially distributed step in [r1, r2] (mut_lens.h
    perturbMedia/sampling): r = r2 * exp(-log(r2/r1) * u)."""
    return r2 * jnp.exp(-jnp.log(r2 / r1) * u)


def _perturb_lens(U, w, h, u4):
    """Perturb the image-plane dims only (dims 0:2), exponential radius
    in pixels, uniform angle; path decision dims are reused."""
    r2 = float(np.sqrt(_LENS_AREA * w * h))
    r = _exp_step(u4[..., 0], _LENS_R1_PX, r2)
    phi = 2.0 * jnp.pi * u4[..., 1]
    dx = r * jnp.cos(phi) / w
    dy = r * jnp.sin(phi) / h
    x = U[:, 0] + dx
    y = U[:, 1] + dy
    out = U.at[:, 0].set(x - jnp.floor(x))
    out = out.at[:, 1].set(y - jnp.floor(y))
    return out


def _perturb_block(U, k, u_mut, u_sign, n_dims=3, off=3):
    """Kelemen-perturb `n_dims` dims of depth block k (default: the BSDF
    direction+lobe dims at offset 3 within the block)."""
    base = _HEAD + _PER_DEPTH * k
    cols = base[:, None] + jnp.arange(n_dims)[None, :] + off
    step = _S2 * jnp.exp(-jnp.log(_S2 / _S1) * u_mut)
    delta = jnp.where(u_sign < 0.5, step, -step)
    rows = jnp.arange(U.shape[0])[:, None]
    vals = U[rows, cols] + delta
    return U.at[rows, cols].set(vals - jnp.floor(vals))


def propose_veach(U, k, seed_mlt, w, h, max_depth, p_large, lanes=None):
    """One structured mutation per chain; returns (U_prop, is_large).

    Mutation choice per chain: large step with prob p_large, else
    uniformly among {full small, lens, caustic, multichain}.  `lanes`
    are GLOBAL chain ids (for sharded runs); default = arange."""
    n, D = U.shape
    if lanes is None:
        lanes = jnp.arange(n, dtype=jnp.uint32)
    u_ctl = rng.rand4(lanes, k, 3, seed_mlt)

    dim_l = lanes[:, None].astype(jnp.uint32) * D + jnp.arange(
        D, dtype=jnp.uint32
    )[None, :]
    dim_l = dim_l.reshape(-1)
    um = rng.rand4(dim_l, k, 4, seed_mlt)
    u_mut = um[:, 0].reshape(n, D)
    u_sign = um[:, 1].reshape(n, D)
    u_fresh = um[:, 2].reshape(n, D)
    u_pb = rng.rand4(lanes, k, 5, seed_mlt)

    large = u_ctl[:, 0] < p_large
    which = (u_ctl[:, 1] * 4.0).astype(jnp.int32)  # 0..3

    # full Kelemen small step
    U_small = _kelemen_mutate(U, u_mut, u_sign)
    # lens perturbation
    U_lens = _perturb_lens(U, w, h, u_pb)
    # caustic perturbation: one random bounce's BSDF dims
    kblk = jnp.minimum(
        (u_pb[..., 2] * max_depth).astype(jnp.int32), max_depth - 1
    )
    U_caustic = _perturb_block(
        U, kblk, u_mut[:, 0:3], u_sign[:, 0:3]
    )
    # multichain: lens + every bounce's BSDF dims
    U_mc = _perturb_lens(U, w, h, u_pb)
    for kb in range(max_depth):
        base = _HEAD + _PER_DEPTH * kb + 3
        vals = U_mc[:, base:base + 3] + jnp.where(
            u_sign[:, base:base + 3] < 0.5, 1.0, -1.0
        ) * (_S2 * jnp.exp(-jnp.log(_S2 / _S1) * u_mut[:, base:base + 3]))
        U_mc = U_mc.at[:, base:base + 3].set(vals - jnp.floor(vals))

    U_prop = jnp.where((which == 0)[:, None], U_small, U_lens)
    U_prop = jnp.where((which == 2)[:, None], U_caustic, U_prop)
    U_prop = jnp.where((which == 3)[:, None], U_mc, U_prop)
    U_prop = jnp.where(large[:, None], u_fresh, U_prop)
    return U_prop, large


def render_mlt(scene, spp=None, seed=0, pack=None, chains=None, mesh=None):
    """Veach-mutation MLT render (= MLT::render, mlt.cpp).

    Same normalization/film machinery as PSSMLT; only the proposal
    kernel differs (structured mutation portfolio above).  With `mesh`
    the chains shard across devices (see render_pssmlt)."""
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    sen = scene.sensor.record
    film_rec = sen.film
    integ = scene.integrator
    w, h = film_rec.width, film_rec.height
    cam = sen.pack(w, h)
    max_depth = integ.max_depth if integ.max_depth > 0 else 16
    D = dims_for(max_depth)
    n_px = w * h
    mutations_pp = spp or integ.mutations_per_pixel
    # the bidirectional mutation (large step) is one of five mutators
    p_large = integ.p_large if integ.p_large > 0 else 0.2

    n_chains = chains or min(1 << 17, n_px)
    if mesh is not None:
        n_dev = mesh.devices.size
        n_chains = -(-n_chains // n_dev) * n_dev
    seed_mlt = rng.stream_seed(seed, rng.STREAM_MLT)

    trace = jax.jit(lambda U: path_from_primary(pack, integ, cam, w, h, U))
    n_boot = max(integ.luminance_samples // n_chains, 2)
    U_cur, b_norm = bootstrap_chains(
        trace, D, n_chains, n_boot, seed, seed_mlt
    )
    if U_cur is None:
        return np.zeros((h, w, 3), np.float32)

    pos_cur, L_cur = trace(U_cur)
    I_cur = luminance(L_cur)

    total_mutations = mutations_pp * n_px
    n_steps = max(total_mutations // n_chains, 1)

    # the manifold perturbation runs as every 4th step when enabled
    # and the scene has smooth delta chains to solve (reference
    # mlt.cpp manifoldPerturbation; integrator/mut_manifold.py)
    from mitsuba_tpu.bsdf.plugins import CONDUCTOR, DIELECTRIC

    mani_on = bool(
        getattr(integ, "manifold_perturbation", False)
        and any(t in (CONDUCTOR, DIELECTRIC) for t in pack.present_types)
        and max_depth >= 3
    )

    def _mh_tail(carry, k, U_prop, corr):
        U_cur, pos_cur, L_cur, I_cur, film, lanes = carry
        u_acc = rng.rand4(lanes, k, 6, seed_mlt)
        pos_p, L_p = path_from_primary(pack, integ, cam, w, h, U_prop)
        I_p = luminance(L_p)

        a = jnp.clip(
            I_p / jnp.maximum(I_cur, 1e-12) * corr, 0.0, 1.0
        )
        w_cur = (1.0 - a) / jnp.maximum(I_cur, 1e-12)
        w_prop = a / jnp.maximum(I_p, 1e-12)
        film = _splat(film, pos_cur, L_cur * w_cur[:, None], w, h)
        film = _splat(film, pos_p, L_p * w_prop[:, None], w, h)

        accept = u_acc[:, 1] < a
        U_cur = jnp.where(accept[:, None], U_prop, U_cur)
        pos_cur = jnp.where(accept[:, None], pos_p, pos_cur)
        L_cur = jnp.where(accept[:, None], L_p, L_cur)
        I_cur = jnp.where(accept, I_p, I_cur)
        return (U_cur, pos_cur, L_cur, I_cur, film, lanes)

    def veach_step(carry, k):
        U_cur = carry[0]
        lanes = carry[5]
        U_prop, _ = propose_veach(
            U_cur, k, seed_mlt, w, h, max_depth, p_large, lanes=lanes
        )
        return _mh_tail(carry, k, U_prop, 1.0)

    def mani_step(carry, k):
        from mitsuba_tpu.integrator.mut_manifold import propose_manifold

        U_cur = carry[0]
        lanes = carry[5]
        U_prop, corr, _ = propose_manifold(
            pack, integ, cam, w, h, U_cur, k, seed_mlt, lanes
        )
        return _mh_tail(carry, k, U_prop, corr)

    def step(carry, k):
        if mani_on:
            return jax.lax.cond(
                k % 4 == 3, mani_step, veach_step, carry, k
            ), None
        return veach_step(carry, k), None

    ks = jnp.arange(n_steps, dtype=jnp.uint32)
    lanes_all = jnp.arange(n_chains, dtype=jnp.uint32)

    def chain_run(lanes, U0, pos0, L0, I0):
        film = jnp.zeros((h, w, 3), jnp.float32)
        carry = (U0, pos0, L0, I0, film, lanes)
        carry, _ = jax.lax.scan(step, carry, ks)
        return carry[4]

    if mesh is None:
        film = jax.jit(chain_run)(lanes_all, U_cur, pos_cur, L_cur, I_cur)
    else:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        film = jax.jit(
            jax.shard_map(
                lambda l, u, p, L, i: jax.lax.psum(
                    chain_run(l, u, p, L, i), ax
                ),
                mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax)),
                out_specs=P(),
                check_vma=False,
            )
        )(lanes_all, U_cur, pos_cur, L_cur, I_cur)
    scale = b_norm * n_px / (n_steps * n_chains)
    from mitsuba_tpu.integrator.pssmlt import add_direct_component

    return add_direct_component(
        np.asarray(film * scale), scene, pack, integ, seed
    )


def render_erpt(scene, spp=None, seed=0, pack=None, chains=None, mesh=None):
    """Energy redistribution path tracing (= ERPT::render, erpt.cpp:134).

    Each pass: fresh path-traced seeds; each seed starts a Metropolis
    chain with probability min(1, I/e_d) (stochastic chain count,
    erpt_proc.cpp numChains rounding) running `chainLength`
    perturbation-only mutations (no large steps); each step deposits the
    fixed energy quantum e_d with expected-values (1-a)/a splitting.
    """
    from mitsuba_tpu.scene.builder import pack_scene

    if pack is None:
        pack = pack_scene(scene)
    sen = scene.sensor.record
    film_rec = sen.film
    integ = scene.integrator
    w, h = film_rec.width, film_rec.height
    cam = sen.pack(w, h)
    max_depth = integ.max_depth if integ.max_depth > 0 else 16
    D = dims_for(max_depth)
    n_px = w * h
    samples_pp = spp or sen.sampler.sample_count
    chain_len = max(getattr(integ, "chain_length", 0) or 100, 1)

    n_lanes = chains or min(1 << 16, n_px)
    if mesh is not None:
        n_lanes = -(-n_lanes // mesh.devices.size) * mesh.devices.size
    seed_mlt = rng.stream_seed(seed, rng.STREAM_MLT)

    trace = jax.jit(lambda U: path_from_primary(pack, integ, cam, w, h, U))

    # normalization pass: average path luminance b -> deposition quantum
    # e_d = b * chainLength / avg#mutations ... reference uses
    # e_d = b / numChains with numChains ~ 1 per seed on average; we set
    # e_d = b so E[#chains per seed] = E[I]/b = 1 (erpt.cpp numChains=1)
    n_boot = 4
    boot = []
    for bi in range(n_boot):
        U = rng.rand4(
            jnp.arange(n_lanes * D, dtype=jnp.uint32) // D,
            jnp.arange(n_lanes * D, dtype=jnp.uint32) % D,
            jnp.uint32(9000 + bi),
            seed_mlt,
        )[:, 0].reshape(n_lanes, D)
        _, L = trace(U)
        boot.append(np.asarray(luminance(L)))
    b_norm = float(np.concatenate(boot).mean())
    if b_norm <= 0:
        return np.zeros((h, w, 3), np.float32)
    e_d = b_norm

    n_seed_rounds = max((samples_pp * n_px) // n_lanes, 1)

    def seed_round(film, lanes, round_i):
        nloc = lanes.shape[0]
        dim_l = (
            lanes[:, None].astype(jnp.uint32) * D
            + jnp.arange(D, dtype=jnp.uint32)[None, :]
        ).reshape(-1)
        U0 = rng.rand4(
            dim_l // D, dim_l % D, round_i * 2 + 101, seed_mlt
        )[:, 0].reshape(nloc, D)
        pos0, L0 = path_from_primary(pack, integ, cam, w, h, U0)
        I0 = luminance(L0)

        # stochastic chain count: run the chain with prob min(1, I/e_d);
        # chains from bright seeds carry proportionally more deposition
        u_run = rng.rand4(lanes, round_i, 7, seed_mlt)[:, 0]
        n_c = jnp.floor(I0 / e_d + u_run)  # 0,1,2,... chains
        dep = n_c * e_d / jnp.float32(chain_len)  # per-step deposit
        run = n_c > 0

        def mstep(carry, k):
            U, pos, L, I, film = carry
            u_acc = rng.rand4(lanes, round_i * 65536 + k, 8, seed_mlt)
            U_p, _ = propose_veach(
                U, round_i * 65536 + k, seed_mlt, w, h, max_depth, 0.0,
                lanes=lanes,
            )
            pos_p, L_p = path_from_primary(pack, integ, cam, w, h, U_p)
            I_p = luminance(L_p)
            a = jnp.clip(I_p / jnp.maximum(I, 1e-12), 0.0, 1.0)
            # equal-deposition splat: e_d * (1-a) at x, e_d * a at y
            v_cur = jnp.where(
                (run & (I > 0))[:, None],
                L / jnp.maximum(I, 1e-12)[:, None]
                * (dep * (1.0 - a))[:, None],
                0.0,
            )
            v_p = jnp.where(
                (run & (I_p > 0))[:, None],
                L_p / jnp.maximum(I_p, 1e-12)[:, None] * (dep * a)[:, None],
                0.0,
            )
            film = _splat(film, pos, v_cur, w, h)
            film = _splat(film, pos_p, v_p, w, h)
            accept = u_acc[:, 1] < a
            U = jnp.where(accept[:, None], U_p, U)
            pos = jnp.where(accept[:, None], pos_p, pos)
            L = jnp.where(accept[:, None], L_p, L)
            I = jnp.where(accept, I_p, I)
            return (U, pos, L, I, film), None

        carry = (U0, pos0, L0, I0, film)
        carry, _ = jax.lax.scan(
            mstep, carry, jnp.arange(chain_len, dtype=jnp.uint32)
        )
        return carry[4]

    lanes_all = jnp.arange(n_lanes, dtype=jnp.uint32)
    if mesh is None:
        run = jax.jit(seed_round)
    else:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        run = jax.jit(
            jax.shard_map(
                lambda film, lanes, ri: jax.lax.psum(
                    seed_round(jnp.zeros_like(film), lanes, ri), ax
                ) + film,
                mesh=mesh,
                in_specs=(P(), P(ax), P()),
                out_specs=P(),
                check_vma=False,
            )
        )

    film = jnp.zeros((h, w, 3), jnp.float32)
    for ri in range(n_seed_rounds):
        film = run(film, lanes_all, jnp.uint32(ri))
    # each seed represents 1/(seeds per pixel) of the estimator
    scale = n_px / (n_seed_rounds * n_lanes)
    from mitsuba_tpu.integrator.pssmlt import add_direct_component

    return add_direct_component(
        np.asarray(film * scale), scene, pack, integ, seed
    )
