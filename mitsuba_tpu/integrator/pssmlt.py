"""Primary-sample-space Metropolis light transport (Kelemen-style).

Rebuild of reference src/integrators/pssmlt/{pssmlt.cpp:150-198,
pssmlt_sampler.h:34-112} reformulated for TPU: instead of one Markov
chain per worker thread, the sampler state is a dense [CHAINS, D] tensor
of primary samples and every Metropolis step mutates / re-traces /
accept-rejects ALL chains in lockstep:

* bootstrap: ordinary path samples estimate the luminance normalization
  b and seed chains proportionally to path luminance (two-stage seeding,
  pssmlt.cpp:181-198),
* small steps: Kelemen's symmetric log-space mutation
  (pssmlt_sampler.h:70-103), large steps with probability pLarge,
* both the current and proposed states are splatted with their MIS-
  optimal weights (expected-values technique).

The path is re-traced from explicit primary samples by a variant of the
path loop whose per-decision randomness comes from the chain's U vector
instead of the counter-based hash.
"""

from __future__ import annotations

from functools import partial

import os

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.intersect import fill_interaction, intersect, occluded
from mitsuba_tpu.bsdf.eval import bsdf_eval, bsdf_pdf, bsdf_sample
from mitsuba_tpu.bsdf.plugins import NULL_BSDF
from mitsuba_tpu.core import math as mm
from mitsuba_tpu.core.gather import take_rows
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.spectrum import luminance
from mitsuba_tpu.emitter import eval as em
from mitsuba_tpu.integrator import path as _path
from mitsuba_tpu.scene.texture_eval import (
    mip_footprint,
    shading_frame,
    shading_params,
)
from mitsuba_tpu.sensor.plugins import generate_rays

# primary-sample layout per path:
#   [0:2] film position, [2:4] lens sample,
#   per depth d: [4+8d : 12+8d] = NEE(3) + BSDF(3) + RR(1) + spare(1)
_HEAD = 4
_PER_DEPTH = 8

# Kelemen mutation sizes (reference pssmlt_sampler.h:37)
_S1 = 1.0 / 1024.0
_S2 = 1.0 / 64.0


def dims_for(max_depth: int) -> int:
    return _HEAD + _PER_DEPTH * max_depth


def path_from_primary(pack, integ, cam, w, h, U):
    """Trace one path per chain from explicit primary samples U [N, D].

    Returns (pos [N, 2] film position in pixels, L [N, 3]).
    """
    n = U.shape[0]
    present = pack.present_types
    max_depth = integ.max_depth if integ.max_depth > 0 else 16
    rr_depth = max(integ.rr_depth, 1)
    # directSamples >= 0: the direct component (path length <= 2)
    # renders separately with ordinary sampling and the MLT target
    # covers only longer paths (reference BidirectionalUtils::
    # renderDirectComponent, mlt.cpp/pssmlt.cpp directSamples)
    split_direct = getattr(integ, "direct_samples", -1) >= 0

    pos01 = U[:, 0:2]
    o, d = generate_rays(cam, pos01, U[:, 2:4])

    def u_at(depth, off, count):
        base = _HEAD + _PER_DEPTH * depth
        return jax.lax.dynamic_slice(
            U, (0, base + off), (n, count)
        )

    state = dict(
        L=jnp.zeros((n, 3), jnp.float32),
        thr=jnp.ones((n, 3), jnp.float32),
        eta=jnp.ones((n,), jnp.float32),
        o=o,
        d=d,
        active=jnp.ones((n,), bool),
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        depth=jnp.int32(0),
    )

    def cond(s):
        return (s["depth"] < max_depth) & jnp.any(s["active"])

    def body(s):
        depth = s["depth"]
        o, d = s["o"], s["d"]
        active = s["active"]
        thr, L = s["thr"], s["L"]

        hit = intersect(pack, o, d)
        its = fill_interaction(pack, o, d, hit)
        found = its.valid & active

        if pack.has_env:
            escape = active & ~its.valid
            if split_direct:
                escape = escape & (depth >= 2)
            env_l = em.eval_env(pack, d)
            w_env = jnp.where(
                s["prev_delta"],
                1.0,
                _path.mi_weight(s["prev_pdf"], em.pdf_direct_env(pack, d)),
            )
            L = L + jnp.where(
                escape[..., None], thr * env_l * w_env[..., None], 0.0
            )
        if pack.has_area:
            cos_l = mm.dot(its.ns, its.wi_world)
            emissive = found & (its.emit >= 0) & (cos_l > 0)
            if split_direct:
                emissive = emissive & (depth >= 2)
            le = take_rows(pack.em_rgb, jnp.maximum(its.emit, 0))
            p_direct = em.pdf_direct_area(pack, its.emit, its.t, cos_l)
            w_hit = jnp.where(
                s["prev_delta"], 1.0, _path.mi_weight(s["prev_pdf"], p_direct)
            )
            L = L + jnp.where(
                emissive[..., None], thr * le * w_hit[..., None], 0.0
            )

        active = found
        frame = shading_frame(pack, its)
        wi_l = frame.to_local(its.wi_world)
        sp = shading_params(pack, its.mat, its.uv, mip_footprint(pack, its), its=its)

        if pack.meta["n_emitters"] > 0:
            u_n = u_at(depth, 0, 3)
            ds = em.sample_direct(pack, its.p, u_n)
            wo_l = frame.to_local(ds.d)
            f = bsdf_eval(sp, wi_l, wo_l, present)
            o_sh = _path._offset_ray(its.p, its.ng, ds.d)
            shadow_t = jnp.where(
                ds.dist >= em.ENV_DIST, 1e7,
                ds.dist * (1.0 - _path.SHADOW_EPS),
            )
            occ = occluded(pack, o_sh, ds.d, shadow_t)
            b_pdf = jnp.where(
                ds.delta, 0.0, bsdf_pdf(sp, wi_l, wo_l, present)
            )
            w_nee = jnp.where(ds.delta, 1.0, _path.mi_weight(ds.pdf, b_pdf))
            # reference maxDepth gate (see path_trace)
            nee_on = active & ~occ & (depth + 2 <= max_depth)
            if split_direct:
                nee_on = nee_on & (depth >= 1)
            L = L + jnp.where(
                nee_on[..., None],
                thr * ds.value * f * w_nee[..., None],
                0.0,
            )

        u_b = u_at(depth, 3, 3)
        bs = bsdf_sample(sp, wi_l, u_b[:, 0:2], u_b[:, 2], present)
        thr = thr * jnp.where(active[..., None], bs.weight, 1.0)
        eta = s["eta"] * jnp.where(active, bs.eta, 1.0)
        d_new = frame.to_world(bs.wo)
        o_new = _path._offset_ray(its.p, its.ng, d_new)
        active = active & (jnp.max(thr, axis=-1) > 0)

        u_r = u_at(depth, 6, 1)[:, 0]
        q = jnp.minimum(jnp.max(thr, axis=-1) * eta * eta, 0.95)
        do_rr = depth + 1 >= rr_depth
        keep = jnp.where(do_rr, u_r < q, True)
        thr = jnp.where(
            (do_rr & keep)[..., None],
            thr / jnp.maximum(q, 1e-6)[..., None],
            thr,
        )
        active = active & keep

        is_null = sp["type"] == NULL_BSDF
        return dict(
            L=L,
            thr=thr,
            eta=eta,
            o=jnp.where(active[..., None], o_new, s["o"]),
            d=jnp.where(active[..., None], d_new, s["d"]),
            active=active,
            prev_pdf=jnp.where(
                active, jnp.where(is_null, s["prev_pdf"], bs.pdf),
                s["prev_pdf"],
            ),
            prev_delta=jnp.where(
                active, jnp.where(is_null, s["prev_delta"], bs.delta),
                s["prev_delta"],
            ),
            depth=depth + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    pos = jnp.stack(
        [pos01[:, 0] * w, pos01[:, 1] * h], axis=-1
    )
    return pos, out["L"]


def make_chain_trace(pack, integ, sen, cam, w, h):
    """Build the chain re-trace function: U [N, D] -> (pos [N, S, 2],
    val [N, S, 3]) where S static splats per sample (S=1 for the
    unidirectional technique; 1 + light-image splats for bidirectional).

    Like the reference, PSSMLT defaults to the BIDIRECTIONAL path
    sampler (pssmlt.cpp:170 technique=EBidirectional,
    pathsampler.h:39-121): every mutation re-traces a full family of
    (s,t) strategies, which is what makes the chain family work on
    caustic / hard-visibility scenes.  Homogeneous-media scenes run the
    bidirectional sampler too (closed-form distance sampling consumes a
    fixed 2 dims per segment of the primary vector, matching the
    reference's medium-capable PathSampler, pathsampler.h:53 +
    vertex.h:67-94); heterogeneous scenes and scenes outside the bdpt
    envelope fall back to the unidirectional sampler (delta tracking
    draws unbounded randomness that cannot live in a finite primary
    vector).

    Light-image splat values are pre-scaled by 1/n_px so the combined
    luminance target and the existing b * n_px / (steps * chains)
    normalization stay consistent with the unidirectional estimator.
    """
    from mitsuba_tpu.integrator import bdpt as _bdpt

    n_px = w * h
    has_media = pack.meta.get("has_media", False)
    want_bidir = getattr(integ, "bidirectional", False) and os.environ.get(
        "MTS_PSSMLT_BIDIR", "1"
    ) != "0"
    bidir_media_ok = (
        not has_media or pack.meta.get("n_het", 0) == 0
    )
    if want_bidir and _bdpt.supports_bdpt(pack) and bidir_media_ok:
        max_edges = _bdpt.bdpt_max_edges(integ)
        D = _bdpt.primary_dims(max_edges, has_media=has_media)
        split_direct = getattr(integ, "direct_samples", -1) >= 0
        chunk = _bdpt.make_bdpt_chunk(
            pack, integ, sen, w, h, seed=0, exclude_direct=split_direct
        )

        def trace(U):
            n = U.shape[0]
            zeros = jnp.zeros((n,), jnp.uint32)
            L, splats = chunk(zeros, zeros, U=U)
            pos0 = jnp.stack([U[:, 0] * w, U[:, 1] * h], axis=-1)
            pos_all = [pos0]
            val_all = [L]
            for pos, val, ok in splats:
                # masked-off splats can carry NaN positions (projection
                # of invalid vertices); zero them or the tent-weight
                # product 0 * NaN poisons the film
                pos_all.append(jnp.where(ok[..., None], pos, 0.0))
                val_all.append(
                    jnp.where(ok[..., None], val, 0.0) / n_px
                )
            return (
                jnp.stack(pos_all, axis=1),
                jnp.stack(val_all, axis=1),
            )

        return trace, D, 1 + len(
            [s for s in range(1, max_edges + 1)
             if not split_direct or s > 2]
        )

    D = dims_for(integ.max_depth if integ.max_depth > 0 else 16)

    def trace(U):
        pos, L = path_from_primary(pack, integ, cam, w, h, U)
        return pos[:, None, :], L[:, None, :]

    return trace, D, 1


def _chain_lum(val):
    """Scalar chain target: total luminance over the splat list.
    Accepts [N, 3] (single-splat techniques: mlt/erpt re-trace) or
    [N, S, 3] (multi-splat bidirectional)."""
    lum = luminance(val)
    return lum if lum.ndim == 1 else jnp.sum(lum, axis=-1)


def _kelemen_mutate(U, u_mut, u_sign):
    """Symmetric log-space perturbation (pssmlt_sampler.h:70-103)."""
    step = _S2 * jnp.exp(-jnp.log(_S2 / _S1) * u_mut)
    delta = jnp.where(u_sign < 0.5, step, -step)
    out = U + delta
    return out - jnp.floor(out)  # wrap to [0,1)


def _splat(film, pos, value, w, h):
    """Bilinear (tent-filtered) scatter-add splat — MLT splats land
    anywhere, so the dense-film trick doesn't apply; the reference
    pushes them through the film's reconstruction filter
    (mlt.cpp/film splat), approximated here by the 2x2 tent."""
    fx = pos[:, 0] - 0.5
    fy = pos[:, 1] - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0)[:, None]
    ay = (fy - y0)[:, None]
    for dx, dy, wgt in (
        (0, 0, (1 - ax) * (1 - ay)),
        (1, 0, ax * (1 - ay)),
        (0, 1, (1 - ax) * ay),
        (1, 1, ax * ay),
    ):
        x = jnp.clip(x0 + dx, 0, w - 1)
        y = jnp.clip(y0 + dy, 0, h - 1)
        film = film.at[y, x].add(value * wgt)
    return film


def bootstrap_chains(trace, D, n_chains, n_boot_batches, seed, seed_mlt):
    """Luminance-normalization bootstrap + proportional seed resampling
    (reference pssmlt.cpp:181-198).  Returns (U_cur [N, D], b_norm) or
    (None, 0.0) for a black scene.  `trace` follows the multi-splat
    interface (make_chain_trace): the target is the TOTAL splat
    luminance of the sample."""
    boot_lum = []
    for b in range(n_boot_batches):
        U = rng.rand4(
            jnp.arange(n_chains * D, dtype=jnp.uint32) // D,
            jnp.arange(n_chains * D, dtype=jnp.uint32) % D,
            jnp.uint32(7000 + b),
            seed_mlt,
        )[:, 0].reshape(n_chains, D)
        _, val = trace(U)
        boot_lum.append(np.asarray(_chain_lum(val)))
    boot_lum = np.concatenate(boot_lum)
    b_norm = float(boot_lum.mean())
    if b_norm <= 0:
        return None, 0.0

    # resample seeds proportional to luminance
    p = boot_lum / boot_lum.sum()
    rng_np = np.random.default_rng(seed)
    chosen = rng_np.choice(len(boot_lum), size=n_chains, p=p)
    # regenerate the chosen batches' U rows
    U_cur = np.zeros((n_chains, D), np.float32)
    for b in range(n_boot_batches):
        mask = (chosen // n_chains) == b
        if not mask.any():
            continue
        rows = chosen[mask] % n_chains
        Ub = np.asarray(
            rng.rand4(
                jnp.arange(n_chains * D, dtype=jnp.uint32) // D,
                jnp.arange(n_chains * D, dtype=jnp.uint32) % D,
                jnp.uint32(7000 + b),
                seed_mlt,
            )[:, 0]
        ).reshape(n_chains, D)
        U_cur[mask] = Ub[rows]
    return jnp.asarray(U_cur), b_norm




def add_direct_component(img, scene, pack, integ, seed):
    """directSamples >= 0: add the separately rendered direct component
    (emitted + single scattering, the paths path_from_primary excluded)
    with ordinary MC sampling (reference BidirectionalUtils::
    renderDirectComponent, libbidir/util.cpp)."""
    n = getattr(integ, "direct_samples", -1)
    if n < 0:
        return img
    import copy

    import numpy as _np

    from mitsuba_tpu.integrator.plugins import IntegratorRecord
    from mitsuba_tpu.renderer import render as _render

    s2 = copy.copy(scene)
    s2.integrator = IntegratorRecord(
        kind="direct", emitter_samples=1, bsdf_samples=1
    )
    direct = _np.asarray(_render(
        s2, spp=max(n, 1), seed=seed ^ 0xD17EC7, pack=pack,
        _spectral_inner=True,
    ))
    return img + direct


def render_pssmlt(scene, spp=None, seed=0, pack=None, chains=None,
                  mesh=None):
    """Full PSSMLT render (= PSSMLT::render, pssmlt.cpp).

    `spp` is interpreted as mutations per pixel (the reference's
    equivalent knob).  Returns a linear HDR numpy image.

    With `mesh`, chains shard across the devices (each chip runs its
    own Markov chains against a local film; one psum merges) — chain
    ids key the RNG, so the result is bit-identical to single-chip up
    to film-sum reassociation.
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
    mutations_pp = spp or integ.mutations_per_pixel
    p_large = integ.p_large if integ.p_large > 0 else 0.3

    n_chains = chains or min(1 << 17, n_px)
    if mesh is not None:
        n_dev = mesh.devices.size
        n_chains = -(-n_chains // n_dev) * n_dev
    # chain control/mutation draws live in their own stream (core/rng.py)
    seed_mlt = rng.stream_seed(seed, rng.STREAM_MLT)

    trace_fn, D, _ = make_chain_trace(pack, integ, sen, cam, w, h)
    trace = jax.jit(trace_fn)

    n_boot_batches = max(integ.luminance_samples // n_chains, 2)
    U_cur, b_norm = bootstrap_chains(
        trace, D, n_chains, n_boot_batches, seed, seed_mlt
    )
    if U_cur is None:
        return np.zeros((h, w, 3), np.float32)

    pos_cur, L_cur = trace(U_cur)
    I_cur = _chain_lum(L_cur)

    total_mutations = mutations_pp * n_px
    n_steps = max(total_mutations // n_chains, 1)

    def splat_all(film, pos, val, wgt):
        # pos [N, S, 2], val [N, S, 3]: every strategy splat of the
        # sample lands with the same chain weight (SplatList semantics,
        # reference pathsampler.cpp:93-127)
        for s in range(pos.shape[1]):
            film = _splat(film, pos[:, s], val[:, s] * wgt[:, None], w, h)
        return film

    def step(carry, k):
        # k >= n_steps: padding step of the last execution chunk —
        # hold the chain state and splat nothing
        valid = k < n_steps
        U_cur, pos_cur, L_cur, I_cur, film, lanes = carry
        u_ctl = rng.rand4(lanes, k, 1, seed_mlt)
        # per-dim mutation randomness, keyed by GLOBAL chain ids
        nloc = lanes.shape[0]
        dim_l = (
            lanes[:, None].astype(jnp.uint32) * D
            + jnp.arange(D, dtype=jnp.uint32)[None, :]
        ).reshape(-1)
        um = rng.rand4(dim_l, k, 2, seed_mlt)
        u_mut = um[:, 0].reshape(nloc, D)
        u_sign = um[:, 1].reshape(nloc, D)
        u_fresh = um[:, 2].reshape(nloc, D)

        large = u_ctl[:, 0] < p_large
        U_small = _kelemen_mutate(U_cur, u_mut, u_sign)
        U_prop = jnp.where(large[:, None], u_fresh, U_small)

        pos_p, L_p = trace_fn(U_prop)
        I_p = _chain_lum(L_p)

        a = jnp.clip(I_p / jnp.maximum(I_cur, 1e-12), 0.0, 1.0)
        # expected-values splatting (both states, weighted)
        live = valid.astype(jnp.float32)
        w_cur = (1.0 - a) / jnp.maximum(I_cur, 1e-12) * live
        w_prop = a / jnp.maximum(I_p, 1e-12) * live
        film = splat_all(film, pos_cur, L_cur, w_cur)
        film = splat_all(film, pos_p, L_p, w_prop)

        accept = (u_ctl[:, 1] < a) & valid
        U_cur = jnp.where(accept[:, None], U_prop, U_cur)
        pos_cur = jnp.where(accept[:, None, None], pos_p, pos_cur)
        L_cur = jnp.where(accept[:, None, None], L_p, L_cur)
        I_cur = jnp.where(accept, I_p, I_cur)
        return (U_cur, pos_cur, L_cur, I_cur, film, lanes), None

    lanes_all = jnp.arange(n_chains, dtype=jnp.uint32)

    # bound the per-execution step count: one monolithic scan over all
    # mutations can exceed the TPU worker's single-execution budget
    # (~60 s through the tunnel, CLAUDE.md) — the door scene at 512
    # mutations/px killed the worker.  Chunks carry chain state and a
    # partial film across executions; padding steps self-mask in
    # step(), so results are bit-identical to the single scan.
    steps_per_exec = min(
        int(os.environ.get("MTS_TPU_MLT_STEPS", 64)), n_steps
    )
    n_exec = -(-n_steps // steps_per_exec)

    def chain_chunk(lanes, U0, pos0, L0, I0, film, k0):
        ks = k0 + jnp.arange(steps_per_exec, dtype=jnp.uint32)
        carry = (U0, pos0, L0, I0, film, lanes)
        carry, _ = jax.lax.scan(step, carry, ks)
        return carry[:5]

    if mesh is None:
        runner = jax.jit(chain_chunk)
        film = jnp.zeros((h, w, 3), jnp.float32)
        state = (U_cur, pos_cur, L_cur, I_cur, film)
        for e in range(n_exec):
            state = runner(
                lanes_all, *state, jnp.uint32(e * steps_per_exec)
            )
        film = state[4]
    else:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]

        def sharded_chunk(lanes, U0, pos0, L0, I0, k0):
            # fresh per-device film each chunk; psum merges before the
            # chunk returns, and the host accumulates across chunks
            film0 = jnp.zeros((h, w, 3), jnp.float32)
            out = chain_chunk(lanes, U0, pos0, L0, I0, film0, k0[0])
            return out[:4] + (jax.lax.psum(out[4], ax),)

        runner = jax.jit(
            jax.shard_map(
                sharded_chunk,
                mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P()),
                out_specs=(P(ax), P(ax), P(ax), P(ax), P()),
                check_vma=False,
            )
        )
        film = jnp.zeros((h, w, 3), jnp.float32)
        state = (U_cur, pos_cur, L_cur, I_cur)
        for e in range(n_exec):
            *state, film_e = runner(
                lanes_all, *state,
                jnp.full((1,), e * steps_per_exec, jnp.uint32),
            )
            state = tuple(state)
            film = film + film_e
        film = np.asarray(film)

    # normalization: each splat-pair has total weight 1/I * L ~ unit
    # contribution; E[sum] = steps*chains * E_pi[h f / I]; scale so the
    # image equals the path-traced mean
    scale = b_norm * n_px / (n_steps * n_chains)
    return add_direct_component(
        np.asarray(film * scale), scene, pack, integ, seed
    )
