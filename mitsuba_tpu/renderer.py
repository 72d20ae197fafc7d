"""Render orchestration: the TPU equivalent of RenderJob + the Scheduler.

The reference distributes 32x32 image blocks to worker threads/machines
(reference: src/librender/{renderjob.cpp,renderproc.cpp}); here one jit
compiled `render_pass` traces a whole sample-wavefront (every pixel x a
chunk of samples-per-pixel) and accumulates into the film with dense
adds (each lane owns its pixel — no scatter anywhere).  Passes loop on
the host like the reference's work-unit queue.  Multi-chip: the sample
axis is sharded over a Mesh and film partials psum-merge — see
parallel/mesh.py.
"""

from __future__ import annotations

import math
import os
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.film.film import develop, new_film, splat_grid
from mitsuba_tpu.integrator.path import TRACE_FNS
from mitsuba_tpu.scene.builder import pack_scene
from mitsuba_tpu.sensor.plugins import generate_rays

# default lane budget per pass (rays in flight); tuned for ~16 GB HBM
DEFAULT_LANES_PER_PASS = 1 << 21


def _ensure_volpath_loaded():
    import mitsuba_tpu.integrator.volpath  # noqa: F401 — registers itself


def make_render_pass(
    pack, integ, sensor_rec, film_rec, sampler_rec, spp_chunk,
    with_stats=False, band_rows_arg=None,
):
    """Build the jitted one-pass render function.

    Returns fn(film, sample_base, seed) -> film (or (film, n_rays) with
    with_stats).  Two execution strategies:

    * REGENERATING wavefront (default for path-family integrators with a
      non-negative reconstruction filter): lane i owns pixel i and
      immediately starts its next sample when a path dies — ~100% lane
      occupancy, film accumulation is a dense reshape (filter importance
      sampling, so each sample lands in exactly its own pixel).
    * classic batched wavefront + dense grid splat otherwise.
    """
    _ensure_volpath_loaded()
    from mitsuba_tpu.film.plugins import (
        filter_importance_sample,
        supports_fis,
    )
    from mitsuba_tpu.integrator.path import path_trace_regen

    w, h = film_rec.width, film_rec.height
    n_px = w * h
    cam = sensor_rec.pack(w, h)
    if integ.kind in ("adaptive", "irrcache", "multichannel"):
        # meta-integrators forward to their nested integrator here;
        # their own machinery (integrator/adaptive.py error-CDF
        # refinement, integrator/irrcache.py two-phase cache) drives
        # this loop from renderer-level entry points
        # (reference src/integrators/misc/*.cpp)
        integ = integ.sub_integrator or integ
        if integ.kind in ("adaptive", "irrcache", "multichannel"):
            from mitsuba_tpu.integrator.plugins import IntegratorRecord

            integ = IntegratorRecord(kind="path")
    trace = TRACE_FNS[integ.kind]
    if trace is None:
        raise NotImplementedError(f"integrator '{integ.kind}'")
    rfilter = film_rec.rfilter

    from mitsuba_tpu.integrator.path import path_trace as _pt

    from mitsuba_tpu.integrator import volpath as _vp

    # volpath on a medium-free scene is exactly the path integrator
    path_like = trace is _pt or (
        trace is _vp.volpath_trace
        and not pack.meta.get("has_media", False)
    )
    use_regen = (
        path_like
        and supports_fis(rfilter)
        and not pack.meta.get("has_media", False)
        # banded callers (media tiling, out-of-core film) drive the
        # row0 signature, which the regen wavefront does not take
        and band_rows_arg is None
    )

    if use_regen:
        # several regenerating lanes per pixel keep the chip full at
        # SMALL resolutions; at large ones extra layers only shorten the
        # per-lane sample budget and let the terminal-path tail dominate.
        target_lanes = int(
            os.environ.get("MTS_TPU_TARGET_LANES", 1 << 18)
        )
        lpp = max(min(target_lanes // n_px, spp_chunk), 1)
        while spp_chunk % lpp:
            lpp -= 1
        spp_per_lane = spp_chunk // lpp
        n_lanes = lpp * n_px

        def render_pass(film, sample_base, seed):
            lane_all = jnp.arange(n_lanes, dtype=jnp.uint32)
            lane = lane_all % n_px  # pixel id (RNG key)
            layer = lane_all // n_px
            sidx_off = sample_base + layer * spp_per_lane

            def make_ray(sample_i, sel=None):
                ln = lane if sel is None else lane[sel]
                so = sidx_off if sel is None else sidx_off[sel]
                sidx = so + sample_i.astype(jnp.uint32)
                u2 = sampler_rec.pixel_sample(
                    ln, sidx, sampler_rec.sample_count
                )
                jitter = filter_importance_sample(rfilter, u2)
                x = (ln % w).astype(jnp.float32) + jitter[..., 0]
                y = (ln // w).astype(jnp.float32) + jitter[..., 1]
                pos01 = jnp.stack([x / w, y / h], axis=-1)
                u_lens = (
                    sampler_rec.lens_sample(ln, sidx)
                    if cam["use_lens"] else jnp.zeros_like(u2)
                )
                return generate_rays(cam, pos01, u_lens)

            L_sum, n_done, n_rays = path_trace_regen(
                pack, integ, make_ray, n_lanes, spp_per_lane, lane,
                sampler_rec, seed, sidx_offset=sidx_off,
            )
            contrib = jnp.concatenate(
                [L_sum, n_done.astype(jnp.float32)[..., None]], axis=-1
            )
            film = film + contrib.reshape(lpp, h, w, 4).sum(axis=0)
            if with_stats:
                return film, n_rays
            return film

        return render_pass

    def render_pass(film, sample_base, seed, row0=None):
        # lanes: [spp_chunk, band_px] — grid-aligned so the splat is
        # dense.  With `row0` (banded mode, media scenes) the pass
        # renders `band_rows` film rows starting at that row; lane ids
        # stay GLOBAL pixel ids, so banded output is bit-identical to a
        # whole-frame pass (counter RNG keyed on lane).
        if row0 is None:
            band_rows, base_px = h, jnp.int32(0)
        else:
            # row0 may be negative (filter halo above the frame)
            band_rows = band_rows_static
            base_px = jnp.asarray(row0, jnp.int32) * jnp.int32(w)
        band_px = band_rows * w
        px_i = base_px + jnp.arange(band_px, dtype=jnp.int32)
        in_frame = (px_i >= 0) & (px_i < n_px)
        px = jnp.clip(px_i, 0, n_px - 1).astype(jnp.uint32)
        lane = jnp.broadcast_to(px[None, :], (spp_chunk, band_px))
        sidx = sample_base + jnp.arange(spp_chunk, dtype=jnp.uint32)[:, None]
        lane = lane.reshape(-1)
        sidx = jnp.broadcast_to(sidx, (spp_chunk, band_px)).reshape(-1)

        jitter = sampler_rec.pixel_sample(
            lane, sidx, sampler_rec.sample_count
        )
        x = (lane % w).astype(jnp.float32) + jitter[..., 0]
        y = (lane // w).astype(jnp.float32) + jitter[..., 1]
        pos01 = jnp.stack([x / w, y / h], axis=-1)
        u_lens = (
            sampler_rec.lens_sample(lane, sidx)
            if cam["use_lens"] else jnp.zeros_like(jitter)
        )
        o, d = generate_rays(cam, pos01, u_lens)

        L = trace(pack, integ, o, d, lane, sidx, sampler_rec, seed)
        valid = jnp.broadcast_to(
            in_frame[None, :], (spp_chunk, band_px)
        ).reshape(spp_chunk, band_rows, w)
        film = splat_grid(
            film,
            jitter.reshape(spp_chunk, band_rows, w, 2),
            L.reshape(spp_chunk, band_rows, w, 3),
            rfilter,
            valid=valid if row0 is not None else None,
        )
        if with_stats:
            rays = getattr(trace, "last_ray_count", jnp.float32(0.0))
            return film, rays
        return film

    band_rows_static = band_rows_arg

    return render_pass


def render(
    scene,
    spp=None,
    seed=0,
    lanes_per_pass=None,
    progress=None,
    return_film=False,
    pack=None,
    checkpoint=None,
    checkpoint_every=8,
    spectral_bins=None,
    _spectral_inner=False,
):
    """Render a SceneDescription to a linear HDR numpy image [H, W, 3].

    (= RenderJob::run, reference src/librender/renderjob.cpp:87-113.)

    spectral_bins: render with N wavelength bins (multiple of 3; also
    settable via MTS_SPECTRAL_BINS) as N/3 bin-group passes over the
    3-channel kernels, combined through CIE XYZ — the TPU analogue of
    the reference's compile-time SPECTRUM_SAMPLES (core/spectral.py).

    checkpoint: optional .npz path — the film and pass counter are saved
    every `checkpoint_every` passes and the render RESUMES from an
    existing checkpoint (counter RNG makes resumed output bit-identical
    to an uninterrupted run; the reference's analogue is the
    snapshot/resume of its render queue).
    """
    from mitsuba_tpu.core.logging import counter, logger

    if pack is None:
        pack = pack_scene(scene)

    n_spec = spectral_bins or int(os.environ.get("MTS_SPECTRAL_BINS", "0"))
    if n_spec and not _spectral_inner:
        from mitsuba_tpu.core.spectral import make_bins
        from mitsuba_tpu.core.spectrum import _XYZ_TO_RGB
        from mitsuba_tpu.scene.builder import apply_spectral_pack

        bins = make_bins(n_spec)
        xyz = None
        for g in range(bins.n_groups):
            img_g = np.asarray(
                render(
                    scene,
                    spp=spp,
                    seed=seed,  # shared seed: hero-style correlated
                    lanes_per_pass=lanes_per_pass,  # noise across bins
                    pack=apply_spectral_pack(pack, bins, g),
                    _spectral_inner=True,
                )
            )
            m3, _ = bins.group(g)
            contrib = img_g @ np.asarray(m3, np.float32).T
            xyz = contrib if xyz is None else xyz + contrib
        img = np.maximum(xyz @ _XYZ_TO_RGB.T, 0.0)
        if return_film:
            film = jnp.concatenate(
                [jnp.asarray(img), jnp.ones(img.shape[:2] + (1,))],
                axis=-1,
            )
            return img, film
        return img

    sensor_rec = scene.sensor.record
    film_rec = sensor_rec.film
    sampler_rec = sensor_rec.sampler
    integ = scene.integrator

    if pack.meta.get("has_sss", False):
        # dipole preprocess: fill the irradiance point cache
        # (reference dipole.cpp:preprocess via renderjob.cpp)
        from mitsuba_tpu.integrator.sss import prepare_sss

        pack = prepare_sss(pack, integ, seed)

    if integ.kind == "multichannel" and (integ.sub_integrators or []):
        # reference src/integrators/misc/multichannel.cpp renders all
        # children in lock-step into one multi-channel image; here the
        # children render sequentially (same pack, same seeds) and the
        # channels stack — [H, W, 3*n].  The CLI writes each 3-channel
        # group as a suffixed file (no multi-layer EXR writer yet).
        import copy as _copy

        imgs = []
        for sub in integ.sub_integrators:
            s2 = _copy.copy(scene)
            s2.integrator = sub
            imgs.append(
                np.asarray(render(s2, spp=spp, seed=seed, pack=pack))
            )
        out = np.concatenate(imgs, axis=-1)
        if return_film:
            film = jnp.concatenate(
                [jnp.asarray(imgs[0]),
                 jnp.ones(imgs[0].shape[:2] + (1,))], axis=-1
            )
            return out, film
        return out

    if integ.kind in (
        "pssmlt", "mlt", "erpt", "ptracer", "bdpt", "vpl",
        "sppm", "ppm", "photonmapper", "irrcache", "adaptive",
    ):
        # integrators with their own orchestration
        if integ.kind == "vpl":
            from mitsuba_tpu.integrator.vpl import render_vpl

            img = render_vpl(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "bdpt":
            from mitsuba_tpu.integrator.bdpt import render_bdpt

            img = render_bdpt(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "photonmapper":
            # media scenes get the volume map + beam radiance estimate
            # (reference photonmapper.cpp:318-338 + bre.cpp); without
            # media this defers to the sppm machinery
            from mitsuba_tpu.integrator.photonmapper import (
                render_photonmapper,
            )

            img = render_photonmapper(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind in ("sppm", "ppm"):
            from mitsuba_tpu.integrator.sppm import render_sppm

            img = render_sppm(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "irrcache":
            from mitsuba_tpu.integrator.irrcache import render_irrcache

            img = render_irrcache(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "adaptive":
            from mitsuba_tpu.integrator.adaptive import render_adaptive

            img = render_adaptive(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "ptracer":
            from mitsuba_tpu.integrator.ptracer import render_ptracer

            img = render_ptracer(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "mlt":
            from mitsuba_tpu.integrator.mlt import render_mlt

            img = render_mlt(scene, spp=spp, seed=seed, pack=pack)
        elif integ.kind == "erpt":
            from mitsuba_tpu.integrator.mlt import render_erpt

            img = render_erpt(scene, spp=spp, seed=seed, pack=pack)
        else:
            from mitsuba_tpu.integrator.pssmlt import render_pssmlt

            img = render_pssmlt(scene, spp=spp, seed=seed, pack=pack)
        if return_film:
            film = jnp.concatenate(
                [jnp.asarray(img), jnp.ones(img.shape[:2] + (1,))], axis=-1
            )
            return img, film
        return img

    w, h = film_rec.width, film_rec.height
    spp = spp or sampler_rec.sample_count
    lanes = lanes_per_pass or int(
        os.environ.get("MTS_TPU_LANES_PER_PASS", DEFAULT_LANES_PER_PASS)
    )

    # Media scenes: heterogeneous tracking makes a lane far more
    # expensive, and single XLA executions past ~60 s can kill the TPU
    # tunnel worker (CLAUDE.md) — tile the film into row bands so each
    # execution stays small.  Lane ids stay global: banded output is
    # bit-identical to the whole-frame pass.
    media_lanes = int(os.environ.get("MTS_TPU_MEDIA_LANES", 1 << 16))
    # tiledhdrfilm: the film never lives whole in device memory — each
    # row band is developed and flushed to a host memory-map as soon as
    # it finishes (reference src/films/tiledhdrfilm.cpp's out-of-core
    # contract, minus its custom EXR tile writer: the host map is the
    # spill store and the final write is one standard image)
    # MTS_TPU_DONATE=0 disables film-buffer donation: some axon
    # tunnel builds panic in their buffer-alias bookkeeping after many
    # donated executions (client.rs index-out-of-bounds) — the copy
    # costs one film-sized HBM pass per chunk, correctness unchanged
    donate = (
        (0,) if os.environ.get("MTS_TPU_DONATE", "1") != "0" else ()
    )
    out_of_core = bool(getattr(film_rec, "out_of_core", False))
    if out_of_core or (
        pack.meta.get("has_media", False) and w * h > media_lanes
    ):
        # halo so filter footprints crossing band edges stay complete —
        # banded output matches the whole-frame pass exactly
        rad = film_rec.rfilter.radius
        pad = max(int(math.ceil(0.5 + rad)) - 1, 0)
        hb = max(media_lanes // w - 2 * pad, 8)
        hbe = hb + 2 * pad
        n_bands = math.ceil(h / hb)
        spp_chunk = max(1, min(spp, max(media_lanes // (hbe * w), 1)))
        n_passes = math.ceil(spp / spp_chunk)
        def build_rp():
            return jax.jit(
                make_render_pass(
                    pack, integ, sensor_rec, film_rec, sampler_rec,
                    spp_chunk, band_rows_arg=hbe,
                ),
                donate_argnums=donate,
            )

        from mitsuba_tpu.parallel import elastic

        rp = build_rp()
        rows = []
        film_mm = img_mm = None
        if out_of_core:
            import tempfile

            tdir = tempfile.mkdtemp(prefix="mts_tiledfilm_")
            film_mm = np.lib.format.open_memmap(
                os.path.join(tdir, "film.npy"), mode="w+",
                dtype=np.float32, shape=(h, w, 4),
            )
            img_mm = np.lib.format.open_memmap(
                os.path.join(tdir, "image.npy"), mode="w+",
                dtype=np.float32, shape=(h, w, 3),
            )
        for b in range(n_bands):
            def run_pass(rp_, band, i, _b=b):
                return rp_(
                    band, jnp.uint32(i * spp_chunk), jnp.uint32(seed),
                    jnp.int32(_b * hb - pad),
                )

            def after_pass(band, i, _b=b):
                if progress:
                    band.block_until_ready()
                    progress(_b * n_passes + i + 1, n_bands * n_passes)

            def band_build(attempt):
                nonlocal rp
                if attempt:  # backend restarted — re-jit
                    rp = build_rp()
                return rp

            # a crash re-queues only the current band's passes
            band = elastic.run_passes(
                band_build, run_pass, n_passes,
                film_init=lambda: new_film(hbe, w),
                after_pass=after_pass,
            )
            if out_of_core:
                rows_here = min(hb, h - b * hb)
                band_v = band[pad:pad + rows_here]
                film_mm[b * hb:b * hb + rows_here] = np.asarray(band_v)
                img_mm[b * hb:b * hb + rows_here] = np.asarray(
                    develop(band_v) * sensor_rec.ray_weight
                )
            else:
                rows.append(band[pad:pad + hb])
        if out_of_core:
            film_mm.flush()
            img_mm.flush()
            if return_film:
                return img_mm, film_mm
            return img_mm
        film = jnp.concatenate(rows, axis=0)[:h]
        img = develop(film) * sensor_rec.ray_weight
        img.block_until_ready()
        if return_film:
            return np.asarray(img), film
        return np.asarray(img)

    if pack.meta.get("has_media", False):
        # media passes stay within the media lane budget even when the
        # film itself is small enough to skip banding
        lanes = min(lanes, media_lanes)
    spp_chunk = max(1, min(spp, lanes // (w * h)))
    n_passes = math.ceil(spp / spp_chunk)
    logger.debug(
        "render: %dx%d, %d spp (%d passes x %d), integrator=%s",
        w, h, spp, n_passes, spp_chunk, integ.kind,
    )

    from mitsuba_tpu.parallel import elastic

    def build_rp(attempt=0):
        return jax.jit(
            make_render_pass(
                pack, integ, sensor_rec, film_rec, sampler_rec, spp_chunk
            ),
            donate_argnums=donate,
        )

    def reload_state():
        """Checkpoint resume — also the re-queue point after a device
        failure (work lost since the last snapshot re-renders)."""
        if checkpoint and os.path.exists(checkpoint):
            ck = np.load(checkpoint)
            if tuple(ck["film"].shape) == (h, w, 4) and int(
                ck["spp_chunk"]
            ) == spp_chunk:
                logger.info(
                    "render: resumed from %s at pass %d",
                    checkpoint, int(ck["passes_done"]),
                )
                return ck["film"], int(ck["passes_done"])
        return None

    def run_pass(rp, film, i):
        return rp(
            film, jnp.uint32(i * spp_chunk), jnp.uint32(seed)
        )

    def after_pass(film, i):
        counter("Samples rendered").add(spp_chunk * w * h)
        if checkpoint and (
            (i + 1) % checkpoint_every == 0 or i + 1 == n_passes
        ):
            film.block_until_ready()
            np.savez(
                checkpoint,
                film=np.asarray(film),
                passes_done=i + 1,
                spp_chunk=spp_chunk,
            )
        if progress:
            film.block_until_ready()
            progress(i + 1, n_passes)

    film = elastic.run_passes(
        build_rp, run_pass, n_passes,
        film_init=lambda: new_film(h, w),
        reload_state=reload_state,
        after_pass=after_pass,
    )
    # constant sampleRay importance (irradiancemeter's pi; 1 otherwise)
    img = develop(film) * sensor_rec.ray_weight
    img.block_until_ready()
    if return_film:
        return np.asarray(img), film
    return np.asarray(img)


def render_to_file(scene, output=None, **kw):
    """Render and write through the film's configured output format
    (= film->develop + Bitmap::write, reference hdrfilm.cpp)."""
    from mitsuba_tpu.io.images import write_image

    img = render(scene, **kw)
    film_rec = scene.sensor.record.film
    img = film_rec.develop_to_array(img)
    if output is None:
        base = os.path.splitext(scene.path)[0]
        output = base + film_rec.output_extension()
    write_image(output, img)
    return output, img
