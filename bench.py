#!/usr/bin/env python
"""Benchmark: Cornell-box path tracing throughput on one TPU chip.

Renders BASELINE.md config 1 (cbox, path integrator, independent
sampler, 512x512) and reports traced rays/second — every closest-hit
and NEE shadow ray counted, exactly like the reference's kdbench
MRays/s metric (reference: src/utils/kdbench.cpp:221-242).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N/1e8}
vs_baseline is relative to the 1e8 rays/s/chip north-star target in
BASELINE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _kdbench_bunny(here, n=4_000_000):
    """Incoherent sphere-to-sphere MRays/s through the bunny (closest
    hit, coherence-sorted cluster traversal)."""
    import numpy as np

    from mitsuba_tpu.accel.intersect import intersect
    from mitsuba_tpu.core import rng, warp
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene

    pack = pack_scene(load_scene(os.path.join(here, "scenes", "bunny.xml")))
    lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
    hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)
    u = rng.rand4(jnp.arange(n, dtype=jnp.uint32), 0, 0)
    p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
    p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
    d = p2 - p1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    f = jax.jit(lambda o, d: intersect(pack, o, d, sort=True).t)
    f(p1, d).block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        f(p1, d).block_until_ready()
        best = min(best, time.time() - t0)
    return n / best / 1e6


def main():
    from mitsuba_tpu.scene.xml_loader import load_scene
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.renderer import make_render_pass
    from mitsuba_tpu.film.film import new_film

    here = os.path.dirname(os.path.abspath(__file__))
    scene = load_scene(os.path.join(here, "scenes", "cbox.xml"))
    pack = pack_scene(scene)
    sen = scene.sensor.record
    film_rec = sen.film
    sampler = sen.sampler
    integ = scene.integrator

    w = h = 512
    film_rec.width, film_rec.height = w, h
    spp_chunk = int(os.environ.get("BENCH_SPP_CHUNK", 64))

    rp = jax.jit(
        make_render_pass(
            pack, integ, sen, film_rec, sampler, spp_chunk, with_stats=True
        ),
        donate_argnums=(0,),
    )

    film = new_film(h, w)
    # warmup/compile
    t0 = time.time()
    film, rays = rp(film, jnp.uint32(0), jnp.uint32(0))
    rays.block_until_ready()
    compile_time = time.time() - t0

    # timed passes — the ray counter accumulates ON DEVICE: a float()
    # per pass would force a synchronous host round-trip through the
    # remote-TPU tunnel (~0.25 s each) and measure link latency, not
    # renderer throughput
    n_passes = int(os.environ.get("BENCH_PASSES", 4))
    total = jnp.float32(0.0)
    t0 = time.time()
    for i in range(n_passes):
        film, rays = rp(film, jnp.uint32((i + 1) * spp_chunk), jnp.uint32(0))
        total = total + rays
    total_rays = float(total)  # single sync closes the timing window
    elapsed = time.time() - t0

    rays_per_sec = total_rays / elapsed

    # secondary metric: big-mesh incoherent traversal (kdbench on the
    # 69k-tri bunny — the reference's sphere-to-sphere benchmark,
    # src/utils/kdbench.cpp:221-242, via the Pallas cluster kernel)
    kd_mrays = None
    if os.environ.get("BENCH_SKIP_KD", "0") != "1":
        try:
            kd_mrays = _kdbench_bunny(here)
        except Exception as e:  # never break the primary metric
            print(f"# kdbench skipped: {e}", file=sys.stderr)

    result = {
        "metric": "cbox_path_rays_per_sec_per_chip",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / 1e8,
    }
    if kd_mrays is not None:
        result["bunny_kdbench_mrays_per_sec"] = kd_mrays
    print(json.dumps(result))
    print(
        f"# {rays_per_sec/1e6:.1f} MRays/s | {n_passes} passes x "
        f"{spp_chunk}spp @512^2 | {elapsed:.2f}s render, "
        f"{compile_time:.1f}s compile | devices={jax.devices()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
