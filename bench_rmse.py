#!/usr/bin/env python
"""Time-to-RMSE benchmark: the second half of the north star.

BASELINE.json demands time-to-RMSE-0.01 parity (+-5%) vs 32-core CPU
Mitsuba on the benchmark configs.  The CPU reference cannot be BUILT in
this container (no boost/Xerces toolchain), so this harness measures
OUR wall-clock-to-RMSE curve against pinned high-spp converged images
(bench_refs/*.npz, generated with --make-refs on the TPU) and reports
it per scene; the CPU side is an order-of-magnitude literature estimate
documented in BASELINE.md, not a measurement.

RMSE definition: relative RMSE over the tone-domain img/(1+img) —
stable against caustic fireflies — matching tests/test_golden.py.

Usage:
  python bench_rmse.py --make-refs     # once, on TPU (slow, high spp)
  python bench_rmse.py                 # measure; prints a JSON line per
                                       # scene + a summary table
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF_DIR = os.path.join(HERE, "bench_refs")

# (name, scene file, integrator override, resolution, ref spp)
# glass_caustics REF uses the unbiased path tracer at high spp (bdpt at
# ref-quality spp is wall-clock prohibitive; both converge to the same
# image) while the MEASURED render keeps the scene's bdpt integrator
CONFIGS = [
    ("cbox", "scenes/cbox.xml", None, 512, 4096),
    ("matpreview", "scenes/matpreview.xml", None, 512, 4096),
    ("smoke", "scenes/smoke.xml", None, 256, 512),
    ("glass_caustics", "scenes/glass_caustics.xml", ("path", None), 256,
     16384),
    # the same caustic scene driven by the chain family (the reference
    # would pick mlt/pssmlt for this scene; pssmlt re-traces a full
    # bidirectional strategy mix per mutation, pssmlt.cpp:170)
    ("glass_pssmlt", "scenes/glass_caustics.xml", ("path", "pssmlt"),
     256, 16384),
    # hard-visibility interior (BASELINE config 5): ref rendered with
    # bdpt (finds door paths bidirectionally); measured with the
    # scene's pssmlt
    ("door", "scenes/door.xml", ("bdpt", None), 256, 8192),
]
TARGET_RMSE = 0.01
# measured-variant configs reuse another config's converged reference
REF_ALIAS = {"glass_pssmlt": "glass_caustics"}


def _load(name, path, integrator, res, for_ref=False):
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(os.path.join(HERE, path))
    scene.sensor.record.film.width = res
    scene.sensor.record.film.height = res
    override = None
    if isinstance(integrator, tuple):
        override = integrator[0] if for_ref else integrator[1]
    elif integrator is not None:
        override = integrator
    if override is not None:
        from mitsuba_tpu.integrator.plugins import IntegratorRecord

        scene.integrator = IntegratorRecord(
            kind=override, max_depth=scene.integrator.max_depth
        )
    return scene


def _render(scene, spp, seed):
    from mitsuba_tpu.renderer import render

    return np.asarray(render(scene, spp=spp, seed=seed))


def _rmse(img, ref):
    a = img / (1.0 + img)
    b = ref / (1.0 + ref)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def make_refs():
    os.makedirs(REF_DIR, exist_ok=True)
    for name, path, integ, res, ref_spp in CONFIGS:
        if name in REF_ALIAS:
            continue  # reuses another config's reference
        out = os.path.join(REF_DIR, f"{name}_{res}.npz")
        if os.path.exists(out):
            print(f"{name}: ref exists, skipping")
            continue
        scene = _load(name, path, integ, res, for_ref=True)
        t0 = time.time()
        img = _render(scene, ref_spp, seed=999)
        print(f"{name}: ref {res}^2 @{ref_spp}spp in {time.time()-t0:.0f}s")
        np.savez_compressed(out, img=img.astype(np.float16))


def measure_one(name, spp, warmup=True):
    """Render ONE config at ONE spp budget and print a single
    measurement line (same format as the ladder).  Used to run each
    rung in a fresh process: round 5 hit an axon-client crash
    (client.rs:2008 index-out-of-bounds panic) on REPEATED volpath
    executions within one process, while one-render-per-process is
    stable; a bash loop over --spp sidesteps it without changing what
    is measured (the compile cache persists across processes)."""
    cfg = next(c for c in CONFIGS if c[0] == name)
    _, path, integ, res, _ = cfg
    ref_file = os.path.join(REF_DIR, f"{REF_ALIAS.get(name, name)}_{res}.npz")
    ref = np.load(ref_file)["img"].astype(np.float32)
    if warmup:
        # warm the tunnel + process on a SMALL frame.  NOTE: media
        # scenes must pass --no-warmup — ANY second render() call in
        # the same process (even at a different film size) trips the
        # axon client.rs:2008 panic on volpath programs, so their
        # rungs run one-render-per-process and the timed number
        # includes one executable-cache load (~20-40 s, pessimistic)
        wscene = _load(name, path, integ, 64)
        _render(wscene, 2, seed=1)
    scene = _load(name, path, integ, res)
    t0 = time.time()
    img = _render(scene, spp, seed=1)
    dt = time.time() - t0
    r = _rmse(img, ref)
    print(f"# {name}: {spp:5d}spp {dt:7.2f}s rmse {r:.4f}", file=sys.stderr)
    print(json.dumps({"scene": name, "spp": spp, "seconds": round(dt, 2),
                      "rmse": round(r, 6)}))


def measure(only=None, max_spp=4096):
    results = []
    for name, path, integ, res, _ in CONFIGS:
        if only and name not in only:
            continue
        ref_file = os.path.join(
            REF_DIR, f"{REF_ALIAS.get(name, name)}_{res}.npz"
        )
        if not os.path.exists(ref_file):
            print(f"# {name}: no ref ({ref_file}); run --make-refs first",
                  file=sys.stderr)
            continue
        ref = np.load(ref_file)["img"].astype(np.float32)
        scene = _load(name, path, integ, res)

        # warm the compile cache outside the timed renders (spp=2 = the
        # first ladder step; an spp=1 smoke program reproducibly
        # crashed the axon tunnel client in round 5)
        _render(scene, 2, seed=1)

        spp = 2
        prev = None  # (spp, seconds, rmse)
        hit = None
        while spp <= max_spp:
            t0 = time.time()
            img = _render(scene, spp, seed=1)
            dt = time.time() - t0
            r = _rmse(img, ref)
            print(f"# {name}: {spp:5d}spp {dt:7.2f}s rmse {r:.4f}",
                  file=sys.stderr)
            if r <= TARGET_RMSE:
                hit = (spp, dt, r)
                break
            prev = (spp, dt, r)
            spp *= 2
        if hit is None:
            results.append({
                "scene": name, "res": res,
                "seconds_to_rmse_0.01": None,
                "last_spp": prev[0], "last_rmse": prev[2],
                "last_seconds": prev[1],
            })
            continue
        # log-log interpolate between the bracketing budgets (rmse ~
        # spp^-1/2, time ~ spp)
        if prev is not None and prev[2] > TARGET_RMSE:
            f = (np.log(prev[2]) - np.log(TARGET_RMSE)) / max(
                np.log(prev[2]) - np.log(hit[2]), 1e-9
            )
            secs = prev[1] * (hit[1] / prev[1]) ** f
            spp_est = prev[0] * (hit[0] / prev[0]) ** f
        else:
            secs, spp_est = hit[1], hit[0]
        results.append({
            "scene": name, "res": res,
            "seconds_to_rmse_0.01": round(float(secs), 2),
            "spp_to_rmse_0.01": int(spp_est),
            "bracket_spp": hit[0], "bracket_rmse": hit[2],
        })
    print(json.dumps({"metric": "time_to_rmse_0.01", "results": results}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--make-refs", action="store_true")
    p.add_argument("--only", help="comma-separated scene names")
    p.add_argument("--max-spp", type=int, default=4096,
                   help="cap the doubling budget (curve-only configs)")
    p.add_argument("--spp", type=int,
                   help="render ONE rung at this spp (requires --only "
                        "with a single scene); fresh-process ladders")
    p.add_argument("--no-warmup", action="store_true")
    args = p.parse_args()
    if args.make_refs:
        make_refs()
    elif args.spp:
        measure_one(args.only, args.spp, warmup=not args.no_warmup)
    else:
        measure(args.only.split(",") if args.only else None, args.max_spp)
