"""Utility launcher: the `mtsutil` equivalent.

Rebuild of reference src/mitsuba/mtsutil.cpp + src/utils/*:
* tonemap    — batch HDR->LDR conversion (utils/tonemap.cpp:443)
* addimages  — weighted sum of two images (utils/addimages.cpp)
* joinrgb    — merge three single-channel images (utils/joinrgb.cpp)
* kdbench    — ray-throughput benchmark on a scene (utils/kdbench.cpp:30)

Usage: python -m mitsuba_tpu.tools <command> [args...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def tonemap(argv):
    p = argparse.ArgumentParser(prog="tonemap")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", help="output (single input only)")
    p.add_argument("-m", "--multiplier", type=float, default=1.0)
    p.add_argument("-g", "--gamma", type=float, default=-1.0,
                   help="-1 = sRGB curve")
    p.add_argument("-t", "--tonemap", choices=["gamma", "reinhard"],
                   default="gamma")
    p.add_argument("-k", "--key", type=float, default=0.18)
    p.add_argument("-f", "--format", default="png")
    args = p.parse_args(argv)

    from mitsuba_tpu.film.plugins import FilmRecord
    from mitsuba_tpu.io.images import read_image, write_image

    for path in args.inputs:
        img, is_ldr = read_image(path)
        img = img[..., :3] * args.multiplier
        rec = FilmRecord(
            is_ldr=True, tonemap=args.tonemap, gamma=args.gamma,
            key=args.key,
        )
        out = rec.develop_to_array(img)
        dst = args.output or os.path.splitext(path)[0] + "." + args.format
        write_image(dst, out)
        print(f"tonemap: {path} -> {dst}")


def addimages(argv):
    p = argparse.ArgumentParser(prog="addimages")
    p.add_argument("weight_a", type=float)
    p.add_argument("image_a")
    p.add_argument("weight_b", type=float)
    p.add_argument("image_b")
    p.add_argument("output")
    args = p.parse_args(argv)
    from mitsuba_tpu.io.images import read_image, write_image

    a, _ = read_image(args.image_a)
    b, _ = read_image(args.image_b)
    write_image(args.output, args.weight_a * a + args.weight_b * b)
    print(f"addimages: wrote {args.output}")


def joinrgb(argv):
    p = argparse.ArgumentParser(prog="joinrgb")
    p.add_argument("red")
    p.add_argument("green")
    p.add_argument("blue")
    p.add_argument("output")
    args = p.parse_args(argv)
    from mitsuba_tpu.io.images import read_image, write_image

    chans = [read_image(x)[0][..., 0] for x in (args.red, args.green, args.blue)]
    write_image(args.output, np.stack(chans, axis=-1))
    print(f"joinrgb: wrote {args.output}")


def kdbench(argv):
    """Incoherent ray throughput on a scene's geometry — the equivalent
    of the reference's kdbench sphere-to-sphere benchmark
    (utils/kdbench.cpp:221-242, test_kd.cpp:102-130)."""
    p = argparse.ArgumentParser(prog="kdbench")
    p.add_argument("scene")
    p.add_argument("-n", "--rays", type=int, default=10_000_000)
    p.add_argument("--best-of", type=int, default=3)
    p.add_argument("--coherent", action="store_true",
                   help="scanline pinhole rays instead of random "
                        "sphere-to-sphere")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mitsuba_tpu.accel.intersect import intersect
    from mitsuba_tpu.core import rng
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene

    scene = load_scene(args.scene)
    pack = pack_scene(scene)

    lo = np.asarray(pack.tri_v0[: pack.n_tris]).min(axis=0)
    hi = np.asarray(pack.tri_v0[: pack.n_tris]).max(axis=0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2 * 1.3)

    n = args.rays
    if args.coherent:
        # scanline-ordered primary rays from a virtual pinhole — the
        # packet-friendly case (already coherent, no sort needed;
        # reference kdbench's "coherent" variant)
        side = int(np.sqrt(n))
        n = side * side
        px = (jnp.arange(n, dtype=jnp.float32) % side + 0.5) / side
        py = (jnp.arange(n, dtype=jnp.float32) // side + 0.5) / side
        eye = jnp.asarray(
            center + np.array([0.0, 0.25 * radius, -2.2 * radius]),
            jnp.float32,
        )
        span = 1.15 * radius
        target = jnp.stack(
            [
                center[0] + (px - 0.5) * 2 * span,
                center[1] + (py - 0.5) * 2 * span,
                jnp.full((n,), center[2], jnp.float32),
            ],
            axis=-1,
        )
        p1 = jnp.broadcast_to(eye[None, :], (n, 3))
        d = target - p1
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sort = False
    else:
        # random sphere-to-sphere rays around the scene bounds
        u = rng.rand4(jnp.arange(n, dtype=jnp.uint32), 0, 0)
        from mitsuba_tpu.core import warp

        p1 = warp.square_to_uniform_sphere(u[..., 0:2]) * radius + center
        p2 = warp.square_to_uniform_sphere(u[..., 2:4]) * radius + center
        d = p2 - p1
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sort = pack.use_bvh

    f = jax.jit(lambda o, d: intersect(pack, o, d, sort=sort).t)
    f(p1, d).block_until_ready()  # compile
    best = np.inf
    for _ in range(args.best_of):
        t0 = time.time()
        f(p1, d).block_until_ready()
        best = min(best, time.time() - t0)
    print(
        f"kdbench: {n/best/1e6:.2f} MRays/s "
        f"({pack.n_tris} tris, {'BVH' if pack.use_bvh else 'brute'}, "
        f"{'coherent' if args.coherent else 'incoherent'}, "
        f"best of {args.best_of})"
    )


COMMANDS = {
    "tonemap": tonemap,
    "addimages": addimages,
    "joinrgb": joinrgb,
    "kdbench": kdbench,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in COMMANDS:
        print(
            "usage: python -m mitsuba_tpu.tools "
            f"{{{','.join(COMMANDS)}}} [args...]",
            file=sys.stderr,
        )
        return 1
    COMMANDS[argv[0]](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
