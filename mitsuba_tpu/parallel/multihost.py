"""Multi-host (DCN) scaling helpers.

Rebuild of the reference's remote-rendering stack — `mtssrv` +
`RemoteWorker`'s TCP/SSH stream protocol and per-node resource caches
(reference: src/mitsuba/mtssrv.cpp, src/libcore/sched_remote.cpp:333-431)
— in the JAX multi-controller model.  Where the reference ships scene
objects over sockets and load-balances work units centrally, here every
host runs the SAME program under `jax.distributed`, the global device
mesh spans hosts over DCN, and the existing `parallel/mesh.py` sharded
render pass works unchanged: lane shards land on local chips, and the
single film `psum` is the only cross-host traffic (it rides
ICI within a slice and DCN across slices — one [H,W,4] reduction per
pass, the cheapest possible collective layout).

No persistent server process is needed (mtssrv's role — keeping a warm
worker with cached resources — is covered by each host's process and
jax's compilation cache), so the CLI equivalent of

    mtssrv -p 7554            # reference worker
    mitsuba -c host1;host2    # reference submit

is simply launching the same render script on every host:

    python -m mitsuba_tpu.parallel.multihost scene.xml \
        --coordinator host0:8476 --num-hosts 4 --host-id $ID

This module is exercised in CI only in single-process form (the test
environment has one host); the distributed code path is the standard
jax.distributed bring-up, kept deliberately thin.
"""

from __future__ import annotations

import argparse
import sys


def init_multihost(coordinator=None, num_hosts=None, host_id=None):
    """Initialize jax.distributed when multi-host args are given.

    Safe to call single-host (no-op).  Returns (n_hosts, this_host)."""
    import jax

    if coordinator and (num_hosts or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_hosts,
            process_id=host_id or 0,
        )
    return jax.process_count(), jax.process_index()


def render_multihost(scene, spp=None, seed=0):
    """Render with the global (possibly cross-host) device mesh.

    Every host calls this with the same scene; each gets the full
    developed film back (the psum replicates it)."""
    from mitsuba_tpu.parallel.mesh import render_sharded

    return render_sharded(scene, spp=spp, seed=seed)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="multi-host mitsuba_tpu render (mtssrv equivalent)"
    )
    ap.add_argument("scene")
    ap.add_argument("-o", "--output", default="out.exr")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    args = ap.parse_args(argv)

    n_hosts, me = init_multihost(
        args.coordinator, args.num_hosts, args.host_id
    )
    import mitsuba_tpu
    from mitsuba_tpu.core.logging import logger

    logger.info(f"multihost: process {me}/{n_hosts}")
    scene = mitsuba_tpu.load_scene(args.scene)
    img = render_multihost(scene, spp=args.spp)
    if me == 0:
        from mitsuba_tpu.io.images import write_image

        write_image(args.output, img)
        logger.info(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
