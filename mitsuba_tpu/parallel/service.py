"""mtssrv-equivalent render service: persistent workers, broadcast-once
scenes, centrally queued work units, and re-queue of units lost to a
worker death.

Rebuild of the reference's remote-rendering orchestration layer —
`mtssrv`'s per-connection StreamBackend loop and the master-side
RemoteWorker pipelining (reference: src/mitsuba/mtssrv.cpp:101,
src/libcore/sched_remote.cpp:333-431, protocol enum sched_remote.h:221)
— for the TPU execution model:

* a work unit is ONE render pass: a sample range [s0, s0 + spp_chunk)
  over the whole film (the reference's unit is a 32x32 pixel block;
  sample-space units fit the wavefront renderer better because every
  pass already covers the film densely and the counter RNG keys
  samples globally, so any worker can render any unit byte-identically),
* resources (the scene) are broadcast ONCE per scene id and cached by
  the worker (= ENewResource + the resource cache, sched_remote.h:384),
* results are the raw pass films; the master folds them IN UNIT ORDER,
  which reproduces the exact float-addition sequence of a local
  single-process pass loop — the final image is bit-identical no
  matter which worker rendered which unit, including after a death,
* a worker death (socket EOF / error) re-queues its in-flight unit to
  the survivors (= Scheduler::cancel re-queue, sched.h:143-156); the
  render completes as long as one worker survives.

The wire format is length-prefixed pickles over local sockets — the
service trusts its peers exactly like mtssrv trusts its cluster
(reference runs plaintext TCP on port 7554).  Workers are separate
python processes, so on TPU pools each worker claims its own chip; in
CI they run CPU-only (tests/test_service.py).
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import subprocess
import sys
import threading
import time

import numpy as np

from mitsuba_tpu.core.logging import logger

_HDR = struct.Struct("<Q")


def _send(sock, obj):
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(data)) + data)


def _recv(sock):
    hdr = b""
    while len(hdr) < _HDR.size:
        chunk = sock.recv(_HDR.size - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = _HDR.unpack(hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            return None
        buf += chunk
    return pickle.loads(bytes(buf))


# ---------------------------------------------------------------------------
# worker side (= mtssrv / StreamBackend::run)
# ---------------------------------------------------------------------------

def _render_unit(scene, pack, unit):
    """Render one work unit: the film of samples
    [s0, s0 + spp_chunk) — exactly one pass of the local pass loop."""
    import jax
    import jax.numpy as jnp

    from mitsuba_tpu.renderer import make_render_pass, new_film

    sensor_rec = scene.sensor.record
    film_rec = sensor_rec.film
    w, h = film_rec.width, film_rec.height
    rp = jax.jit(
        make_render_pass(
            pack, scene.integrator, sensor_rec, film_rec,
            sensor_rec.sampler, unit["spp_chunk"],
        )
    )
    film = rp(
        new_film(h, w), jnp.uint32(unit["s0"]), jnp.uint32(unit["seed"])
    )
    film.block_until_ready()
    return np.asarray(film)


def worker_loop(host, port):
    """Persistent worker: connect, serve scenes + units until quit.

    = StreamBackend::run (sched_remote.cpp:333): one message loop,
    resources cached by id, work executed and streamed back."""
    import mitsuba_tpu
    from mitsuba_tpu.scene.builder import pack_scene

    sock = socket.create_connection((host, port))
    _send(sock, {"type": "hello", "pid": os.getpid()})
    scenes = {}  # scene_id -> (scene, pack): the resource cache
    while True:
        msg = _recv(sock)
        if msg is None or msg["type"] == "quit":
            break
        if msg["type"] == "scene":
            scene = mitsuba_tpu.load_scene(msg["path"])
            for k, v in (msg.get("film_size") or {}).items():
                setattr(scene.sensor.record.film, k, v)
            scenes[msg["scene_id"]] = (scene, pack_scene(scene))
            _send(sock, {"type": "scene_ok", "scene_id": msg["scene_id"]})
        elif msg["type"] == "unit":
            scene, pack = scenes[msg["scene_id"]]
            try:
                film = _render_unit(scene, pack, msg)
                _send(sock, {
                    "type": "result",
                    "unit_id": msg["unit_id"],
                    "film": film,
                })
            except Exception as e:  # noqa: BLE001 — reported to master
                _send(sock, {
                    "type": "error",
                    "unit_id": msg["unit_id"],
                    "error": f"{type(e).__name__}: {e}",
                })
    sock.close()


# ---------------------------------------------------------------------------
# master side (= RemoteWorker + Scheduler work queue)
# ---------------------------------------------------------------------------

class _Worker:
    def __init__(self, sock, proc=None):
        self.sock = sock
        self.proc = proc
        self.pid = None
        self.inflight = None  # unit dict currently assigned
        self.dead = False


class RenderService:
    """Master: spawns/accepts N persistent workers, broadcasts the
    scene once, schedules pass units, merges partial films in unit
    order, and re-queues units lost to worker deaths."""

    def __init__(self, n_workers=2, spawn=True, worker_env=None):
        self.listener = socket.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(n_workers)
        self.port = self.listener.getsockname()[1]
        self.workers = []
        self._scene_seq = 0
        if spawn:
            env = dict(os.environ if worker_env is None else worker_env)
            for _ in range(n_workers):
                proc = subprocess.Popen(
                    [sys.executable, "-m",
                     "mitsuba_tpu.parallel.service",
                     "--worker", "--connect", f"127.0.0.1:{self.port}"],
                    env=env,
                )
                self._accept(proc)
        else:
            for _ in range(n_workers):
                self._accept(None)

    def _accept(self, proc):
        sock, _ = self.listener.accept()
        w = _Worker(sock, proc)
        hello = _recv(sock)
        assert hello and hello["type"] == "hello", hello
        w.pid = hello["pid"]
        self.workers.append(w)
        return w

    def worker_pids(self):
        return [w.pid for w in self.workers]

    def broadcast_scene(self, path, film_size=None):
        """Transfer the scene ONCE to every worker (= ENewResource);
        returns the scene_id handle for render()."""
        self._scene_seq += 1
        sid = self._scene_seq
        msg = {
            "type": "scene", "scene_id": sid,
            "path": os.path.abspath(path), "film_size": film_size,
        }
        for w in self.workers:
            if w.dead:
                continue
            try:
                _send(w.sock, msg)
                ok = _recv(w.sock)
                assert ok and ok["type"] == "scene_ok", ok
            except (OSError, AssertionError):
                self._mark_dead(w)
        return sid

    def _mark_dead(self, w):
        if not w.dead:
            w.dead = True
            logger.warn("service: worker pid=%s died", w.pid)
            try:
                w.sock.close()
            except OSError:
                pass

    def _live(self):
        return [w for w in self.workers if not w.dead]

    def render(self, scene_id, *, w, h, spp, spp_chunk=1, seed=0,
               ray_weight=1.0):
        """Run the distributed pass loop; returns the developed image.

        Unit i covers samples [i*spp_chunk, (i+1)*spp_chunk); partials
        fold in unit order, so output is bit-identical to the local
        single-process pass loop regardless of scheduling or deaths."""
        import math

        from mitsuba_tpu.renderer import develop

        n_units = math.ceil(spp / spp_chunk)
        queue = list(range(n_units))
        results = {}
        lock = threading.Lock()

        def pump(worker):
            while True:
                with lock:
                    if not queue:
                        return
                    uid = queue.pop(0)
                    worker.inflight = uid
                unit = {
                    "type": "unit", "unit_id": uid,
                    "scene_id": scene_id,
                    "s0": uid * spp_chunk, "spp_chunk": spp_chunk,
                    "seed": seed,
                }
                try:
                    _send(worker.sock, unit)
                    msg = _recv(worker.sock)
                except OSError:
                    msg = None
                if msg is None:
                    # worker death: re-queue the lost unit
                    # (= Scheduler::cancel re-queue, sched.h:143-156)
                    with lock:
                        queue.insert(0, uid)
                        self._mark_dead(worker)
                    return
                if msg["type"] == "error":
                    raise RuntimeError(
                        f"worker unit {uid} failed: {msg['error']}"
                    )
                with lock:
                    results[msg["unit_id"]] = msg["film"]
                    worker.inflight = None

        while True:
            live = self._live()
            if not live:
                raise RuntimeError("service: all workers died")
            threads = [
                threading.Thread(target=pump, args=(w_,), daemon=True)
                for w_ in live
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if len(results) == n_units:
                break
            # some units were re-queued by deaths — go again with the
            # survivors (the re-queued units are back at queue head)
            time.sleep(0.05)

        # canonical fold: unit order == the local pass loop's addition
        # order, so the float sum is bit-identical however units were
        # distributed (and whether or not a worker died mid-render)
        film = results[0].astype(np.float32)
        for uid in range(1, n_units):
            film = film + results[uid]
        import jax.numpy as jnp

        img = np.asarray(develop(jnp.asarray(film))) * ray_weight
        return img, film

    def shutdown(self):
        for w in self.workers:
            if not w.dead:
                try:
                    _send(w.sock, {"type": "quit"})
                except OSError:
                    pass
        for w in self.workers:
            if w.proc is not None:
                try:
                    w.proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    w.proc.kill()
        self.listener.close()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="mitsuba_tpu render service (mtssrv equivalent)"
    )
    ap.add_argument("--worker", action="store_true",
                    help="run as a persistent worker node")
    ap.add_argument("--connect", default=None, help="master host:port")
    ap.add_argument("scene", nargs="?")
    ap.add_argument("-o", "--output", default="out.exr")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--spp-chunk", type=int, default=4)
    args = ap.parse_args(argv)

    if args.worker:
        host, port = args.connect.rsplit(":", 1)
        worker_loop(host, int(port))
        return 0

    import mitsuba_tpu

    scene = mitsuba_tpu.load_scene(args.scene)
    film = scene.sensor.record.film
    svc = RenderService(n_workers=args.workers)
    try:
        sid = svc.broadcast_scene(args.scene)
        img, _ = svc.render(
            sid, w=film.width, h=film.height, spp=args.spp,
            spp_chunk=args.spp_chunk,
            ray_weight=scene.sensor.record.ray_weight,
        )
    finally:
        svc.shutdown()
    from mitsuba_tpu.io.images import write_image

    write_image(args.output, img)
    return 0


if __name__ == "__main__":
    sys.exit(main())
