"""Two-process multi-host loopback (parallel/multihost.py).

The reference enables loopback testing of its remote scheduler
(mtssrv stdio pairs, doc/parallelization.tex:16-60); the JAX
equivalent is two `jax.distributed` processes on localhost, each
owning two virtual CPU devices, rendering ONE scene sharded over the
global 4-device mesh.  Counter-based RNG + a single film psum make
the result sharding-invariant, so the two-process image must match a
single-process 4-device render.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coordinator, num, pid, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
from mitsuba_tpu.parallel.multihost import init_multihost, render_multihost
n, me = init_multihost(coordinator, num, pid)
assert n == num and me == pid, (n, me)
assert len(jax.devices()) == 2 * num, len(jax.devices())

import mitsuba_tpu
scene = mitsuba_tpu.load_scene(os.path.join(os.environ["MTS_REPO"], "scenes", "cbox.xml"))
scene.sensor.record.film.width = scene.sensor.record.film.height = 32
img = render_multihost(scene, spp=4)
if me == 0:
    np.save(out, np.asarray(img))
print("worker", pid, "done")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={n_local_devices}"
    ).strip()
    env["MTS_REPO"] = REPO
    pp = env.get("PYTHONPATH", "")
    if REPO not in pp.split(os.pathsep):
        env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def test_two_process_loopback_matches_single_process(tmp_path):
    out2 = str(tmp_path / "two_proc.npy")
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, "2", str(pid),
             out2],
            env=_env(2),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    img2 = np.load(out2)

    # single-process reference over an equally-sized (4-device) mesh
    out1 = str(tmp_path / "one_proc.npy")
    single = subprocess.run(
        [sys.executable, "-c", _WORKER.replace(
            "init_multihost(coordinator, num, pid)",
            "(1, 0) if True else init_multihost(coordinator, num, pid)",
        ).replace("assert n == num and me == pid, (n, me)", "")
         .replace("assert len(jax.devices()) == 2 * num", "assert len(jax.devices()) == 4"),
         coord, "1", "0", out1],
        env=_env(4),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    img1 = np.load(out1)

    assert img1.shape == img2.shape
    assert np.isfinite(img2).all()
    # counter RNG makes the estimator sharding-invariant; only psum
    # reduction order may differ across process layouts
    assert np.allclose(img1, img2, rtol=1e-5, atol=1e-6), (
        np.abs(img1 - img2).max()
    )
