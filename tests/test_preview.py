"""Interactive preview camera (preview.py) — the mtsgui preview-camera
contract (reference src/mtsgui/preview.h:34, glwidget.cpp mouse
handlers): orbit/dolly/pan verbs, progressive restart on camera motion,
and the HTTP control surface."""

import json
import math
import urllib.request

import numpy as np
import pytest

import mitsuba_tpu
from mitsuba_tpu.preview import CameraRig, _serve, progressive_render

pytestmark = pytest.mark.fast

SCENE = "scenes/cbox.xml"


def test_rig_identity_roundtrip():
    scene = mitsuba_tpu.load_scene(SCENE)
    tw = scene.sensor.record.to_world
    rig = CameraRig(tw, dist=2.0)
    back = rig.to_transform()
    m0, m1 = np.asarray(tw.m), np.asarray(back.m)
    # same origin and same view direction (the rig re-derives the roll
    # about the view axis from the global up, so only compare those)
    np.testing.assert_allclose(m1[:3, 3], m0[:3, 3], atol=1e-6)
    d0 = m0[:3, 2] / np.linalg.norm(m0[:3, 2])
    d1 = m1[:3, 2] / np.linalg.norm(m1[:3, 2])
    assert float(d0 @ d1) > 1.0 - 1e-9


def test_rig_verbs_move_the_camera():
    scene = mitsuba_tpu.load_scene(SCENE)
    rig = CameraRig(scene.sensor.record.to_world, dist=2.0)
    o0 = np.asarray(rig.to_transform().m)[:3, 3]
    rig.orbit(0.5, 0.1)
    o1 = np.asarray(rig.to_transform().m)[:3, 3]
    assert np.linalg.norm(o1 - o0) > 0.1
    # orbit preserves distance to target
    assert math.isclose(
        float(np.linalg.norm(o1 - rig.target)), rig.dist, rel_tol=1e-6
    )
    rig.dolly(0.5)
    o2 = np.asarray(rig.to_transform().m)[:3, 3]
    assert math.isclose(
        float(np.linalg.norm(o2 - rig.target)), rig.dist, rel_tol=1e-6
    )
    t0 = rig.target.copy()
    rig.pan(0.1, -0.2)
    assert np.linalg.norm(rig.target - t0) > 1e-3
    rig.reset()
    np.testing.assert_allclose(
        np.asarray(rig.to_transform().m)[:3, 3], o0, atol=1e-9
    )


def test_camera_move_changes_render_and_restarts_accumulation():
    camera = {"rig": None, "version": 0}
    gen = progressive_render(SCENE, spp_chunk=2, max_spp=0,
                             camera=camera, film_res=32)
    img0, total0, _ = next(gen)
    assert total0 == 2
    img1, total1, _ = next(gen)
    assert total1 == 4
    # move the camera: accumulation must restart and the image change
    camera["rig"].orbit(0.6, 0.0)
    camera["version"] += 1
    img2, total2, _ = next(gen)
    assert total2 == 2  # restarted
    assert float(np.abs(img2 - img0).max()) > 1e-3
    gen.close()


def test_http_cam_endpoint_drives_rig():
    scene = mitsuba_tpu.load_scene(SCENE)
    rig = CameraRig(scene.sensor.record.to_world, dist=2.0)
    camera = {"rig": rig, "version": 0}
    state = {"scene": "cbox.xml", "camera": camera, "spp": 7, "dt": 0.5}
    httpd = _serve(state, 0)  # port 0: pick a free one
    port = httpd.server_address[1]
    try:
        az0, dist0 = rig.az, rig.dist
        url = (f"http://127.0.0.1:{port}/cam?daz=0.25&del=0.0"
               f"&logd={math.log(0.5)}&px=0.01&py=0.0")
        assert urllib.request.urlopen(url, timeout=10).status == 200
        assert camera["version"] == 1
        assert math.isclose(rig.az, az0 + 0.25, rel_tol=1e-9)
        assert math.isclose(rig.dist, dist0 * 0.5, rel_tol=1e-6)
        s = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=10
            ).read()
        )
        assert s == {"scene": "cbox.xml", "spp": 7, "dt": 0.5}
        # reset restores the initial pose
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/cam?reset=1", timeout=10
        )
        assert camera["version"] == 2
        assert math.isclose(rig.az, az0, rel_tol=1e-9)
        # the page itself serves
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        assert "pointerdown" in page
    finally:
        httpd.shutdown()
