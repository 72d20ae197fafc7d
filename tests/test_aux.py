"""Auxiliary subsystems: logger/statistics, checkpoint/resume,
mtsimport (SURVEY §5, §2.6)."""

import os

import numpy as np
import pytest


def test_logger_and_counters(capsys):
    from mitsuba_tpu.core import logging as L

    buf = []

    class Cap(L.Appender):
        def append(self, level, text):
            buf.append((level, text))

    lg = L.Logger(level=L.EInfo)
    lg.clear_appenders()
    lg.add_appender(Cap())
    lg.debug("hidden %d", 1)
    lg.info("shown %d", 2)
    lg.error("bad")
    assert len(buf) == 2
    assert "shown 2" in buf[0][1]

    L.reset_statistics()
    L.counter("Rays traced").add(1e6).add(2e6)
    L.counter("Cache hits").add(30).add_base(40)
    s = L.stats_summary()
    assert "3M" in s and "75.00%" in s


def test_checkpoint_resume(tmp_path):
    """A checkpointed render interrupted halfway resumes to the exact
    same image (counter RNG makes resumption bit-deterministic)."""
    import mitsuba_tpu
    from mitsuba_tpu.renderer import render

    scene = mitsuba_tpu.load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    )
    scene.sensor.record.film.width = 16
    scene.sensor.record.film.height = 16

    ref = render(scene, spp=8, lanes_per_pass=16 * 16 * 2)  # 4 passes

    ck = str(tmp_path / "film.npz")

    class Stop(Exception):
        pass

    def interrupt(i, n):
        if i == 2:
            raise Stop

    with pytest.raises(Stop):
        render(
            scene, spp=8, lanes_per_pass=16 * 16 * 2,
            checkpoint=ck, checkpoint_every=1, progress=interrupt,
        )
    assert os.path.exists(ck)
    resumed = render(
        scene, spp=8, lanes_per_pass=16 * 16 * 2,
        checkpoint=ck, checkpoint_every=1,
    )
    assert np.array_equal(ref, resumed)


def test_mtsimport_roundtrip(tmp_path):
    """OBJ+MTL -> XML+serialized -> loadable, renderable scene."""
    import mitsuba_tpu
    from mitsuba_tpu.mtsimport import import_obj

    obj = tmp_path / "tri.obj"
    obj.write_text(
        "mtllib tri.mtl\no tri\nusemtl green\n"
        "v -1 0 -1\nv 1 0 -1\nv 0 0 1\nvn 0 1 0\n"
        "f 1//1 2//1 3//1\n"
    )
    (tmp_path / "tri.mtl").write_text("newmtl green\nKd 0.1 0.7 0.1\n")
    out = import_obj(str(obj), str(tmp_path / "out"))
    scene = mitsuba_tpu.load_scene(out)
    scene.sensor.record.film.width = scene.sensor.record.film.height = 8
    img = mitsuba_tpu.render(scene, spp=2)
    assert np.isfinite(img).all()


def test_multichannel_stacks_children():
    """multichannel renders every nested integrator and stacks channels
    (reference src/integrators/misc/multichannel.cpp)."""
    import numpy as np
    import mitsuba_tpu
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    scene = load_scene_string(
        """
    <scene version="0.5.0">
      <integrator type="multichannel">
        <integrator type="direct"/>
        <integrator type="field"><string name="field" value="distance"/></integrator>
      </integrator>
      <sensor type="perspective">
        <transform name="toWorld">
          <lookat origin="0,0,-4" target="0,0,0" up="0,1,0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="sphere"><float name="radius" value="1"/>
        <bsdf type="diffuse"/></shape>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
    </scene>"""
    )
    img = mitsuba_tpu.render(scene, spp=4)
    assert img.shape == (16, 16, 6)
    assert np.isfinite(img).all()
    # channel group 1 is the distance AOV: center pixel ~3 (sphere at 1
    # unit radius, camera 4 away)
    assert 2.0 < img[8, 8, 3] < 4.0


def test_progressive_preview_headless():
    """The preview frontend's progressive loop (mtsgui's render-view
    role) accumulates passes into a converging running average."""
    import numpy as np
    from mitsuba_tpu.preview import progressive_render

    frames = []
    for acc, total, dt in progressive_render(
        "scenes/cbox.xml", spp_chunk=2, max_spp=4,
    ):
        frames.append((np.asarray(acc), total))
    assert [t for _, t in frames] == [2, 4]
    a2, a4 = frames[0][0], frames[1][0]
    assert a2.shape == a4.shape and np.isfinite(a4).all()
    # the running average actually mixes both passes
    assert not np.allclose(a2, a4)


def test_scenepack_serialization_roundtrip(tmp_path):
    """ScenePack save/load (the reference's serialized object-graph
    role, serialization.h:35): arrays bit-identical, meta equal, and a
    render from the loaded pack matches the live pack exactly."""
    import numpy as np
    import mitsuba_tpu
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.serialize import load_pack, save_pack

    scene = mitsuba_tpu.load_scene("scenes/cbox.xml")
    scene.sensor.record.film.width = 32
    scene.sensor.record.film.height = 32
    pack = pack_scene(scene)
    path = tmp_path / "cbox.mtspack"
    save_pack(pack, str(path))
    pack2 = load_pack(str(path))

    assert pack2.meta == pack.meta
    assert set(pack2.arrays) == set(pack.arrays)
    for k in pack.arrays:
        assert np.array_equal(
            np.asarray(pack.arrays[k]), np.asarray(pack2.arrays[k])
        ), k

    a = np.asarray(mitsuba_tpu.render(scene, spp=4, seed=0, pack=pack))
    b = np.asarray(mitsuba_tpu.render(scene, spp=4, seed=0, pack=pack2))
    assert np.array_equal(a, b)
