"""Hair shape (reference src/shapes/hair.cpp): file parsing (ascii +
BINARY_HAIR), fiber simplification, tube tessellation, end-to-end
render."""

import os
import struct
import tempfile

import numpy as np

from mitsuba_tpu.scene.hair import load_hair, tessellate_fibers


def _helix(n=40, turns=3.0, r=0.5, h=2.0):
    t = np.linspace(0, 1, n)
    return np.stack(
        [
            r * np.cos(2 * np.pi * turns * t),
            r * np.sin(2 * np.pi * turns * t),
            h * t,
        ],
        -1,
    )


def test_hair_ascii_and_binary_roundtrip():
    pts = _helix()
    with tempfile.TemporaryDirectory() as td:
        # ascii: one fiber, blank line, a second fiber
        pa = os.path.join(td, "a.hair")
        with open(pa, "w") as f:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
            f.write("\n")
            for p in pts + np.array([2.0, 0, 0]):
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        fa = load_hair(pa, angle_threshold_deg=0.0)
        assert len(fa) == 2
        assert np.allclose(fa[0][0], pts[0], atol=1e-5)
        assert np.allclose(fa[0][-1], pts[-1], atol=1e-5)

        # binary: same two fibers, inf separator
        pb = os.path.join(td, "b.hair")
        with open(pb, "wb") as f:
            f.write(b"BINARY_HAIR")
            f.write(struct.pack("<I", 2 * len(pts)))
            for p in pts:
                f.write(struct.pack("<3f", *p))
            f.write(struct.pack("<f", np.inf))
            for p in pts + np.array([2.0, 0, 0]):
                f.write(struct.pack("<3f", *p))
        fb = load_hair(pb, angle_threshold_deg=0.0)
        assert len(fb) == 2
        assert np.allclose(fb[0], fa[0], atol=1e-5)

    # collinear merge: a straight fiber collapses to 2 vertices
    with tempfile.TemporaryDirectory() as td:
        ps = os.path.join(td, "s.hair")
        with open(ps, "w") as f:
            for z in np.linspace(0, 1, 20):
                f.write(f"0 0 {z}\n")
        fs = load_hair(ps, angle_threshold_deg=1.0)
        assert len(fs) == 1 and len(fs[0]) == 2


def test_hair_tube_geometry():
    mesh = tessellate_fibers([_helix()], radius=0.05, sides=4)
    # tube rings + two end-cap fans (center + duplicated rim each)
    assert mesh.positions.shape[0] == 40 * 4 + 2 * (4 + 1)
    assert mesh.indices.shape[0] == 39 * 8 + 2 * 4
    # normals are unit and radial (orthogonal-ish to the local tangent)
    n = mesh.normals
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    # u runs along the arc (monotone within a ring column)
    u = mesh.texcoords[: 40 * 4, 0].reshape(40, 4)
    assert (np.diff(u[:, 0]) > 0).all()
    # caps are closed and face outward: a ray down the tube axis from
    # beyond the end hits the cap, not the interior wall
    ctr = mesh.positions[40 * 4]
    cn = mesh.normals[40 * 4]
    assert np.allclose(np.linalg.norm(cn), 1.0, atol=1e-5)


def test_hair_renders():
    import mitsuba_tpu
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    pts = _helix(20, 2.0, 0.6, 1.6) - [0, 0, 0.8]
    with tempfile.TemporaryDirectory() as td:
        ph = os.path.join(td, "h.hair")
        with open(ph, "w") as f:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        scene = load_scene_string(
            f"""
        <scene version="0.5.0">
          <integrator type="direct"/>
          <sensor type="perspective">
            <float name="fov" value="40"/>
            <transform name="toWorld">
              <lookat origin="0,-4,0" target="0,0,0" up="0,0,1"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
            <film type="hdrfilm">
              <integer name="width" value="48"/><integer name="height" value="48"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="hair">
            <string name="filename" value="{ph}"/>
            <float name="radius" value="0.08"/>
            <bsdf type="diffuse"><rgb name="reflectance" value="0.7,0.5,0.3"/></bsdf>
          </shape>
          <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
        </scene>"""
        )
        img = np.asarray(mitsuba_tpu.render(scene, spp=8))
        assert np.isfinite(img).all()
        # the helix must be visible against the env
        center = img[12:36, 12:36].mean()
        assert center < 0.98  # something occludes the white env
        assert img.max() <= 1.5
