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


def _pack_xml(xml):
    from mitsuba_tpu.scene.builder import pack_scene
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    return pack_scene(load_scene_string(xml))


def test_exact_cylinder_analytic_hit():
    """Analytic open cylinder (reference src/shapes/cylinder.cpp):
    side hits have t = axis_distance - radius and radial normals; rays
    past the axial extent or down the open mouth miss the wall."""
    import jax.numpy as jnp

    from mitsuba_tpu.accel.intersect import fill_interaction, intersect

    pack = _pack_xml("""
    <scene version="0.5.0">
      <sensor type="perspective">
        <sampler type="independent"/>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="cylinder">
        <point name="p0" x="0" y="0" z="0"/>
        <point name="p1" x="0" y="0" z="1"/>
        <float name="radius" value="0.3"/>
        <bsdf type="diffuse"/>
      </shape>
    </scene>""")
    assert pack.meta["n_cyls"] == 1
    o = jnp.asarray([
        [2.0, 0.0, 0.5],   # side hit
        [2.0, 0.0, 1.5],   # beyond the far clip plane -> miss
        [0.0, 0.0, 2.0],   # straight down the axis: open, no caps
        [2.0, 0.0, -0.5],  # below the near clip plane -> miss
    ], jnp.float32)
    d = jnp.asarray([
        [-1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0],
        [-1.0, 0.0, 0.0],
    ], jnp.float32)
    hit = intersect(pack, o, d)
    assert bool(hit.valid[0]) and not bool(hit.valid[1])
    assert not bool(hit.valid[2]) and not bool(hit.valid[3])
    assert abs(float(hit.t[0]) - 1.7) < 1e-4
    its = fill_interaction(pack, o, d, hit)
    assert np.allclose(np.asarray(its.ns[0]), [1.0, 0.0, 0.0], atol=1e-4)
    # entering from inside: the far wall is hit with an outward normal
    o2 = jnp.asarray([[0.0, 0.0, 0.5]], jnp.float32)
    d2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    h2 = intersect(pack, o2, d2)
    assert bool(h2.valid[0]) and abs(float(h2.t[0]) - 0.3) < 1e-4


def test_hair_exact_miter_joints_no_cracks():
    """A bent two-segment fiber must be watertight at the miter joint
    (reference hair.cpp:485-542: the shared miter plane splits the
    joint exactly): rays shot at the joint region hit exactly one
    segment, with no gaps and no double-coverage artifacts."""
    import tempfile

    import jax.numpy as jnp

    from mitsuba_tpu.accel.intersect import intersect

    with tempfile.TemporaryDirectory() as td:
        ph = os.path.join(td, "bend.hair")
        with open(ph, "w") as f:
            f.write("0 0 0\n1 0 0\n1.7 0.7 0\n")  # 45-degree bend at x=1
        from mitsuba_tpu.scene.builder import pack_scene
        from mitsuba_tpu.scene.xml_loader import load_scene_string

        pack = pack_scene(load_scene_string(f"""
        <scene version="0.5.0">
          <sensor type="perspective">
            <sampler type="independent"/>
            <film type="hdrfilm">
              <integer name="width" value="8"/>
              <integer name="height" value="8"/>
            </film>
          </sensor>
          <shape type="hair">
            <string name="filename" value="{ph}"/>
            <float name="radius" value="0.1"/>
            <boolean name="exact" value="true"/>
            <bsdf type="diffuse"/>
          </shape>
        </scene>"""))
        assert pack.meta["n_cyls"] == 2

        # rays from above straight down, marching across the joint
        xs = np.linspace(0.5, 1.4, 181, dtype=np.float32)
        o = jnp.asarray(
            np.stack([xs, np.full_like(xs, 2.0), np.zeros_like(xs)], -1)
        )
        d = jnp.asarray(
            np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32),
                    (len(xs), 1))
        )
        hit = intersect(pack, o, d)
        v = np.asarray(hit.valid)
        # the fiber's top silhouette is continuous across the joint:
        # every ray over the polyline within the radius hits
        assert v[: len(xs) // 2].all()  # straight section
        assert v.sum() > 0.9 * len(xs)
        t = np.asarray(hit.t)[v]
        assert np.isfinite(t).all() and (t > 0).all()


def test_hair_exact_matches_tessellated_render():
    """The exact segment path and a fine tessellation converge to the
    same image (hair.cpp createTriMesh is the reference's own
    tessellated approximation of the same geometry)."""
    import tempfile

    from mitsuba_tpu.renderer import render
    from mitsuba_tpu.scene.xml_loader import load_scene_string

    pts = _helix(n=24, turns=2.0, r=0.4, h=1.2)
    with tempfile.TemporaryDirectory() as td:
        ph = os.path.join(td, "helix.hair")
        with open(ph, "w") as f:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")

        def scene(exact, sides=12):
            return load_scene_string(f"""
            <scene version="0.5.0">
              <integrator type="path">
                <integer name="maxDepth" value="3"/>
              </integrator>
              <sensor type="perspective">
                <float name="fov" value="40"/>
                <transform name="toWorld">
                  <lookat origin="0,-3,0.6" target="0,0,0.6" up="0,0,1"/>
                </transform>
                <sampler type="independent">
                  <integer name="sampleCount" value="32"/>
                </sampler>
                <film type="hdrfilm">
                  <integer name="width" value="48"/>
                  <integer name="height" value="48"/>
                  <rfilter type="box"/>
                </film>
              </sensor>
              <shape type="hair">
                <string name="filename" value="{ph}"/>
                <float name="radius" value="0.08"/>
                <boolean name="exact" value="{str(exact).lower()}"/>
                <integer name="sides" value="{sides}"/>
                <bsdf type="diffuse">
                  <rgb name="reflectance" value="0.7,0.5,0.3"/>
                </bsdf>
              </shape>
              <emitter type="constant">
                <rgb name="radiance" value="1,1,1"/>
              </emitter>
            </scene>""")

        a = np.asarray(render(scene(True), spp=32, seed=2))
        b = np.asarray(render(scene(False, sides=16), spp=32, seed=2))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # same silhouette and brightness (tessellation is inscribed, so
        # slightly thinner: loose pixel gate, tight global gate)
        assert abs(a.mean() - b.mean()) < 0.05 * max(a.mean(), b.mean())
        diff = np.abs(a - b).mean()
        assert diff < 0.08 * max(a.mean(), b.mean()) + 0.02, diff
