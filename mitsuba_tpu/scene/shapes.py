"""Shape plugins.

Each shape plugin turns `Properties` into host-side geometry:
triangle meshes (`MeshData`) and/or analytic spheres.  Analytic shapes
match the reference's object-space conventions:

* `rectangle`: the XY square spanning [-1,1]^2, normal +z
  (reference: src/shapes/rectangle.cpp:99-110)
* `cube`: [-1,1]^3 with per-face normals (src/shapes/cube.cpp:24-30)
* `disk`: unit radius in the XY plane (src/shapes/disk.cpp)
* `sphere`: `center`+`radius` params and/or toWorld
  (src/shapes/sphere.cpp:73-110) — kept analytic on device
* `cylinder`: p0/p1/radius, analytic open cylinder by default
  (src/shapes/cylinder.cpp); `exact=false` or anisotropic transforms
  tessellate
* `obj`/`ply`/`serialized`: file loaders (src/shapes/{obj.cpp,ply,serialized.cpp})
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.io.meshes import (
    MeshData,
    load_obj,
    load_ply,
    load_serialized,
)
from mitsuba_tpu.scene.registry import register


@dataclass
class SphereData:
    center: np.ndarray  # [3]
    radius: float
    flip_normals: bool = False


@dataclass
class CylData:
    """A batch of analytic cylinder segments (world space).

    The reference intersects true cylinder segments clipped by miter
    planes (src/shapes/hair.cpp HairKDTree::intersect:485-542,
    src/shapes/cylinder.cpp); a point q on the side wall is kept when
    (q - p0) . n0 >= 0 and (q - p1) . n1 <= 0."""

    p0: np.ndarray  # [S, 3] segment starts
    p1: np.ndarray  # [S, 3] segment ends
    n0: np.ndarray  # [S, 3] miter plane normal at p0 (along fiber)
    n1: np.ndarray  # [S, 3] miter plane normal at p1 (along fiber)
    radius: np.ndarray  # [S]
    flip_normals: bool = False


@dataclass
class ShapeInstance:
    """A shape plugin's output: world-space geometry + attachments."""

    meshes: list = field(default_factory=list)  # list[MeshData], world space
    spheres: list = field(default_factory=list)  # list[SphereData]
    cylinders: list = field(default_factory=list)  # list[CylData]
    bsdf = None  # set by the XML loader
    emitter = None
    interior_medium = None
    exterior_medium = None
    subsurface = None  # SubsurfaceRecord (dipole)
    animation = None  # [(time, Transform), ...] rigid keyframes
    deform_frames = None  # [[MeshData,...] per keyframe] (deformable)
    deform_times = None  # tuple of keyframe times
    id: str = ""


def _apply_transform(mesh: MeshData, t: Transform, flip: bool) -> MeshData:
    pos = t.transform_point_np(mesh.positions).astype(np.float32)
    nrm = mesh.normals
    if nrm is not None:
        nrm = t.transform_normal_np(nrm)
        ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = (nrm / np.maximum(ln, 1e-20)).astype(np.float32)
    idx = mesh.indices
    # a mirroring transform flips triangle orientation; re-wind so the
    # geometric normal matches the transformed shading normal
    if t.det3() < 0.0:
        idx = idx[:, ::-1].copy()
    if flip:
        idx = idx[:, ::-1].copy()
        if nrm is not None:
            nrm = -nrm
    return MeshData(
        positions=pos,
        indices=np.ascontiguousarray(idx),
        normals=nrm,
        texcoords=mesh.texcoords,
        colors=mesh.colors,
        face_normals=mesh.face_normals,
        name=mesh.name,
    )


def _base(props):
    to_world = props.get_transform("toWorld")
    flip = props.get_bool("flipNormals", False)
    return to_world, flip


class _ShapeBase:
    def __init__(self, props):
        self.props = props
        self.instance = ShapeInstance(id=props.id)
        self._build(props)
        self.instance.animation = props.get_animation("toWorld")

    def _build(self, props):
        raise NotImplementedError


@register("shape", "rectangle")
class RectangleShape(_ShapeBase):
    def _build(self, props):
        t, flip = _base(props)
        pos = np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
        )
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
        idx = np.array([[0, 1, 2], [2, 3, 0]], np.uint32)
        mesh = MeshData(pos, idx, nrm, uv)
        self.instance.meshes.append(_apply_transform(mesh, t, flip))


@register("shape", "cube")
class CubeShape(_ShapeBase):
    def _build(self, props):
        t, flip = _base(props)
        # 24 vertices (4 per face) so each face has its own normal/uv
        face_defs = [
            (np.array([0, -1, 0]), np.array([1, 0, 0]), np.array([0, 0, -1])),
            (np.array([0, 1, 0]), np.array([-1, 0, 0]), np.array([0, 0, -1])),
            (np.array([1, 0, 0]), np.array([0, 1, 0]), np.array([0, 0, -1])),
            (np.array([-1, 0, 0]), np.array([0, -1, 0]), np.array([0, 0, -1])),
            (np.array([0, 0, 1]), np.array([1, 0, 0]), np.array([0, -1, 0])),
            (np.array([0, 0, -1]), np.array([-1, 0, 0]), np.array([0, -1, 0])),
        ]
        pos, nrm, uv, idx = [], [], [], []
        for f, (n, u, v) in enumerate(face_defs):
            base = len(pos)
            for (a, b) in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                pos.append(n + a * u + b * v)
                nrm.append(n)
                uv.append([(a + 1) / 2, (b + 1) / 2])
            idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
        mesh = MeshData(
            np.asarray(pos, np.float32),
            np.asarray(idx, np.uint32),
            np.asarray(nrm, np.float32),
            np.asarray(uv, np.float32),
        )
        self.instance.meshes.append(_apply_transform(mesh, t, flip))


@register("shape", "disk")
class DiskShape(_ShapeBase):
    SEGMENTS = 64

    def _build(self, props):
        t, flip = _base(props)
        n = self.SEGMENTS
        ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
        rim = np.stack(
            [np.cos(ang), np.sin(ang), np.zeros(n)], axis=-1
        ).astype(np.float32)
        pos = np.concatenate([np.zeros((1, 3), np.float32), rim])
        nrm = np.tile(np.array([[0, 0, 1]], np.float32), (n + 1, 1))
        uv = np.concatenate(
            [np.array([[0.5, 0.5]], np.float32), (rim[:, :2] + 1) / 2]
        ).astype(np.float32)
        idx = np.array(
            [[0, 1 + i, 1 + (i + 1) % n] for i in range(n)], np.uint32
        )
        mesh = MeshData(pos, idx, nrm, uv)
        self.instance.meshes.append(_apply_transform(mesh, t, flip))


@register("shape", "sphere")
class SphereShape(_ShapeBase):
    def _build(self, props):
        center = props.get_point("center", np.zeros(3))
        radius = props.get_float("radius", 1.0)
        t = props.get_transform("toWorld")
        flip = props.get_bool("flipNormals", False)
        # compose: toWorld * translate(center) * scale(radius)
        # (reference sphere.cpp:108-112 folds center/radius into the
        #  object transform).  We only support uniform scale analytically.
        full = t * Transform.translate(*center) * Transform.scale(
            radius, radius, radius
        )
        lin = full.m[:3, :3]
        scales = np.linalg.norm(lin, axis=0)
        if np.allclose(scales, scales[0], rtol=1e-4):
            c = full.transform_point_np(np.zeros(3))
            self.instance.spheres.append(
                SphereData(
                    center=np.asarray(c, np.float32),
                    radius=float(scales[0]),
                    flip_normals=flip,
                )
            )
        else:
            # non-uniform scale: tessellate
            mesh = _uv_sphere(64, 32)
            self.instance.meshes.append(_apply_transform(mesh, full, flip))


def _uv_sphere(n_phi, n_theta) -> MeshData:
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi + 1)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    pos = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)],
        axis=-1,
    ).reshape(-1, 3)
    uv = np.stack([pp / (2 * np.pi), 1.0 - tt / np.pi], axis=-1).reshape(-1, 2)
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * (n_phi + 1) + j
            b = a + n_phi + 1
            idx += [[a, b, a + 1], [a + 1, b, b + 1]]
    return MeshData(
        pos.astype(np.float32),
        np.asarray(idx, np.uint32),
        pos.astype(np.float32),
        uv.astype(np.float32),
    )


def uniform_scale_of(t: Transform):
    """Return the uniform scale factor of t's linear part, or None if
    the scaling is anisotropic (analytic cylinders only survive
    similarity transforms)."""
    L = np.asarray(t.m, np.float64)[:3, :3]
    s = np.linalg.norm(L, axis=0)
    if np.max(s) - np.min(s) > 1e-5 * max(np.max(s), 1e-12):
        return None
    return float(s.mean())


@register("shape", "cylinder")
class CylinderShape(_ShapeBase):
    SEGMENTS = 64

    def _build(self, props):
        p0 = props.get_point("p0", np.array([0.0, 0.0, 0.0]))
        p1 = props.get_point("p1", np.array([0.0, 0.0, 1.0]))
        radius = props.get_float("radius", 1.0)
        t, flip = _base(props)
        scale = uniform_scale_of(t)
        if props.get_bool("exact", True) and scale is not None:
            # analytic open cylinder (reference src/shapes/cylinder.cpp
            # rayIntersect: infinite-cylinder quadratic + axial clip,
            # no end caps); clip planes are the perpendicular discs
            q0 = t.transform_point_np(p0[None])[0]
            q1 = t.transform_point_np(p1[None])[0]
            ax = q1 - q0
            ln = float(np.linalg.norm(ax))
            if ln > 1e-9:
                ax = ax / ln
                self.instance.cylinders.append(CylData(
                    p0=q0[None].astype(np.float32),
                    p1=q1[None].astype(np.float32),
                    n0=ax[None].astype(np.float32),
                    n1=ax[None].astype(np.float32),
                    radius=np.asarray([radius * scale], np.float32),
                    flip_normals=flip,
                ))
                return
        axis = p1 - p0
        length = np.linalg.norm(axis)
        z = axis / length
        x = np.cross([0.0, 1.0, 0.0], z)
        if np.linalg.norm(x) < 1e-6:
            x = np.cross([1.0, 0.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        n = self.SEGMENTS
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ring = (
            np.cos(ang)[:, None] * x[None, :]
            + np.sin(ang)[:, None] * y[None, :]
        )
        pos = np.concatenate(
            [p0[None] + radius * ring, p0[None] + axis[None] + radius * ring]
        ).astype(np.float32)
        nrm = np.concatenate([ring, ring]).astype(np.float32)
        uv = np.concatenate(
            [
                np.stack([ang / (2 * np.pi), np.zeros(n)], -1),
                np.stack([ang / (2 * np.pi), np.ones(n)], -1),
            ]
        ).astype(np.float32)
        idx = []
        for i in range(n):
            j = (i + 1) % n
            idx += [[i, n + i, n + j], [i, n + j, j]]
        mesh = MeshData(pos, np.asarray(idx, np.uint32), nrm, uv)
        self.instance.meshes.append(_apply_transform(mesh, t, flip))


class _FileShape(_ShapeBase):
    loader = None
    default_flip_tex = True

    def _build(self, props):
        filename = props.get_string("filename")
        t, flip = _base(props)
        face_normals = props.get_bool("faceNormals", False)
        meshes = self._load(props, filename)
        for mesh in meshes:
            if face_normals:
                mesh.normals = None
                mesh.face_normals = True
            self.instance.meshes.append(_apply_transform(mesh, t, flip))

    def _load(self, props, filename):
        raise NotImplementedError


@register("shape", "obj")
class ObjShape(_FileShape):
    def _load(self, props, filename):
        meshes = load_obj(props.resolve_path(filename))
        if props.get_bool("flipTexCoords", True):
            for mesh in meshes:
                if mesh.texcoords is not None:
                    mesh.texcoords = np.stack(
                        [mesh.texcoords[:, 0], 1.0 - mesh.texcoords[:, 1]],
                        axis=-1,
                    )
        return meshes


@register("shape", "ply")
class PlyShape(_FileShape):
    def _load(self, props, filename):
        return load_ply(props.resolve_path(filename))


@register("shape", "serialized")
class SerializedShape(_FileShape):
    def _load(self, props, filename):
        idx = props.get_int("shapeIndex", 0)
        return load_serialized(props.resolve_path(filename), idx)


@register("shape", "shapegroup")
class ShapeGroup(_ShapeBase):
    """Container for instancing (reference src/shapes/shapegroup.cpp).

    Round 1: instances are expanded (geometry duplicated) rather than
    traversed through a two-level BVH.
    """

    def _build(self, props):
        self.children = []  # filled by the XML loader


@register("shape", "instance")
class InstanceShape(_ShapeBase):
    def _build(self, props):
        self.to_world = props.get_transform("toWorld")
        self.group = None  # resolved by the XML loader


@register("shape", "deformable")
class DeformableShape(_ShapeBase):
    """reference: src/shapes/deformable.cpp — per-vertex keyframe
    animation.  Nested child shapes supply one mesh set per keyframe
    (identical topology); a ray at shutter time t intersects the
    linearly interpolated mesh between the bracketing frames.  The
    reference's 4D space-time kd-tree becomes per-segment masked brute
    force over the (accelerator-excluded) frame-0 rows
    (accel/intersect.py _deform_closest).  Shading normals come from
    frame 0, like rigid rotation keyframes (builder.py warning)."""

    def _build(self, props):
        import re as _re

        frames = []
        for _name, child in props.children:
            inst = getattr(child, "instance", None)
            if inst is not None and inst.meshes:
                frames.append(inst.meshes)
        if len(frames) < 2:
            raise ValueError(
                "deformable: needs >=2 nested keyframe shapes"
            )
        times_str = props.get_string("times", "")
        if times_str.strip():
            times = [
                float(x)
                for x in _re.split(r"[,;\s]+", times_str.strip())
                if x
            ]
        else:
            times = np.linspace(0.0, 1.0, len(frames)).tolist()
        if len(times) != len(frames):
            raise ValueError(
                "deformable: times count must match keyframe count"
            )
        sizes = [
            tuple(len(m.indices) for m in fs) for fs in frames
        ]
        if len(set(sizes)) != 1:
            raise ValueError(
                "deformable: keyframes must share topology"
            )
        self.instance.meshes = frames[0]
        self.instance.deform_frames = frames
        self.instance.deform_times = tuple(float(t) for t in times)


@register("shape", "heightfield")
class HeightfieldShape(_ShapeBase):
    """reference: src/shapes/heightfield.cpp — displaced [-1,1]^2 grid.

    The reference intersects the grid directly; here it tessellates to
    triangles at the texel resolution (capped)."""

    MAX_RES = 257

    def _build(self, props):
        t, flip = _base(props)
        scale = props.get_float("scale", 1.0)
        if "filename" in props:
            from mitsuba_tpu.io.images import read_image

            img, _ = read_image(props.resolve_path(props.get_string("filename")))
            hmap = np.asarray(img[..., 0], np.float32)
        else:
            hmap = np.zeros((2, 2), np.float32)
        hr, wr = hmap.shape
        # downsample to the cap with striding
        sy = max(1, hr // self.MAX_RES)
        sx = max(1, wr // self.MAX_RES)
        hmap = hmap[::sy, ::sx]
        hr, wr = hmap.shape
        xs = np.linspace(-1, 1, wr)
        ys = np.linspace(-1, 1, hr)
        X, Y = np.meshgrid(xs, ys)
        pos = np.stack([X, Y, hmap * scale], -1).reshape(-1, 3)
        uv = np.stack(
            [np.tile((xs + 1) / 2, hr), np.repeat((ys + 1) / 2, wr)], -1
        )
        idx = []
        for i in range(hr - 1):
            for j in range(wr - 1):
                a = i * wr + j
                idx += [[a, a + 1, a + wr], [a + 1, a + wr + 1, a + wr]]
        mesh = MeshData(
            pos.astype(np.float32),
            np.asarray(idx, np.uint32),
            None,
            uv.astype(np.float32),
        )
        self.instance.meshes.append(_apply_transform(mesh, t, flip))
