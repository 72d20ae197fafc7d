"""Scene packing: host objects -> flat device arrays (`ScenePack`).

This is the TPU analogue of the reference's "resource" upload — the
Scheduler serializes the Scene once and shares it read-only with every
worker (reference: include/mitsuba/core/sched.h:384-403); here the scene
becomes a pytree of jnp arrays living in HBM, replicated across chips.

Everything dynamic is an array; everything structural (counts, which
material types exist, whether there is an env light) is static metadata
baked into the jit trace.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import os

import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.accel.bvh import build_bvh, LEAF_SIZE, BVH
from mitsuba_tpu.bsdf.plugins import (
    BSDFRecord,
    DIFFUSE,
    IRAWAN,
    MIXTURE,
    ROUGHCOATING,
    ROUGHCONDUCTOR,
    ROUGHDIELECTRIC,
    ROUGHPLASTIC,
)

# BSDF types whose lobes sample a microfacet normal (mf.sample_m) —
# drives the static mf_dists meta so absent distributions compile away
_MF_TYPES = (ROUGHCONDUCTOR, ROUGHDIELECTRIC, ROUGHPLASTIC,
             ROUGHCOATING)
from mitsuba_tpu.core.distribution import Distribution2D, build_alias
from mitsuba_tpu.emitter.plugins import (
    AREA,
    CONSTANT,
    ENVMAP,
    EmitterRecord,
)
from mitsuba_tpu.scene.textures import TEX_BITMAP, TEX_CONSTANT, TextureDesc

# primitives below this count use brute-force all-pairs intersection —
# fully vectorized, no gather-divergence; faster than BVH on TPU for
# small scenes (the cbox has ~36 triangles)
BRUTE_FORCE_MAX_TRIS = 512


@jax.tree_util.register_pytree_node_class
@dataclass
class ScenePack:
    arrays: dict
    meta: dict  # static (hashable) metadata

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (keys, tuple(sorted(self.meta.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, meta_items = aux
        return cls(dict(zip(keys, children)), dict(meta_items))

    def __getattr__(self, name):
        arrays = object.__getattribute__(self, "arrays")
        if name in arrays:
            return arrays[name]
        meta = object.__getattribute__(self, "meta")
        if name in meta:
            return meta[name]
        raise AttributeError(name)


MAX_MIP_LEVELS = 12  # 2048x2048 down to 1x1


def _downsample2(img):
    """2x2 box average (odd edges repeat; reference mipmap.h resample)."""
    h, w, c = img.shape
    if h > 1 and h % 2:
        img = np.concatenate([img, img[-1:]], axis=0)
        h += 1
    if w > 1 and w % 2:
        img = np.concatenate([img, img[:, -1:]], axis=1)
        w += 1
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    if h > 1:
        img = img.reshape(nh, 2, w, c).mean(axis=1)
    if w > 1:
        img = img.reshape(nh, nw, 2, c).mean(axis=2)
    return img


def _mip_chain(img):
    levels = [np.asarray(img, np.float32)]
    while (
        max(levels[-1].shape[:2]) > 1 and len(levels) < MAX_MIP_LEVELS
    ):
        levels.append(_downsample2(levels[-1]))
    return levels


def _pack_textures(textures: list[TextureDesc]):
    """Shelf-pack all bitmap textures AND their mip pyramids into one
    atlas; procedural textures keep only params (reference mipmap.h
    MIPMap pyramid; EWA reduces to trilinear here because the wavefront
    tracks an isotropic ray-cone footprint).  Returns arrays dict."""
    n = max(len(textures), 1)
    tex_type = np.zeros(n, np.int32)
    tex_c0 = np.zeros((n, 3), np.float32)
    tex_c1 = np.ones((n, 3), np.float32)
    tex_scale = np.ones((n, 3), np.float32)
    tex_uv = np.tile(
        np.array([1.0, 1.0, 0.0, 0.0], np.float32), (n, 1)
    )  # uscale, vscale, uoffset, voffset
    tex_rect = np.zeros((n, 4), np.int32)  # x, y, w, h (level 0)
    tex_mip_rect = np.zeros((n, MAX_MIP_LEVELS, 4), np.int32)
    tex_n_lev = np.ones(n, np.int32)
    tex_lw = np.full(n, 0.01, np.float32)
    tex_nearest = np.zeros(n, np.int32)

    bitmaps = [
        (i, t) for i, t in enumerate(textures) if t.kind == TEX_BITMAP
    ]
    atlas = np.zeros((1, 1, 3), np.float32)
    if bitmaps:
        items = []  # (tex idx, level, image)
        for i, t in bitmaps:
            for lvl, im in enumerate(_mip_chain(t.image)):
                items.append((i, lvl, im))
        # shelf packing, sorted by height
        items.sort(key=lambda it: -it[2].shape[0])
        max_w = max(max(im.shape[1] for _, _, im in items), 1)
        atlas_w = max(1 << int(np.ceil(np.log2(max_w))), 64)
        x = y = shelf_h = 0
        places = {}
        for i, lvl, im in items:
            h, w = im.shape[:2]
            if x + w > atlas_w:
                y += shelf_h
                x = 0
                shelf_h = 0
            places[(i, lvl)] = (x, y, w, h)
            shelf_h = max(shelf_h, h)
            x += w
        atlas_h = y + shelf_h
        atlas = np.zeros((atlas_h, atlas_w, 3), np.float32)
        for i, lvl, im in items:
            px, py, w, h = places[(i, lvl)]
            atlas[py : py + h, px : px + w] = im
            tex_mip_rect[i, lvl] = [px, py, w, h]
            if lvl == 0:
                tex_rect[i] = [px, py, w, h]
            tex_n_lev[i] = max(tex_n_lev[i], lvl + 1)
        # clamp out-of-range levels to the coarsest valid one
        for i, t in bitmaps:
            for lvl in range(tex_n_lev[i], MAX_MIP_LEVELS):
                tex_mip_rect[i, lvl] = tex_mip_rect[i, tex_n_lev[i] - 1]

    for i, t in enumerate(textures):
        tex_type[i] = t.kind
        tex_c0[i] = t.color0
        tex_c1[i] = t.color1
        tex_scale[i] = t.scale
        tex_uv[i] = [*t.uv_scale, *t.uv_offset]
        tex_lw[i] = t.line_width
        tex_nearest[i] = int(t.filter_nearest)

    return {
        "tex_type": tex_type,
        "tex_c0": tex_c0,
        "tex_c1": tex_c1,
        "tex_scale": tex_scale,
        "tex_uv": tex_uv,
        "tex_rect": tex_rect,
        "tex_mip_rect": tex_mip_rect,
        "tex_n_lev": tex_n_lev,
        "tex_lw": tex_lw,
        "tex_nearest": tex_nearest,
        "tex_atlas": atlas,
    }


def _cam_tan_half(scene):
    """tan(xfov/2) of the scene camera (0 when absent) — screen
    projection for the motion-vector integrator."""
    try:
        import math as _math

        return float(_math.tan(
            _math.radians(scene.sensor.record.xfov_deg) / 2.0
        ))
    except (AttributeError, TypeError):
        return 0.0


def _cam_film(scene):
    try:
        f = scene.sensor.record.film
        return (int(f.width), int(f.height))
    except (AttributeError, TypeError):
        return (1, 1)


def _cam_w2c(scene):
    try:
        return np.asarray(
            scene.sensor.record.to_world.inv, np.float32
        )
    except (AttributeError, TypeError):
        return np.eye(4, dtype=np.float32)


def _cam_pix_angle(scene):
    """Per-pixel ray-cone angle of the scene camera (radians); the
    texture-LOD footprint driver (reference mipmap.h eval(..., d0, d1)
    gets ray differentials; the wavefront carries an isotropic cone)."""
    try:
        cam = scene.sensor.record
        import math as _math

        tan_half = _math.tan(_math.radians(cam.xfov_deg) / 2.0)
        return float(2.0 * tan_half / max(cam.film.width, 1))
    except (AttributeError, TypeError):
        return 0.0


def _vertex_curvatures(mesh):
    """Discrete per-vertex (mean H, Gaussian K) curvature estimates:
    angle-deficit Gaussian and cotangent-Laplacian mean over the
    one-ring, with barycentric (area/3) vertex areas — the mesh
    analogue of the reference's differential-geometry getCurvature
    (reference src/librender/shape.cpp; visualized by
    src/textures/curvature.cpp)."""
    p_raw = np.asarray(mesh.positions, np.float64)
    idx_raw = np.asarray(mesh.indices, np.int64)
    # weld positional duplicates (uv seams / pole fans duplicate
    # vertices, which would leave open one-rings and blow up the
    # angle-deficit estimate)
    key = np.round(p_raw * 1e6).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    p = p_raw[uniq_idx]
    idx = inv[idx_raw]
    nv = len(p)
    a, b, c = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    area2 = np.linalg.norm(np.cross(b - a, c - a), axis=-1)  # 2*area
    area2 = np.maximum(area2, 1e-20)

    angle_sum = np.zeros(nv)
    varea = np.zeros(nv)
    lap = np.zeros((nv, 3))

    def corner(vi, e1, e2, vj, vk):
        """Angle at vi between e1, e2; cot weights onto the two edges."""
        l1 = np.linalg.norm(e1, axis=-1)
        l2 = np.linalg.norm(e2, axis=-1)
        cosang = np.clip(
            np.sum(e1 * e2, axis=-1) / np.maximum(l1 * l2, 1e-20), -1, 1
        )
        ang = np.arccos(cosang)
        np.add.at(angle_sum, vi, ang)
        # cot of THIS corner weights the OPPOSITE edge (vj, vk)
        cot = cosang / np.maximum(np.sqrt(1.0 - cosang * cosang), 1e-6)
        np.add.at(lap, vj, 0.5 * cot[:, None] * (p[vk] - p[vj]))
        np.add.at(lap, vk, 0.5 * cot[:, None] * (p[vj] - p[vk]))

    i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
    corner(i0, b - a, c - a, i1, i2)
    corner(i1, a - b, c - b, i0, i2)
    corner(i2, a - c, b - c, i0, i1)
    third = (area2 / 6.0)[:, None]
    for col in (i0, i1, i2):
        np.add.at(varea, col, third[:, 0])
    varea = np.maximum(varea, 1e-20)

    kg = (2.0 * np.pi - angle_sum) / varea
    # sign of H: positive where the Laplacian points against the normal
    # (convex regions under outward normals); area-weighted face
    # normals on the welded mesh
    n = np.zeros((nv, 3))
    fn = np.cross(b - a, c - a)
    for col in (i0, i1, i2):
        np.add.at(n, col, fn)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    h_mag = 0.5 * np.linalg.norm(lap, axis=-1) / varea
    sign = -np.sign(np.sum(lap * n, axis=-1))
    kh = sign * h_mag
    # map back to the original (unwelded) vertex indexing
    return kh[inv].astype(np.float32), kg[inv].astype(np.float32)


def _expand_mixtures(rec: BSDFRecord) -> list[BSDFRecord]:
    if rec.type == MIXTURE:
        out = []
        for c in rec.children:
            out.extend(_expand_mixtures(c))
        return out
    return [rec]


def pack_scene(scene) -> ScenePack:
    """scene: SceneDescription from the XML loader (or built in Python)."""
    # ---------------- materials + textures ----------------
    default_bsdf = BSDFRecord(type=DIFFUSE)
    materials: list[BSDFRecord] = []
    mat_index: dict[int, int] = {}
    textures: list[TextureDesc] = []
    tex_index: dict[int, int] = {}

    def add_texture(t: TextureDesc | None) -> int:
        if t is None:
            return -1
        key = id(t)
        if key not in tex_index:
            tex_index[key] = len(textures)
            textures.append(t)
        return tex_index[key]

    def add_material(rec: BSDFRecord | None) -> int:
        if rec is None:
            rec = default_bsdf
        key = id(rec)
        if key not in mat_index:
            mat_index[key] = len(materials)
            materials.append(rec)
        return mat_index[key]

    # ---------------- emitters ----------------
    emitters: list[EmitterRecord] = list(scene.emitters)
    _em_ids = {id(r): i for i, r in enumerate(emitters)}

    def add_emitter(rec: EmitterRecord | None) -> int:
        if rec is None:
            return -1
        if id(rec) not in _em_ids:
            _em_ids[id(rec)] = len(emitters)
            emitters.append(rec)
        return _em_ids[id(rec)]

    # ---------------- flatten geometry ----------------
    # ---------------- media ----------------
    media: list = []
    _med_ids = {}

    def add_medium(rec) -> int:
        if rec is None:
            return -1
        if id(rec) not in _med_ids:
            _med_ids[id(rec)] = len(media)
            media.append(rec)
        return _med_ids[id(rec)]

    v0s, e1s, e2s = [], [], []
    n0s, n1s, n2s = [], [], []
    uv0s, uv1s, uv2s = [], [], []
    c0s, c1s, c2s = [], [], []  # per-corner vertex colors
    geom_meshes = []  # meshes in triangle order (curvature estimation)
    tmats, temits = [], []
    tmed_in, tmed_ex = [], []
    spheres = []
    cyls = []  # (CylData, mat_id) — analytic miter-clipped segments

    # subsurface (dipole) objects: sampled point sets + the material
    # rows that reference them (reference dipole.cpp:preprocess)
    sss_objs = []  # (record, pts, nrm, area_per_pt)
    sss_mat_rows = []  # (mat_row, sss_id)

    # animated instances (>=2 keyframes) go LAST: their triangle rows
    # are excluded from the static accelerators and intersected by the
    # per-ray animated path (accel/intersect.py; reference
    # sahkdtree4.h's 4D tree is replaced by per-shape relative-motion
    # ray transforms)
    _insts = list(scene.shapes)
    _deform_i = [
        i for i in _insts if getattr(i, "deform_frames", None)
    ]
    _deform_ids = {id(i) for i in _deform_i}
    _static_i = [
        i for i in _insts
        if id(i) not in _deform_ids
        and (not getattr(i, "animation", None) or len(i.animation) < 2)
    ]
    _static_ids = {id(i) for i in _static_i}
    _anim_i = [
        i for i in _insts
        if id(i) not in _static_ids and id(i) not in _deform_ids
    ]
    _anim_ids = {id(i) for i in _anim_i}
    _deform_marks = {}
    _row_cursor = [0]
    anim_ranges = []
    anim_m1 = []

    # ---- instancing: expand small totals flat; above the threshold
    # the group templates pack once (LAST, excluded from all static
    # accelerators) and instances go through the two-level TLAS
    # (accel/tlas.py; reference shapegroup.h:34 + instance.cpp) ----
    _tmpl_children = []
    _tmpl_ids = set()
    _tmpl_marks = {}
    inst_defer = []  # (group_key, [children], [Transform, ...])
    if getattr(scene, "instances", None):
        from mitsuba_tpu.scene.shapes import (
            ShapeInstance,
            SphereData,
            _apply_transform,
        )

        by_group: dict = {}
        for key, t in scene.instances:
            by_group.setdefault(key, []).append(t)
        expand_max = int(
            os.environ.get("MTS_INSTANCE_EXPAND_MAX", "100000")
        )
        total_extra = sum(
            len(ts) * sum(
                len(s.meshes[k_].indices)
                for s in scene.shape_groups[key]
                for k_ in range(len(s.meshes))
            )
            for key, ts in by_group.items()
        )
        if total_extra <= expand_max:
            for key, ts in by_group.items():
                for t in ts:
                    for src in scene.shape_groups[key]:
                        out = ShapeInstance(id=src.id)
                        out.bsdf = src.bsdf
                        out.emitter = src.emitter
                        out.interior_medium = src.interior_medium
                        out.exterior_medium = src.exterior_medium
                        out.subsurface = src.subsurface
                        for mesh in src.meshes:
                            out.meshes.append(
                                _apply_transform(mesh, t, False)
                            )
                        for sph in src.spheres:
                            out.spheres.append(SphereData(
                                center=t.transform_point_np(
                                    sph.center
                                ).astype(np.float32),
                                radius=sph.radius,
                                flip_normals=sph.flip_normals,
                            ))
                        _static_i.append(out)
        else:
            for key, ts in by_group.items():
                children = scene.shape_groups[key]
                for src in children:
                    if (
                        src.emitter is not None
                        or src.interior_medium is not None
                        or src.exterior_medium is not None
                        or getattr(src, "subsurface", None) is not None
                        or src.spheres
                    ):
                        raise ValueError(
                            "instanced shapegroup (above "
                            "MTS_INSTANCE_EXPAND_MAX) supports plain "
                            "surface meshes only — no emitters, media, "
                            "subsurface, or spheres"
                        )
                inst_defer.append((key, children, ts))
                for src in children:
                    _tmpl_children.append(src)
                    _tmpl_ids.add(id(src))

    for inst in _static_i + _anim_i + _deform_i + _tmpl_children:
        _anim_start = _row_cursor[0]
        if getattr(inst, "subsurface", None) is not None:
            import copy

            from mitsuba_tpu.scene.subsurface import sample_surface_points

            # clone the BSDF record so this shape gets its own material
            # row (mat_sss is per row); no BSDF -> all-absorbing diffuse
            # (reference shape.cpp:49-56 configure())
            if inst.bsdf is not None:
                bsdf_rec = copy.copy(inst.bsdf)
            else:
                bsdf_rec = BSDFRecord(
                    type=DIFFUSE, cA=np.zeros(3, np.float32)
                )
            mat_id = add_material(bsdf_rec)
            pts, nrm, a_pt, capped = sample_surface_points(
                inst.meshes, inst.spheres, inst.subsurface
            )
            if capped:
                from mitsuba_tpu.core.logging import logger

                logger.warn(
                    "subsurface: point density capped at "
                    "MTS_SSS_MAX_POINTS samples for shape "
                    f"'{inst.id}' (raise the env knob for a denser "
                    "cache)"
                )
            sss_mat_rows.append((mat_id, len(sss_objs)))
            sss_objs.append((inst.subsurface, pts, nrm, a_pt))
        else:
            mat_id = add_material(inst.bsdf)
        emit_id = add_emitter(inst.emitter)
        med_in = add_medium(inst.interior_medium)
        med_ex = add_medium(inst.exterior_medium)

        meshes = list(inst.meshes)
        sphs = list(inst.spheres)
        if emit_id >= 0 and sphs:
            # tessellate emissive spheres so area sampling stays
            # triangle-only (solid-angle cone sampling planned)
            from mitsuba_tpu.scene.shapes import _uv_sphere, _apply_transform
            from mitsuba_tpu.core.transform import Transform

            base = _uv_sphere(32, 16)
            # Area-preserving radius correction: the inscribed polyhedron
            # has slightly less surface area than the analytic sphere the
            # reference samples, which would dim the light by the same
            # fraction (radiance is per-area).  Scale the radius so the
            # tessellated area equals 4*pi*r^2 (ADVICE r1).
            bp = base.positions
            bi = base.indices.astype(np.int64)
            e1 = bp[bi[:, 1]] - bp[bi[:, 0]]
            e2 = bp[bi[:, 2]] - bp[bi[:, 0]]
            a_unit = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
            corr = float(np.sqrt(4.0 * np.pi / a_unit))
            for s in sphs:
                rr = s.radius * corr
                t = Transform.translate(*s.center) * Transform.scale(
                    rr, rr, rr
                )
                meshes.append(_apply_transform(base, t, s.flip_normals))
            sphs = []

        for s in sphs:
            spheres.append((s, mat_id, emit_id, med_in, med_ex))

        for cy in getattr(inst, "cylinders", ()) or ():
            if emit_id >= 0 or med_in >= 0 or med_ex >= 0 or (
                getattr(inst, "subsurface", None) is not None
            ):
                raise ValueError(
                    "analytic cylinder segments support plain surface "
                    "BSDFs only — set exact=false on the shape to "
                    "tessellate for emitters/media/subsurface"
                )
            cyls.append((cy, mat_id))

        for mesh in meshes:
            p = mesh.positions
            i = mesh.indices.astype(np.int64)
            a, b, c = p[i[:, 0]], p[i[:, 1]], p[i[:, 2]]
            v0s.append(a)
            e1s.append(b - a)
            e2s.append(c - a)
            gn = np.cross(b - a, c - a)
            gl = np.linalg.norm(gn, axis=-1, keepdims=True)
            gn = gn / np.maximum(gl, 1e-20)
            if mesh.normals is not None and not mesh.face_normals:
                nr = mesh.normals
                n0s.append(nr[i[:, 0]])
                n1s.append(nr[i[:, 1]])
                n2s.append(nr[i[:, 2]])
            else:
                n0s.append(gn)
                n1s.append(gn)
                n2s.append(gn)
            if mesh.texcoords is not None:
                uv = mesh.texcoords
                uv0s.append(uv[i[:, 0]])
                uv1s.append(uv[i[:, 1]])
                uv2s.append(uv[i[:, 2]])
            else:
                z = np.zeros((len(i), 2), np.float32)
                uv0s.append(z)
                uv1s.append(z)
                uv2s.append(z)
            tmats.append(np.full(len(i), mat_id, np.int32))
            temits.append(np.full(len(i), emit_id, np.int32))
            tmed_in.append(np.full(len(i), med_in, np.int32))
            tmed_ex.append(np.full(len(i), med_ex, np.int32))
            _row_cursor[0] += len(i)
            # per-corner colors (vertexcolors texture) + deferred mesh
            # reference for curvature estimation (geom textures)
            if mesh.colors is not None:
                col = np.asarray(mesh.colors, np.float32)
                c0s.append(col[i[:, 0]])
                c1s.append(col[i[:, 1]])
                c2s.append(col[i[:, 2]])
            else:
                o3 = np.ones((len(i), 3), np.float32)
                c0s.append(o3)
                c1s.append(o3)
                c2s.append(o3)
            geom_meshes.append(mesh)

        if id(inst) in _anim_ids:
            kf = inst.animation
            t0_m = np.asarray(kf[0][1].m, np.float64)
            t1_m = np.asarray(kf[-1][1].m, np.float64)
            # relative motion M1 = A(t_end) A(t_0)^-1 in the baked
            # keyframe-0 world frame; per-ray affine lerp I -> M1
            # (exact for translations, chordal for rotations)
            m_rel = (t1_m @ np.linalg.inv(t0_m))[:3, :]
            rot_part = m_rel[:3, :3] - np.eye(3)
            if np.abs(rot_part - np.diag(np.diag(rot_part))).max() > 1e-5:
                from mitsuba_tpu.core.logging import logger

                logger.warn(
                    f"animated shape '{inst.id}': rotation keyframes "
                    "use chordal matrix interpolation and frame-0 "
                    "shading normals (translation/scale are exact)"
                )
            if emit_id >= 0:
                from mitsuba_tpu.core.logging import logger

                logger.warn(
                    f"animated shape '{inst.id}': area emission is "
                    "sampled at keyframe 0 (moving-emitter NEE planned)"
                )
            anim_ranges.append(
                (int(_anim_start), int(_row_cursor[0] - _anim_start))
            )
            # layout: 9 linear-part entries (row-major 3x3) + 3
            # translation entries (accel/intersect._anim_ray)
            anim_m1.append(np.concatenate(
                [m_rel[:, :3].reshape(-1), m_rel[:, 3]]
            ).astype(np.float32))
        if id(inst) in _tmpl_ids:
            _tmpl_marks[id(inst)] = (int(_anim_start), int(_row_cursor[0]))
        if id(inst) in _deform_ids:
            _deform_marks[id(inst)] = (
                int(_anim_start), int(_row_cursor[0])
            )

    def cat(parts, shape_tail, dtype=np.float32):
        if parts:
            return np.concatenate(parts).astype(dtype)
        return np.zeros((0,) + shape_tail, dtype)

    tri_v0 = cat(v0s, (3,))
    tri_e1 = cat(e1s, (3,))
    tri_e2 = cat(e2s, (3,))
    tri_n0 = cat(n0s, (3,))
    tri_n1 = cat(n1s, (3,))
    tri_n2 = cat(n2s, (3,))
    tri_uv0 = cat(uv0s, (2,))
    tri_uv1 = cat(uv1s, (2,))
    tri_uv2 = cat(uv2s, (2,))
    tri_mat = cat(tmats, (), np.int32)
    tri_emit = cat(temits, (), np.int32)
    tri_med_in = cat(tmed_in, (), np.int32)
    tri_med_ex = cat(tmed_ex, (), np.int32)
    n_tris = len(tri_v0)
    n_anim_tris = sum(c for _, c in anim_ranges)
    n_tmpl_tris = sum(e - s for s, e in _tmpl_marks.values())
    n_deform_tris = sum(e - s for s, e in _deform_marks.values())
    n_static = n_tris - n_anim_tris - n_tmpl_tris - n_deform_tris

    # deformable keyframe stacks [K, T, 9] per range (reference
    # deformable.cpp SpaceTimeKDTree; intersected by per-segment masked
    # brute force, accel/intersect.py)
    deform_arrays: dict = {}
    deform_ranges = []
    for r, inst in enumerate(_deform_i):
        s_, e_ = _deform_marks[id(inst)]
        stack = []
        for fs in inst.deform_frames:
            v0l_, e1l_, e2l_ = [], [], []
            for mesh in fs:
                p_ = mesh.positions
                i_ = mesh.indices.astype(np.int64)
                a_, b_, c_ = p_[i_[:, 0]], p_[i_[:, 1]], p_[i_[:, 2]]
                v0l_.append(a_)
                e1l_.append(b_ - a_)
                e2l_.append(c_ - a_)
            stack.append(np.concatenate(
                [np.concatenate(v0l_), np.concatenate(e1l_),
                 np.concatenate(e2l_)], axis=-1,
            ).astype(np.float32))
        deform_arrays[f"deform_tri9_{r}"] = np.stack(stack)
        deform_ranges.append((s_, e_ - s_, inst.deform_times))
        if inst.emitter is not None:
            from mitsuba_tpu.core.logging import logger

            logger.warn(
                f"deformable '{inst.id}': area emission is sampled at "
                "keyframe 0"
            )

    # geometry-driven textures (vertexcolors / wireframe / curvature):
    # per-corner attribute columns, packed only when the scene uses them
    from mitsuba_tpu.scene.textures import (
        TEX_CURVATURE,
        TEX_VERTEXCOLORS,
        TEX_WIREFRAME,
    )

    # the texture TABLE fills later (material-table loop); scan the
    # material records' texture descriptors directly here
    def _mat_tex_descs():
        out = []
        stack = list(materials)
        while stack:
            rec = stack.pop()
            for f in ("texA", "tex_opacity", "tex_bump"):
                t = getattr(rec, f, None)
                if t is not None:
                    out.append(t)
            stack.extend(getattr(rec, "children", None) or [])
        return out

    _descs = _mat_tex_descs()
    geom_tex_kinds = tuple(sorted({
        t.kind for t in _descs
        if t.kind in (TEX_VERTEXCOLORS, TEX_WIREFRAME, TEX_CURVATURE)
    }))
    need_vc = TEX_VERTEXCOLORS in geom_tex_kinds
    need_kv = TEX_CURVATURE in geom_tex_kinds
    tri_c0 = cat(c0s, (3,)) if need_vc else None
    tri_c1 = cat(c1s, (3,)) if need_vc else None
    tri_c2 = cat(c2s, (3,)) if need_vc else None
    if need_kv:
        kh_parts, kg_parts = [], []
        for mesh in geom_meshes:
            kh, kg = _vertex_curvatures(mesh)
            i = mesh.indices.astype(np.int64)
            kh_parts.append(kh[i])  # [T, 3]
            kg_parts.append(kg[i])
        tri_kh = cat(kh_parts, (3,))
        tri_kg = cat(kg_parts, (3,))
    else:
        tri_kh = tri_kg = None
    if TEX_WIREFRAME in geom_tex_kinds:
        # automatic lineWidth = 10% of the mean edge length
        # (reference wireframe.cpp:90-105)
        el = (
            np.linalg.norm(tri_e1, axis=-1)
            + np.linalg.norm(tri_e2, axis=-1)
            + np.linalg.norm(tri_e2 - tri_e1, axis=-1)
        )
        auto_lw = 0.1 * float(el.mean()) / 3.0 if n_tris else 0.01
        for t in _descs:
            if t.kind == TEX_WIREFRAME and t.line_width <= 0.0:
                t.line_width = auto_lw

    # ---------------- BVH (STATIC triangles only) ----------------
    use_bvh = n_static > BRUTE_FORCE_MAX_TRIS
    if use_bvh:
        sv0 = tri_v0[:n_static]
        se1 = tri_e1[:n_static]
        se2 = tri_e2[:n_static]
        lo = np.minimum(sv0, np.minimum(sv0 + se1, sv0 + se2))
        hi = np.maximum(sv0, np.maximum(sv0 + se1, sv0 + se2))
        centroids = sv0 + (se1 + se2) / 3.0
        bvh = build_bvh(centroids, lo, hi)
        perm = bvh.order

        def permcat(a):
            # permute the static prefix, keep animated rows in place
            return np.concatenate([a[:n_static][perm], a[n_static:]])

        (tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
         tri_uv0, tri_uv1, tri_uv2, tri_mat, tri_emit,
         tri_med_in, tri_med_ex) = (
            permcat(a) for a in (
                tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
                tri_uv0, tri_uv1, tri_uv2, tri_mat, tri_emit,
                tri_med_in, tri_med_ex)
        )
        if tri_c0 is not None:
            tri_c0, tri_c1, tri_c2 = (
                permcat(a) for a in (tri_c0, tri_c1, tri_c2)
            )
        if tri_kh is not None:
            tri_kh, tri_kg = permcat(tri_kh), permcat(tri_kg)
    else:
        bvh = BVH(
            lo=np.zeros((1, 3), np.float32),
            hi=np.zeros((1, 3), np.float32),
            skip=np.ones(1, np.int32),
            first=np.zeros(1, np.int32),
            count=np.zeros(1, np.int32),
            order=np.arange(n_tris, dtype=np.int32),
        )

    # transposed triangle pack for the Pallas brute-force kernels
    from mitsuba_tpu.accel.pallas_kernels import (
        pack_triangles_sublane,
        pack_triangles_transposed,
    )

    tri_t = pack_triangles_transposed(tri_v0, tri_e1, tri_e2, n_static)
    tri_s = pack_triangles_sublane(tri_v0, tri_e1, tri_e2, n_static)

    # row-packed BVH nodes + triangles: ONE gather per traversal step /
    # leaf visit instead of 5 / 3 (TPU gathers are ~1000-flop expensive);
    # nodes come in 8 direction-octant-ordered layouts (see bvh.py)
    from mitsuba_tpu.accel.bvh import octant_node_rows

    bvh_nodes, bvh_n_layouts = octant_node_rows(bvh)

    # pad triangles so leaf gathers of LEAF_SIZE never go out of bounds
    pad = LEAF_SIZE
    def pad_tri(a, fill=0.0):
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    tri_v0 = pad_tri(tri_v0, 1e30)  # far away -> never hit
    tri_e1 = pad_tri(tri_e1)
    tri_e2 = pad_tri(tri_e2)
    tri_n0 = pad_tri(tri_n0)
    tri_n1 = pad_tri(tri_n1)
    tri_n2 = pad_tri(tri_n2)
    tri_uv0 = pad_tri(tri_uv0)
    tri_uv1 = pad_tri(tri_uv1)
    tri_uv2 = pad_tri(tri_uv2)
    tri_mat = pad_tri(tri_mat)
    tri_emit = pad_tri(tri_emit, -1)
    tri_med_in = pad_tri(tri_med_in, -1)
    tri_med_ex = pad_tri(tri_med_ex, -1)
    geom_tex_arrays = {}
    if tri_c0 is not None:
        geom_tex_arrays.update(
            tri_c0=pad_tri(tri_c0, 1.0), tri_c1=pad_tri(tri_c1, 1.0),
            tri_c2=pad_tri(tri_c2, 1.0),
        )
    if tri_kh is not None:
        geom_tex_arrays.update(
            tri_kh=pad_tri(tri_kh), tri_kg=pad_tri(tri_kg)
        )

    # row-packed triangle geometry (see bvh_nodes above)
    tri9 = np.concatenate([tri_v0, tri_e1, tri_e2], axis=1).astype(
        np.float32
    )  # [Tp, 9]

    # treelet clusters for the Pallas packet-traversal kernel
    # (accel/clusters.py; requires the padded far triangle at n_tris)
    cluster_arrays: dict = {}
    cluster_meta: dict = {}
    if use_bvh:
        from mitsuba_tpu.accel.clusters import pack_clusters

        cl = pack_clusters(bvh, tri_v0, tri_e1, tri_e2, n_tris)
        if cl is not None:
            cluster_arrays, cluster_meta = cl

    # two-level instancing: TLAS + per-instance BLAS splice over the
    # template rows (accel/tlas.py).  Template ranges sit past
    # n_static + anim so neither permcat nor the static accelerators
    # touch them.
    inst_arrays: dict = {}
    inst_meta: dict = {"has_instances": False, "n_instances": 0}
    if inst_defer:
        from mitsuba_tpu.accel.tlas import build_instance_accel

        tlas_groups = []
        for key, children, ts in inst_defer:
            lo_r = min(_tmpl_marks[id(c)][0] for c in children)
            hi_r = max(_tmpl_marks[id(c)][1] for c in children)
            tlas_groups.append((lo_r, hi_r, ts))
        inst_arrays, inst_meta = build_instance_accel(
            tlas_groups, tri_v0, tri_e1, tri_e2
        )

    # UV-aligned tangent per triangle (dp/du, for bump/normal mapping —
    # reference intersection partials, trimesh.cpp getNormalDerivative)
    duv1 = tri_uv1 - tri_uv0
    duv2 = tri_uv2 - tri_uv0
    uv_det = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    safe = np.abs(uv_det) > 1e-12
    inv_det = np.where(safe, 1.0 / np.where(safe, uv_det, 1.0), 0.0)
    tri_dpdu = (
        tri_e1 * duv2[:, 1:2] - tri_e2 * duv1[:, 1:2]
    ) * inv_det[:, None]
    tri_dpdu = np.where(safe[:, None], tri_dpdu, tri_e1).astype(np.float32)
    tri_dpdv = (
        tri_e2 * duv1[:, 0:1] - tri_e1 * duv2[:, 0:1]
    ) * inv_det[:, None]
    tri_dpdv = np.where(safe[:, None], tri_dpdv, tri_e2).astype(np.float32)

    # ---------------- spheres ----------------
    n_sph = len(spheres)
    sph_center = np.zeros((max(n_sph, 1), 3), np.float32)
    sph_radius = np.zeros(max(n_sph, 1), np.float32)
    sph_mat = np.zeros(max(n_sph, 1), np.int32)
    sph_emit = np.full(max(n_sph, 1), -1, np.int32)
    sph_flip = np.zeros(max(n_sph, 1), np.float32)
    sph_med_in = np.full(max(n_sph, 1), -1, np.int32)
    sph_med_ex = np.full(max(n_sph, 1), -1, np.int32)
    for k, (s, m, e, mi, mx) in enumerate(spheres):
        sph_center[k] = s.center
        sph_radius[k] = s.radius
        sph_mat[k] = m
        sph_emit[k] = e
        sph_flip[k] = -1.0 if s.flip_normals else 1.0
        sph_med_in[k] = mi
        sph_med_ex[k] = mx

    # ---------------- analytic cylinder segments ----------------
    # miter-clipped cylinders (hair fibers / open cylinder shapes,
    # reference hair.cpp:485-542, cylinder.cpp); padded to a 128
    # multiple for the chunked intersector (accel/cyl.py)
    n_cyl = sum(len(cd.p0) for cd, _ in cyls)
    n_cyl_pad = max(-(-max(n_cyl, 1) // 128) * 128, 128)
    cyl_p0 = np.zeros((n_cyl_pad, 3), np.float32)
    cyl_p1 = np.tile(
        np.asarray([[0.0, 0.0, 1.0]], np.float32), (n_cyl_pad, 1)
    )
    cyl_n0 = np.tile(
        np.asarray([[0.0, 0.0, 1.0]], np.float32), (n_cyl_pad, 1)
    )
    cyl_n1 = np.tile(
        np.asarray([[0.0, 0.0, 1.0]], np.float32), (n_cyl_pad, 1)
    )
    cyl_rad = np.zeros(n_cyl_pad, np.float32)  # 0 radius = padding
    cyl_mat = np.zeros(n_cyl_pad, np.int32)
    cyl_flip = np.ones(n_cyl_pad, np.float32)
    _cc = 0
    for cd, m in cyls:
        sn = len(cd.p0)
        cyl_p0[_cc:_cc + sn] = cd.p0
        cyl_p1[_cc:_cc + sn] = cd.p1
        cyl_n0[_cc:_cc + sn] = cd.n0
        cyl_n1[_cc:_cc + sn] = cd.n1
        cyl_rad[_cc:_cc + sn] = cd.radius
        cyl_mat[_cc:_cc + sn] = m
        cyl_flip[_cc:_cc + sn] = -1.0 if cd.flip_normals else 1.0
        _cc += sn

    # ---------------- material table ----------------
    # expand mixtures into leaves (device-side 2-component mix planned;
    # round 1 uses the weighted-average leaf as approximation if needed)
    n_mat = max(len(materials), 1)
    mt = {
        "mat_type": np.zeros(n_mat, np.int32),
        "mat_cA": np.full((n_mat, 3), 0.5, np.float32),
        "mat_cB": np.ones((n_mat, 3), np.float32),
        "mat_cC": np.ones((n_mat, 3), np.float32),
        "mat_cD": np.zeros((n_mat, 3), np.float32),
        "mat_alpha_u": np.full(n_mat, 0.1, np.float32),
        "mat_alpha_v": np.full(n_mat, 0.1, np.float32),
        "mat_eta": np.full(n_mat, 1.5046, np.float32),
        "mat_disp": np.zeros(n_mat, np.float32),  # Cauchy B [um^2]
        "mat_exponent": np.full(n_mat, 30.0, np.float32),
        "mat_dist": np.zeros(n_mat, np.int32),
        "mat_nonlinear": np.zeros(n_mat, np.float32),
        "mat_twosided": np.zeros(n_mat, np.float32),
        "mat_fdr_int": np.zeros(n_mat, np.float32),
        "mat_spec_w": np.full(n_mat, 0.5, np.float32),
        "mat_opacity": np.ones((n_mat, 3), np.float32),
        "mat_texA": np.full(n_mat, -1, np.int32),
        "mat_tex_opacity": np.full(n_mat, -1, np.int32),
        "mat_tex_bump": np.full(n_mat, -1, np.int32),
        "mat_bump_nm": np.zeros(n_mat, np.float32),  # 1 = normal map
    }
    # mixture support: a MIXTURE row carries child A's params inline
    # plus (child-B row id, weight-A, weight-B).  N-ary mixtures (and
    # arbitrarily nested ones, reference mixturebsdf.cpp) flatten to
    # weighted leaves and pack as a CHAIN of rows: row_k holds leaf_k
    # inline and points at row_{k+1} with the renormalized tail weight,
    # so  f = w0 f0 + R1 (w1/R1 f1 + R2/R1 (...)) = sum w_k f_k  with
    # the absorbed deficit 1 - sum(w) only at the top level.
    import copy as _copy

    mix_rows = []  # top rows: (row_id, inline_rec, wa, b_id, wb)
    chain_ptrs = []  # interior rows: (row_id, wa, b_id, wb)
    mix_chain_depth = 0
    for i, rec in enumerate(list(materials)):
        if rec.type != MIXTURE:
            continue
        leaves = []

        def flatten(r, w):
            if r.type == MIXTURE:
                ws = r.weights or [1.0 / len(r.children)] * len(r.children)
                for c, cw in zip(r.children, ws):
                    flatten(c, w * cw)
            else:
                leaves.append((r, w))

        flatten(rec, 1.0)
        if any(r.type == IRAWAN for r, _ in leaves):
            raise ValueError(
                "irawan cannot be a mixture/blend component (its yarn "
                "lookup is keyed on the surface material row)"
            )
        leaves.sort(key=lambda lw: -lw[1])
        mix_chain_depth = max(mix_chain_depth, len(leaves) - 1)

        def chain(tail):
            """Register the tail [(rec, w), ...] as a row chain whose
            blended eval is sum(w_k f_k) / sum(w_k); returns row id."""
            r0, w0 = tail[0]
            row_rec = _copy.copy(r0)  # fresh identity: per-chain row
            rid = add_material(row_rec)
            if len(tail) > 1:
                tot = sum(wt for _, wt in tail)
                bid = chain(tail[1:])
                chain_ptrs.append(
                    (rid, w0 / tot, bid, (tot - w0) / tot)
                )
            return rid

        a_rec, w_a = leaves[0]
        if len(leaves) > 1:
            w_b = sum(wt for _, wt in leaves[1:])
            b_id = chain(leaves[1:])
        else:
            b_id, w_b = add_material(a_rec), 0.0
        mix_rows.append((i, a_rec, w_a, b_id, w_b))

    # coating rows: the nested BSDF rides in the mix-B slot so
    # texture_eval gathers its params as spB (bsdf/eval.py _coating_*)
    from mitsuba_tpu.bsdf.plugins import (
        COATING as _COATING,
        ROUGHCOATING as _RCOATING,
    )

    coat_rows = []
    for i, rec in enumerate(list(materials)):
        if rec.type in (_COATING, _RCOATING) and rec.children:
            if rec.children[0].type == IRAWAN:
                raise ValueError(
                    "irawan cannot be nested under a coating (its yarn "
                    "lookup is keyed on the surface material row)"
                )
            coat_rows.append((i, add_material(rec.children[0])))

    n_mat = max(len(materials), 1)  # add_material may have grown the list
    for key in list(mt):
        base_shape = mt[key].shape
        if base_shape[0] < n_mat:
            pad = n_mat - base_shape[0]
            mt[key] = np.concatenate(
                [mt[key], np.repeat(mt[key][-1:], pad, axis=0)]
            )
    mt["mat_mix_b"] = np.full(n_mat, -1, np.int32)
    mt["mat_mix_wa"] = np.ones(n_mat, np.float32)
    mt["mat_mix_wb"] = np.zeros(n_mat, np.float32)
    mix_lookup = {i: (a, wa, b, wb) for i, a, wa, b, wb in mix_rows}
    for i, b_id in coat_rows:
        mt["mat_mix_b"][i] = b_id
        mt["mat_mix_wa"][i] = 1.0
        mt["mat_mix_wb"][i] = 0.0
    for rid, wa, bid, wb in chain_ptrs:
        mt["mat_mix_b"][rid] = bid
        mt["mat_mix_wa"][rid] = wa
        mt["mat_mix_wb"][rid] = wb

    present_types = set()
    mf_dists = set()  # microfacet distributions actually in use
    for i, rec in enumerate(materials):
        if rec.type == MIXTURE:
            a_rec, w_a, b_id, w_b = mix_lookup[i]
            rec = a_rec
            mt["mat_mix_b"][i] = b_id
            mt["mat_mix_wa"][i] = w_a
            mt["mat_mix_wb"][i] = w_b
        present_types.add(rec.type)
        if rec.type in _MF_TYPES:
            mf_dists.add(int(rec.dist))
        mt["mat_type"][i] = rec.type
        mt["mat_cA"][i] = rec.cA
        mt["mat_cB"][i] = rec.cB
        mt["mat_cC"][i] = rec.cC
        mt["mat_cD"][i] = rec.cD
        mt["mat_alpha_u"][i] = rec.alpha_u
        mt["mat_alpha_v"][i] = rec.alpha_v
        mt["mat_eta"][i] = rec.eta
        mt["mat_disp"][i] = getattr(rec, "dispersion", 0.0)
        mt["mat_exponent"][i] = rec.exponent
        mt["mat_dist"][i] = rec.dist
        mt["mat_nonlinear"][i] = float(rec.nonlinear)
        mt["mat_twosided"][i] = float(rec.twosided)
        mt["mat_fdr_int"][i] = rec.fdr_int
        mt["mat_spec_w"][i] = rec.spec_sampling_weight
        if rec.opacity is not None:
            mt["mat_opacity"][i] = rec.opacity
        mt["mat_texA"][i] = add_texture(rec.texA)
        mt["mat_tex_opacity"][i] = add_texture(rec.tex_opacity)
        mt["mat_tex_bump"][i] = add_texture(rec.tex_bump)
        mt["mat_bump_nm"][i] = float(rec.bump_is_normalmap)

    # rough-transmittance tables for roughplastic (reference
    # include/mitsuba/render/rtrans.h:44-186): cubic-in-cos(theta) fit of
    # the external transmittance + internal diffuse reflectance, fitted
    # per unique (dist, alpha, eta) at pack time (bsdf/rtrans.py)
    mt["mat_rt"] = np.tile(
        np.array([0.0, 0.0, 0.0, 1.0], np.float32), (n_mat, 1)
    )
    mt["mat_rt_fdr"] = mt["mat_fdr_int"].copy()
    _needs_rt = (mt["mat_type"] == ROUGHPLASTIC) | (
        mt["mat_type"] == _RCOATING
    )
    if _needs_rt.any():
        from mitsuba_tpu.bsdf.rtrans import fit_rtrans_poly

        rt_cache = {}
        for i in np.nonzero(_needs_rt)[0]:
            key = (
                int(mt["mat_dist"][i]),
                round(max(float(mt["mat_alpha_u"][i]), 1e-3), 4),
                round(float(mt["mat_eta"][i]), 4),
            )
            if key not in rt_cache:
                c_ext, _ = fit_rtrans_poly(*key)
                _, tdiff_int = fit_rtrans_poly(key[0], key[1], 1.0 / key[2])
                rt_cache[key] = (c_ext, 1.0 - tdiff_int)
            mt["mat_rt"][i] = rt_cache[key][0]
            mt["mat_rt_fdr"][i] = rt_cache[key][1]

    # Irawan woven-cloth tables (reference src/bsdfs/irawan.cpp; the
    # weave pattern + yarn set become device gathers, bsdf/irawan.py —
    # texture_eval.shading_params resolves them per lane into sp["iw"])
    mt["mat_iw"] = np.full(n_mat, -1, np.int32)
    iw_entries = []
    for i, rec in enumerate(materials):
        if rec.type == IRAWAN and rec.weave is not None:
            mt["mat_iw"][i] = len(iw_entries)
            iw_entries.append(
                (rec.weave, rec.repeat_u, rec.repeat_v, rec.iw_norm)
            )
    if iw_entries:
        from mitsuba_tpu.bsdf.irawan import pack_tables, tables_have_noise

        _iw_t = pack_tables(iw_entries)
        iw_tabs = {"iw_" + k: v for k, v in _iw_t.items()}
        iw_meta = {"has_irawan": True,
                   "iw_noise": tables_have_noise(_iw_t)}
    else:
        iw_tabs, iw_meta = {}, {}

    # subsurface dipole tables (reference dipole.cpp:configure + the
    # IrradianceSample point set; sss_E is filled by the renderer's
    # irradiance pass, integrator/sss.py)
    mt["mat_sss"] = np.full(n_mat, -1, np.int32)
    for row, sid in sss_mat_rows:
        mt["mat_sss"][row] = sid
    if sss_objs:
        sss_p = np.concatenate([o[1] for o in sss_objs]).astype(np.float32)
        sss_n = np.concatenate([o[2] for o in sss_objs]).astype(np.float32)
        sss_area = np.concatenate(
            [np.full(len(o[1]), o[3], np.float32) for o in sss_objs]
        )
        sss_obj = np.concatenate(
            [np.full(len(o[1]), k, np.int32) for k, o in enumerate(sss_objs)]
        )
        zr_l, zv_l, str_l, eta_l = [], [], [], []
        sigs_l, sigt_l, g_l, kind_l = [], [], [], []
        for rec_s, _, _, _ in sss_objs:
            zr, zv, s_tr, _ = rec_s.dipole_coefficients()
            zr_l.append(zr)
            zv_l.append(zv)
            str_l.append(s_tr)
            eta_l.append(rec_s.eta)
            sigs_l.append(rec_s.sigma_s * rec_s.scale)
            sigt_l.append((rec_s.sigma_s + rec_s.sigma_a) * rec_s.scale)
            g_l.append(rec_s.g)
            kind_l.append(1 if rec_s.kind == "singlescatter" else 0)
        sss_tabs = {
            "sss_p": sss_p,
            "sss_n": sss_n,
            "sss_area": sss_area,
            "sss_obj": sss_obj,
            "sss_zr": np.stack(zr_l),
            "sss_zv": np.stack(zv_l),
            "sss_str": np.stack(str_l),
            "sss_eta": np.asarray(eta_l, np.float32),
            "sss_sigs": np.stack(sigs_l).astype(np.float32),
            "sss_sigt": np.stack(sigt_l).astype(np.float32),
            "sss_g": np.asarray(g_l, np.float32),
            "sss_kind": np.asarray(kind_l, np.int32),
            "sss_E": np.zeros_like(sss_p),
        }
        sss_meta = {
            "has_sss": True,
            "sss_irr_samples": max(o[0].irr_samples for o in sss_objs),
            "sss_indirect": any(o[0].indirect for o in sss_objs),
            # static: any singlescatter objects -> compile that branch
            "sss_has_single": any(kind_l),
            "sss_has_dipole": any(k == 0 for k in kind_l),
            "sss_ss_samples": max(
                (o[0].ss_samples for o in sss_objs), default=2
            ),
            "sss_ss_depth": max(
                (getattr(o[0], "ss_depth", 4) for o in sss_objs),
                default=4,
            ),
        }
    else:
        sss_tabs = {
            "sss_p": np.zeros((1, 3), np.float32),
            "sss_n": np.tile(np.array([0, 0, 1], np.float32), (1, 1)),
            "sss_area": np.zeros(1, np.float32),
            "sss_obj": np.zeros(1, np.int32),
            "sss_zr": np.ones((1, 3), np.float32),
            "sss_zv": np.ones((1, 3), np.float32),
            "sss_str": np.ones((1, 3), np.float32),
            "sss_eta": np.ones(1, np.float32),
            "sss_sigs": np.ones((1, 3), np.float32),
            "sss_sigt": np.ones((1, 3), np.float32),
            "sss_g": np.zeros(1, np.float32),
            "sss_kind": np.zeros(1, np.int32),
            "sss_E": np.zeros((1, 3), np.float32),
        }
        sss_meta = {"has_sss": False}

    has_bumpmaps = any(
        rec.tex_bump is not None
        for rec in materials
        if hasattr(rec, "tex_bump")
    )

    tex_arrays = _pack_textures(textures)

    # ---------------- emitter table ----------------
    n_em = max(len(emitters), 1)
    em = {
        "em_kind": np.zeros(n_em, np.int32),
        "em_rgb": np.zeros((n_em, 3), np.float32),
        "em_pos": np.zeros((n_em, 3), np.float32),
        "em_dir": np.tile(np.array([[0, 0, 1]], np.float32), (n_em, 1)),
        "em_cos_cutoff": np.zeros(n_em, np.float32),
        "em_cos_beam": np.zeros(n_em, np.float32),
        "em_area": np.ones(n_em, np.float32),
        "em_tri_lo": np.zeros(n_em, np.int32),
        "em_tri_hi": np.zeros(n_em, np.int32),
    }
    env_idx = -1
    env_image = np.zeros((1, 2, 3), np.float32)
    env_to_world = np.eye(4, dtype=np.float32)

    # area emitter triangle lists (triangle ids AFTER the BVH permutation)
    area_tri_idx_parts = []
    area_tri_cdf_parts = []
    at_cursor = 0
    tri_area = 0.5 * np.linalg.norm(
        np.cross(tri_e1[: n_tris], tri_e2[: n_tris]), axis=-1
    )

    weights = np.zeros(n_em, np.float64)
    for i, rec in enumerate(emitters):
        em["em_kind"][i] = rec.kind
        if rec.kind == AREA:
            em["em_rgb"][i] = rec.radiance
            ids = np.nonzero(tri_emit[: n_tris] == i)[0]
            areas = tri_area[ids]
            total = float(areas.sum())
            em["em_area"][i] = max(total, 1e-12)
            em["em_tri_lo"][i] = at_cursor
            em["em_tri_hi"][i] = at_cursor + len(ids)
            at_cursor += len(ids)
            area_tri_idx_parts.append(ids.astype(np.int32))
            cdf = np.cumsum(areas) / max(total, 1e-12)
            area_tri_cdf_parts.append(cdf.astype(np.float32))
        elif rec.kind == CONSTANT:
            em["em_rgb"][i] = rec.radiance
            env_idx = i
        elif rec.kind == ENVMAP:
            em["em_rgb"][i] = rec.radiance * rec.scale
            env_idx = i
            env_image = rec.env_image * rec.scale
            env_to_world = rec.to_world.m.astype(np.float32)
        else:
            em["em_rgb"][i] = (
                rec.intensity if rec.kind in (1, 2, 4) else rec.irradiance
            )
            em["em_pos"][i] = rec.position
            em["em_dir"][i] = rec.direction
            em["em_cos_cutoff"][i] = np.cos(
                np.deg2rad(rec.cutoff_angle_deg)
            )
            em["em_cos_beam"][i] = np.cos(np.deg2rad(rec.beam_width_deg))
        weights[i] = rec.sampling_weight if i < len(emitters) else 0.0

    if len(emitters) == 0:
        weights = np.ones(1)

    area_tri_idx = (
        np.concatenate(area_tri_idx_parts).astype(np.int32)
        if area_tri_idx_parts
        else np.zeros(1, np.int32)
    )
    area_tri_cdf = (
        np.concatenate(area_tri_cdf_parts).astype(np.float32)
        if area_tri_cdf_parts
        else np.ones(1, np.float32)
    )

    pmf = weights / weights.sum() if weights.sum() > 0 else weights
    emitter_cdf = np.concatenate([[0.0], np.cumsum(pmf)]).astype(np.float32)
    emitter_cdf[-1] = 1.0

    # env importance distribution (luminance * sin(theta) weighting,
    # reference envmap.cpp:103-229)
    if env_idx >= 0 and env_image.size > 3:
        from mitsuba_tpu.core.spectrum import luminance

        h, w = env_image.shape[:2]
        lum = np.asarray(luminance(jnp.asarray(env_image)))
        sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
        env_weights = lum * sin_t[:, None] + 1e-12
        env_dist = Distribution2D.from_weights(env_weights)
    else:
        env_weights = np.ones((1, 2))
        env_dist = Distribution2D.from_weights(env_weights)
    # joint alias table: O(1) env draws (one row per sample) instead of
    # log2(HW) serialized CDF gathers per lane.  The fused row packs
    # [prob, alias_idx, dens_self, dens_alias] so a draw costs ONE
    # 16-byte gather; alias ids stay exact in f32 below 2^24 entries
    # (8 Mpx — a 4Kx2K lat-long)
    env_alias_prob, env_alias_idx = build_alias(env_weights)
    _dens_flat = np.asarray(env_dist.density, np.float32).reshape(-1)
    env_alias_fused = (
        np.stack(
            [
                env_alias_prob,
                env_alias_idx.astype(np.float32),
                _dens_flat,
                _dens_flat[env_alias_idx],
            ],
            axis=-1,
        ).astype(np.float32)
        if env_alias_prob.size < (1 << 24)
        else np.zeros((1, 4), np.float32)
    )

    # ---------------- medium table ----------------
    from mitsuba_tpu.medium.plugins import HETEROGENEOUS

    n_med = max(len(media), 1)
    med_sigma_s = np.zeros((n_med, 3), np.float32)
    med_sigma_a = np.zeros((n_med, 3), np.float32)
    med_g = np.zeros(n_med, np.float32)
    med_phase = np.zeros(n_med, np.int32)
    # N-ary mixture leaf tables (kind < 0 = empty slot); slot 0 always
    # holds the (primary) component
    from mitsuba_tpu.medium.plugins import MAX_PHASE_COMPONENTS

    med_ph_kinds = np.full((n_med, MAX_PHASE_COMPONENTS), -1, np.int32)
    med_ph_gs = np.zeros((n_med, MAX_PHASE_COMPONENTS), np.float32)
    med_ph_ws = np.zeros((n_med, MAX_PHASE_COMPONENTS), np.float32)
    med_ph_kinds[:, 0] = 0
    med_ph_ws[:, 0] = 1.0
    med_kind = np.zeros(n_med, np.int32)
    med_sampling_w = np.zeros(n_med, np.float32)
    # homogeneous free-path strategies (homogeneous.cpp:149-153):
    # 0 = balance, 1 = fixed density (single/manual), 2 = maximum
    med_strategy = np.zeros(n_med, np.int32)
    med_density = np.zeros(n_med, np.float32)
    # maximum-of-exponentials tables (maxexp.h:30-58): per medium the
    # descending-sorted rates, interval starts, normalized CDF knots
    # and the normalization constant
    med_mx_sigma = np.ones((n_med, 3), np.float32)
    med_mx_istart = np.zeros((n_med, 3), np.float32)
    med_mx_cdf = np.zeros((n_med, 4), np.float32)
    med_mx_norm = np.ones(n_med, np.float32)
    # fiber phases (kkay/microflake): per-medium params + sigma_t LUT
    from mitsuba_tpu.medium.plugins import FLAKE_LUT, KKAY, MICROFLAKE
    med_ph_ks = np.zeros(n_med, np.float32)
    med_ph_kd = np.zeros(n_med, np.float32)
    med_ph_exp = np.ones(n_med, np.float32)
    med_ph_knorm = np.zeros(n_med, np.float32)
    med_flake_norm = np.zeros(n_med, np.float32)
    med_flake_stddev = np.full(n_med, 0.1, np.float32)
    med_flake_sigt = np.ones((n_med, FLAKE_LUT), np.float32)
    # heterogeneous grids: corner-packed densities + supergrid majorants
    # (fast TPU delta tracking — medium/eval.py; reference equivalent:
    # heterogeneous.cpp:164-199 integrates density along the ray)
    SUPER_B = 8  # grid cells per supergrid cell, each axis
    het_slot_of_med = np.full(n_med, -1, np.int32)  # med id -> het slot
    hc_parts, hs_parts = [], []
    h_w2g, h_albedo, h_dims, h_sdims, h_cbase, h_sbase, h_smax = (
        [], [], [], [], [], [], []
    )
    ho_parts, h_obase, h_odims = [], [], []
    het_med_id = -1
    het_sigma_max = 0.0
    for i, m in enumerate(media):
        med_kind[i] = m.kind
        from mitsuba_tpu.medium.plugins import PhaseRecord, HG

        med_g[i] = m.phase.g if m.phase.kind == HG else 0.0
        med_phase[i] = m.phase.kind
        if m.phase.kind == KKAY:
            med_ph_ks[i] = m.phase.ks
            med_ph_kd[i] = m.phase.kd
            med_ph_exp[i] = m.phase.exponent
            med_ph_knorm[i] = m.phase.knorm
        if m.phase.kind == MICROFLAKE:
            med_flake_norm[i] = m.phase.flake_norm
            med_flake_stddev[i] = m.phase.stddev
            med_flake_sigt[i] = m.phase.flake_sigt
        comps = m.phase.components or [
            (m.phase.kind, m.phase.g, 1.0)
        ]
        for ci, (k_, g_, w_) in enumerate(comps):
            med_ph_kinds[i, ci] = k_
            med_ph_gs[i, ci] = g_ if k_ == HG else 0.0
            med_ph_ws[i, ci] = w_
        for ci in range(len(comps), MAX_PHASE_COMPONENTS):
            med_ph_kinds[i, ci] = -1
            med_ph_ws[i, ci] = 0.0
        if m.kind == HETEROGENEOUS:
            if het_med_id < 0:
                het_med_id = i  # kept for meta back-compat
            het_slot_of_med[i] = len(h_dims)
            vol = m.density
            grid = vol.grid[..., 0] if vol.grid.ndim == 4 else vol.grid
            grid = np.ascontiguousarray(grid * m.scale, np.float32)
            if os.environ.get("MTS_HET_BF16", "1") != "0":
                # bf16 density corners HALVE the per-candidate gather
                # bytes of delta tracking (the volpath event body is
                # gather-bound).  Quantizing the grid BEFORE building
                # corners and majorants keeps the supergrid an exact
                # bound of what tracking will actually read, so the
                # estimator stays unbiased w.r.t. the stored field
                # (~0.4% field quantization, far below tracking noise).
                import ml_dtypes

                grid = grid.astype(ml_dtypes.bfloat16).astype(
                    np.float32
                )
            D_, H_, W_ = grid.shape
            # corner packing: pad by one zero layer; base point (z,y,x)
            # with z in [-1, D-1] holds its 2x2x2 corner block -> ONE
            # row gather per trilinear lookup instead of 8 scalar ones
            gp = np.zeros((D_ + 2, H_ + 2, W_ + 2), np.float32)
            gp[1:-1, 1:-1, 1:-1] = grid
            corners = np.empty((D_ + 1, H_ + 1, W_ + 1, 8), np.float32)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        corners[..., dz * 4 + dy * 2 + dx] = gp[
                            dz : dz + D_ + 1,
                            dy : dy + H_ + 1,
                            dx : dx + W_ + 1,
                        ]
            # supergrid majorants: per-block max over the covered cells
            # DILATED by one (trilinear support reaches the neighbors)
            sd = [max((n + SUPER_B - 1) // SUPER_B, 1) for n in (D_, H_, W_)]
            sup = np.zeros(sd, np.float32)
            for z in range(sd[0]):
                for y in range(sd[1]):
                    for x in range(sd[2]):
                        sup[z, y, x] = grid[
                            max(z * SUPER_B - 1, 0) : (z + 1) * SUPER_B + 1,
                            max(y * SUPER_B - 1, 0) : (y + 1) * SUPER_B + 1,
                            max(x * SUPER_B - 1, 0) : (x + 1) * SUPER_B + 1,
                        ].max()
            h_cbase.append(sum(p.shape[0] for p in hc_parts))
            h_sbase.append(sum(p.shape[0] for p in hs_parts))
            if os.environ.get("MTS_HET_BF16", "1") != "0":
                import ml_dtypes

                # values are already bf16-representable (grid was
                # quantized above), so this narrows storage losslessly
                corners = corners.astype(ml_dtypes.bfloat16)
            hc_parts.append(corners.reshape(-1, 8))
            hs_parts.append(sup.reshape(-1))
            h_dims.append([D_, H_, W_])
            h_sdims.append(sd)
            h_smax.append(float(grid.max()))
            het_sigma_max = max(het_sigma_max, float(grid.max()))
            # world -> grid-index transform: world -> volume local (aabb)
            ext = np.maximum(vol.aabb_max - vol.aabb_min, 1e-9)
            to_local = np.eye(4)
            to_local[:3, :3] = np.diag(1.0 / ext)
            to_local[:3, 3] = -vol.aabb_min / ext
            h_w2g.append(
                (to_local @ vol.to_world.inv).astype(np.float32)[:3].reshape(-1)
            )
            if m.albedo is not None and m.albedo.constant is not None:
                h_albedo.append(np.asarray(m.albedo.constant, np.float32))
            else:
                h_albedo.append(np.full(3, 0.9, np.float32))
            # fiber orientation volume (kkay/microflake): corner-packed
            # 3-channel grid -> one [.., 24] row gather per lookup
            ov = getattr(m, "orientation", None)
            if ov is not None and ov.grid is not None and ov.grid.ndim == 4:
                og = np.ascontiguousarray(ov.grid[..., :3], np.float32)
                oD, oH, oW = og.shape[:3]
                ogp = np.zeros((oD + 2, oH + 2, oW + 2, 3), np.float32)
                ogp[1:-1, 1:-1, 1:-1] = og
                oc = np.empty((oD + 1, oH + 1, oW + 1, 8, 3), np.float32)
                for dz in (0, 1):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            oc[..., dz * 4 + dy * 2 + dx, :] = ogp[
                                dz : dz + oD + 1,
                                dy : dy + oH + 1,
                                dx : dx + oW + 1,
                            ]
                h_obase.append(sum(p_.shape[0] for p_ in ho_parts))
                ho_parts.append(oc.reshape(-1, 24))
                h_odims.append([oD, oH, oW])
            else:
                h_obase.append(-1)
                h_odims.append([1, 1, 1])
        else:
            med_sigma_s[i] = m.sigma_s
            med_sigma_a[i] = m.sigma_a
            # reference homogeneous.cpp:168-181: sampling weight = max
            # single-channel albedo, clamped to >= 0.5 when scattering
            st = m.sigma_s + m.sigma_a
            albedo = np.where(st > 0, m.sigma_s / np.maximum(st, 1e-20), 0.0)
            a = float(albedo.max())
            med_sampling_w[i] = max(a, 0.5) if a > 0 else 0.0
            if getattr(m, "sampling_weight", -1.0) >= 0:
                med_sampling_w[i] = m.sampling_weight
            strat = getattr(m, "strategy", "balance")
            if strat in ("single", "manual"):
                med_strategy[i] = 1
                med_density[i] = m.sampling_density
            elif strat == "maximum":
                med_strategy[i] = 2
                s = np.sort(st.astype(np.float64))[::-1]
                med_mx_sigma[i] = s
                # integrate max_k(s_k e^{-s_k t}) piecewise: on the
                # interval where f_k dominates the antiderivative of
                # s_k e^{-s_k t} is -e^{-s_k t}; interval boundaries
                # solve s_k e^{-s_k t} = s_{k+1} e^{-s_{k+1} t}
                cdf = np.zeros(4, np.float64)
                istart = np.zeros(3, np.float64)
                for k in range(3):
                    lower = (
                        -1.0
                        if k == 0
                        else -((s[k] / s[k - 1]) ** (-s[k] / (s[k] - s[k - 1])))
                    )
                    upper = (
                        0.0
                        if k == 2
                        else -((s[k + 1] / s[k]) ** (-s[k] / (s[k + 1] - s[k])))
                    )
                    cdf[k + 1] = cdf[k] + (upper - lower)
                    istart[k] = (
                        0.0
                        if k == 0
                        else np.log(s[k] / s[k - 1]) / (s[k] - s[k - 1])
                    )
                med_mx_norm[i] = cdf[3]
                med_mx_cdf[i] = cdf / cdf[3]
                med_mx_istart[i] = istart

    n_het = len(h_dims)
    if n_het == 0:
        hc_parts = [np.zeros((1, 8), np.float32)]
        hs_parts = [np.zeros(1, np.float32)]
        h_w2g = [np.eye(4, dtype=np.float32)[:3].reshape(-1)]
        h_albedo = [np.full(3, 0.9, np.float32)]
        h_dims = [[1, 1, 1]]
        h_sdims = [[1, 1, 1]]
        h_cbase = [0]
        h_sbase = [0]
        h_smax = [0.0]
        h_obase = [-1]
        h_odims = [[1, 1, 1]]
    if not ho_parts:
        ho_parts = [np.zeros((1, 24), np.float32)]

    arrays = {
        "med_sigma_s": med_sigma_s,
        "med_sigma_a": med_sigma_a,
        "med_g": med_g,
        "med_phase": med_phase,
        "med_ph_kinds": med_ph_kinds,
        "med_ph_gs": med_ph_gs,
        "med_ph_ws": med_ph_ws,
        "med_kind": med_kind,
        "med_sampling_w": med_sampling_w,
        "med_strategy": med_strategy,
        "med_density": med_density,
        "med_mx_sigma": med_mx_sigma,
        "med_mx_istart": med_mx_istart,
        "med_mx_cdf": med_mx_cdf,
        "med_mx_norm": med_mx_norm,
        "med_het_slot": het_slot_of_med,
        "het_corners": np.concatenate(hc_parts, axis=0),
        "het_super": np.concatenate(hs_parts),
        "het_w2g": np.stack(h_w2g),  # [K, 12] row-major 3x4
        "het_albedo": np.stack(h_albedo),  # [K, 3]
        "het_dims": np.asarray(h_dims, np.int32),  # [K, 3] (D, H, W)
        "het_sdims": np.asarray(h_sdims, np.int32),  # [K, 3]
        "het_cbase": np.asarray(h_cbase, np.int32),
        "het_sbase": np.asarray(h_sbase, np.int32),
        "het_smax": np.asarray(h_smax, np.float32),
        "het_ocorners": np.concatenate(ho_parts, axis=0),
        "het_obase": np.asarray(h_obase, np.int32),
        "het_odims": np.asarray(h_odims, np.int32),
        "med_ph_ks": med_ph_ks,
        "med_ph_kd": med_ph_kd,
        "med_ph_exp": med_ph_exp,
        "med_ph_knorm": med_ph_knorm,
        "med_flake_norm": med_flake_norm,
        "med_flake_stddev": med_flake_stddev,
        "med_flake_sigt": med_flake_sigt,
        "tri_med_in": tri_med_in,
        "tri_med_ex": tri_med_ex,
        "tri_t": tri_t,
        "tri_s": tri_s,
        "tri_v0": tri_v0, "tri_e1": tri_e1, "tri_e2": tri_e2,
        "tri_n0": tri_n0, "tri_n1": tri_n1, "tri_n2": tri_n2,
        "tri_uv0": tri_uv0, "tri_uv1": tri_uv1, "tri_uv2": tri_uv2,
        "tri_mat": tri_mat, "tri_emit": tri_emit, "tri_dpdu": tri_dpdu,
        "tri_dpdv": tri_dpdv,
        "sph_center": sph_center, "sph_radius": sph_radius,
        "sph_mat": sph_mat, "sph_emit": sph_emit, "sph_flip": sph_flip,
        "sph_med_in": sph_med_in, "sph_med_ex": sph_med_ex,
        "cyl_p0": cyl_p0, "cyl_p1": cyl_p1, "cyl_n0": cyl_n0,
        "cyl_n1": cyl_n1, "cyl_rad": cyl_rad, "cyl_mat": cyl_mat,
        "cyl_flip": cyl_flip,
        "bvh_lo": bvh.lo, "bvh_hi": bvh.hi, "bvh_skip": bvh.skip,
        "bvh_first": bvh.first, "bvh_count": bvh.count,
        "bvh_nodes": bvh_nodes, "tri9": tri9,
        "anim_m1": (
            np.stack(anim_m1) if anim_m1
            else np.zeros((1, 12), np.float32)
        ),
        **cluster_arrays,
        **inst_arrays,
        **deform_arrays,
        **geom_tex_arrays,
        **mt,
        **tex_arrays,
        **em,
        "area_tri_idx": area_tri_idx,
        "area_tri_cdf": area_tri_cdf,
        "emitter_pmf": pmf.astype(np.float32),
        "emitter_cdf": emitter_cdf,
        "cam_w2c": _cam_w2c(scene),
        "env_image": np.asarray(env_image, np.float32),
        "env_to_world": env_to_world,
        "env_to_local": np.linalg.inv(env_to_world.astype(np.float64)).astype(
            np.float32
        ),
        "env_marginal_cdf": env_dist.marginal_cdf,
        "env_conditional_cdf": env_dist.conditional_cdf,
        "env_density": env_dist.density,
        "env_alias_prob": env_alias_prob,
        "env_alias_idx": env_alias_idx,
        "env_alias_fused": env_alias_fused,
        **sss_tabs,
        **iw_tabs,
    }
    arrays = {k: jnp.asarray(v) for k, v in arrays.items()}

    # scene bounding sphere (static meta: directional/env emission
    # sampling and bdpt light subpaths need a finite stand-in origin)
    pts = []
    n_world = n_tris - n_tmpl_tris  # template rows are LOCAL space
    if n_world > 0:
        v = tri_v0[:n_world]
        pts += [v, v + tri_e1[:n_world], v + tri_e2[:n_world]]
    if inst_meta.get("has_instances"):
        root = np.asarray(inst_arrays["inst_nodes"][0])
        pts += [root[None, 0:3], root[None, 3:6]]
    for arr in deform_arrays.values():
        v = arr.reshape(-1, 9)
        pts += [v[:, 0:3], v[:, 0:3] + v[:, 3:6], v[:, 0:3] + v[:, 6:9]]
    if n_sph > 0:
        pts += [sph_center - sph_radius[:, None],
                sph_center + sph_radius[:, None]]
    if n_cyl > 0:
        pts += [cyl_p0[:n_cyl] - cyl_rad[:n_cyl, None],
                cyl_p0[:n_cyl] + cyl_rad[:n_cyl, None],
                cyl_p1[:n_cyl] - cyl_rad[:n_cyl, None],
                cyl_p1[:n_cyl] + cyl_rad[:n_cyl, None]]
    if pts:
        allp = np.concatenate(pts, axis=0)
        blo, bhi = allp.min(axis=0), allp.max(axis=0)
        bcenter = 0.5 * (blo + bhi)
        bradius = float(np.linalg.norm(bhi - bcenter)) + 1e-6
    else:
        bcenter = np.zeros(3, np.float32)
        bradius = 1.0

    meta = {
        "scene_center": tuple(float(x) for x in bcenter),
        "scene_radius": bradius,
        "n_tris": n_tris,
        "n_spheres": n_sph,
        "n_cyls": n_cyl,
        "n_materials": len(materials),
        "n_emitters": len(emitters),
        "present_types": tuple(sorted(present_types)) or (DIFFUSE,),
        "mf_dists": tuple(sorted(mf_dists)),
        "use_bvh": use_bvh,
        "n_static_tris": int(n_static),
        "anim_ranges": tuple(anim_ranges),
        "deform_ranges": tuple(deform_ranges),
        "shutter_open": float(
            getattr(scene.sensor.record, "shutter_open", 0.0)
            if scene.sensor is not None else 0.0
        ),
        "shutter_close": float(
            getattr(scene.sensor.record, "shutter_close", 0.0)
            if scene.sensor is not None else 0.0
        ),
        "bvh_nodes": int(len(bvh.skip)),
        "bvh_depth": int(bvh.depth),
        **cluster_meta,
        **inst_meta,
        "env_idx": env_idx,
        "has_env": env_idx >= 0,
        "env_alias_fused_ok": env_alias_prob.size < (1 << 24),
        "has_envmap": env_idx >= 0 and (
            len(emitters) > env_idx and emitters[env_idx].kind == ENVMAP
        ),
        "has_area": any(r.kind == AREA for r in emitters),
        "all_area_emitters": bool(emitters)
        and all(r.kind == AREA for r in emitters),
        "emitter_kinds": tuple(sorted({r.kind for r in emitters})),
        "has_delta_emitters": any(r.is_delta() for r in emitters),
        "n_area_tris": int(at_cursor),
        "has_textures": len(textures) > 0,
        "geom_tex_kinds": geom_tex_kinds,
        "has_mips": any(t.kind == TEX_BITMAP for t in textures)
        and os.environ.get("MTS_TPU_NO_MIPS", "0") != "1",
        "cam_pix_angle": _cam_pix_angle(scene),
        "cam_tan_half": _cam_tan_half(scene),
        "cam_film": _cam_film(scene),
        "cam_kind": (
            int(getattr(scene.sensor.record, "kind", 0))
            if scene.sensor is not None else 0
        ),
        "has_mixtures": bool(mix_rows or coat_rows),
        # pointer-chain hops shading_params must follow (N-ary mixtures)
        "mix_depth": max(mix_chain_depth, 1),
        "has_bumpmaps": has_bumpmaps,
        "has_media": len(media) > 0,
        "n_media": len(media),
        # homogeneous strategies present (static: gates the extra
        # fixed-density / max-of-exponentials code paths)
        "hom_strategies": tuple(
            sorted({int(s) for s in med_strategy.tolist()})
        ) if len(media) else (0,),
        "bvh_n_layouts": bvh_n_layouts,
        "het_med_id": het_med_id,
        "het_sigma_max": het_sigma_max,
        "phase_kinds": tuple(sorted(
            {int(k) for k in med_ph_kinds.ravel() if k >= 0}
        )) if len(media) else (),
        "n_het": n_het,
        # deterministic Simpson transmittance iff every heterogeneous
        # medium requests method="simpson" (reference heterogeneous.cpp
        # EIntegrationMethod; the dispatch is static per scene)
        "het_simpson": n_het > 0 and all(
            getattr(m, "method", "woodcock") == "simpson"
            for m in media
            if m.kind == HETEROGENEOUS
        ),
        "het_super_b": SUPER_B,
        "camera_medium": -1,
        **sss_meta,
        **iw_meta,
    }
    return ScenePack(arrays, meta)


# ---------------- N-bin spectral repacking ----------------

# Pack leaves holding color/spectral quantities (trailing dim 3): these
# are re-expressed per bin-group in spectral mode.  Positions, normals,
# and data textures (bump/opacity, restored from the original atlas
# below) are NOT listed.  The dipole tables (sss_zr/zv/str) hold
# *distances*, not radiometric values, and keep their RGB channels even
# in spectral mode (documented approximation).
_SPECTRAL_LEAVES = (
    "tex_c0", "tex_c1", "tex_scale",
    "mat_cA", "mat_cB", "mat_cC", "mat_cD",
    "mat_mix_wa", "mat_mix_wb",
    "med_sigma_s", "med_sigma_a", "het_albedo",
    "med_ph_ks", "med_ph_kd",
    "tri_c0", "tri_c1", "tri_c2",
    "iw_y_kd", "iw_y_ks",
)

# emission leaves carry D65-shaped illuminant spectra so their RGB
# projects back exactly (core/spectral.py upsample_illum)
_EMISSION_LEAVES = ("em_rgb", "env_image")


def apply_spectral_pack(pack: ScenePack, bins, g: int) -> ScenePack:
    """Re-express a packed scene for spectral bin-group `g`: every
    spectral leaf's RGB value is upsampled to a smooth spectrum
    (core/spectral.py, after reference spectrum.cpp fromLinearRGB) and
    sliced to the group's three bins, and dielectric IORs move to the
    group's hero wavelength via the Cauchy model.  Meta (and therefore
    every compiled kernel) is IDENTICAL across groups, so an N-bin
    render compiles once and executes N/3 times."""
    import jax.numpy as jnp

    from mitsuba_tpu.core.spectral import (
        cauchy_eta,
        upsample_illum,
        upsample_rgb,
    )

    sl = slice(3 * g, 3 * g + 3)
    _, lam_mid = bins.group(g)
    arrays = dict(pack.arrays)

    def xform(a, up=upsample_rgb):
        v = up(np.asarray(a, np.float32), bins)[..., sl]
        return np.maximum(v, 0.0)

    for name in _SPECTRAL_LEAVES:
        if name in arrays and arrays[name].ndim and arrays[name].shape[-1] == 3:
            arrays[name] = jnp.asarray(xform(arrays[name]))
    for name in _EMISSION_LEAVES:
        if name in arrays and arrays[name].ndim and arrays[name].shape[-1] == 3:
            arrays[name] = jnp.asarray(xform(arrays[name], upsample_illum))

    if "tex_atlas" in arrays and not bins.identity:
        atlas0 = np.asarray(arrays["tex_atlas"], np.float32)
        atlas = xform(atlas0)
        # bump/opacity entries store DATA, not colors: restore them
        data_tex = set()
        for leaf in ("mat_tex_bump", "mat_tex_opacity"):
            data_tex |= {int(t) for t in np.asarray(pack.arrays[leaf])
                         if int(t) >= 0}
        if data_tex:
            mip = np.asarray(pack.arrays["tex_mip_rect"])
            nlev = np.asarray(pack.arrays["tex_n_lev"])
            for t in data_tex:
                for lvl in range(int(nlev[t])):
                    x, y, w, h = (int(v) for v in mip[t, lvl])
                    atlas[y:y + h, x:x + w] = atlas0[y:y + h, x:x + w]
        arrays["tex_atlas"] = jnp.asarray(atlas)

    # hero-wavelength dispersion for dielectrics (Cauchy, eta given at
    # the d-line; reference carries full InterpolatedSpectrum IORs in
    # spectral builds)
    disp = np.asarray(pack.arrays["mat_disp"], np.float32)
    if (disp != 0.0).any():
        eta = np.asarray(pack.arrays["mat_eta"], np.float32)
        arrays["mat_eta"] = jnp.asarray(
            cauchy_eta(eta, disp, lam_mid).astype(np.float32)
        )
    return ScenePack(arrays, pack.meta)
