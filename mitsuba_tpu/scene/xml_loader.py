"""Mitsuba XML scene loader.

Rebuild of the reference SceneHandler
(reference: src/librender/scenehandler.cpp, schema data/schema/scene.xsd,
format doc/format.tex:112-398) on xml.etree: builds nested `Properties`,
instantiates plugins through the registry, supports `$param`
substitution, `<default>`, `<ref>`, `<include>`, `<alias>`, transform
chains, and animated transforms (collapsed to their t=0 keyframe for
now — motion blur is planned).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

from mitsuba_tpu.core.spectrum import (
    blackbody_rgb,
    interpolated_spectrum_to_rgb,
    srgb_degamma,
)
from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.scene import registry
from mitsuba_tpu.scene.properties import Properties

_PLUGIN_TAGS = {
    "integrator",
    "sensor",
    "camera",  # legacy alias
    "sampler",
    "film",
    "rfilter",
    "bsdf",
    "shape",
    "emitter",
    "luminaire",  # legacy alias
    "texture",
    "medium",
    "phase",
    "volume",
    "subsurface",
}

_TAG_TO_CATEGORY = {
    "camera": "sensor",
    "luminaire": "emitter",
}


@dataclass
class SceneDescription:
    integrator: object = None
    sensor: object = None
    shapes: list = field(default_factory=list)
    emitters: list = field(default_factory=list)  # non-shape emitters
    media: dict = field(default_factory=dict)
    ids: dict = field(default_factory=dict)
    path: str = ""
    # two-level instancing (reference shapegroup.h:34): instances are
    # (group_key, Transform); groups map key -> [ShapeInstance].  The
    # expand-vs-TLAS decision happens at pack time (builder.py).
    instances: list = field(default_factory=list)
    shape_groups: dict = field(default_factory=dict)


def _parse_float_list(s):
    return [float(x) for x in re.split(r"[,\s]+", s.strip()) if x]


def _parse_rgb(value: str):
    value = value.strip()
    if value.startswith("#"):
        h = value[1:]
        return np.array(
            [int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4)], np.float32
        )
    vals = _parse_float_list(value)
    if len(vals) == 1:
        return np.full(3, vals[0], np.float32)
    return np.asarray(vals[:3], np.float32)


def _parse_spectrum(value: str, search_paths):
    """<spectrum> values: uniform, 'lambda:value, ...' pairs, or a .spd
    filename (reference: doc/format.tex spectrum section)."""
    value = value.strip()
    if ":" in value and not os.path.sep in value:
        pairs = [p for p in re.split(r"[,\s]+", value) if p]
        lam, val = [], []
        for p in pairs:
            a, b = p.split(":")
            lam.append(float(a))
            val.append(float(b))
        return interpolated_spectrum_to_rgb(np.array(lam), np.array(val))
    try:
        vals = _parse_float_list(value)
        if len(vals) == 1:
            return np.full(3, vals[0], np.float32)
        return np.asarray(vals[:3], np.float32)
    except ValueError:
        pass
    # filename
    for base in search_paths + ["."]:
        cand = os.path.join(base, value)
        if os.path.exists(cand):
            lam, val = [], []
            for line in open(cand):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                lam.append(float(parts[0]))
                val.append(float(parts[1]))
            return interpolated_spectrum_to_rgb(np.array(lam), np.array(val))
    raise ValueError(f"cannot parse spectrum '{value}'")


def _xyz_attrs(el, default=0.0):
    return np.array(
        [
            float(el.get("x", default)),
            float(el.get("y", default)),
            float(el.get("z", default)),
        ],
        np.float64,
    )


def _parse_transform(el):
    """Sequential transform chain: each child applies AFTER the previous
    (cur = op * cur, reference scenehandler.cpp transform tags)."""
    cur = Transform.identity()
    for child in el:
        tag = child.tag
        if tag == "translate":
            v = _xyz_attrs(child, 0.0)
            op = Transform.translate(*v)
        elif tag == "scale":
            if child.get("value") is not None:
                vals = _parse_float_list(child.get("value"))
                if len(vals) == 1:
                    vals = vals * 3
                op = Transform.scale(*vals[:3])
            else:
                v = _xyz_attrs(child, 1.0)
                op = Transform.scale(*v)
        elif tag == "rotate":
            axis = _xyz_attrs(child, 0.0)
            angle = float(child.get("angle", 0.0))
            op = Transform.rotate(axis, angle)
        elif tag in ("lookat", "lookAt"):
            origin = np.array(_parse_float_list(child.get("origin")))
            target = np.array(_parse_float_list(child.get("target")))
            up = np.array(
                _parse_float_list(child.get("up", "0, 1, 0"))
            )
            op = Transform.look_at(origin, target, up)
        elif tag == "matrix":
            vals = _parse_float_list(child.get("value"))
            if len(vals) == 16:
                m = np.array(vals).reshape(4, 4)
            elif len(vals) == 9:
                m = np.eye(4)
                m[:3, :3] = np.array(vals).reshape(3, 3)
            else:
                raise ValueError("matrix must have 9 or 16 entries")
            op = Transform(m)
        else:
            raise ValueError(f"unknown transform child <{tag}>")
        cur = op * cur
    return cur


class SceneLoader:
    def __init__(self, search_paths=None, defaults=None):
        self.search_paths = list(search_paths or [])
        self.defaults = dict(defaults or {})
        self.ids = {}

    # -- parameter substitution ---------------------------------------
    def _subst(self, s: str) -> str:
        if "$" not in s:
            return s

        def repl(m):
            key = m.group(1)
            if key not in self.defaults:
                raise KeyError(
                    f"scene parameter ${key} is not defined "
                    f"(pass -D {key}=value or add a <default>)"
                )
            return str(self.defaults[key])

        return re.sub(r"\$(\w+)", repl, s)

    def _attr(self, el, name, default=None):
        v = el.get(name, default)
        return self._subst(v) if isinstance(v, str) else v

    # -- main entry -----------------------------------------------------
    def load(self, path) -> SceneDescription:
        path = os.path.abspath(path)
        self.search_paths.insert(0, os.path.dirname(path))
        tree = ET.parse(path)
        return self._load_root(tree.getroot(), path)

    def load_string(self, text, base_dir=".") -> SceneDescription:
        self.search_paths.insert(0, base_dir)
        root = ET.fromstring(text)
        return self._load_root(root, "<string>")

    def _load_root(self, root, path) -> SceneDescription:
        if root.tag != "scene":
            raise ValueError(f"{path}: root element must be <scene>")
        scene = SceneDescription(path=path)
        scene.ids = self.ids
        for el in root:
            self._scene_child(scene, el)
        if scene.integrator is None:
            from mitsuba_tpu.integrator.plugins import IntegratorRecord

            scene.integrator = IntegratorRecord(kind="path")
        if scene.sensor is None:
            raise ValueError(f"{path}: scene has no sensor")
        return scene

    def _scene_child(self, scene, el):
        tag = el.tag
        if tag == "default":
            name = el.get("name")
            if name not in self.defaults:
                self.defaults[name] = self._attr(el, "value")
            return
        if tag == "include":
            fname = self._attr(el, "filename")
            for base in self.search_paths + ["."]:
                cand = os.path.join(base, fname)
                if os.path.exists(cand):
                    sub = ET.parse(cand).getroot()
                    for child in sub:
                        self._scene_child(scene, child)
                    return
            raise FileNotFoundError(f"include: {fname}")
        if tag == "alias":
            self.ids[el.get("as")] = self.ids[el.get("id")]
            return
        if tag == "null":
            return
        if tag not in _PLUGIN_TAGS and tag != "ref":
            raise ValueError(f"unexpected top-level element <{tag}>")

        obj = self._plugin(el)
        cat = _TAG_TO_CATEGORY.get(tag, tag)
        if cat == "integrator":
            scene.integrator = obj.record
        elif cat == "sensor":
            self._finalize_sensor(obj)
            scene.sensor = obj
        elif cat == "shape":
            self._finalize_shape(scene, obj, el)
        elif cat == "emitter":
            scene.emitters.append(obj.record)
        elif cat == "medium":
            scene.media[obj.record.id or "default"] = obj.record
        # top-level bsdf/texture etc. exist only to define ids

    def _finalize_sensor(self, sensor_obj):
        from mitsuba_tpu.film.plugins import FilmRecord
        from mitsuba_tpu.sampler.plugins import SamplerRecord

        for name, child in sensor_obj.props.children:
            rec = getattr(child, "record", None)
            if isinstance(rec, FilmRecord):
                sensor_obj.record.film = rec
            elif isinstance(rec, SamplerRecord):
                sensor_obj.record.sampler = rec
        if sensor_obj.record.film is None:
            from mitsuba_tpu.film.plugins import FilmRecord as FR

            sensor_obj.record.film = FR()
        if sensor_obj.record.sampler is None:
            from mitsuba_tpu.sampler.plugins import SamplerRecord as SR

            sensor_obj.record.sampler = SR()
        sensor_obj.resolve_fov(
            sensor_obj.record.film.width, sensor_obj.record.film.height
        )

    def _finalize_shape(self, scene, shape_obj, el):
        from mitsuba_tpu.scene.shapes import InstanceShape, ShapeGroup

        if isinstance(shape_obj, ShapeGroup):
            # container only (reference shapegroup.cpp) — its children
            # are emitted when an <shape type="instance"> references it
            shape_obj.children = [
                child
                for _, child in shape_obj.props.children
                if hasattr(child, "instance")
            ]
            return
        if isinstance(shape_obj, InstanceShape):
            # defer to pack time: small totals expand flat, large ones
            # go through the two-level TLAS (scene/builder.py)
            group = None
            for _, child in shape_obj.props.children:
                if isinstance(child, ShapeGroup):
                    group = child
            if group is None:
                raise ValueError("instance: requires a shapegroup reference")
            key = id(group)
            if key not in scene.shape_groups:
                for child in group.children:
                    self._attach_shape_children(child)
                scene.shape_groups[key] = [
                    child.instance for child in group.children
                ]
            scene.instances.append((key, shape_obj.to_world))
            return

        self._attach_shape_children(shape_obj)
        scene.shapes.append(shape_obj.instance)

        # a sensor nested in a shape is attached to it (the reference's
        # irradiancemeter inherits the parent shape,
        # src/sensors/irradiancemeter.cpp:80-83)
        from mitsuba_tpu.sensor.plugins import SensorRecord

        for _, child in shape_obj.props.children:
            rec = getattr(child, "record", None)
            if isinstance(rec, SensorRecord):
                rec.parent_shape = shape_obj.instance
                self._finalize_sensor(child)
                scene.sensor = child

    def _attach_shape_children(self, shape_obj):
        inst = shape_obj.instance
        for name, child in shape_obj.props.children:
            rec = getattr(child, "record", None)
            from mitsuba_tpu.bsdf.plugins import BSDFRecord
            from mitsuba_tpu.emitter.plugins import EmitterRecord
            from mitsuba_tpu.medium.plugins import MediumRecord

            from mitsuba_tpu.scene.subsurface import SubsurfaceRecord

            if isinstance(rec, BSDFRecord):
                inst.bsdf = rec
            elif isinstance(rec, EmitterRecord):
                inst.emitter = rec
            elif isinstance(rec, SubsurfaceRecord):
                inst.subsurface = rec
            elif isinstance(rec, MediumRecord):
                if name == "interior" or not name:
                    inst.interior_medium = rec
                elif name == "exterior":
                    inst.exterior_medium = rec

    # -- plugin instantiation -------------------------------------------
    def _plugin(self, el):
        tag = el.tag
        if tag == "ref":
            rid = self._attr(el, "id")
            if rid not in self.ids:
                raise KeyError(f"<ref id=\"{rid}\"> is undefined")
            return self.ids[rid]
        category = _TAG_TO_CATEGORY.get(tag, tag)
        type_name = self._attr(el, "type")
        props = Properties(
            plugin_name=f"{category}:{type_name}",
            id=el.get("id", ""),
            search_paths=self.search_paths,
        )
        self._fill_props(props, el)
        obj = registry.create(category, type_name, props)
        if el.get("id"):
            self.ids[el.get("id")] = obj
        return obj

    def _fill_props(self, props, el):
        for child in el:
            tag = child.tag
            name = self._attr(child, "name", "")
            if tag in ("integer",):
                props.set(name, int(float(self._attr(child, "value"))))
            elif tag == "float":
                props.set(name, float(self._attr(child, "value")))
            elif tag == "boolean":
                props.set(
                    name, self._attr(child, "value").lower() == "true"
                )
            elif tag == "string":
                props.set(name, self._attr(child, "value"))
            elif tag in ("point", "vector"):
                if child.get("value") is not None:
                    props.set(
                        name,
                        np.array(
                            _parse_float_list(self._attr(child, "value"))
                        ),
                    )
                else:
                    props.set(name, _xyz_attrs(child))
            elif tag == "rgb":
                props.set(name, _parse_rgb(self._attr(child, "value")))
            elif tag == "srgb":
                rgb = _parse_rgb(self._attr(child, "value"))
                props.set(name, np.asarray(srgb_degamma(rgb), np.float32))
            elif tag == "spectrum":
                intent = child.get("intent", "")
                val = _parse_spectrum(
                    self._attr(child, "value"), self.search_paths
                )
                props.set(name, val)
            elif tag == "blackbody":
                t = float(self._attr(child, "temperature"))
                scale = float(child.get("scale", 1.0))
                rgb = blackbody_rgb(t) * scale
                props.set(name, rgb)
            elif tag == "transform":
                props.set(name or "toWorld", _parse_transform(child))
            elif tag == "animation":
                # animated transform keyframes (reference track.h:335);
                # stored as [(time, Transform), ...] — get_transform
                # evaluates keyframe 0, get_animation returns the track
                frames = [
                    (float(c.get("time", i)), _parse_transform(c))
                    for i, c in enumerate(child)
                    if c.tag == "transform"
                ]
                if frames:
                    frames.sort(key=lambda f: f[0])
                    props.set(name or "toWorld", frames)
            elif tag == "ref":
                obj = self._plugin(child)
                props.children.append((name, obj))
            elif tag in _PLUGIN_TAGS:
                obj = self._plugin(child)
                props.children.append((name, obj))
            elif tag == "default":
                dname = child.get("name")
                if dname not in self.defaults:
                    self.defaults[dname] = self._attr(child, "value")
            elif tag == "alias":
                self.ids[child.get("as")] = self.ids[child.get("id")]
            elif tag == "null":
                props.children.append((name, None))
            else:
                raise ValueError(f"unknown element <{tag}> in <{el.tag}>")


def load_scene(path, defaults=None, search_paths=None) -> SceneDescription:
    """Parse a Mitsuba scene XML file (the reference's loadScene)."""
    return SceneLoader(search_paths, defaults).load(path)


def load_scene_string(text, base_dir=".", defaults=None) -> SceneDescription:
    return SceneLoader(None, defaults).load_string(text, base_dir)
