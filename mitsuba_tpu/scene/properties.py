"""Typed key->value parameter maps handed to every plugin constructor.

Rebuild of reference include/mitsuba/core/properties.h:49-69 /
src/libcore/properties.cpp.  Supported value types: bool, int, float,
string, point/vector (np [3]), spectrum (np [3] linear RGB), Transform,
AnimatedTransform (as a single Transform for now), references, and nested
plugin descriptors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from mitsuba_tpu.core.transform import Transform


class PropertiesError(RuntimeError):
    pass


@dataclass
class Properties:
    plugin_name: str = ""
    id: str = ""
    _values: dict[str, Any] = field(default_factory=dict)
    _queried: set = field(default_factory=set)
    # nested child plugin descriptors (parsed but not yet instantiated),
    # in document order: list of (name, PluginDescriptor)
    children: list = field(default_factory=list)
    # asset search paths (= reference FileResolver, fresolver.h)
    search_paths: list = field(default_factory=list)

    def resolve_path(self, filename: str) -> str:
        import os

        if os.path.isabs(filename) and os.path.exists(filename):
            return filename
        for base in self.search_paths + ["."]:
            cand = os.path.join(base, filename)
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(
            f"{self.plugin_name}: cannot resolve '{filename}' "
            f"(searched {self.search_paths})"
        )

    def __contains__(self, name):
        return name in self._values

    def set(self, name, value):
        self._values[name] = value

    def _get(self, name, default, expected, caster):
        if name not in self._values:
            if default is _REQUIRED:
                raise PropertiesError(
                    f"{self.plugin_name}: missing required property '{name}'"
                )
            return default
        self._queried.add(name)
        try:
            return caster(self._values[name])
        except (TypeError, ValueError) as e:
            raise PropertiesError(
                f"{self.plugin_name}: property '{name}' has incompatible "
                f"type (expected {expected}): {e}"
            )

    def get_bool(self, name, default=None):
        def cast(v):
            if isinstance(v, bool):
                return v
            if isinstance(v, str):
                if v.lower() in ("true", "1"):
                    return True
                if v.lower() in ("false", "0"):
                    return False
            raise TypeError(v)

        return self._get(name, default, "bool", cast)

    def get_int(self, name, default=None):
        return self._get(name, default, "int", lambda v: int(v))

    def get_float(self, name, default=None):
        return self._get(name, default, "float", lambda v: float(v))

    def get_string(self, name, default=None):
        return self._get(name, default, "string", str)

    def get_vector(self, name, default=None):
        def cast(v):
            a = np.asarray(v, np.float64).ravel()
            if a.size == 1:
                a = np.full(3, a[0])
            if a.size != 3:
                raise TypeError(f"expected 3 components, got {a.size}")
            return a

        return self._get(name, default, "vector", cast)

    get_point = get_vector

    def get_spectrum(self, name, default=None):
        """Returns linear-RGB np [3].  Scalars broadcast to gray."""

        def cast(v):
            a = np.asarray(v, np.float64).ravel()
            if a.size == 1:
                a = np.full(3, a[0])
            if a.size != 3:
                raise TypeError(f"expected 1 or 3 components, got {a.size}")
            return a.astype(np.float32)

        if default is not None and not isinstance(default, np.ndarray) \
                and default is not _REQUIRED:
            default = np.full(3, float(default), np.float32)
        return self._get(name, default, "spectrum", cast)

    def get_transform(self, name, default=None):
        def cast(v):
            if isinstance(v, Transform):
                return v
            if isinstance(v, (list, tuple)) and v and isinstance(
                v[0], tuple
            ):
                # animated transform keyframes: static eval = keyframe 0
                return v[0][1]
            return Transform(np.asarray(v))

        if default is None:
            default = Transform.identity()
        return self._get(name, default, "transform", cast)

    def get_animation(self, name):
        """Animated-transform keyframes [(time, Transform), ...] or
        None (reference AnimatedTransform, track.h:335)."""
        v = self._values.get(name)
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], tuple):
            self._queried.add(name)
            return list(v)
        return None

    # plugin-author conveniences ------------------------------------------
    def unqueried(self):
        return [k for k in self._values if k not in self._queried]

    def keys(self):
        return list(self._values.keys())

    def raw(self, name):
        return self._values[name]


class _Required:
    def __repr__(self):
        return "<required>"


_REQUIRED = _Required()
REQUIRED = _REQUIRED
