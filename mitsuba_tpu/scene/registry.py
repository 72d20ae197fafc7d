"""Plugin registry: name -> factory.

Rebuild of the reference's dlopen PluginManager
(reference: include/mitsuba/core/plugin.h:118-142) as a plain in-process
registry.  Every "plugin" is a host-side descriptor class registered
under the same name the reference uses in scene XML (`diffuse`, `path`,
`perspective`, ...), constructed from a `Properties` instance.  The
descriptors compile themselves into flat device arrays when the scene is
packed (see scene/builder.py) — the TPU analogue of the reference's
"resource" upload to workers (reference: sched.h:384-403).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

_REGISTRY: dict[str, dict[str, Callable]] = {}

# interface categories, mirroring the reference's plugin directories
CATEGORIES = (
    "integrator",
    "bsdf",
    "emitter",
    "sensor",
    "shape",
    "sampler",
    "film",
    "rfilter",
    "medium",
    "phase",
    "texture",
    "volume",
    "subsurface",
)


def register(category: str, name: str):
    """Class decorator: register a plugin factory."""
    if category not in CATEGORIES:
        raise ValueError(f"unknown plugin category '{category}'")

    def deco(cls):
        _REGISTRY.setdefault(category, {})[name] = cls
        cls.plugin_category = category
        cls.plugin_name = name
        return cls

    return deco


def create(category: str, name: str, props) -> Any:
    """Instantiate plugin `name` of `category` from Properties
    (= PluginManager::createObject, reference plugin.h:142)."""
    _ensure_loaded()
    cat = _REGISTRY.get(category, {})
    if name not in cat:
        known = ", ".join(sorted(cat)) or "<none>"
        raise KeyError(
            f"unknown {category} plugin '{name}' (registered: {known})"
        )
    return cat[name](props)


def names(category: str):
    _ensure_loaded()
    return sorted(_REGISTRY.get(category, {}))


_LOADED = False


def _ensure_loaded():
    """Import all plugin modules once (they self-register on import)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    import mitsuba_tpu.scene.shapes  # noqa: F401
    import mitsuba_tpu.bsdf.plugins  # noqa: F401
    import mitsuba_tpu.emitter.plugins  # noqa: F401
    import mitsuba_tpu.sensor.plugins  # noqa: F401
    import mitsuba_tpu.sampler.plugins  # noqa: F401
    import mitsuba_tpu.film.plugins  # noqa: F401
    import mitsuba_tpu.integrator.plugins  # noqa: F401
    import mitsuba_tpu.medium.plugins  # noqa: F401
    import mitsuba_tpu.scene.textures  # noqa: F401
    import mitsuba_tpu.scene.subsurface  # noqa: F401
    import mitsuba_tpu.scene.hair  # noqa: F401
