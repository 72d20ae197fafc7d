"""Volumetric path tracer (reference: src/integrators/path/volpath.cpp).

Round-1 scope: scenes without media render identically to `path`;
homogeneous/heterogeneous medium transport (distance sampling, Woodcock
tracking, phase sampling, attenuated NEE — volpath.cpp:104-382) is the
next milestone and will extend the wavefront state with per-lane medium
ids + transmittance.
"""

from __future__ import annotations

from mitsuba_tpu.integrator import path as _path


def volpath_trace(pack, integ, o, d, lane, sample_idx, sampler, seed=0):
    if pack.meta.get("has_media", False):
        raise NotImplementedError(
            "volpath with participating media: in progress"
        )
    return _path.path_trace(pack, integ, o, d, lane, sample_idx, sampler, seed)


_path.TRACE_FNS["volpath"] = volpath_trace
