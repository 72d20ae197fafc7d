"""Native (C++) runtime components, loaded via ctypes.

The compute path stays JAX/Pallas; these cover the host-side runtime
where the reference also uses native code (kd-tree construction,
gkdtree.h:684-744).  Libraries are compiled on first use with g++ and
cached next to the sources; every native component has a pure-Python
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build(name: str, sources: list[str]) -> str | None:
    out = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-o", out, *srcs,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return out
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def load(name: str, sources: list[str]):
    """Compile-and-load a native library; None if unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        path = _build(name, sources)
        lib = ctypes.CDLL(path) if path else None
        _LIBS[name] = lib
        return lib


def alias_builder():
    """ctypes handle to the native alias-table builder, or None."""
    lib = load("alias", ["alias_table.cpp"])
    if lib is None:
        return None
    fn = lib.mts_build_alias
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # weights
        ctypes.c_longlong,  # n
        ctypes.POINTER(ctypes.c_float),  # out prob
        ctypes.POINTER(ctypes.c_int32),  # out alias
    ]
    return fn


def bvh_builder():
    """ctypes handle to the native BVH builder, or None."""
    lib = load("bvh", ["bvh_builder.cpp"])
    if lib is None:
        return None
    fn = lib.mts_build_bvh
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # lo
        ctypes.POINTER(ctypes.c_float),  # hi
        ctypes.POINTER(ctypes.c_float),  # cen
        ctypes.c_int,  # n
        ctypes.c_int,  # leaf_size
        ctypes.POINTER(ctypes.c_float),  # out_lo
        ctypes.POINTER(ctypes.c_float),  # out_hi
        ctypes.POINTER(ctypes.c_int32),  # out_skip
        ctypes.POINTER(ctypes.c_int32),  # out_first
        ctypes.POINTER(ctypes.c_int32),  # out_count
        ctypes.POINTER(ctypes.c_int32),  # out_order
        ctypes.POINTER(ctypes.c_int32),  # out_depth
    ]
    return fn
