"""ScenePack serialization — the object-graph serialization analogue.

The reference streams serialized object graphs between cluster nodes
(include/mitsuba/core/serialization.h:35-65, InstanceManager instance
dedup) so workers don't re-parse scenes.  The TPU-native equivalent is
flat already: a ScenePack is a dict of arrays plus a static meta dict,
so serialization is one compressed npz (arrays) with a JSON meta
header.  `render(scene, pack=load_pack(path))` skips XML parsing,
geometry processing, BVH/cluster construction, and texture atlas
packing on every host.

    from mitsuba_tpu.scene.serialize import save_pack, load_pack
    save_pack(pack_scene(scene), "scene.mtspack")
    img = render(scene, pack=load_pack("scene.mtspack"))
"""

from __future__ import annotations

import json

import numpy as np

FORMAT_VERSION = 3  # v3: cl_primf winner-select table (accel/clusters.py)


def _meta_to_json(meta):
    def enc(v):
        if isinstance(v, tuple):
            return {"__tuple__": [enc(x) for x in v]}
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, (np.bool_,)):
            return bool(v)
        return v

    return json.dumps({k: enc(v) for k, v in meta.items()})


def _meta_from_json(text):
    def dec(v):
        if isinstance(v, dict) and "__tuple__" in v:
            return tuple(dec(x) for x in v["__tuple__"])
        if isinstance(v, list):
            return tuple(dec(x) for x in v)
        return v

    return {k: dec(v) for k, v in json.loads(text).items()}


def save_pack(pack, path):
    """Write a ScenePack to one compressed .mtspack (npz) file, or to
    any writable `core.stream.Stream` (the reference ships serialized
    scenes over streams to cluster nodes, serialization.h:35 +
    sched_remote.cpp ENewResource; here the same bytes ride a
    SocketStream / ZStream / PipeStream)."""
    from mitsuba_tpu.core.stream import Stream

    arrays = {k: np.asarray(v) for k, v in pack.arrays.items()}
    def _write_npz(f):
        np.savez_compressed(
            f,
            __meta__=np.frombuffer(
                _meta_to_json(pack.meta).encode(), dtype=np.uint8
            ),
            __version__=np.asarray([FORMAT_VERSION], np.int32),
            **arrays,
        )

    if isinstance(path, Stream):
        # npz needs a seekable file-like; stage in memory, then one
        # length-prefixed blob on the wire
        import io

        buf = io.BytesIO()
        _write_npz(buf)
        path.write_blob(buf.getvalue())
        path.flush()
        return
    # write through a file object so numpy can't append ".npz"
    with open(path, "wb") as f:
        _write_npz(f)


def load_pack(path):
    """Load a ScenePack written by save_pack (path or Stream)."""
    import io

    from mitsuba_tpu.core.stream import Stream
    from mitsuba_tpu.scene.builder import ScenePack

    if isinstance(path, Stream):
        path = io.BytesIO(path.read_blob())
    with np.load(path) as z:
        ver = int(z["__version__"][0])
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"{path}: mtspack version {ver} != {FORMAT_VERSION}"
            )
        meta = _meta_from_json(bytes(z["__meta__"]).decode())
        arrays = {
            k: z[k]
            for k in z.files
            if k not in ("__meta__", "__version__")
        }
    return ScenePack(arrays, meta)
