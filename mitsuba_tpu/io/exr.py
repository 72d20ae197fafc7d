"""Minimal self-contained OpenEXR 2.0 reader/writer.

The reference links against IlmImf (reference: src/libcore/bitmap.cpp
readOpenEXR/writeOpenEXR).  This environment has no OpenEXR bindings, so
we implement the subset of the format a renderer needs directly:

* write: scanline images, FLOAT or HALF channels, NO or ZIPS compression
* read: scanline images, UINT/HALF/FLOAT channels, NONE/ZIP/ZIPS
  compression (ZIP is what most tools emit by default)

Format reference: "OpenEXR File Layout" (openexr.com), public spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXELTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}
_PT_SIZE = {0: 4, 1: 2, 2: 4}

# compression id -> scanlines per chunk
_COMPRESSION_LINES = {0: 1, 2: 1, 3: 16, 4: 32}


def _write_attr(f, name: bytes, typ: bytes, data: bytes):
    f.write(name + b"\x00" + typ + b"\x00")
    f.write(struct.pack("<i", len(data)))
    f.write(data)


def write_exr(path, image, half=True, compression="zips"):
    """Write an [H, W, C] float array as scanline EXR.

    C in {1, 3, 4}: Y / RGB / RGBA channel naming.
    """
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}[c]
    # EXR requires channels sorted by name
    order = sorted(range(c), key=lambda i: names[i])
    pt = 1 if half else 2
    dtype = np.float16 if half else np.float32
    psize = 2 if half else 4
    comp_id = {"none": 0, "zips": 2}[compression]

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        chan = b""
        for i in order:
            chan += names[i].encode() + b"\x00"
            chan += struct.pack("<iBBBBii", pt, 0, 0, 0, 0, 1, 1)
        chan += b"\x00"
        _write_attr(f, b"channels", b"chlist", chan)
        _write_attr(f, b"compression", b"compression", bytes([comp_id]))
        box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        _write_attr(f, b"dataWindow", b"box2i", box)
        _write_attr(f, b"displayWindow", b"box2i", box)
        _write_attr(f, b"lineOrder", b"lineOrder", b"\x00")
        _write_attr(f, b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        _write_attr(
            f, b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0)
        )
        _write_attr(f, b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        f.write(b"\x00")  # end of header

        offset_table_pos = f.tell()
        f.write(b"\x00" * 8 * h)  # placeholder offsets

        offsets = []
        for y in range(h):
            offsets.append(f.tell())
            scan = np.concatenate(
                [np.ascontiguousarray(img[y, :, i].astype(dtype)).view(np.uint8)
                 for i in order]
            ).tobytes()
            if comp_id == 2:
                packed = _zip_compress(scan)
                if len(packed) >= len(scan):
                    packed = scan  # spec: store raw if not smaller
            else:
                packed = scan
            f.write(struct.pack("<ii", y, len(packed)))
            f.write(packed)

        f.seek(offset_table_pos)
        f.write(struct.pack("<%dQ" % h, *offsets))


def _zip_compress(raw: bytes) -> bytes:
    """EXR ZIP predictor (ImfZip.cpp): reorder-split, delta-encode, deflate."""
    arr = np.frombuffer(raw, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    split = np.empty(n, np.uint8)
    split[:half] = arr[0::2]
    split[half:] = arr[1::2]
    delta = split.astype(np.int64)
    delta = delta.copy()
    delta[1:] = delta[1:] - split[:-1].astype(np.int64) + 128
    return zlib.compress((delta & 0xFF).astype(np.uint8).tobytes())


def _zip_decompress(data: bytes, expected: int) -> bytes:
    raw = zlib.decompress(data)
    arr = np.frombuffer(raw, np.uint8)
    n = len(arr)
    # un-delta over the whole buffer: t[i] = t[i-1] + d[i] - 128 (mod 256)
    deltas = arr.astype(np.int64).copy()
    deltas[1:] -= 128
    flat = (np.cumsum(deltas) & 0xFF).astype(np.uint8)
    # un-reorder: first half goes to even positions, second to odd
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = flat[:half]
    out[1::2] = flat[half:]
    return out.tobytes()[:expected]


def read_exr(path):
    """Read a scanline EXR -> (float32 [H, W, C] array, channel names)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise NotImplementedError("tiled EXR not supported")
    pos = 8

    def read_cstr(p):
        end = data.index(b"\x00", p)
        return data[p:end].decode("latin1"), end + 1

    attrs = {}
    while True:
        if data[pos] == 0:
            pos += 1
            break
        name, pos = read_cstr(pos)
        typ, pos = read_cstr(pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos : pos + size])
        pos += size

    # channels
    chlist = attrs["channels"][1]
    channels = []
    cpos = 0
    while chlist[cpos] != 0:
        end = chlist.index(b"\x00", cpos)
        cname = chlist[cpos:end].decode("latin1")
        cpos = end + 1
        pt, _, _, _, _, xs, ys = struct.unpack_from("<iBBBBii", chlist, cpos)
        cpos += 16
        channels.append((cname, pt))
    comp = attrs["compression"][1][0]
    if comp not in _COMPRESSION_LINES:
        raise NotImplementedError(f"EXR compression {comp} not supported")
    xmin, ymin, xmax, ymax = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = xmax - xmin + 1, ymax - ymin + 1

    lines_per_chunk = _COMPRESSION_LINES[comp]
    nchunks = (h + lines_per_chunk - 1) // lines_per_chunk
    offsets = struct.unpack_from("<%dQ" % nchunks, data, pos)

    planes = {
        cname: np.zeros((h, w), np.float32) for cname, _ in channels
    }
    bytes_per_line = sum(_PT_SIZE[pt] * w for _, pt in channels)
    for off in offsets:
        y, sz = struct.unpack_from("<ii", data, off)
        chunk = data[off + 8 : off + 8 + sz]
        ln = min(lines_per_chunk, ymax - y + 1)
        expected = bytes_per_line * ln
        if comp in (2, 3) and sz != expected:
            chunk = _zip_decompress(chunk, expected)
        elif comp == 4 and sz != expected:
            from mitsuba_tpu.io.piz import piz_uncompress

            chunk = piz_uncompress(chunk, channels, w, ln)
        cp = 0
        for line in range(ln):
            for cname, pt in channels:
                nbytes = _PT_SIZE[pt] * w
                seg = np.frombuffer(
                    chunk[cp : cp + nbytes], _PIXELTYPE[pt]
                ).astype(np.float32)
                planes[cname][y - ymin + line] = seg
                cp += nbytes

    names = [c for c, _ in channels]
    # order as RGBA / Y when possible
    pref = [n for n in ("R", "G", "B", "A") if n in names]
    if pref:
        names = pref + [n for n in names if n not in pref]
    img = np.stack([planes[n] for n in names], axis=-1)
    return img, names
