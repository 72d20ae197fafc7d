"""Portable FloatMap I/O (reference: src/libcore/bitmap.cpp readPFM/writePFM)."""

from __future__ import annotations

import numpy as np


def write_pfm(path, image):
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if c == 1:
        header = b"Pf\n"
        data = img[..., 0]
    elif c == 3:
        header = b"PF\n"
        data = img
    else:
        raise ValueError("PFM supports 1 or 3 channels")
    with open(path, "wb") as f:
        f.write(header)
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little endian
        f.write(np.flipud(data).astype("<f4").tobytes())


def read_pfm(path):
    with open(path, "rb") as f:
        kind = f.readline().strip()
        c = 3 if kind == b"PF" else 1
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        dt = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * c * 4), dt).reshape(h, w, c)
    return np.flipud(data).astype(np.float32)
