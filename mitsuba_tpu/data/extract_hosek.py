"""One-off extraction of the published Hosek-Wilkie sky-model dataset
(SIGGRAPH 2012, "An Analytic Model for Full Spectral Sky-Dome
Radiance") from the sample-implementation header shipped with the
reference (src/emitters/sunsky/skymodeldata.h) into hosek_rgb.npz.

The numbers are the paper's published fitted coefficients (scientific
data, not code); only the RGB variant is packed (the renderer is RGB).

Layout: rgb [3 channels, 2 albedos, 10 turbidities, 6 elevation
control points, 9 coefficients]; rad [3, 2, 10, 6].

Usage: python mitsuba_tpu/data/extract_hosek.py /path/to/skymodeldata.h
"""

import re
import sys

import numpy as np


def extract(path, out):
    text = open(path).read()
    arrays = {}
    for m in re.finditer(
        r"double (datasetRGB(?:Rad)?\d)\[\]\s*=\s*\{(.*?)\};",
        text, re.S,
    ):
        name, body = m.group(1), m.group(2)
        body = re.sub(r"//[^\n]*", "", body)
        vals = [float(x) for x in re.findall(r"[-+0-9.eE]+", body)]
        arrays[name] = np.asarray(vals, np.float64)

    rgb = np.stack(
        [arrays[f"datasetRGB{i}"].reshape(2, 10, 6, 9) for i in (1, 2, 3)]
    )
    rad = np.stack(
        [arrays[f"datasetRGBRad{i}"].reshape(2, 10, 6) for i in (1, 2, 3)]
    )
    np.savez_compressed(out, rgb=rgb.astype(np.float32),
                        rad=rad.astype(np.float32))
    print(f"wrote {out}: rgb {rgb.shape}, rad {rad.shape}")


if __name__ == "__main__":
    import os

    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/src/emitters/sunsky/skymodeldata.h"
    )
    here = os.path.dirname(os.path.abspath(__file__))
    extract(src, os.path.join(here, "hosek_rgb.npz"))
