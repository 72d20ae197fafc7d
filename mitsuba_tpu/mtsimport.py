"""Scene importer: OBJ (+ MTL) -> mitsuba scene XML.

Rebuild of the reference's mtsimport converter
(reference: src/converter/{obj.cpp? via GeometryConverter},
src/mtsimport/mtsimport.cpp — the reference converts COLLADA and OBJ
into Mitsuba's XML schema plus .serialized geometry).  This version:

* OBJ: geometry is re-exported per-material as compact `.serialized`
  meshes (io/meshes.py writer) and an XML scene references them;
  MTL materials map to the closest plugin (diffuse / conductor-ish
  phong / dielectric by transparency), with map_Kd -> bitmap texture.
* COLLADA (.dae): not supported — raise with a clear message (the
  reference links Assimp for this; out of scope).

Usage: python -m mitsuba_tpu.mtsimport input.obj output_dir/
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _parse_mtl(path):
    mats = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.strip().split()
            if not tok or tok[0].startswith("#"):
                continue
            if tok[0] == "newmtl":
                cur = tok[1]
                mats[cur] = {}
            elif cur is not None:
                key = tok[0].lower()
                if key in ("kd", "ks", "ke"):
                    mats[cur][key] = [float(x) for x in tok[1:4]]
                elif key in ("ns", "ni", "d", "tr"):
                    mats[cur][key] = float(tok[1])
                elif key == "map_kd":
                    mats[cur]["map_kd"] = tok[-1]
    return mats


def _mat_xml(name, m):
    """MTL -> closest plugin (the reference's material heuristics)."""
    kd = m.get("kd", [0.5, 0.5, 0.5])
    ks = m.get("ks", [0.0, 0.0, 0.0])
    ns = m.get("ns", 0.0)
    d = m.get("d", 1.0 - m.get("tr", 0.0))
    lines = [f'  <bsdf type="{{}}" id="{name}">']
    if d < 0.99 and m.get("ni", 1.0) > 1.0:
        lines[0] = lines[0].format("dielectric")
        lines.append(
            f'    <float name="intIOR" value="{m.get("ni", 1.5)}"/>'
        )
    elif max(ks) > 0.05 and ns > 1.0:
        lines[0] = lines[0].format("phong")
        lines.append(f'    <float name="exponent" value="{ns}"/>')
        lines.append(
            '    <rgb name="specularReflectance" '
            f'value="{ks[0]}, {ks[1]}, {ks[2]}"/>'
        )
        if "map_kd" in m:
            lines.append(
                '    <texture name="diffuseReflectance" type="bitmap">'
                f'<string name="filename" value="{m["map_kd"]}"/>'
                "</texture>"
            )
        else:
            lines.append(
                '    <rgb name="diffuseReflectance" '
                f'value="{kd[0]}, {kd[1]}, {kd[2]}"/>'
            )
    else:
        lines[0] = lines[0].format("diffuse")
        if "map_kd" in m:
            lines.append(
                '    <texture name="reflectance" type="bitmap">'
                f'<string name="filename" value="{m["map_kd"]}"/>'
                "</texture>"
            )
        else:
            lines.append(
                f'    <rgb name="reflectance" value="{kd[0]}, {kd[1]}, '
                f'{kd[2]}"/>'
            )
    lines.append("  </bsdf>")
    return "\n".join(lines)


def import_obj(obj_path, out_dir):
    """Convert an OBJ file into out_dir/{scene.xml, meshes/*.serialized}.

    Returns the scene XML path."""
    from mitsuba_tpu.io.meshes import load_obj, save_serialized

    os.makedirs(os.path.join(out_dir, "meshes"), exist_ok=True)

    mtl = {}
    base = os.path.dirname(obj_path)
    with open(obj_path, "r", errors="replace") as f:
        for line in f:
            tok = line.strip().split()
            if tok and tok[0] == "mtllib":
                mtl.update(_parse_mtl(os.path.join(base, tok[1])))

    meshes = load_obj(obj_path)  # one MeshData per OBJ object/group

    def safe(n):
        return "".join(c if c.isalnum() else "_" for c in n) or "default"

    mat_names = []
    mats_xml = []
    seen = set()
    for mesh in meshes:
        # prefer a material whose name matches the mesh/group name
        name = mesh.name if mesh.name in mtl else next(iter(mtl), "default")
        mat_names.append(safe(name))
        if safe(name) not in seen:
            seen.add(safe(name))
            mats_xml.append(_mat_xml(safe(name), mtl.get(name, {})))

    ser_rel = os.path.join("meshes", "geometry.serialized")
    save_serialized(os.path.join(out_dir, ser_rel), meshes)
    shapes_xml = []
    for i, mesh in enumerate(meshes):
        shapes_xml.append(
            '  <shape type="serialized">\n'
            f'    <string name="filename" value="{ser_rel}"/>\n'
            f'    <integer name="shapeIndex" value="{i}"/>\n'
            f'    <ref id="{mat_names[i]}"/>\n'
            "  </shape>"
        )

    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<scene version="0.5.0">\n'
        '  <integrator type="path"/>\n'
        '  <sensor type="perspective">\n'
        '    <float name="fov" value="45"/>\n'
        "    <transform name=\"toWorld\">\n"
        '      <lookat origin="0, 1, 4" target="0, 0.5, 0" up="0, 1, 0"/>\n'
        "    </transform>\n"
        '    <sampler type="independent">'
        '<integer name="sampleCount" value="64"/></sampler>\n'
        '    <film type="hdrfilm">\n'
        '      <integer name="width" value="768"/>\n'
        '      <integer name="height" value="576"/>\n'
        "    </film>\n"
        "  </sensor>\n"
        '  <emitter type="constant">'
        '<spectrum name="radiance" value="1.0"/></emitter>\n'
        + "\n".join(mats_xml)
        + "\n"
        + "\n".join(shapes_xml)
        + "\n</scene>\n"
    )
    out_xml = os.path.join(out_dir, "scene.xml")
    with open(out_xml, "w") as f:
        f.write(xml)
    return out_xml


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m mitsuba_tpu.mtsimport input.obj out_dir/",
              file=sys.stderr)
        return 1
    src, out_dir = argv
    ext = os.path.splitext(src)[1].lower()
    if ext == ".obj":
        path = import_obj(src, out_dir)
        print(f"wrote {path}")
        return 0
    if ext == ".dae":
        raise NotImplementedError(
            "COLLADA import requires Assimp (reference mtsimport links it); "
            "convert to OBJ first"
        )
    raise ValueError(f"mtsimport: unsupported input format {ext}")


if __name__ == "__main__":
    raise SystemExit(main())
