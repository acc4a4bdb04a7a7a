"""mtsimport — COLLADA/OBJ scene converter CLI (reference:
src/converter/mtsimport.cpp; COLLADA walk collada.cpp:1688, OBJ obj.cpp).

Usage: ``python -m mitsuba_tpu.mtsimport input.{dae,obj} output.xml
[-r WxH] [-s spp]``. Produces a reference-syntax scene XML plus a
``.serialized`` geometry blob next to it, loadable with
io.mitsuba_xml.load_scene or the main CLI.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mtsimport")
    ap.add_argument("input", help="COLLADA .dae or wavefront .obj file")
    ap.add_argument("output", help="output scene .xml")
    ap.add_argument("-r", "--resolution", default="512x512",
                    help="film resolution WxH")
    ap.add_argument("-s", "--spp", type=int, default=64)
    args = ap.parse_args(argv)
    w, h = (int(x) for x in args.resolution.lower().split("x"))

    ext = os.path.splitext(args.input)[1].lower()
    if ext == ".dae":
        from .io.collada import convert
        convert(args.input, args.output, spp=args.spp, size=(w, h))
    elif ext == ".obj":
        # OBJ loads natively; emit an XML wrapper plus serialized geometry
        # (the converter normalizes everything to the same output format)
        from .io.collada import escape  # noqa: F401
        from .io.mesh import load_obj, save_serialized
        meshes = load_obj(args.input, split_by_material=True)
        if not isinstance(meshes, list):
            meshes = [meshes]
        base = os.path.splitext(os.path.basename(args.output))[0]
        ser = os.path.join(os.path.dirname(os.path.abspath(args.output)),
                           base + ".serialized")
        save_serialized(ser, meshes)
        lines = ['<?xml version="1.0" encoding="utf-8"?>',
                 '<scene version="0.6.0">', '    <integrator type="path"/>']
        for i in range(len(meshes)):
            lines += [
                '    <shape type="serialized">',
                f'        <string name="filename" '
                f'value="{escape(os.path.basename(ser))}"/>',
                f'        <integer name="shapeIndex" value="{i}"/>',
                '        <bsdf type="diffuse"/>',
                '    </shape>']
        lines.append('</scene>')
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + "\n")
    else:
        print(f"unsupported input format: {ext}", file=sys.stderr)
        return 1
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
