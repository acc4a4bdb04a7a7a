#!/usr/bin/env python
"""One-time generator for mitsuba_tpu/data/hosek_rgb.npz.

Extracts the PUBLISHED Hosek-Wilkie RGB sky-model coefficient dataset
("An Analytic Model for Full Spectral Sky-Dome Radiance", SIGGRAPH 2012
supplemental data, shipped with the authors' ArHosekSkyModel reference
release and redistributed verbatim inside Mitsuba's
src/emitters/sunsky/skymodeldata.h). These are third-party published
CONSTANTS (like the Perez coefficient tables or the Joe-Kuo Sobol
numbers), not reference code: the evaluation/cooking code in
render/sunsky.py is written from the paper's formulas.

Layout written:
  coefs (3, 2, 10, 6, 9) float32 — channel, albedo {0,1}, turbidity 1..10,
      quintic-bezier elevation control point, config param 0..8
  rads  (3, 2, 10, 6)    float32 — the matching zenith radiance spline
"""
import os
import re
import sys

import numpy as np

SRC = "/root/reference/src/emitters/sunsky/skymodeldata.h"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "mitsuba_tpu", "data", "hosek_rgb.npz")


def extract(name, text):
    m = re.search(rf"double\s+{name}\[\]\s*=\s*\{{(.*?)\}};", text, re.S)
    if m is None:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"//[^\n]*", "", m.group(1))
    return np.asarray([float(x) for x in
                       re.findall(r"[-+0-9.eE]+", body)], np.float64)


def main():
    text = open(SRC).read()
    coefs = np.zeros((3, 2, 10, 6, 9), np.float64)
    rads = np.zeros((3, 2, 10, 6), np.float64)
    for c in range(3):
        flat = extract(f"datasetRGB{c + 1}", text)
        assert flat.size == 2 * 10 * 6 * 9, flat.size
        coefs[c] = flat.reshape(2, 10, 6, 9)
        fr = extract(f"datasetRGBRad{c + 1}", text)
        assert fr.size == 2 * 10 * 6, fr.size
        rads[c] = fr.reshape(2, 10, 6)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, coefs=coefs.astype(np.float32),
                        rads=rads.astype(np.float32))
    print(f"wrote {OUT}: coefs {coefs.shape}, rads {rads.shape}")


if __name__ == "__main__":
    main()
