#!/usr/bin/env python
"""Interpret-mode correctness check of the lane kernel on CPU."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs
    from mitsuba_tpu.ops.pallas_bvh import (
        pack_pages, bvh_traverse_lane_packed)
    from mitsuba_tpu.accel.traverse import DeviceBVH, bvh_closest_hit

    rng = np.random.default_rng(0)
    T = 3000
    c = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    p0 = c
    e1 = rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    bvh = build_bvh(lo, hi, leaf_size=1)
    N = len(bvh.lo)
    pages = jnp.asarray(pack_pages(bvh, p0, e1, e2))
    dbvh = DeviceBVH.from_host(bvh, p0, e1, e2)
    print(f"tris={T} nodes={N} pages={pages.shape}")

    R = 2048
    o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin, tmax = 1e-4, 1e9

    ref = bvh_closest_hit(dbvh, o, d, tmin, tmax)
    res = bvh_traverse_lane_packed(pages, N, o, d, tmin, tmax,
                                   interpret=True)
    hit, t, idx, u, v = [np.asarray(x) for x in res]
    rh, rt, ridx = [np.asarray(x) for x in ref[:3]]
    print("hit mismatch:", (hit != rh).sum(), "/", R)
    both = hit & rh
    print("t mismatch:", (np.abs(np.where(both, t - rt, 0)) > 1e-4).sum())
    print("idx mismatch:", (np.where(both, idx != ridx, False)).sum())

    # any-hit
    res = bvh_traverse_lane_packed(pages, N, o, d, tmin, tmax,
                                   interpret=True, any_hit=True)
    hit_a = np.asarray(res[0])
    print("any_hit missing:", (rh & ~hit_a).sum(),
          "extra:", (hit_a & ~rh).sum())


if __name__ == "__main__":
    main()
