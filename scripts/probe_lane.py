#!/usr/bin/env python
"""Probe: per-lane paged traversal (bvh_traverse_lane) vs the treelet union
sweep on bunny.ply — correctness vs the XLA walk and raw Mrays/s on
kdbench-style incoherent rays and coherent primaries."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from mitsuba_tpu.io import mesh as mesh_io
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs, treelet_roots
    from mitsuba_tpu.ops.pallas_bvh import (
        pack_nodes_slim, pack_pages, bvh_traverse_treelets,
        bvh_traverse_lane, LSTRIP)
    from mitsuba_tpu.accel.traverse import DeviceBVH, bvh_closest_hit

    m = mesh_io.load_ply("/root/reference/data/tests/bunny.ply")
    v = m.positions.astype(np.float32)
    f = m.faces.astype(np.int32)
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    T = len(f)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    bvh = build_bvh(lo, hi, leaf_size=1)
    N = len(bvh.lo)
    pages = jnp.asarray(pack_pages(bvh, p0, e1, e2))
    rows = jnp.asarray(pack_nodes_slim(bvh, p0, e1, e2))
    roots = treelet_roots(bvh, max_nodes=4096)
    tl_root = jnp.asarray(roots)
    tl_skip = jnp.asarray(bvh.skip[roots])
    tl_lo = jnp.asarray(bvh.lo[roots])
    tl_hi = jnp.asarray(bvh.hi[roots])
    dbvh = DeviceBVH.from_host(bvh, p0, e1, e2)
    print(f"tris={T} nodes={N} pages_mb={pages.nbytes/1e6:.1f}", flush=True)

    slo = lo.min(axis=0)
    shi = hi.max(axis=0)
    center = (slo + shi) / 2
    radius = 0.5 * np.linalg.norm(shi - slo)
    slo_j = jnp.asarray(slo)
    shi_j = jnp.asarray(shi)

    R = 1 << 18
    rng = np.random.default_rng(0)

    # kdbench-style incoherent: sphere point -> random interior target
    a = rng.normal(size=(R, 3)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(R, 3)).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    o_inc = (center + radius * a).astype(np.float32)
    d_inc = np.asarray(
        (center + 0.5 * radius * b - o_inc), np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)
    o_inc, d_inc = jnp.asarray(o_inc), jnp.asarray(d_inc)

    # coherent primaries: grid of rays from a camera-ish plane
    side = 512
    u_, v_ = np.meshgrid(np.linspace(-1, 1, side), np.linspace(-1, 1, side))
    o_coh = np.stack([
        center[0] + u_.ravel() * radius,
        center[1] + v_.ravel() * radius,
        np.full(side * side, center[2] - 2.2 * radius),
    ], axis=1).astype(np.float32)
    d_coh = np.tile(np.array([[0, 0, 1]], np.float32), (side * side, 1))
    o_coh, d_coh = jnp.asarray(o_coh), jnp.asarray(d_coh)

    tmin, tmax = 1e-4, 1e9

    # reference result (XLA walk)
    @jax.jit
    def ref_fn(o, d):
        return bvh_closest_hit(dbvh, o, d, tmin, tmax)

    def check(name, res, ref):
        hit, t, idx, u, vv = [np.asarray(x) for x in res[:5]]
        rh, rt = np.asarray(ref[0]), np.asarray(ref[1])
        bad_h = (hit != rh).sum()
        bad_t = (np.abs(np.where(hit & rh, t - rt, 0)) > 1e-3 * radius).sum()
        print(f"  {name}: hit mismatch {bad_h}/{len(hit)}, t mismatch {bad_t}")

    for label, o, d in (("incoherent", o_inc, d_inc),
                        ("coherent", o_coh, d_coh)):
        ref = jax.block_until_ready(ref_fn(o, d))
        print(f"[{label}] R={o.shape[0]}")

        @jax.jit
        def tre_fn(o, d):
            return bvh_traverse_treelets(
                rows, tl_root, tl_skip, tl_lo, tl_hi, o, d, tmin, tmax,
                slo_j, shi_j, slim=True)
        dt, res = timeit(tre_fn, o, d)
        print(f"  treelet(slim8): {dt*1e3:8.2f} ms  "
              f"{o.shape[0]/dt/1e6:8.2f} Mrays/s")
        check("treelet", res, ref)

        for strip in (6, 10, 16):
            @jax.jit
            def lane_fn(o, d):
                return bvh_traverse_lane(
                    pages, N, o, d, tmin, tmax, slo_j, shi_j, strip=strip)
            try:
                dt, res = timeit(lane_fn, o, d)
                print(f"  lane strip={strip:2d}: {dt*1e3:8.2f} ms  "
                      f"{o.shape[0]/dt/1e6:8.2f} Mrays/s")
                check(f"lane{strip}", res, ref)
            except Exception as e:
                print(f"  lane strip={strip}: FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}")

        # any-hit variant
        @jax.jit
        def lane_any(o, d):
            return bvh_traverse_lane(
                pages, N, o, d, tmin, tmax, slo_j, shi_j, any_hit=True)
        try:
            dt, res = timeit(lane_any, o, d)
            hits = int(np.asarray(res[0]).sum())
            print(f"  lane any_hit:  {dt*1e3:8.2f} ms  "
                  f"{o.shape[0]/dt/1e6:8.2f} Mrays/s  ({hits} hits)")
        except Exception as e:
            print(f"  lane any_hit: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
