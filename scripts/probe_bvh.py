#!/usr/bin/env python
"""Probe: raw BVH traversal throughput on bunny.ply (69k tris) — the
kdbench analog (reference src/utils/kdbench.cpp:30-64 measures rays/s
through the scene bounding sphere)."""
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
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs
    from mitsuba_tpu.ops.pallas_bvh import pack_nodes, bvh_traverse, bvh_traverse_packed
    from mitsuba_tpu.accel.traverse import DeviceBVH, bvh_closest_hit

    m = mesh_io.load_ply("/root/reference/data/tests/bunny.ply")
    v = m.positions.astype(np.float32)
    f = m.faces.astype(np.int32)
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    T = len(f)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    t0 = time.perf_counter()
    bvh = build_bvh(lo, hi)
    t_build = time.perf_counter() - t0
    N = len(bvh.lo)
    rows = jnp.asarray(pack_nodes(bvh, p0, e1, e2))
    print(f"tris={T} nodes={N} rows_mb={N*256/1e6:.1f} build_s={t_build:.2f}",
          flush=True)

    slo = lo.min(axis=0)
    shi = hi.max(axis=0)
    center = (slo + shi) / 2
    radius = 0.5 * np.linalg.norm(shi - slo)

    R = 1 << 18
    rng = np.random.default_rng(0)

    # --- kdbench-style incoherent: random points on bounding sphere -> center-ish
    a = rng.normal(size=(R, 3)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(R, 3)).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    o_inc = (center + radius * 1.5 * a).astype(np.float32)
    d_inc = (center + radius * 0.9 * b - o_inc)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    # --- coherent: pinhole camera looking at the bunny
    eye = center + np.array([0, 0.5 * radius, 2.5 * radius], np.float32)
    side = 512
    px, py = np.meshgrid(np.linspace(-0.5, 0.5, side), np.linspace(-0.5, 0.5, side))
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    d_coh = (fwd[None] + 0.8 * (px.ravel()[:, None] * right[None]
             + py.ravel()[:, None] * up[None])).astype(np.float32)
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.broadcast_to(eye, (side * side, 3)).astype(np.float32).copy()
    o_coh = o_coh[:R]; d_coh = d_coh[:R]

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, np.inf, jnp.float32)
    jlo = jnp.asarray(slo); jhi = jnp.asarray(shi)

    for name, o_, d_ in [("coherent", o_coh, d_coh), ("incoherent", o_inc, d_inc)]:
        o_ = jnp.asarray(o_); d_ = jnp.asarray(d_)
        dt, out = timeit(lambda o, d: bvh_traverse(rows, o, d, tmin, tmax, jlo, jhi),
                         o_, d_, n=3)
        hits = float(out[0].sum())
        print(f"pallas_swept {name}: {R/dt/1e6:.2f} Mrays/s  ({dt*1e3:.1f} ms, "
              f"hit_rate={hits/R:.3f})", flush=True)

    # two-level treelet traversal
    from mitsuba_tpu.accel.build import treelet_roots
    from mitsuba_tpu.ops.pallas_bvh import bvh_traverse_treelets

    roots = treelet_roots(bvh)
    K = len(roots)
    sizes = bvh.skip[roots] - roots
    print(f"treelets K={K} rows min/med/max={sizes.min()}/"
          f"{int(np.median(sizes))}/{sizes.max()}", flush=True)
    tl_root = jnp.asarray(roots)
    tl_skip = jnp.asarray(bvh.skip[roots])
    tl_lo = jnp.asarray(bvh.lo[roots])
    tl_hi = jnp.asarray(bvh.hi[roots])
    for name, o_, d_ in [("coherent", o_coh, d_coh), ("incoherent", o_inc, d_inc)]:
        o_ = jnp.asarray(o_); d_ = jnp.asarray(d_)
        dt, out = timeit(
            lambda o, d: bvh_traverse_treelets(
                rows, tl_root, tl_skip, tl_lo, tl_hi, o, d, tmin, tmax,
                jlo, jhi),
            o_, d_, n=3)
        hits = float(out[0].sum())
        print(f"treelet      {name}: {R/dt/1e6:.2f} Mrays/s  ({dt*1e3:.1f} ms, "
              f"hit_rate={hits/R:.3f})", flush=True)

    if "--xla" in sys.argv:
        # XLA gather traversal for comparison (measured 0.02 Mrays/s on TPU
        # even coherent — kept behind a flag)
        dbvh = DeviceBVH.from_host(bvh, p0, e1, e2)
        for name, o_, d_ in [("coherent", o_coh, d_coh),
                             ("incoherent", o_inc, d_inc)]:
            o_ = jnp.asarray(o_); d_ = jnp.asarray(d_)
            fn = jax.jit(lambda o, d: bvh_closest_hit(dbvh, o, d, tmin, tmax))
            dt, out = timeit(fn, o_, d_, n=3)
            hits = float(out[0].sum())
            print(f"xla_gather   {name}: {R/dt/1e6:.2f} Mrays/s  ({dt*1e3:.1f} ms, "
                  f"hit_rate={hits/R:.3f})", flush=True)


if __name__ == "__main__":
    main()
