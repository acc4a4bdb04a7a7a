#!/usr/bin/env python
"""Probe: treelet-traversal parameter sweep on bunny.ply — rounds per ray
(host estimate), throughput vs treelet size, K=1 sanity check."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3):
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
    from mitsuba_tpu.ops.pallas_bvh import pack_nodes, bvh_traverse_treelets, bvh_traverse

    m = mesh_io.load_ply("/root/reference/data/tests/bunny.ply")
    v = m.positions.astype(np.float32)
    f = m.faces.astype(np.int32)
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    bvh = build_bvh(lo, hi)
    rows = jnp.asarray(pack_nodes(bvh, p0, e1, e2))
    N = len(bvh.lo)
    slo = lo.min(axis=0); shi = hi.max(axis=0)
    center = (slo + shi) / 2
    radius = 0.5 * np.linalg.norm(shi - slo)
    jlo = jnp.asarray(slo); jhi = jnp.asarray(shi)

    R = 1 << 18
    rng = np.random.default_rng(0)
    a = rng.normal(size=(R, 3)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(R, 3)).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    o_inc = (center + radius * 1.5 * a).astype(np.float32)
    d_inc = (center + radius * 0.9 * b - o_inc)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    eye = center + np.array([0, 0.5 * radius, 2.5 * radius], np.float32)
    side = 512
    px, py = np.meshgrid(np.linspace(-0.5, 0.5, side), np.linspace(-0.5, 0.5, side))
    fwd = center - eye; fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    d_coh = (fwd[None] + 0.8 * (px.ravel()[:, None] * right[None]
             + py.ravel()[:, None] * up[None])).astype(np.float32)
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.broadcast_to(eye, (side * side, 3)).astype(np.float32).copy()[:R]
    d_coh = d_coh[:R]

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, np.inf, jnp.float32)

    # host estimate: boxes entered per ray (subset: 32k rays)
    sub = 1 << 15
    for mn in (512, 1024, 2048, 4096, 8192):
        roots = treelet_roots(bvh, max_nodes=mn, max_roots=512)
        K = len(roots)
        tl_lo_np = bvh.lo[roots]; tl_hi_np = bvh.hi[roots]
        for name, o_, d_ in [("coh", o_coh), ("inc", o_inc)][:0]:
            pass
        for name, o_, d_ in [("coh", o_coh, d_coh), ("inc", o_inc, d_inc)]:
            oo = o_[:sub, None, :]; dd = d_[:sub, None, :]
            inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
            t0 = (tl_lo_np[None] - oo) * inv
            t1 = (tl_hi_np[None] - oo) * inv
            tn = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
            tf = np.maximum(t0, t1).min(axis=2)
            ent = (tn <= tf)
            cnt = ent.sum(axis=1)
            print(f"max_nodes={mn:5d} K={K:3d} {name}: boxes-entered "
                  f"mean={cnt.mean():.2f} p50={np.percentile(cnt,50):.0f} "
                  f"p95={np.percentile(cnt,95):.0f} max={cnt.max()}", flush=True)

    if jax.default_backend() != "tpu":
        print("CPU only — skipping timing")
        return

    for mn in (512, 1024, 2048, 4096, 8192):
        roots = treelet_roots(bvh, max_nodes=mn, max_roots=512)
        K = len(roots)
        tl_root = jnp.asarray(roots)
        tl_skip = jnp.asarray(bvh.skip[roots])
        tl_lo = jnp.asarray(bvh.lo[roots])
        tl_hi = jnp.asarray(bvh.hi[roots])
        line = f"max_nodes={mn:5d} K={K:3d}: "
        for name, o_, d_ in [("coh", o_coh, d_coh), ("inc", o_inc, d_inc)]:
            o_ = jnp.asarray(o_); d_ = jnp.asarray(d_)
            dt, out = timeit(
                lambda o, d: bvh_traverse_treelets(
                    rows, tl_root, tl_skip, tl_lo, tl_hi, o, d, tmin, tmax,
                    jlo, jhi), o_, d_)
            hr = float(np.asarray(out[0]).mean())
            line += f"{name}={R/dt/1e6:8.2f} Mrays/s (hit {hr:.3f})  "
        print(line, flush=True)

    # K=1 sanity: one treelet covering the whole tree == plain sweep cost?
    tl_root = jnp.asarray(np.array([0], np.int32))
    tl_skip = jnp.asarray(np.array([N], np.int32))
    tl_lo = jnp.asarray(slo[None]); tl_hi = jnp.asarray(shi[None])
    o_ = jnp.asarray(o_coh); d_ = jnp.asarray(d_coh)
    dt, _ = timeit(lambda o, d: bvh_traverse_treelets(
        rows, tl_root, tl_skip, tl_lo, tl_hi, o, d, tmin, tmax, jlo, jhi),
        o_, d_)
    print(f"K=1 coherent: {R/dt/1e6:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
    dt, _ = timeit(lambda o, d: bvh_traverse(
        rows, o, d, tmin, tmax, jlo, jhi), o_, d_)
    print(f"plain coherent: {R/dt/1e6:.2f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
