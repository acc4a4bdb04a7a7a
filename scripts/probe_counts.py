#!/usr/bin/env python
"""Probe: treelet-kernel work accounting on bunny.ply — rounds + strip
iterations per block (debug_counts output), against honest wall timing
(host fetch inside the timed region), to split rows-visited from
cycles-per-row."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force host fetch
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    from mitsuba_tpu.io import mesh as mesh_io
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs, treelet_roots
    from mitsuba_tpu.ops.pallas_bvh import (
        pack_nodes, bvh_traverse_treelets, STRIP, BLOCK)

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
    print(f"N={N} nodes, {len(p0)} tris", flush=True)

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

    mn = 2048
    roots = treelet_roots(bvh, max_nodes=mn, max_roots=512)
    K = len(roots)
    tl_root = jnp.asarray(roots)
    tl_skip = jnp.asarray(bvh.skip[roots])
    tl_lo = jnp.asarray(bvh.lo[roots])
    tl_hi = jnp.asarray(bvh.hi[roots])
    print(f"treelets: K={K} max_nodes={mn}", flush=True)

    freq_ghz = 0.94  # v5e TensorCore ~940 MHz
    for name, o_, d_ in [("coh", o_coh, d_coh), ("inc", o_inc, d_inc)]:
        o_ = jnp.asarray(o_); d_ = jnp.asarray(d_)
        fn = lambda o, d: bvh_traverse_treelets(
            rows, tl_root, tl_skip, tl_lo, tl_hi, o, d, tmin, tmax,
            jlo, jhi, debug_counts=True)
        dt, out = timeit(fn, o_, d_)
        stats = np.asarray(out[5])
        rounds = stats % 256
        strips = stats // 256
        nblocks = len(stats)
        t_per_block = dt / nblocks
        t_per_strip = dt / strips.sum()
        print(f"{name}: {R/dt/1e6:8.2f} Mrays/s  dt={dt*1e3:.1f} ms  "
              f"blocks={nblocks}", flush=True)
        print(f"  rounds/block: mean={rounds.mean():.1f} p95="
              f"{np.percentile(rounds,95):.0f} max={rounds.max()}", flush=True)
        print(f"  strips/block: mean={strips.mean():.1f} p95="
              f"{np.percentile(strips,95):.0f} max={strips.max()} "
              f"(rows/block ~ {strips.mean()*STRIP:.0f})", flush=True)
        print(f"  time/strip = {t_per_strip*1e9:.0f} ns "
              f"(~{t_per_strip*freq_ghz*1e9:.0f} cyc; "
              f"{t_per_strip*freq_ghz*1e9/STRIP:.0f} cyc/row)", flush=True)


if __name__ == "__main__":
    main()
