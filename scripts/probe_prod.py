#!/usr/bin/env python
"""Probe: production slim-treelet traversal on the bench bunny_x2 scene.
Times coherent/incoherent traversal, the sort alone, and per-block work
stats (debug_counts) to locate the bottleneck of the 970 ms/spp bench."""
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
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from mitsuba_tpu.ops.pallas_bvh import bvh_traverse_treelets

    scene, static = bench.build_bunny_scene()
    print("n_tris", static.n_tris, "rows", scene.bvh_rows.shape,
          "K", scene.tl_root.shape, flush=True)

    R = 1 << 18
    rng = np.random.default_rng(0)
    lo = np.asarray(scene.aabb_lo)
    hi = np.asarray(scene.aabb_hi)
    print("scene aabb", lo, hi, flush=True)
    center = (lo + hi) / 2
    # incoherent: origins in a box around the bunnies, random dirs
    blo = np.array([-0.4, 0.0, -0.4], np.float32)
    bhi = np.array([0.4, 0.25, 0.4], np.float32)
    o_inc = (blo + rng.random((R, 3)) * (bhi - blo)).astype(np.float32)
    d_inc = rng.normal(size=(R, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    # coherent: camera primaries like the bench
    eye = np.array([0.0, 0.25, -0.75], np.float32)
    at = np.array([0.0, 0.1, 0.0], np.float32)
    side = 512
    fwd = at - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    px, py = np.meshgrid(np.linspace(-0.4, 0.4, side),
                         np.linspace(-0.4, 0.4, side))
    d_coh = (fwd[None] + px.ravel()[:, None] * right[None]
             + py.ravel()[:, None] * up[None]).astype(np.float32)
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    d_coh = d_coh[:R]
    o_coh = np.broadcast_to(eye, (R, 3)).astype(np.float32).copy()

    tmin = jnp.zeros(R, jnp.float32)
    tmax = jnp.full(R, np.inf, jnp.float32)

    args = (scene.bvh_rows, scene.tl_root, scene.tl_skip, scene.tl_lo,
            scene.tl_hi)

    # sort cost alone: 10-payload lax.sort at R
    key = jnp.asarray(rng.integers(0, 2**31, R), jnp.int32)
    pay = [jnp.asarray(rng.random(R), jnp.float32) for _ in range(9)]

    def sort_only(key, *pay):
        return jax.lax.sort((key,) + pay, num_keys=1)

    dt, _ = timeit(jax.jit(sort_only), key, *pay)
    print(f"lax.sort 10-payload @262k: {dt*1e3:.2f} ms", flush=True)

    for name, o_, d_ in [("coh", o_coh, d_coh), ("inc", o_inc, d_inc)]:
        o_ = jnp.asarray(o_)
        d_ = jnp.asarray(d_)
        dt, out = timeit(
            lambda o, d: bvh_traverse_treelets(
                *args, o, d, tmin, tmax, scene.aabb_lo, scene.aabb_hi,
                slim=True), o_, d_)
        hr = float(np.asarray(out[0]).mean())
        print(f"{name}: {R/dt/1e6:8.2f} Mrays/s  {dt*1e3:7.1f} ms "
              f"(hit {hr:.3f})", flush=True)
        # work stats
        out = bvh_traverse_treelets(
            *args, o_, d_, tmin, tmax, scene.aabb_lo, scene.aabb_hi,
            slim=True, debug_counts=True)
        stats = np.asarray(out[5])
        strips = stats // 256
        rounds = stats % 256
        print(f"  per-block rounds: mean={rounds.mean():.1f} "
              f"p95={np.percentile(rounds,95):.0f} max={rounds.max()}  "
              f"strips: mean={strips.mean():.0f} "
              f"p95={np.percentile(strips,95):.0f} max={strips.max()} "
              f"sum={strips.sum()}", flush=True)

    # any_hit (shadow) incoherent
    dt, out = timeit(
        lambda o, d: bvh_traverse_treelets(
            *args, o, d, tmin, tmax, scene.aabb_lo, scene.aabb_hi,
            slim=True, any_hit=True), jnp.asarray(o_inc), jnp.asarray(d_inc))
    print(f"inc any_hit: {R/dt/1e6:8.2f} Mrays/s  {dt*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
