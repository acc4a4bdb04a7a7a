#!/usr/bin/env python
"""Round-5 profile: split the bunny bounce cost into sort machinery vs
kernel compute. Times multi-payload lax.sort at several payload counts,
one lane chunk, full lane_resort closest + shadow queries on coherent and
incoherent rays, and the depth-2 li pass."""
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
    return (time.perf_counter() - t0) / n


def main():
    import bench
    from mitsuba_tpu.ops import pallas_bvh as pb

    scene, static = bench.build_bunny_scene()
    R = 512 * 512
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lo, hi = np.asarray(scene.aabb_lo), np.asarray(scene.aabb_hi)
    o = jax.random.uniform(k1, (R, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.block_until_ready(o)

    # --- lax.sort cost vs payload count
    for npay in (1, 4, 8, 13):
        keys = jax.random.randint(k3, (R,), 0, 1 << 30)
        pays = [jax.random.uniform(jax.random.PRNGKey(i), (R,))
                for i in range(npay)]

        @jax.jit
        def s(keys, *pays):
            return jax.lax.sort((keys,) + pays, num_keys=1)
        dt = timeit(s, keys, *pays)
        print(f"lax.sort R=262k payloads={npay}: {dt*1e3:7.2f} ms", flush=True)

    pages, n_nodes = scene.bvh_pages, static.n_bvh_nodes
    print(f"n_nodes={n_nodes} pages_shape={pages.shape}", flush=True)

    # --- single chunk (no sort): measures bare kernel throughput
    node0 = jnp.zeros((R,), jnp.int32)
    tmx = jnp.full((R,), 1e30, jnp.float32)
    bi0 = jnp.full((R,), -1, jnp.int32)
    z = jnp.zeros((R,))

    @jax.jit
    def chunk(o, d):
        return pb._lane_chunk(pages, n_nodes, o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2], z,
                              node0, tmx, bi0, z, z, max_nit=16)
    dt = timeit(chunk, o, d)
    print(f"lane chunk(16 strips, unsorted rand): {dt*1e3:7.2f} ms", flush=True)

    # --- full resort traversal, random rays
    @jax.jit
    def full(o, d):
        return pb.bvh_traverse_lane_resort(
            pages, n_nodes, o, d, 1e-4, jnp.full((R,), 1e30), scene.aabb_lo,
            scene.aabb_hi, rounds=2, chunk_nit=16)
    dt = timeit(full, o, d)
    print(f"lane_resort closest rand rays: {dt*1e3:7.2f} ms "
          f"-> {R/dt/1e6:.2f} Mrays/s", flush=True)

    @jax.jit
    def fullany(o, d):
        return pb.bvh_traverse_lane_resort(
            pages, n_nodes, o, d, 1e-4, jnp.full((R,), 1e30), scene.aabb_lo,
            scene.aabb_hi, rounds=2, chunk_nit=16, any_hit=True)
    dt = timeit(fullany, o, d)
    print(f"lane_resort any_hit rand rays: {dt*1e3:7.2f} ms "
          f"-> {R/dt/1e6:.2f} Mrays/s", flush=True)

    # debug counts on plain lane kernel: how many strip iterations?
    @jax.jit
    def cnt(o, d):
        r = pb.bvh_traverse_lane(pages, n_nodes, o, d, 1e-4,
                                 jnp.full((R,), 1e30), scene.aabb_lo,
                                 scene.aabb_hi, sort=True)
        return r[1]
    dt = timeit(cnt, o, d)
    print(f"lane sorted (no resort) rand: {dt*1e3:7.2f} ms "
          f"-> {R/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
