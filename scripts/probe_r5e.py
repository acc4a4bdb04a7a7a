#!/usr/bin/env python
"""Round-5 probe E: strip-length sweep + manual chunk loop with active-lane
counts per round (tail distribution), on bench bounce rays."""
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
    from mitsuba_tpu.core import rng as rng_mod
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.ops import pallas_bvh as pb
    from mitsuba_tpu.render import scene as scene_mod
    from mitsuba_tpu.render import sensor as sensor_mod
    from mitsuba_tpu.render.integrators.common import DIM_SENSOR

    print("building scene...", flush=True)
    scene, static = bench.build_bunny_scene()
    W = H = 512
    R = W * H
    cam = Transform.look_at([0.0, 0.25, -0.75], [0.0, 0.1, 0.0], [0, 1, 0])
    sens = sensor_mod.make_perspective(cam, 45.0, W, H)
    pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    seed = jnp.asarray(0, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)

    u = rng_mod.uniform2(seed, pixel_idx, 0, DIM_SENSOR)
    px = (pixel_idx % W).astype(jnp.float32)
    py = (pixel_idx // W).astype(jnp.float32)
    pos = jnp.stack([px, py], axis=-1) + u
    uv = pos / jnp.asarray([W, H], jnp.float32)
    o, d = sensor_mod.sample_ray(sens, uv, u)

    @jax.jit
    def mk_bounce(o, d):
        its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
        k = jax.random.PRNGKey(1)
        u2 = jax.random.uniform(k, (R, 2))
        from mitsuba_tpu.core import warp as warp_mod
        wo = warp_mod.square_to_cosine_hemisphere(u2)
        d1 = its.sh_frame.to_world(wo)
        o1 = its.p + 1e-4 * its.gn * jnp.sign(
            jnp.sum(its.gn * d1, -1, keepdims=True))
        return jnp.where(its.valid[:, None], o1, o), \
            jnp.where(its.valid[:, None], d1, d), its.valid

    o1, d1, valid = jax.block_until_ready(mk_bounce(o, d))
    print("bounce rays ready", flush=True)
    pages, n_nodes = scene.bvh_pages, static.n_bvh_nodes
    tmx = jnp.full((R,), 1e30)

    # strip-length sweep at fixed schedule (outer-iteration overhead test)
    for strip in (20,):
        @jax.jit
        def q(o, d, strip=strip):
            return pb.bvh_traverse_lane_resort(
                pages, n_nodes, o, d, 1e-4, tmx, scene.aabb_lo,
                scene.aabb_hi, rounds=2, chunk_nit=max(1, 160 // strip),
                strip=strip)
        dt = timeit(q, o1, d1)
        print(f"strip={strip:3d} resort2 (~160 steps/chunk): {dt*1e3:7.2f} ms",
              flush=True)

    # manual chunk loop: actives per round
    key = pb.ray_sort_keys(o1, d1, scene.aabb_lo, scene.aabb_hi)
    r = jax.lax.sort((key, o1[:, 0], o1[:, 1], o1[:, 2],
                      d1[:, 0], d1[:, 1], d1[:, 2],
                      jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    ox, oy, oz, dx, dy, dz = r[1:7]
    z = jnp.zeros((R,))
    node = jnp.zeros((R,), jnp.int32)
    bt, bi, bu, bv = tmx, jnp.full((R,), -1, jnp.int32), z, z
    tmn = z
    total = 0.0
    for rnd in range(14):
        t0 = time.perf_counter()
        bt, bi, bu, bv, node = jax.block_until_ready(pb._lane_chunk(
            pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
            node, bt, bi, bu, bv, max_nit=16))
        dt = time.perf_counter() - t0
        total += dt
        act = int((np.asarray(node) < n_nodes).sum())
        print(f"round {rnd:2d}: active {act:7d}  chunk {dt*1e3:6.2f} ms",
              flush=True)
        if act == 0:
            break
        rr = jax.lax.sort((node, ox, oy, oz, dx, dy, dz), num_keys=1)
        node, ox, oy, oz, dx, dy, dz = rr
    print(f"manual total: {total*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
