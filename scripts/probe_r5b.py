#!/usr/bin/env python
"""Round-5 probe B: split the bunny bounce cost in bench context.
Times li at depths 1/2/3/5, the closest+shadow queries on realistic
bounce-1 rays under several sort strategies, and the pure shading rest.
"""
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
    from mitsuba_tpu.render.integrators import path as int_path
    from mitsuba_tpu.render.integrators.common import (
        DIM_SENSOR, IntegratorConfig, PATH)

    print("building scene...", flush=True)
    scene, static = bench.build_bunny_scene()
    print("scene built", flush=True)
    W = H = 512
    R = W * H
    cam = Transform.look_at([0.0, 0.25, -0.75], [0.0, 0.1, 0.0], [0, 1, 0])
    sens = sensor_mod.make_perspective(cam, 45.0, W, H)
    pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    seed = jnp.asarray(0, jnp.int32)
    spread = sensor_mod.pixel_spread(sens, W)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)

    u = rng_mod.uniform2(seed, pixel_idx, 0, DIM_SENSOR)
    px = (pixel_idx % W).astype(jnp.float32)
    py = (pixel_idx // W).astype(jnp.float32)
    pos = jnp.stack([px, py], axis=-1) + u
    uv = pos / jnp.asarray([W, H], jnp.float32)
    o, d = sensor_mod.sample_ray(sens, uv, u)
    o = jax.block_until_ready(o)

    # --- li at depths (per-bounce marginal cost)
    for depth in ([] if os.environ.get("SKIP_LI") else (1, 2, 3, 5)):
        cfg = IntegratorConfig(type=PATH, max_depth=depth)

        @jax.jit
        def li_fn(o, d):
            return int_path.li(scene, static, cfg, o, d, seed, pixel_idx,
                               jnp.asarray(0, jnp.int32),
                               pixel_spread=spread)
        dt = timeit(li_fn, o, d, n=3)
        print(f"li depth={depth}: {dt*1e3:7.1f} ms", flush=True)

    # --- realistic bounce-1 rays: primary hits + cosine directions
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

    print('compiling mk_bounce...', flush=True)
    o1, d1, valid = jax.block_until_ready(mk_bounce(o, d))
    print('bounce rays ready', flush=True)
    pages, n_nodes = scene.bvh_pages, static.n_bvh_nodes
    tmx = jnp.full((R,), 1e30)

    # A) lane sort-only
    @jax.jit
    def qa(o, d):
        return pb.bvh_traverse_lane(pages, n_nodes, o, d, 1e-4, tmx,
                                    scene.aabb_lo, scene.aabb_hi)
    print(f"A lane sort-only   bounce rays: {timeit(qa, o1, d1)*1e3:7.2f} ms",
          flush=True)

    # B) lane resort 2,16
    @jax.jit
    def qb(o, d):
        return pb.bvh_traverse_lane_resort(pages, n_nodes, o, d, 1e-4, tmx,
                                           scene.aabb_lo, scene.aabb_hi,
                                           rounds=2, chunk_nit=16)
    print(f"B lane resort 2,16 bounce rays: {timeit(qb, o1, d1)*1e3:7.2f} ms",
          flush=True)

    # C) presort once on host, then packed only (no sorts at all)
    key = pb.ray_sort_keys(o1, d1, scene.aabb_lo, scene.aabb_hi)
    r = jax.lax.sort((key, o1[:, 0], o1[:, 1], o1[:, 2],
                      d1[:, 0], d1[:, 1], d1[:, 2]), num_keys=1)
    os_, ds_ = jnp.stack(r[1:4], -1), jnp.stack(r[4:7], -1)
    os_ = jax.block_until_ready(os_)

    @jax.jit
    def qc(o, d):
        return pb.bvh_traverse_lane_packed(pages, n_nodes, o, d, 1e-4, tmx)
    print(f"C packed presorted bounce rays: {timeit(qc, os_, ds_)*1e3:7.2f} ms",
          flush=True)

    # D) chunked resume presorted, resorts carried inside (no init/unsort)
    z = jnp.zeros((R,))
    bi0 = jnp.full((R,), -1, jnp.int32)
    n0 = jnp.zeros((R,), jnp.int32)

    @jax.jit
    def qd(o, d):
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        node, bt, bi, bu, bv = n0, tmx, bi0, z, z
        orig = jnp.arange(R, dtype=jnp.int32)
        tmn = z
        for k in range(2):
            bt, bi, bu, bv, node = pb._lane_chunk(
                pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
                node, bt, bi, bu, bv, max_nit=16)
            rr = jax.lax.sort(
                (node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig),
                num_keys=1)
            node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig = rr
        bt, bi, bu, bv, node = pb._lane_chunk(
            pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
            node, bt, bi, bu, bv, max_nit=0)
        back = jax.lax.sort((orig, bt, bi, bu, bv), num_keys=1)
        return back
    print(f"D presorted+resorts bounce rays: {timeit(qd, os_, ds_)*1e3:7.2f} ms",
          flush=True)

    # E) shadow-style any_hit on bounce rays
    @jax.jit
    def qe(o, d):
        return pb.bvh_traverse_lane_resort(pages, n_nodes, o, d, 1e-4,
                                           jnp.full((R,), 0.5),
                                           scene.aabb_lo, scene.aabb_hi,
                                           rounds=1, chunk_nit=16,
                                           any_hit=True)
    print(f"E any_hit resort 1,16 bounce:   {timeit(qe, o1, d1)*1e3:7.2f} ms",
          flush=True)

    # F) full interaction record cost (ray_intersect wrapper) vs raw kernel
    @jax.jit
    def qf(o, d):
        its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
        return its.p, its.sh_frame.n, its.uv, its.mat_id
    print(f"F ray_intersect(record) bounce: {timeit(qf, o1, d1)*1e3:7.2f} ms",
          flush=True)

    # G) 19-payload sort (SoA wavefront sort cost)
    pays = [jax.random.uniform(jax.random.PRNGKey(i), (R,))
            for i in range(18)]

    @jax.jit
    def qg(key, *pays):
        return jax.lax.sort((key,) + pays, num_keys=1)
    print(f"G 19-payload lax.sort:          {timeit(qg, key, *pays)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
