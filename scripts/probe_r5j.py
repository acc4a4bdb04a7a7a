#!/usr/bin/env python
"""Round-5 probe J: short strips + li depth split on the bunny bench."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

def timeit(fn, *args, n=4):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
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
    W = H = 512; R = W * H
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

    @jax.jit
    def mk_bounce(o, d):
        its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
        k = jax.random.PRNGKey(1)
        u2 = jax.random.uniform(k, (R, 2))
        from mitsuba_tpu.core import warp as warp_mod
        wo = warp_mod.square_to_cosine_hemisphere(u2)
        d1 = its.sh_frame.to_world(wo)
        o1 = its.p + 1e-4 * its.gn * jnp.sign(jnp.sum(its.gn * d1, -1, keepdims=True))
        return jnp.where(its.valid[:, None], o1, o), jnp.where(its.valid[:, None], d1, d)
    o1, d1 = jax.block_until_ready(mk_bounce(o, d))
    print("bounce rays ready", flush=True)
    pages, n_nodes = scene.bvh_pages, static.n_bvh_nodes
    tmx = jnp.full((R,), 1e30)

    for rr, cn, st in ((4, 24, 5), (4, 40, 3), (2, 16, 10)):
        @jax.jit
        def q(o, d, rr=rr, cn=cn, st=st):
            return pb.bvh_traverse_lane_resort(
                pages, n_nodes, o, d, 1e-4, tmx, scene.aabb_lo,
                scene.aabb_hi, rounds=rr, chunk_nit=cn, strip=st)
        dt = timeit(q, o1, d1)
        print(f"strip={st:2d} resort {rr},{cn}: {dt*1e3:7.2f} ms -> "
              f"{R/dt/1e6:5.2f} Mq/s", flush=True)

    for depth in (1, 3, 5):
        cfg = IntegratorConfig(type=PATH, max_depth=depth)
        @jax.jit
        def li_fn(o, d, cfg=cfg):
            return int_path.li(scene, static, cfg, o, d, seed, pixel_idx,
                               jnp.asarray(0, jnp.int32), pixel_spread=spread)
        dt = timeit(li_fn, o, d, n=3)
        print(f"li depth={depth}: {dt*1e3:7.1f} ms", flush=True)

if __name__ == "__main__":
    main()
