#!/usr/bin/env python
"""Probe: where do the bunny-bench 632 ms/spp go? Times the full production
pass at several depths, intersect-only and shadow-only loops, and the film
splat, to split traversal vs shading/NEE vs splat cost."""
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
    return (time.perf_counter() - t0) / n


def main():
    import bench
    from mitsuba_tpu.core import rng as rng_mod
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import film as film_mod
    from mitsuba_tpu.render import rfilter
    from mitsuba_tpu.render import scene as scene_mod
    from mitsuba_tpu.render import sensor as sensor_mod
    from mitsuba_tpu.render.integrators import path as int_path
    from mitsuba_tpu.render.integrators.common import (
        DIM_SENSOR, IntegratorConfig, PATH)

    scene, static = bench.build_bunny_scene()
    W = H = 512
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

    # 1. full li at depths
    for depth in (1, 2, 3, 5):
        cfg = IntegratorConfig(type=PATH, max_depth=depth)

        @jax.jit
        def li_fn(o, d):
            L, n = int_path.li(scene, static, cfg, o, d, seed, pixel_idx,
                               jnp.asarray(0, jnp.int32), with_stats=True,
                               pixel_spread=spread)
            return L
        dt = timeit(li_fn, o, d)
        print(f"li depth={depth}: {dt*1e3:7.1f} ms", flush=True)

    # 2. intersect only (sorted)
    @jax.jit
    def isect_only(o, d):
        its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
        return its.t
    dt = timeit(isect_only, o, d)
    print(f"ray_intersect (1 query, coherent): {dt*1e3:7.1f} ms", flush=True)

    # 3. shadow query
    @jax.jit
    def shadow_only(o, d):
        return scene_mod.occluded(scene, static, o, d, 1e-4, 10.0)
    try:
        dt = timeit(shadow_only, o, d)
        print(f"occluded  (1 query, coherent): {dt*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print("occluded probe skipped:", e, flush=True)

    # 4. splat
    film = film_mod.Film.empty(H, W)

    @jax.jit
    def splat_only(pos, L, data):
        f = film_mod.Film(data=data)
        f = film_mod.splat_grid(f, pos.reshape(H, W, 2), L.reshape(H, W, 3),
                                rfilter.GAUSSIAN, 0)
        return f.data
    L = jnp.ones((H * W, 3))
    dt = timeit(splat_only, pos, L, film.data)
    print(f"splat_grid gaussian: {dt*1e3:7.1f} ms", flush=True)

    # 5. texture + envmap eval cost: li depth=1 with textures disabled
    import dataclasses
    static_nt = dataclasses.replace(static, has_textures=False)
    cfg = IntegratorConfig(type=PATH, max_depth=5)

    @jax.jit
    def li_nt(o, d):
        L, n = int_path.li(scene, static_nt, cfg, o, d, seed, pixel_idx,
                           jnp.asarray(0, jnp.int32), with_stats=True)
        return L
    dt = timeit(li_nt, o, d)
    print(f"li depth=5 no-texture path: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
