#!/usr/bin/env python
"""Round-5 probe F: treelet-aligned wide pages on bench bounce rays."""
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

    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs
    p0 = np.asarray(scene.tri_p0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    host = build_bvh(lo, hi, leaf_size=1)
    N = len(host.lo)
    tmx = jnp.full((R,), 1e30)

    for page in (256, 512):
        t0 = time.perf_counter()
        pw, n_slots = pb.pack_pages_treelet(host, p0, e1, e2, page=page)
        print(f"page={page}: {N} -> {n_slots} slots ({n_slots/N:.2f}x), "
              f"pack {time.perf_counter()-t0:.1f}s, "
              f"{pw.nbytes/1e6:.0f} MB", flush=True)
        pwj = jax.block_until_ready(jnp.asarray(pw))
        for rr, cn in ((2, 16), (1, 16)):
            @jax.jit
            def q(o, d, pwj=pwj, page=page, rr=rr, cn=cn, ns=n_slots):
                return pb.bvh_traverse_lane_resort_w(
                    pwj, ns, o, d, 1e-4, tmx, scene.aabb_lo, scene.aabb_hi,
                    rounds=rr, chunk_nit=cn, page=page)
            dt = timeit(q, o1, d1)
            print(f"  treelet page={page} resort {rr},{cn}: {dt*1e3:7.2f} ms"
                  f" -> {R/dt/1e6:5.2f} Mq/s", flush=True)

        @jax.jit
        def qa(o, d, pwj=pwj, page=page, ns=n_slots):
            return pb.bvh_traverse_lane_resort_w(
                pwj, ns, o, d, 1e-4, tmx, scene.aabb_lo, scene.aabb_hi,
                rounds=1, chunk_nit=16, page=page, any_hit=True)
        dt = timeit(qa, o1, d1)
        print(f"  treelet page={page} any_hit 1,16: {dt*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
