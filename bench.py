#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, path tracer depth 5, Cornell box 512^2.

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md); vs_baseline compares
against the first recorded result of this build (bench_baseline.json,
committed after round 1) so later rounds track speedups.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    import numpy as np

    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import film as film_mod
    from mitsuba_tpu.render import rfilter
    from mitsuba_tpu.render import sensor as sensor_mod
    from mitsuba_tpu.render import shapes
    from mitsuba_tpu.render.integrators import path as int_path
    from mitsuba_tpu.render.integrators.common import DIM_APERTURE, DIM_SENSOR, IntegratorConfig, PATH
    from mitsuba_tpu.render.scene import SceneBuilder
    from mitsuba_tpu.core import rng as rng_mod

    W = H = 512
    SPP_PER_PASS = 4
    N_TIMED_PASSES = 8

    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    sens = sensor_mod.make_perspective(cam, 39.0, W, H)
    cfg = IntegratorConfig(type=PATH, max_depth=5)
    pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    seed = jnp.asarray(0, jnp.int32)

    @jax.jit
    def one_pass(scene_, film_data, sample_base):
        """Full production pass: ray gen + path trace + gaussian film splat
        (the complete per-spp pipeline, not just Li)."""
        film = film_mod.Film(data=film_data)
        rays = jnp.zeros(())
        for s in range(SPP_PER_PASS):
            sample_idx = sample_base + s
            u = rng_mod.uniform2(seed, pixel_idx, sample_idx, DIM_SENSOR)
            px = (pixel_idx % W).astype(jnp.float32)
            py = (pixel_idx // W).astype(jnp.float32)
            pos = jnp.stack([px, py], axis=-1) + u
            uv = pos / jnp.asarray([W, H], jnp.float32)
            u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, DIM_APERTURE)
            o, d = sensor_mod.sample_ray(sens, uv, u_ap)
            L, n = int_path.li(scene_, static, cfg, o, d, seed, pixel_idx,
                               sample_idx, with_stats=True)
            film = film_mod.splat_grid(
                film, pos.reshape(H, W, 2), L.reshape(H, W, 3),
                rfilter.GAUSSIAN, 0,
            )
            rays = rays + n
        return film.data, rays

    # warmup / compile
    acc, rays = one_pass(scene, film_mod.Film.empty(H, W).data,
                         jnp.asarray(0, jnp.int32))
    jax.block_until_ready(acc)

    t0 = time.perf_counter()
    total_rays = 0.0
    for i in range(N_TIMED_PASSES):
        acc, rays = one_pass(scene, acc, jnp.asarray((i + 1) * SPP_PER_PASS, jnp.int32))
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    total_rays = float(rays) * N_TIMED_PASSES  # rays/pass is constant given seeds
    rays_per_sec = total_rays / dt

    ms_per_spp = dt / (N_TIMED_PASSES * SPP_PER_PASS) * 1e3

    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = rays_per_sec / base["value"]

    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "scene": "cornell_512_depth5_path",
            "spp_timed": N_TIMED_PASSES * SPP_PER_PASS,
            "ms_per_spp": round(ms_per_spp, 3),
            "device": str(jax.devices()[0]),
            "mean_rgb": [round(float(x), 5) for x in np.asarray(
                film_mod.develop(film_mod.Film(data=acc))).mean(axis=(0, 1))],
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
