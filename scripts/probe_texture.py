#!/usr/bin/env python
"""Probe: per-call cost of texture & envmap evaluation at bench-scale lane
counts on TPU (the ~270 ms/5-bounce texture delta in probe_bench_breakdown)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import bench
    from mitsuba_tpu.render import emitter as em_mod
    from mitsuba_tpu.render.texture import eval_texture, _bitmap_trilinear

    scene, static = bench.build_bunny_scene()
    R = 512 * 512
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(0, 1, (R, 2)).astype(np.float32))
    tex_id = jnp.zeros(R, jnp.int32)
    default = jnp.ones((R, 3))
    lod = jnp.asarray(rng.uniform(0, 4, R).astype(np.float32))
    fp = jnp.asarray(rng.uniform(0, 0.01, R).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    u2 = jnp.asarray(rng.uniform(0, 1, (R, 2)).astype(np.float32))

    tt = scene.textures

    f1 = jax.jit(lambda uv: eval_texture(tt, tex_id, uv, default))
    print(f"eval_texture (no mip):    {timeit(f1, uv)*1e3:7.2f} ms", flush=True)

    f2 = jax.jit(lambda uv, fp: eval_texture(tt, tex_id, uv, default, fp_uv=fp))
    print(f"eval_texture (mip/fp):    {timeit(f2, uv, fp)*1e3:7.2f} ms", flush=True)

    f3 = jax.jit(lambda uv, lod: _bitmap_trilinear(tt, tex_id, uv, lod))
    print(f"_bitmap_trilinear:        {timeit(f3, uv, lod)*1e3:7.2f} ms", flush=True)

    f4 = jax.jit(lambda d: em_mod.eval_env(scene, static, d))
    print(f"eval_env:                 {timeit(f4, d)*1e3:7.2f} ms", flush=True)

    f5 = jax.jit(lambda d: em_mod.pdf_direct_env(scene, static, d))
    print(f"pdf_direct_env:           {timeit(f5, d)*1e3:7.2f} ms", flush=True)

    f6 = jax.jit(lambda u2: em_mod._envmap_sample(scene.emitters, u2))
    print(f"_envmap_sample:           {timeit(f6, u2)*1e3:7.2f} ms", flush=True)

    p_ref = jnp.asarray(rng.uniform(-1, 1, (R, 3)).astype(np.float32))
    u3 = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
    f7 = jax.jit(lambda p, u: em_mod.sample_direct(scene, static, p, u))
    print(f"emitter sample_direct:    {timeit(f7, p_ref, u3)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
