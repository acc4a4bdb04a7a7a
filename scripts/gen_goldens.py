#!/usr/bin/env python
"""Generate committed golden renders for the BASELINE config 3-4 oracle
(VERDICT r4 weak #4: image-MEAN agreement at 48^2 can hide compensating
per-pixel errors exactly where MIS goes wrong).

Renders the Veach-MIS analog at 128^2 and the envmap+BVH scene at 64^2
with high sample budgets, CROSS-VALIDATES path vs bdpt (resp. ptracer)
per 16x16 tile at generation time, and writes float16 .npy goldens under
tests/goldens/ for cheap per-tile regression tests (mfilm.cpp:127 role —
numpy matrices as the verification format).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# default CPU; GOLDEN_TPU=1 renders on the real chip (much faster)
import jax

if not os.environ.get("GOLDEN_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def tile_err(a, b, ts=16):
    """Relative L1 of per-tile means."""
    H, W = a.shape[:2]
    ta = a[:H - H % ts, :W - W % ts].reshape(H // ts, ts, W // ts, ts, 3)
    tb = b[:H - H % ts, :W - W % ts].reshape(H // ts, ts, W // ts, ts, 3)
    ma = ta.mean(axis=(1, 3, 4))
    mb = tb.mean(axis=(1, 3, 4))
    return np.abs(ma - mb) / np.maximum(ma, 1e-3)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(GOLD)))
    from test_baseline_scenes import _veach_mis_scene, envmap_bvh_scene
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, sensor as S
    from mitsuba_tpu.render.integrators.common import (
        IntegratorConfig, PATH, BDPT, PTRACER)

    os.makedirs(GOLD, exist_ok=True)

    # --- Veach MIS at 128^2
    scene, static, _ = _veach_mis_scene()
    cam = Transform.look_at([0, 1.2, -2.8], [0, 1.0, 1.0], [0, 1, 0])
    sens = S.make_perspective(cam, 38.0, 128, 128)
    st = api.RenderSettings(width=128, height=128, spp=1024, spp_per_pass=16,
                            filter_type=0)
    img_p = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=3), st))
    print("veach path done", img_p.mean(), flush=True)
    st_b = api.RenderSettings(width=128, height=128, spp=384,
                              spp_per_pass=8, filter_type=0)
    img_b = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=BDPT, max_depth=3), st_b))
    print("veach bdpt done", img_b.mean(), flush=True)
    te = tile_err(img_p, img_b)
    print(f"veach tile err: mean {te.mean():.4f} max {te.max():.4f}",
          flush=True)
    assert te.mean() < 0.03 and te.max() < 0.10, (
        "path/bdpt per-tile divergence at generation time", te.max())
    np.save(os.path.join(GOLD, "veach_mis_128_path.npy"),
            img_p.astype(np.float16))

    # --- envmap+BVH at 64^2
    scene, static, _ = envmap_bvh_scene.__wrapped__()
    cam = Transform.look_at([0, 0.7, -1.6], [0, 0.0, 0.4], [0, 1, 0])
    sens = S.make_perspective(cam, 45.0, 64, 64)
    st = api.RenderSettings(width=64, height=64, spp=1024, spp_per_pass=16,
                            filter_type=0)
    img_p = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=2), st))
    print("envmap path done", img_p.mean(), flush=True)
    imgs_t = [np.asarray(api.render_light_traced(
        scene, static, sens, IntegratorConfig(type=PTRACER, max_depth=2),
        api.RenderSettings(width=64, height=64, spp=2048, spp_per_pass=16,
                           filter_type=0, seed=s))) for s in (1, 2)]
    img_t = 0.5 * (imgs_t[0] + imgs_t[1])
    print("envmap ptracer done", img_t.mean(), flush=True)
    # surface region only: a pure light tracer has no camera-escape path,
    # so the directly-visible sky exists only in the eye-traced image
    # (true of the reference's ptracer too) — mask sky tiles
    sky = img_t.max(axis=2) == 0.0
    img_p_s = np.where(sky[..., None], 0.0, img_p)
    te = tile_err(img_p_s, img_t)
    ts = 16
    H, W = sky.shape
    surf = (~sky)[:H - H % ts, :W - W % ts].reshape(
        H // ts, ts, W // ts, ts).mean(axis=(1, 3))
    te = te[surf > 0.5]  # tiles that are mostly surface
    print(f"envmap tile err (surface): mean {te.mean():.4f} "
          f"max {te.max():.4f}", flush=True)
    assert te.mean() < 0.08, ("path/ptracer per-tile divergence", te.mean())
    np.save(os.path.join(GOLD, "envmap_bvh_64_path.npy"),
            img_p.astype(np.float16))
    print("goldens written", flush=True)


if __name__ == "__main__":
    main()
