"""Film / reconstruction-filter tests (ImageBlock::put semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.render import film as F
from mitsuba_tpu.render import rfilter


@pytest.mark.parametrize("ftype", [rfilter.BOX, rfilter.TENT, rfilter.GAUSSIAN,
                                   rfilter.MITCHELL, rfilter.CATMULLROM,
                                   rfilter.LANCZOS])
def test_constant_image_stays_constant(ftype):
    """Splatting a constant radiance field must develop to that constant
    (partition-of-unity after weight normalization)."""
    H = W = 16
    film = F.Film.empty(H, W)
    rng = np.random.default_rng(0)
    n = 50_000
    pos = jnp.asarray(rng.uniform(0, W, (n, 2)).astype(np.float32))
    val = jnp.ones((n, 3)) * jnp.asarray([0.25, 0.5, 2.0])
    film = F.splat(film, pos, val, ftype)
    img = np.asarray(F.develop(film))
    interior = img[4:-4, 4:-4]
    np.testing.assert_allclose(
        interior, np.broadcast_to([0.25, 0.5, 2.0], interior.shape), rtol=1e-4
    )


def test_nan_samples_dropped():
    H = W = 8
    film = F.Film.empty(H, W)
    pos = jnp.asarray([[4.5, 4.5], [3.5, 3.5]], jnp.float32)
    val = jnp.asarray([[np.nan, 1.0, 1.0], [2.0, 2.0, 2.0]])
    film = F.splat(film, pos, val, rfilter.BOX)
    img = np.asarray(F.develop(film))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[3, 3], [2, 2, 2], atol=1e-6)
    np.testing.assert_allclose(img[4, 4], 0.0, atol=1e-6)


def test_box_fast_path_matches_scatter():
    H = W = 8
    rng = np.random.default_rng(1)
    vals = rng.uniform(0, 1, (H * W, 3)).astype(np.float32)
    px = np.arange(H * W) % W
    py = np.arange(H * W) // W
    pos = jnp.asarray(np.stack([px + 0.3, py + 0.6], -1), jnp.float32)

    f1 = F.splat(F.Film.empty(H, W), pos, jnp.asarray(vals), rfilter.BOX)
    f2 = F.splat_aligned(F.Film.empty(H, W), jnp.asarray(vals.reshape(H, W, 3)))
    np.testing.assert_allclose(np.asarray(f1.data), np.asarray(f2.data), atol=1e-6)


def test_filter_shapes():
    x = jnp.linspace(-4, 4, 1001)
    for ft in (rfilter.BOX, rfilter.TENT, rfilter.GAUSSIAN, rfilter.MITCHELL,
               rfilter.CATMULLROM, rfilter.LANCZOS):
        v = np.asarray(rfilter.eval_1d(ft, x))
        r = rfilter.RADIUS[ft]
        assert (np.abs(v[np.abs(np.asarray(x)) > r + 1e-3]) < 1e-6).all()
        assert v[500] == v.max()  # peak at center
        # approximate unit integral (B-spline family & lanczos normalized)
        integ = v.sum() * (8 / 1000)
        assert 0.8 < integ < 1.3


def test_develop_ldr_and_tiled():
    """ldrfilm gamma/reinhard develops + tiled streaming develop agree with
    the plain develop (film.py parity for ldrfilm/tiledhdrfilm)."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.render import film as film_mod

    H = W = 8
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 2.0, (H, W, 3)).astype(np.float32)
    f = film_mod.Film(data=jnp.concatenate(
        [jnp.asarray(img), jnp.ones((H, W, 1))], axis=-1))

    ldr = np.asarray(film_mod.develop_ldr(f))           # sRGB
    assert ldr.min() >= 0.0 and ldr.max() <= 1.0
    lin = np.asarray(film_mod.develop_ldr(f, gamma=1.0))
    np.testing.assert_allclose(lin, np.clip(img, 0, 1), atol=1e-5)
    rh = np.asarray(film_mod.develop_ldr(f, tonemap="reinhard"))
    assert rh.min() >= 0.0 and rh.max() <= 1.0

    tiles = dict(film_mod.develop_tiled(f, tile=4))
    full = np.asarray(film_mod.develop(f))
    for (y0, x0), t in tiles.items():
        np.testing.assert_allclose(np.asarray(t), full[y0:y0+4, x0:x0+4],
                                   atol=1e-6)


def test_exr_annotations_and_mfilm():
    """EXR string-attribute metadata round-trip (hdrfilm annotations) and
    MATLAB matrix dump (mfilm EMATLAB mode)."""
    import os
    import tempfile
    import numpy as np
    from mitsuba_tpu.io import image as I

    img = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3) / 10.0
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "a.exr")
        I.write_exr(p, img, metadata={"renderTime": "1.5s", "spp": "64"})
        back = I.read_exr(p)
        np.testing.assert_allclose(back, img, atol=1e-6)
        meta = I.read_exr_metadata(p)
        assert meta["renderTime"] == "1.5s" and meta["spp"] == "64"

        pm = os.path.join(td, "a.m")
        I.write_m(pm, img)
        txt = open(pm).read()
        assert txt.startswith("data = [") and txt.rstrip().endswith("];")


def test_checkpoint_resume_bitwise():
    """Mid-render checkpoint/resume (SURVEY 5.4, beyond the reference's -r
    partial flushes): a render interrupted at half the samples and resumed
    from the checkpoint file is BITWISE equal to an uninterrupted render
    (deterministic counter-based sampling keyed by absolute sample index)."""
    import os
    import tempfile
    from dataclasses import replace

    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, sensor as S, shapes
    from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    sens = S.make_perspective(cam, 39.0, 16, 16)
    cfg = IntegratorConfig(type=PATH, max_depth=3)
    base = api.RenderSettings(width=16, height=16, spp=8, spp_per_pass=2,
                              seed=5)

    straight = np.asarray(api.render(scene, static, sens, cfg, base))

    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "render.ckpt.npz")
        # phase 1: "interrupted" after 4 of 8 spp
        api.render(scene, static, sens, cfg,
                   replace(base, spp=4, checkpoint=ck))
        assert os.path.exists(ck)
        assert int(np.load(ck)["samples"]) == 4
        # phase 2: resume to the full budget
        resumed = np.asarray(api.render(scene, static, sens, cfg,
                                        replace(base, checkpoint=ck)))
    np.testing.assert_array_equal(resumed, straight)
