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
