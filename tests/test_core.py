"""Core-layer tests: RNG statistics (test_random.cpp role), frames,
transforms, distributions, Fresnel identities."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.distr import DiscreteDistribution
from mitsuba_tpu.core.frame import Frame
from mitsuba_tpu.core.transform import Transform


def test_rng_uniformity():
    n = 1_000_000
    u = np.asarray(rng.uniform1(0, jnp.arange(n, dtype=jnp.int32), 0, 0))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 1e-3
    assert abs(u.var() - 1 / 12) < 1e-3
    # no serial correlation across pixel counter
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 3e-3


def test_rng_dimension_independence():
    n = 200_000
    pix = jnp.arange(n, dtype=jnp.int32)
    a = np.asarray(rng.uniform1(0, pix, 0, 0))
    b = np.asarray(rng.uniform1(0, pix, 0, 1))
    c = np.asarray(rng.uniform1(0, pix, 1, 0))
    d = np.asarray(rng.uniform1(1, pix, 0, 0))
    for x, y in [(a, b), (a, c), (a, d), (b, c)]:
        assert abs(np.corrcoef(x, y)[0, 1]) < 5e-3
        assert not np.array_equal(x, y)


def test_rng_determinism():
    pix = jnp.arange(1000, dtype=jnp.int32)
    a = np.asarray(rng.uniform4(42, pix, 7, 3))
    b = np.asarray(rng.uniform4(42, pix, 7, 3))
    np.testing.assert_array_equal(a, b)


def test_frame_roundtrip():
    n = 10_000
    u = rng.uniform2(9, jnp.arange(n, dtype=jnp.int32), 0, 0)
    from mitsuba_tpu.core import warp

    nrm = warp.square_to_uniform_sphere(u)
    f = Frame.from_normal(nrm)
    v = warp.square_to_uniform_sphere(rng.uniform2(10, jnp.arange(n, dtype=jnp.int32), 0, 0))
    back = f.to_world(f.to_local(v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=2e-6)
    # orthonormality
    s, t, nn = np.asarray(f.s), np.asarray(f.t), np.asarray(f.n)
    np.testing.assert_allclose((s * t).sum(-1), 0, atol=1e-6)
    np.testing.assert_allclose((s * nn).sum(-1), 0, atol=1e-6)
    np.testing.assert_allclose(np.cross(s, t), nn, atol=1e-5)


def test_transform_composition():
    t = (
        Transform.translate([1, 2, 3])
        * Transform.rotate([0, 0, 1], 90)
        * Transform.scale([2, 2, 2])
    )
    p = t.apply_point([1, 0, 0])
    np.testing.assert_allclose(p, [1, 4, 3], atol=1e-12)
    # inverse consistency
    np.testing.assert_allclose(t.inv @ t.m, np.eye(4), atol=1e-12)


def test_look_at_convention():
    t = Transform.look_at([0, 0, -2], [0, 0, 1], [0, 1, 0])
    # camera looks down +z in world here; +y up preserved
    d = t.apply_vector([0, 0, 1])
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-12)
    up = t.apply_vector([0, 1, 0])
    np.testing.assert_allclose(up, [0, 1, 0], atol=1e-12)


def test_discrete_distribution():
    w = jnp.asarray([1.0, 0.0, 3.0, 2.0])
    dd = DiscreteDistribution.from_weights(w)
    n = 500_000
    u = rng.uniform1(3, jnp.arange(n, dtype=jnp.int32), 0, 0)
    idx = np.asarray(dd.sample(u))
    freq = np.bincount(idx, minlength=4) / n
    np.testing.assert_allclose(freq, [1 / 6, 0, 3 / 6, 2 / 6], atol=2e-3)
    idx2, u_re = dd.sample_reuse(u)
    u_re = np.asarray(u_re)
    assert (u_re >= 0).all() and (u_re < 1).all()
    # reused u is itself uniform
    assert abs(u_re.mean() - 0.5) < 2e-3


def test_fresnel_dielectric_limits():
    # normal incidence: ((eta-1)/(eta+1))^2
    F, _ = m.fresnel_dielectric(jnp.asarray([1.0]), 1.5)
    np.testing.assert_allclose(float(F[0]), ((0.5) / 2.5) ** 2, rtol=1e-5)
    # grazing -> 1
    F, _ = m.fresnel_dielectric(jnp.asarray([1e-4]), 1.5)
    assert float(F[0]) > 0.99
    # TIR from inside beyond critical angle (sin_c = 1/1.5)
    cos_c = np.sqrt(1 - (1 / 1.5) ** 2)
    F, _ = m.fresnel_dielectric(jnp.asarray([-0.5 * cos_c]), 1.5)
    np.testing.assert_allclose(float(F[0]), 1.0)
    # energy: reflect+refract symmetric eta<->1/eta at matched angles
    F_out, cos_t = m.fresnel_dielectric(jnp.asarray([0.8]), 1.5)
    F_in, _ = m.fresnel_dielectric(cos_t, 1.5)  # cos_t negative -> inside
    np.testing.assert_allclose(float(F_out[0]), float(F_in[0]), rtol=1e-4)


def test_solve_quadratic():
    v, x0, x1 = m.solve_quadratic(
        jnp.asarray([1.0, 1.0, 0.0, 1.0]),
        jnp.asarray([-3.0, 2.0, 2.0, 0.0]),
        jnp.asarray([2.0, 5.0, -4.0, -4.0]),
    )
    v = np.asarray(v)
    assert v.tolist() == [True, False, True, True]
    np.testing.assert_allclose(np.asarray(x0)[[0, 2, 3]], [1.0, 2.0, -2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(x1)[[0, 2, 3]], [2.0, 2.0, 2.0], atol=1e-6)


def test_spectrum_conversions():
    from mitsuba_tpu.core import spectrum as spec

    rgb = jnp.asarray([[0.2, 0.5, 0.8], [1.0, 1.0, 1.0]])
    back = spec.xyz_to_rgb(spec.rgb_to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)
    # white point: RGB(1,1,1) -> Y = 1
    np.testing.assert_allclose(float(spec.luminance(rgb)[1]), 1.0, atol=1e-4)
    g = spec.srgb_degamma(spec.srgb_gamma(rgb))
    np.testing.assert_allclose(np.asarray(g), np.asarray(rgb), atol=1e-5)
