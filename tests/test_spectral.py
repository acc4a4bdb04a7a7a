"""Hero-wavelength spectral mode (reference spectral build,
spectrum.h:25-32): uplift round trip, white furnace exactness, and Cauchy
dispersion through a dielectric."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import spectrum as sp


def test_uplift_roundtrip_exact():
    wl = jnp.asarray(np.arange(sp.WL_MIN, sp.WL_MAX + 1e-3, 2.0))
    for rgb in [(1, 1, 1), (0.2, 0.5, 0.8), (0.9, 0.1, 0.05), (0, 0, 0)]:
        S = np.asarray(sp.uplift_rgb(jnp.asarray(rgb, jnp.float32), wl))
        back = sp.spd_to_rgb(np.asarray(wl), S * np.asarray(sp._D65(np.asarray(wl))))
        assert np.allclose(back, rgb, atol=2e-3), (rgb, back)


def test_white_uplift_is_unity():
    wl = jnp.linspace(380.0, 800.0, 64)
    S = np.asarray(sp.uplift_rgb(jnp.ones(3, jnp.float32), wl))
    assert np.all(np.abs(S - 1.0) < 5e-3), S


def test_spectral_mc_white():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(100_000), jnp.float32)
    wl, pdf = sp.sample_wavelengths(u)
    L = sp.uplift_rgb(jnp.ones((100_000, 3), jnp.float32), wl) * sp.d65(wl)
    out = np.asarray(sp.spectral_to_rgb(L, wl, pdf)).mean(0)
    assert np.allclose(out, 1.0, atol=0.03), out


def test_spectral_render_env_matches_rgb():
    """Env-only scene: spectral render reproduces the emitter RGB."""
    from mitsuba_tpu.render.scene import SceneBuilder
    from mitsuba_tpu.render import api, sensor as S
    from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
    from mitsuba_tpu.core.transform import Transform

    b = SceneBuilder()
    b.add_constant_emitter((0.25, 0.5, 0.75))
    # a far dummy triangle: scenes need >= 1 primitive
    b.add_mesh([[1e4, 1e4, 1e4], [1e4 + 1, 1e4, 1e4], [1e4, 1e4 + 1, 1e4]],
               [[0, 1, 2]], b.add_material())
    scene, static = b.build()
    cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    sens = S.make_perspective(cam, 60.0, 8, 8)
    st = api.RenderSettings(width=8, height=8, spp=512, spp_per_pass=8)
    img = np.asarray(api.render_spectral(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=2), st))
    mean = img.mean(axis=(0, 1))
    assert np.allclose(mean, [0.25, 0.5, 0.75], rtol=0.04), mean


@pytest.mark.slow
def test_dispersion_changes_transport():
    """Cauchy dispersion (material cauchy_b) must (a) shift the dielectric
    eta per wavelength exactly as eta(l) = eta_d + B(1/l^2 - 1/l_d^2) and
    (b) measurably change the spectral render of a glass slab relative to
    the non-dispersive material, beyond the seed-to-seed noise floor."""
    import jax.numpy as jnp
    from mitsuba_tpu.render.scene import SceneBuilder
    from mitsuba_tpu.render import api, bsdf as B, sensor as S, shapes as sh
    from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
    from mitsuba_tpu.core.transform import Transform

    # (a) eta shift formula (the path integrator's exact expression)
    for wl, expect_sign in [(400.0, +1), (700.0, -1)]:
        wl_um = wl * 1e-3
        d_eta = 0.02 * (1.0 / wl_um**2 - 1.0 / 0.5893**2)
        assert np.sign(d_eta) == expect_sign
    # Snell: different eta -> different refraction direction
    from mitsuba_tpu.core import math as mm
    wi = jnp.asarray([[0.5, 0.0, np.sqrt(0.75)]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    _, wo_r = mm.refract(wi, n, jnp.asarray([1.45]))
    _, wo_b = mm.refract(wi, n, jnp.asarray([1.60]))
    assert not np.allclose(np.asarray(wo_r), np.asarray(wo_b), atol=1e-3)

    # (b) end-to-end: dispersive render departs from the non-dispersive
    # beyond the seed noise floor
    def build(cb):
        b = SceneBuilder()
        glass = b.add_material(type=B.DIELECTRIC, eta=1.5, cauchy_b=cb)
        t = Transform.translate([0, 0, 0.5]) * Transform.rotate([0, 1, 0], 40.0)
        v, f, uv = sh.cube(t * Transform.scale([0.6, 0.6, 0.15]))
        b.add_mesh(v, f, glass, uvs=uv)
        v, f, uv = sh.rectangle(Transform.translate([0, 0, 2.0])
                                * Transform.rotate([1, 0, 0], 180.0))
        b.add_mesh(v, f, b.add_material(albedo=(0, 0, 0)),
                   emitter_radiance=(5.0, 5.0, 5.0), uvs=uv)
        return b.build()

    cam = Transform.look_at([0, 0, -1.5], [0, 0, 0.5], [0, 1, 0])
    sens = S.make_perspective(cam, 40.0, 16, 16)
    cfg = IntegratorConfig(type=PATH, max_depth=6)

    def render(cb, seed):
        st = api.RenderSettings(width=16, height=16, spp=192, seed=seed)
        sc, stc = build(cb)
        return np.asarray(api.render_spectral(sc, stc, sens, cfg, st))

    img_n1 = render(0.0, 1)
    img_n2 = render(0.0, 2)
    img_d = render(0.3, 1)   # strong dispersion: eta 400nm ~ 2.5
    noise = np.abs(img_n1 - img_n2).mean()
    effect = np.abs(img_d - img_n1).mean()
    assert effect > 3.0 * noise, (effect, noise)
