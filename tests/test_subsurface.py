"""Subsurface dipole tests (reference: src/subsurface/dipole.cpp).

Physics anchors: Rd integrates to the diffusion albedo bound, and a
high-albedo translucent slab under constant illumination reflects a
bounded fraction of it through the dipole term."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api, sensor as S, shapes, subsurface as SS
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
from mitsuba_tpu.render.scene import SceneBuilder


def test_dipole_rd_total_reflectance():
    """2*pi int_0^inf Rd(r) r dr <= 1 and increases with albedo
    (Jensen 2001 diffusion-albedo behavior)."""
    rs = jnp.linspace(1e-4, 20.0, 20000)
    dr = float(rs[1] - rs[0])

    def total(sig_s):
        rd = SS.dipole_rd(
            (rs * rs)[:, None], jnp.full((1, 3), sig_s)[0],
            jnp.full((3,), 0.1), jnp.asarray(0.0), jnp.asarray(1.3))
        return float(jnp.sum(rd[:, 0] * rs) * dr * 2.0 * jnp.pi)

    t_low, t_high = total(1.0), total(20.0)
    assert 0.0 < t_low < t_high < 1.0, (t_low, t_high)


def test_dipole_render_endtoend():
    """Lit translucent plane: dipole term produces a finite, positive,
    bounded contribution that scales with scattering albedo."""
    def build(sig_s):
        b = SceneBuilder()
        ss = b.add_subsurface(sigma_s=(sig_s,) * 3, sigma_a=(0.5,) * 3,
                              eta=1.3)
        mat = b.add_material(albedo=(0.0,) * 3, subsurface=ss)
        v, f, uv = shapes.rectangle()
        v = v + np.asarray([0.0, 0.0, 2.0])
        f = f[:, ::-1]  # face the camera/light at z=0 (-Z normal)
        b.add_mesh(v, f, mat, uvs=uv)
        b.add_point_light((0.0, 0.0, 0.0), (8.0,) * 3)
        scene, static = b.build()
        scene = SS.prepare(scene, static, n_points=256, nee_samples=8)
        return scene, static

    cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    sens = S.make_perspective(cam, 30.0, 8, 8)
    st = api.RenderSettings(width=8, height=8, spp=16, spp_per_pass=16,
                            filter_type=0)
    cfg = IntegratorConfig(type=PATH, max_depth=2)

    means = []
    for sig_s in (2.0, 20.0):
        scene, static = build(sig_s)
        img = np.asarray(api.render(scene, static, sens, cfg, st))
        assert np.isfinite(img).all() and img.min() >= 0.0
        means.append(img.mean())
    assert 0 < means[0] < means[1] < 8.0 / (2.0 * 2.0), means


def test_singlescatter_matches_volpath_at_eta_one():
    """Exact refracted single scattering (singlescatter.cpp fast mode):
    at eta=1 the refraction is the identity and Walter's D factor reduces
    to the plain inverse-square geometry term, so the estimator must agree
    with an independently implemented reference — volpath on the SAME
    sphere expressed as a null-boundary homogeneous medium (absorption-
    dominated so multiple scattering is negligible)."""
    from mitsuba_tpu.render import bsdf as B

    sig_s, sig_a = 0.25, 2.0
    W = H = 12

    def render_sss():
        b = SceneBuilder()
        ss = b.add_subsurface(sigma_s=(sig_s,) * 3, sigma_a=(sig_a,) * 3,
                              g=0.0, eta=1.0, mode=SS.MODE_SINGLESCATTER)
        mat = b.add_material(type=B.DIELECTRIC, eta=1.0, subsurface=ss)
        b.add_sphere((0.0, 0.0, 2.0), 0.5, mat)
        # small light on the camera side
        v, f, uv = shapes.rectangle(
            Transform.translate([0.8, 0.8, 0.2])
            * Transform.scale([0.1, 0.1, 1]))
        b.add_mesh(v, f, b.add_material(albedo=(0,) * 3),
                   emitter_radiance=(60.0,) * 3, uvs=uv)
        scene, static = b.build()
        cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
        sens = S.make_perspective(cam, 32.0, W, H)
        return np.asarray(api.render(
            scene, static, sens, IntegratorConfig(type=PATH, max_depth=4),
            api.RenderSettings(width=W, height=H, spp=512, spp_per_pass=64)))

    def render_volpath():
        from mitsuba_tpu.render.integrators.common import VOLPATH

        b = SceneBuilder()
        med = b.add_medium_homogeneous(sigma_s=(sig_s,) * 3,
                                       sigma_a=(sig_a,) * 3)
        mat = b.add_material(type=B.NULL, interior_medium=med)
        b.add_sphere((0.0, 0.0, 2.0), 0.5, mat)
        v, f, uv = shapes.rectangle(
            Transform.translate([0.8, 0.8, 0.2])
            * Transform.scale([0.1, 0.1, 1]))
        b.add_mesh(v, f, b.add_material(albedo=(0,) * 3),
                   emitter_radiance=(60.0,) * 3, uvs=uv)
        scene, static = b.build()
        cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
        sens = S.make_perspective(cam, 32.0, W, H)
        return np.asarray(api.render(
            scene, static, sens,
            IntegratorConfig(type=VOLPATH, max_depth=6, rr_depth=64),
            api.RenderSettings(width=W, height=H, spp=512, spp_per_pass=64)))

    img_s = render_sss()
    img_v = render_volpath()
    assert np.isfinite(img_s).all() and img_s.max() > 0
    # compare the sphere region means (background is black in both)
    ms, mv = img_s.mean(), img_v.mean()
    assert abs(ms - mv) / mv < 0.12, (ms, mv)
