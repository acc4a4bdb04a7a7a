"""Sensor family tests (reference: src/sensors/*) — measurement sensors
against closed-form radiometry, imaging variants against each other."""
import numpy as np

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api
from mitsuba_tpu.render import sensor as S
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
from mitsuba_tpu.render.scene import SceneBuilder


def _env_scene(radiance=(1.0, 1.0, 1.0)):
    b = SceneBuilder()
    b.add_material()
    b.add_constant_emitter(radiance)
    return b.build()


def _render(scene, static, sens, wh=1, spp=256):
    st = api.RenderSettings(width=wh, height=wh, spp=spp,
                            spp_per_pass=min(64, spp), filter_type=0)
    return np.asarray(api.render(scene, static, sens,
                                 IntegratorConfig(type=PATH, max_depth=2), st))


def test_irradiancemeter_constant_env():
    """E above a patch under uniform radiance L0: E = pi * L0
    (irradiancemeter.cpp's measurement; data/tests/test_bidir_0.xml style)."""
    scene, static = _env_scene((2.0, 2.0, 2.0))
    sens = S.make_irradiancemeter([0, 0, 0], [0, 0, 1], radius=0.0)
    val = _render(scene, static, sens)[0, 0]
    np.testing.assert_allclose(val, np.pi * 2.0, rtol=1e-3)


def test_fluencemeter_constant_env():
    """Fluence at a point in uniform radiance L0: 4*pi*L0."""
    scene, static = _env_scene((0.5, 0.5, 0.5))
    sens = S.make_fluencemeter([0, 0, 0])
    val = _render(scene, static, sens)[0, 0]
    np.testing.assert_allclose(val, 4.0 * np.pi * 0.5, rtol=1e-3)


def test_telecentric_matches_orthographic_at_zero_aperture():
    from mitsuba_tpu.render import shapes
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.0], [0.5, 0.5, 0.5], [0, 1, 0])
    i1 = _render(scene, static, S.make_orthographic(cam, 8, 8), wh=8, spp=16)
    i2 = _render(scene, static,
                 S.make_telecentric(cam, 8, 8, aperture_radius=0.0,
                                    focus_distance=1.0), wh=8, spp=16)
    np.testing.assert_allclose(i1, i2, atol=1e-5)


def test_rdist_zero_matches_perspective():
    from mitsuba_tpu.render import shapes
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    i1 = _render(scene, static, S.make_perspective(cam, 39.0, 8, 8),
                 wh=8, spp=16)
    i2 = _render(scene, static,
                 S.make_perspective_rdist(cam, 39.0, 8, 8, kc=(0.0, 0.0)),
                 wh=8, spp=16)
    np.testing.assert_allclose(i1, i2, atol=1e-5)
    # nonzero distortion must change the image
    i3 = _render(scene, static,
                 S.make_perspective_rdist(cam, 39.0, 8, 8, kc=(0.4, 0.0)),
                 wh=8, spp=16)
    assert np.abs(i3 - i1).max() > 1e-3
