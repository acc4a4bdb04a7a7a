"""Irradiance cache + motion-vector AOV tests (misc/irrcache.cpp,
misc/motion.cpp)."""
import numpy as np

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api, sensor as S, shapes
from mitsuba_tpu.render.integrators.common import (
    DIRECT, IRRCACHE, PATH, IntegratorConfig)
from mitsuba_tpu.render.scene import SceneBuilder

CAM = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])


def _st(wh, spp):
    return api.RenderSettings(width=wh, height=wh, spp=spp,
                              spp_per_pass=min(8, spp), filter_type=0)


def test_irrcache_between_direct_and_path(cornell):
    """Cached-indirect render must exceed pure direct (it adds bounce
    light) and land near the path-traced mean (single-bounce cache)."""
    scene, static = cornell
    sens = S.make_perspective(CAM, 39.0, 16, 16)
    direct = np.asarray(api.render(scene, static, sens,
                                   IntegratorConfig(type=DIRECT), _st(16, 8)))
    irc = np.asarray(api.render(scene, static, sens,
                                IntegratorConfig(type=IRRCACHE), _st(16, 8)))
    path = np.asarray(api.render(scene, static, sens,
                                 IntegratorConfig(type=PATH, max_depth=5),
                                 _st(16, 64)))
    assert np.isfinite(irc).all()
    assert irc.mean() > direct.mean() * 1.05          # indirect added
    # within a loose band of converged path tracing (one-bounce cache)
    assert abs(irc.mean() - path.mean()) / path.mean() < 0.30, \
        (direct.mean(), irc.mean(), path.mean())


def test_motion_vectors(cornell):
    """Camera translating right -> scene points move LEFT in image space
    by a roughly uniform pixel offset; static camera -> zero motion."""
    scene, static = cornell
    W = 32
    s0 = S.make_perspective(CAM, 39.0, W, W)
    cam1 = Transform.look_at([0.55, 0.5, -1.39], [0.55, 0.5, 0.5], [0, 1, 0])
    s1 = S.make_perspective(cam1, 39.0, W, W)
    st = _st(W, 1)

    mv = np.asarray(api.render_motion(scene, static, s0, s1, st))
    mask = mv[..., 2] > 0
    assert mask.mean() > 0.9
    assert mv[..., 0][mask].max() < 0.0       # all points move left
    assert abs(mv[..., 1][mask]).mean() < 0.5  # no vertical motion

    mv0 = np.asarray(api.render_motion(scene, static, s0, s0, st))
    assert np.abs(mv0[..., :2]).max() < 1e-4
