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


def test_motion_blur_snapshot_average():
    """Stratified time-snapshot motion blur (deformable.cpp/track.cpp
    replacement): with 2 strata and deterministic keyframes, the blurred
    image equals the average of the per-time renders; an animated
    emitter-lit box leaves a streak covering both poses."""
    from dataclasses import replace

    import jax.numpy as jnp

    from mitsuba_tpu.core.quat import AnimatedTransform
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, sensor as S, shapes as sh
    from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
    from mitsuba_tpu.render.scene import SceneBuilder

    track = AnimatedTransform(
        [0.0, 1.0],
        [Transform.translate([-0.5, 0.0, 2.0]),
         Transform.translate([+0.5, 0.0, 2.0])])

    def build_at(t):
        b = SceneBuilder()
        b.add_constant_emitter((1.0, 1.0, 1.0))
        pose = np.asarray(track.eval(jnp.asarray([t])))[0]  # (3, 4)
        m4 = np.eye(4)
        m4[:3, :] = pose
        tr = Transform.from_matrix(m4)
        v, f, uv = sh.cube(tr * Transform.scale([0.2, 0.2, 0.2]))
        b.add_mesh(v, f, b.add_material(albedo=(0.1, 0.1, 0.1)), uvs=uv)
        return b.build()

    cam = Transform.look_at([0, 0, 0], [0, 0, 2.0], [0, 1, 0])
    sens = S.make_perspective(cam, 60.0, 32, 32)
    cfg = IntegratorConfig(type=PATH, max_depth=2)
    st = api.RenderSettings(width=32, height=32, spp=8, spp_per_pass=4,
                            seed=2)

    blurred = np.asarray(api.render_motion_blur(
        build_at, sens, cfg, st, time_strata=2))
    assert np.isfinite(blurred).all()

    # mechanism check: the blur equals the average of the snapshot renders
    # at the exact stratified times (same rng stream, same per-stratum
    # seeds/spp) — the stratified-snapshot estimator, verified end to end
    rng = np.random.default_rng(st.seed)
    times = [(k + rng.random()) / 2 for k in range(2)]
    parts = []
    for k, t in enumerate(times):
        sc, stc = build_at(float(t))
        parts.append(np.asarray(api.render(
            sc, stc, sens, cfg, replace(st, spp=4, seed=st.seed + k))))
    np.testing.assert_allclose(blurred, np.mean(parts, axis=0), rtol=1e-6)

    # physics check: the blurred occlusion streak is wider than any single
    # snapshot's silhouette
    bg = blurred.mean(axis=-1)[:4].mean()
    def dark_cols(img):
        return int((np.asarray(img).mean(axis=-1)[12:20].mean(axis=0)
                    < 0.9 * bg).sum())
    assert dark_cols(blurred) > dark_cols(parts[0]), (
        dark_cols(blurred), dark_cols(parts[0]))


def test_irrcache_gradients_improve_extrapolation(cornell):
    """Ward-Heckbert gradients (irrcache.cpp HemisphereSampler::process):
    predicting a nearby record's irradiance by gradient extrapolation
    E_i + (x_j - x_i) . tGrad_i must beat the zeroth-order prediction E_i
    on aggregate, and rotational/translational gradients must be finite
    and not identically zero."""
    from mitsuba_tpu.render.integrators import irrcache as IC

    scene, static = cornell
    sens = S.make_perspective(CAM, 39.0, 16, 16)
    cache = IC.build_cache(scene, static, sens, grid=16, n_hemi=256)
    tg = np.asarray(cache.tgrad)
    rg = np.asarray(cache.rgrad)
    assert np.isfinite(tg).all() and np.isfinite(rg).all()
    assert np.abs(tg).max() > 1e-6 and np.abs(rg).max() > 1e-6

    p = np.asarray(cache.p)
    n = np.asarray(cache.n)
    E = np.asarray(cache.E)
    valid = np.asarray(cache.valid)

    err0 = []
    err1 = []
    C = len(p)
    for i in range(C):
        if not valid[i]:
            continue
        d2 = ((p - p[i]) ** 2).sum(-1)
        d2[i] = np.inf
        # coplanar close neighbor with matching normal (same wall)
        cand = np.where(valid & (n @ n[i] > 0.99) & (d2 < 0.02))[0]
        # gradients are first-order: only near coplanar pairs are a fair test
        if not len(cand):
            continue
        j = cand[np.argmin(d2[cand])]
        pred0 = E[i]
        pred1 = np.maximum(E[i] + (p[j] - p[i]) @ tg[i], 0.0)
        err0.append(np.abs(pred0 - E[j]).mean())
        err1.append(np.abs(pred1 - E[j]).mean())
    assert len(err0) > 50
    assert np.mean(err1) < np.mean(err0), (np.mean(err1), np.mean(err0))
