"""Differentiable-rendering gradient tests (BASELINE config 5): AD gradients
must match finite differences of the same estimator — the capability the
reference lacks entirely (SURVEY preamble)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.parallel import train
from mitsuba_tpu.render import api
from mitsuba_tpu.render import sensor as S
from mitsuba_tpu.render import shapes
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
from mitsuba_tpu.render.scene import SceneBuilder


@pytest.fixture(scope="module")
def setup():
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    sens = S.make_perspective(cam, 39.0, 12, 12)
    cfg = IntegratorConfig(type=PATH, max_depth=3)
    settings = api.RenderSettings(width=12, height=12, spp=8, spp_per_pass=8,
                                  filter_type=0)
    return scene, static, sens, cfg, settings


def _loss_fn(setup, key, leaf_update):
    scene, static, sens, cfg, settings = setup
    target = jnp.full((12, 12, 3), 0.2)

    def loss(theta):
        s = leaf_update(scene, theta)
        return train.render_loss(s, static, sens, cfg, settings, target,
                                 jnp.asarray(0, jnp.int32), settings.spp)

    return loss


def _check_fd(loss, theta0, eps, rtol):
    """AD gradient vs central finite differences of the SAME estimator
    (same RNG counters -> the FD is exact up to float error, no MC noise)."""
    g_ad = float(jax.grad(loss)(theta0))
    lp = float(loss(theta0 + eps))
    lm = float(loss(theta0 - eps))
    g_fd = (lp - lm) / (2 * eps)
    assert g_fd != 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol)


def test_albedo_gradient_fd(setup):
    scene = setup[0]

    def upd(s, theta):
        alb = s.materials.albedo.at[0].set(
            jnp.asarray([theta, theta, theta], jnp.float32))
        return s._replace(materials=s.materials._replace(albedo=alb))

    loss = _loss_fn(setup, "albedo", upd)
    _check_fd(loss, jnp.asarray(0.5), 1e-3, 2e-2)


def test_emitter_radiance_gradient_fd(setup):
    scene = setup[0]

    def upd(s, theta):
        rad = s.emitters.radiance * theta
        return s._replace(emitters=s.emitters._replace(radiance=rad))

    loss = _loss_fn(setup, "radiance", upd)
    _check_fd(loss, jnp.asarray(1.0), 1e-3, 2e-2)


def test_adam_recovers_albedo(setup):
    """Tiny inverse-rendering loop: perturb the white-wall albedo, recover it
    from a rendered target (BASELINE config 5 in miniature). Emitter pixels
    are hidden: their huge radiance makes the MC loss noise swamp the
    albedo signal at test-sized sample counts."""
    scene, static, sens, _, settings = setup
    cfg = IntegratorConfig(type=PATH, max_depth=3, hide_emitters=True)
    import optax

    target = np.asarray(api.render(scene, static, sens, cfg, settings))
    target = jnp.asarray(target)

    # start from wrong albedo
    wrong = scene.materials.albedo.at[0].set(jnp.asarray([0.2, 0.2, 0.2]))
    scene_wrong = scene._replace(materials=scene.materials._replace(albedo=wrong))

    spec = train.ParamSpec(albedo=True, emitter_radiance=False)
    params = train.split_params(scene_wrong, spec)
    step, init = train.make_train_step(
        scene_wrong, static, sens, cfg, settings, spec,
        optimizer=optax.adam(3e-2), n_samples=4,
    )
    opt_state = init(params)
    losses = []
    for it in range(250):
        params, opt_state, loss = step(params, opt_state, target,
                                       jnp.asarray(it, jnp.int32))
        losses.append(float(loss))
    true_albedo = np.asarray(setup[0].materials.albedo[0])
    rec = np.asarray(params["albedo"][0])
    # each step's loss is a fresh 4-spp MC estimate (high variance):
    # compare window averages, and above all the recovered parameter
    assert np.mean(losses[-10:]) < np.mean(losses[:5]), losses
    np.testing.assert_allclose(rec, true_albedo, atol=0.1)
