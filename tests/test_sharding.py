"""Multi-chip determinism (SURVEY §4 implication): the sharded render must
equal the single-device render bitwise-closely, for any mesh factorization —
the TPU analog of "distributed render == serial render" (sampler.h:94-111).
Runs on an 8-device virtual CPU platform (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.parallel.shard import make_mesh, render_sharded
from mitsuba_tpu.render import api
from mitsuba_tpu.render import sensor as S
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH
from mitsuba_tpu.render.scene import SceneBuilder
from mitsuba_tpu.render import shapes


@pytest.fixture(scope="module")
def setup():
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    sens = S.make_perspective(cam, 39.0, 16, 16)
    cfg = IntegratorConfig(type=PATH, max_depth=3)
    settings = api.RenderSettings(width=16, height=16, spp=4, spp_per_pass=4,
                                  filter_type=0)
    return scene, static, sens, cfg, settings


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_matches_single(setup, dp, sp):
    scene, static, sens, cfg, settings = setup
    ref = np.asarray(api.render(scene, static, sens, cfg, settings))
    mesh = make_mesh(jax.devices()[: dp * sp], dp=dp, sp=sp)
    img = np.asarray(render_sharded(scene, static, sens, cfg, settings, mesh))
    # identical sample set -> identical image up to reduction order
    np.testing.assert_allclose(img, ref, rtol=2e-5, atol=2e-6)


def test_gradient_matches_across_mesh(setup):
    """Sharded backward pass must produce the same gradients as single-dev."""
    scene, static, sens, cfg, settings = setup
    from mitsuba_tpu.parallel import train

    spec = train.ParamSpec(albedo=True, emitter_radiance=True)
    params = train.split_params(scene, spec)
    target = jnp.zeros((16, 16, 3))

    def loss(params, mesh):
        s = train.merge_params(scene, params)
        return train.render_loss(s, static, sens, cfg, settings, target,
                                 jnp.asarray(0, jnp.int32), 4, mesh=mesh)

    g_single = jax.grad(loss)(params, None)
    mesh = make_mesh(jax.devices(), dp=4, sp=2)
    g_shard = jax.grad(loss)(params, mesh)
    for k in g_single:
        np.testing.assert_allclose(
            np.asarray(g_shard[k]), np.asarray(g_single[k]), rtol=2e-4, atol=1e-6
        )


def test_bdpt_photon_mlt_sharded_match_single():
    """The bidirectional + particle families through the (dp, sp) mesh
    (bdpt_proc.cpp / gatherproc.cpp / pssmlt_proc.cpp roles): bdpt and
    photon must be bitwise-equal to the single-device render (counter RNG
    keyed by global ids), pssmlt statistically equal (chain partition)."""
    import numpy as np
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.parallel import shard
    from mitsuba_tpu.render import api, sensor as S, shapes
    from mitsuba_tpu.render.integrators.common import (
        IntegratorConfig, BDPT, PHOTONMAPPER, PSSMLT)
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    sens = S.make_perspective(cam, 39.0, 16, 16)
    mesh = shard.make_mesh(dp=4, sp=2)
    st = api.RenderSettings(width=16, height=16, spp=8, filter_type=0)

    cfg = IntegratorConfig(type=BDPT, max_depth=3)
    img = np.asarray(shard.render_bdpt_sharded(
        scene, static, sens, cfg, st, mesh))
    ref = np.asarray(api.render(scene, static, sens, cfg, st))
    np.testing.assert_allclose(img, ref, atol=2e-5)

    cfgp = IntegratorConfig(type=PHOTONMAPPER, max_depth=4,
                            photon_count=8192)
    img = np.asarray(shard.render_photon_sharded(
        scene, static, sens, cfgp, st, mesh))
    ref = np.asarray(api.render(scene, static, sens, cfgp, st))
    np.testing.assert_allclose(img, ref, atol=2e-5)

    cfgm = IntegratorConfig(type=PSSMLT, max_depth=3, chain_count=1024,
                            luminance_samples=4096)
    img = np.asarray(shard.render_mlt_sharded(
        scene, static, sens, cfgm, st, mesh))
    ref = np.asarray(api.render(scene, static, sens, cfgm, st))
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.05
