"""Cross-integrator agreement for adjoint transport (reference test tier 2:
data/tests/test_bidir_*.xml check unidirectional vs adjoint consistency)."""
import numpy as np
import pytest

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api, rfilter
from mitsuba_tpu.render import sensor as sensor_mod
from mitsuba_tpu.render import shapes
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH, PTRACER, VPL
from mitsuba_tpu.render.scene import SceneBuilder


@pytest.fixture(scope="module")
def cornell_setup():
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    W = H = 24
    sens = sensor_mod.make_perspective(cam, 39.0, W, H)
    st = api.RenderSettings(width=W, height=H, spp=96, spp_per_pass=32,
                            filter_type=rfilter.BOX)
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=4), st))
    return scene, static, sens, ref, W, H


def test_ptracer_matches_path(cornell_setup):
    """Light tracing must agree with the path tracer (adjoint consistency,
    the reference's ptracer-vs-path radiometric check)."""
    scene, static, sens, ref, W, H = cornell_setup
    st = api.RenderSettings(width=W, height=H, spp=512)
    img = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PTRACER, max_depth=4), st))
    # means agree tightly; blockwise means within MC noise, excluding the
    # lamp silhouette (edge pixels have huge variance at finite spp)
    interior = ref.mean(-1) < 5.0
    rel_mean = abs(img[interior].mean() - ref[interior].mean()) / ref[interior].mean()
    assert rel_mean < 0.05, rel_mean


def test_vpl_matches_path(cornell_setup):
    scene, static, sens, ref, W, H = cornell_setup
    st = api.RenderSettings(width=W, height=H, spp=16)
    img = np.asarray(api.render(
        scene, static, sens,
        IntegratorConfig(type=VPL, max_depth=4, vpl_count=512, vpl_clamp=0.01),
        st))
    interior = ref.mean(-1) < 5.0
    rel_mean = abs(img[interior].mean() - ref[interior].mean()) / ref[interior].mean()
    # VPL clamping biases slightly down; 6% envelope covers clamp + noise
    assert rel_mean < 0.06, rel_mean


def test_ptracer_point_light_inverse_square():
    """Point light in a box: adjoint render equals forward render (delta
    emitter ray sampling path)."""
    b = SceneBuilder()
    white = b.add_material(albedo=(0.7, 0.7, 0.7))
    v, f, uv = shapes.rectangle(
        Transform.translate([0, 0, 2]) * Transform.rotate([1, 0, 0], 180)
    )
    b.add_mesh(v, f, white, uvs=uv)  # wall at z=2 facing -z (toward camera)
    b.add_point_light([0.0, 0.0, 0.0], (4.0, 4.0, 4.0))
    scene, static = b.build()
    cam = Transform.look_at([0, 0, -1.0], [0, 0, 1.0], [0, 1, 0])
    W = H = 16
    sens = sensor_mod.make_perspective(cam, 60.0, W, H)
    st = api.RenderSettings(width=W, height=H, spp=64, spp_per_pass=32,
                            filter_type=rfilter.BOX)
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=2), st))
    st2 = api.RenderSettings(width=W, height=H, spp=256)
    img = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=PTRACER, max_depth=2), st2))
    sel = ref.mean(-1) > 1e-4
    rel = abs(img[sel].mean() - ref[sel].mean()) / ref[sel].mean()
    assert rel < 0.05, rel
