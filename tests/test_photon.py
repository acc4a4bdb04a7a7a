"""Photon mapping family (photonmapper/ppm/sppm) — cross-integrator
agreement with the path tracer, the reference's own validation strategy
(SURVEY §4 tier 2: integrator families must agree on simple scenes)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api, rfilter, sensor as sensor_mod, shapes
from mitsuba_tpu.render.integrators.common import (
    IntegratorConfig, PATH, SPPM, PPM, PHOTONMAPPER,
)
from mitsuba_tpu.render.scene import SceneBuilder


@pytest.fixture(scope="module")
def cornell_setup():
    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    cam = Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
    W = H = 24
    sens = sensor_mod.make_perspective(cam, 39.0, W, H)
    ref = api.render(
        scene, static, sens, IntegratorConfig(type=PATH, max_depth=5),
        api.RenderSettings(width=W, height=H, spp=256, spp_per_pass=32,
                           filter_type=rfilter.BOX),
    )
    return scene, static, sens, W, H, np.asarray(ref)


def test_sppm_matches_path(cornell_setup):
    scene, static, sens, W, H, ref = cornell_setup
    cfg = IntegratorConfig(type=SPPM, max_depth=5, photon_count=16384)
    img = np.asarray(api.render(
        scene, static, sens, cfg,
        api.RenderSettings(width=W, height=H, spp=10, filter_type=rfilter.BOX)
    ))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, f"sppm mean off by {rel:.3f}"


def test_ppm_matches_path(cornell_setup):
    scene, static, sens, W, H, ref = cornell_setup
    cfg = IntegratorConfig(type=PPM, max_depth=5, photon_count=32768)
    img = np.asarray(api.render(
        scene, static, sens, cfg,
        api.RenderSettings(width=W, height=H, spp=16, filter_type=rfilter.BOX)
    ))
    assert np.isfinite(img).all()
    # ppm point-samples pixel centers (fixed gather points, ppm.cpp), so
    # directly-visible emitter pixels alias at this resolution — compare on
    # the reflective pixels only
    mask = ref.max(axis=-1) < 2.0
    rel = abs(img[mask].mean() - ref[mask].mean()) / ref[mask].mean()
    assert rel < 0.08, f"ppm mean off by {rel:.3f}"


def test_photonmapper_matches_path(cornell_setup):
    scene, static, sens, W, H, ref = cornell_setup
    cfg = IntegratorConfig(type=PHOTONMAPPER, max_depth=5, photon_count=32768)
    img = np.asarray(api.render(
        scene, static, sens, cfg,
        api.RenderSettings(width=W, height=H, spp=4, filter_type=rfilter.BOX)
    ))
    assert np.isfinite(img).all()
    mask = ref.max(axis=-1) < 2.0
    rel = abs(img[mask].mean() - ref[mask].mean()) / ref[mask].mean()
    assert rel < 0.10, f"photonmapper masked mean off by {rel:.3f}"


def test_photon_trace_flags():
    """Photon deposits: direct only at bounce 0; caustic only behind a
    delta chain; no deposits on pure-delta materials."""
    from mitsuba_tpu.render.integrators import photon as int_ph
    from mitsuba_tpu.render import bsdf as bsdf_mod

    b = SceneBuilder()
    shapes.cornell_box(b)
    # insert a glass sphere to create delta interactions
    glass = b.add_material(type=bsdf_mod.DIELECTRIC, eta=1.5)
    b.add_sphere([0.5, 0.3, 0.5], 0.2, glass)
    scene, static = b.build()

    cfg = IntegratorConfig(type=SPPM, max_depth=6, photon_count=0)
    pid = jnp.arange(4096, dtype=jnp.int32)
    pos, power, wi, gn, caustic, direct, valid = int_ph.trace_photons(
        scene, static, cfg, jnp.asarray(3, jnp.int32), pid,
        jnp.asarray(0, jnp.int32), 6,
    )
    pos, caustic, direct, valid = map(np.asarray, (pos, caustic, direct, valid))
    assert valid.any()
    # flags only on valid photons
    assert not (caustic & ~valid).any()
    assert not (direct & ~valid).any()
    # direct deposits exist (first wall hits) and caustics exist (through glass)
    assert direct.any()
    assert caustic.any()
    # power is finite and nonnegative
    p = np.asarray(power)[valid]
    assert np.isfinite(p).all() and (p >= 0).all()


def test_hash_grid_finds_all_neighbors():
    """Grid gather must find exactly the photons within the radius
    (brute-force cross-check on random points)."""
    from mitsuba_tpu.render.integrators import photon as int_ph

    rng = np.random.default_rng(0)
    P = 2000
    pos = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    power = np.ones((P, 3), np.float32)
    wi = np.tile(np.array([[0, 0, 1.0]], np.float32), (P, 1))
    gn = np.tile(np.array([[0, 0, 1.0]], np.float32), (P, 1))
    flags = np.zeros(P, bool)
    valid = np.ones(P, bool)
    r = 0.05
    pm = int_ph.build_photon_map(
        jnp.asarray(pos), jnp.asarray(power), jnp.asarray(wi),
        jnp.asarray(gn), jnp.asarray(flags), jnp.asarray(flags),
        jnp.asarray(valid), cell_size=r,
    )

    Q = 64
    qp = rng.uniform(0.1, 0.9, (Q, 3)).astype(np.float32)
    # count photons within r of each query, brute force
    d2 = ((qp[:, None, :] - pos[None]) ** 2).sum(-1)
    want = (d2 < r * r).sum(1)

    # gather with a trivial "BSDF": count via the returned M
    from mitsuba_tpu.core.frame import Frame
    from mitsuba_tpu.render.scene import SceneBuilder as SB
    from mitsuba_tpu.render import scene as scene_mod
    from mitsuba_tpu.render.records import Interaction

    b = SB()
    b.add_material()  # diffuse
    scene, static = b.build()
    frame = Frame.from_normal(jnp.asarray(gn[:Q]))
    its = Interaction(
        valid=jnp.ones(Q, bool), t=jnp.zeros(Q), p=jnp.asarray(qp),
        gn=jnp.asarray(gn[:Q]), sh_frame=frame, uv=jnp.zeros((Q, 2)),
        wi=jnp.tile(jnp.asarray([[0, 0, 1.0]]), (Q, 1)),
        wi_world=jnp.tile(jnp.asarray([[0, 0, 1.0]]), (Q, 1)),
        mat_id=jnp.zeros(Q, jnp.int32),
        emitter_id=jnp.full(Q, -1, jnp.int32),
        prim_id=jnp.full(Q, -1, jnp.int32), nee_pdf_area=jnp.zeros(Q),
        bary=jnp.zeros((Q, 2)),
    )
    bl = scene_mod.bsdf_locals(scene, its, static)
    _, count = int_ph.gather_photons(
        pm, bl, frame, jnp.asarray(qp), jnp.asarray(gn[:Q]),
        jnp.tile(jnp.asarray([[0, 0, 1.0]]), (Q, 1)),
        jnp.full(Q, r * r), static.bsdf_types,
    )
    np.testing.assert_array_equal(np.asarray(count).astype(int), want)
