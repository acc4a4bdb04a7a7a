"""Volumetric transport tests (reference: medium/phase plugin behavior +
the radiometric cross-validation style of data/tests/test_phase.xml)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import rng
from mitsuba_tpu.core.transform import Transform
from mitsuba_tpu.render import api
from mitsuba_tpu.render import bsdf as B
from mitsuba_tpu.render import phase as PH
from mitsuba_tpu.render import sensor as S
from mitsuba_tpu.render import shapes
from mitsuba_tpu.render.integrators.common import IntegratorConfig, PATH, VOLPATH
from mitsuba_tpu.render.scene import SceneBuilder
from mitsuba_tpu.utils.chi2 import chi2_test


def _render(scene, static, sens, cfg, wh=8, spp=64, **kw):
    st = api.RenderSettings(width=wh, height=wh, spp=spp,
                            spp_per_pass=min(16, spp), filter_type=0)
    return np.asarray(api.render(scene, static, sens, cfg, st))


def _params(n, **kw):
    p = PH.PhaseParams.iso_like((n,))
    return p._replace(**{k: jnp.full((n,), v) if k != "axis" else
                         jnp.broadcast_to(jnp.asarray(v), (n, 3))
                         for k, v in kw.items()})


AXIS = (0.6, 0.0, 0.8)


@pytest.mark.parametrize(
    "ptype,kw",
    [(PH.ISOTROPIC, {}), (PH.HG, dict(g=0.5)), (PH.HG, dict(g=-0.7)),
     (PH.RAYLEIGH, {}), (PH.MIXTURE, dict(g=0.6, g2=-0.3, w2=0.4))],
    ids=["iso", "hg_fwd", "hg_bwd", "rayleigh", "mixture"])
def test_phase_chi2(ptype, kw):
    """sample() really draws from the density claimed by the pdf
    (test_chisquare.cpp methodology)."""
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 3))

    def sample_fn(n):
        w = jnp.broadcast_to(wi, (n, 3))
        u = rng.uniform2(ptype * 10 + 1, jnp.arange(n, dtype=jnp.int32), 0, 0)
        wo, _, _ = PH.sample(jnp.full(n, ptype), _params(n, **kw), w, u,
                             active_types=(ptype,))
        return np.asarray(wo)

    def pdf_fn(d):
        n = d.shape[0]
        w = jnp.broadcast_to(wi, (n, 3))
        return PH.eval_pdf(jnp.full(n, ptype), _params(n, **kw), w, d,
                           active_types=(ptype,))[1]

    ok, pval, stat, dof, info = chi2_test(sample_fn, pdf_fn, n_samples=400_000)
    assert ok, info


@pytest.mark.parametrize(
    "ptype,kw",
    [(PH.KKAY, dict(ks=0.5, exponent=8.0, axis=AXIS)),
     (PH.MIXTURE, dict(g=0.6, g2=-0.3, w2=0.4)),
     (PH.MICROFLAKE, dict(sigma=0.25, axis=AXIS))],
    ids=["kkay", "mixture", "microflake"])
def test_phase_value_normalized(ptype, kw):
    """int value dOmega == 1 (energy conservation of every phase model),
    estimated with uniform-sphere Monte Carlo."""
    n = 400_000
    u = rng.uniform2(7, jnp.arange(n, dtype=jnp.int32), 1, 0)
    from mitsuba_tpu.core import warp
    wo = warp.square_to_uniform_sphere(u)
    wi = jnp.broadcast_to(jnp.asarray([0.3, -0.2, 0.933]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    val, _ = PH.eval_pdf(jnp.full(n, ptype), _params(n, **kw), wi, wo,
                         active_types=(ptype,))
    integral = float(jnp.mean(val) * 4.0 * jnp.pi)
    assert abs(integral - 1.0) < 0.03, integral


def test_microflake_sampler_consistent():
    """The microflake sampler + weight reproduce the normalized value:
    E[value/pdf] over sampled wo == int value dOmega == 1 (the chi-square
    harness can't bin its grazing-half-vector pdf singularity)."""
    n = 400_000
    ptype = jnp.full(n, PH.MICROFLAKE)
    p = _params(n, sigma=0.25, axis=AXIS)
    wi = jnp.broadcast_to(jnp.asarray([0.3, -0.2, 0.933]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    u = rng.uniform2(11, jnp.arange(n, dtype=jnp.int32), 2, 0)
    _, weight, pdf = PH.sample(ptype, p, wi, u,
                               active_types=(PH.MICROFLAKE,))
    assert float(jnp.min(pdf)) > 0
    est = float(jnp.mean(weight))
    assert abs(est - 1.0) < 0.02, est


def test_volpath_equals_path_without_media(cornell, cornell_cam):
    scene, static = cornell
    sens = S.make_perspective(cornell_cam, 39.0, 16, 16)
    st = api.RenderSettings(width=16, height=16, spp=128, spp_per_pass=16,
                            filter_type=0)
    img_p = np.asarray(api.render(scene, static, sens,
                                  IntegratorConfig(type=PATH, max_depth=3), st))
    img_v = np.asarray(api.render(scene, static, sens,
                                  IntegratorConfig(type=VOLPATH, max_depth=3), st))
    # different RNG dimension layouts -> statistical (not bitwise) agreement
    np.testing.assert_allclose(img_v.mean(axis=(0, 1)), img_p.mean(axis=(0, 1)),
                               rtol=0.02)


def _absorber_scene(sigma_a, radius=0.5):
    b = SceneBuilder()
    med = b.add_medium_homogeneous(sigma_s=(0.0,) * 3, sigma_a=(sigma_a,) * 3)
    mat = b.add_material(type=B.NULL, interior_medium=med)
    b.add_sphere((0, 0, 2.0), radius, mat)
    b.add_constant_emitter((1.0, 1.0, 1.0))
    return b.build()


def test_beer_lambert_absorption():
    """Ray through an absorbing sphere: L = exp(-sigma_a * chord) * env
    (homogeneous.cpp closed-form transmittance via the null boundary)."""
    sigma, r = 1.3, 0.5
    scene, static = _absorber_scene(sigma, r)
    cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    sens = S.make_perspective(cam, 2.0, 4, 4)  # narrow fov through the center
    img = _render(scene, static, sens,
                  IntegratorConfig(type=VOLPATH, max_depth=8, rr_depth=64),
                  wh=4, spp=512)
    expected = np.exp(-sigma * 2 * r)
    np.testing.assert_allclose(img.mean(), expected, rtol=0.03)


def test_scattering_furnace():
    """Conservative-scattering medium under a uniform environment must leave
    radiance unchanged (the volumetric white furnace)."""
    b = SceneBuilder()
    med = b.add_medium_homogeneous(sigma_s=(1.0,) * 3, sigma_a=(0.0,) * 3)
    mat = b.add_material(type=B.NULL, interior_medium=med)
    b.add_sphere((0, 0, 2.0), 0.5, mat)
    b.add_constant_emitter((1.0, 1.0, 1.0))
    scene, static = b.build()
    cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    sens = S.make_perspective(cam, 2.0, 4, 4)
    img = _render(scene, static, sens,
                  IntegratorConfig(type=VOLPATH, max_depth=32, rr_depth=64),
                  wh=4, spp=512)
    np.testing.assert_allclose(img.mean(), 1.0, rtol=0.03)


def test_heterogeneous_matches_homogeneous_constant_grid():
    """A heterogeneous medium with a constant density grid must agree with
    the equivalent homogeneous medium (delta-tracking correctness)."""
    sigma = 0.9

    def build(hetero):
        b = SceneBuilder()
        if hetero:
            grid = np.ones((4, 4, 4), np.float32)
            # world-to-grid: sphere bbox [(-0.5,-0.5,1.5), (0.5,0.5,2.5)] -> [0,1]^3
            w2g = np.eye(4)
            w2g[:3, :3] *= 1.0
            w2g[:3, 3] = [0.5, 0.5, -1.5]
            med = b.add_medium_heterogeneous(
                grid, sigma_t=(sigma,) * 3, albedo=(0.0,) * 3, world_to_grid=w2g
            )
        else:
            med = b.add_medium_homogeneous(sigma_s=(0,) * 3, sigma_a=(sigma,) * 3)
        mat = b.add_material(type=B.NULL, interior_medium=med)
        b.add_sphere((0, 0, 2.0), 0.5, mat)
        b.add_constant_emitter((1.0, 1.0, 1.0))
        return b.build()

    cam = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    sens = S.make_perspective(cam, 2.0, 4, 4)
    cfg = IntegratorConfig(type=VOLPATH, max_depth=8, rr_depth=64)
    scene_h, static_h = build(False)
    scene_g, static_g = build(True)
    img_h = _render(scene_h, static_h, sens, cfg, wh=4, spp=512)
    img_g = _render(scene_g, static_g, sens, cfg, wh=4, spp=1024)
    np.testing.assert_allclose(img_g.mean(), img_h.mean(), rtol=0.05)


def test_attenuated_transmittance_nested_slab():
    """Shadow-segment walk through null-boundary media chains
    (Scene::evalTransmittance / sampleAttenuatedEmitterDirect,
    scene.cpp:854-898): a sigma_a=1 slab between z=0.2 and z=0.8 gives
    exactly exp(-0.6) for a perpendicular segment, and the walk must
    occlude on opaque hits."""
    import jax.numpy as jnp
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import bsdf as B
    from mitsuba_tpu.render import scene as scene_mod
    from mitsuba_tpu.render import shapes as sh
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    med = b.add_medium_homogeneous(sigma_s=(0, 0, 0), sigma_a=(1.0,) * 3)
    lo_m = b.add_material(type=B.NULL, exterior_medium=med)
    hi_m = b.add_material(type=B.NULL, interior_medium=med)
    for z, mat in [(0.2, lo_m), (0.8, hi_m)]:
        t = Transform.translate([0.5, 0.5, z]) * Transform.scale([5, 5, 1])
        v, f, uv = sh.rectangle(t)
        b.add_mesh(v, f, mat, uvs=uv)
    # an opaque blocker off to the side
    t = Transform.translate([3.0, 0.5, 0.5]) * Transform.scale([0.2, 0.2, 1])
    v, f, uv = sh.rectangle(t)
    b.add_mesh(v, f, b.add_material(), uvs=uv)
    scene, static = b.build()
    assert static.has_boundary_media

    R = 8
    pix = jnp.arange(R, dtype=jnp.int32)
    o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (R, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    tr = np.asarray(scene_mod.attenuated_transmittance(
        scene, static, o, d, jnp.full(R, 1.9), jnp.full(R, -1, jnp.int32),
        0, pix, 0, 500))
    assert np.allclose(tr, np.exp(-0.6), rtol=1e-5), tr[0]

    # oblique segment: path length inside the slab scales with 1/cos
    ct = 0.8
    d2 = jnp.tile(jnp.asarray([[0.6, 0.0, ct]]), (R, 1))
    tr2 = np.asarray(scene_mod.attenuated_transmittance(
        scene, static, o, d2, jnp.full(R, 2.2), jnp.full(R, -1, jnp.int32),
        0, pix, 0, 500))
    assert np.allclose(tr2, np.exp(-0.6 / ct), rtol=1e-5), tr2[0]

    # opaque hit -> full occlusion
    o3 = jnp.tile(jnp.asarray([[3.0, 0.5, 0.0]]), (R, 1))
    tr3 = np.asarray(scene_mod.attenuated_transmittance(
        scene, static, o3, d, jnp.full(R, 1.9), jnp.full(R, -1, jnp.int32),
        0, pix, 0, 500))
    assert np.allclose(tr3, 0.0), tr3[0]


def test_sparse_grid_hierarchical_majorants():
    """Per-supercell majorants (src/volume/hgridvolume.cpp:216 role): in a
    mostly-empty grid the tracker must (a) return transmittance exactly 1
    through empty space (zero local majorant => pure DDA leaps, no null
    collisions), and (b) agree with dense quadrature through the blob."""
    import jax.numpy as jnp
    from mitsuba_tpu.render import medium as med_mod
    from mitsuba_tpu.render.scene import SceneBuilder

    n = 33
    grid = np.zeros((n, n, n), np.float32)
    grid[12:21, 12:21, 12:21] = 1.0        # center blob
    b = SceneBuilder()
    b.add_medium_heterogeneous(grid, sigma_t=(4.0,) * 3, albedo=(0.0,) * 3)
    b.add_sphere((0.5, 0.5, 0.5), 0.1, b.add_material())
    b.add_constant_emitter((1.0,) * 3)
    scene, static = b.build()
    med = scene.media

    # supergrid cells that only cover empty voxels really are zero
    sm = np.asarray(med.super_maj)[0]
    assert sm.max() == 1.0 and (sm == 0).sum() > sm.size // 2, sm.mean()

    R = 16384
    seed = jnp.asarray(0, jnp.int32)
    pix = jnp.arange(R, dtype=jnp.int32)
    smp = jnp.zeros((R,), jnp.int32)
    mid = jnp.zeros((R,), jnp.int32)
    act = jnp.ones((R,), bool)

    def T(o, d, dist):
        o = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (R, 3))
        d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (R, 3))
        tr = med_mod.eval_transmittance(
            med, {med_mod.HETEROGENEOUS}, mid, o, d,
            jnp.full((R,), dist, jnp.float32), seed, pix, smp, 0, act)
        return np.asarray(tr)[..., 0]

    # (a) segment along an empty edge: every stochastic sample is exactly 1
    t_empty = T([0.05, 0.05, 0.0], [0.0, 0.0, 1.0], 1.0)
    np.testing.assert_array_equal(t_empty, 1.0)

    # (b) segment through the blob center vs dense trapezoid quadrature of
    # the trilinear density (sigma_t * integral of density)
    t_blob = np.mean(T([0.5, 0.5, -0.2], [0.0, 0.0, 1.0], 1.4))
    ts = np.linspace(0.0, 1.4, 4001)
    z = np.clip((-0.2 + ts) * (n - 1), 0, n - 1)
    z0 = np.floor(z).astype(int)
    fz = z - z0
    mid_v = 16  # x=y=0.5 -> voxel coord 16 exactly
    dens = grid[z0, mid_v, mid_v] * (1 - fz) + grid[
        np.minimum(z0 + 1, n - 1), mid_v, mid_v] * fz
    ref = np.exp(-4.0 * np.trapezoid(dens, ts))
    np.testing.assert_allclose(t_blob, ref, rtol=0.03)


def test_vol_roundtrip_mmap():
    """.vol loader memory-maps float32 single-channel files (mmap.cpp /
    gridvolume.cpp:628 beyond-RAM role) and still round-trips exactly."""
    import tempfile
    import numpy as np
    from mitsuba_tpu.io.volgrid import load_vol, save_vol

    g = np.random.default_rng(0).random((16, 12, 10)).astype(np.float32)
    fn = tempfile.mktemp(suffix=".vol")
    save_vol(fn, g, (0, 0, 0), (1, 2, 3))
    g2, w2g = load_vol(fn)
    assert isinstance(g2, np.memmap) or g2.base is not None
    np.testing.assert_allclose(np.asarray(g2), g)
    g3, _ = load_vol(fn, mmap=False)
    np.testing.assert_allclose(np.asarray(g3), g)
