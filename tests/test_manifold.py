"""Specular-manifold walk tests (reference: libbidir/manifold.cpp with
finite-difference derivative verification per verification.cpp:215)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mitsuba_tpu.render import manifold as M

CENTERS = jnp.asarray([[0.0, 0.5, 0.0]])
RADII = jnp.asarray([0.25])
ETAS = jnp.asarray([1.5])
O_L = jnp.asarray([0.0, 1.6, 0.0])
N_L = jnp.asarray([0.0, -1.0, 0.0])


def _chain(u):
    return M.chain_exit_dir(u, O_L, N_L, CENTERS, RADII, ETAS)


def test_chain_derivative_matches_fd():
    """Forward-mode Jacobian of the chain map == central differences
    (the verification.cpp finite-difference check, done in one vmap)."""
    rng = np.random.default_rng(1)
    us = jnp.asarray(rng.uniform(0.15, 0.85, (64, 2)), jnp.float32)
    J = jax.vmap(jax.jacfwd(_chain))(us)
    h = 1e-3
    checked = 0
    for k in range(2):
        e = np.zeros(2, np.float32)
        e[k] = h
        dp = jax.vmap(_chain)(us + e)
        dm = jax.vmap(_chain)(us - e)
        fd = np.asarray(dp - dm) / (2 * h)
        an = np.asarray(J[..., k])
        # skip lanes straddling a discrete boundary (enters/misses the
        # sphere between the two FD probes) — the map is only piecewise
        # smooth, exactly like the reference's specular chains
        smooth = np.abs(fd).max(axis=-1) < 50.0
        err = np.abs(fd - an).max(axis=-1)
        scale = np.abs(fd).max(axis=-1) + 1.0
        good = err[smooth] / scale[smooth]
        assert (good < 2e-2).mean() > 0.9, good.max()
        checked += smooth.sum()
    assert checked > 80  # the FD sweep actually exercised the chain


def test_manifold_solve_converges():
    """The Newton walk lands on the requested exit direction: perturb the
    emission coordinates, ask the solver to reproduce the perturbed exit
    direction from the unperturbed start (manifold.cpp `move` role)."""
    rng = np.random.default_rng(2)
    R = 256
    u = jnp.asarray(rng.uniform(0.2, 0.8, (R, 2)), jnp.float32)
    o = jnp.broadcast_to(O_L, (R, 3))
    nl = jnp.broadcast_to(N_L, (R, 3))
    du = jnp.asarray(rng.uniform(-0.02, 0.02, (R, 2)), jnp.float32)
    d_t = jax.vmap(_chain)(jnp.clip(u + du, 0.0, 1.0))
    u_s, ok = M.solve_exit_dir(u, o, nl, d_t, CENTERS, RADII, ETAS)
    assert float(ok.mean()) > 0.9, float(ok.mean())
    d_s = jax.vmap(_chain)(u_s)
    ang = np.asarray(jnp.sum(d_s * d_t, axis=-1))
    assert (ang[np.asarray(ok)] > 1.0 - 1e-6).all()


def test_det_omega_positive_and_focusing():
    """The solid-angle Jacobian is positive where defined and larger for
    chains refracted through the sphere (a focusing lens stretches the
    direction map) than for rays that miss it."""
    rng = np.random.default_rng(3)
    R = 512
    u = jnp.asarray(rng.uniform(0.02, 0.98, (R, 2)), jnp.float32)
    o = jnp.broadcast_to(O_L, (R, 3))
    nl = jnp.broadcast_to(N_L, (R, 3))
    det = np.asarray(M.det_omega(u, o, nl, CENTERS, RADII, ETAS))
    base = np.asarray(M.det_omega(
        u, o, nl, CENTERS, RADII, jnp.asarray([1.0])))  # eta 1 = inert
    assert (det > 0).all()
    # cosine-hemisphere warp alone has det ~ pi-ish; the refracted subset
    # must show magnification beyond it
    assert det.max() > base.max() * 2.0


def test_mlt_manifold_unbiased_on_caustic():
    """mlt with the manifold strategy enabled stays consistent with a
    BDPT reference on the caustic scene (quick 16x16 check; the full
    beats-pssmlt margin test lives in test_mlt.py)."""
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, bsdf as B, sensor as S, shapes as sh
    from mitsuba_tpu.render.integrators.common import (
        IntegratorConfig, MLT, BDPT)
    from mitsuba_tpu.render.integrators import mlt as mlt_mod
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    glass = b.add_material(type=B.DIELECTRIC, eta=1.5)
    b.add_sphere((0.0, 0.5, 0.0), 0.25, glass)
    v, f, uv = sh.rectangle(
        Transform.rotate([1, 0, 0], -90.0) * Transform.scale([2, 2, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0.7, 0.7, 0.7)), uvs=uv)
    v, f, uv = sh.rectangle(
        Transform.translate([0, 1.6, 0]) * Transform.rotate([1, 0, 0], 90.0)
        * Transform.scale([0.05, 0.05, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0, 0, 0)),
               emitter_radiance=(400.0,) * 3, uvs=uv)
    scene, static = b.build()
    assert mlt_mod._manifold_capable(static)
    cam = Transform.look_at([0.0, 1.0, -1.6], [0.0, 0.25, 0.0], [0, 1, 0])
    W = H = 16
    sens = S.make_perspective(cam, 40.0, W, H)
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=BDPT, max_depth=4),
        api.RenderSettings(width=W, height=H, spp=128, spp_per_pass=8,
                           seed=5)))
    img = np.asarray(api.render(
        scene, static, sens,
        IntegratorConfig(type=MLT, max_depth=4, chain_count=2048,
                         luminance_samples=8192),
        api.RenderSettings(width=W, height=H, spp=48, seed=1)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, rel


def _mesh_sphere_rows(rings=24, segments=48):
    """scene.man_tri rows for a glass MESH sphere via the builder."""
    from mitsuba_tpu.render import bsdf as B, shapes as sh
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    glass = b.add_material(type=B.DIELECTRIC, eta=1.5)
    v, f, n, uv = sh.sphere_mesh((0.0, 0.5, 0.0), 0.25, rings=rings,
                                 segments=segments)
    b.add_mesh(v, f, glass, normals=n, uvs=uv)
    scene, static = b.build()
    assert static.n_manifold_tris > 0
    return scene.man_tri


def test_mesh_chain_matches_analytic_sphere():
    """The MESH chain map through a finely tessellated glass sphere must
    agree with the analytic-sphere chain map (manifold.cpp mesh chains:
    same physics, triangle parameterization)."""
    mesh = _mesh_sphere_rows(rings=32, segments=64)
    rng = np.random.default_rng(4)
    us = jnp.asarray(rng.uniform(0.2, 0.8, (128, 2)), jnp.float32)
    d_sph = jax.vmap(_chain)(us)
    no_c = jnp.zeros((0, 3))
    no_r = jnp.zeros((0,))
    d_msh = jax.vmap(M.chain_exit_dir,
                     in_axes=(0, None, None, None, None, None, None))(
        us, O_L, N_L, no_c, no_r, no_r, mesh)
    cosang = np.asarray(jnp.sum(d_sph * d_msh, axis=-1))
    # interpolated shading normals track the true sphere normal closely;
    # chains through two refractions amplify tessellation error ~4x
    assert np.quantile(cosang, 0.2) > 0.995, np.quantile(cosang, 0.2)


def test_mesh_manifold_solve_converges():
    """Newton walk on the MESH chain map (AD Jacobians through the
    barycentric intersection + interpolated normals)."""
    mesh = _mesh_sphere_rows()
    rng = np.random.default_rng(5)
    R = 128
    u = jnp.asarray(rng.uniform(0.25, 0.75, (R, 2)), jnp.float32)
    o = jnp.broadcast_to(O_L, (R, 3))
    nl = jnp.broadcast_to(N_L, (R, 3))
    no_c = jnp.zeros((0, 3))
    no_r = jnp.zeros((0,))

    def chain(uu):
        return M.chain_exit_dir(uu, O_L, N_L, no_c, no_r, no_r, mesh)

    du = jnp.asarray(rng.uniform(-0.01, 0.01, (R, 2)), jnp.float32)
    d_t = jax.vmap(chain)(jnp.clip(u + du, 0.0, 1.0))
    u_s, ok = M.solve_exit_dir(u, o, nl, d_t, no_c, no_r, no_r, mesh)
    # mesh chains are only piecewise smooth across triangle boundaries;
    # the walk must still land on the target for the bulk of lanes
    assert float(ok.mean()) > 0.7, float(ok.mean())
    d_s = jax.vmap(chain)(u_s)
    ang = np.asarray(jnp.sum(d_s * d_t, axis=-1))
    assert (ang[np.asarray(ok)] > 1.0 - 1e-5).all()


def test_mlt_manifold_mesh_caustic():
    """End-to-end: the caustic scene with a glass MESH sphere (icosphere
    through the manifold strategy, NOT the analytic-sphere fallback) stays
    consistent with BDPT (VERDICT r4 next-step 6 'Done' criterion)."""
    from mitsuba_tpu.core.transform import Transform
    from mitsuba_tpu.render import api, bsdf as B, sensor as S, shapes as sh
    from mitsuba_tpu.render.integrators.common import (
        IntegratorConfig, MLT, BDPT)
    from mitsuba_tpu.render.integrators import mlt as mlt_mod
    from mitsuba_tpu.render.scene import SceneBuilder

    b = SceneBuilder()
    glass = b.add_material(type=B.DIELECTRIC, eta=1.5)
    v, f, n, uv = sh.sphere_mesh((0.0, 0.5, 0.0), 0.25, rings=16,
                                 segments=32)
    b.add_mesh(v, f, glass, normals=n, uvs=uv)
    v, f, uv = sh.rectangle(
        Transform.rotate([1, 0, 0], -90.0) * Transform.scale([2, 2, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0.7, 0.7, 0.7)), uvs=uv)
    v, f, uv = sh.rectangle(
        Transform.translate([0, 1.6, 0]) * Transform.rotate([1, 0, 0], 90.0)
        * Transform.scale([0.05, 0.05, 1]))
    b.add_mesh(v, f, b.add_material(albedo=(0, 0, 0)),
               emitter_radiance=(400.0,) * 3, uvs=uv)
    scene, static = b.build()
    assert static.n_spheres == 0          # no analytic fallback available
    assert static.n_manifold_tris > 0
    assert mlt_mod._manifold_capable(static)
    cam = Transform.look_at([0.0, 1.0, -1.6], [0.0, 0.25, 0.0], [0, 1, 0])
    W = H = 16
    sens = S.make_perspective(cam, 40.0, W, H)
    ref = np.asarray(api.render(
        scene, static, sens, IntegratorConfig(type=BDPT, max_depth=4),
        api.RenderSettings(width=W, height=H, spp=128, spp_per_pass=8,
                           seed=5)))
    img = np.asarray(api.render(
        scene, static, sens,
        IntegratorConfig(type=MLT, max_depth=4, chain_count=2048,
                         luminance_samples=8192),
        api.RenderSettings(width=W, height=H, spp=48, seed=1)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, rel
