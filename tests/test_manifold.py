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
