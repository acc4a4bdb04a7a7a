"""Specular-manifold walks (reference: src/libbidir/manifold.cpp,
mut_manifold.cpp:770; derivative checks verification.cpp:215).

The reference parameterizes a specular chain by explicit vertex positions
and Newton-iterates them with a block-tridiagonal Jacobian solve per path.
The TPU formulation collapses the chain into ONE closed-form differentiable
map: emission PSS coordinates u in (0,1)^2 -> cosine-hemisphere direction
-> analytic sphere intersections + Snell refraction (with TIR-> reflection
fallback) -> chain EXIT direction omega(u) on S^2. The manifold walk is
then a batched 2x2 Newton solve on forward-mode-AD Jacobians — thousands
of independent walks advance in lock-step on the VPU with no per-path
linear systems or dynamic chain bookkeeping.

Scope: analytic-sphere specular chains (the canonical caustic geometry).
Mesh-specular chains fall back to the plain caustic perturbation in mlt.

Used by integrators/mlt.py's manifold perturbation (mut_manifold.cpp
role): propose a small symmetric cone rotation of the current chain's exit
direction, solve for the emission coordinates realizing it, and weight
acceptance by |det d(omega)/d(u)| ratios — the pushforward of the cone
density through the chain map, which is what makes the move a correct
Metropolis proposal.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.frame import Frame

N_EVENTS = 4       # max specular interactions along the chain
N_NEWTON = 10      # Newton iterations of the walk


def _refract_or_reflect(d, n, eta_ratio):
    """Snell refraction of unit d at interface with normal n oriented
    against d (cos_i = -d.n >= 0); total internal reflection reflects.
    eta_ratio = n_incident / n_transmitted."""
    cos_i = -m.dot(d, n)
    sin2_t = eta_ratio * eta_ratio * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 1e-12))
    d_t = eta_ratio * d + (eta_ratio * cos_i - cos_t) * n
    d_r = d + 2.0 * cos_i * n
    out = jnp.where(tir, d_r, d_t)
    return out / jnp.maximum(m.length(out), 1e-12)


def chain_exit_dir(u2, o, n_l, centers, radii, etas):
    """Differentiable chain map for ONE lane: emission PSS pair u2 ->
    world exit direction after up to N_EVENTS specular sphere events.

    o (3,): light position; n_l (3,): light normal (cosine-hemisphere
    emission frame, emitter.sample_ray AREA branch); centers (S, 3),
    radii (S,), etas (S,): the scene's analytic spheres (eta 1 = inert).
    Rays that miss every sphere keep their direction (identity map)."""
    wo_local = warp.square_to_cosine_hemisphere(u2)
    fr = Frame.from_normal(n_l)
    d = fr.to_world(wo_local)
    p = o
    S = centers.shape[0]
    for _ in range(N_EVENTS):
        best_t = jnp.asarray(jnp.inf)
        best_i = jnp.asarray(-1, jnp.int32)
        for i in range(S):
            oc = p - centers[i]
            b = m.dot(d, oc)
            c = m.dot(oc, oc) - radii[i] * radii[i]
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = -b - sq
            t1 = -b + sq
            t = jnp.where(t0 > 1e-4, t0, t1)
            ok = (disc > 0.0) & (t > 1e-4)
            closer = ok & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_i = jnp.where(closer, i, best_i)
        hit = best_i >= 0
        i_c = jnp.maximum(best_i, 0)
        t_c = jnp.where(hit, best_t, 0.0)
        p_hit = p + t_c * d
        n_s = (p_hit - centers[i_c]) / jnp.maximum(radii[i_c], 1e-9)
        entering = m.dot(d, n_s) < 0.0
        n_or = jnp.where(entering, n_s, -n_s)
        eta_i = etas[i_c]
        eta_ratio = jnp.where(entering, 1.0 / eta_i, eta_i)
        d_new = _refract_or_reflect(d, n_or, eta_ratio)
        d = jnp.where(hit, d_new, d)
        p = jnp.where(hit, p_hit, p)
    return d


def _chart_resid(u2, o, n_l, centers, radii, etas, fx, fy):
    """2D residual of the chain exit direction against a chart whose pole
    is the target direction (fx, fy span its tangent plane)."""
    d = chain_exit_dir(u2, o, n_l, centers, radii, etas)
    return jnp.stack([m.dot(d, fx), m.dot(d, fy)])


@partial(jax.jit, static_argnames=())
def solve_exit_dir(u0, o, n_l, d_target, centers, radii, etas):
    """Batched Newton manifold walk: find u with chain_exit_dir(u) ==
    d_target, starting from u0 (the current state's coordinates — the
    reference also walks from the unperturbed path, manifold.cpp `move`).

    Returns (u, converged). All args lane-batched except the sphere set.
    """
    fr = Frame.from_normal(d_target)
    fx, fy = fr.s, fr.t

    jac = jax.vmap(
        jax.jacfwd(_chart_resid),
        in_axes=(0, 0, 0, None, None, None, 0, 0))
    res = jax.vmap(_chart_resid, in_axes=(0, 0, 0, None, None, None, 0, 0))

    def body(_, u):
        f = res(u, o, n_l, centers, radii, etas, fx, fy)
        J = jac(u, o, n_l, centers, radii, etas, fx, fy)
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv_det = jnp.where(jnp.abs(det) > 1e-14, 1.0 / det, 0.0)
        du0 = (J[:, 1, 1] * f[:, 0] - J[:, 0, 1] * f[:, 1]) * inv_det
        du1 = (J[:, 0, 0] * f[:, 1] - J[:, 1, 0] * f[:, 0]) * inv_det
        du = jnp.stack([du0, du1], axis=-1)
        # trust region: a Newton step further than 0.25 in PSS space is
        # outside the local chart's validity
        nrm = m.length(du)
        du = du * jnp.minimum(1.0, 0.25 / jnp.maximum(nrm, 1e-12))[..., None]
        return jnp.clip(u - du, 1e-5, 1.0 - 1e-5)

    u = jax.lax.fori_loop(0, N_NEWTON, body, u0)
    f = res(u, o, n_l, centers, radii, etas, fx, fy)
    d_fin = jax.vmap(chain_exit_dir, in_axes=(0, 0, 0, None, None, None))(
        u, o, n_l, centers, radii, etas)
    ok = (m.length(f) < 1e-4) & (jax.vmap(m.dot)(d_fin, d_target) > 0.0)
    return u, ok


def det_omega(u2, o, n_l, centers, radii, etas):
    """|det d(omega)/d(u)| — solid-angle area element of the chain map,
    batched. This is the density Jacobian of pushing a PSS-square density
    through the chain onto S^2 (mut_manifold.cpp's dv term role)."""
    J = jax.vmap(
        jax.jacfwd(chain_exit_dir), in_axes=(0, 0, 0, None, None, None))(
            u2, o, n_l, centers, radii, etas)   # (R, 3, 2)
    cr = jnp.cross(J[..., 0], J[..., 1])
    return m.length(cr)


def perturb_cone(d, u2, theta_max):
    """Symmetric cone proposal around unit d: density depends only on
    d . d' (mut_caustic.cpp's angular proposal role)."""
    local = warp.square_to_uniform_cone(u2, jnp.cos(theta_max))
    fr = Frame.from_normal(d)
    return fr.to_world(local)
