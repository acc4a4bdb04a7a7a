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


def chain_exit_dir(u2, o, n_l, centers, radii, etas, mesh=None):
    """Differentiable chain map for ONE lane: emission PSS pair u2 ->
    world exit direction after up to N_EVENTS specular events.

    o (3,): light position; n_l (3,): light normal (cosine-hemisphere
    emission frame, emitter.sample_ray AREA branch); centers (S, 3),
    radii (S,), etas (S,): the scene's analytic spheres (eta 1 = inert);
    ``mesh`` (Tm, 19): optional specular-MESH triangle rows
    [p0 e1 e2 | n0 n1 n2 | eta] (scene.man_tri) — the reference's
    manifold.cpp walks arbitrary triangle-mesh specular chains; here the
    barycentric hit and the interpolated shading normal are both smooth
    functions of (p, d), so the same AD-Jacobian Newton solve covers mesh
    chains. Rays that miss every event keep their direction."""
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

        if mesh is not None and mesh.shape[0] > 1:
            # vectorized Moller-Trumbore over every specular-mesh triangle
            p0m, e1m, e2m = mesh[:, 0:3], mesh[:, 3:6], mesh[:, 6:9]
            pv = jnp.cross(jnp.broadcast_to(d, p0m.shape), e2m)
            det = jnp.sum(e1m * pv, axis=-1)
            okd = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(okd, det, 1.0)
            tv = p - p0m
            uu = jnp.sum(tv * pv, axis=-1) * inv
            qv = jnp.cross(tv, e1m)
            vv = jnp.sum(qv * d, axis=-1) * inv
            tt = jnp.sum(e2m * qv, axis=-1) * inv
            okm = (okd & (uu >= -1e-6) & (vv >= -1e-6)
                   & (uu + vv <= 1.0 + 1e-6) & (tt > 1e-4))
            tt = jnp.where(okm, tt, jnp.inf)
            j = jnp.argmin(tt)
            t_m = tt[j]
            mesh_closer = t_m < best_t
            row = mesh[j]
            u_b = uu[j]
            v_b = vv[j]
            n_sh = (row[9:12] * (1.0 - u_b - v_b) + row[12:15] * u_b
                    + row[15:18] * v_b)
            n_sh = n_sh / jnp.maximum(m.length(n_sh), 1e-12)
            eta_m = row[18]
        else:
            mesh_closer = jnp.asarray(False)
            t_m = jnp.asarray(jnp.inf)
            n_sh = jnp.zeros(3)
            eta_m = jnp.asarray(1.0)

        hit = (best_i >= 0) | mesh_closer
        i_c = jnp.maximum(best_i, 0)
        t_c = jnp.where(hit, jnp.where(mesh_closer, t_m, best_t), 0.0)
        p_hit = p + t_c * d
        if S > 0:
            n_sph = (p_hit - centers[i_c]) / jnp.maximum(radii[i_c], 1e-9)
            eta_sph = etas[i_c]
        else:  # mesh-only chains: no sphere set at all
            n_sph = jnp.zeros(3)
            eta_sph = jnp.asarray(1.0)
        n_s = jnp.where(mesh_closer, n_sh, n_sph)
        entering = m.dot(d, n_s) < 0.0
        n_or = jnp.where(entering, n_s, -n_s)
        eta_i = jnp.where(mesh_closer, eta_m, eta_sph)
        eta_ratio = jnp.where(entering, 1.0 / eta_i, eta_i)
        d_new = _refract_or_reflect(d, n_or, eta_ratio)
        d = jnp.where(hit, d_new, d)
        p = jnp.where(hit, p_hit, p)
    return d


def _chart_resid(u2, o, n_l, centers, radii, etas, mesh, fx, fy):
    """2D residual of the chain exit direction against a chart whose pole
    is the target direction (fx, fy span its tangent plane)."""
    d = chain_exit_dir(u2, o, n_l, centers, radii, etas, mesh)
    return jnp.stack([m.dot(d, fx), m.dot(d, fy)])


@partial(jax.jit, static_argnames=())
def solve_exit_dir(u0, o, n_l, d_target, centers, radii, etas, mesh=None):
    """Batched Newton manifold walk: find u with chain_exit_dir(u) ==
    d_target, starting from u0 (the current state's coordinates — the
    reference also walks from the unperturbed path, manifold.cpp `move`).

    Returns (u, converged). All args lane-batched except the sphere set
    and the optional specular-mesh rows.
    """
    fr = Frame.from_normal(d_target)
    fx, fy = fr.s, fr.t

    jac = jax.vmap(
        jax.jacfwd(_chart_resid),
        in_axes=(0, 0, 0, None, None, None, None, 0, 0))
    res = jax.vmap(_chart_resid,
                   in_axes=(0, 0, 0, None, None, None, None, 0, 0))

    def body(_, u):
        f = res(u, o, n_l, centers, radii, etas, mesh, fx, fy)
        J = jac(u, o, n_l, centers, radii, etas, mesh, fx, fy)
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
    f = res(u, o, n_l, centers, radii, etas, mesh, fx, fy)
    d_fin = jax.vmap(chain_exit_dir,
                     in_axes=(0, 0, 0, None, None, None, None))(
        u, o, n_l, centers, radii, etas, mesh)
    ok = (m.length(f) < 1e-4) & (jax.vmap(m.dot)(d_fin, d_target) > 0.0)
    return u, ok


def det_omega(u2, o, n_l, centers, radii, etas, mesh=None):
    """|det d(omega)/d(u)| — solid-angle area element of the chain map,
    batched. This is the density Jacobian of pushing a PSS-square density
    through the chain onto S^2 (mut_manifold.cpp's dv term role)."""
    J = jax.vmap(
        jax.jacfwd(chain_exit_dir),
        in_axes=(0, 0, 0, None, None, None, None))(
            u2, o, n_l, centers, radii, etas, mesh)   # (R, 3, 2)
    cr = jnp.cross(J[..., 0], J[..., 1])
    return m.length(cr)


def perturb_cone(d, u2, theta_max):
    """Symmetric cone proposal around unit d: density depends only on
    d . d' (mut_caustic.cpp's angular proposal role)."""
    local = warp.square_to_uniform_cone(u2, jnp.cos(theta_max))
    fr = Frame.from_normal(d)
    return fr.to_world(local)
