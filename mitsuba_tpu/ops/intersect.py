"""Ray-primitive intersection ops (batched, branch-free).

Capability parity with the reference's triangle tests (Moeller-Trumbore
variant, include/mitsuba/render/triaccel.h + trimesh.cpp) and the analytic
``sphere`` shape (src/shapes/sphere.cpp rayIntersect). The reference's
TriAccel precomputation trades memory for scalar-CPU speed; on TPU the
vanilla M-T form vectorizes better (pure fma chains on the VPU), so that is
what we use (SURVEY §7.2).

All functions are batched: a "ray batch" is (o, d) with shape (..., 3) and
primitives broadcast against it.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m


def ray_triangle(o, d, p0, e1, e2, t_min, t_max):
    """Moeller-Trumbore. Returns (hit, t, u, v).

    o, d: (..., 3) ray origin/direction; p0: (..., 3) triangle base vertex;
    e1 = p1 - p0, e2 = p2 - p0.
    """
    pvec = jnp.cross(d, e2)
    det = m.dot(e1, pvec)
    inv_det = m.safe_div(1.0, det)
    tvec = o - p0
    u = m.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = m.dot(d, qvec) * inv_det
    t = m.dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def ray_aabb(o, inv_d, lo, hi, t_min, t_max):
    """Slab test. inv_d = 1/d precomputed. Returns hit mask (...,)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t_near <= t_far


def ray_sphere(o, d, center, radius, t_min, t_max):
    """Analytic sphere intersection (reference sphere.cpp:rayIntersect).

    Returns (hit, t) for the nearest valid t in (t_min, t_max).
    """
    oc = o - center
    a = m.dot(d, d)
    b = 2.0 * m.dot(oc, d)
    c = m.dot(oc, oc) - radius * radius
    valid, t0, t1 = m.solve_quadratic(a, b, c)
    use0 = (t0 > t_min) & (t0 < t_max)
    use1 = (t1 > t_min) & (t1 < t_max)
    t = jnp.where(use0, t0, t1)
    hit = valid & (use0 | use1)
    return hit, t


def ray_brute_force_tris(o, d, p0, e1, e2, t_min, t_max):
    """Closest hit against a small, unstructured triangle soup.

    o, d: (R, 3); p0/e1/e2: (T, 3). Returns (hit (R,), t (R,), idx (R,),
    u (R,), v (R,)). O(R*T) — the right call below ~1k triangles where BVH
    gather overhead dominates (Cornell-class scenes).
    """
    ob = o[:, None, :]
    db = d[:, None, :]
    hit, t, u, v = ray_triangle(
        ob, db, p0[None], e1[None], e2[None], t_min[:, None], t_max[:, None]
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=1)
    r = jnp.arange(o.shape[0])
    best_t = t_masked[r, idx]
    any_hit = jnp.isfinite(best_t)
    return (
        any_hit,
        jnp.where(any_hit, best_t, jnp.inf),
        jnp.where(any_hit, idx, -1).astype(jnp.int32),
        u[r, idx],
        v[r, idx],
    )


def ray_brute_force_spheres(o, d, center, radius, t_min, t_max):
    """Closest hit against an analytic-sphere array: o,d (R,3); center (S,3),
    radius (S,). Returns (hit, t, idx)."""
    hit, t = ray_sphere(
        o[:, None, :], d[:, None, :], center[None], radius[None],
        t_min[:, None], t_max[:, None],
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=1)
    r = jnp.arange(o.shape[0])
    best_t = t_masked[r, idx]
    any_hit = jnp.isfinite(best_t)
    return any_hit, jnp.where(any_hit, best_t, jnp.inf), jnp.where(any_hit, idx, -1).astype(jnp.int32)
