"""Core vector math for the TPU renderer.

Everything operates on ``jnp`` arrays with a trailing dimension of 3
(vectors/points/normals are not distinct classes as in the reference's
``include/mitsuba/core/vector.h`` — they are plain ``(..., 3)`` float32
arrays, the idiomatic JAX representation: batched, traceable, shardable).

Reference capabilities covered here: ``include/mitsuba/core/vector.h``,
``util.h`` (solveQuadratic, coordinate system helpers), ``frame.h`` math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-4          # ray epsilon, mirrors the reference's Epsilon (constants.h)
INF = jnp.inf
ONE_MINUS_EPS = 0.99999994  # largest float < 1


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def abs_dot(a, b, keepdims: bool = False):
    return jnp.abs(dot(a, b, keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims), 0.0))


def squared_length(v, keepdims: bool = False):
    return dot(v, v, keepdims)


def normalize(v):
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v, keepdims=True), 1e-30))


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def safe_div(a, b, eps: float = 1e-20):
    """a / b with 0 where |b| is tiny (avoids NaN poisoning under AD)."""
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def lerp(a, b, t):
    return a + (b - a) * t


def sqr(x):
    return x * x


def coordinate_system(n):
    """Build a right-handed orthonormal basis around unit normal ``n``.

    Branch-free Duff et al. 2017 construction (the reference uses
    Frisvad-style branches in ``coordinateSystem``, ``util.cpp`` — branches
    are hostile to vector lanes, so we use the copysign variant).
    Returns (s, t) with s × t = n.
    """
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


def solve_quadratic(a, b, c):
    """Numerically-stable quadratic solve (reference: util.cpp solveQuadratic).

    Returns (valid, x0, x1) with x0 <= x1. Handles the linear case a≈0.
    """
    linear = jnp.abs(a) < 1e-20
    lin_x = safe_div(-c, b)

    disc = b * b - 4.0 * a * c
    valid = disc >= 0.0
    sqrt_disc = safe_sqrt(disc)
    # Numerically stable: q = -0.5 (b + sign(b) sqrt(disc))
    q = -0.5 * (b + jnp.where(b < 0, -sqrt_disc, sqrt_disc))
    x0q = safe_div(q, a)
    x1q = safe_div(c, q)
    lo = jnp.minimum(x0q, x1q)
    hi = jnp.maximum(x0q, x1q)

    x0 = jnp.where(linear, lin_x, lo)
    x1 = jnp.where(linear, lin_x, hi)
    valid = jnp.where(linear, jnp.abs(b) > 1e-20, valid)
    return valid, x0, x1


def spherical_direction(theta, phi):
    """(theta, phi) -> unit vector, Z-up (reference: util.h sphericalDirection)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def spherical_coordinates(d):
    """unit vector -> (theta, phi) with phi in [0, 2pi)."""
    theta = safe_acos(d[..., 2])
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


def reflect(wi, n):
    """Reflect wi about n (both pointing away from surface)."""
    return 2.0 * dot(wi, n, keepdims=True) * n - wi


def refract(wi, n, eta):
    """Refract wi about n with relative IOR eta = n_inside/n_outside.

    wi points away from the surface, on the same side as n.
    Returns (valid, wt): valid is False on total internal reflection.
    """
    eta = jnp.asarray(eta)
    if eta.ndim == wi.ndim - 1:
        eta = eta[..., None]  # align with the kept vector axis
    cos_i = dot(wi, n, keepdims=True)
    inv_eta = 1.0 / eta
    sin2_t = inv_eta * inv_eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    valid = sin2_t[..., 0] <= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = -inv_eta * wi + (inv_eta * cos_i - cos_t) * n
    return valid, wt


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance for a dielectric boundary.

    ``cos_i`` may be signed (negative = ray arrives from inside); ``eta`` is
    int_ior/ext_ior. Mirrors reference ``util.cpp fresnelDielectricExt``.
    Returns (F, cos_t) where cos_t is the (signed) transmitted cosine.
    """
    out_mask = cos_i >= 0.0
    rel_eta = jnp.where(out_mask, eta, 1.0 / eta)
    ci = jnp.abs(cos_i)
    sin2_t = (1.0 - ci * ci) / (rel_eta * rel_eta)
    tir = sin2_t >= 1.0
    ct = safe_sqrt(1.0 - sin2_t)
    r_s = safe_div(ci - rel_eta * ct, ci + rel_eta * ct)
    r_p = safe_div(rel_eta * ci - ct, rel_eta * ci + ct)
    F = 0.5 * (r_s * r_s + r_p * r_p)
    F = jnp.where(tir, 1.0, F)
    cos_t = jnp.where(tir, 0.0, jnp.where(out_mask, -ct, ct))
    return F, cos_t


def fresnel_conductor(cos_i, eta, k):
    """Unpolarized Fresnel reflectance of a conductor (per channel).

    Mirrors reference ``util.cpp fresnelConductorExact``. ``eta``/``k`` are
    (..., 3) complex-IOR components; cos_i is (...,) or (..., 1).
    """
    if cos_i.ndim == eta.ndim - 1:
        cos_i = cos_i[..., None]
    ci2 = cos_i * cos_i
    si2 = 1.0 - ci2
    e2, k2 = eta * eta, k * k
    t0 = e2 - k2 - si2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + ci2
    a = safe_sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * cos_i
    rs = safe_div(t1 - t2, t1 + t2)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * safe_div(t3 - t4, t3 + t4)
    return 0.5 * (rp + rs)


def fresnel_diffuse_reflectance(eta):
    """Average Fresnel reflectance under diffuse illumination.

    Published polynomial fits (Egan & Hilgeman 1973 for eta<1, d'Eon &
    Irving 2011 for eta>=1), same scheme the reference's
    ``util.cpp fresnelDiffuseReflectance`` fast path uses.
    """
    inv_eta = 1.0 / eta
    fit_lt1 = -1.4399 * eta * eta + 0.7099 * eta + 0.6681 + 0.0636 * inv_eta
    fit_ge1 = (
        0.919317
        + inv_eta
        * (-3.4793 + inv_eta * (6.75335 + inv_eta * (-7.80989 + inv_eta * (4.98554 - inv_eta * 1.36881))))
    )
    return jnp.where(eta < 1.0, fit_lt1, fit_ge1)
