"""Sampling warps square -> sphere/hemisphere/disk/cone/triangle + pdfs.

Capability parity with the reference's ``include/mitsuba/core/warp.h:40-120``
(squareToUniformSphere/Hemisphere/CosineHemisphere/Cone/Disk/
DiskConcentric/Triangle/StdNormal/Tent and their densities), expressed as
pure vectorized functions over (..., 2) sample arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d=None):
    return INV_FOURPI


def square_to_uniform_hemisphere(u):
    z = u[..., 0]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d=None):
    return INV_TWOPI


def square_to_cosine_hemisphere(u):
    p = square_to_uniform_disk_concentric(u)
    z = m.safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in a cone around +Z with half-angle acos(cos_cutoff)."""
    z = 1.0 - u[..., 0] * (1.0 - cos_cutoff)
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / (1.0 - cos_cutoff)


def square_to_uniform_disk(u):
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_pdf(p=None):
    return INV_PI


def square_to_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk mapping (low distortion, preserves
    stratification — the reference uses this inside cosine-hemisphere too)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    cond = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(cond, x, y)
    ratio = jnp.where(
        cond,
        m.safe_div(y, x),
        m.safe_div(x, y),
    )
    phi = jnp.where(
        cond,
        (jnp.pi / 4.0) * ratio,
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio,
    )
    zero = (x == 0.0) & (y == 0.0)
    px = jnp.where(zero, 0.0, r * jnp.cos(phi))
    py = jnp.where(zero, 0.0, r * jnp.sin(phi))
    return jnp.stack([px, py], axis=-1)


def square_to_uniform_triangle(u):
    """Barycentric (b0, b1) uniform on the unit triangle (sqrt warp)."""
    a = m.safe_sqrt(u[..., 0])
    return jnp.stack([1.0 - a, a * u[..., 1]], axis=-1)


def square_to_std_normal(u):
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWOPI * jnp.exp(-0.5 * (p[..., 0] ** 2 + p[..., 1] ** 2))


def square_to_tent(u):
    """Per-axis tent warp on [-1, 1] (used for tent reconstruction filtering)."""

    def tent1(x):
        x = 2.0 * x
        return jnp.where(x < 1.0, jnp.sqrt(x) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - x, 0.0)))

    return jnp.stack([tent1(u[..., 0]), tent1(u[..., 1])], axis=-1)


def interval_to_nonuniform_tent(a, b, c, u):
    """Sample a tent with endpoints a, c and peak b (reference warp.cpp)."""
    left = u < (b - a) / (c - a)
    u_rel = jnp.where(left, u * (c - a) / (b - a), (1.0 - u) * (c - a) / (c - b))
    u_rel = jnp.clip(u_rel, 0.0, 1.0)
    x_left = a + (b - a) * jnp.sqrt(u_rel)
    x_right = c - (c - b) * jnp.sqrt(u_rel)
    return jnp.where(left, x_left, x_right)
