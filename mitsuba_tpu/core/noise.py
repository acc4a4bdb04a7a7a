"""Perlin gradient noise (reference: src/libcore/noise.cpp — Perlin's
improved noise, 2002).

Re-derived TPU-native: instead of the classic 256-entry permutation table
(a gather per lattice corner — hostile to the VPU), lattice gradients come
from the counter-based PCG hash already used for sampling (core.rng.pcg4d),
which is stateless, batched, and needs no table memory. Same algorithm
class: trilinear interpolation of dot(gradient, offset) over the 8 lattice
corners with the quintic fade, matching noise.cpp's Noise() behavior
(smooth band-limited [-1, 1] gradient noise, zero at lattice points).
"""
from __future__ import annotations

import jax.numpy as jnp

from .rng import pcg4d


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _gradient_dot(ix, iy, iz, fx, fy, fz):
    """dot(g, f) with g a pseudo-random unit-ish gradient at integer
    lattice point (ix, iy, iz) — one of the 12 edge directions selected by
    the hash (Perlin 2002's gradient set, branchless form)."""
    h = pcg4d(jnp.stack(
        [ix.astype(jnp.uint32), iy.astype(jnp.uint32),
         iz.astype(jnp.uint32),
         jnp.full_like(ix, 0x9E3779B9).astype(jnp.uint32)], axis=-1,
    ))[..., 0] >> jnp.uint32(28)  # 4 bits, like grad()'s h & 15
    h = h.astype(jnp.int32)
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    return (jnp.where(h & 1 == 0, u, -u)
            + jnp.where(h & 2 == 0, v, -v))


def perlin_3d(p):
    """Batched improved Perlin noise of (..., 3) points -> (...,) in
    roughly [-1, 1]."""
    pf = jnp.floor(p)
    ix = pf[..., 0].astype(jnp.int32)
    iy = pf[..., 1].astype(jnp.int32)
    iz = pf[..., 2].astype(jnp.int32)
    f = p - pf
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    u, v, w = _fade(fx), _fade(fy), _fade(fz)

    def corner(dx, dy, dz):
        return _gradient_dot(ix + dx, iy + dy, iz + dz,
                             fx - dx, fy - dy, fz - dz)

    def lerp(t, a, b):
        return a + t * (b - a)

    x00 = lerp(u, corner(0, 0, 0), corner(1, 0, 0))
    x10 = lerp(u, corner(0, 1, 0), corner(1, 1, 0))
    x01 = lerp(u, corner(0, 0, 1), corner(1, 0, 1))
    x11 = lerp(u, corner(0, 1, 1), corner(1, 1, 1))
    y0 = lerp(v, x00, x10)
    y1 = lerp(v, x01, x11)
    return lerp(w, y0, y1)


def fbm(p, octaves: int = 4, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractional Brownian motion: sum of ``octaves`` noise octaves
    (noise.cpp turbulence/fbm role). Static octave count (unrolled)."""
    total = 0.0
    amp = 1.0
    norm = 0.0
    q = p
    for _ in range(octaves):
        total = total + amp * perlin_3d(q)
        norm += amp
        amp *= gain
        q = q * lacunarity
    return total / norm


def turbulence(p, octaves: int = 4, lacunarity: float = 2.0,
               gain: float = 0.5):
    """Sum of |noise| octaves (noise.cpp turbulence)."""
    total = 0.0
    amp = 1.0
    norm = 0.0
    q = p
    for _ in range(octaves):
        total = total + amp * jnp.abs(perlin_3d(q))
        norm += amp
        amp *= gain
        q = q * lacunarity
    return total / norm
