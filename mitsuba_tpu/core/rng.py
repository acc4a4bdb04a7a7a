"""Counter-based stateless RNG.

The reference threads mutable SFMT sampler state through every worker
(src/libcore/random.cpp, per-core sampler clones in renderjob.cpp:58-69).
That design is hostile to SPMD: on TPU we want a pure function
(seed, pixel, sample, depth, dim) -> U[0,1) so that any lane of any chip can
draw its numbers independently and deterministically — the render is then
bitwise independent of the device mesh, which is how we get the reference's
"distributed render == serial render" property (sampler.h:94-111) for free.

Hash: PCG4D (Jarzynski & Olano, JCGT 2020, "Hash Functions for GPU
Rendering") — a well-known public mixing function, cheap on the VPU
(integer mul/add/xor/shift only).
"""
from __future__ import annotations

import jax.numpy as jnp

_PCG_MULT = jnp.uint32(1664525)
_PCG_INC = jnp.uint32(1013904223)


def pcg4d(v):
    """PCG4D mix of a (..., 4) uint32 array -> (..., 4) uint32."""
    v = v.astype(jnp.uint32)
    v = v * _PCG_MULT + _PCG_INC
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(5.9604645e-8)


def uniform4(seed, pixel, sample, dim):
    """Four independent U[0,1) floats keyed by (seed, pixel, sample, dim).

    All arguments are int32/uint32 arrays (broadcastable); returns
    ``broadcast_shape + (4,)`` float32.
    """
    seed, pixel, sample, dim = jnp.broadcast_arrays(
        jnp.asarray(seed), jnp.asarray(pixel), jnp.asarray(sample), jnp.asarray(dim)
    )
    ctr = jnp.stack(
        [
            seed.astype(jnp.uint32),
            pixel.astype(jnp.uint32),
            sample.astype(jnp.uint32),
            dim.astype(jnp.uint32),
        ],
        axis=-1,
    )
    return _to_unit_float(pcg4d(ctr))


def uniform1(seed, pixel, sample, dim):
    return uniform4(seed, pixel, sample, dim)[..., 0]


def uniform2(seed, pixel, sample, dim):
    return uniform4(seed, pixel, sample, dim)[..., :2]


class SampleStream:
    """Trace-time helper that hands out consecutive RNG dimensions.

    ``dim_base`` may be a traced int32 (e.g. depth * DIMS_PER_BOUNCE) while
    the per-draw offset advances statically at trace time, so every draw in
    the compiled program touches a distinct counter.
    """

    def __init__(self, seed, pixel, sample, dim_base=0):
        self.seed = seed
        self.pixel = pixel
        self.sample = sample
        self.dim_base = dim_base
        self._offset = 0

    def next_1d(self):
        v = uniform1(self.seed, self.pixel, self.sample, self.dim_base + self._offset)
        self._offset += 1
        return v

    def next_2d(self):
        v = uniform2(self.seed, self.pixel, self.sample, self.dim_base + self._offset)
        self._offset += 1
        return v

    def next_4d(self):
        v = uniform4(self.seed, self.pixel, self.sample, self.dim_base + self._offset)
        self._offset += 1
        return v
