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


# --- pluggable sampler strategy (src/samplers parity) ----------------------
# The draw functions below dispatch on this module-level mode, fixed at
# trace time (api.render closes over it per render call). INDEPENDENT uses
# pure PCG; LD replaces every 2D pair with a per-(pixel, dim) XOR-scrambled
# (0,2)-sequence indexed by the sample counter (ldsampler/sobol.cpp role);
# HALTON uses rotated prime-base radical inverses.
INDEPENDENT = 0
STRATIFIED = 1   # handled at the pixel-position level in render.api
LD = 2
HALTON = 3
HAMMERSLEY = 4   # hammersley.cpp: (i+rot)/N first component + radical inverse
FAURE = 5        # faure.cpp: Faure-permuted radical inverses

_QMC_TYPES = (LD, HALTON, HAMMERSLEY, FAURE)
_N_SAMPLES = 16  # hammersley total-sample-count (set_sampler(n=...))

_SAMPLER_TYPE = INDEPENDENT

# --- primary-sample-space override (MLT family) -----------------------------
# When set (to a traced (R, NSLOTS, 4) float32 table), every uniform* draw
# returns table[pixel, dim] instead of hashing — the caller passes the chain
# lane index as `pixel`. This is how the Kelemen-style integrators
# (pssmlt/mlt/erpt) drive the ordinary path/bdpt kernels from a mutable
# primary sample vector (reference: pssmlt_sampler.cpp's lazy PSSMLTSampler
# wrapping every next1D/2D call). Set/reset inside the traced function body,
# so the global holds a tracer only during tracing.
_PSS_TABLE = None


class pss_mode:
    """Context manager routing RNG draws to a PSS table during tracing."""

    def __init__(self, table):
        self.table = table

    def __enter__(self):
        global _PSS_TABLE
        self._saved = _PSS_TABLE
        _PSS_TABLE = self.table

    def __exit__(self, *exc):
        global _PSS_TABLE
        _PSS_TABLE = self._saved
        return False


def _pss_lookup(pixel, dim):
    tab = _PSS_TABLE
    pixel_b, dim_b = jnp.broadcast_arrays(jnp.asarray(pixel), jnp.asarray(dim))
    d = jnp.clip(dim_b.astype(jnp.int32), 0, tab.shape[1] - 1)
    return tab[pixel_b.astype(jnp.int32), d]


def set_sampler(t: int, n: int = None) -> None:
    global _SAMPLER_TYPE, _N_SAMPLES
    _SAMPLER_TYPE = LD if t == STRATIFIED else t
    if n is not None:
        _N_SAMPLES = max(int(n), 1)


def get_sampler() -> int:
    return _SAMPLER_TYPE


def _qmc2(seed, pixel, sample, dim):
    """One scrambled low-discrepancy 2D point per (pixel, dim) stream."""
    from . import qmc

    seed_b, pixel_b, sample_b, dim_b = jnp.broadcast_arrays(
        jnp.asarray(seed), jnp.asarray(pixel), jnp.asarray(sample), jnp.asarray(dim)
    )
    scr = pcg4d(
        jnp.stack(
            [
                seed_b.astype(jnp.uint32),
                pixel_b.astype(jnp.uint32),
                dim_b.astype(jnp.uint32),
                jnp.full_like(pixel_b, 0x9E3779B9).astype(jnp.uint32),
            ],
            axis=-1,
        )
    )
    if _SAMPLER_TYPE == HALTON:
        rot_x = scr[..., 0].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
        rot_y = scr[..., 1].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
        u0 = qmc.radical_inverse((2 * dim_b) % 30, sample_b, rot_x)
        u1 = qmc.radical_inverse((2 * dim_b + 1) % 30, sample_b, rot_y)
        return jnp.stack([u0, u1], axis=-1)
    if _SAMPLER_TYPE == HAMMERSLEY:
        # hammersley.cpp: first component enumerates i/N; rotation keeps the
        # per-(pixel, dim) streams decorrelated
        rot_x = scr[..., 0].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
        rot_y = scr[..., 1].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
        u0 = (sample_b.astype(jnp.float32) + rot_x) / jnp.float32(_N_SAMPLES)
        u0 = u0 - jnp.floor(u0)
        u1 = qmc.radical_inverse(dim_b % 30, sample_b, rot_y)
        return jnp.stack([u0, u1], axis=-1)
    if _SAMPLER_TYPE == FAURE:
        # faure.cpp: deterministic Faure-permuted digits; offset the index
        # per stream so pixels decorrelate without losing the permutation
        off = (scr[..., 0] >> jnp.uint32(20)).astype(jnp.uint32)
        u0 = qmc.scrambled_radical_inverse((2 * dim_b) % 30, sample_b + off)
        u1 = qmc.scrambled_radical_inverse((2 * dim_b + 1) % 30, sample_b + off)
        return jnp.stack([u0, u1], axis=-1)
    return qmc.sobol02(sample_b, scr[..., 0], scr[..., 1])


def uniform4(seed, pixel, sample, dim):
    """Four independent U[0,1) floats keyed by (seed, pixel, sample, dim).

    All arguments are int32/uint32 arrays (broadcastable); returns
    ``broadcast_shape + (4,)`` float32.
    """
    if _PSS_TABLE is not None:
        return _pss_lookup(pixel, dim)
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
    u = _to_unit_float(pcg4d(ctr))
    if _SAMPLER_TYPE in _QMC_TYPES:
        # the callers' convention is (selector, 2D pair, spare): put the
        # low-discrepancy pair in components 1-2 so lobe/emitter selection
        # stays decorrelated PCG while direction/position sampling gets the
        # (0,2)-sequence stratification
        q = _qmc2(seed, pixel, sample, dim)
        u = jnp.concatenate([u[..., :1], q, u[..., 3:]], axis=-1)
    return u


def uniform1(seed, pixel, sample, dim):
    if _PSS_TABLE is not None:
        return _pss_lookup(pixel, dim)[..., 0]
    if _SAMPLER_TYPE in _QMC_TYPES:
        return _qmc2(seed, pixel, sample, dim)[..., 0]
    return uniform4(seed, pixel, sample, dim)[..., 0]


def uniform2(seed, pixel, sample, dim):
    if _PSS_TABLE is not None:
        return _pss_lookup(pixel, dim)[..., :2]
    if _SAMPLER_TYPE in _QMC_TYPES:
        return _qmc2(seed, pixel, sample, dim)
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
