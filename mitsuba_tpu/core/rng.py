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
SOBOL = 6        # sobol.cpp: true multi-dim Sobol directions (qmc.sobol_nd)

_QMC_TYPES = (LD, HALTON, HAMMERSLEY, FAURE, SOBOL)
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


# Dimensions whose compact index is below this use prime-base radical
# inverses (authentic halton/hammersley/faure character); beyond it we
# switch to XOR-scrambled (0,2) pairs.  Rationale: the radical inverse in
# base b enumerated to N samples has star discrepancy ~ b/N — at typical
# 16-256 spp bases beyond ~40 are near-linear ramps whose deterministic
# integration error does NOT average out across pixels (the round-1
# hammersley/faure +6-8% brightness bias), while the scrambled
# (0,2)-sequence keeps perfect base-2 stratification at every dim.
_PRIME_DIMS = 5


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
    if _SAMPLER_TYPE == SOBOL:
        # sobol.cpp role: one Sobol dimension pair per integrator dim, the
        # same XOR scramble decorrelating (pixel, dim) streams
        qd_s = jnp.where(dim_b >= 4, dim_b - 2, dim_b).astype(jnp.int32)
        u0 = qmc.sobol_nd(2 * qd_s, sample_b, scr[..., 0])
        u1 = qmc.sobol_nd(2 * qd_s + 1, sample_b, scr[..., 1])
        return jnp.stack([u0, u1], axis=-1)
    sob = qmc.sobol02(sample_b, scr[..., 0], scr[..., 1])
    if _SAMPLER_TYPE == LD:
        return sob
    # compact dim index: integrators reserve slots 2-3 (unused) between the
    # sensor/aperture dims and DIM_BASE=4, so skip them to keep the first
    # bounce on small prime bases
    qd = jnp.where(dim_b >= 4, dim_b - 2, dim_b).astype(jnp.int32)
    use_primes = qd < _PRIME_DIMS
    pi0 = jnp.clip(2 * qd, 0, 30)
    pi1 = jnp.clip(2 * qd + 1, 0, 31)
    rot_x = scr[..., 0].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    rot_y = scr[..., 1].astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    if _SAMPLER_TYPE == FAURE:
        # faure.cpp: Faure-permuted digits; per-(pixel, dim) Cranley-
        # Patterson rotation decorrelates streams (a CP rotation keeps every
        # marginal exactly uniform, unlike the round-1 index-offset scheme)
        u0 = qmc.scrambled_radical_inverse(pi0, sample_b) + rot_x
        u1 = qmc.scrambled_radical_inverse(pi1, sample_b) + rot_y
        u0, u1 = u0 - jnp.floor(u0), u1 - jnp.floor(u1)
    else:
        # halton.cpp / hammersley.cpp: dim-indexed prime radical inverses
        u0 = qmc.radical_inverse(pi0, sample_b, rot_x)
        u1 = qmc.radical_inverse(pi1, sample_b, rot_y)
    if _SAMPLER_TYPE == HAMMERSLEY:
        # hammersley.cpp: i/N is the FIRST dimension only (image plane);
        # round-1 bug: returning (i+rot)/N for every dim made all path
        # dimensions share one stratified coordinate -> ~8% bright bias.
        # The raw ramp is monotone in i and thus correlated with the
        # near-monotone low-index prime radical inverses of later dims; a
        # per-pixel XOR permutation of the index (exact for power-of-two N)
        # keeps the 1/N stratification while decorrelating the order.
        n = _N_SAMPLES
        if n & (n - 1) == 0 and n > 1:
            s_lo = (sample_b.astype(jnp.uint32) ^ scr[..., 2]) & jnp.uint32(n - 1)
        else:
            s_lo = sample_b.astype(jnp.uint32) % jnp.uint32(n)
        strat = (s_lo.astype(jnp.float32) + rot_x) / jnp.float32(n)
        strat = strat - jnp.floor(strat)
        u0 = jnp.where(dim_b == 0, strat, u0)
    pr = jnp.stack([u0, u1], axis=-1)
    return jnp.where(use_primes[..., None], pr, sob)


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
