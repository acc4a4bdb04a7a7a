"""Quasi-Monte Carlo primitives (reference: include/mitsuba/core/qmc.h:43-101,
src/samplers/{ldsampler,sobol,halton,hammersley}.cpp).

* ``sobol02``: the classic (0,2)-sequence (Sobol dims 0/1: van der Corput +
  the x+1-polynomial dimension whose direction numbers follow
  v_{k+1} = v_k ^ (v_k >> 1)), XOR-scrambled per (pixel, dimension) — the
  TPU-native equivalent of ldsampler.cpp's per-pixel scrambled (0,2)
  enumeration (deterministic in (pixel, sample index), so distributed
  rendering equals serial rendering).
* ``radical_inverse``: prime-base radical inverse with Cranley-Patterson
  rotation (halton.cpp / hammersley.cpp workhorse).

All functions are batched over uint32 arrays.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# direction numbers for Sobol dimension 1 (dim 0 is plain bit reversal)
_V1 = np.zeros(32, np.uint32)
_v = np.uint32(1 << 31)
for _k in range(32):
    _V1[_k] = _v
    _v = np.uint32(_v ^ (_v >> np.uint32(1)))

_PRIMES = np.array(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
     71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131], np.uint32
)


def _reverse_bits(x):
    x = ((x >> jnp.uint32(16)) | (x << jnp.uint32(16)))
    x = ((x & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)) | (
        (x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)) | (
        (x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)) | (
        (x & jnp.uint32(0x33333333)) << jnp.uint32(2))
    x = ((x & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)) | (
        (x & jnp.uint32(0x55555555)) << jnp.uint32(1))
    return x


def sobol02(index, scramble_x=0, scramble_y=0):
    """(0,2)-sequence point for sample ``index`` (uint32 array), XOR-scrambled.

    Returns (..., 2) float32 in [0, 1).
    """
    index = jnp.asarray(index).astype(jnp.uint32)
    x = _reverse_bits(index) ^ jnp.asarray(scramble_x, jnp.uint32)

    v1 = jnp.asarray(_V1)
    y = jnp.zeros_like(index)
    for k in range(32):
        bit = (index >> jnp.uint32(k)) & jnp.uint32(1)
        y = y ^ (bit * v1[k])
    y = y ^ jnp.asarray(scramble_y, jnp.uint32)

    to_f = jnp.float32(2.3283064365386963e-10)  # 2^-32
    return jnp.stack(
        [x.astype(jnp.float32) * to_f, y.astype(jnp.float32) * to_f], axis=-1
    )


def radical_inverse(prime_index, index, rotation=0.0):
    """Radical inverse of ``index`` in the (prime_index)-th prime base with a
    Cranley-Patterson rotation (qmc.h radicalInverse + scrambling role).

    prime_index may be a traced int array; 16 digits cover indices < b^16.
    """
    base = jnp.asarray(_PRIMES)[jnp.clip(prime_index, 0, len(_PRIMES) - 1)]
    base_f = base.astype(jnp.float32)
    inv_base = 1.0 / base_f
    idx = jnp.asarray(index).astype(jnp.uint32)
    result = jnp.zeros(jnp.shape(idx), jnp.float32)
    factor = inv_base
    for _ in range(16):
        digit = (idx % base).astype(jnp.float32)
        result = result + digit * factor
        factor = factor * inv_base
        idx = idx // base
    u = result + jnp.asarray(rotation, jnp.float32)
    return u - jnp.floor(u)


# --- Faure digit permutations (faure.cpp role) -----------------------------
# sigma_2 = (0, 1); even b: 2*sigma_{b/2} ++ 2*sigma_{b/2}+1;
# odd b: insert (b-1)/2 in the middle of sigma_{b-1} and bump values >= it
# (Faure 1992's recursive construction, computed host-side once).
def _faure_perm(b):
    if b == 2:
        return np.array([0, 1], np.int64)
    if b % 2 == 0:
        h = _faure_perm(b // 2)
        return np.concatenate([2 * h, 2 * h + 1])
    c = (b - 1) // 2
    p = _faure_perm(b - 1)
    p = np.where(p >= c, p + 1, p)
    return np.concatenate([p[:c], [c], p[c:]])


_MAX_BASE = int(_PRIMES[31])
_FAURE = np.zeros((32, _MAX_BASE), np.uint32)
for _i, _b in enumerate(_PRIMES[:32]):
    _FAURE[_i, : int(_b)] = _faure_perm(int(_b))


def scrambled_radical_inverse(prime_index, index):
    """Radical inverse with per-digit Faure permutation
    (qmc.h scrambledRadicalInverse + faure.cpp permutation tables)."""
    pi = jnp.clip(prime_index, 0, len(_PRIMES) - 1)
    base = jnp.asarray(_PRIMES)[pi]
    base_f = base.astype(jnp.float32)
    inv_base = 1.0 / base_f
    perm = jnp.asarray(_FAURE)
    idx = jnp.asarray(index).astype(jnp.uint32)
    result = jnp.zeros(jnp.shape(idx), jnp.float32)
    factor = inv_base
    for _ in range(16):
        digit = (idx % base).astype(jnp.int32)
        sd = perm[pi, digit].astype(jnp.float32)
        result = result + sd * factor
        factor = factor * inv_base
        idx = idx // base
    return result


# --- true multi-dimensional Sobol' sequence ---------------------------------
# The reference ships a 108k-LoC generated direction-number table
# (src/samplers/sobolseq.cpp, sobol.cpp:277). We derive equivalent
# direction numbers at import time from scipy's Joe-Kuo data (public
# new-joe-kuo-6.21201 direction numbers) instead of copying the table:
# scipy.stats.qmc.Sobol stores v_k scaled to 30 bits; we left-shift to 32.

SOBOL_MAX_DIMS = 64
_SOBOL_SV = None


def sobol_direction_numbers(d: int = SOBOL_MAX_DIMS) -> np.ndarray:
    """(d, 32) uint32 direction numbers v_k (bit 31 = first output bit)."""
    global _SOBOL_SV
    if _SOBOL_SV is not None and _SOBOL_SV.shape[0] >= d:
        return _SOBOL_SV[:d]
    try:
        from scipy.stats import qmc as _q

        sv30 = np.asarray(_q.Sobol(d=d, scramble=False)._sv, np.uint64)
        bits = sv30.shape[1]
        sv = (sv30 << np.uint64(32 - bits)).astype(np.uint32)
        sv = np.concatenate(
            [sv, np.zeros((d, 32 - bits), np.uint32)], axis=1)
    except Exception:  # pragma: no cover - scipy always present in CI
        # fallback: dims 0/1 exact, higher dims degrade to scrambled (0,2)
        sv = np.zeros((d, 32), np.uint32)
        sv[0] = np.uint32(1) << (31 - np.arange(32, dtype=np.uint32))
        sv[1:] = _V1[None, :]
    _SOBOL_SV = sv
    return sv


def sobol_nd(dim, index, scramble=0):
    """Sobol' sample of dimension ``dim`` (traced int array) at ``index``.

    x_n = XOR over set bits i of n of v_{dim,i}, then a per-stream XOR
    scramble (preserves base-2 nets). Returns float32 in [0, 1).
    """
    sv = jnp.asarray(sobol_direction_numbers())
    dim_b, idx_b = jnp.broadcast_arrays(jnp.asarray(dim), jnp.asarray(index))
    dimc = jnp.clip(dim_b.astype(jnp.int32), 0, SOBOL_MAX_DIMS - 1)
    idx = idx_b.astype(jnp.uint32)
    rows = sv[dimc]  # (..., 32)
    x = jnp.zeros_like(idx)
    for i in range(32):
        bit = (idx >> jnp.uint32(i)) & jnp.uint32(1)
        x = x ^ jnp.where(bit == 1, rows[..., i], jnp.uint32(0))
    x = x ^ jnp.asarray(scramble, jnp.uint32)
    return (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(5.9604645e-8)
