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
