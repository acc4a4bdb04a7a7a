"""Shared integrator machinery (reference: integrator.h:49-309,
MonteCarloIntegrator configuration integrator.cpp:190-225)."""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ...core import math as m

# integrator type tags (parity: src/integrators families)
AO = 0
DIRECT = 1
PATH = 2
FIELD = 3
VOLPATH = 4
PTRACER = 5
VPL = 6
SPPM = 7
ADAPTIVE = 8
MULTICHANNEL = 9
MOTION = 10
BDPT = 11
PSSMLT = 12
PPM = 13
PHOTONMAPPER = 14
MLT = 15
ERPT = 16
IRRCACHE = 17

# field integrator AOVs (misc/field.cpp)
FIELD_POSITION = 0
FIELD_NORMAL = 1
FIELD_SH_NORMAL = 2
FIELD_UV = 3
FIELD_ALBEDO = 4
FIELD_DISTANCE = 5
FIELD_PRIM_INDEX = 6
FIELD_GEO_NORMAL = 7


@dataclass(frozen=True)
class IntegratorConfig:
    """Static (compile-time) integrator settings."""

    type: int = PATH
    max_depth: int = 5           # path.cpp maxDepth semantics: 1=Le only, 2=direct
    rr_depth: int = 5            # Russian roulette start (integrator.cpp:202)
    strict_normals: bool = False
    hide_emitters: bool = False
    # direct.cpp
    emitter_samples: int = 1
    bsdf_samples: int = 1
    # ao.cpp
    ray_length: float = -1.0     # <0: auto (scene radius * 0.5)
    shading_samples: int = 1
    # field.cpp
    field: int = FIELD_NORMAL
    # vpl.cpp
    vpl_count: int = 64          # light-walk count (shadowMapResolution analog n/a)
    vpl_clamp: float = 0.05      # relative min-distance bound (vpl.cpp clamping)
    # photonmapper.cpp / ppm.cpp / sppm.cpp
    photon_count: int = 65536    # photons emitted per pass
    initial_radius: float = -1.0  # gather radius (<0: auto from scene extent)
    sppm_alpha: float = 0.7      # radius-shrink exponent (sppm.cpp alpha)
    # pssmlt.cpp / mlt.cpp / erpt.cpp
    p_large: float = 0.3         # large-step probability (pssmlt.cpp pLarge)
    chain_count: int = 16384     # Markov chains in flight (lanes; ref: 1/worker)
    luminance_samples: int = 65536  # stage-1 normalization samples
    chain_length: int = 64       # erpt mutations per seed (numChains analog)
    # misc/adaptive.cpp
    max_error: float = 0.05      # relative error bound (adaptive.cpp maxError)
    p_value: float = 0.05        # Student's-t confidence (adaptive.cpp pValue)
    max_sample_factor: int = 32  # budget cap x base spp (maxSampleFactor)


def mis_power(pdf_a, pdf_b):
    """Power heuristic beta=2 (path.cpp miWeight :296-300)."""
    a2 = pdf_a * pdf_a
    return m.safe_div(a2, a2 + pdf_b * pdf_b)


# RNG dimension allocation (per sample):
# 0: pixel jitter, 1: aperture, 2: time/spare, then per bounce:
DIM_SENSOR = 0
DIM_APERTURE = 1
DIM_WAVELENGTH = 2   # spectral mode hero-wavelength draw
DIM_BASE = 4
DIMS_PER_BOUNCE = 4
DIM_NEE = 0       # 4d: emitter select + 2d position
DIM_BSDF = 1      # 4d: lobe select + 2d direction
DIM_RR = 2


def ray_offset(p, gn, d):
    """Offset a secondary-ray origin along the geometric normal to avoid
    self-intersection (the reference relies on relative ray epsilons,
    constants.h Epsilon; an explicit normal offset is sturdier in fp32)."""
    s = jnp.sign(m.dot(gn, d, keepdims=True))
    mag = 1e-4 * (1.0 + jnp.max(jnp.abs(p), axis=-1, keepdims=True))
    return p + gn * s * mag
