"""Phase functions (reference: src/phase/{isotropic,hg,rayleigh}.cpp,
phase.h:146-207). Directions follow the flow convention of the reference:
``wi`` points toward the incoming direction's origin, ``wo`` is sampled;
cos_theta below is measured between -wi and wo (forward scattering g > 0
means wo continues along the propagation direction).

Masked dispatch like the BSDF layer; batched over lanes.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.frame import Frame

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2


def eval_pdf(ptype_arr, g_arr, wi, wo, active_types=(ISOTROPIC,)):
    """Phase value == its pdf for all supported models (they integrate to 1).

    wi: direction the photon arrived FROM (pointing away from collision),
    wo: outgoing direction. Returns (R,).
    """
    cos_t = -m.dot(wi, wo)
    out = jnp.zeros(wi.shape[:-1])
    for t in active_types:
        if t == ISOTROPIC:
            v = jnp.full(wi.shape[:-1], warp.INV_FOURPI)
        elif t == HG:
            g = g_arr
            # cos_t is measured against the propagation direction (-wi):
            # forward scattering (g>0) peaks at cos_t=1
            denom = 1.0 + g * g - 2.0 * g * cos_t
            v = warp.INV_FOURPI * (1.0 - g * g) * m.safe_div(
                1.0, denom * m.safe_sqrt(denom)
            )
        elif t == RAYLEIGH:
            v = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)
        else:
            continue
        out = jnp.where(ptype_arr == t, v, out)
    return out


def sample(ptype_arr, g_arr, wi, u2, active_types=(ISOTROPIC,)):
    """Sample wo with pdf == eval (perfect importance sampling for all
    models). Returns (wo, pdf)."""
    out_wo = jnp.zeros_like(wi)
    for t in active_types:
        if t == ISOTROPIC:
            wo = warp.square_to_uniform_sphere(u2)
        elif t == HG:
            g = g_arr
            sq = m.safe_div(1.0 - g * g, 1.0 - g + 2.0 * g * u2[..., 0])
            cos_t = m.safe_div(1.0 + g * g - sq * sq, 2.0 * g)
            cos_t = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], cos_t)
            cos_t = jnp.clip(cos_t, -1.0, 1.0)
            sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
            phi = 2.0 * jnp.pi * u2[..., 1]
            local = jnp.stack(
                [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
            )
            # forward axis = propagation direction = -wi
            wo = Frame.from_normal(-wi).to_world(local)
        elif t == RAYLEIGH:
            # invert the (1+cos^2) CDF via Cardano (rayleigh.cpp approach)
            z = 2.0 * (2.0 * u2[..., 0] - 1.0)
            tmp = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
            cos_t = jnp.clip(tmp - 1.0 / tmp, -1.0, 1.0)
            sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
            phi = 2.0 * jnp.pi * u2[..., 1]
            local = jnp.stack(
                [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
            )
            wo = Frame.from_normal(-wi).to_world(local)
        else:
            continue
        out_wo = jnp.where((ptype_arr == t)[..., None], wo, out_wo)
    pdf = eval_pdf(ptype_arr, g_arr, wi, out_wo, active_types)
    return out_wo, pdf
