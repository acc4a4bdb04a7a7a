"""Phase functions (reference: src/phase/{isotropic,hg,rayleigh,kkay,
microflake,mixturephase}.cpp, phase.h:146-207). Directions follow the flow
convention of the reference: ``wi`` points toward the incoming direction's
origin, ``wo`` is sampled; cos_theta below is measured between -wi and wo
(forward scattering g > 0 means wo continues along the propagation
direction).

Masked dispatch like the BSDF layer; batched over lanes. Unlike the BSDF
layer, phase value and pdf are separate returns because the anisotropic
fiber models (kkay, microflake) are not perfectly importance sampled.

TPU-first deviations from the reference:
- ``microflake`` uses a Gaussian flake-normal distribution concentrated
  perpendicular to the fiber axis (Zhao et al. style specular flakes)
  with closed-form normalization, instead of the reference's fitted
  expansions (src/phase/microflake.cpp + microflake_fiber.h) — same
  capability (anisotropic fiber media), branch-free sampling via erfinv.
- ``mixturephase`` mixes two HG lobes selected per-lane (the dominant use
  of mixturephase.cpp), rather than arbitrary child plugins.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import erf, erfinv

from ..core import math as m
from ..core import warp
from ..core.frame import Frame

ISOTROPIC = 0
HG = 1
RAYLEIGH = 2
MIXTURE = 3      # mixturephase.cpp: weighted pair of HG lobes
KKAY = 4         # kkay.cpp: Kajiya-Kay hair fiber
MICROFLAKE = 5   # microflake.cpp: specular fiber flakes


class PhaseParams(NamedTuple):
    """Per-lane phase parameters, gathered from MediumTable by medium id."""

    g: jnp.ndarray        # (R,) HG asymmetry / mixture lobe 1
    g2: jnp.ndarray       # (R,) mixture lobe 2
    w2: jnp.ndarray       # (R,) mixture weight of lobe 2
    ks: jnp.ndarray       # (R,) kkay specular weight (kd = 1 - ks)
    exponent: jnp.ndarray  # (R,) kkay specular exponent
    sigma: jnp.ndarray    # (R,) microflake flake-normal std dev
    axis: jnp.ndarray     # (R, 3) fiber tangent (kkay/microflake)

    @staticmethod
    def iso_like(shape):
        z = jnp.zeros(shape)
        return PhaseParams(
            g=z, g2=z, w2=z, ks=z, exponent=jnp.ones(shape) * 4.0,
            sigma=jnp.full(shape, 0.3),
            axis=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), shape + (3,)),
        )


def _hg(cos_t, g):
    denom = 1.0 + g * g - 2.0 * g * cos_t
    return warp.INV_FOURPI * (1.0 - g * g) * m.safe_div(
        1.0, denom * m.safe_sqrt(denom)
    )


def _hg_sample_dir(wi, g, u2):
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
    return Frame.from_normal(-wi).to_world(local)


def _kkay_profile(ct_o, ct_i, ks, exponent):
    """Azimuth-free Kajiya-Kay profile as a function of cos(angle to fiber).

    diffuse lobe ~ sin(theta_o); specular lobe ~ cos^p of the angle to the
    mirrored cone (kkay.cpp's diffuse+specular structure)."""
    so = m.safe_sqrt(1.0 - ct_o * ct_o)
    si = m.safe_sqrt(1.0 - ct_i * ct_i)
    spec_cos = jnp.clip(si * so - ct_i * ct_o, 0.0, 1.0)
    return (1.0 - ks) * so + ks * spec_cos ** exponent


def _kkay_norm(ct_i, ks, exponent, n=32):
    """2*pi * int_{-1}^{1} profile(t) dt via fixed midpoint quadrature
    (the reference precomputes its normalization numerically too)."""
    t = (jnp.arange(n) + 0.5) / n * 2.0 - 1.0          # (n,)
    prof = _kkay_profile(
        t[None, :], ct_i[..., None], ks[..., None], exponent[..., None]
    )
    return 2.0 * jnp.pi * jnp.sum(prof, axis=-1) * (2.0 / n)


def _kkay_eval(params: PhaseParams, wi, wo):
    ct_i = m.dot(-wi, params.axis)
    ct_o = m.dot(wo, params.axis)
    norm = jnp.maximum(_kkay_norm(ct_i, params.ks, params.exponent), 1e-8)
    return _kkay_profile(ct_o, ct_i, params.ks, params.exponent) / norm


def _flake_D(t, sigma):
    """Gaussian flake-normal pdf over the sphere as a function of
    t = m . axis; normalization is closed form:
    Z = 2*pi * sigma*sqrt(2*pi) * erf(1/(sigma*sqrt(2)))."""
    s = jnp.maximum(sigma, 1e-3)
    z = 2.0 * jnp.pi * s * jnp.sqrt(2.0 * jnp.pi) * erf(
        1.0 / (s * jnp.sqrt(2.0)))
    return jnp.exp(-0.5 * (t / s) ** 2) / z


def _flake_sigma(params: PhaseParams, omega, n_t=16, n_phi=8):
    """Projected flake area sigma(omega) = int D(m) |omega . m| dm, by
    fixed midpoint quadrature in (t, phi) around the fiber axis."""
    mu = m.dot(omega, params.axis)                        # (R,)
    smu = m.safe_sqrt(1.0 - mu * mu)
    t = ((jnp.arange(n_t) + 0.5) / n_t * 2.0 - 1.0)       # (n_t,)
    phi = (jnp.arange(n_phi) + 0.5) / n_phi * 2.0 * jnp.pi
    st = jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))
    # |omega . m| for m at (t, phi) in the axis frame
    dot_om = jnp.abs(
        mu[..., None, None] * t[None, :, None]
        + smu[..., None, None] * st[None, :, None] * jnp.cos(phi)[None, None, :]
    )
    D = _flake_D(t, params.sigma[..., None])              # (R, n_t)
    integrand = D[..., :, None] * dot_om                  # (R, n_t, n_phi)
    dA = (2.0 / n_t) * (2.0 * jnp.pi / n_phi)
    return jnp.sum(integrand, axis=(-1, -2)) * dA


def _microflake_val_pdf(params: PhaseParams, wi, wo):
    """Specular flake scattering: wo = reflect(omega, m), omega = -wi.

    value(wo) = D(h) / (2 sigma(omega))   (normalized: integrates to 1)
    pdf(wo)   = D(h) / (2 |omega . h|)    (our sampler draws m ~ D directly)
    with h the (sign-folded) half vector m = +-normalize(wo - omega)."""
    omega = -wi
    hn = m.normalize(wo - omega)
    cos_h = jnp.abs(m.dot(omega, hn))
    D = _flake_D(m.dot(hn, params.axis), params.sigma)
    sigma_o = jnp.maximum(_flake_sigma(params, omega), 1e-6)
    val = D / (2.0 * sigma_o)
    pdf = m.safe_div(D, 2.0 * jnp.maximum(cos_h, 1e-6))
    return val, pdf


def _microflake_sample(params: PhaseParams, wi, u2):
    s = jnp.maximum(params.sigma, 1e-3)
    cap = erf(1.0 / (s * jnp.sqrt(2.0)))
    t = jnp.sqrt(2.0) * s * erfinv(
        jnp.clip((2.0 * u2[..., 0] - 1.0) * cap, -0.999999, 0.999999))
    t = jnp.clip(t, -1.0, 1.0)
    st = m.safe_sqrt(1.0 - t * t)
    phi = 2.0 * jnp.pi * u2[..., 1]
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), t], axis=-1)
    mvec = Frame.from_normal(params.axis).to_world(local)
    omega = -wi
    wo = omega - 2.0 * m.dot(omega, mvec)[..., None] * mvec
    return m.normalize(wo)


def eval_pdf(ptype_arr, params, wi, wo, active_types=(ISOTROPIC,)):
    """Evaluate phase value AND sampling pdf.

    params: PhaseParams (or a bare g array for back-compat).
    wi points away from the collision toward where the photon came from;
    wo is the outgoing direction. Returns (value, pdf), both (R,).
    """
    params = _coerce(params, wi)
    cos_t = -m.dot(wi, wo)
    val = jnp.zeros(wi.shape[:-1])
    pdf = jnp.full(wi.shape[:-1], warp.INV_FOURPI)
    for t in active_types:
        if t == ISOTROPIC:
            v = jnp.full(wi.shape[:-1], warp.INV_FOURPI)
            p = v
        elif t == HG:
            v = _hg(cos_t, params.g)
            p = v
        elif t == RAYLEIGH:
            v = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)
            p = v
        elif t == MIXTURE:
            v = ((1.0 - params.w2) * _hg(cos_t, params.g)
                 + params.w2 * _hg(cos_t, params.g2))
            p = v
        elif t == KKAY:
            v = _kkay_eval(params, wi, wo)
            p = jnp.full(wi.shape[:-1], warp.INV_FOURPI)  # uniform sampling
        elif t == MICROFLAKE:
            v, p = _microflake_val_pdf(params, wi, wo)
        else:
            continue
        sel = ptype_arr == t
        val = jnp.where(sel, v, val)
        pdf = jnp.where(sel, p, pdf)
    return val, pdf


def sample(ptype_arr, params, wi, u2, active_types=(ISOTROPIC,)):
    """Sample wo. Returns (wo, weight, pdf) with weight = value/pdf
    ((R,); 1 for the perfectly importance-sampled models)."""
    params = _coerce(params, wi)
    out_wo = jnp.zeros_like(wi)
    for t in active_types:
        if t == ISOTROPIC:
            wo = warp.square_to_uniform_sphere(u2)
        elif t == HG:
            wo = _hg_sample_dir(wi, params.g, u2)
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
        elif t == MIXTURE:
            # pick a lobe hierarchically from u0, then rescale u0
            pick2 = u2[..., 0] < params.w2
            u0 = jnp.where(
                pick2,
                m.safe_div(u2[..., 0], jnp.maximum(params.w2, 1e-8)),
                m.safe_div(u2[..., 0] - params.w2,
                           jnp.maximum(1.0 - params.w2, 1e-8)),
            )
            uu = jnp.stack([jnp.clip(u0, 0.0, 1.0 - 1e-7), u2[..., 1]], -1)
            g_sel = jnp.where(pick2, params.g2, params.g)
            wo = _hg_sample_dir(wi, g_sel, uu)
        elif t == KKAY:
            wo = warp.square_to_uniform_sphere(u2)
        elif t == MICROFLAKE:
            wo = _microflake_sample(params, wi, u2)
        else:
            continue
        out_wo = jnp.where((ptype_arr == t)[..., None], wo, out_wo)
    val, pdf = eval_pdf(ptype_arr, params, wi, out_wo, active_types)
    weight = m.safe_div(val, pdf)
    return out_wo, weight, pdf


def _coerce(params, wi):
    if isinstance(params, PhaseParams):
        return params
    # back-compat: a bare HG g array
    shape = wi.shape[:-1]
    base = PhaseParams.iso_like(shape)
    return base._replace(g=jnp.broadcast_to(params, shape))
