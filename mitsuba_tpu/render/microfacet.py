"""Microfacet distributions: Beckmann, GGX.

Capability parity with the reference's shared microfacet core
(src/bsdfs/microfacet.h:45-67): eval D, Smith shadowing-masking G, classic
D·cos sampling, and Heitz visible-normal sampling (sampleVisible) for GGX,
with anisotropic alpha_u/alpha_v. All directions are in the local shading
frame (+Z = normal); everything is batched.

Sampling strategy (static per distribution type, resolved by the BSDF
layer's masked dispatch): GGX uses visible-normal sampling (lower variance,
exact closed form); Beckmann uses classic D·cos sampling (the reference's
sampleVisible=false path) — each `sample_*` returns the pdf of the exact
density it draws from, so sample/pdf pairs are always chi-square-consistent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr

BECKMANN = 0
GGX = 1


def _project_roughness(alpha_u, alpha_v, w):
    """Anisotropic roughness projected onto direction w (reference
    microfacet.h projectRoughness)."""
    s2 = fr.sin_theta_2(w)
    inv_s2 = m.safe_div(1.0, s2)
    cos2 = w[..., 0] * w[..., 0] * inv_s2
    sin2 = w[..., 1] * w[..., 1] * inv_s2
    iso = jnp.abs(alpha_u - alpha_v) < 1e-7
    proj = jnp.sqrt(jnp.maximum(cos2 * alpha_u**2 + sin2 * alpha_v**2, 1e-12))
    return jnp.where(iso | (s2 < 1e-12), alpha_u, proj)


def eval_d(dist_type: int, alpha_u, alpha_v, mh):
    """Microfacet density D(m_h); zero below the horizon."""
    ct = fr.cos_theta(mh)
    ct2 = ct * ct
    up = ct > 0.0
    if dist_type == BECKMANN:
        ex = -(mh[..., 0] ** 2 / (alpha_u**2) + mh[..., 1] ** 2 / (alpha_v**2))
        ex = m.safe_div(ex, ct2)
        d = m.safe_div(jnp.exp(ex), jnp.pi * alpha_u * alpha_v * ct2 * ct2)
    elif dist_type == GGX:
        root = ct2 + mh[..., 0] ** 2 / (alpha_u**2) + mh[..., 1] ** 2 / (alpha_v**2)
        d = m.safe_div(1.0, jnp.pi * alpha_u * alpha_v * root * root)
    else:
        raise ValueError(dist_type)
    return jnp.where(up, jnp.maximum(d, 0.0), 0.0)


def smith_g1(dist_type: int, alpha_u, alpha_v, w, mh):
    """Smith monostatic shadowing G1(w, m_h)."""
    alpha = _project_roughness(alpha_u, alpha_v, w)
    tan_t = jnp.abs(fr.tan_theta(w))
    side_ok = m.dot(w, mh) * fr.cos_theta(w) > 0.0
    if dist_type == BECKMANN:
        a = m.safe_div(1.0, alpha * tan_t)
        poly = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
        g = jnp.where(a >= 1.6, 1.0, poly)
        g = jnp.where(tan_t < 1e-9, 1.0, g)
    elif dist_type == GGX:
        root = alpha * tan_t
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + root * root))
        g = jnp.where(tan_t < 1e-9, 1.0, g)
    else:
        raise ValueError(dist_type)
    return jnp.where(side_ok, g, 0.0)


def smith_g(dist_type: int, alpha_u, alpha_v, wi, wo, mh):
    return smith_g1(dist_type, alpha_u, alpha_v, wi, mh) * smith_g1(
        dist_type, alpha_u, alpha_v, wo, mh
    )


def sample_all(dist_type: int, alpha_u, alpha_v, u2):
    """Sample proportional to D(m) cosθ over the hemisphere. Returns (m_h, pdf)."""
    u0 = jnp.clip(u2[..., 0], 0.0, 1.0 - 1e-7)
    u1 = u2[..., 1]
    aniso = jnp.abs(alpha_u - alpha_v) > 1e-7
    phi_iso = 2.0 * jnp.pi * u1
    phi_a = jnp.arctan(alpha_v / alpha_u * jnp.tan(2.0 * jnp.pi * u1 + 0.5 * jnp.pi))
    phi_a = phi_a + jnp.pi * jnp.floor(2.0 * u1 + 0.5)
    phi = jnp.where(aniso, phi_a, phi_iso)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    inv_a2 = jnp.where(
        aniso,
        cp * cp / (alpha_u**2) + sp * sp / (alpha_v**2),
        1.0 / (alpha_u * alpha_u),
    )
    if dist_type == BECKMANN:
        tan2 = -jnp.log(jnp.maximum(1.0 - u0, 1e-20)) / inv_a2
    elif dist_type == GGX:
        tan2 = u0 / jnp.maximum(1.0 - u0, 1e-7) / inv_a2
    else:
        raise ValueError(dist_type)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = m.safe_sqrt(1.0 - ct * ct)
    mh = jnp.stack([st * cp, st * sp, ct], axis=-1)
    return mh, pdf_all(dist_type, alpha_u, alpha_v, mh)


def pdf_all(dist_type: int, alpha_u, alpha_v, mh):
    return eval_d(dist_type, alpha_u, alpha_v, mh) * jnp.maximum(fr.cos_theta(mh), 0.0)


def sample_visible(alpha_u, alpha_v, wi, u2):
    """Heitz 2018 GGX visible-normal sampling (reference microfacet.h:67).

    ``wi`` must be in the upper hemisphere (callers flip beforehand).
    Returns (m_h, pdf).
    """
    wi_s = m.normalize(
        jnp.stack([alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], axis=-1)
    )
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], wi_s.dtype), wi_s.shape)
    grazing = (wi_s[..., 2] < 0.9999)[..., None]
    t1 = jnp.where(
        grazing,
        m.normalize(jnp.cross(up, wi_s)),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], wi_s.dtype), wi_s.shape),
    )
    t2 = jnp.cross(wi_s, t1)
    r = jnp.sqrt(u2[..., 0])
    phi = 2.0 * jnp.pi * u2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + wi_s[..., 2])
    p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = m.safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * wi_s
    mh = m.normalize(
        jnp.stack(
            [alpha_u * nh[..., 0], alpha_v * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)],
            axis=-1,
        )
    )
    return mh, pdf_visible(GGX, alpha_u, alpha_v, wi, mh)


def pdf_visible(dist_type: int, alpha_u, alpha_v, wi, mh):
    """pdf of visible-normal sampling: G1(wi, m) |wi·m| D(m) / |cosθ_i|."""
    d = eval_d(dist_type, alpha_u, alpha_v, mh)
    g1 = smith_g1(dist_type, alpha_u, alpha_v, wi, mh)
    return m.safe_div(g1 * jnp.abs(m.dot(wi, mh)) * d, jnp.abs(fr.cos_theta(wi)))


def sample(dist_type: int, alpha_u, alpha_v, wi, u2):
    """Distribution-appropriate sampling: GGX -> visible normals,
    Beckmann -> classic. Returns (m_h, pdf)."""
    if dist_type == GGX:
        return sample_visible(alpha_u, alpha_v, wi, u2)
    return sample_all(dist_type, alpha_u, alpha_v, u2)


def pdf(dist_type: int, alpha_u, alpha_v, wi, mh):
    if dist_type == GGX:
        return pdf_visible(GGX, alpha_u, alpha_v, wi, mh)
    return pdf_all(dist_type, alpha_u, alpha_v, mh)
