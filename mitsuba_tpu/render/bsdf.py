"""BSDF models with masked type-dispatch.

The reference dispatches BSDFs virtually per ray (include/mitsuba/render/
bsdf.h:215-285, plugins in src/bsdfs/). On TPU, per-lane virtual dispatch
does not exist: instead every material *type* present in the scene is
evaluated for the whole batch and the per-lane result selected with
``where`` masks — a few extra VPU flops in exchange for zero divergence.

Conventions follow the reference:
* directions are unit vectors in the local shading frame, +Z = normal;
* ``wi`` points toward the previous vertex (camera side), ``wo`` is the
  sampled/queried outgoing direction;
* ``eval`` returns f(wi, wo) * |cosθo| (solid-angle measure, like
  BSDF::eval in bsdf.h);
* ``pdf`` is the solid-angle density of ``sample`` (smooth lobes only;
  delta lobes contribute 0 to eval/pdf);
* ``sample`` returns (wo, weight, pdf, is_delta, eta) with
  weight = f·|cosθo|/pdf (reference BSDF::sample semantics) and eta the
  relative index-of-refraction change along the sampled lobe.

Parity targets: diffuse.cpp, roughdiffuse.cpp (Oren-Nayar), dielectric.cpp,
thindielectric.cpp, roughdielectric.cpp, conductor.cpp, roughconductor.cpp,
plastic.cpp, roughplastic.cpp, phong.cpp, ward.cpp, mask.cpp, twosided.cpp,
null.cpp (more families arrive with the texture system).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from ..core import warp
from . import microfacet as mf

# --- type tags ------------------------------------------------------------
DIFFUSE = 0
DIELECTRIC = 1
CONDUCTOR = 2
ROUGH_CONDUCTOR = 3
PLASTIC = 4
ROUGH_PLASTIC = 5
ROUGH_DIELECTRIC = 6
THIN_DIELECTRIC = 7
ROUGH_DIFFUSE = 8   # Oren-Nayar
PHONG = 9
WARD = 10
NULL = 11
MASK = 12           # opacity-masked nested BSDF (opacity from texture slot)

SMOOTH_TYPES = (DIFFUSE, PLASTIC, ROUGH_CONDUCTOR, ROUGH_PLASTIC,
                ROUGH_DIELECTRIC, ROUGH_DIFFUSE, PHONG, WARD)
DELTA_TYPES = (DIELECTRIC, CONDUCTOR, THIN_DIELECTRIC, NULL)


class MaterialTable(NamedTuple):
    """Array-of-structs material storage (one row per scene material)."""

    type: jnp.ndarray        # (M,) int32 type tag
    dist: jnp.ndarray        # (M,) int32 microfacet distribution (mf.BECKMANN/GGX)
    albedo: jnp.ndarray      # (M, 3) diffuse reflectance
    albedo_tex: jnp.ndarray  # (M,) int32 texture id or -1
    spec_refl: jnp.ndarray   # (M, 3) specular reflectance tint
    spec_trans: jnp.ndarray  # (M, 3) specular transmittance tint
    eta: jnp.ndarray         # (M, 3) IOR (dielectric: scalar replicated; conductor: rgb)
    k: jnp.ndarray           # (M, 3) conductor absorption
    alpha: jnp.ndarray       # (M, 2) roughness alpha_u, alpha_v
    alpha_tex: jnp.ndarray   # (M,) int32 roughness texture id or -1
    nonlinear: jnp.ndarray   # (M,) bool (plastic internal-scattering mode)
    twosided: jnp.ndarray    # (M,) bool: flip frame on backface (twosided.cpp)
    opacity_tex: jnp.ndarray # (M,) int32 opacity texture (mask.cpp) or -1
    interior_medium: jnp.ndarray  # (M,) int32 medium id inside the surface (-1 none)

    @property
    def count(self):
        return self.type.shape[0]


class BsdfLocals(NamedTuple):
    """Per-lane material parameters gathered for a batch of interactions.

    ``albedo``/``alpha`` are post-texture-lookup values so gradients w.r.t.
    texture contents flow through here.
    """

    type: jnp.ndarray      # (R,)
    dist: jnp.ndarray      # (R,)
    albedo: jnp.ndarray    # (R, 3)
    spec_refl: jnp.ndarray
    spec_trans: jnp.ndarray
    eta_s: jnp.ndarray     # (R,) scalar ior (dielectric/plastic)
    eta_c: jnp.ndarray     # (R, 3) conductor eta
    k_c: jnp.ndarray       # (R, 3)
    alpha: jnp.ndarray     # (R, 2)
    nonlinear: jnp.ndarray # (R,) bool (plastic internal-scattering mode)
    twosided: jnp.ndarray  # (R,) bool


class BsdfSample(NamedTuple):
    wo: jnp.ndarray        # (R, 3)
    weight: jnp.ndarray    # (R, 3) f*cos/pdf
    pdf: jnp.ndarray       # (R,) density (1 for delta lobes)
    is_delta: jnp.ndarray  # (R,) bool
    eta: jnp.ndarray       # (R,) relative IOR along sampled lobe


def gather_locals(table: MaterialTable, mat_id, albedo_override=None,
                  alpha_override=None) -> BsdfLocals:
    mid = jnp.maximum(mat_id, 0)
    albedo = table.albedo[mid] if albedo_override is None else albedo_override
    alpha = table.alpha[mid] if alpha_override is None else alpha_override
    return BsdfLocals(
        type=table.type[mid],
        dist=table.dist[mid],
        albedo=albedo,
        spec_refl=table.spec_refl[mid],
        spec_trans=table.spec_trans[mid],
        eta_s=table.eta[mid][..., 0],
        eta_c=table.eta[mid],
        k_c=table.k[mid],
        alpha=alpha,
        nonlinear=table.nonlinear[mid],
        twosided=table.twosided[mid],
    )


def _flip_twosided(bl: BsdfLocals, wi, wo=None):
    """twosided.cpp semantics: when the incident ray arrives from below,
    flip the frame so one-sided models see the upper hemisphere."""
    flip = bl.twosided & (wi[..., 2] < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)[..., None]
    zflip = jnp.concatenate([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], axis=-1)
    wi_f = wi * zflip
    if wo is None:
        return wi_f, zflip
    return wi_f, wo * zflip, zflip


# === per-type lobes (each takes BsdfLocals + directions, full batch) ======

def _diffuse_eval(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    f = bl.albedo * (warp.INV_PI * jnp.maximum(wo[..., 2], 0.0))[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _diffuse_pdf(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)


def _diffuse_sample(bl, wi, u_lobe, u2):
    wo = warp.square_to_cosine_hemisphere(u2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], bl.albedo, 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(wi.shape[:-1], bool), jnp.ones(wi.shape[:-1])


def _rough_diffuse_eval(bl, wi, wo):
    """Oren-Nayar qualitative model (roughdiffuse.cpp fast mode).

    sigma is derived from alpha the way the reference converts
    (roughdiffuse.cpp: sigma = alpha / sqrt(2))."""
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    sigma = bl.alpha[..., 0] * 0.70710678
    sigma2 = sigma * sigma
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    st_i, st_o = fr.sin_theta(wi), fr.sin_theta(wo)
    cos_dphi = fr.cos_phi(wi) * fr.cos_phi(wo) + fr.sin_phi(wi) * fr.sin_phi(wo)
    sin_alpha = jnp.maximum(st_i, st_o)
    tan_beta = jnp.minimum(
        m.safe_div(st_i, jnp.abs(wi[..., 2])), m.safe_div(st_o, jnp.abs(wo[..., 2]))
    )
    val = a + b * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta
    f = bl.albedo * (warp.INV_PI * val * jnp.maximum(wo[..., 2], 0.0))[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _smooth_fresnel(bl, cos_i):
    F, _ = m.fresnel_dielectric(cos_i, bl.eta_s)
    return F


def _dielectric_sample(bl, wi, u_lobe, u2):
    """Smooth dielectric (dielectric.cpp): choose reflect/refract by Fresnel."""
    ci = wi[..., 2]
    F, cos_t = m.fresnel_dielectric(ci, bl.eta_s)
    reflect = u_lobe < F
    wo_r = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    # refraction: local frame makes Snell trivial (dielectric.cpp refract())
    rel_eta = jnp.where(ci >= 0, bl.eta_s, 1.0 / bl.eta_s)
    scale = -1.0 / rel_eta
    wo_t = jnp.stack([wi[..., 0] * scale, wi[..., 1] * scale, cos_t], axis=-1)
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    eta_ratio = jnp.where(reflect, 1.0, rel_eta)
    # radiance transport carries the 1/eta^2 scale on refraction
    factor = jnp.where(reflect, 1.0, 1.0 / (rel_eta * rel_eta))
    weight = jnp.where(
        reflect[..., None], bl.spec_refl, bl.spec_trans * factor[..., None]
    )
    pdf = jnp.where(reflect, F, 1.0 - F)
    # total internal reflection: F==1 so refract branch never taken
    return wo, weight, jnp.maximum(pdf, 1e-12), jnp.ones(ci.shape, bool), eta_ratio


def _thin_dielectric_sample(bl, wi, u_lobe, u2):
    """thindielectric.cpp: interaction with a thin slab — transmission leaves
    the direction unchanged; multiple internal bounces folded into R' = R +
    TRT/(1-R^2) ..."""
    ci = jnp.abs(wi[..., 2])
    F, _ = m.fresnel_dielectric(ci, bl.eta_s)
    # account for internal bounces: R' = 2F/(1+F)
    R = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
    reflect = u_lobe < R
    wo_r = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    wo_t = -wi
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    weight = jnp.where(reflect[..., None], bl.spec_refl, bl.spec_trans)
    pdf = jnp.where(reflect, R, 1.0 - R)
    return wo, weight, jnp.maximum(pdf, 1e-12), jnp.ones(ci.shape, bool), jnp.ones(ci.shape)


def _conductor_sample(bl, wi, u_lobe, u2):
    ok = wi[..., 2] > 0
    wo = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    F = m.fresnel_conductor(wi[..., 2], bl.eta_c, bl.k_c)
    weight = jnp.where(ok[..., None], bl.spec_refl * F, 0.0)
    return wo, weight, jnp.where(ok, 1.0, 0.0), jnp.ones(ok.shape, bool), jnp.ones(ok.shape)


def _rough_conductor_f(bl, dist: int, wi, wo):
    mh = m.normalize(wi + wo)
    D = mf.eval_d(dist, bl.alpha[..., 0], bl.alpha[..., 1], mh)
    G = mf.smith_g(dist, bl.alpha[..., 0], bl.alpha[..., 1], wi, wo, mh)
    F = m.fresnel_conductor(m.dot(wi, mh), bl.eta_c, bl.k_c)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    spec = m.safe_div(D * G, 4.0 * wi[..., 2])
    return jnp.where(ok[..., None], bl.spec_refl * F * spec[..., None], 0.0)


def _rough_conductor_eval(bl, dist: int, wi, wo):
    # note eval already includes cos θo via the microfacet identity:
    # f·cosθo = D G F / (4 cosθi)
    return _rough_conductor_f(bl, dist, wi, wo)


def _rough_conductor_pdf(bl, dist: int, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    mh = m.normalize(wi + wo)
    p = mf.pdf(dist, bl.alpha[..., 0], bl.alpha[..., 1], wi, mh)
    jac = m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo, mh)))
    return jnp.where(ok, p * jac, 0.0)


def _rough_conductor_sample(bl, dist: int, wi, u_lobe, u2):
    au, av = bl.alpha[..., 0], bl.alpha[..., 1]
    mh, p_m = mf.sample(dist, au, av, wi, u2)
    wo = m.reflect(wi, mh)
    pdf = m.safe_div(p_m, 4.0 * jnp.abs(m.dot(wo, mh)))
    f = _rough_conductor_f(bl, dist, wi, wo)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0) & (pdf > 1e-12)
    weight = jnp.where(ok[..., None], m.safe_div(f, pdf[..., None]), 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(ok.shape, bool), jnp.ones(ok.shape)


# --- plastic (plastic.cpp): smooth specular + internally-scattered diffuse --

def _plastic_parts(bl, wi, wo):
    eta = bl.eta_s
    inv_eta2 = 1.0 / (eta * eta)
    fdr_int = m.fresnel_diffuse_reflectance(1.0 / eta)
    Fi = _smooth_fresnel(bl, wi[..., 2])
    Fo = _smooth_fresnel(bl, wo[..., 2])
    nonlinear_denom = 1.0 - bl.albedo * fdr_int[..., None]
    linear_denom = (1.0 - fdr_int)[..., None]
    diff = (
        bl.albedo
        * ((1.0 - Fi) * (1.0 - Fo) * inv_eta2)[..., None]
        * warp.INV_PI
        * jnp.maximum(wo[..., 2], 0.0)[..., None]
    )
    return diff, linear_denom, nonlinear_denom, Fi


def _plastic_eval(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    diff, lin_d, nonlin_d, _ = _plastic_parts(bl, wi, wo)
    denom = jnp.where(bl.nonlinear[..., None], nonlin_d, lin_d)
    f = diff / jnp.maximum(denom, 1e-6)
    return jnp.where(ok[..., None], f, 0.0)


def _plastic_spec_prob(bl, wi):
    """Lobe selection probability (plastic.cpp specularSamplingWeight logic)."""
    Fi = _smooth_fresnel(bl, jnp.abs(wi[..., 2]))
    spec_w = _lum(bl.spec_refl)
    diff_w = _lum(bl.albedo)
    total = spec_w + diff_w
    ssw = m.safe_div(spec_w, jnp.maximum(total, 1e-9))
    p = Fi * ssw
    q = (1.0 - Fi) * (1.0 - ssw)
    return m.safe_div(p, jnp.maximum(p + q, 1e-9))


def _lum(rgb):
    return rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169


def _plastic_pdf(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    p_spec = _plastic_spec_prob(bl, wi)
    pdf = (1.0 - p_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, pdf, 0.0)


def _plastic_sample(bl, wi, u_lobe, u2):
    ok = wi[..., 2] > 0
    p_spec = _plastic_spec_prob(bl, wi)
    choose_spec = u_lobe < p_spec
    Fi = _smooth_fresnel(bl, wi[..., 2])

    wo_spec = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    w_spec = bl.spec_refl * m.safe_div(Fi, jnp.maximum(p_spec, 1e-9))[..., None]

    wo_diff = warp.square_to_cosine_hemisphere(u2)
    f_diff = _plastic_eval(bl, wi, wo_diff)
    pdf_diff = (1.0 - p_spec) * warp.square_to_cosine_hemisphere_pdf(wo_diff)
    w_diff = m.safe_div(f_diff, jnp.maximum(pdf_diff, 1e-9)[..., None])

    wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
    weight = jnp.where(choose_spec[..., None], w_spec, w_diff)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(choose_spec, p_spec, pdf_diff)
    return wo, weight, jnp.where(ok, pdf, 0.0), choose_spec, jnp.ones(ok.shape)


# --- rough plastic (roughplastic.cpp): microfacet specular + diffuse -------

def _rough_plastic_eval(bl, dist: int, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    mh = m.normalize(wi + wo)
    au = bl.alpha[..., 0]
    D = mf.eval_d(dist, au, au, mh)
    G = mf.smith_g(dist, au, au, wi, wo, mh)
    F = _smooth_fresnel(bl, m.dot(wi, mh))
    spec = m.safe_div(D * G * F, 4.0 * wi[..., 2])
    f_spec = bl.spec_refl * spec[..., None]
    f_diff = _plastic_eval(bl, wi, wo)
    return jnp.where(ok[..., None], f_spec + f_diff, 0.0)


def _rough_plastic_pdf(bl, dist: int, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    p_spec = _plastic_spec_prob(bl, wi)
    mh = m.normalize(wi + wo)
    au = bl.alpha[..., 0]
    p_m = mf.pdf(dist, au, au, wi, mh)
    pdf_s = m.safe_div(p_m, 4.0 * jnp.abs(m.dot(wo, mh)))
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, p_spec * pdf_s + (1.0 - p_spec) * pdf_d, 0.0)


def _rough_plastic_sample(bl, dist: int, wi, u_lobe, u2):
    ok = wi[..., 2] > 0
    p_spec = _plastic_spec_prob(bl, wi)
    choose_spec = u_lobe < p_spec
    au = bl.alpha[..., 0]
    mh, _ = mf.sample(dist, au, au, wi, u2)
    wo_spec = m.reflect(wi, mh)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
    pdf = _rough_plastic_pdf(bl, dist, wi, wo)
    f = _rough_plastic_eval(bl, dist, wi, wo)
    ok = ok & (pdf > 1e-12) & (wo[..., 2] > 0)
    weight = jnp.where(ok[..., None], m.safe_div(f, jnp.maximum(pdf, 1e-12)[..., None]), 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(ok.shape, bool), jnp.ones(ok.shape)


# --- rough dielectric (roughdielectric.cpp) --------------------------------

def _rough_dielectric_eval(bl, dist: int, wi, wo):
    au, av = bl.alpha[..., 0], bl.alpha[..., 1]
    eta = bl.eta_s
    ci, co = wi[..., 2], wo[..., 2]
    is_reflect = ci * co > 0
    rel_eta = jnp.where(ci > 0, eta, 1.0 / eta)
    # half-vector: reflection -> standard; transmission -> generalized
    mh_r = m.normalize(wi + wo)
    mh_t = m.normalize(-(wi + wo * rel_eta[..., None]))
    mh = jnp.where(is_reflect[..., None], mh_r, mh_t)
    mh = mh * jnp.sign(mh[..., 2:3])  # keep upper hemisphere
    D = mf.eval_d(dist, au, av, mh)
    G = mf.smith_g(dist, au, av, wi, wo, mh)
    # mh is upper-oriented, so dot(wi, mh) is the correctly *signed* cosine:
    # negative for rays arriving from inside -> fresnel picks 1/eta branch
    F = _smooth_fresnel(bl, m.dot(wi, mh))

    f_r = m.safe_div(D * G * F, 4.0 * jnp.abs(ci))
    dot_i, dot_o = m.dot(wi, mh), m.dot(wo, mh)
    sqrt_denom = dot_i + rel_eta * dot_o
    f_t = m.safe_div(
        (1.0 - F) * D * G * jnp.abs(dot_i * dot_o) * rel_eta * rel_eta,
        jnp.abs(ci) * sqrt_denom * sqrt_denom,
    )
    # radiance transport factor 1/eta^2
    f_t = f_t / (rel_eta * rel_eta)
    f = jnp.where(is_reflect, f_r, f_t)
    tint = jnp.where(is_reflect[..., None], bl.spec_refl, bl.spec_trans)
    return tint * jnp.maximum(f, 0.0)[..., None]


def _rough_dielectric_pdf(bl, dist: int, wi, wo):
    au, av = bl.alpha[..., 0], bl.alpha[..., 1]
    eta = bl.eta_s
    ci, co = wi[..., 2], wo[..., 2]
    is_reflect = ci * co > 0
    rel_eta = jnp.where(ci > 0, eta, 1.0 / eta)
    mh_r = m.normalize(wi + wo)
    mh_t = m.normalize(-(wi + wo * rel_eta[..., None]))
    mh = jnp.where(is_reflect[..., None], mh_r, mh_t)
    mh = mh * jnp.sign(mh[..., 2:3])
    wi_up = wi * jnp.sign(ci)[..., None]
    p_m = mf.pdf(dist, au, av, wi_up, mh)
    F = _smooth_fresnel(bl, m.dot(wi, mh))  # signed cosine (see eval)
    dot_i, dot_o = m.dot(wi, mh), m.dot(wo, mh)
    # physical-configuration checks (eval gets these through Smith G; the
    # pdf needs them explicitly or it reports phantom mass in transmission
    # directions that sampling can never reach):
    #  * wi must see the front of the microfacet,
    #  * reflection keeps wo on the same side of mh, transmission crosses.
    front = dot_i * ci > 0
    side = jnp.where(is_reflect, dot_i * dot_o > 0, dot_i * dot_o < 0)
    jac_r = m.safe_div(1.0, 4.0 * jnp.abs(dot_o))
    sqrt_denom = dot_i + rel_eta * dot_o
    jac_t = m.safe_div(rel_eta * rel_eta * jnp.abs(dot_o), sqrt_denom * sqrt_denom)
    prob = jnp.where(is_reflect, F, 1.0 - F)
    pdf_val = prob * p_m * jnp.where(is_reflect, jac_r, jac_t)
    return jnp.where(front & side, jnp.maximum(pdf_val, 0.0), 0.0)


def _rough_dielectric_sample(bl, dist: int, wi, u_lobe, u2):
    au, av = bl.alpha[..., 0], bl.alpha[..., 1]
    eta = bl.eta_s
    ci = wi[..., 2]
    wi_up = wi * jnp.sign(ci)[..., None]
    mh_up, _ = mf.sample(dist, au, av, wi_up, u2)
    mh = mh_up * jnp.sign(ci)[..., None]  # back to wi's hemisphere orientation
    F, cos_t = m.fresnel_dielectric(m.dot(wi, mh) * jnp.sign(ci), eta)
    reflect = u_lobe < F
    wo_r = m.reflect(wi, mh)
    rel_eta = jnp.where(ci > 0, eta, 1.0 / eta)
    valid_t, wo_t = m.refract(wi, mh, rel_eta)
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    eta_ratio = jnp.where(reflect, 1.0, rel_eta)
    pdf = _rough_dielectric_pdf(bl, dist, wi, wo)
    f = _rough_dielectric_eval(bl, dist, wi, wo)
    ok = pdf > 1e-12
    # sanity: reflected must stay same side, refracted must cross
    side_ok = jnp.where(reflect, ci * wo[..., 2] > 0, ci * wo[..., 2] < 0)
    ok = ok & side_ok & jnp.where(reflect, True, valid_t)
    weight = jnp.where(ok[..., None], m.safe_div(f, jnp.maximum(pdf, 1e-12)[..., None]), 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(ok.shape, bool), jnp.where(ok, eta_ratio, 1.0)


# --- phong / ward (classic glossy models, phong.cpp / ward.cpp) ------------

def _phong_exponent(bl):
    # store exponent in alpha[...,0] reinterpreted: exponent = 2/alpha^2 - 2
    a = jnp.maximum(bl.alpha[..., 0], 1e-4)
    return jnp.maximum(2.0 / (a * a) - 2.0, 1.0)


def _phong_eval(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    n = _phong_exponent(bl)
    refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    cos_a = jnp.maximum(m.dot(wo, refl), 0.0)
    spec = bl.spec_refl * ((n + 2.0) * warp.INV_TWOPI * jnp.power(cos_a, n))[..., None]
    diff = bl.albedo * warp.INV_PI
    f = (spec + diff) * jnp.maximum(wo[..., 2], 0.0)[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _phong_pdf(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    n = _phong_exponent(bl)
    refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    cos_a = jnp.maximum(m.dot(wo, refl), 0.0)
    spec_w = _lum(bl.spec_refl)
    diff_w = _lum(bl.albedo)
    ps = m.safe_div(spec_w, jnp.maximum(spec_w + diff_w, 1e-9))
    pdf_s = (n + 1.0) * warp.INV_TWOPI * jnp.power(cos_a, n)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, ps * pdf_s + (1.0 - ps) * pdf_d, 0.0)


def _phong_sample(bl, wi, u_lobe, u2):
    ok = wi[..., 2] > 0
    n = _phong_exponent(bl)
    spec_w = _lum(bl.spec_refl)
    diff_w = _lum(bl.albedo)
    ps = m.safe_div(spec_w, jnp.maximum(spec_w + diff_w, 1e-9))
    choose_spec = u_lobe < ps
    # sample around reflection vector with cos^n lobe
    ct = jnp.power(jnp.clip(u2[..., 0], 1e-7, 1.0), 1.0 / (n + 1.0))
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * u2[..., 1]
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    from ..core.frame import Frame

    wo_spec = Frame.from_normal(refl).to_world(local)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
    pdf = _phong_pdf(bl, wi, wo)
    f = _phong_eval(bl, wi, wo)
    ok = ok & (pdf > 1e-12) & (wo[..., 2] > 0)
    weight = jnp.where(ok[..., None], m.safe_div(f, jnp.maximum(pdf, 1e-12)[..., None]), 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(ok.shape, bool), jnp.ones(ok.shape)


def _null_sample(bl, wi, u_lobe, u2):
    """null.cpp: pass-through (used by index-matched media boundaries)."""
    wo = -wi
    sh = wi.shape[:-1]
    return (
        wo,
        jnp.ones(sh + (3,)),
        jnp.ones(sh),
        jnp.ones(sh, bool),
        jnp.ones(sh),
    )


# === public dispatch ======================================================

def _masked(mask, a, b):
    return jnp.where(mask[..., None] if a.ndim > mask.ndim else mask, a, b)


def eval(bl: BsdfLocals, wi, wo, active_types=None):
    """f(wi, wo)·|cosθo| for the smooth lobes, per-lane type dispatch."""
    wi, wo, _ = _flip_twosided(bl, wi, wo)
    out = jnp.zeros(wi.shape[:-1] + (3,))
    types = active_types if active_types is not None else _ALL_TYPES
    for t in types:
        sel = bl.type == t
        if t == DIFFUSE:
            v = _diffuse_eval(bl, wi, wo)
        elif t == ROUGH_DIFFUSE:
            v = _rough_diffuse_eval(bl, wi, wo)
        elif t == ROUGH_CONDUCTOR:
            v = _dist_mix(bl, lambda d: _rough_conductor_eval(bl, d, wi, wo))
        elif t == PLASTIC:
            v = _plastic_eval(bl, wi, wo)
        elif t == ROUGH_PLASTIC:
            v = _dist_mix(bl, lambda d: _rough_plastic_eval(bl, d, wi, wo))
        elif t == ROUGH_DIELECTRIC:
            v = _dist_mix(bl, lambda d: _rough_dielectric_eval(bl, d, wi, wo))
        elif t == PHONG:
            v = _phong_eval(bl, wi, wo)
        else:
            continue  # delta lobes eval to 0
        out = jnp.where(sel[..., None], v, out)
    return out


def pdf(bl: BsdfLocals, wi, wo, active_types=None):
    wi, wo, _ = _flip_twosided(bl, wi, wo)
    out = jnp.zeros(wi.shape[:-1])
    types = active_types if active_types is not None else _ALL_TYPES
    for t in types:
        sel = bl.type == t
        if t == DIFFUSE:
            v = _diffuse_pdf(bl, wi, wo)
        elif t == ROUGH_DIFFUSE:
            v = _diffuse_pdf(bl, wi, wo)  # roughdiffuse samples cosine too
        elif t == ROUGH_CONDUCTOR:
            v = _dist_mix_s(bl, lambda d: _rough_conductor_pdf(bl, d, wi, wo))
        elif t == PLASTIC:
            v = _plastic_pdf(bl, wi, wo)
        elif t == ROUGH_PLASTIC:
            v = _dist_mix_s(bl, lambda d: _rough_plastic_pdf(bl, d, wi, wo))
        elif t == ROUGH_DIELECTRIC:
            v = _dist_mix_s(bl, lambda d: _rough_dielectric_pdf(bl, d, wi, wo))
        elif t == PHONG:
            v = _phong_pdf(bl, wi, wo)
        else:
            continue
        out = jnp.where(sel, v, out)
    return out


def sample(bl: BsdfLocals, wi, u_lobe, u2, active_types=None) -> BsdfSample:
    wi_f, zflip = _flip_twosided(bl, wi)
    sh = wi.shape[:-1]
    out = BsdfSample(
        wo=jnp.zeros(sh + (3,)),
        weight=jnp.zeros(sh + (3,)),
        pdf=jnp.zeros(sh),
        is_delta=jnp.zeros(sh, bool),
        eta=jnp.ones(sh),
    )
    types = active_types if active_types is not None else _ALL_TYPES
    for t in types:
        sel = bl.type == t
        if t == DIFFUSE:
            r = _diffuse_sample(bl, wi_f, u_lobe, u2)
        elif t == ROUGH_DIFFUSE:
            wo_, w_, p_, d_, e_ = _diffuse_sample(bl, wi_f, u_lobe, u2)
            f = _rough_diffuse_eval(bl, wi_f, wo_)
            w_ = m.safe_div(f, jnp.maximum(p_, 1e-9)[..., None])
            r = (wo_, w_, p_, d_, e_)
        elif t == DIELECTRIC:
            r = _dielectric_sample(bl, wi_f, u_lobe, u2)
        elif t == THIN_DIELECTRIC:
            r = _thin_dielectric_sample(bl, wi_f, u_lobe, u2)
        elif t == CONDUCTOR:
            r = _conductor_sample(bl, wi_f, u_lobe, u2)
        elif t == ROUGH_CONDUCTOR:
            r = _dist_mix_t(bl, lambda d: _rough_conductor_sample(bl, d, wi_f, u_lobe, u2))
        elif t == PLASTIC:
            r = _plastic_sample(bl, wi_f, u_lobe, u2)
        elif t == ROUGH_PLASTIC:
            r = _dist_mix_t(bl, lambda d: _rough_plastic_sample(bl, d, wi_f, u_lobe, u2))
        elif t == ROUGH_DIELECTRIC:
            r = _dist_mix_t(bl, lambda d: _rough_dielectric_sample(bl, d, wi_f, u_lobe, u2))
        elif t == PHONG:
            r = _phong_sample(bl, wi_f, u_lobe, u2)
        elif t == NULL:
            r = _null_sample(bl, wi_f, u_lobe, u2)
        else:
            continue
        wo_, w_, p_, d_, e_ = r
        out = BsdfSample(
            wo=jnp.where(sel[..., None], wo_, out.wo),
            weight=jnp.where(sel[..., None], w_, out.weight),
            pdf=jnp.where(sel, p_, out.pdf),
            is_delta=jnp.where(sel, d_, out.is_delta),
            eta=jnp.where(sel, e_, out.eta),
        )
    # un-flip wo for twosided backfaces
    return out._replace(wo=out.wo * zflip)


def _dist_mix(bl, fn):
    """Evaluate fn for both microfacet distributions, select per lane."""
    v_b = fn(mf.BECKMANN)
    v_g = fn(mf.GGX)
    return jnp.where((bl.dist == mf.GGX)[..., None], v_g, v_b)


def _dist_mix_s(bl, fn):
    v_b = fn(mf.BECKMANN)
    v_g = fn(mf.GGX)
    return jnp.where(bl.dist == mf.GGX, v_g, v_b)


def _dist_mix_t(bl, fn):
    rb = fn(mf.BECKMANN)
    rg = fn(mf.GGX)
    sel = bl.dist == mf.GGX
    return tuple(
        jnp.where(sel[..., None] if a.ndim > sel.ndim else sel, a, b)
        for a, b in zip(rg, rb)
    )


_ALL_TYPES = (
    DIFFUSE, DIELECTRIC, CONDUCTOR, ROUGH_CONDUCTOR, PLASTIC, ROUGH_PLASTIC,
    ROUGH_DIELECTRIC, THIN_DIELECTRIC, ROUGH_DIFFUSE, PHONG, NULL,
)
