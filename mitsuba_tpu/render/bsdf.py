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

MIXTURE = 13        # w * A + (1 - w) * B, static weight (mixturebsdf.cpp)
BLEND = 14          # like MIXTURE with textured weight (blendbsdf.cpp)
DIFFTRANS = 15      # diffuse transmitter (difftrans.cpp)
COATING = 16        # smooth dielectric layer over nested A (coating.cpp)
HK = 17             # Hanrahan-Krueger single-scattering slab (hk.cpp)
ROUGHCOATING = 18   # rough dielectric layer over nested A (roughcoating.cpp,
                    # rough-transmittance attenuation from rtrans tables)
IRAWAN = 19         # Irawan-Marschner woven cloth (irawan.cpp; yarn lookup
                    # + per-lane parameters prepared in render/irawan.py)

SMOOTH_TYPES = (DIFFUSE, PLASTIC, ROUGH_CONDUCTOR, ROUGH_PLASTIC,
                ROUGH_DIELECTRIC, ROUGH_DIFFUSE, PHONG, WARD, DIFFTRANS, HK,
                IRAWAN)
DELTA_TYPES = (DIELECTRIC, CONDUCTOR, THIN_DIELECTRIC, NULL)
# types whose rows reference other material rows via nested_a / nested_b;
# nested rows must themselves be non-nesting (one level, like the dominant
# usage of the reference's plugin nesting)
NESTED_TYPES = (MIXTURE, BLEND, MASK, COATING, ROUGHCOATING)


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
    exterior_medium: jnp.ndarray  # (M,) int32 medium id outside the surface (-1 none)
    nested_a: jnp.ndarray    # (M,) int32 nested material A (mixture/blend/mask/coating)
    nested_b: jnp.ndarray    # (M,) int32 nested material B (mixture/blend)
    weight: jnp.ndarray      # (M,) mixture weight of A (mixturebsdf weights)
    weight_tex: jnp.ndarray  # (M,) int32 blend weight texture (blendbsdf.cpp) or -1
    normal_tex: jnp.ndarray  # (M,) int32 tangent-space normal map (normalmap.cpp) or -1
    bump_tex: jnp.ndarray    # (M,) int32 height texture (bumpmap.cpp) or -1
    bump_scale: jnp.ndarray  # (M,) bump height scale
    # HK slab (hk.cpp): k doubles as sigma_t, albedo as sigma_s; thickness +
    # phase-g live here
    hk_thickness: jnp.ndarray  # (M,)
    hk_g: jnp.ndarray          # (M,) HG phase anisotropy
    cauchy_b: jnp.ndarray      # (M,) dispersion coefficient (um^2): spectral
                               # mode shifts dielectric eta by B(1/l^2-1/ld^2)
    # rough-transmittance polynomial (rtrans.h:448 role, fitted at build —
    # core/rtrans.py): T(cos_i) for roughplastic/roughcoating rows, and the
    # interior diffuse reflectance 1 - Tbar_int for the nonlinear denom
    rt_coef: jnp.ndarray       # (M, 6) poly coefficients, low order first
    rt_fdr: jnp.ndarray        # (M,) internal diffuse reflectance
    irawan: jnp.ndarray        # (M,) int32 weave-pattern id (-1 none)

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
    opacity: jnp.ndarray   # (R,) mask.cpp opacity (1 = fully present)
    blend_w: jnp.ndarray   # (R,) mixture/blend weight of nested A
    hk_thickness: jnp.ndarray  # (R,)
    hk_g: jnp.ndarray      # (R,)
    rt_coef: jnp.ndarray   # (R, 6) rough-transmittance poly (rtrans role)
    rt_fdr: jnp.ndarray    # (R,) internal diffuse reflectance
    # irawan woven cloth: per-lane yarn-segment parameters gathered from
    # the weave pattern at the lane's uv (render/irawan.py layout:
    # [is_weft, psi, umax, kappa, width, length, x, y, alpha, beta, ss,
    #  hwidth, specnorm*area_ratio])
    iw_par: jnp.ndarray    # (R, 13)
    iw_ks: jnp.ndarray     # (R, 3) yarn specular color


class BsdfSample(NamedTuple):
    wo: jnp.ndarray        # (R, 3)
    weight: jnp.ndarray    # (R, 3) f*cos/pdf
    pdf: jnp.ndarray       # (R,) density (1 for delta lobes)
    is_delta: jnp.ndarray  # (R,) bool
    eta: jnp.ndarray       # (R,) relative IOR along sampled lobe


def gather_locals(table: MaterialTable, mat_id, albedo_override=None,
                  alpha_override=None, opacity_override=None,
                  blend_override=None) -> BsdfLocals:
    mid = jnp.maximum(mat_id, 0)
    albedo = table.albedo[mid] if albedo_override is None else albedo_override
    alpha = table.alpha[mid] if alpha_override is None else alpha_override
    sh = jnp.shape(mid)
    opacity = (jnp.ones(sh) if opacity_override is None else opacity_override)
    blend_w = table.weight[mid] if blend_override is None else blend_override
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
        opacity=opacity,
        blend_w=blend_w,
        hk_thickness=table.hk_thickness[mid],
        hk_g=table.hk_g[mid],
        rt_coef=table.rt_coef[mid],
        rt_fdr=table.rt_fdr[mid],
        iw_par=jnp.zeros(sh + (13,)),
        iw_ks=jnp.zeros(sh + (3,)),
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

def _irawan_radius_of_curvature(u, umax, kappa, w, l):
    """Yarn-spine radius of curvature (irawan.cpp:551-587, Irawan thesis
    5.3: ellipse / parabola / hyperbola spine by rhat), batched with all
    branches evaluated and masked."""
    rhat = 1.0 + kappa * (1.0 + 1.0 / jnp.tan(umax))
    a = 0.5 * w
    sin_umax = jnp.sin(umax)
    half = 0.5 * l - a * sin_umax
    # circle
    R_circ = m.safe_div(half, sin_umax)
    # ellipse (rhat > 0)
    rh_e = jnp.where(rhat > 0, rhat, 1.0)
    tmax_e = jnp.arctan(rh_e * jnp.tan(umax))
    bhat_e = m.safe_div(half, jnp.maximum(jnp.sin(tmax_e), 1e-9))
    ahat_e = m.safe_div(bhat_e, rh_e)
    t_e = jnp.arctan(rh_e * jnp.tan(u))
    R_ell = m.safe_div(
        (bhat_e ** 2 * jnp.cos(t_e) ** 2
         + ahat_e ** 2 * jnp.sin(t_e) ** 2) ** 1.5, ahat_e * bhat_e)
    # hyperbola (rhat < 0)
    rh_h = jnp.where(rhat < 0, rhat, -1.0)
    arg_h = jnp.clip(rh_h * jnp.tan(umax), -1.0 + 1e-6, 1.0 - 1e-6)
    tmax_h = -jnp.arctanh(arg_h)
    bhat_h = m.safe_div(half, jnp.maximum(jnp.sinh(tmax_h), 1e-9))
    ahat_h = m.safe_div(bhat_h, rh_h)
    arg_u = jnp.clip(rh_h * jnp.tan(u), -1.0 + 1e-6, 1.0 - 1e-6)
    t_h = -jnp.arctanh(arg_u)
    R_hyp = -m.safe_div(
        (bhat_h ** 2 * jnp.cosh(t_h) ** 2
         + ahat_h ** 2 * jnp.sinh(t_h) ** 2) ** 1.5, ahat_h * bhat_h)
    # parabola (rhat == 0)
    tm_p = jnp.tan(umax)
    ahat_p = m.safe_div(half, 2.0 * jnp.maximum(tm_p, 1e-9))
    t_p = jnp.tan(u)
    R_par = 2.0 * ahat_p * (1.0 + t_p * t_p) ** 1.5
    R = jnp.where(jnp.abs(rhat - 1.0) < 1e-6, R_circ,
                  jnp.where(rhat > 0, R_ell,
                            jnp.where(rhat < 0, R_hyp, R_par)))
    return R


def _irawan_von_mises(cos_x, b):
    """von Mises density on the circle (irawan.cpp:588-606; Abramowitz &
    Stegun I0 polynomial)."""
    ab = jnp.abs(b)
    t_s = (ab / 3.75) ** 2
    i0_small = 1.0 + t_s * (3.5156229 + t_s * (3.0899424 + t_s * (
        1.2067492 + t_s * (0.2659732 + t_s * (0.0360768 + t_s * 0.0045813)))))
    t_l = 3.75 / jnp.maximum(ab, 1e-6)
    i0_large = jnp.exp(ab) / jnp.sqrt(jnp.maximum(ab, 1e-6)) * (
        0.39894228 + t_l * (0.01328592 + t_l * (0.00225319 + t_l * (
            -0.00157565 + t_l * (0.00916281 + t_l * (-0.02057706 + t_l * (
                0.02635537 + t_l * (-0.01647633 + t_l * 0.00392377))))))))
    i0 = jnp.where(ab <= 3.75, i0_small, i0_large)
    return jnp.exp(b * cos_x) / (2.0 * jnp.pi * i0)


def _irawan_seeliger(c1, c2):
    """Lommel-Seeliger attenuation with albedo 1 (irawan.cpp:608-615)."""
    c1 = jnp.maximum(c1, 0.0)
    c2 = jnp.maximum(c2, 0.0)
    return jnp.where((c1 > 0) & (c2 > 0),
                     m.safe_div(c1 * c2, 4.0 * jnp.pi * (c1 + c2)), 0.0)


def _smoothstep01(x):
    x = jnp.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _irawan_eval(bl, wi, wo):
    """Irawan-Marschner woven-cloth BRDF (irawan.cpp eval:230-320 +
    evalFilamentIntegrand:390 / evalStapleIntegrand:482), fully batched.
    Per-lane yarn parameters were gathered by scene.bsdf_locals; the
    stochastic intensity variation (fineness/period noise) is omitted —
    its mean is ~1, so average brightness is preserved (documented
    deviation)."""
    p = bl.iw_par
    is_weft = p[..., 0] > 0.5
    psi = p[..., 1]
    umax = jnp.maximum(p[..., 2], 1e-4)
    kappa = p[..., 3]
    w = jnp.maximum(p[..., 4], 1e-6)
    l = jnp.maximum(p[..., 5], 1e-6)
    x = p[..., 6]
    y = p[..., 7]
    alpha = p[..., 8]
    beta = p[..., 9]
    ss = p[..., 10]
    hwidth = jnp.maximum(p[..., 11], 1e-4)
    snorm = p[..., 12]

    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)

    # weft yarns: rotate the frame pi/2 about z (irawan.cpp:244-253)
    def rot(v):
        return jnp.stack([-v[..., 1], v[..., 0], v[..., 2]], axis=-1)

    om_i = jnp.where(is_weft[..., None], rot(wi), wi)
    om_r = jnp.where(is_weft[..., None], rot(wo), wo)
    xx = jnp.where(is_weft, -y, x)
    yy = jnp.where(is_weft, x, y)

    u = yy / (l / 2.0) * umax
    v = xx * jnp.pi / w

    h = m.normalize(om_i + om_r)
    len_ir = m.length(om_i + om_r)
    geom_ok = (w * jnp.sin(umax) < l) & (kappa > -1.0)

    # --- filament integrand (psi == 0) -----------------------------------
    u_of_v = jnp.arctan(m.safe_div(h[..., 1], jnp.maximum(
        jnp.abs(h[..., 2]), 1e-9)) * jnp.sign(h[..., 2]))
    in_rng_f = jnp.abs(u_of_v) < umax
    n_f = m.normalize(jnp.stack([
        jnp.sin(v), jnp.sin(u_of_v) * jnp.cos(v),
        jnp.cos(u_of_v) * jnp.cos(v)], axis=-1))
    t_f = m.normalize(jnp.stack([
        jnp.zeros_like(u_of_v), jnp.cos(u_of_v), -jnp.sin(u_of_v)], axis=-1))
    ss_c = jnp.clip(ss, 0.0, 1.0 - 1e-4)
    R_f = _irawan_radius_of_curvature(
        jnp.minimum(jnp.abs(u_of_v), (1 - ss_c) * umax),
        (1 - ss_c) * umax, kappa, w, l)
    a_half = 0.5 * w
    t_cross_h = m.cross(t_f, h)
    Gu = m.safe_div(a_half * (R_f + a_half * jnp.cos(v)),
                    len_ir * jnp.maximum(jnp.abs(t_cross_h[..., 0]), 1e-9))
    fc = alpha + _irawan_von_mises(-m.dot(om_i, om_r), beta)
    A_f = _irawan_seeliger(m.dot(n_f, om_i), m.dot(n_f, om_r))
    As = jnp.where(
        ss_c > 0,
        A_f * (1.0 - _smoothstep01(m.safe_div(
            jnp.abs(u_of_v) - (1.0 - ss_c) * umax,
            jnp.maximum(ss_c * umax, 1e-9)))),
        A_f)
    fs_f = Gu * fc * As * jnp.pi * l
    delta_y = l * hwidth
    y_of_v = jnp.clip(u_of_v * 0.5 * l / umax,
                      0.5 * (delta_y - l), 0.5 * (l - delta_y))
    hit_f = jnp.abs(y_of_v - u * 0.5 * l / umax) < 0.5 * delta_y
    filament = jnp.where(in_rng_f & hit_f & geom_ok,
                         m.safe_div(fs_f, delta_y), 0.0)

    # --- staple integrand (psi != 0) -------------------------------------
    psi_s = jnp.where(jnp.abs(psi) > 1e-6, psi, 1.0)  # guarded; masked out
    hy, hz, hx = h[..., 1], h[..., 2], h[..., 0]
    D = m.safe_div(
        hy * jnp.cos(u) - hz * jnp.sin(u),
        jnp.sqrt(jnp.maximum(
            hx * hx + (hy * jnp.sin(u) + hz * jnp.cos(u)) ** 2, 1e-12))
        * jnp.tan(psi_s))
    v_of_u = jnp.arctan2(-hy * jnp.sin(u) - hz * jnp.cos(u), hx) \
        + m.safe_acos(jnp.clip(D, -1.0, 1.0))
    in_rng_s = (jnp.abs(D) < 1.0) & (jnp.abs(v_of_u) < jnp.pi / 2.0)
    n_s = m.normalize(jnp.stack([
        jnp.sin(v_of_u), jnp.sin(u) * jnp.cos(v_of_u),
        jnp.cos(u) * jnp.cos(v_of_u)], axis=-1))
    R_s = _irawan_radius_of_curvature(jnp.abs(u), umax, kappa, w, l)
    Gv = m.safe_div(
        a_half * (R_s + a_half * jnp.cos(v_of_u)),
        len_ir * jnp.maximum(m.dot(n_s, h), 1e-9)
        * jnp.maximum(jnp.abs(jnp.sin(psi_s)), 1e-9))
    A_s = _irawan_seeliger(m.dot(n_s, om_i), m.dot(n_s, om_r))
    fs_s = Gv * fc * A_s * 2.0 * w * umax
    delta_x = w * hwidth
    x_of_u = jnp.clip(v_of_u * w / jnp.pi,
                      0.5 * (delta_x - w), 0.5 * (w - delta_x))
    hit_s = jnp.abs(x_of_u - v * w / jnp.pi) < 0.5 * delta_x
    staple = jnp.where(in_rng_s & hit_s & geom_ok,
                       m.safe_div(fs_s, delta_x), 0.0)

    integrand = jnp.where(jnp.abs(psi) > 1e-6, staple, filament)
    spec = bl.iw_ks * (integrand * snorm)[..., None]
    f = (bl.albedo * warp.INV_PI + spec) \
        * jnp.maximum(wo[..., 2], 0.0)[..., None]
    return jnp.where(ok[..., None], jnp.maximum(f, 0.0), 0.0)


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


def _rt_T(bl: BsdfLocals, cos_v):
    """Rough-transmittance polynomial T(cos) (rtrans.h eval role;
    coefficients fitted at scene build, core/rtrans.py)."""
    c = jnp.clip(jnp.abs(cos_v), 0.0, 1.0)
    acc = bl.rt_coef[..., 5]
    for k in (4, 3, 2, 1, 0):
        acc = acc * c + bl.rt_coef[..., k]
    return jnp.clip(acc, 0.0, 1.0)


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
    # diffuse through the ROUGH interface: transmittance from the fitted
    # rtrans tables instead of the smooth Fresnel factors
    # (roughplastic.cpp:361 evalDiffuse with m_externalRoughTransmittance)
    eta = bl.eta_s
    inv_eta2 = 1.0 / (eta * eta)
    T_i = _rt_T(bl, wi[..., 2])
    T_o = _rt_T(bl, wo[..., 2])
    denom = jnp.where(bl.nonlinear[..., None],
                      1.0 - bl.albedo * bl.rt_fdr[..., None],
                      (1.0 - bl.rt_fdr)[..., None])
    f_diff = (bl.albedo * (T_i * T_o * inv_eta2)[..., None] * warp.INV_PI
              * jnp.maximum(wo[..., 2], 0.0)[..., None]
              / jnp.maximum(denom, 1e-6))
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


# --- ward (ward.cpp: anisotropic Ward-Duer, variant='ward' normalization) --

def _ward_spec(bl, wi, wo):
    """Specular term of the Ward model (no cos factor)."""
    au = jnp.maximum(bl.alpha[..., 0], 1e-4)
    av = jnp.maximum(bl.alpha[..., 1], 1e-4)
    h = wi + wo
    hz2 = h[..., 2] * h[..., 2]
    exponent = -m.safe_div(
        (h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2, jnp.maximum(hz2, 1e-12)
    )
    ci, co = wi[..., 2], wo[..., 2]
    denom = 4.0 * jnp.pi * au * av * jnp.sqrt(jnp.maximum(ci * co, 1e-12))
    return m.safe_div(jnp.exp(exponent), denom)


def _ward_eval(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    spec = bl.spec_refl * _ward_spec(bl, wi, wo)[..., None]
    diff = bl.albedo * warp.INV_PI
    f = (spec + diff) * jnp.maximum(wo[..., 2], 0.0)[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _ward_pdf_spec(bl, wi, wo):
    """Half-vector gaussian sampling density mapped to wo."""
    au = jnp.maximum(bl.alpha[..., 0], 1e-4)
    av = jnp.maximum(bl.alpha[..., 1], 1e-4)
    h = m.normalize(wi + wo)
    hz = jnp.maximum(h[..., 2], 1e-6)
    exponent = -((h[..., 0] / au) ** 2 + (h[..., 1] / av) ** 2) / (hz * hz)
    # p(h) = exp / (pi au av hz^3); dwo = 4 (h.wi) dh
    p_h = m.safe_div(jnp.exp(exponent), jnp.pi * au * av * hz ** 3)
    return m.safe_div(p_h, 4.0 * jnp.abs(m.dot(h, wi)))


def _ward_probs(bl):
    spec_w = _lum(bl.spec_refl)
    diff_w = _lum(bl.albedo)
    return m.safe_div(spec_w, jnp.maximum(spec_w + diff_w, 1e-9))


def _ward_pdf(bl, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ps = _ward_probs(bl)
    pdf = ps * _ward_pdf_spec(bl, wi, wo) + (1.0 - ps) * \
        warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok, pdf, 0.0)


def _ward_sample(bl, wi, u_lobe, u2):
    ok = wi[..., 2] > 0
    au = jnp.maximum(bl.alpha[..., 0], 1e-4)
    av = jnp.maximum(bl.alpha[..., 1], 1e-4)
    ps = _ward_probs(bl)
    choose_spec = u_lobe < ps
    # half-vector sampling (ward.cpp sample): anisotropic gaussian
    phi = 2.0 * jnp.pi * u2[..., 1]
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    # remap the azimuth for anisotropy
    phi_h = jnp.arctan2(av * sp, au * cp)
    cph, sph = jnp.cos(phi_h), jnp.sin(phi_h)
    t2 = -jnp.log(jnp.maximum(u2[..., 0], 1e-9)) / \
        ((cph / au) ** 2 + (sph / av) ** 2)
    ct = 1.0 / jnp.sqrt(1.0 + t2)
    st = m.safe_sqrt(1.0 - ct * ct)
    h = jnp.stack([st * cph, st * sph, ct], axis=-1)
    wo_spec = m.reflect(wi, h)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(choose_spec[..., None], wo_spec, wo_diff)
    pdf = _ward_pdf(bl, wi, wo)
    f = _ward_eval(bl, wi, wo)
    ok = ok & (pdf > 1e-12) & (wo[..., 2] > 0)
    weight = jnp.where(ok[..., None], m.safe_div(f, jnp.maximum(pdf, 1e-12)[..., None]), 0.0)
    return wo, weight, jnp.where(ok, pdf, 0.0), jnp.zeros(ok.shape, bool), jnp.ones(ok.shape)


# --- diffuse transmitter (difftrans.cpp) ------------------------------------

def _difftrans_eval(bl, wi, wo):
    ok = wi[..., 2] * wo[..., 2] < 0  # opposite hemispheres
    f = bl.spec_trans * (warp.INV_PI * jnp.abs(wo[..., 2]))[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _difftrans_pdf(bl, wi, wo):
    ok = wi[..., 2] * wo[..., 2] < 0
    return jnp.where(ok, warp.INV_PI * jnp.abs(wo[..., 2]), 0.0)


def _difftrans_sample(bl, wi, u_lobe, u2):
    wo_up = warp.square_to_cosine_hemisphere(u2)
    # flip into the hemisphere opposite wi
    sgn = -jnp.sign(wi[..., 2])
    wo = wo_up * jnp.stack(
        [jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], axis=-1
    )
    pdf = warp.INV_PI * jnp.abs(wo[..., 2])
    weight = bl.spec_trans
    return wo, weight, jnp.maximum(pdf, 1e-12), jnp.zeros(wi.shape[:-1], bool), jnp.ones(wi.shape[:-1])


# --- Hanrahan-Krueger slab (hk.cpp): single scattering + delta transmission -

def _hg_phase(g, cos_t):
    """Henyey-Greenstein phase function value."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-6)
    return warp.INV_FOURPI * (1.0 - g2) / (denom * jnp.sqrt(denom))


def _hk_parts(bl, wi, wo):
    """Single-scattering reflection/transmission of a slab of optical
    depth tau = sigma_t * thickness (hk.cpp; sigma_s=albedo field,
    sigma_t=k field). Returns f (no cos_o)."""
    sig_s = bl.albedo
    sig_t = jnp.maximum(bl.k_c, 1e-9)
    alb = sig_s / sig_t
    tau = sig_t * bl.hk_thickness[..., None]
    mu_i = jnp.maximum(jnp.abs(wi[..., 2]), 1e-6)[..., None]
    mu_o = jnp.maximum(jnp.abs(wo[..., 2]), 1e-6)[..., None]
    cos_wiwo = m.dot(-wi, wo)  # phase angle between transport directions
    p = _hg_phase(bl.hk_g, cos_wiwo)[..., None]
    refl = (wi[..., 2] * wo[..., 2] > 0)[..., None]
    # reflection: alb * p * mu_o/(mu_i+mu_o) * (1 - exp(-tau(1/mu_i+1/mu_o))) / mu_o
    f_r = alb * p * m.safe_div(
        1.0 - jnp.exp(-tau * (1.0 / mu_i + 1.0 / mu_o)), mu_i + mu_o
    )
    # transmission single scatter
    same_mu = jnp.abs(mu_i - mu_o) < 1e-4
    f_t_gen = alb * p * m.safe_div(
        jnp.exp(-tau / mu_i) - jnp.exp(-tau / mu_o),
        mu_i - jnp.where(same_mu, mu_i + 1.0, mu_o),  # guarded; replaced below
    )
    f_t_lim = alb * p * tau * jnp.exp(-tau / mu_i) / (mu_i * mu_i)
    f_t = jnp.where(same_mu, f_t_lim, f_t_gen)
    return jnp.where(refl, f_r, jnp.maximum(f_t, 0.0))


def _hk_eval(bl, wi, wo):
    ok = jnp.abs(wi[..., 2]) > 1e-6
    f = _hk_parts(bl, wi, wo) * jnp.abs(wo[..., 2])[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _hk_pdf_smooth(bl, wi, wo):
    # cosine on either side, half/half
    return 0.5 * warp.INV_PI * jnp.abs(wo[..., 2])


def _hk_delta_t(bl, wi):
    """Unscattered transmission through the slab."""
    sig_t = jnp.maximum(bl.k_c, 1e-9)
    tau = sig_t * bl.hk_thickness[..., None]
    mu_i = jnp.maximum(jnp.abs(wi[..., 2]), 1e-6)[..., None]
    return jnp.exp(-tau / mu_i)


def _hk_pdf(bl, wi, wo):
    t_lum = _lum(_hk_delta_t(bl, wi))
    p_delta = jnp.clip(t_lum, 0.0, 0.9)
    return (1.0 - p_delta) * _hk_pdf_smooth(bl, wi, wo)


def _hk_sample(bl, wi, u_lobe, u2):
    Tr = _hk_delta_t(bl, wi)
    p_delta = jnp.clip(_lum(Tr), 0.0, 0.9)
    choose_delta = u_lobe < p_delta

    wo_up = warp.square_to_cosine_hemisphere(u2)
    # remap the leftover lobe random for the side pick
    u_side = m.safe_div(u_lobe - p_delta, jnp.maximum(1.0 - p_delta, 1e-9))
    flip = u_side < 0.5
    sgn = jnp.where(flip, 1.0, -1.0) * jnp.sign(wi[..., 2])
    wo_s = wo_up * jnp.stack(
        [jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], axis=-1
    )
    pdf_s = (1.0 - p_delta) * _hk_pdf_smooth(bl, wi, wo_s)
    f_s = _hk_eval(bl, wi, wo_s)
    w_s = m.safe_div(f_s, jnp.maximum(pdf_s, 1e-9)[..., None])

    wo_d = -wi
    w_d = Tr / jnp.maximum(p_delta, 1e-9)[..., None]

    wo = jnp.where(choose_delta[..., None], wo_d, wo_s)
    weight = jnp.where(choose_delta[..., None], w_d, w_s)
    pdf = jnp.where(choose_delta, p_delta, pdf_s)
    return wo, weight, jnp.maximum(pdf, 1e-12), choose_delta, jnp.ones(wi.shape[:-1])


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


def _eval_base(bl: BsdfLocals, wi, wo, active_types=None):
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
        elif t == WARD:
            v = _ward_eval(bl, wi, wo)
        elif t == DIFFTRANS:
            v = _difftrans_eval(bl, wi, wo)
        elif t == HK:
            v = _hk_eval(bl, wi, wo)
        elif t == IRAWAN:
            v = _irawan_eval(bl, wi, wo)
        else:
            continue  # delta lobes eval to 0
        out = jnp.where(sel[..., None], v, out)
    return out


def _pdf_base(bl: BsdfLocals, wi, wo, active_types=None):
    wi, wo, _ = _flip_twosided(bl, wi, wo)
    out = jnp.zeros(wi.shape[:-1])
    types = active_types if active_types is not None else _ALL_TYPES
    for t in types:
        sel = bl.type == t
        if t == DIFFUSE:
            v = _diffuse_pdf(bl, wi, wo)
        elif t == ROUGH_DIFFUSE:
            v = _diffuse_pdf(bl, wi, wo)  # roughdiffuse samples cosine too
        elif t == IRAWAN:
            v = _diffuse_pdf(bl, wi, wo)  # irawan.cpp samples cosine too
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
        elif t == WARD:
            v = _ward_pdf(bl, wi, wo)
        elif t == DIFFTRANS:
            v = _difftrans_pdf(bl, wi, wo)
        elif t == HK:
            v = _hk_pdf(bl, wi, wo)
        else:
            continue
        out = jnp.where(sel, v, out)
    return out


def _sample_base(bl: BsdfLocals, wi, u_lobe, u2, active_types=None) -> BsdfSample:
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
        elif t == IRAWAN:
            wo_, w_, p_, d_, e_ = _diffuse_sample(bl, wi_f, u_lobe, u2)
            f = _irawan_eval(bl, wi_f, wo_)
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
        elif t == WARD:
            r = _ward_sample(bl, wi_f, u_lobe, u2)
        elif t == DIFFTRANS:
            r = _difftrans_sample(bl, wi_f, u_lobe, u2)
        elif t == HK:
            r = _hk_sample(bl, wi_f, u_lobe, u2)
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
    ROUGH_DIELECTRIC, THIN_DIELECTRIC, ROUGH_DIFFUSE, PHONG, WARD, DIFFTRANS,
    HK, NULL, IRAWAN,
)


# === nested-material layer (mixture/blend/mask/coating) ====================
# ``nested`` is (bl_a, bl_b, nested_types): locals gathered via the
# MaterialTable's nested_a/nested_b columns (scene.bsdf_nested). Nesting is
# one level deep — nested rows dispatch through the base layer only.

def _coat_refract(v, eta):
    """Refract v across z into a medium of relative IOR eta, KEEPING the
    hemisphere sign (coating.cpp refractIn): returns (v', |cos'|)."""
    sz = jnp.sign(v[..., 2])
    sin2 = jnp.maximum(1.0 - v[..., 2] * v[..., 2], 0.0)
    sin2_p = sin2 / (eta * eta)
    cos_p = jnp.sqrt(jnp.maximum(1.0 - sin2_p, 1e-12))
    vp = jnp.stack(
        [v[..., 0] / eta, v[..., 1] / eta, sz * cos_p], axis=-1
    )
    return m.normalize(vp), cos_p


def _coat_refract_out(vp, eta):
    """Inverse of _coat_refract: medium -> outside. Returns (v, valid)
    with valid=False on total internal reflection."""
    sz = jnp.sign(vp[..., 2])
    sin2_p = jnp.maximum(1.0 - vp[..., 2] * vp[..., 2], 0.0)
    sin2 = sin2_p * eta * eta
    valid = sin2 < 1.0
    cos_o = jnp.sqrt(jnp.maximum(1.0 - sin2, 1e-12))
    v = jnp.stack(
        [vp[..., 0] * eta, vp[..., 1] * eta, sz * cos_o], axis=-1
    )
    return m.normalize(v), valid


def _coating_common(bl, wi, wo):
    eta = bl.eta_s
    wi_p, ci_p = _coat_refract(wi, eta)
    wo_p, co_p = _coat_refract(wo, eta)
    Fi, _ = m.fresnel_dielectric(jnp.abs(wi[..., 2]), eta)
    Fo, _ = m.fresnel_dielectric(jnp.abs(wo[..., 2]), eta)
    # absorption: k_c doubles as sigma_a * thickness for coating rows
    T = jnp.exp(-bl.k_c * (1.0 / jnp.maximum(ci_p, 1e-6)
                           + 1.0 / jnp.maximum(co_p, 1e-6))[..., None])
    jac = m.safe_div(jnp.abs(wo[..., 2]), eta * eta * jnp.maximum(co_p, 1e-6))
    return wi_p, wo_p, Fi, Fo, T, jac


def _coating_eval(bl, bl_a, ntypes, wi, wo):
    wi_p, wo_p, Fi, Fo, T, jac = _coating_common(bl, wi, wo)
    f_n = _eval_base(bl_a, wi_p, wo_p, ntypes)
    return f_n * ((1.0 - Fi) * (1.0 - Fo) * jac)[..., None] * T


def _coating_pdf(bl, bl_a, ntypes, wi, wo):
    wi_p, wo_p, Fi, _, _, jac = _coating_common(bl, wi, wo)
    p_n = _pdf_base(bl_a, wi_p, wo_p, ntypes)
    p_spec = jnp.clip(Fi, 0.05, 0.95)  # must match sample()'s lobe prob
    return (1.0 - p_spec) * p_n * jac


# --- roughcoating (roughcoating.cpp): microfacet varnish over nested A ----
#
# Like coating but the outer interface is a rough dielectric: the specular
# lobe is a full microfacet reflection and the nested BSDF is attenuated by
# the fitted rough-transmittance T(cos) on the way in and out (rtrans.h
# role). Refraction of the nested directions uses the macro normal, the
# same approximation as the reference (roughcoating.cpp:267
# refractTo(EInterior, ...) with the smooth eta).

def _roughcoating_spec_prob(bl, wi):
    return jnp.clip(1.0 - _rt_T(bl, wi[..., 2]), 0.05, 0.95)


def _roughcoating_eval(bl, bl_a, ntypes, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    mh = m.normalize(wi + wo)
    au = bl.alpha[..., 0]
    dist = bl.dist
    # static-dist scenes carry one tag; evaluate both and select
    def spec_for(d):
        D = mf.eval_d(d, au, au, mh)
        G = mf.smith_g(d, au, au, wi, wo, mh)
        F, _ = m.fresnel_dielectric(jnp.abs(m.dot(wi, mh)), bl.eta_s)
        return m.safe_div(D * G * F, 4.0 * wi[..., 2])
    spec = jnp.where(dist == 1, spec_for(1), spec_for(0))
    f_spec = bl.spec_refl * spec[..., None]

    wi_p, wo_p, _, _, Tabs, jac = _coating_common(bl, wi, wo)
    f_n = _eval_base(bl_a, wi_p, wo_p, ntypes)
    T_i = _rt_T(bl, wi[..., 2])
    T_o = _rt_T(bl, wo[..., 2])
    f_nested = f_n * (T_i * T_o * jac)[..., None] * Tabs
    return jnp.where(ok[..., None], f_spec + f_nested, 0.0)


def _roughcoating_pdf(bl, bl_a, ntypes, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    mh = m.normalize(wi + wo)
    au = bl.alpha[..., 0]
    p_m = jnp.where(bl.dist == 1, mf.pdf(1, au, au, wi, mh),
                    mf.pdf(0, au, au, wi, mh))
    pdf_s = m.safe_div(p_m, 4.0 * jnp.abs(m.dot(wo, mh)))
    wi_p, wo_p, _, _, _, jac = _coating_common(bl, wi, wo)
    p_n = _pdf_base(bl_a, wi_p, wo_p, ntypes)
    p_spec = _roughcoating_spec_prob(bl, wi)
    return jnp.where(ok, p_spec * pdf_s + (1.0 - p_spec) * p_n * jac, 0.0)


def eval(bl: BsdfLocals, wi, wo, active_types=None, nested=None):
    out = _eval_base(bl, wi, wo, active_types)
    if nested is None:
        return out
    bl_a, bl_b, ntypes = nested
    types = active_types if active_types is not None else _ALL_TYPES
    if MIXTURE in types or BLEND in types or MASK in types:
        f_a = _eval_base(bl_a, wi, wo, ntypes)
        w = bl.blend_w[..., None]
        if MIXTURE in types or BLEND in types:
            f_b = _eval_base(bl_b, wi, wo, ntypes)
            mixsel = (bl.type == MIXTURE) | (bl.type == BLEND)
            out = jnp.where(mixsel[..., None], w * f_a + (1.0 - w) * f_b, out)
        if MASK in types:
            out = jnp.where((bl.type == MASK)[..., None],
                            bl.opacity[..., None] * f_a, out)
    if COATING in types:
        out = jnp.where((bl.type == COATING)[..., None],
                        _coating_eval(bl, bl_a, ntypes, wi, wo), out)
    if ROUGHCOATING in types:
        out = jnp.where((bl.type == ROUGHCOATING)[..., None],
                        _roughcoating_eval(bl, bl_a, ntypes, wi, wo), out)
    return out


def pdf(bl: BsdfLocals, wi, wo, active_types=None, nested=None):
    out = _pdf_base(bl, wi, wo, active_types)
    if nested is None:
        return out
    bl_a, bl_b, ntypes = nested
    types = active_types if active_types is not None else _ALL_TYPES
    if MIXTURE in types or BLEND in types or MASK in types:
        p_a = _pdf_base(bl_a, wi, wo, ntypes)
        w = bl.blend_w
        if MIXTURE in types or BLEND in types:
            p_b = _pdf_base(bl_b, wi, wo, ntypes)
            mixsel = (bl.type == MIXTURE) | (bl.type == BLEND)
            out = jnp.where(mixsel, w * p_a + (1.0 - w) * p_b, out)
        if MASK in types:
            out = jnp.where(bl.type == MASK, bl.opacity * p_a, out)
    if ROUGHCOATING in types:
        out = jnp.where(bl.type == ROUGHCOATING,
                        _roughcoating_pdf(bl, bl_a, ntypes, wi, wo), out)
    if COATING in types:
        out = jnp.where(bl.type == COATING,
                        _coating_pdf(bl, bl_a, ntypes, wi, wo), out)
    return out


def sample(bl: BsdfLocals, wi, u_lobe, u2, active_types=None,
           nested=None) -> BsdfSample:
    out = _sample_base(bl, wi, u_lobe, u2, active_types)
    if nested is None:
        return out
    bl_a, bl_b, ntypes = nested
    types = active_types if active_types is not None else _ALL_TYPES

    def _sel(mask, r, out):
        return BsdfSample(
            wo=jnp.where(mask[..., None], r.wo, out.wo),
            weight=jnp.where(mask[..., None], r.weight, out.weight),
            pdf=jnp.where(mask, r.pdf, out.pdf),
            is_delta=jnp.where(mask, r.is_delta, out.is_delta),
            eta=jnp.where(mask, r.eta, out.eta),
        )

    if MIXTURE in types or BLEND in types:
        # one-sample MIS over the two nested lobes (mixturebsdf.cpp pdf
        # combination): pick A w.p. blend_w, re-use the remapped random
        w = jnp.clip(bl.blend_w, 1e-4, 1.0 - 1e-4)
        pick_a = u_lobe < w
        u_a = jnp.clip(u_lobe / w, 0.0, 1.0 - 1e-7)
        u_b = jnp.clip((u_lobe - w) / (1.0 - w), 0.0, 1.0 - 1e-7)
        r_a = _sample_base(bl_a, wi, u_a, u2, ntypes)
        r_b = _sample_base(bl_b, wi, u_b, u2, ntypes)
        wo_m = jnp.where(pick_a[..., None], r_a.wo, r_b.wo)
        chosen_delta = jnp.where(pick_a, r_a.is_delta, r_b.is_delta)
        chosen_w = jnp.where(pick_a[..., None], r_a.weight, r_b.weight)
        chosen_pdf = jnp.where(pick_a, r_a.pdf, r_b.pdf)
        chosen_eta = jnp.where(pick_a, r_a.eta, r_b.eta)
        # smooth path: full eval + combined pdf
        f_m = (w[..., None] * _eval_base(bl_a, wi, wo_m, ntypes)
               + (1.0 - w)[..., None] * _eval_base(bl_b, wi, wo_m, ntypes))
        p_m = (w * _pdf_base(bl_a, wi, wo_m, ntypes)
               + (1.0 - w) * _pdf_base(bl_b, wi, wo_m, ntypes))
        w_smooth = m.safe_div(f_m, jnp.maximum(p_m, 1e-12)[..., None])
        weight_m = jnp.where(chosen_delta[..., None], chosen_w, w_smooth)
        pdf_m = jnp.where(chosen_delta,
                          jnp.where(pick_a, w, 1.0 - w) * chosen_pdf, p_m)
        r_mix = BsdfSample(wo=wo_m, weight=weight_m, pdf=pdf_m,
                           is_delta=chosen_delta, eta=chosen_eta)
        out = _sel((bl.type == MIXTURE) | (bl.type == BLEND), r_mix, out)

    if MASK in types:
        op = jnp.clip(bl.opacity, 0.0, 1.0)
        interact = u_lobe < op
        u_n = jnp.clip(m.safe_div(u_lobe, jnp.maximum(op, 1e-7)), 0.0, 1.0 - 1e-7)
        r_n = _sample_base(bl_a, wi, u_n, u2, ntypes)
        sh = wi.shape[:-1]
        r_pass = BsdfSample(
            wo=-wi, weight=jnp.ones(sh + (3,)), pdf=jnp.maximum(1.0 - op, 1e-12),
            is_delta=jnp.ones(sh, bool), eta=jnp.ones(sh),
        )
        r_m = BsdfSample(
            wo=jnp.where(interact[..., None], r_n.wo, r_pass.wo),
            weight=jnp.where(interact[..., None], r_n.weight, r_pass.weight),
            pdf=jnp.where(interact, op * r_n.pdf, r_pass.pdf),
            is_delta=jnp.where(interact, r_n.is_delta, r_pass.is_delta),
            eta=jnp.where(interact, r_n.eta, r_pass.eta),
        )
        out = _sel(bl.type == MASK, r_m, out)

    if COATING in types:
        eta = bl.eta_s
        Fi, _ = m.fresnel_dielectric(jnp.abs(wi[..., 2]), eta)
        p_spec = jnp.clip(Fi, 0.05, 0.95)
        choose_spec = u_lobe < p_spec
        wo_s = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
        w_s = bl.spec_refl * m.safe_div(Fi, p_spec)[..., None]

        wi_p, ci_p = _coat_refract(wi, eta)
        u_n = jnp.clip(m.safe_div(u_lobe - p_spec, 1.0 - p_spec), 0.0, 1.0 - 1e-7)
        r_n = _sample_base(bl_a, wi_p, u_n, u2, ntypes)
        wo_c, valid_out = _coat_refract_out(r_n.wo, eta)
        Fo, _ = m.fresnel_dielectric(jnp.abs(wo_c[..., 2]), eta)
        co_p = jnp.abs(r_n.wo[..., 2])
        T = jnp.exp(-bl.k_c * (1.0 / jnp.maximum(ci_p, 1e-6)
                               + 1.0 / jnp.maximum(co_p, 1e-6))[..., None])
        ok_n = valid_out & (r_n.pdf > 0)
        w_n = jnp.where(
            ok_n[..., None],
            r_n.weight * T * m.safe_div((1.0 - Fi) * (1.0 - Fo),
                                        1.0 - p_spec)[..., None],
            0.0,
        )
        jac = m.safe_div(jnp.abs(wo_c[..., 2]), eta * eta * jnp.maximum(co_p, 1e-6))
        # TIR at the inner interface: the sample is lost (coating.cpp
        # discards it) — signal with pdf = 0 so integrators kill the lane
        pdf_n = jnp.where(ok_n, (1.0 - p_spec) * r_n.pdf * jac, 0.0)
        r_c = BsdfSample(
            wo=jnp.where(choose_spec[..., None], wo_s, wo_c),
            weight=jnp.where(choose_spec[..., None], w_s, w_n),
            pdf=jnp.where(choose_spec, p_spec, pdf_n),
            is_delta=jnp.where(choose_spec, True, r_n.is_delta),
            eta=jnp.ones(wi.shape[:-1]),
        )
        out = _sel(bl.type == COATING, r_c, out)

    if ROUGHCOATING in types:
        # rough varnish: microfacet reflection lobe OR nested sample
        # refracted through the macro interface (roughcoating.cpp sample)
        eta = bl.eta_s
        p_spec = _roughcoating_spec_prob(bl, wi)
        choose_spec = u_lobe < p_spec
        au = bl.alpha[..., 0]
        mh0, _ = mf.sample(0, au, au, wi, u2)
        mh1, _ = mf.sample(1, au, au, wi, u2)
        mh = jnp.where((bl.dist == 1)[..., None], mh1, mh0)
        wo_s = m.reflect(wi, mh)

        wi_p, ci_p = _coat_refract(wi, eta)
        u_n = jnp.clip(m.safe_div(u_lobe - p_spec, 1.0 - p_spec),
                       0.0, 1.0 - 1e-7)
        r_n = _sample_base(bl_a, wi_p, u_n, u2, ntypes)
        wo_c, valid_out = _coat_refract_out(r_n.wo, eta)
        wo_rc = jnp.where(choose_spec[..., None], wo_s, wo_c)
        # smooth combined eval/pdf (no delta lobes in the rough coat; a
        # delta NESTED lobe keeps its own weight path)
        nested_delta = ~choose_spec & r_n.is_delta
        f_rc = _roughcoating_eval(bl, bl_a, ntypes, wi, wo_rc)
        p_rc = _roughcoating_pdf(bl, bl_a, ntypes, wi, wo_rc)
        # eval convention already includes cos_o (see _rough_conductor_f)
        w_smooth = m.safe_div(f_rc, jnp.maximum(p_rc, 1e-12)[..., None])
        # delta nested lobe: carry the nested weight with T attenuation
        T_i = _rt_T(bl, wi[..., 2])
        T_o = _rt_T(bl, wo_c[..., 2])
        co_p = jnp.abs(r_n.wo[..., 2])
        Tabs = jnp.exp(-bl.k_c * (1.0 / jnp.maximum(ci_p, 1e-6)
                                  + 1.0 / jnp.maximum(co_p, 1e-6))[..., None])
        w_delta = r_n.weight * Tabs * m.safe_div(
            T_i * T_o, 1.0 - p_spec)[..., None]
        ok_n = valid_out & (r_n.pdf > 0)
        jac = m.safe_div(jnp.abs(wo_c[..., 2]),
                         eta * eta * jnp.maximum(co_p, 1e-6))
        weight_rc = jnp.where(nested_delta[..., None], w_delta, w_smooth)
        weight_rc = jnp.where(
            (choose_spec | ok_n)[..., None], weight_rc, 0.0)
        pdf_rc = jnp.where(nested_delta,
                           (1.0 - p_spec) * r_n.pdf * jac, p_rc)
        pdf_rc = jnp.where(choose_spec | ok_n, pdf_rc, 0.0)
        r_rc = BsdfSample(
            wo=wo_rc, weight=weight_rc, pdf=pdf_rc,
            is_delta=nested_delta,
            eta=jnp.ones(wi.shape[:-1]),
        )
        out = _sel(bl.type == ROUGHCOATING, r_rc, out)
    return out
