"""Spectral power distributions (reference: include/mitsuba/core/spectrum.h).

The build renders in linear-sRGB RGB (SPECTRUM_SAMPLES=3, the reference's
default per CMakeLists.txt:80); a Spectrum is simply a (..., 3) float array.
Conversions (XYZ <-> linear sRGB, luminance, sRGB gamma) plus blackbody
emission and interpolated-SPD resampling to RGB live here.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_CHANNELS = 3

# CIE-standard sRGB <-> XYZ (D65) matrices
_XYZ_TO_SRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=np.float32,
)
_SRGB_TO_XYZ = np.linalg.inv(_XYZ_TO_SRGB).astype(np.float32)


def xyz_to_rgb(xyz):
    return xyz @ jnp.asarray(_XYZ_TO_SRGB).T


def rgb_to_xyz(rgb):
    return rgb @ jnp.asarray(_SRGB_TO_XYZ).T


def luminance(rgb):
    """Y of linear sRGB (reference spectrum.cpp getLuminance)."""
    return (
        rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169
    )


def srgb_gamma(x):
    """Linear -> sRGB transfer curve (reference bitmap gamma handling)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055
    )


def srgb_degamma(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def blackbody_rgb(temperature_k: float) -> np.ndarray:
    """Planck emitter resampled to linear sRGB (W / (m^2 sr nm) scale).

    Host-side helper (numpy) used at scene-build time, mirroring the
    reference's BlackBodySpectrum (spectrum.h:92).
    """
    lam = np.linspace(360e-9, 830e-9, 95)
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    I = (2 * h * c**2) / (lam**5 * (np.exp(h * c / (lam * kb * temperature_k)) - 1.0))
    I_nm = I * 1e-9  # per nm
    return spd_to_rgb(lam * 1e9, I_nm)


# CIE 1931 color matching functions, coarsely tabulated at 10nm (public data,
# adequate for build-time SPD -> RGB conversion; the reference embeds the
# full 1nm tables in spectrum.cpp).
_CIE_WL = np.arange(360.0, 831.0, 5.0)


def _cie_xyz_fits(wl):
    """Analytic multi-lobe Gaussian fits to CIE 1931 (Wyman et al. 2013)."""

    def g(x, mu, s1, s2):
        t = (x - mu) * np.where(x < mu, 1.0 / s1, 1.0 / s2)
        return np.exp(-0.5 * t * t)

    x = (
        1.056 * g(wl, 599.8, 37.9, 31.0)
        + 0.362 * g(wl, 442.0, 16.0, 26.7)
        - 0.065 * g(wl, 501.1, 20.4, 26.2)
    )
    y = 0.821 * g(wl, 568.8, 46.9, 40.5) + 0.286 * g(wl, 530.9, 16.3, 31.1)
    z = 1.217 * g(wl, 437.0, 11.8, 36.0) + 0.681 * g(wl, 459.0, 26.0, 13.8)
    return x, y, z


def spd_to_rgb(wavelengths_nm, values) -> np.ndarray:
    """Integrate a tabulated SPD against CIE curves -> linear sRGB (host-side).

    Mirrors InterpolatedSpectrum -> RGB conversion (spectrum.h:203) used for
    measured conductor IOR curves (data/ior/*.spd).
    """
    wl = np.asarray(wavelengths_nm, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    v = np.interp(_CIE_WL, wl, vals, left=0.0, right=0.0)
    cx, cy, cz = _cie_xyz_fits(_CIE_WL)
    norm = np.trapezoid(cy, _CIE_WL)
    X = np.trapezoid(v * cx, _CIE_WL) / norm
    Y = np.trapezoid(v * cy, _CIE_WL) / norm
    Z = np.trapezoid(v * cz, _CIE_WL) / norm
    return (_XYZ_TO_SRGB @ np.array([X, Y, Z])).astype(np.float32)


# --- N-bin / hero-wavelength spectral mode ----------------------------------
# The reference's spectral build discretizes 360-830nm into
# SPECTRUM_SAMPLES bins (spectrum.h:25-32). The TPU-native analog keeps
# the scene RGB and renders spectrally by HERO-WAVELENGTH transport: each
# lane carries 3 wavelengths (one per existing channel slot), every RGB
# factor is lifted to a smooth spectrum evaluated at those wavelengths,
# and the film converts (lambda_i, L_i) back through the CIE curves. The
# RGB->spectrum uplift uses three smooth sigmoid band bases whose CIE
# response matrix is inverted at import time, so uplift followed by
# CMF integration round-trips EXACTLY (a linear-algebra identity, not an
# approximation; saturated colors may dip slightly negative between bands).

WL_MIN, WL_MAX = 360.0, 830.0


def cmf_xyz(wl):
    """CIE 1931 x/y/z color matching functions at wl (nm), device-side
    (analytic Wyman et al. 2013 multi-lobe Gaussian fits). Returns
    (..., 3)."""
    wl = jnp.asarray(wl)

    def g(x, mu, s1, s2):
        t = (x - mu) * jnp.where(x < mu, 1.0 / s1, 1.0 / s2)
        return jnp.exp(-0.5 * t * t)

    x = (1.056 * g(wl, 599.8, 37.9, 31.0)
         + 0.362 * g(wl, 442.0, 16.0, 26.7)
         - 0.065 * g(wl, 501.1, 20.4, 26.2))
    y = 0.821 * g(wl, 568.8, 46.9, 40.5) + 0.286 * g(wl, 530.9, 16.3, 31.1)
    z = 1.217 * g(wl, 437.0, 11.8, 36.0) + 0.681 * g(wl, 459.0, 26.0, 13.8)
    return jnp.stack([x, y, z], axis=-1)


def _band_bases(wl):
    """Three smooth band bases (blue/green/red) roughly partitioning
    unity over the visible range. Device- and host-safe (jnp)."""
    wl = jnp.asarray(wl)
    sb = 1.0 / (1.0 + jnp.exp((wl - 490.0) / 18.0))
    sr = 1.0 / (1.0 + jnp.exp((575.0 - wl) / 18.0))
    sg = jnp.clip(1.0 - sb - sr, 0.0, None)
    return jnp.stack([sr, sg, sb], axis=-1)  # (..., 3) order R,G,B


def _band_bases_np(wl) -> np.ndarray:
    """Host-side (pure numpy) twin of _band_bases — safe to call from
    inside an active jax trace (jnp ops on constants become tracers)."""
    wl = np.asarray(wl, np.float64)
    sb = 1.0 / (1.0 + np.exp((wl - 490.0) / 18.0))
    sr = 1.0 / (1.0 + np.exp((575.0 - wl) / 18.0))
    sg = np.clip(1.0 - sb - sr, 0.0, None)
    return np.stack([sr, sg, sb], axis=-1)


def _uplift_matrix() -> np.ndarray:
    """3x3 M with M[i] = linear-sRGB response of band basis i; spectra are
    built with coefficients c = M^-T rgb so integration round-trips."""
    wl = np.arange(WL_MIN, WL_MAX + 1e-3, 2.0)
    B = _band_bases_np(wl)  # (W, 3)
    resp = np.stack([spd_to_rgb(wl, B[:, i] * _D65(wl)) for i in range(3)])
    return resp  # (basis, rgb)


def _bb6504(lam_nm):
    lam = np.asarray(lam_nm) * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    I = (2 * h * c**2) / (lam**5 * (np.exp(h * c / (lam * kb * 6504.0)) - 1.0))
    ref = (2 * h * c**2) / (
        (560e-9)**5 * (np.exp(h * c / (560e-9 * kb * 6504.0)) - 1.0))
    return I / ref


_WHITE_POLY = None


def _white_poly() -> np.ndarray:
    """Quadratic correction (a, b, c) such that the smooth illuminant
    bb6504(l) * (a + b t + c t^2), t = (l-360)/470, integrates to EXACTLY
    linear-sRGB white — making the uplift's white coefficients exactly
    (1,1,1) and white reflectance pointwise unity."""
    global _WHITE_POLY
    if _WHITE_POLY is None:
        wl = np.arange(WL_MIN, WL_MAX + 1e-3, 2.0)
        t = (wl - WL_MIN) / (WL_MAX - WL_MIN)
        bb = _bb6504(wl)
        A = np.stack([spd_to_rgb(wl, bb), spd_to_rgb(wl, bb * t),
                      spd_to_rgb(wl, bb * t * t)], axis=1)  # rgb x coef
        _WHITE_POLY = np.linalg.solve(A, np.ones(3)).astype(np.float32)
    return _WHITE_POLY


def _D65(wl):
    """Smooth reference-white illuminant: 6504K blackbody shape times a
    quadratic whose sRGB response is exactly (1, 1, 1)."""
    wl = np.asarray(wl)
    a, b, c = _white_poly()
    t = (wl - WL_MIN) / (WL_MAX - WL_MIN)
    return _bb6504(wl) * (a + b * t + c * t * t)


_UPLIFT_INV = None


def _uplift_inv() -> np.ndarray:
    global _UPLIFT_INV
    if _UPLIFT_INV is None:
        _UPLIFT_INV = np.linalg.inv(_uplift_matrix()).astype(np.float32)
    return _UPLIFT_INV


def uplift_rgb(rgb, wl):
    """Evaluate the smooth spectrum lifted from linear-sRGB ``rgb``
    (..., 3) at wavelengths ``wl`` (..., K). Returns (..., K)."""
    c = rgb @ jnp.asarray(_uplift_inv())          # (..., 3) basis coefs
    B = _band_bases(wl)                            # (..., K, 3)
    return jnp.einsum("...kb,...b->...k", B, c)


def sample_wavelengths(u):
    """Hero wavelength + 2 rotated companions from one uniform u (...,):
    returns (wl (..., 3), pdf ())."""
    u = jnp.asarray(u)
    span = WL_MAX - WL_MIN
    offs = jnp.asarray([0.0, 1.0 / 3.0, 2.0 / 3.0])
    t = (u[..., None] + offs) % 1.0
    return WL_MIN + t * span, 1.0 / span


def spectral_to_rgb(L, wl, pdf):
    """Convert per-wavelength radiance (..., K) at wl (..., K) sampled with
    density ``pdf`` to linear sRGB (..., 3): the D65 illuminant factor used
    by the uplift is divided back out so a white (1,1,1) reflectance chain
    under a white (1,1,1) emitter reproduces (1,1,1)."""
    xyz = cmf_xyz(wl)                              # (..., K, 3)
    wl_np = np.arange(WL_MIN, WL_MAX + 1e-3, 2.0)
    cx, cy, cz = _cie_xyz_fits(wl_np)
    norm = np.trapezoid(cy, wl_np)
    K = wl.shape[-1]
    contrib = jnp.einsum("...k,...kc->...c", L, xyz) / (pdf * K * norm)
    return contrib @ jnp.asarray(_XYZ_TO_SRGB).T


def d65(wl):
    """Device-side smooth reference-white illuminant (see _D65) — the
    emission uplift's whitepoint factor."""
    wl = jnp.asarray(wl)
    lam = wl * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    I = (2 * h * c**2) / (lam**5 * (jnp.exp(h * c / (lam * kb * 6504.0)) - 1.0))
    ref = (2 * h * c**2) / (
        (560e-9)**5 * (np.exp(h * c / (560e-9 * kb * 6504.0)) - 1.0))
    pa, pb, pc = (float(x) for x in _white_poly())
    t = (wl - WL_MIN) / (WL_MAX - WL_MIN)
    return I / ref * (pa + pb * t + pc * t * t)
