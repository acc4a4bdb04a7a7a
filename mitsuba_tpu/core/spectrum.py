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
