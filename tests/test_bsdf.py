"""BSDF correctness: chi-square sample-vs-pdf agreement for every smooth
lobe (the reference's test_chisquare.cpp program), energy conservation, and
delta-lobe physical checks (Fresnel / Snell, test-style of dielectric.cpp).
"""
import jax.numpy as jnp
import zlib

import numpy as np
import pytest

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import rng
from mitsuba_tpu.render import bsdf as B
from mitsuba_tpu.render import microfacet as mf
from mitsuba_tpu.utils.chi2 import chi2_test

N = 300_000


def make_locals(n, **kw):
    defaults = dict(
        type=B.DIFFUSE, dist=mf.GGX, albedo=(0.6, 0.4, 0.25),
        spec_refl=(1.0, 1.0, 1.0), spec_trans=(1.0, 1.0, 1.0),
        eta=(1.5, 1.5, 1.5), k=(0.0, 0.0, 0.0), alpha=(0.3, 0.3),
        nonlinear=False, twosided=False, opacity=1.0, blend_w=0.5,
        hk_thickness=1.0, hk_g=0.0, rt=None,
    )
    defaults.update(kw)
    d = defaults

    def full(v, shape):
        return jnp.broadcast_to(jnp.asarray(v, dtype=jnp.float32), shape)

    return B.BsdfLocals(
        type=jnp.full((n,), d["type"], jnp.int32),
        dist=jnp.full((n,), d["dist"], jnp.int32),
        albedo=full(d["albedo"], (n, 3)),
        spec_refl=full(d["spec_refl"], (n, 3)),
        spec_trans=full(d["spec_trans"], (n, 3)),
        eta_s=jnp.full((n,), d["eta"][0]),
        eta_c=full(d["eta"], (n, 3)),
        k_c=full(d["k"], (n, 3)),
        alpha=full(d["alpha"], (n, 2)),
        nonlinear=jnp.full((n,), d["nonlinear"], bool),
        twosided=jnp.full((n,), d["twosided"], bool),
        opacity=jnp.full((n,), d["opacity"]),
        blend_w=jnp.full((n,), d["blend_w"]),
        hk_thickness=jnp.full((n,), d["hk_thickness"]),
        hk_g=jnp.full((n,), d["hk_g"]),
        rt_coef=full(_rt_for(d), (n, 6)),
        rt_fdr=jnp.full((n,), _rt_fdr_for(d)),
        iw_par=jnp.zeros((n, 13)),
        iw_ks=jnp.zeros((n, 3)),
    )


def _rt_for(d):
    if d["type"] not in (B.ROUGH_PLASTIC, B.ROUGHCOATING):
        return (0.0,) * 6
    from mitsuba_tpu.core import rtrans
    coef, _ = rtrans.fit_poly(int(d["dist"]), float(d["alpha"][0]),
                              float(d["eta"][0]))
    return tuple(float(c) for c in coef)


def _rt_fdr_for(d):
    if d["type"] not in (B.ROUGH_PLASTIC, B.ROUGHCOATING):
        return 0.0
    from mitsuba_tpu.core import rtrans
    return 1.0 - rtrans.diffuse_transmittance(
        int(d["dist"]), float(d["alpha"][0]), 1.0 / float(d["eta"][0]))


def _wi(theta_deg, n):
    t = np.deg2rad(theta_deg)
    wi = jnp.asarray([np.sin(t), 0.0, np.cos(t)], jnp.float32)
    return jnp.broadcast_to(wi, (n, 3))


CONFIGS = [
    ("diffuse_30", dict(type=B.DIFFUSE), 30.0),
    ("roughdiffuse_45", dict(type=B.ROUGH_DIFFUSE, alpha=(0.4, 0.4)), 45.0),
    ("roughcond_ggx_30", dict(type=B.ROUGH_CONDUCTOR, dist=mf.GGX,
                              eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                              alpha=(0.3, 0.3)), 30.0),
    ("roughcond_ggx_grazing", dict(type=B.ROUGH_CONDUCTOR, dist=mf.GGX,
                                   eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                                   alpha=(0.1, 0.1)), 75.0),
    ("roughcond_beck_30", dict(type=B.ROUGH_CONDUCTOR, dist=mf.BECKMANN,
                               eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                               alpha=(0.3, 0.3)), 30.0),
    ("roughcond_aniso", dict(type=B.ROUGH_CONDUCTOR, dist=mf.GGX,
                             eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                             alpha=(0.1, 0.4)), 40.0),
    ("plastic_30", dict(type=B.PLASTIC, eta=(1.49, 1.49, 1.49)), 30.0),
    ("roughplastic_45", dict(type=B.ROUGH_PLASTIC, dist=mf.GGX,
                             eta=(1.49, 1.49, 1.49), alpha=(0.2, 0.2)), 45.0),
    ("roughdielectric_out", dict(type=B.ROUGH_DIELECTRIC, dist=mf.GGX,
                                 eta=(1.5, 1.5, 1.5), alpha=(0.3, 0.3)), 30.0),
    ("roughdielectric_in", dict(type=B.ROUGH_DIELECTRIC, dist=mf.GGX,
                                eta=(1.5, 1.5, 1.5), alpha=(0.3, 0.3)), 150.0),
    ("phong_30", dict(type=B.PHONG, alpha=(0.2, 0.2),
                      albedo=(0.3, 0.3, 0.3), spec_refl=(0.4, 0.4, 0.4)), 30.0),
    ("ward_30", dict(type=B.WARD, alpha=(0.2, 0.4),
                     albedo=(0.3, 0.3, 0.3), spec_refl=(0.4, 0.4, 0.4)), 30.0),
    ("difftrans_30", dict(type=B.DIFFTRANS, spec_trans=(0.7, 0.6, 0.5)), 30.0),
    ("hk_40", dict(type=B.HK, albedo=(0.6, 0.6, 0.6), k=(1.5, 1.5, 1.5),
                   hk_thickness=0.4, hk_g=0.3), 40.0),
]


@pytest.mark.parametrize("name,mat,theta", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_bsdf_chi2(name, mat, theta):
    types = (mat["type"],)

    def sample_fn(n):
        bl = make_locals(n, **mat)
        wi = _wi(theta, n)
        u = rng.uniform4(zlib.crc32(name.encode()) % 1000, jnp.arange(n, dtype=jnp.int32), 0, 0)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=types)
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.where(np.asarray(ok)[:, None], np.asarray(bs.wo), 0.0)

    def pdf_fn(d):
        n = d.shape[0]
        bl = make_locals(n, **mat)
        wi = _wi(theta, n)
        return B.pdf(bl, wi, d, active_types=types)

    ok, pval, stat, dof, info = chi2_test(
        sample_fn, pdf_fn, n_samples=N, significance=0.0005
    )
    assert ok, f"{name}: {info}"


@pytest.mark.parametrize(
    "mat",
    [
        dict(type=B.DIFFUSE, albedo=(1.0, 1.0, 1.0)),
        dict(type=B.ROUGH_CONDUCTOR, dist=mf.GGX, eta=(1e-4,) * 3, k=(0.0,) * 3,
             alpha=(0.3, 0.3)),
    ],
    ids=["white_diffuse", "perfect_mirror_rough"],
)
def test_energy_conservation(mat):
    """White-furnace check: sum of sample weights must be <= 1 per channel
    (no energy gain) for unit-reflectance materials."""
    n = 200_000
    bl = make_locals(n, **mat)
    wi = _wi(30.0, n)
    u = rng.uniform4(11, jnp.arange(n, dtype=jnp.int32), 0, 0)
    bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=(mat["type"],))
    w = np.asarray(bs.weight)
    mean_w = w.mean(axis=0)
    assert (mean_w <= 1.0 + 5e-3).all(), f"energy gain: {mean_w}"
    assert mean_w.min() > 0.5, f"suspiciously lossy: {mean_w}"


def test_diffuse_reciprocity():
    n = 1000
    bl = make_locals(n)
    u = rng.uniform4(5, jnp.arange(n, dtype=jnp.int32), 0, 0)
    from mitsuba_tpu.core import warp

    wi = warp.square_to_uniform_hemisphere(u[..., :2])
    wo = warp.square_to_uniform_hemisphere(u[..., 2:])
    # f(wi->wo)·cos θo / cos θo vs f(wo->wi): divide out the eval cosine
    f_io = np.asarray(B.eval(bl, wi, wo)) / np.maximum(np.asarray(wo[..., 2:]), 1e-7)
    f_oi = np.asarray(B.eval(bl, wo, wi)) / np.maximum(np.asarray(wi[..., 2:]), 1e-7)
    np.testing.assert_allclose(f_io, f_oi, rtol=1e-4, atol=1e-6)


def test_smooth_dielectric_snell_and_fresnel():
    """dielectric.cpp physics: refracted directions obey Snell's law; the
    reflect/refract split converges to the analytic Fresnel coefficient."""
    n = 200_000
    bl = make_locals(n, type=B.DIELECTRIC, eta=(1.5, 1.5, 1.5))
    wi = _wi(45.0, n)
    u = rng.uniform4(21, jnp.arange(n, dtype=jnp.int32), 0, 0)
    bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=(B.DIELECTRIC,))
    wo = np.asarray(bs.wo)
    refracted = wo[:, 2] < 0
    frac_reflect = 1.0 - refracted.mean()
    F, _ = m.fresnel_dielectric(jnp.asarray([np.cos(np.deg2rad(45.0))]), 1.5)
    assert abs(frac_reflect - float(F[0])) < 5e-3
    # Snell: sinθi = eta · sinθt
    sin_t = np.sqrt(np.maximum(1 - wo[refracted, 2] ** 2, 0))
    np.testing.assert_allclose(
        np.sin(np.deg2rad(45.0)), 1.5 * sin_t, rtol=1e-4, atol=1e-5
    )
    # all unit length
    np.testing.assert_allclose(np.linalg.norm(wo, axis=1), 1.0, atol=1e-5)


def test_conductor_reflect_exact():
    n = 1024
    bl = make_locals(n, type=B.CONDUCTOR, eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14))
    wi = _wi(30.0, n)
    u = rng.uniform4(22, jnp.arange(n, dtype=jnp.int32), 0, 0)
    bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=(B.CONDUCTOR,))
    wo = np.asarray(bs.wo)
    wi_n = np.asarray(wi)
    np.testing.assert_allclose(wo[:, 2], wi_n[:, 2], atol=1e-6)
    np.testing.assert_allclose(wo[:, :2], -wi_n[:, :2], atol=1e-6)
    # reflectance within [0, 1]
    w = np.asarray(bs.weight)
    assert (w >= 0).all() and (w <= 1.0).all()


# --- nested materials (mixturebsdf / blendbsdf / coating / mask) -----------

NESTED_A = dict(type=B.DIFFUSE, albedo=(0.6, 0.4, 0.25))
NESTED_B = dict(type=B.ROUGH_CONDUCTOR, dist=mf.GGX, eta=(0.2, 0.92, 1.1),
                k=(3.9, 2.45, 2.14), alpha=(0.3, 0.3))


@pytest.mark.parametrize(
    "name,outer,cfg_a,cfg_b,ntypes,theta",
    [
        ("mixture", dict(type=B.MIXTURE, blend_w=0.4), NESTED_A, NESTED_B,
         (B.DIFFUSE, B.ROUGH_CONDUCTOR), 30.0),
        ("coating", dict(type=B.COATING, eta=(1.5,) * 3, k=(0.08,) * 3),
         NESTED_A, NESTED_A, (B.DIFFUSE,), 35.0),
        ("mask", dict(type=B.MASK, opacity=0.7), NESTED_A, NESTED_A,
         (B.DIFFUSE,), 30.0),
    ],
)
def test_nested_chi2(name, outer, cfg_a, cfg_b, ntypes, theta):
    """sample()-vs-pdf() agreement for the nested-material layer."""
    types = (outer["type"],)

    def mk(n):
        return (make_locals(n, **outer), make_locals(n, **cfg_a),
                make_locals(n, **cfg_b))

    def sample_fn(n):
        bl, bla, blb = mk(n)
        wi = _wi(theta, n)
        u = rng.uniform4(zlib.crc32(name.encode()) % 1000, jnp.arange(n, dtype=jnp.int32), 0, 0)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=types,
                      nested=(bla, blb, ntypes))
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.where(np.asarray(ok)[:, None], np.asarray(bs.wo), 0.0)

    def pdf_fn(d):
        n = d.shape[0]
        bl, bla, blb = mk(n)
        wi = _wi(theta, n)
        return B.pdf(bl, wi, d, active_types=types, nested=(bla, blb, ntypes))

    ok, pval, stat, dof, info = chi2_test(
        sample_fn, pdf_fn, n_samples=N, significance=0.0005
    )
    assert ok, f"{name}: {info}"


def test_nested_weight_consistency():
    """f/pdf must equal the sample weight for every nested smooth sample."""
    n = 100_000
    for outer, ntypes in [
        (dict(type=B.MIXTURE, blend_w=0.3), (B.DIFFUSE, B.ROUGH_CONDUCTOR)),
        (dict(type=B.COATING, eta=(1.5,) * 3, k=(0.05,) * 3), (B.DIFFUSE,)),
        (dict(type=B.MASK, opacity=0.6), (B.DIFFUSE,)),
    ]:
        bl = make_locals(n, **outer)
        bla = make_locals(n, **NESTED_A)
        blb = make_locals(n, **NESTED_B)
        nst = (bla, blb, ntypes)
        wi = _wi(25.0, n)
        types = (outer["type"],)
        u = rng.uniform4(3, jnp.arange(n, dtype=jnp.int32), 0, 0)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=types,
                      nested=nst)
        f = np.asarray(B.eval(bl, wi, bs.wo, active_types=types, nested=nst))
        p = np.asarray(B.pdf(bl, wi, bs.wo, active_types=types, nested=nst))
        sm = np.asarray(~bs.is_delta & (bs.pdf > 1e-6))
        ratio = f / np.maximum(p, 1e-12)[:, None]
        err = np.abs(ratio - np.asarray(bs.weight))[sm]
        assert err.max() < 1e-3, (outer["type"], err.max())


def test_roughcoating_chi2():
    """sample()-vs-pdf() agreement for the rough varnish kernel
    (roughcoating.cpp + rtrans.h tables)."""
    outer = dict(type=B.ROUGHCOATING, eta=(1.5,) * 3, alpha=(0.25, 0.25),
                 k=(0.02,) * 3)
    types = (B.ROUGHCOATING,)
    ntypes = (B.DIFFUSE,)

    def mk(n):
        return (make_locals(n, **outer), make_locals(n, type=B.DIFFUSE),
                make_locals(n, type=B.DIFFUSE))

    def sample_fn(n):
        bl, bla, blb = mk(n)
        wi = _wi(35.0, n)
        u = rng.uniform4(77, jnp.arange(n, dtype=jnp.int32), 0, 0)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=types,
                      nested=(bla, blb, ntypes))
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.where(np.asarray(ok)[:, None], np.asarray(bs.wo), 0.0)

    def pdf_fn(d):
        n = d.shape[0]
        bl, bla, blb = mk(n)
        wi = _wi(35.0, n)
        return B.pdf(bl, wi, d, active_types=types, nested=(bla, blb, ntypes))

    ok, pval, stat, dof, info = chi2_test(
        sample_fn, pdf_fn, n_samples=N, significance=0.0005
    )
    assert ok, f"roughcoating: {info}"


def test_roughcoating_smooth_limit():
    """alpha -> 0 roughcoating must converge to the smooth coating kernel
    (same nested diffuse, same eta/absorption)."""
    n = 200_000
    wi = _wi(30.0, n)
    u = rng.uniform4(3, jnp.arange(n, dtype=jnp.int32), 0, 0)
    bla = make_locals(n, type=B.DIFFUSE)
    blb = make_locals(n, type=B.DIFFUSE)
    vals = {}
    for label, t, a in (("smooth", B.COATING, 0.3),
                        ("rough", B.ROUGHCOATING, 1e-3)):
        bl = make_locals(n, type=t, eta=(1.5,) * 3, alpha=(a, a),
                         k=(0.05,) * 3)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3], active_types=(t,),
                      nested=(bla, blb, (B.DIFFUSE,)))
        # mean reflected energy (weight) over all samples = directional
        # albedo estimate
        vals[label] = float(np.asarray(bs.weight).mean())
    assert abs(vals["rough"] - vals["smooth"]) / vals["smooth"] < 0.05, vals


def test_roughplastic_rtrans_energy():
    """roughplastic with the rtrans diffuse term stays energy-conserving
    and brightens at grazing vs the smooth-Fresnel approximation (rough
    interfaces transmit MORE at grazing angles)."""
    n = 200_000
    u = rng.uniform4(5, jnp.arange(n, dtype=jnp.int32), 0, 0)
    bl = make_locals(n, type=B.ROUGH_PLASTIC, alpha=(0.3, 0.3),
                     albedo=(1.0, 1.0, 1.0), eta=(1.49,) * 3,
                     nonlinear=False)
    for theta in (10.0, 70.0):
        wi = _wi(theta, n)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3],
                      active_types=(B.ROUGH_PLASTIC,))
        alb = float(np.asarray(bs.weight).mean())
        assert alb <= 1.05, (theta, alb)  # white furnace bound
        assert alb > 0.3, (theta, alb)
