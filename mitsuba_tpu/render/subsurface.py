"""Subsurface scattering (reference: src/subsurface/dipole.cpp +
irrproc.cpp/irrtree.cpp, singlescatter.cpp).

TPU-first redesign of the dipole pipeline: the reference distributes
blue-noise irradiance samples over the surface and sums Rd-weighted
contributions through an octree (irrtree.cpp). Here the irradiance point
cloud is a flat device array and the gather at shading time is one dense
(R lanes x N points) reduction — batched, branch-free, and MXU-friendly;
no hierarchy needed at the N used in practice (hundreds to a few
thousand points).

Pipeline:
1. ``SceneBuilder.add_subsurface(...)`` registers dipole parameters and
   materials reference them (``add_material(subsurface=id)``).
2. ``prepare(scene, static, ...)`` samples area-weighted surface points on
   subsurface geometry and computes their irradiance with NEE (the
   IrradianceSamplingProcess analog, executed as one jitted batch).
3. The path/direct integrators add ``eval_lo`` — the classical Jensen
   dipole diffusion approximation Rd plus a Fresnel transmittance factor —
   at every hit on a subsurface material (Subsurface::Lo usage in
   MonteCarloIntegrator, integrator.h).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core import rng as rng_mod


MODE_DIPOLE = 0         # dipole.cpp diffusion profile
MODE_SINGLESCATTER = 1  # singlescatter.cpp refracted single scattering


class SSSTable(NamedTuple):
    mat_sss: jnp.ndarray     # (M,) int32 per-material subsurface id (-1)
    sigma_s: jnp.ndarray     # (S, 3)
    sigma_a: jnp.ndarray     # (S, 3)
    g: jnp.ndarray           # (S,)
    eta: jnp.ndarray         # (S,)
    mode: jnp.ndarray        # (S,) int32 MODE_*
    points_p: jnp.ndarray    # (N, 3) irradiance sample positions
    points_n: jnp.ndarray    # (N, 3) surface normals at the samples
    points_E: jnp.ndarray    # (N, 3) irradiance estimates
    points_sss: jnp.ndarray  # (N,) int32 owning subsurface id
    point_area: jnp.ndarray  # (N,) area weight dA per sample

    @staticmethod
    def empty(n_mats: int = 1) -> "SSSTable":
        return SSSTable(
            mat_sss=jnp.full((max(n_mats, 1),), -1, jnp.int32),
            sigma_s=jnp.ones((1, 3)),
            sigma_a=jnp.ones((1, 3)) * 0.1,
            g=jnp.zeros((1,)),
            eta=jnp.full((1,), 1.3),
            mode=jnp.zeros((1,), jnp.int32),
            points_p=jnp.zeros((1, 3)),
            points_n=jnp.asarray([[0.0, 0.0, 1.0]]),
            points_E=jnp.zeros((1, 3)),
            points_sss=jnp.full((1,), -1, jnp.int32),
            point_area=jnp.zeros((1,)),
        )


def dipole_rd(r2, sigma_s, sigma_a, g, eta):
    """Classical dipole diffuse reflectance Rd(r) (Jensen et al. 2001;
    dipole.cpp's profile). r2: (..., 1) squared radius; sigma_*: (..., 3)."""
    sigma_sp = sigma_s * (1.0 - g)
    sigma_tp = sigma_sp + sigma_a
    alpha_p = m.safe_div(sigma_sp, sigma_tp)
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigma_tp)
    fdr = m.fresnel_diffuse_reflectance(eta)
    A = (1.0 + fdr) / jnp.maximum(1.0 - fdr, 1e-6)
    zr = m.safe_div(1.0, sigma_tp)
    zv = zr * (1.0 + 4.0 / 3.0 * A)
    dr = jnp.sqrt(r2 + zr * zr)
    dv = jnp.sqrt(r2 + zv * zv)
    c1 = zr * (sigma_tr * dr + 1.0) * jnp.exp(-sigma_tr * dr) / (dr ** 3)
    c2 = zv * (sigma_tr * dv + 1.0) * jnp.exp(-sigma_tr * dv) / (dv ** 3)
    return alpha_p / (4.0 * jnp.pi) * (c1 + c2)


def prepare(scene, static, n_points: int = 512, nee_samples: int = 16,
            seed: int = 7):
    """Sample the irradiance point cloud and fill scene.sss
    (IrradianceSamplingProcess, subsurface/irrproc.cpp — blue-noise
    placement replaced by area-weighted uniform sampling + a deterministic
    counter-based RNG)."""
    from . import emitter as em_mod
    from . import scene as scene_mod

    sss = scene.sss
    mat_sss = np.asarray(sss.mat_sss)
    tri_mat = np.asarray(scene.tri_mat)
    has = mat_sss[np.maximum(tri_mat, 0)] >= 0
    if not has.any():
        return scene
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1) * has
    total = area.sum()
    pmf = area / total
    rng = np.random.default_rng(seed)
    tri = rng.choice(len(pmf), size=n_points, p=pmf)
    b1 = rng.random(n_points)
    b2 = rng.random(n_points)
    flip = b1 + b2 > 1.0
    b1 = np.where(flip, 1.0 - b1, b1)
    b2 = np.where(flip, 1.0 - b2, b2)
    p0 = np.asarray(scene.tri_p0)
    pts = p0[tri] + b1[:, None] * e1[tri] + b2[:, None] * e2[tri]
    nrm = np.asarray(scene.tri_gn)[tri]
    sid = mat_sss[np.maximum(tri_mat[tri], 0)]

    # device pass: E(p) = mean over NEE samples of radiance * cos / pdf
    P = jnp.asarray(pts, jnp.float32)
    Nn = jnp.asarray(nrm, jnp.float32)
    E = jnp.zeros((n_points, 3))
    pix = jnp.arange(n_points, dtype=jnp.int32)
    for k in range(nee_samples):
        u = rng_mod.uniform4(jnp.asarray(seed, jnp.int32), pix, k, 0)
        ds = em_mod.sample_direct(scene, static, P, u[..., :3])
        cos_i = jnp.maximum(m.dot(ds.d, Nn), 0.0)
        ok = ds.valid & (ds.pdf_sa > 0) & (cos_i > 0)
        from .integrators.common import ray_offset
        o_sh = ray_offset(P, Nn, ds.d)
        vis = ~scene_mod.occluded(scene, static, o_sh, ds.d, 0.0,
                                  ds.dist * (1.0 - 1e-3), active=ok)
        contrib = ds.radiance * m.safe_div(cos_i, ds.pdf_sa)[..., None]
        E = E + jnp.where((ok & vis)[..., None], contrib, 0.0)
    E = E / nee_samples

    new = sss._replace(
        points_p=P, points_n=Nn, points_E=E,
        points_sss=jnp.asarray(sid, jnp.int32),
        point_area=jnp.asarray(
            np.full(n_points, total / n_points), jnp.float32),
    )
    return scene._replace(sss=new)


def eval_lo(scene, its, d_world):
    """Subsurface outgoing radiance at hits (dipole.cpp Lo):
    Lo = Ft(wo) / pi * sum_j Rd(|xo - x_j|) * E_j * dA_j.
    Returns (R, 3); zero on lanes whose material has no subsurface."""
    sss = scene.sss
    mid = jnp.maximum(its.mat_id, 0)
    sid = sss.mat_sss[mid]
    sidc = jnp.maximum(sid, 0)
    lane = (sid >= 0) & (sss.mode[sidc] == MODE_DIPOLE)

    # (R, N) squared distances -> Rd reduction
    diff = its.p[:, None, :] - sss.points_p[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)[..., None]             # (R, N, 1)
    rd = dipole_rd(
        r2, sss.sigma_s[sidc][:, None, :], sss.sigma_a[sidc][:, None, :],
        sss.g[sidc][:, None, None], sss.eta[sidc][:, None, None])
    same = (sss.points_sss[None, :] == sid[:, None])[..., None]
    acc = jnp.sum(jnp.where(same, rd, 0.0)
                  * sss.points_E[None] * sss.point_area[None, :, None],
                  axis=1)                                      # (R, 3)

    cos_o = jnp.abs(m.dot(-d_world, its.sh_frame.n))
    ft = 1.0 - m.fresnel_dielectric(cos_o, sss.eta[sidc])[0]
    lo = ft[..., None] * acc / jnp.pi
    return jnp.where(lane[..., None], lo, 0.0)


def _hg(cos_theta, g):
    """Henyey-Greenstein phase value p(cos) (normalized over the sphere)."""
    den = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * jnp.maximum(den, 1e-8) ** 1.5)


def exact_single_scatter(scene, static, its, d, seed, pixel, sample, dim,
                         active):
    """Refracted single scattering (src/subsurface/singlescatter.cpp fast
    mode, LoSingle ~1404-1487): refract the camera ray into the medium,
    importance-sample one interior scattering vertex V along the refracted
    chord (truncated exponential), connect V straight to a sampled light
    point through the boundary exit P found by a real scene trace, and
    weight by Walter et al. 2009's refracted-connection factor
    D = (dV + eta dL)(|cosL/cosV| dV + |cosV/cosL| eta dL), HG phase,
    Beer-Lambert attenuation over (s + dV), and both Fresnel
    transmittances (the eta^2 radiance scaling of the entering ray
    included, singlescatter.cpp:1406). One estimator sample per bounce;
    the TIR recursion of the reference is not followed (documented).

    RNG: consumes one uniform4 at ``dim`` (distance + light sample).
    Returns (R, 3), zero off singlescatter lanes.
    """
    from . import emitter as em_mod
    from . import scene as scene_mod
    from .integrators.common import ray_offset

    sss = scene.sss
    mid = jnp.maximum(its.mat_id, 0)
    sid = sss.mat_sss[mid]
    sidc = jnp.maximum(sid, 0)
    lane = active & (sid >= 0) & (sss.mode[sidc] == MODE_SINGLESCATTER)
    eta = sss.eta[sidc]
    sig_s = sss.sigma_s[sidc]
    sig_t = sig_s + sss.sigma_a[sidc]
    g = sss.g[sidc]
    sig_lum = jnp.maximum(jnp.mean(sig_t, axis=-1), 1e-6)
    radius = 1.0 / sig_lum                     # m_radius: mean free path

    # entry refraction of the eye ray (d points toward the surface); only
    # hits arriving from OUTSIDE start a subsurface chord (the reference
    # evaluates Lo at the entry interface)
    wi = -d
    n = its.sh_frame.n
    outside = m.dot(wi, its.gn) > 0.0
    lane = lane & outside
    n_or = jnp.where(m.dot(wi, n)[..., None] > 0, n, -n)
    cos_i = m.dot(wi, n_or)
    F_in, _ = m.fresnel_dielectric(cos_i, eta)
    ok_r, d_int = m.refract(wi, n_or, eta)
    lane = lane & ok_r

    # interior chord thickness by a real trace (the reference's its2)
    o_in = ray_offset(its.p, -n_or, d_int)
    its2 = scene_mod.ray_intersect(scene, static, o_in, d_int, 1e-4,
                                   jnp.inf, active=lane)
    lane = lane & its2.valid
    thickness = jnp.where(its2.valid, its2.t, 10.0 * radius)

    u = rng_mod.uniform4(seed, pixel, sample, dim)

    # light sample at the ENTRY point (dRec(its.p), singlescatter.cpp:1404)
    ds = em_mod.sample_direct(scene, static, its.p, u[..., 1:4])
    lane = lane & ds.valid & (ds.pdf_sa > 1e-12)
    value = (eta * eta)[..., None] * m.safe_div(
        ds.radiance, ds.pdf_sa[..., None])
    Lp = its.p + ds.d * ds.dist[..., None]

    # truncated-exponential distance along the refracted ray
    sMax = 1.0 - jnp.exp(-thickness / radius)
    dist = -radius * jnp.log(jnp.maximum(1.0 - u[..., 0] * sMax, 1e-20))
    dist = jnp.minimum(dist, thickness)
    V = o_in + dist[..., None] * d_int
    w_dist = radius * sMax * jnp.exp(dist / radius)   # 1/pdf(dist)

    # straight connection V -> light; boundary exit by a real trace
    VL = Lp - V
    dVL = jnp.maximum(m.length(VL), 1e-9)
    dir_VL = VL / dVL[..., None]
    its3 = scene_mod.ray_intersect(scene, static, V, dir_VL, 1e-4, jnp.inf,
                                   active=lane)
    dV = its3.t
    lane = lane & its3.valid & (dV < dVL)
    dL = jnp.maximum(dVL - dV, 1e-9)
    P = its3.p
    n3 = its3.sh_frame.n
    cosL = m.dot(dir_VL, n3)
    cosV = -cosL  # straight connection: same line through the boundary
    lane = lane & (jnp.abs(cosL) > 1e-6)

    # shadow segment P -> light
    o_sh = ray_offset(P, jnp.where(cosL[..., None] > 0, n3, -n3), dir_VL)
    vis = ~scene_mod.occluded(scene, static, o_sh, dir_VL, 0.0,
                              dL * (1.0 - 1e-3), active=lane)
    lane = lane & vis

    F_out, _ = m.fresnel_dielectric(jnp.abs(cosL), eta)
    D = (dV + eta * dL) * (
        jnp.abs(m.safe_div(cosL, cosV)) * dV
        + jnp.abs(m.safe_div(cosV, cosL)) * eta * dL)
    phase = _hg(m.dot(d_int, dir_VL), g)
    tr = jnp.exp(-sig_t * (dist + dV)[..., None])

    lo = (sig_s * tr * value
          * ((1.0 - F_in) * (1.0 - F_out)
             * m.safe_div(jnp.ones_like(D), D)
             * phase * (ds.dist ** 2) * w_dist)[..., None])
    return jnp.where(lane[..., None], lo, 0.0)
