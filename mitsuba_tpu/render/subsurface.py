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


class SSSTable(NamedTuple):
    mat_sss: jnp.ndarray     # (M,) int32 per-material subsurface id (-1)
    sigma_s: jnp.ndarray     # (S, 3)
    sigma_a: jnp.ndarray     # (S, 3)
    g: jnp.ndarray           # (S,)
    eta: jnp.ndarray         # (S,)
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
    lane = sid >= 0
    sidc = jnp.maximum(sid, 0)

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


def single_scatter_lo(scene, its, d_world, nee_radiance, nee_dir, nee_cos):
    """First-order single scattering along the refracted ray
    (singlescatter.cpp reduced to its dominant term): the integrator's NEE
    sample attenuated by one interior scattering event.

    Lo_1 ~ sigma_s * phase_iso * Ft_in * Ft_out * E_nee / sigma_t
    (closed-form expected value of exp(-sigma_t s) * sigma_s ds along the
    unrefracted chord; the reference marches the true refracted ray)."""
    sss = scene.sss
    mid = jnp.maximum(its.mat_id, 0)
    sid = sss.mat_sss[mid]
    lane = sid >= 0
    sidc = jnp.maximum(sid, 0)
    sigma_t = sss.sigma_s[sidc] + sss.sigma_a[sidc]
    w = m.safe_div(sss.sigma_s[sidc], sigma_t) * (1.0 / (4.0 * jnp.pi))
    cos_o = jnp.abs(m.dot(-d_world, its.sh_frame.n))
    ft_o = 1.0 - m.fresnel_dielectric(cos_o, sss.eta[sidc])[0]
    ft_i = 1.0 - m.fresnel_dielectric(jnp.maximum(nee_cos, 0.0),
                                      sss.eta[sidc])[0]
    lo = w * (ft_o * ft_i)[..., None] * nee_radiance
    return jnp.where(lane[..., None], lo, 0.0)
