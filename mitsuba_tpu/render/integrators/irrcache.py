"""Irradiance caching (reference: src/integrators/misc/irrcache.cpp +
librender/irrcache.cpp — Ward-style cache with rotational/translational
gradients in the Krivanek-Gautron notation, Krivanek-style neighbor
clamping, octree lookup).

TPU-first redesign: the reference populates a dynamic octree of cache
records on demand during rendering and interpolates with Ward weights.
On-demand insertion is hostile to SPMD, so the cache is built UP FRONT as
a fixed-size point cloud (camera-visible surface points + hemispherical
irradiance estimates, one jitted batch), and interpolation is a dense
lanes-x-records Ward-weighted reduction — same estimator, bounded shapes
(the octree's lookup role; dense is faster than a tree at the record
counts used here). All three gradient-era refinements of the reference
are kept:

* stratified (M x N) hemisphere cells with ROTATIONAL and TRANSLATIONAL
  irradiance gradients (irrcache.cpp:60-146, HemisphereSampler::process);
  interpolation extrapolates E_i + (n_i x n).rGrad + (x - x_i).tGrad
  (irr_interp_functor, irrcache.cpp:196-208);
* R0 limited by the gradient magnitude E/|tGrad| (irrcache.cpp:306-311,
  Krivanek et al.);
* neighbor clamping R0_i <= min_j(R0_j + |x_i - x_j|) as one dense pass
  (the two searchSphere functors, irrcache.cpp:146-180, collapsed into
  their fixed point).

Documented deviation: the translational-gradient accumulation includes the
j == 1 ring (``j >= 1``), following the published Krivanek-Gautron formula;
the reference's HemisphereSampler::process skips that ring (``if (j > 1)``),
so tGrad does not bit-match the reference — the j==1 term is a legitimate
part of the published estimator and is kept deliberately.
"""
from __future__ import annotations

import math as pymath
from typing import NamedTuple

import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import emitter as em_mod
from .. import scene as scene_mod
from .common import IntegratorConfig, ray_offset
from . import direct as int_direct


class IrrCache(NamedTuple):
    p: jnp.ndarray      # (C, 3) record positions
    n: jnp.ndarray      # (C, 3) normals
    E: jnp.ndarray      # (C, 3) irradiance
    r: jnp.ndarray      # (C,) validity radius (clamped harmonic mean)
    valid: jnp.ndarray  # (C,) bool
    rgrad: jnp.ndarray  # (C, 3, 3) rotational gradient [axis, channel]
    tgrad: jnp.ndarray  # (C, 3, 3) translational gradient [axis, channel]


def build_cache(scene, static, sensor, grid: int = 32,
                n_hemi: int = 64, seed: int = 13) -> IrrCache:
    """Place records on camera-visible surfaces (a grid of primary rays —
    the screen-space analog of the reference's on-demand placement) and
    run the stratified HemisphereSampler over M x N cells, accumulating E,
    the harmonic-mean distance, and both gradients."""
    from .. import sensor as sensor_mod

    M = max(int(pymath.sqrt(n_hemi)), 2)
    N = max(n_hemi // M, 2)

    C = grid * grid
    ij = jnp.arange(C, dtype=jnp.int32)
    uv = jnp.stack([((ij % grid) + 0.5) / grid,
                    ((ij // grid) + 0.5) / grid], axis=-1)
    o, d = sensor_mod.sample_ray(sensor, uv, jnp.full((C, 2), 0.5))
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    nrm = its.sh_frame.n

    # Krivanek-Gautron plane vectors per azimuthal cell (world space)
    vk_w, vkm_w, uk_w = [], [], []
    for k in range(N):
        phi = 2.0 * pymath.pi * (k + 0.5) / N
        vk = phi - pymath.pi / 2.0
        vkm = 2.0 * pymath.pi * k / N + pymath.pi / 2.0
        loc = lambda a: its.sh_frame.to_world(
            jnp.broadcast_to(
                jnp.asarray([pymath.cos(a), pymath.sin(a), 0.0]), (C, 3)))
        vk_w.append(loc(vk))
        vkm_w.append(loc(vkm))
        uk_w.append(loc(phi))

    E = jnp.zeros((C, 3))
    rgrad = jnp.zeros((C, 3, 3))
    tgrad = jnp.zeros((C, 3, 3))
    inv_dist = jnp.zeros(C)
    h_min = jnp.full(C, jnp.inf)
    prev_row_L = None
    prev_row_d = None

    for j in range(M):
        cos_tm = pymath.sqrt(1.0 - j / M)            # cos(theta_j-)
        sin_tm = pymath.sqrt(j / M)
        cos_t = pymath.sqrt(1.0 - (j + 0.5) / M)
        sin_t = pymath.sqrt((j + 0.5) / M)
        cos_tp = pymath.sqrt(1.0 - (j + 1.0) / M)
        cos_diff = cos_tm - cos_tp
        tan_t = sin_t / cos_t

        row_L = []
        row_d = []
        for k in range(N):
            cell = j * N + k
            # disjoint streams: dim 0 jitters the cell direction, dim 1
            # drives the NEE draw (sharing components correlates gather
            # direction with light selection — round-1 advisor finding)
            u_dir = rng_mod.uniform2(jnp.asarray(seed, jnp.int32), ij,
                                     cell, 0)
            u = rng_mod.uniform4(jnp.asarray(seed, jnp.int32), ij, cell, 1)
            # jittered direction inside cell (j, k) of the cosine-weighted
            # (theta, phi) stratification (irrcache.cpp:89-96)
            ct = jnp.sqrt(1.0 - (j + u_dir[..., 0]) / M)
            st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
            ph = 2.0 * jnp.pi * (k + u_dir[..., 1]) / N
            d_loc = jnp.stack(
                [st * jnp.cos(ph), st * jnp.sin(ph), ct], axis=-1)
            d_w = its.sh_frame.to_world(d_loc)
            o_h = ray_offset(its.p, its.gn, d_w)
            h2 = scene_mod.ray_intersect(scene, static, o_h, d_w, 1e-4,
                                         jnp.inf, active=its.valid)
            # one-bounce INDIRECT incoming radiance: reflected direct
            # light at the gather hit; emission excluded (the outer exact
            # direct pass already covers it — no double counting)
            Li = jnp.zeros((C, 3))
            if static.emitter_types:
                ds = em_mod.sample_direct(scene, static, h2.p, u[..., 1:4])
                ok = h2.valid & ds.valid & (ds.pdf_sa > 0)
                o_sh = ray_offset(h2.p, h2.gn, ds.d)
                vis = ~scene_mod.occluded(scene, static, o_sh, ds.d, 0.0,
                                          ds.dist * (1.0 - 1e-3), active=ok)
                alb = scene_mod.eval_albedo(scene, h2, static)
                cos_h = jnp.maximum(m.dot(ds.d, h2.sh_frame.n), 0.0)
                f = alb / jnp.pi * cos_h[..., None]
                Li = jnp.where(
                    (ok & vis)[..., None],
                    f * ds.radiance
                    / jnp.maximum(ds.pdf_sa, 1e-12)[..., None], 0.0)
            dist = jnp.where(h2.valid, h2.t, jnp.inf)
            row_L.append(Li)
            row_d.append(dist)

            E = E + Li
            # rotational gradient (irrcache.cpp:100-102)
            rgrad = rgrad - tan_t * vk_w[k][:, :, None] * Li[:, None, :]
            inv_dist = inv_dist + jnp.where(
                jnp.isfinite(dist), 1.0 / jnp.maximum(dist, 1e-4), 0.0)
            h_min = jnp.minimum(h_min, dist)

            # translational gradient, u_k direction (needs row j-1)
            if j >= 1:
                oL = prev_row_L[k]
                od = prev_row_d[k]
                mind = jnp.minimum(dist, od)
                factor = jnp.where(
                    jnp.isfinite(mind),
                    (2.0 * jnp.pi * cos_tm * cos_tm * sin_tm)
                    / (N * jnp.maximum(mind, 1e-4)), 0.0)
                tgrad = tgrad + (factor[:, None] * uk_w[k])[:, :, None] \
                    * (Li - oL)[:, None, :]

        # translational gradient, v_k direction (needs cell k-1 with
        # wraparound, so done once the row is complete)
        for k in range(N):
            kp = (k - 1) % N
            mind = jnp.minimum(row_d[k], row_d[kp])
            factor = jnp.where(
                jnp.isfinite(mind),
                cos_t * cos_diff / (jnp.maximum(mind, 1e-4) * sin_t), 0.0)
            tgrad = tgrad + (factor[:, None] * vkm_w[k])[:, :, None] \
                * (row_L[k] - row_L[kp])[:, None, :]

        prev_row_L = row_L
        prev_row_d = row_d

    scale = jnp.pi / (M * N)
    E = E * scale
    rgrad = rgrad * scale
    r_harm = m.safe_div(jnp.asarray(float(M * N)), inv_dist)
    r0 = jnp.clip(r_harm, 1e-3, 1e3)

    # R0 limited by the gradient magnitude (irrcache.cpp:306-311)
    gmag = jnp.sqrt(jnp.sum(tgrad * tgrad, axis=1))        # (C, 3) per ch
    ratio = jnp.where(gmag > 1e-9, m.safe_div(E, gmag), jnp.inf)
    r0 = jnp.minimum(r0, jnp.min(ratio, axis=-1))

    # neighbor clamping as one dense pass: R0_i = min_j (R0_j + |xi - xj|)
    dd = jnp.sqrt(jnp.sum(
        (its.p[:, None, :] - its.p[None, :, :]) ** 2, axis=-1))
    r0 = jnp.min(jnp.where(its.valid[None, :], r0[None, :] + dd, jnp.inf),
                 axis=-1)
    r0 = jnp.clip(r0, 1e-3, 1e3)

    return IrrCache(p=its.p, n=nrm, E=E, r=r0, valid=its.valid,
                    rgrad=rgrad, tgrad=tgrad)


def interpolate(cache: IrrCache, p, n):
    """Ward weights w_i = 1 / (|x-x_i|/R_i + sqrt(1 - n.n_i))
    (irrcache.h's error metric), dense over all records, with
    gradient-extrapolated record values (irr_interp_functor)."""
    d = p[:, None, :] - cache.p[None, :, :]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ndot = jnp.clip(jnp.sum(n[:, None, :] * cache.n[None, :, :], -1), -1, 1)
    err = dist / cache.r[None, :] + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0))
    w = m.safe_div(1.0, err)
    w = jnp.where(cache.valid[None, :] & (ndot > 0.1), w, 0.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    # E_i + (n_i x n) . rGrad_i + (x - x_i) . tGrad_i, clamped at 0
    crossn = jnp.cross(
        jnp.broadcast_to(cache.n[None, :, :], d.shape),
        jnp.broadcast_to(n[:, None, :], d.shape))
    ext = (cache.E[None]
           + jnp.einsum("rcx,cxk->rck", crossn, cache.rgrad)
           + jnp.einsum("rcx,cxk->rck", d, cache.tgrad))
    ext = jnp.maximum(ext, 0.0)
    E = jnp.sum(w[..., None] * ext, axis=1)
    return m.safe_div(E, wsum)


def li(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample,
       cache: IrrCache = None):
    """Exact direct illumination + cached diffuse indirect
    (irrcache.cpp's role wrapping a nested direct integrator)."""
    L = int_direct.li(scene, static, cfg, o, d, seed, pixel, sample)
    if cache is None:
        return L
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    E = interpolate(cache, its.p, its.sh_frame.n)
    alb = scene_mod.eval_albedo(scene, its, static)
    ind = alb / jnp.pi * E
    return L + jnp.where(its.valid[..., None], ind, 0.0)
