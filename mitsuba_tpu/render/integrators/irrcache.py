"""Irradiance caching (reference: src/integrators/misc/irrcache.cpp +
librender/irrcache.cpp, Ward-style cache in an octree).

TPU-first redesign: the reference populates a dynamic octree of cache
records on demand during rendering and interpolates with Ward weights.
On-demand insertion is hostile to SPMD, so the cache is built UP FRONT as
a fixed-size point cloud (camera-visible surface points + hemispherical
irradiance estimates, one jitted batch), and interpolation is a dense
lanes-x-records Ward-weighted reduction — same estimator, bounded shapes.

Pipeline: ``build_cache`` traces a low-res camera grid to place records
and estimates E with N_h cosine-hemisphere samples of direct light per
record; ``li`` renders exact direct lighting (NEE+MIS like ``direct``)
plus albedo/pi * E_interp for the diffuse indirect term.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from ...core import warp
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import scene as scene_mod
from .common import IntegratorConfig, mis_power, ray_offset
from . import direct as int_direct


class IrrCache(NamedTuple):
    p: jnp.ndarray      # (C, 3) record positions
    n: jnp.ndarray      # (C, 3) normals
    E: jnp.ndarray      # (C, 3) irradiance
    r: jnp.ndarray      # (C,) harmonic-mean distance (validity radius)
    valid: jnp.ndarray  # (C,) bool


def build_cache(scene, static, sensor, grid: int = 32,
                n_hemi: int = 64, seed: int = 13) -> IrrCache:
    """Place records on camera-visible surfaces (a grid of primary rays —
    the screen-space analog of the reference's on-demand placement) and
    estimate E + the harmonic mean hit distance per record."""
    from .. import sensor as sensor_mod

    C = grid * grid
    ij = jnp.arange(C, dtype=jnp.int32)
    uv = jnp.stack([((ij % grid) + 0.5) / grid,
                    ((ij // grid) + 0.5) / grid], axis=-1)
    o, d = sensor_mod.sample_ray(sensor, uv, jnp.full((C, 2), 0.5))
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)

    E = jnp.zeros((C, 3))
    inv_dist = jnp.zeros(C)
    nrm = its.sh_frame.n
    for k in range(n_hemi):
        # disjoint streams: dim 0 drives the hemisphere direction, dim 1 the
        # emitter NEE draw (sharing a component correlated gather direction
        # with light selection and biased E — round-1 advisor finding)
        u_dir = rng_mod.uniform2(jnp.asarray(seed, jnp.int32), ij, k, 0)
        u = rng_mod.uniform4(jnp.asarray(seed, jnp.int32), ij, k, 1)
        d_loc = warp.square_to_cosine_hemisphere(u_dir)
        d_w = its.sh_frame.to_world(d_loc)
        o_h = ray_offset(its.p, its.gn, d_w)
        h2 = scene_mod.ray_intersect(scene, static, o_h, d_w, 1e-4, jnp.inf,
                                     active=its.valid)
        # one-bounce INDIRECT incoming radiance: reflected direct light at
        # the gather hit. Emission is excluded — the outer direct
        # integrator already accounts for it (no double counting).
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
            Li = Li + jnp.where((ok & vis)[..., None],
                                f * ds.radiance
                                / jnp.maximum(ds.pdf_sa, 1e-12)[..., None],
                                0.0)
        # cosine-weighted estimator: E += pi * mean(Li)
        E = E + jnp.where(h2.valid[..., None], Li, 0.0)
        inv_dist = inv_dist + jnp.where(
            h2.valid, 1.0 / jnp.maximum(h2.t, 1e-4), 0.0)
    E = E * (jnp.pi / n_hemi)
    r_harm = m.safe_div(jnp.asarray(float(n_hemi)), inv_dist)
    return IrrCache(p=its.p, n=nrm, E=E,
                    r=jnp.clip(r_harm, 1e-3, 1e3), valid=its.valid)


def interpolate(cache: IrrCache, p, n):
    """Ward weights w_i = 1 / (|x-x_i|/R_i + sqrt(1 - n.n_i))
    (irrcache.h's error metric), dense over all records."""
    d = p[:, None, :] - cache.p[None, :, :]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ndot = jnp.clip(jnp.sum(n[:, None, :] * cache.n[None, :, :], -1), -1, 1)
    err = dist / cache.r[None, :] + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0))
    w = m.safe_div(1.0, err)
    w = jnp.where(cache.valid[None, :] & (ndot > 0.1), w, 0.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    E = jnp.einsum("rc,cx->rx", w, cache.E)
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
