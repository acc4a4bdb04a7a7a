"""Participating media (reference: src/medium/{homogeneous,heterogeneous}.cpp,
medium.h:120-158; volume sources src/volume/gridvolume.cpp).

* homogeneous: closed-form Beer-Lambert; distance sampling with per-channel
  balance-heuristic mixture (homogeneous.cpp's strategy set collapsed to the
  robust default).
* heterogeneous: trilinear density grid with delta (Woodcock) tracking for
  free-flight sampling and ratio tracking for transmittance
  (heterogeneous.cpp:104+), expressed as bounded lax.while_loops over the
  whole lane batch.

A lane's "current medium" is an int32 id (-1 = vacuum); materials carry
interior-medium ids so crossing a transmissive boundary swaps the id
(the shape interior/exterior medium references of the reference).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import rng as rng_mod

HOMOGENEOUS = 0
HETEROGENEOUS = 1


class MediumTable(NamedTuple):
    type: jnp.ndarray        # (K,) int32
    sigma_t: jnp.ndarray     # (K, 3) extinction
    albedo: jnp.ndarray      # (K, 3) single-scattering albedo (sigma_s/sigma_t)
    phase_type: jnp.ndarray  # (K,) int32
    phase_g: jnp.ndarray     # (K,)
    phase_g2: jnp.ndarray    # (K,) mixturephase second HG lobe
    phase_w2: jnp.ndarray    # (K,) mixturephase weight of lobe 2
    phase_ks: jnp.ndarray    # (K,) kkay specular weight
    phase_exp: jnp.ndarray   # (K,) kkay specular exponent
    phase_sigma: jnp.ndarray  # (K,) microflake flake std dev
    phase_axis: jnp.ndarray  # (K, 3) fiber tangent (kkay/microflake)
    scale: jnp.ndarray       # (K,) density scale
    # heterogeneous payload: one padded grid stack
    grid_idx: jnp.ndarray    # (K,) int32 into stack, -1 for homogeneous
    grids: jnp.ndarray       # (G, D, H, W) densities in [0, 1] * scale
    grid_size: jnp.ndarray   # (G, 3) int32 (D, H, W)
    world_to_grid: jnp.ndarray  # (G, 4, 4)
    majorant: jnp.ndarray    # (K,) max sigma_t (delta-tracking bound)
    # hierarchical majorants (src/volume/hgridvolume.cpp:216 role): per
    # supercell max *raw density* over the cell dilated by one voxel (the
    # dilation covers both trilinear support and boundary-epsilon steps),
    # so tracking in sparse media leaps empty space in one DDA step
    super_maj: jnp.ndarray   # (G, S, S, S) float32, S = SUPER_RES

    @staticmethod
    def empty() -> "MediumTable":
        return MediumTable(
            type=jnp.zeros((1,), jnp.int32),
            sigma_t=jnp.ones((1, 3)),
            albedo=jnp.full((1, 3), 0.5),
            phase_type=jnp.zeros((1,), jnp.int32),
            phase_g=jnp.zeros((1,)),
            phase_g2=jnp.zeros((1,)),
            phase_w2=jnp.zeros((1,)),
            phase_ks=jnp.zeros((1,)),
            phase_exp=jnp.full((1,), 4.0),
            phase_sigma=jnp.full((1,), 0.3),
            phase_axis=jnp.asarray([[0.0, 0.0, 1.0]]),
            scale=jnp.ones((1,)),
            grid_idx=jnp.full((1,), -1, jnp.int32),
            grids=jnp.zeros((1, 1, 1, 1)),
            grid_size=jnp.ones((1, 3), jnp.int32),
            world_to_grid=jnp.eye(4)[None],
            majorant=jnp.ones((1,)),
            super_maj=jnp.ones((1, 1, 1, 1)),
        )


class MediumSample(NamedTuple):
    sampled: jnp.ndarray     # (R,) bool: scattering event before the surface
    t: jnp.ndarray           # (R,) sampled distance (or the surface distance)
    p: jnp.ndarray           # (R, 3) event position
    weight: jnp.ndarray      # (R, 3) throughput factor (T*sigma_s/pdf or T/pdf)


def _lookup_density(med: MediumTable, mid, p):
    """Trilinear grid density at world positions p for heterogeneous lanes."""
    gi = jnp.maximum(med.grid_idx[mid], 0)
    w2g = med.world_to_grid[gi]
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    gp = jnp.einsum("...ij,...j->...i", w2g, ph)[..., :3]
    size = med.grid_size[gi].astype(jnp.float32)
    # grid coords in voxel units
    x = gp[..., 0] * (size[..., 2] - 1)
    y = gp[..., 1] * (size[..., 1] - 1)
    z = gp[..., 2] * (size[..., 0] - 1)
    inside = (
        (gp[..., 0] >= 0) & (gp[..., 0] <= 1)
        & (gp[..., 1] >= 0) & (gp[..., 1] <= 1)
        & (gp[..., 2] >= 0) & (gp[..., 2] <= 1)
    )
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, med.grids.shape[3] - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, med.grids.shape[2] - 1)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, med.grids.shape[1] - 1)
    x1 = jnp.minimum(x0 + 1, med.grids.shape[3] - 1)
    y1 = jnp.minimum(y0 + 1, med.grids.shape[2] - 1)
    z1 = jnp.minimum(z0 + 1, med.grids.shape[1] - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fz = jnp.clip(z - z0, 0.0, 1.0)
    g = med.grids

    def at(zi, yi, xi):
        return g[gi, zi, yi, xi]

    c00 = at(z0, y0, x0) * (1 - fx) + at(z0, y0, x1) * fx
    c01 = at(z0, y1, x0) * (1 - fx) + at(z0, y1, x1) * fx
    c10 = at(z1, y0, x0) * (1 - fx) + at(z1, y0, x1) * fx
    c11 = at(z1, y1, x0) * (1 - fx) + at(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    dens = c0 * (1 - fz) + c1 * fz
    return jnp.where(inside, dens, 0.0) * med.scale[mid]


MAX_TRACKING_STEPS = 256
SUPER_RES = 8            # majorant supergrid resolution per axis


def _gridspace_ray(med: MediumTable, mid, o, d):
    """Affine grid-space ray: gp(t) = gp0 + t * dg, for each lane's grid."""
    gi = jnp.maximum(med.grid_idx[mid], 0)
    w2g = med.world_to_grid[gi]
    oh = jnp.concatenate([o, jnp.ones_like(o[..., :1])], axis=-1)
    gp0 = jnp.einsum("...ij,...j->...i", w2g, oh)[..., :3]
    dg = jnp.einsum("...ij,...j->...i", w2g[..., :3, :3], d)
    return gi, gp0, dg


def _super_step(med: MediumTable, gi, gp0, dg, t_cur):
    """One DDA query against the majorant supergrid at parameter t_cur.

    Returns (dmax, t_limit, advance_only):
      * inside the unit grid cube: dmax = supercell raw-density majorant,
        t_limit = parameter at which the ray leaves the supercell,
      * outside with an entry ahead: dmax = 0, t_limit = cube entry,
        advance_only = True,
      * outside with no entry: t_limit = +inf (caller retires the lane).
    """
    S = med.super_maj.shape[1]
    gp = gp0 + t_cur[..., None] * dg
    inside = jnp.all((gp >= 0.0) & (gp <= 1.0), axis=-1)
    c = jnp.clip(jnp.floor(gp * S).astype(jnp.int32), 0, S - 1)
    dmax = med.super_maj[gi, c[..., 2], c[..., 1], c[..., 0]]
    inv = 1.0 / jnp.where(jnp.abs(dg) < 1e-12,
                          jnp.where(dg < 0, -1e-12, 1e-12), dg)
    box_lo = jnp.where(inside[..., None], c.astype(jnp.float32) / S,
                       jnp.zeros_like(gp))
    box_hi = jnp.where(inside[..., None], (c + 1).astype(jnp.float32) / S,
                       jnp.ones_like(gp))
    t1 = (box_lo - gp) * inv
    t2 = (box_hi - gp) * inv
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)    # exit (inside)
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)   # entry (outside)
    miss = (~inside) & ((t_near > t_far) | (t_far < 0.0))
    # nudge past the boundary by ~1e-3 voxel (covered by the dilation)
    nudge = 1e-3 / (S * jnp.maximum(jnp.max(jnp.abs(dg), axis=-1), 1e-12))
    t_limit = jnp.where(
        inside, t_cur + t_far + nudge,
        jnp.where(miss, jnp.inf, t_cur + jnp.maximum(t_near, 0.0) + nudge))
    return jnp.where(inside, dmax, 0.0), t_limit, ~inside


def sample_distance(med: MediumTable, static_types, medium_id, o, d, t_surf,
                    seed, pixel, sample, dim, active):
    """Medium::sampleDistance analog for the whole lane batch.

    medium_id (R,) int32 (-1 vacuum); t_surf (R,) distance to the next
    surface. Returns MediumSample. RNG dims: uses dims [dim, dim+1].
    """
    R = o.shape[0]
    mid = jnp.maximum(medium_id, 0)
    in_medium = active & (medium_id >= 0)
    u = rng_mod.uniform4(seed, pixel, sample, dim)

    sampled = jnp.zeros(R, bool)
    t_out = t_surf
    weight = jnp.ones((R, 3))

    if HOMOGENEOUS in static_types:
        sig = med.sigma_t[mid] * med.scale[mid][..., None]
        # channel mixture (balance heuristic over RGB like homogeneous.cpp)
        ch = jnp.minimum((u[..., 0] * 3).astype(jnp.int32), 2)
        sig_ch = jnp.take_along_axis(sig, ch[..., None], axis=-1)[..., 0]
        sig_ch = jnp.maximum(sig_ch, 1e-12)
        t_s = -jnp.log(jnp.maximum(1.0 - u[..., 1], 1e-20)) / sig_ch
        hit_medium = t_s < t_surf
        t_h = jnp.minimum(t_s, t_surf)
        tr = jnp.exp(-sig * t_h[..., None])
        # pdf of scattering at t_s: mean_ch sigma_ch exp(-sigma_ch t)
        pdf_scatter = jnp.mean(sig * tr, axis=-1)
        # pdf of passing the surface: mean_ch exp(-sigma_ch t_surf)
        pdf_pass = jnp.mean(tr, axis=-1)
        sigma_s = sig * med.albedo[mid]
        w_scatter = sigma_s * tr / jnp.maximum(pdf_scatter, 1e-20)[..., None]
        w_pass = tr / jnp.maximum(pdf_pass, 1e-20)[..., None]
        is_h = in_medium & (med.type[mid] == HOMOGENEOUS)
        sampled = jnp.where(is_h, hit_medium, sampled)
        t_out = jnp.where(is_h, t_h, t_out)
        weight = jnp.where(
            is_h[..., None], jnp.where(hit_medium[..., None], w_scatter, w_pass),
            weight,
        )

    if HETEROGENEOUS in static_types:
        # delta (Woodcock) tracking with per-supercell majorants: each step
        # samples a free flight against the LOCAL majorant, bounded by the
        # supercell exit (memoryless exponential => restarting at the
        # boundary with the next cell's majorant is unbiased). Empty cells
        # and the space outside the grid cube are crossed in one DDA step.
        is_het = in_medium & (med.type[mid] == HETEROGENEOUS)
        gi, gp0, dg = _gridspace_ray(med, mid, o, d)
        sigm = jnp.mean(med.sigma_t[mid], axis=-1) * med.scale[mid]

        def cond(state):
            step, t_cur, done, _ = state
            return (step < MAX_TRACKING_STEPS) & jnp.any(~done)

        def body(state):
            step, t_cur, done, scat = state
            u2 = rng_mod.uniform2(seed, pixel, sample, dim + 2 + step)
            dmax, t_limit, outside = _super_step(med, gi, gp0, dg, t_cur)
            maj_loc = jnp.maximum(sigm * dmax, 1e-12)
            dt = -jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-20)) / maj_loc
            t_new = t_cur + dt
            crossed = t_new > t_limit            # incl. empty/outside cells
            t_new = jnp.minimum(t_new, t_limit)
            past = t_new >= t_surf
            p_new = o + t_new[..., None] * d
            dens = _lookup_density(med, mid, p_new)
            sig_t_lum = jnp.mean(med.sigma_t[mid], axis=-1) * dens
            real = (~crossed) & (u2[..., 1] < sig_t_lum / maj_loc)
            newly_scat = ~done & ~past & real & is_het
            newly_done = ~done & (past | newly_scat)
            return (
                step + 1,
                jnp.where(done, t_cur, jnp.minimum(t_new, t_surf)),
                done | newly_done | ~is_het,
                scat | newly_scat,
            )

        init = (jnp.zeros((), jnp.int32), jnp.zeros(R), ~is_het, jnp.zeros(R, bool))
        _, t_trk, _, scat = jax.lax.while_loop(cond, body, init)
        t_h = jnp.where(scat, t_trk, t_surf)
        # delta tracking weight: sigma_s/sigma_t at the collision (ratio of
        # real-scatter), pass-through weight 1 (unbiased)
        p_ev = o + t_h[..., None] * d
        w_scat = med.albedo[mid]
        sampled = jnp.where(is_het, scat, sampled)
        t_out = jnp.where(is_het, t_h, t_out)
        weight = jnp.where(
            is_het[..., None],
            jnp.where(scat[..., None], w_scat, jnp.ones((R, 3))),
            weight,
        )

    p_out = o + t_out[..., None] * d
    return MediumSample(sampled=sampled & in_medium, t=t_out, p=p_out, weight=weight)


def eval_transmittance(med: MediumTable, static_types, medium_id, o, d, dist,
                       seed, pixel, sample, dim, active):
    """Medium::evalTransmittance along a (shadow) segment inside one medium.

    Homogeneous: closed form. Heterogeneous: single-sample ratio tracking
    (unbiased)."""
    R = o.shape[0]
    mid = jnp.maximum(medium_id, 0)
    in_medium = active & (medium_id >= 0)
    tr = jnp.ones((R, 3))

    if HOMOGENEOUS in static_types:
        sig = med.sigma_t[mid] * med.scale[mid][..., None]
        t_clamped = jnp.minimum(dist, 1e7)
        tr_h = jnp.exp(-sig * t_clamped[..., None])
        is_h = in_medium & (med.type[mid] == HOMOGENEOUS)
        tr = jnp.where(is_h[..., None], tr_h, tr)

    if HETEROGENEOUS in static_types:
        # ratio tracking against the supergrid's LOCAL majorants (null
        # collisions only happen where density can be nonzero)
        is_het = in_medium & (med.type[mid] == HETEROGENEOUS)
        gi, gp0, dg = _gridspace_ray(med, mid, o, d)
        sigm = jnp.mean(med.sigma_t[mid], axis=-1) * med.scale[mid]

        def cond(state):
            step, t_cur, done, _ = state
            return (step < MAX_TRACKING_STEPS) & jnp.any(~done)

        def body(state):
            step, t_cur, done, w = state
            u2 = rng_mod.uniform2(seed, pixel, sample, dim + 32 + step)
            dmax, t_limit, _ = _super_step(med, gi, gp0, dg, t_cur)
            maj_loc = jnp.maximum(sigm * dmax, 1e-12)
            dt = -jnp.log(jnp.maximum(1.0 - u2[..., 0], 1e-20)) / maj_loc
            t_new = t_cur + dt
            crossed = t_new > t_limit
            t_new = jnp.minimum(t_new, t_limit)
            past = t_new >= dist
            p_new = o + t_new[..., None] * d
            dens = _lookup_density(med, mid, p_new)
            sig_t_lum = jnp.mean(med.sigma_t[mid], axis=-1) * dens
            ratio = jnp.clip(1.0 - sig_t_lum / maj_loc, 0.0, 1.0)
            w_new = jnp.where(~done & ~past & ~crossed, w * ratio, w)
            return (step + 1, jnp.where(done, t_cur, t_new),
                    done | past | ~is_het, w_new)

        init = (jnp.zeros((), jnp.int32), jnp.zeros(R), ~is_het, jnp.ones(R))
        _, _, _, w = jax.lax.while_loop(cond, body, init)
        tr = jnp.where(is_het[..., None], w[..., None] * jnp.ones((1, 3)), tr)

    return tr
