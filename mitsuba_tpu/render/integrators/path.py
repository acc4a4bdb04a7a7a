"""Wavefront path tracer with NEE + MIS + Russian roulette.

Algorithmic parity with the reference's canonical `path` plugin
(src/integrators/path/path.cpp:119-300): per vertex — possible emitter-hit
contribution weighted by the power heuristic against the NEE pdf, one
next-event-estimation sample weighted against the BSDF pdf, BSDF sampling to
extend the path, eta-scaled Russian roulette after rr_depth
(path.cpp:276-286), hide_emitters / max_depth semantics.

The control structure is TPU-native: instead of the reference's unbounded
per-ray `while` (path.cpp:135), the whole megabatch advances through a
``lax.fori_loop`` over bounces with per-lane `active` masks — the bounce
body compiles exactly once regardless of max_depth (an unrolled variant
compiled ~30x slower for deep paths), and dead lanes trace degenerate rays
(t_max = t_min) so every lane stays in lock-step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import scene as scene_mod
from .common import (
    DIM_BASE, DIM_BSDF, DIM_NEE, DIM_RR, DIMS_PER_BOUNCE,
    IntegratorConfig, mis_power, ray_offset,
)


class _PathState(NamedTuple):
    L: jnp.ndarray
    thr: jnp.ndarray
    o: jnp.ndarray
    d: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    eta: jnp.ndarray
    n_rays: jnp.ndarray  # issued ray-query counter (closest + shadow)


def li(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample,
       with_stats: bool = False, pixel_spread=None):
    """Radiance along primary rays o,d (R,3). Returns (R,3), or
    ((R,3), n_rays) with the exact number of issued ray queries (the
    honest kdbench-style rays/s denominator) when with_stats.

    ``pixel_spread``: angular pixel size (radians) for ray-cone texture
    filtering at the first bounce (sensor.h sampleRayDifferential +
    mipmap.h trilinear role); None disables MIP lookups."""
    R = o.shape[0]
    types = static.bsdf_types
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 16

    init = _PathState(
        L=jnp.zeros((R, 3)),
        thr=jnp.ones((R, 3)),
        o=o,
        d=d,
        active=jnp.ones(R, bool),
        prev_pdf=jnp.zeros(R),
        prev_delta=jnp.ones(R, bool),  # the sensor vertex counts as delta
        eta=jnp.ones(R),
        n_rays=jnp.zeros((), jnp.float32),
    )

    def bounce(i, s: _PathState):
        depth = i + 1  # 1-based like rRec.depth
        first = depth == 1
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        L, thr, o, d, active = s.L, s.thr, s.o, s.d, s.active
        n_rays = s.n_rays + jnp.sum(active.astype(jnp.float32))

        its = scene_mod.ray_intersect(
            scene, static, o, d, 1e-4, jnp.inf, active=active
        )

        # --- escaped rays: environment emitter with MIS (path.cpp:234-248)
        if static.has_env:
            env_L = em_mod.eval_env(scene, static, d)
            lum_pdf = em_mod.pdf_direct_env(scene, static, d)
            w = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf))
            show = active & ~its.valid
            if cfg.hide_emitters:
                show = show & ~first
            L = L + jnp.where(show[..., None], thr * env_L * w[..., None], 0.0)

        active = active & its.valid

        # --- emitted radiance at the hit (path.cpp:176-190)
        Le = scene_mod.emitted_radiance(scene, static, its, d)
        lum_pdf_hit = scene_mod.pdf_emitter_hit(scene, its, o)
        w_hit = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf_hit))
        show = active & (its.emitter_id >= 0)
        if cfg.hide_emitters:
            show = show & ~first
        L = L + jnp.where(show[..., None], thr * Le * w_hit[..., None], 0.0)

        # the final vertex only collects emission (path.cpp depth check)
        extend = active & (depth < max_depth)

        # ray-cone MIP footprint, primary hits only (the reference also
        # filters only through the camera ray's differentials)
        fp_uv = None
        if pixel_spread is not None and static.has_textures:
            fp_uv = jnp.where(
                first, scene_mod.uv_footprint(scene, its, pixel_spread), 0.0
            )
        bl = scene_mod.bsdf_locals(scene, its, static, fp_uv=fp_uv)
        nst = scene_mod.bsdf_nested(scene, its, static)

        # --- subsurface term (Subsurface::Lo usage, integrator.h: the
        # integrator adds its.LoSub at every hit on a subsurface shape)
        if static.has_sss:
            from .. import subsurface as sss_mod
            lo_ss = sss_mod.eval_lo(scene, its, d)
            L = L + jnp.where(active[..., None], thr * lo_ss, 0.0)

        # --- next event estimation (path.cpp:196-263 / scene.cpp:828)
        if static.emitter_types:
            u_nee = rng_mod.uniform4(seed, pixel, sample, dim0 + DIM_NEE)
            ds = em_mod.sample_direct(scene, static, its.p, u_nee[..., :3])
            nee_ok = extend & ds.valid & (ds.pdf_sa > 0)
            n_rays = n_rays + jnp.sum(nee_ok.astype(jnp.float32))
            o_sh = ray_offset(its.p, its.gn, ds.d)
            vis = ~scene_mod.occluded(
                scene, static, o_sh, ds.d, 0.0, ds.dist * (1.0 - 1e-3),
                active=nee_ok,
            )
            wo_local = its.sh_frame.to_local(ds.d)
            f = bsdf_mod.eval(bl, its.wi, wo_local, active_types=types, nested=nst)
            bsdf_pdf_nee = bsdf_mod.pdf(bl, its.wi, wo_local, active_types=types, nested=nst)
            w_nee = jnp.where(ds.delta, 1.0, mis_power(ds.pdf_sa, bsdf_pdf_nee))
            contrib = thr * f * ds.radiance * m.safe_div(w_nee, ds.pdf_sa)[..., None]
            L = L + jnp.where((nee_ok & vis)[..., None], contrib, 0.0)

        # --- BSDF sampling (path.cpp:215-233)
        u_b = rng_mod.uniform4(seed, pixel, sample, dim0 + DIM_BSDF)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        thr_new = thr * bs.weight
        eta = jnp.where(extend, s.eta * bs.eta, s.eta)
        alive = (jnp.max(thr_new, axis=-1) > 0) & (bs.pdf > 0)

        d_new = m.normalize(its.sh_frame.to_world(bs.wo))
        o_new = ray_offset(its.p, its.gn, d_new)

        # --- Russian roulette (path.cpp:276-286), only past rr_depth.
        # q is a sampling probability: detach it so the 1/q compensation
        # stays an unbiased constant under AD (detached-sampling estimator).
        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(thr_new, axis=-1) * eta * eta, 0.95)
        )
        u_rr = rng_mod.uniform1(seed, pixel, sample, dim0 + DIM_RR)
        do_rr = depth >= cfg.rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        thr_new = jnp.where((do_rr & survive)[..., None],
                            thr_new * m.safe_div(1.0, q)[..., None], thr_new)

        active_next = extend & alive & survive
        return _PathState(
            L=L,
            thr=jnp.where(active_next[..., None], thr_new, thr),
            o=jnp.where(active_next[..., None], o_new, o),
            d=jnp.where(active_next[..., None], d_new, d),
            active=active_next,
            prev_pdf=jnp.where(active_next, bs.pdf, s.prev_pdf),
            prev_delta=jnp.where(active_next, bs.is_delta, s.prev_delta),
            eta=eta,
            n_rays=n_rays,
        )

    out = jax.lax.fori_loop(0, max_depth, bounce, init)
    if with_stats:
        return out.L, out.n_rays
    return out.L
