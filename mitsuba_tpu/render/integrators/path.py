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
    pixel: jnp.ndarray   # per-lane pixel id (rides the wavefront sort)
    orig: jnp.ndarray    # original lane index, for the final unsort
    n_rays: jnp.ndarray  # issued ray-query counter (closest + shadow)


def _sort_wavefront(s: "_PathState", key):
    """Reorder the whole wavefront by a coherence key with ONE multi-payload
    lax.sort. XLA argsort/gather/scatter each cost 12-45 ms at 262k rays on
    v5e, so the per-bounce sort must move all state in a single sort network
    (payloads add ~0.7 ms each) instead of sort + N gathers. Dead lanes are
    keyed to the end, which doubles as occupancy compaction: their blocks
    carry t_max <= t_min and retire in zero sweep iterations."""
    key = jnp.where(s.active, key >> jnp.uint32(1), jnp.uint32(0xFFFFFFFF))
    ops = (key,
           s.L[:, 0], s.L[:, 1], s.L[:, 2],
           s.thr[:, 0], s.thr[:, 1], s.thr[:, 2],
           s.o[:, 0], s.o[:, 1], s.o[:, 2],
           s.d[:, 0], s.d[:, 1], s.d[:, 2],
           s.active, s.prev_pdf, s.prev_delta, s.eta, s.pixel, s.orig)
    r = jax.lax.sort(ops, num_keys=1)
    return _PathState(
        L=jnp.stack(r[1:4], axis=-1),
        thr=jnp.stack(r[4:7], axis=-1),
        o=jnp.stack(r[7:10], axis=-1),
        d=jnp.stack(r[10:13], axis=-1),
        active=r[13], prev_pdf=r[14], prev_delta=r[15], eta=r[16],
        pixel=r[17], orig=r[18], n_rays=s.n_rays,
    )


def li(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample,
       with_stats: bool = False, pixel_spread=None, spectral_wl=None):
    """Radiance along primary rays o,d (R,3). Returns (R,3), or
    ((R,3), n_rays) with the exact number of issued ray queries (the
    honest kdbench-style rays/s denominator) when with_stats.

    ``pixel_spread``: angular pixel size (radians) for ray-cone texture
    filtering at the first bounce (sensor.h sampleRayDifferential +
    mipmap.h trilinear role); None disables MIP lookups.

    ``spectral_wl``: (R, 3) wavelengths (nm) for hero-wavelength spectral
    transport (the SPECTRUM_SAMPLES>3 mode of spectrum.h:25-32, TPU-native
    form): the 3 channel slots carry 3 wavelength samples; every RGB
    reflectance/emission factor is lifted to a smooth spectrum
    (core.spectrum.uplift_rgb) evaluated at those wavelengths, dielectric
    eta takes a Cauchy dispersion shift from the material's cauchy_b, and
    companion slots are zeroed through dispersive delta transmissions
    (their BSDF value at the hero's refracted direction is zero). The
    returned (R, 3) is then per-wavelength radiance — convert with
    core.spectrum.spectral_to_rgb."""
    R = o.shape[0]
    types = static.bsdf_types
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 16
    if spectral_wl is not None:
        from ...core import spectrum as spec_mod

        def _lift(v):
            return spec_mod.uplift_rgb(v, spectral_wl)

        def _lift_emit(v):
            return spec_mod.uplift_rgb(v, spectral_wl) * spec_mod.d65(
                spectral_wl)
    else:
        def _lift(v):
            return v

        _lift_emit = _lift
    # big treelet-BVH scenes: the integrator owns wavefront coherence — one
    # multi-payload sort per bounce, presorted ray queries (see
    # scene.wants_wavefront_sort)
    wsort = scene_mod.wants_wavefront_sort(scene, static)
    pixel_arr = jnp.broadcast_to(jnp.asarray(pixel, jnp.int32), (R,))

    init = _PathState(
        L=jnp.zeros((R, 3)),
        thr=jnp.ones((R, 3)),
        o=o,
        d=d,
        active=jnp.ones(R, bool),
        prev_pdf=jnp.zeros(R),
        prev_delta=jnp.ones(R, bool),  # the sensor vertex counts as delta
        eta=jnp.ones(R),
        pixel=pixel_arr,
        orig=jnp.arange(R, dtype=jnp.int32),
        n_rays=jnp.zeros((), jnp.float32),
    )

    def make_bounce(first_presorted: bool):
      def bounce(i, s: _PathState):
        depth = i + 1  # 1-based like rRec.depth
        first = depth == 1
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        L, thr, o, d, active = s.L, s.thr, s.o, s.d, s.active
        pixel = s.pixel
        n_rays = s.n_rays + jnp.sum(active.astype(jnp.float32))

        # bounce 0 runs peeled with presorted=True: raster-ordered primary
        # rays are already coherent, so the per-query sort+unsort (the
        # profiled ~43 ms payload gathers) is skipped for them
        its = scene_mod.ray_intersect(
            scene, static, o, d, 1e-4, jnp.inf, active=active,
            presorted=wsort or first_presorted,
        )

        # --- escaped rays: environment emitter with MIS (path.cpp:234-248)
        if static.has_env:
            env_L, lum_pdf = em_mod.eval_env_pdf(scene, static, d)
            w = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf))
            show = active & ~its.valid
            if cfg.hide_emitters:
                show = show & ~first
            L = L + jnp.where(show[..., None], thr * _lift_emit(env_L) * w[..., None], 0.0)

        active = active & its.valid

        # --- emitted radiance at the hit (path.cpp:176-190)
        Le = scene_mod.emitted_radiance(scene, static, its, d)
        lum_pdf_hit = scene_mod.pdf_emitter_hit(scene, its, o, static)
        w_hit = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf_hit))
        show = active & (its.emitter_id >= 0)
        if cfg.hide_emitters:
            show = show & ~first
        L = L + jnp.where(show[..., None], thr * _lift_emit(Le) * w_hit[..., None], 0.0)

        # the final vertex only collects emission (path.cpp depth check)
        extend = active & (depth < max_depth)

        # ray-cone MIP footprint, primary hits only (the reference also
        # filters only through the camera ray's differentials)
        fp_uv = None
        duv_minor = None
        duv_major = None
        if pixel_spread is not None and static.has_textures:
            if static.ewa_taps > 1:
                dmn, dmj = scene_mod.uv_footprint_aniso(
                    scene, its, pixel_spread)
                duv_minor = jnp.where(first[..., None], dmn, 0.0)
                duv_major = jnp.where(first[..., None], dmj, 0.0)
            else:
                fp_uv = jnp.where(
                    first, scene_mod.uv_footprint(scene, its, pixel_spread),
                    0.0
                )
        bl = scene_mod.bsdf_locals(scene, its, static, fp_uv=fp_uv,
                                   duv_minor=duv_minor,
                                   duv_major=duv_major)
        nst = scene_mod.bsdf_nested(scene, its, static)

        # --- subsurface term (Subsurface::Lo usage, integrator.h: the
        # integrator adds its.LoSub at every hit on a subsurface shape)
        if static.has_sss:
            from .. import subsurface as sss_mod
            lo_ss = sss_mod.eval_lo(scene, its, d)
            # refracted single scattering (singlescatter.cpp) shares the
            # spare per-bounce RNG slot 3; compile-time gated so dipole-only
            # scenes don't pay its two BVH traversals + shadow trace
            if static.has_singlescatter:
                lo_ss = lo_ss + sss_mod.exact_single_scatter(
                    scene, static, its, d, seed, pixel, sample, dim0 + 3,
                    active)
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
                active=nee_ok, presorted=wsort,
            )
            wo_local = its.sh_frame.to_local(ds.d)
            f = bsdf_mod.eval(bl, its.wi, wo_local, active_types=types, nested=nst)
            bsdf_pdf_nee = bsdf_mod.pdf(bl, its.wi, wo_local, active_types=types, nested=nst)
            w_nee = jnp.where(ds.delta, 1.0, mis_power(ds.pdf_sa, bsdf_pdf_nee))
            contrib = thr * _lift(f) * _lift_emit(ds.radiance) \
                * m.safe_div(w_nee, ds.pdf_sa)[..., None]
            L = L + jnp.where((nee_ok & vis)[..., None], contrib, 0.0)

        # --- BSDF sampling (path.cpp:215-233)
        u_b = rng_mod.uniform4(seed, pixel, sample, dim0 + DIM_BSDF)
        disp_b = None
        if spectral_wl is not None:
            disp_b = scene.materials.cauchy_b[jnp.maximum(its.mat_id, 0)]
            wl_um = spectral_wl[..., 0] * 1e-3
            # Cauchy dispersion: eta(l) = eta_d + B (1/l^2 - 1/l_d^2),
            # hero wavelength only (l_d = 589.3 nm)
            d_eta = disp_b * (1.0 / (wl_um * wl_um) - 1.0 / 0.5893**2)
            bl = bl._replace(eta_s=bl.eta_s + d_eta,
                             eta_c=bl.eta_c + d_eta[..., None])
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        w_step = _lift(bs.weight)
        if spectral_wl is not None:
            # companion wavelengths die through dispersive delta
            # transmission: their delta lobe points elsewhere (value 0)
            dispersed = (disp_b > 0.0) & bs.is_delta & (bs.eta != 1.0)
            keep = jnp.concatenate(
                [jnp.ones((R, 1)),
                 jnp.where(dispersed[..., None], 0.0, jnp.ones((R, 2)))],
                axis=-1)
            w_step = w_step * keep
        thr_new = thr * w_step
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
        ns = _PathState(
            L=L,
            thr=jnp.where(active_next[..., None], thr_new, thr),
            o=jnp.where(active_next[..., None], o_new, o),
            d=jnp.where(active_next[..., None], d_new, d),
            active=active_next,
            prev_pdf=jnp.where(active_next, bs.pdf, s.prev_pdf),
            prev_delta=jnp.where(active_next, bs.is_delta, s.prev_delta),
            eta=eta,
            pixel=pixel,
            orig=s.orig,
            n_rays=n_rays,
        )
        if wsort:
            # re-sort the surviving wavefront for the next bounce (skipped
            # after the last bounce — nothing consumes the order)
            from ...ops.pallas_bvh import ray_sort_keys

            key = ray_sort_keys(ns.o, ns.d, scene.aabb_lo, scene.aabb_hi)
            ns = jax.lax.cond(
                depth < max_depth,
                lambda st: _sort_wavefront(st, key),
                lambda st: st,
                ns,
            )
        return ns
      return bounce

    out = make_bounce(True)(jnp.asarray(0, jnp.int32), init)
    if max_depth > 1:
        out = jax.lax.fori_loop(1, max_depth, make_bounce(False), out)
    if wsort:
        # restore the caller's lane order with one final sort keyed on the
        # carried original index (pixel ids may repeat; lane index cannot)
        r = jax.lax.sort(
            (out.orig, out.L[:, 0], out.L[:, 1], out.L[:, 2]), num_keys=1)
        out = out._replace(orig=r[0], L=jnp.stack(r[1:4], axis=-1))
    if with_stats:
        return out.L, out.n_rays
    return out.L
