"""Volumetric path tracer (reference: src/integrators/path/volpath.cpp).

Extends the wavefront surface path tracer with participating media:
per-bounce medium distance sampling (volpath.cpp:104), phase-function
scattering with MIS against NEE (:155), attenuated next-event estimation
(:198 / Scene::sampleAttenuatedEmitterDirect), and medium transitions at
transmissive boundaries (null/dielectric surfaces swap the per-lane medium
id — the shape interior/exterior medium mechanism).

Shadow rays: when any material carries boundary media
(static.has_boundary_media) NEE uses Scene-level attenuated transmittance
(scene.attenuated_transmittance — the sampleAttenuatedEmitterDirect walk
through null-boundary chains, scene.cpp:854-898); otherwise the cheap
boolean occlusion + current-medium transmittance suffices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import medium as med_mod
from .. import phase as phase_mod
from .. import scene as scene_mod
from .common import (
    DIM_BASE, IntegratorConfig, mis_power, ray_offset,
)

# volumetric bounces consume more dims (distance sampling + tracking loops)
DIMS_PER_BOUNCE_VOL = 512


class _VolState(NamedTuple):
    L: jnp.ndarray
    thr: jnp.ndarray
    o: jnp.ndarray
    d: jnp.ndarray
    active: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray
    eta: jnp.ndarray
    medium: jnp.ndarray   # (R,) int32 current medium id (-1 vacuum)
    p_prev: jnp.ndarray   # (R, 3) last REAL scattering vertex (null
                          # passthroughs keep it — MIS pdfs convert solid
                          # angle at that vertex, volpath.cpp bookkeeping)


def li(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample,
       camera_medium=-1):
    R = o.shape[0]
    types = static.bsdf_types
    med = scene.media
    mtypes = static.medium_types
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 16

    init = _VolState(
        L=jnp.zeros((R, 3)),
        thr=jnp.ones((R, 3)),
        o=o, d=d,
        active=jnp.ones(R, bool),
        prev_pdf=jnp.zeros(R),
        prev_delta=jnp.ones(R, bool),
        eta=jnp.ones(R),
        medium=jnp.full(R, camera_medium, jnp.int32),
        p_prev=o,
    )

    def bounce(i, s: _VolState):
        depth = i + 1
        first = depth == 1
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE_VOL
        L, thr, o, d, active = s.L, s.thr, s.o, s.d, s.active

        its = scene_mod.ray_intersect(
            scene, static, o, d, 1e-4, jnp.inf, active=active
        )
        t_surf = jnp.where(its.valid, its.t, 2.0 * scene.radius)

        # --- medium distance sampling (volpath.cpp:104) ---
        if mtypes:
            ms = med_mod.sample_distance(
                med, mtypes, s.medium, o, d, t_surf, seed, pixel, sample,
                dim0, active,
            )
            thr = thr * jnp.where(active[..., None], ms.weight, 1.0)
            in_scatter = active & ms.sampled
            on_surface = active & ~ms.sampled
        else:
            in_scatter = jnp.zeros(R, bool)
            on_surface = active

        # === surface branch (mirrors path.py) ===
        surf_hit = on_surface & its.valid

        if static.has_env:
            env_L, lum_pdf = em_mod.eval_env_pdf(scene, static, d)
            w = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf))
            show = on_surface & ~its.valid
            if cfg.hide_emitters:
                show = show & ~first
            L = L + jnp.where(show[..., None], thr * env_L * w[..., None], 0.0)

        Le = scene_mod.emitted_radiance(scene, static, its, d)
        lum_pdf_hit = scene_mod.pdf_emitter_hit(scene, its, s.p_prev, static)
        w_hit = jnp.where(s.prev_delta, 1.0, mis_power(s.prev_pdf, lum_pdf_hit))
        show = surf_hit & (its.emitter_id >= 0)
        if cfg.hide_emitters:
            show = show & ~first
        L = L + jnp.where(show[..., None], thr * Le * w_hit[..., None], 0.0)

        extend_surf = surf_hit & (depth < max_depth)
        extend_med = in_scatter & (depth < max_depth)

        bl = scene_mod.bsdf_locals(scene, its, static)
        nst = scene_mod.bsdf_nested(scene, its, static)
        mid = jnp.maximum(s.medium, 0)
        ph_type = med.phase_type[mid]
        ph_params = phase_mod.PhaseParams(
            g=med.phase_g[mid], g2=med.phase_g2[mid], w2=med.phase_w2[mid],
            ks=med.phase_ks[mid], exponent=med.phase_exp[mid],
            sigma=med.phase_sigma[mid], axis=med.phase_axis[mid],
        )
        ph_active = static.phase_types if static.phase_types else (0,)

        # --- NEE from surface OR medium vertex ---
        if static.emitter_types:
            u_nee = rng_mod.uniform4(seed, pixel, sample, dim0 + 64)
            # reference point: medium event position or surface point
            if mtypes:
                p_ref = jnp.where(in_scatter[..., None], ms.p, its.p)
            else:
                p_ref = its.p
            ds = em_mod.sample_direct(scene, static, p_ref, u_nee[..., :3])
            nee_ok = (extend_surf | extend_med) & ds.valid & (ds.pdf_sa > 0)
            o_sh = jnp.where(
                in_scatter[..., None], p_ref,
                ray_offset(its.p, its.gn, ds.d),
            )
            if static.has_boundary_media:
                # walk the shadow segment through all null-boundary media
                # (scene.cpp:854-898); occlusion by opaque hits -> tr == 0
                tr = scene_mod.attenuated_transmittance(
                    scene, static, o_sh, ds.d, ds.dist * (1.0 - 1e-3),
                    s.medium, seed, pixel, sample, dim0 + 128,
                    active=nee_ok,
                )
                vis = jnp.ones(R, bool)
            else:
                vis = ~scene_mod.occluded(
                    scene, static, o_sh, ds.d, 1e-5, ds.dist * (1.0 - 1e-3),
                    active=nee_ok,
                )
                # attenuation through the current medium only
                if mtypes:
                    tr = med_mod.eval_transmittance(
                        med, mtypes, s.medium, o_sh, ds.d,
                        jnp.minimum(ds.dist, t_surf), seed, pixel, sample,
                        dim0 + 128, nee_ok,
                    )
                else:
                    tr = jnp.ones((R, 3))

            # scattering function value toward the emitter
            wo_local = its.sh_frame.to_local(ds.d)
            f_surf = bsdf_mod.eval(bl, its.wi, wo_local, active_types=types, nested=nst)
            pdf_surf = bsdf_mod.pdf(bl, its.wi, wo_local, active_types=types, nested=nst)
            if mtypes:
                f_ph, pdf_ph_nee = phase_mod.eval_pdf(
                    ph_type, ph_params, -d, ds.d, active_types=ph_active)
                f_val = jnp.where(in_scatter[..., None], f_ph[..., None], f_surf)
                pdf_fwd = jnp.where(in_scatter, pdf_ph_nee, pdf_surf)
            else:
                f_val = f_surf
                pdf_fwd = pdf_surf
            w_nee = jnp.where(ds.delta, 1.0, mis_power(ds.pdf_sa, pdf_fwd))
            contrib = thr * f_val * tr * ds.radiance * m.safe_div(w_nee, ds.pdf_sa)[..., None]
            L = L + jnp.where((nee_ok & vis)[..., None], contrib, 0.0)

        # --- continue the path: phase sample or BSDF sample ---
        u_b = rng_mod.uniform4(seed, pixel, sample, dim0 + 65)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        d_surf = m.normalize(its.sh_frame.to_world(bs.wo))

        if mtypes:
            wo_ph, w_ph, pdf_ph = phase_mod.sample(
                ph_type, ph_params, -d, u_b[..., 1:3], active_types=ph_active)
            d_new = jnp.where(in_scatter[..., None], wo_ph, d_surf)
            new_pdf = jnp.where(in_scatter, pdf_ph, bs.pdf)
            new_delta = jnp.where(in_scatter, False, bs.is_delta)
            # phase weight = f/pdf (1 for the perfectly-sampled models)
            w_step = jnp.where(in_scatter[..., None],
                               w_ph[..., None] * jnp.ones((R, 3)), bs.weight)
            o_new = jnp.where(
                in_scatter[..., None], ms.p, ray_offset(its.p, its.gn, d_surf)
            )
        else:
            d_new = d_surf
            new_pdf = bs.pdf
            new_delta = bs.is_delta
            w_step = bs.weight
            o_new = ray_offset(its.p, its.gn, d_surf)

        thr_new = thr * w_step
        eta = jnp.where(extend_surf, s.eta * bs.eta, s.eta)
        # a NULL boundary is a continuation, not a vertex (volpath.cpp
        # ENull handling): crossing it must not launder the path into a
        # "delta bounce" (that would double-count emitters against NEE
        # from the previous REAL vertex) nor move the MIS reference point
        null_pass = extend_surf & (
            scene.materials.type[jnp.maximum(its.mat_id, 0)]
            == bsdf_mod.NULL)
        new_pdf = jnp.where(null_pass, s.prev_pdf, new_pdf)
        new_delta = jnp.where(null_pass, s.prev_delta, new_delta)
        p_scat = jnp.where(
            null_pass[..., None], s.p_prev,
            jnp.where(in_scatter[..., None] if mtypes else False,
                      ms.p if mtypes else its.p, its.p))
        alive = jnp.max(thr_new, axis=-1) > 0

        # --- medium transitions at transmissive surfaces ---
        if mtypes:
            crossed = extend_surf & (m.dot(d_surf, its.gn) * m.dot(d, its.gn) > 0)
            entering = crossed & (m.dot(d_surf, its.gn) < 0)
            interior = scene.materials.interior_medium[jnp.maximum(its.mat_id, 0)]
            exterior = scene.materials.exterior_medium[jnp.maximum(its.mat_id, 0)]
            new_medium = jnp.where(
                crossed, jnp.where(entering, interior, exterior), s.medium
            )
        else:
            new_medium = s.medium

        # --- Russian roulette ---
        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(thr_new, axis=-1) * eta * eta, 0.95)
        )
        u_rr = rng_mod.uniform1(seed, pixel, sample, dim0 + 66)
        do_rr = depth >= cfg.rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        thr_new = jnp.where((do_rr & survive)[..., None],
                            thr_new * m.safe_div(1.0, q)[..., None], thr_new)

        active_next = (extend_surf | extend_med) & alive & survive
        return _VolState(
            L=L,
            thr=jnp.where(active_next[..., None], thr_new, thr),
            o=jnp.where(active_next[..., None], o_new, o),
            d=jnp.where(active_next[..., None], d_new, d),
            active=active_next,
            prev_pdf=jnp.where(active_next, new_pdf, s.prev_pdf),
            prev_delta=jnp.where(active_next, new_delta, s.prev_delta),
            eta=eta,
            medium=jnp.where(active_next, new_medium, s.medium),
            p_prev=jnp.where(active_next[..., None], p_scat, s.p_prev),
        )

    out = jax.lax.fori_loop(0, max_depth, bounce, init)
    return out.L
