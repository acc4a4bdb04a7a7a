"""Direct illumination integrator with emitter/BSDF MIS.

Parity with src/integrators/direct/direct.cpp: per shading point,
``emitter_samples`` NEE samples and ``bsdf_samples`` BSDF samples combined
with the power heuristic (fractional weights direct.cpp:99-101), emitted
radiance of directly visible emitters.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import scene as scene_mod
from .common import DIM_BASE, IntegratorConfig, mis_power, ray_offset


def li(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample):
    R = o.shape[0]
    L = jnp.zeros((R, 3))
    types = static.bsdf_types
    nE = max(cfg.emitter_samples, 0)
    nB = max(cfg.bsdf_samples, 0)
    frac_e = nE / max(nE + nB, 1)
    frac_b = nB / max(nE + nB, 1)
    weight_e = 1.0 / max(nE, 1)
    weight_b = 1.0 / max(nB, 1)

    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    active = its.valid

    # escaped: environment
    if static.has_env and not cfg.hide_emitters:
        env_L = em_mod.eval_env(scene, static, d)
        L = L + jnp.where((~active)[..., None], env_L, 0.0)

    # directly visible emitters
    if not cfg.hide_emitters:
        Le = scene_mod.emitted_radiance(scene, static, its, d)
        L = L + jnp.where(active[..., None], Le, 0.0)

    bl = scene_mod.bsdf_locals(scene, its, static)
    nst = scene_mod.bsdf_nested(scene, its, static)
    dim = DIM_BASE

    for i in range(nE):
        u = rng_mod.uniform4(seed, pixel, sample, dim)
        dim += 1
        ds = em_mod.sample_direct(scene, static, its.p, u[..., :3])
        ok = active & ds.valid & (ds.pdf_sa > 0)
        o_sh = ray_offset(its.p, its.gn, ds.d)
        vis = ~scene_mod.occluded(
            scene, static, o_sh, ds.d, 0.0, ds.dist * (1.0 - 1e-3), active=ok
        )
        wo_local = its.sh_frame.to_local(ds.d)
        f = bsdf_mod.eval(bl, its.wi, wo_local, active_types=types, nested=nst)
        pdf_b = bsdf_mod.pdf(bl, its.wi, wo_local, active_types=types, nested=nst)
        # fractional MIS (direct.cpp:99-101)
        w = jnp.where(
            ds.delta, 1.0, mis_power(ds.pdf_sa * frac_e, pdf_b * frac_b)
        )
        contrib = f * ds.radiance * m.safe_div(w * weight_e, ds.pdf_sa)[..., None]
        L = L + jnp.where((ok & vis)[..., None], contrib, 0.0)

    for i in range(nB):
        u = rng_mod.uniform4(seed, pixel, sample, dim)
        dim += 1
        bs = bsdf_mod.sample(bl, its.wi, u[..., 0], u[..., 1:3], active_types=types, nested=nst)
        ok = active & (bs.pdf > 0) & (jnp.max(bs.weight, axis=-1) > 0)
        d2 = m.normalize(its.sh_frame.to_world(bs.wo))
        o2 = ray_offset(its.p, its.gn, d2)
        its2 = scene_mod.ray_intersect(scene, static, o2, d2, 0.0, jnp.inf, active=ok)
        # hit an emitter?
        Le2 = scene_mod.emitted_radiance(scene, static, its2, d2)
        lum_pdf = scene_mod.pdf_emitter_hit(scene, its2, o2, static)
        # or escaped to the environment
        if static.has_env:
            env_L = em_mod.eval_env(scene, static, d2)
            env_pdf = em_mod.pdf_direct_env(scene, static, d2)
            Le2 = jnp.where(its2.valid[..., None], Le2, env_L)
            lum_pdf = jnp.where(its2.valid, lum_pdf, env_pdf)
        else:
            Le2 = jnp.where(its2.valid[..., None], Le2, 0.0)
        w = jnp.where(
            bs.is_delta, 1.0, mis_power(bs.pdf * frac_b, lum_pdf * frac_e)
        )
        contrib = bs.weight * Le2 * (w * weight_b)[..., None]
        L = L + jnp.where(ok[..., None], contrib, 0.0)

    return L
