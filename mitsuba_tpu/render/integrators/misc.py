"""ao + field integrators (parity: src/integrators/direct/ao.cpp,
src/integrators/misc/field.cpp)."""
from __future__ import annotations

import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from ...core import warp
from .. import scene as scene_mod
from .common import (
    DIM_BASE, FIELD_ALBEDO, FIELD_DISTANCE, FIELD_GEO_NORMAL, FIELD_NORMAL,
    FIELD_POSITION, FIELD_PRIM_INDEX, FIELD_SH_NORMAL, FIELD_UV,
    IntegratorConfig, ray_offset,
)


def li_ao(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample):
    """Ambient occlusion (ao.cpp): cosine-weighted visibility."""
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    active = its.valid
    ray_len = cfg.ray_length
    if ray_len <= 0:
        t_max = scene.radius * 0.5
    else:
        t_max = jnp.asarray(ray_len)
    n = max(cfg.shading_samples, 1)
    acc = jnp.zeros(o.shape[0])
    for i in range(n):
        u = rng_mod.uniform2(seed, pixel, sample, DIM_BASE + i)
        wo_local = warp.square_to_cosine_hemisphere(u)
        wo = its.sh_frame.to_world(wo_local)
        o_sh = ray_offset(its.p, its.gn, wo)
        occ = scene_mod.occluded(scene, static, o_sh, wo, 0.0, t_max, active=active)
        acc = acc + jnp.where(active & ~occ, 1.0, 0.0)
    v = acc / n
    return jnp.where(active, v, 1.0)[..., None] * jnp.ones((1, 3))


def li_field(scene, static, cfg: IntegratorConfig, o, d, seed, pixel, sample):
    """AOV extraction (field.cpp): position/normal/uv/albedo/distance/index."""
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    a = its.valid[..., None]
    f = cfg.field
    if f == FIELD_POSITION:
        out = its.p
    elif f in (FIELD_NORMAL, FIELD_SH_NORMAL):
        out = its.sh_frame.n
    elif f == FIELD_GEO_NORMAL:
        out = its.gn
    elif f == FIELD_UV:
        out = jnp.concatenate([its.uv, jnp.zeros_like(its.uv[..., :1])], axis=-1)
    elif f == FIELD_ALBEDO:
        out = scene_mod.eval_albedo(scene, its, static)
    elif f == FIELD_DISTANCE:
        out = jnp.where(its.valid, its.t, 0.0)[..., None] * jnp.ones((1, 3))
    elif f == FIELD_PRIM_INDEX:
        out = its.prim_id.astype(jnp.float32)[..., None] * jnp.ones((1, 3))
    else:
        raise ValueError(cfg.field)
    return jnp.where(a, out, 0.0)
