"""Adjoint particle tracer (reference: src/integrators/ptracer/ptracer.cpp
+ ptracer_proc.cpp, built on ParticleTracer particleproc.h:128).

Light sub-paths start at emitters (Scene::sampleEmitterRay), random-walk
through the scene, and splat a camera connection at every vertex via the
sensor's importance (Sensor::sampleDirect). TPU-native shape: one megabatch
of particles advances in lock-step through a ``lax.fori_loop``; the film is
a scatter-add target. The work decomposition (a particle budget sliced into
ranges, particleproc.h:45-118) becomes the sp axis of the device mesh.

Importance-transport corrections applied on the walk (the reference gets
these from BSDF EImportance mode / vertex.cpp):
* shading-normal correction |wi.ns||wo.ng| / (|wi.ng||wo.ns|) (Veach 5.3),
* eta^2 cancellation on refraction (radiance carries 1/eta^2; importance
  does not).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import film as film_mod
from .. import scene as scene_mod
from .. import sensor as sensor_mod
from .common import (
    DIM_BASE, DIM_BSDF, DIM_NEE, DIM_RR, DIMS_PER_BOUNCE,
    IntegratorConfig, ray_offset,
)


class _PtState(NamedTuple):
    film: jnp.ndarray
    thr: jnp.ndarray
    o: jnp.ndarray
    d: jnp.ndarray
    active: jnp.ndarray


def _shading_normal_correction(wi_local, wo_local, gn_local):
    """Importance-transport correction factor (Veach eq. 5.19; the
    reference applies it inside BSDF sampling in EImportance mode)."""
    num = jnp.abs(wi_local[..., 2] * m.dot(wo_local, gn_local))
    den = jnp.abs(m.dot(wi_local, gn_local) * wo_local[..., 2])
    return jnp.clip(m.safe_div(num, jnp.maximum(den, 1e-9)), 0.0, 10.0)


def _splat_connection(film_data, H, W, sensor, value, p, valid,
                      scene, static):
    """Camera connection: visibility + importance splat (box filter —
    ptracer_proc.cpp splats into the light image the same way)."""
    ss = sensor_mod.sample_direct(sensor, p)
    ok = valid & ss.valid & (jnp.max(value, axis=-1) > 0)
    o_sh = p + ss.d * 1e-4 * (1.0 + jnp.max(jnp.abs(p), -1, keepdims=False))[..., None]
    vis = ~scene_mod.occluded(
        scene, static, o_sh, ss.d, 0.0, ss.dist * (1.0 - 1e-3), active=ok
    )
    ok = ok & vis
    v = jnp.where(ok[..., None], value * ss.imp[..., None], 0.0)
    px = jnp.clip((ss.uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    py = jnp.clip((ss.uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    return film_data.at[py, px, :3].add(v, mode="drop")


def trace_pass(scene, static, cfg: IntegratorConfig, sensor, film_data,
               seed, particle_idx, sample_idx):
    """One particle per lane: emit, walk, splat. Returns updated film
    (H, W, 4) raw light-image accumulation (weight channel untouched —
    normalization is n_pixels / n_particles at develop time)."""
    H, W = film_data.shape[0], film_data.shape[1]
    types = static.bsdf_types
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 16

    u_e = rng_mod.uniform4(seed, particle_idx, sample_idx, 0)
    u_ed = rng_mod.uniform2(seed, particle_idx, sample_idx, 1)
    ers = em_mod.sample_ray(scene, static, u_e, u_ed)

    # connection at the emitter vertex itself: L_o = Le toward the camera
    # (direct view of area lights; ptracer.cpp handles this through the
    # ParticleTracer "emitted" event)
    if (em_mod.AREA in static.emitter_types
            or em_mod.SPHERE in static.emitter_types):
        ss = sensor_mod.sample_direct(sensor, ers.o)
        cos_c = m.dot(ers.n, ss.d)
        v0 = ers.radiance * m.safe_div(cos_c, ers.pdf_area)[..., None]
        film_data = _splat_connection(
            film_data, H, W, sensor, jnp.maximum(v0, 0.0), ers.o,
            ers.valid & ers.is_area & (cos_c > 0), scene, static,
        )

    init = _PtState(
        film=film_data,
        thr=jnp.where(ers.valid[..., None], ers.weight, 0.0),
        o=ers.o,
        d=ers.d,
        active=ers.valid,
    )

    def bounce(i, s: _PtState):
        # vertex count at this connection = i + 3 (light, i+1 surfaces,
        # camera); the path tracer caps total vertices at max_depth + 1,
        # so surface bounces run 0 .. max_depth - 2.
        depth = i + 1
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        its = scene_mod.ray_intersect(
            scene, static, s.o, s.d, 1e-4, jnp.inf, active=s.active
        )
        active = s.active & its.valid
        bl = scene_mod.bsdf_locals(scene, its, static)
        nst = scene_mod.bsdf_nested(scene, its, static)
        gn_local = its.sh_frame.to_local(its.gn)

        # --- camera connection at this surface vertex
        ss = sensor_mod.sample_direct(sensor, its.p)
        wo_cam = its.sh_frame.to_local(ss.d)
        f = bsdf_mod.eval(bl, its.wi, wo_cam, active_types=types, nested=nst)
        corr = _shading_normal_correction(its.wi, wo_cam, gn_local)
        film = _splat_connection(
            s.film, H, W, sensor, s.thr * f * corr[..., None],
            ray_offset(its.p, its.gn, ss.d), active, scene, static,
        )

        # --- continue the walk
        extend = active & (depth < max_depth)
        u_b = rng_mod.uniform4(seed, particle_idx, sample_idx, dim0 + DIM_BSDF)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        corr_b = _shading_normal_correction(its.wi, bs.wo, gn_local)
        # importance transport: cancel the radiance-convention 1/eta^2
        thr_new = s.thr * bs.weight * (corr_b * bs.eta * bs.eta)[..., None]
        alive = (jnp.max(thr_new, axis=-1) > 0) & (bs.pdf > 0)
        d_new = m.normalize(its.sh_frame.to_world(bs.wo))
        o_new = ray_offset(its.p, its.gn, d_new)

        q = jax.lax.stop_gradient(
            jnp.minimum(jnp.max(thr_new, axis=-1) /
                        jnp.maximum(jnp.max(s.thr, axis=-1), 1e-12), 0.95)
        )
        u_rr = rng_mod.uniform1(seed, particle_idx, sample_idx, dim0 + DIM_RR)
        do_rr = depth >= cfg.rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        thr_new = jnp.where((do_rr & survive)[..., None],
                            thr_new * m.safe_div(1.0, q)[..., None], thr_new)

        active_next = extend & alive & survive
        return _PtState(
            film=film,
            thr=jnp.where(active_next[..., None], thr_new, s.thr),
            o=jnp.where(active_next[..., None], o_new, s.o),
            d=jnp.where(active_next[..., None], d_new, s.d),
            active=active_next,
        )

    out = jax.lax.fori_loop(0, max(max_depth - 1, 0), bounce, init)
    return out.film


def develop_light_image(film_data, n_particles: float):
    """pixel = (W*H / N) * raw splat sum (ptracer_proc.cpp scale)."""
    H, W = film_data.shape[0], film_data.shape[1]
    return film_data[..., :3] * (float(H * W) / float(n_particles))
