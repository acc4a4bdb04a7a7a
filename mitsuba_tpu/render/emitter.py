"""Emitters and next-event estimation (reference: src/emitters/*,
Scene::sampleEmitterDirect scene.cpp:828-852, pdfEmitterDirect :949).

Emitter storage is a flat table; area emitters own a contiguous range of an
"emissive triangle" array with a *globally monotone* CDF: entry j stores
``emitter_index + local_cdf`` so that picking emitter e with residual u maps
to a single vectorized ``searchsorted(etri_cdf, e + u)`` — no per-emitter
segmented search. Per-triangle NEE area pdfs are precomputed densely over
all scene triangles (tri_nee_pdf_area) so the path tracer's BSDF-side MIS
weight is one gather.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from .records import DirectSample

AREA = 0
POINT = 1
CONSTANT = 2
ENVMAP = 3
DIRECTIONAL = 4
SPOT = 5
COLLIMATED = 6


class EmitterTable(NamedTuple):
    type: jnp.ndarray        # (E,) int32
    radiance: jnp.ndarray    # (E, 3) radiance / intensity / irradiance
    position: jnp.ndarray    # (E, 3)
    direction: jnp.ndarray   # (E, 3) unit (directional/spot)
    spot_cos: jnp.ndarray    # (E, 2) cos(cutoff), cos(beamwidth)
    tri_start: jnp.ndarray   # (E,) int32 into etri arrays (area)
    tri_count: jnp.ndarray   # (E,)
    delta: jnp.ndarray       # (E,) bool
    pmf: jnp.ndarray         # (E,) emitter-selection pmf
    cdf: jnp.ndarray         # (E,) emitter-selection cdf (inclusive)
    # emissive triangles (flat across all area emitters)
    etri_tri: jnp.ndarray    # (ET,) int32 scene triangle index
    etri_cdf: jnp.ndarray    # (ET,) float32: emitter_idx + local_cdf
    env_index: jnp.ndarray   # () int32: index of env emitter (-1 if none)
    # envmap payload (lat-long); minimal when unused
    env_map: jnp.ndarray     # (He, We, 3)
    env_cdf_rows: jnp.ndarray  # (He,) marginal cdf over rows (lum * sin(theta))
    env_cdf_cond: jnp.ndarray  # (He, We) conditional cdf along each row
    env_pdf: jnp.ndarray     # (He, We) solid-angle pdf of env sampling
    env_to_world: jnp.ndarray  # (3, 3) rotation
    env_scale: jnp.ndarray   # () brightness scale

    @property
    def count(self):
        return self.type.shape[0]

    @staticmethod
    def empty_env_fields():
        return dict(
            env_map=jnp.zeros((1, 1, 3)),
            env_cdf_rows=jnp.ones((1,)),
            env_cdf_cond=jnp.ones((1, 1)),
            env_pdf=jnp.full((1, 1), warp.INV_FOURPI),
            env_to_world=jnp.eye(3),
            env_scale=jnp.ones(()),
        )


def _gather_tri(scene, tri):
    p0 = scene.tri_p0[tri]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    return p0, e1, e2


def sample_direct(scene, static, p_ref, u3):
    """Scene::sampleEmitterDirect analog. p_ref (R,3); u3 (R,3) randoms.

    Returns DirectSample. Visibility is NOT tested here (the integrator
    traces the shadow ray), matching the split in the wavefront design.
    """
    em = scene.emitters
    R = p_ref.shape[0]
    u_sel, u0, u1 = u3[..., 0], u3[..., 1], u3[..., 2]

    # emitter pick via cdf (uniform weights by default, scene.cpp:375-381)
    e_idx = jnp.clip(
        jnp.searchsorted(em.cdf, u_sel, side="right"), 0, em.count - 1
    ).astype(jnp.int32)
    lo_cdf = jnp.where(e_idx > 0, em.cdf[jnp.maximum(e_idx - 1, 0)], 0.0)
    u_re = jnp.clip(
        m.safe_div(u_sel - lo_cdf, jnp.maximum(em.pmf[e_idx], 1e-12)), 0.0, 1.0 - 1e-7
    )
    etype = em.type[e_idx]
    epmf = em.pmf[e_idx]

    d = jnp.zeros((R, 3))
    dist = jnp.full((R,), jnp.inf)
    radiance = jnp.zeros((R, 3))
    pdf_sa = jnp.zeros((R,))
    delta = jnp.zeros((R,), bool)
    valid = jnp.zeros((R,), bool)

    if AREA in static.emitter_types:
        # triangle pick through the globally-monotone cdf
        key = e_idx.astype(jnp.float32) + u_re
        j = jnp.clip(
            jnp.searchsorted(em.etri_cdf, key, side="right"),
            0, em.etri_tri.shape[0] - 1,
        )
        tri = em.etri_tri[j]
        p0, e1, e2 = _gather_tri(scene, tri)
        bc = warp.square_to_uniform_triangle(jnp.stack([u0, u1], axis=-1))
        y = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        to_y = y - p_ref
        dist_a = m.length(to_y)
        d_a = to_y / jnp.maximum(dist_a, 1e-12)[..., None]
        n_l = scene.tri_gn[tri]
        cos_l = -m.dot(d_a, n_l)
        # area-measure pdf -> solid angle (common.h measure conversion)
        pdf_area = scene.tri_nee_pdf_area[tri]
        pdf_a = m.safe_div(pdf_area * dist_a * dist_a, jnp.abs(cos_l))
        ok = (cos_l > 1e-7) & (dist_a > 1e-6)
        sel = etype == AREA
        d = jnp.where(sel[..., None], d_a, d)
        dist = jnp.where(sel, dist_a, dist)
        radiance = jnp.where(sel[..., None], em.radiance[e_idx], radiance)
        pdf_sa = jnp.where(sel, pdf_a, pdf_sa)
        valid = jnp.where(sel, ok & (pdf_a > 0), valid)

    if POINT in static.emitter_types:
        to_p = em.position[e_idx] - p_ref
        dist_p = m.length(to_p)
        d_p = to_p / jnp.maximum(dist_p, 1e-12)[..., None]
        val = em.radiance[e_idx] / jnp.maximum(dist_p * dist_p, 1e-12)[..., None]
        sel = etype == POINT
        d = jnp.where(sel[..., None], d_p, d)
        dist = jnp.where(sel, dist_p, dist)
        radiance = jnp.where(sel[..., None], val, radiance)
        pdf_sa = jnp.where(sel, epmf, pdf_sa)  # delta: report selection pmf
        delta = jnp.where(sel, True, delta)
        valid = jnp.where(sel, dist_p > 1e-6, valid)

    if SPOT in static.emitter_types:
        to_p = em.position[e_idx] - p_ref
        dist_p = m.length(to_p)
        d_p = to_p / jnp.maximum(dist_p, 1e-12)[..., None]
        cos_f = -m.dot(d_p, em.direction[e_idx])
        cc, cb = em.spot_cos[e_idx, 0], em.spot_cos[e_idx, 1]
        fall = jnp.clip(m.safe_div(cos_f - cc, cb - cc), 0.0, 1.0)
        fall = jnp.where(cos_f >= cb, 1.0, fall)
        fall = jnp.where(cos_f <= cc, 0.0, fall)
        val = em.radiance[e_idx] * (fall / jnp.maximum(dist_p * dist_p, 1e-12))[..., None]
        sel = etype == SPOT
        d = jnp.where(sel[..., None], d_p, d)
        dist = jnp.where(sel, dist_p, dist)
        radiance = jnp.where(sel[..., None], val, radiance)
        pdf_sa = jnp.where(sel, epmf, pdf_sa)
        delta = jnp.where(sel, True, delta)
        valid = jnp.where(sel, (dist_p > 1e-6) & (fall > 0), valid)

    if DIRECTIONAL in static.emitter_types:
        d_dir = -em.direction[e_idx]
        sel = etype == DIRECTIONAL
        d = jnp.where(sel[..., None], d_dir, d)
        dist = jnp.where(sel, 2.0 * scene.radius, dist)
        radiance = jnp.where(sel[..., None], em.radiance[e_idx], radiance)
        pdf_sa = jnp.where(sel, epmf, pdf_sa)
        delta = jnp.where(sel, True, delta)
        valid = jnp.where(sel, True, valid)

    if CONSTANT in static.emitter_types:
        d_c = warp.square_to_uniform_sphere(jnp.stack([u0, u1], axis=-1))
        sel = etype == CONSTANT
        d = jnp.where(sel[..., None], d_c, d)
        dist = jnp.where(sel, 2.0 * scene.radius, dist)
        radiance = jnp.where(sel[..., None], em.radiance[e_idx], radiance)
        pdf_sa = jnp.where(sel, warp.INV_FOURPI, pdf_sa)
        valid = jnp.where(sel, True, valid)

    if ENVMAP in static.emitter_types:
        d_e, pdf_e, rad_e = _envmap_sample(em, jnp.stack([u0, u1], axis=-1))
        sel = etype == ENVMAP
        d = jnp.where(sel[..., None], d_e, d)
        dist = jnp.where(sel, 2.0 * scene.radius, dist)
        radiance = jnp.where(sel[..., None], rad_e, radiance)
        pdf_sa = jnp.where(sel, pdf_e, pdf_sa)
        valid = jnp.where(sel, pdf_e > 0, valid)

    # fold the emitter-selection pmf into the (non-delta) solid-angle pdf
    pdf_sa = jnp.where(delta, pdf_sa, pdf_sa * jnp.where(etype == AREA, 1.0, epmf))
    # (AREA already folded em.pmf into tri_nee_pdf_area at build time)
    return DirectSample(
        d=d, dist=dist, radiance=radiance, pdf_sa=pdf_sa, delta=delta, valid=valid
    )


class EmitterRaySample(NamedTuple):
    """Result of Scene::sampleEmitterRay (scene.cpp:981) — a light-carrying
    ray for particle tracing, with everything the camera connection at the
    emitter vertex itself needs."""

    o: jnp.ndarray         # (R, 3) ray origin (on the emitter / env disk)
    d: jnp.ndarray         # (R, 3) emission direction
    weight: jnp.ndarray    # (R, 3) power / pdf throughput for the walk
    n: jnp.ndarray         # (R, 3) emitter surface normal (0 for non-area)
    pdf_area: jnp.ndarray  # (R,) area pdf of the emitter vertex (area only)
    radiance: jnp.ndarray  # (R, 3) Le at the vertex (area only)
    is_area: jnp.ndarray   # (R,) bool: vertex is a visible emitting surface
    valid: jnp.ndarray     # (R,) bool


def sample_ray(scene, static, u4, u2):
    """Sample an emitter + a light-carrying ray (AbstractEmitter::sampleRay
    dispatched over the table; emitter pick via the same CDF as NEE).

    ``u4``: emitter select + 2D position + 1 spare; ``u2``: direction.
    ``weight`` is radiant power over all sampling pdfs, so a particle
    tracer's estimator is E[sum splat(weight * ...)] with no further
    normalization beyond 1/N_particles.
    """
    em = scene.emitters
    R = u4.shape[0]
    u_sel, u0, u1 = u4[..., 0], u4[..., 1], u4[..., 2]

    e_idx = jnp.clip(
        jnp.searchsorted(em.cdf, u_sel, side="right"), 0, em.count - 1
    ).astype(jnp.int32)
    lo_cdf = jnp.where(e_idx > 0, em.cdf[jnp.maximum(e_idx - 1, 0)], 0.0)
    u_re = jnp.clip(
        m.safe_div(u_sel - lo_cdf, jnp.maximum(em.pmf[e_idx], 1e-12)), 0.0, 1.0 - 1e-7
    )
    etype = em.type[e_idx]
    epmf = jnp.maximum(em.pmf[e_idx], 1e-12)

    o = jnp.zeros((R, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    weight = jnp.zeros((R, 3))
    n_out = jnp.zeros((R, 3))
    pdf_area = jnp.zeros((R,))
    radiance = jnp.zeros((R, 3))
    is_area = jnp.zeros((R,), bool)
    valid = jnp.zeros((R,), bool)

    center = 0.5 * (scene.aabb_lo + scene.aabb_hi)
    radius = scene.radius

    if AREA in static.emitter_types:
        # vertex ~ area-weighted triangle + uniform barycentrics
        key = e_idx.astype(jnp.float32) + u_re
        j = jnp.clip(
            jnp.searchsorted(em.etri_cdf, key, side="right"),
            0, em.etri_tri.shape[0] - 1,
        )
        tri = em.etri_tri[j]
        p0, e1, e2 = _gather_tri(scene, tri)
        bc = warp.square_to_uniform_triangle(jnp.stack([u0, u1], axis=-1))
        y = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        n_l = scene.tri_gn[tri]
        p_A = jnp.maximum(scene.tri_nee_pdf_area[tri], 1e-20)
        # direction ~ cosine hemisphere about the (front) geometric normal
        from ..core.frame import Frame

        wo_local = warp.square_to_cosine_hemisphere(u2)
        d_a = Frame.from_normal(n_l).to_world(wo_local)
        Le = em.radiance[e_idx]
        # weight = Le cos / (p_A * cos/pi) = Le * pi / p_A
        w_a = Le * (jnp.pi / p_A)[..., None]
        sel = etype == AREA
        o = jnp.where(sel[..., None], y, o)
        d = jnp.where(sel[..., None], d_a, d)
        weight = jnp.where(sel[..., None], w_a, weight)
        n_out = jnp.where(sel[..., None], n_l, n_out)
        pdf_area = jnp.where(sel, p_A, pdf_area)
        radiance = jnp.where(sel[..., None], Le, radiance)
        is_area = jnp.where(sel, True, is_area)
        valid = jnp.where(sel, wo_local[..., 2] > 0, valid)

    if POINT in static.emitter_types:
        d_p = warp.square_to_uniform_sphere(u2)
        w_p = em.radiance[e_idx] * (4.0 * jnp.pi / epmf)[..., None]
        sel = etype == POINT
        o = jnp.where(sel[..., None], em.position[e_idx], o)
        d = jnp.where(sel[..., None], d_p, d)
        weight = jnp.where(sel[..., None], w_p, weight)
        valid = jnp.where(sel, True, valid)

    if SPOT in static.emitter_types:
        # uniform cone up to the cutoff (spot.cpp sampleRay)
        cc = em.spot_cos[e_idx, 0]
        cb = em.spot_cos[e_idx, 1]
        local = warp.square_to_uniform_cone(u2, cc)
        from ..core.frame import Frame

        d_s = Frame.from_normal(em.direction[e_idx]).to_world(local)
        cos_f = local[..., 2]
        fall = jnp.clip(m.safe_div(cos_f - cc, cb - cc), 0.0, 1.0)
        fall = jnp.where(cos_f >= cb, 1.0, fall)
        pdf_cone = warp.square_to_uniform_cone_pdf(cc)
        w_s = em.radiance[e_idx] * (fall / (pdf_cone * epmf))[..., None]
        sel = etype == SPOT
        o = jnp.where(sel[..., None], em.position[e_idx], o)
        d = jnp.where(sel[..., None], d_s, d)
        weight = jnp.where(sel[..., None], w_s, weight)
        valid = jnp.where(sel, True, valid)

    def _disk_origin(d_emit, u2_):
        """Point on the scene-bounding disk perpendicular to d_emit
        (directional.cpp / envmap.cpp sampleRay)."""
        from ..core.frame import Frame

        fr_ = Frame.from_normal(d_emit)
        dsk = warp.square_to_uniform_disk_concentric(u2_) * radius
        off = fr_.to_world(
            jnp.concatenate([dsk, jnp.zeros_like(dsk[..., :1])], axis=-1)
        )
        return center - d_emit * radius + off

    if DIRECTIONAL in static.emitter_types:
        d_dir = em.direction[e_idx]
        o_d = _disk_origin(d_dir, jnp.stack([u0, u1], axis=-1))
        w_d = em.radiance[e_idx] * (jnp.pi * radius * radius / epmf)[..., None]
        sel = etype == DIRECTIONAL
        o = jnp.where(sel[..., None], o_d, o)
        d = jnp.where(sel[..., None], d_dir, d)
        weight = jnp.where(sel[..., None], w_d, weight)
        valid = jnp.where(sel, True, valid)

    if COLLIMATED in static.emitter_types:
        sel = etype == COLLIMATED
        o = jnp.where(sel[..., None], em.position[e_idx], o)
        d = jnp.where(sel[..., None], em.direction[e_idx], d)
        weight = jnp.where(sel[..., None], em.radiance[e_idx] / epmf[..., None],
                           weight)
        valid = jnp.where(sel, True, valid)

    if CONSTANT in static.emitter_types:
        d_env = warp.square_to_uniform_sphere(u2)  # direction toward the env
        o_c = _disk_origin(-d_env, jnp.stack([u0, u1], axis=-1))
        w_c = em.radiance[e_idx] * (
            4.0 * jnp.pi * jnp.pi * radius * radius / epmf
        )[..., None]
        sel = etype == CONSTANT
        o = jnp.where(sel[..., None], o_c, o)
        d = jnp.where(sel[..., None], -d_env, d)
        weight = jnp.where(sel[..., None], w_c, weight)
        valid = jnp.where(sel, True, valid)

    if ENVMAP in static.emitter_types:
        d_env, pdf_e, rad_e = _envmap_sample(em, u2)
        o_e = _disk_origin(-d_env, jnp.stack([u0, u1], axis=-1))
        w_e = rad_e * m.safe_div(
            jnp.pi * radius * radius, pdf_e * epmf
        )[..., None]
        sel = etype == ENVMAP
        o = jnp.where(sel[..., None], o_e, o)
        d = jnp.where(sel[..., None], -d_env, d)
        weight = jnp.where(sel[..., None], w_e, weight)
        valid = jnp.where(sel, pdf_e > 0, valid)

    return EmitterRaySample(
        o=o, d=d, weight=weight, n=n_out, pdf_area=pdf_area,
        radiance=radiance, is_area=is_area, valid=valid,
    )


def pdf_direct_env(scene, static, d_world):
    """Solid-angle pdf that NEE would generate escaping direction d
    toward the environment emitter (for BSDF-side MIS)."""
    em = scene.emitters
    has_env = em.env_index >= 0
    e_idx = jnp.maximum(em.env_index, 0)
    pmf = em.pmf[e_idx]
    etype = em.type[e_idx]
    pdf = jnp.where(etype == CONSTANT, jnp.full(d_world.shape[:-1], warp.INV_FOURPI), 0.0)
    if ENVMAP in static.emitter_types:
        pdf = jnp.where(etype == ENVMAP, _envmap_pdf(em, d_world), pdf)
    return jnp.where(has_env, pdf * pmf, 0.0)


def eval_env(scene, static, d_world):
    """Environment radiance along escaped rays (Scene::evalEnvironment)."""
    em = scene.emitters
    has_env = em.env_index >= 0
    e_idx = jnp.maximum(em.env_index, 0)
    etype = em.type[e_idx]
    rad = jnp.where(
        (etype == CONSTANT), em.radiance[e_idx], jnp.zeros((3,))
    )
    rad = jnp.broadcast_to(rad, d_world.shape[:-1] + (3,))
    if ENVMAP in static.emitter_types:
        rad = jnp.where((etype == ENVMAP), _envmap_eval(em, d_world), rad)
    return jnp.where(has_env & True, rad, 0.0)


# --- lat-long environment map (envmap.cpp:99-299) --------------------------

def _dir_to_uv(em: EmitterTable, d_world):
    d = d_world @ em.env_to_world  # world -> env local (rotation transpose)
    theta, phi = m.spherical_coordinates(d)
    u = phi * warp.INV_TWOPI
    v = theta * warp.INV_PI
    return u, v


def _envmap_eval(em: EmitterTable, d_world):
    H, W = em.env_map.shape[0], em.env_map.shape[1]
    u, v = _dir_to_uv(em, d_world)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return em.env_map[y, x] * em.env_scale


def _envmap_pdf(em: EmitterTable, d_world):
    H, W = em.env_map.shape[0], em.env_map.shape[1]
    u, v = _dir_to_uv(em, d_world)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return em.env_pdf[y, x]


def _envmap_sample(em: EmitterTable, u2):
    H, W = em.env_map.shape[0], em.env_map.shape[1]
    row = jnp.clip(
        jnp.searchsorted(em.env_cdf_rows, u2[..., 0], side="right"), 0, H - 1
    )
    lo = jnp.where(row > 0, em.env_cdf_rows[jnp.maximum(row - 1, 0)], 0.0)
    pr = jnp.maximum(em.env_cdf_rows[row] - lo, 1e-12)
    u_re = jnp.clip((u2[..., 0] - lo) / pr, 0.0, 1.0 - 1e-7)
    col_cdf = em.env_cdf_cond[row]
    col = jnp.clip(_rowwise_search(col_cdf, u2[..., 1]), 0, W - 1)
    # jitter within the texel for continuous directions
    uu = (col.astype(jnp.float32) + u_re) / W
    vv = (row.astype(jnp.float32) + 0.5) / H
    theta = vv * jnp.pi
    phi = uu * 2.0 * jnp.pi
    d_local = m.spherical_direction(theta, phi)
    d_world = d_local @ em.env_to_world.T
    pdf = em.env_pdf[row, col]
    rad = em.env_map[row, col] * em.env_scale
    return d_world, pdf, rad


def _rowwise_search(cdf_rows, u):
    """searchsorted along the last axis of a per-lane gathered cdf row."""
    # cdf_rows: (R, W); u: (R,)
    return jnp.sum((cdf_rows < u[..., None]).astype(jnp.int32), axis=-1)
