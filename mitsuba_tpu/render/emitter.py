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

import jax
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
SPHERE = 7   # analytic sphere area emitter, cone-sampled NEE


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
    # envmap payload (lat-long); minimal when unused. Flat layouts: the
    # radiance+pdf table is (He*We, 4) so one row gather serves both eval
    # and the MIS pdf (multi-dim / 1-D gathers hit XLA:TPU's slow path)
    env_map: jnp.ndarray     # (He*We, 4): radiance rgb + solid-angle pdf
    # Walker alias table over all texels: importance sampling is ONE
    # uniform -> one (N, 2) row gather (prob, alias-id) -> one more row
    # gather for pdf+radiance. CDF searchsorted/bisection lower to
    # serializing while-loops on TPU (profiled at ~70% of a full render
    # pass); the alias method is O(1) and branch-free.
    env_alias: jnp.ndarray   # (He*We, 2): accept prob, alias texel id
    env_hw: jnp.ndarray      # (2,) int32 (He, We)
    env_to_world: jnp.ndarray  # (3, 3) rotation
    env_scale: jnp.ndarray   # () brightness scale

    @property
    def count(self):
        return self.type.shape[0]

    @staticmethod
    def empty_env_fields():
        return dict(
            env_map=jnp.concatenate(
                [jnp.zeros((1, 3)), jnp.full((1, 1), warp.INV_FOURPI)], -1),
            env_alias=jnp.asarray([[1.0, 0.0]]),
            env_hw=jnp.ones((2,), jnp.int32),
            env_to_world=jnp.eye(3),
            env_scale=jnp.ones(()),
        )


def _gather_tri(scene, tri):
    """One wide (T, 13) gather: p0, e1, e2, gn, nee-pdf (per-component
    gathers each hit a slow layout path — Scene.tri_nee_attrs note)."""
    at = scene.tri_nee_attrs[tri]
    return at[..., 0:3], at[..., 3:6], at[..., 6:9], at[..., 9:12], \
        at[..., 12]


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
        p0, e1, e2, n_l_g, pdf_a_g = _gather_tri(scene, tri)
        bc = warp.square_to_uniform_triangle(jnp.stack([u0, u1], axis=-1))
        y = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        to_y = y - p_ref
        dist_a = m.length(to_y)
        d_a = to_y / jnp.maximum(dist_a, 1e-12)[..., None]
        n_l = n_l_g
        cos_l = -m.dot(d_a, n_l)
        # area-measure pdf -> solid angle (common.h measure conversion)
        pdf_a = m.safe_div(pdf_a_g * dist_a * dist_a, jnp.abs(cos_l))
        ok = (cos_l > 1e-7) & (dist_a > 1e-6)
        sel = etype == AREA
        d = jnp.where(sel[..., None], d_a, d)
        dist = jnp.where(sel, dist_a, dist)
        radiance = jnp.where(sel[..., None], em.radiance[e_idx], radiance)
        pdf_sa = jnp.where(sel, pdf_a, pdf_sa)
        valid = jnp.where(sel, ok & (pdf_a > 0), valid)

    if SPHERE in static.emitter_types:
        # solid-angle cone sampling toward an analytic sphere emitter
        # (sphere.cpp sampleDirect): strictly lower variance than sampling
        # the sphere's surface area, since every direction in the cone hits
        from ..core.frame import Frame

        c_s = em.position[e_idx]
        r_s = em.spot_cos[e_idx, 0]        # radius stored in spot_cos[0]
        to_c = c_s - p_ref
        d2c = m.squared_length(to_c)
        dc = jnp.sqrt(jnp.maximum(d2c, 1e-20))
        axis = to_c / dc[..., None]
        outside = dc > r_s * (1.0 + 1e-5)
        sin2_max = jnp.clip(m.safe_div(r_s * r_s, d2c), 0.0, 1.0)
        cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
        # outside: uniform cone; inside: uniform sphere of directions
        cos_t = jnp.where(outside, 1.0 - u0 * (1.0 - cos_max), 1.0 - 2.0 * u0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi_t = 2.0 * jnp.pi * u1
        local_d = jnp.stack(
            [sin_t * jnp.cos(phi_t), sin_t * jnp.sin(phi_t), cos_t], axis=-1)
        d_s = Frame.from_normal(axis).to_world(local_d)
        # near intersection distance along d_s (clamped to tangency)
        proj = dc * cos_t
        under = r_s * r_s - (d2c - proj * proj)
        dist_s = jnp.where(
            outside,
            proj - jnp.sqrt(jnp.maximum(under, 0.0)),
            proj + jnp.sqrt(jnp.maximum(under, 0.0)),
        )
        # 1 - cos_max via sin2/(1+cos) for numerical stability at small cones
        one_minus = m.safe_div(sin2_max, 1.0 + cos_max)
        pdf_s = jnp.where(
            outside,
            m.safe_div(jnp.ones(()), 2.0 * jnp.pi * jnp.maximum(one_minus, 1e-12)),
            warp.INV_FOURPI,
        )
        sel = etype == SPHERE
        d = jnp.where(sel[..., None], d_s, d)
        dist = jnp.where(sel, dist_s, dist)
        radiance = jnp.where(sel[..., None], em.radiance[e_idx], radiance)
        pdf_sa = jnp.where(sel, pdf_s, pdf_sa)
        valid = jnp.where(sel, dist_s > 1e-6, valid)

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
    e_idx: jnp.ndarray     # (R,) int32 chosen emitter row
    epmf: jnp.ndarray      # (R,) discrete selection pmf of that emitter


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
        p0, e1, e2, n_l, pdf_a_g = _gather_tri(scene, tri)
        bc = warp.square_to_uniform_triangle(jnp.stack([u0, u1], axis=-1))
        y = p0 + bc[..., 0:1] * e1 + bc[..., 1:2] * e2
        p_A = jnp.maximum(pdf_a_g, 1e-20)
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

    if SPHERE in static.emitter_types:
        from ..core.frame import Frame

        c_s = em.position[e_idx]
        r_s = em.spot_cos[e_idx, 0]
        n_s = warp.square_to_uniform_sphere(jnp.stack([u0, u1], axis=-1))
        y_s = c_s + r_s[..., None] * n_s
        area_s = 4.0 * jnp.pi * r_s * r_s
        p_A = m.safe_div(epmf, jnp.maximum(area_s, 1e-12))
        wo_local = warp.square_to_cosine_hemisphere(u2)
        d_sp = Frame.from_normal(n_s).to_world(wo_local)
        Le = em.radiance[e_idx]
        w_s = Le * (jnp.pi / jnp.maximum(p_A, 1e-20))[..., None]
        sel = etype == SPHERE
        o = jnp.where(sel[..., None], y_s, o)
        d = jnp.where(sel[..., None], d_sp, d)
        weight = jnp.where(sel[..., None], w_s, weight)
        n_out = jnp.where(sel[..., None], n_s, n_out)
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
        e_idx=e_idx, epmf=epmf,
    )


def pdf_direct_sphere(em: EmitterTable, e_idx, p_ref, c_s, r_s):
    """Solid-angle pdf that sphere-cone NEE (sample_direct SPHERE branch)
    would generate a direction from p_ref hitting emitter e_idx's sphere —
    the BSDF-side MIS counterweight (sphere.cpp pdfDirect role). Includes
    the emitter-selection pmf."""
    to_c = c_s - p_ref
    d2c = m.squared_length(to_c)
    dc = jnp.sqrt(jnp.maximum(d2c, 1e-20))
    outside = dc > r_s * (1.0 + 1e-5)
    sin2_max = jnp.clip(m.safe_div(r_s * r_s, d2c), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    one_minus = m.safe_div(sin2_max, 1.0 + cos_max)
    pdf = jnp.where(
        outside,
        m.safe_div(jnp.ones(()), 2.0 * jnp.pi * jnp.maximum(one_minus, 1e-12)),
        warp.INV_FOURPI,
    )
    return pdf * em.pmf[e_idx]


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


def eval_env_pdf(scene, static, d_world):
    """Fused Scene::evalEnvironment + NEE pdf toward the environment
    (one flat gather serves both; the separate calls each paid their own
    gather at every bounce)."""
    em = scene.emitters
    has_env = em.env_index >= 0
    e_idx = jnp.maximum(em.env_index, 0)
    pmf = em.pmf[e_idx]
    etype = em.type[e_idx]
    shape = d_world.shape[:-1]
    rad = jnp.broadcast_to(
        jnp.where(etype == CONSTANT, em.radiance[e_idx], jnp.zeros((3,))),
        shape + (3,))
    pdf = jnp.where(etype == CONSTANT,
                    jnp.full(shape, warp.INV_FOURPI), 0.0)
    if ENVMAP in static.emitter_types:
        r_e, p_e = _envmap_eval_pdf(em, d_world)
        is_env = etype == ENVMAP
        rad = jnp.where(is_env, r_e, rad)
        pdf = jnp.where(is_env, p_e, pdf)
    return (jnp.where(has_env, rad, 0.0),
            jnp.where(has_env, pdf * pmf, 0.0))


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


def _env_fetch(em: EmitterTable, y, x):
    """(radiance (R, 3), pdf (R,)) via ONE flat row gather."""
    W = em.env_hw[1]
    rp = em.env_map[y * W + x]
    return rp[..., :3] * em.env_scale, rp[..., 3]


def _envmap_eval(em: EmitterTable, d_world):
    H, W = em.env_hw[0], em.env_hw[1]
    u, v = _dir_to_uv(em, d_world)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return _env_fetch(em, y, x)[0]


def _envmap_pdf(em: EmitterTable, d_world):
    H, W = em.env_hw[0], em.env_hw[1]
    u, v = _dir_to_uv(em, d_world)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return _env_fetch(em, y, x)[1]


def _envmap_eval_pdf(em: EmitterTable, d_world):
    """Fused radiance + pdf lookup (one gather for both)."""
    H, W = em.env_hw[0], em.env_hw[1]
    u, v = _dir_to_uv(em, d_world)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return _env_fetch(em, y, x)


def _envmap_sample(em: EmitterTable, u2):
    """O(1) texel pick via the Walker alias table, then uniform jitter
    within the texel (envmap.cpp importance sampling, alias-table form)."""
    H, W = em.env_hw[0], em.env_hw[1]
    N = em.env_alias.shape[0]
    u0 = jnp.clip(u2[..., 0], 0.0, 1.0 - 1e-7)
    scaled = u0 * N
    i0 = jnp.clip(scaled.astype(jnp.int32), 0, N - 1)
    u_re = scaled - i0.astype(jnp.float32)          # recycled uniform
    pa = em.env_alias[i0]
    take = u_re < pa[..., 0]
    idx = jnp.where(take, i0, pa[..., 1].astype(jnp.int32))
    # second recycle: position within the accept/reject split
    u_j = jnp.where(
        take,
        u_re / jnp.maximum(pa[..., 0], 1e-12),
        (u_re - pa[..., 0]) / jnp.maximum(1.0 - pa[..., 0], 1e-12),
    )
    row = idx // W
    col = idx - row * W
    uu = (col.astype(jnp.float32) + jnp.clip(u_j, 0.0, 1.0 - 1e-6)) / W
    vv = (row.astype(jnp.float32) + jnp.clip(u2[..., 1], 0.0, 1.0 - 1e-6)) / H
    theta = vv * jnp.pi
    phi = uu * 2.0 * jnp.pi
    d_local = m.spherical_direction(theta, phi)
    d_world = d_local @ em.env_to_world.T
    rad, pdf = _env_fetch(em, row, col)
    return d_world, pdf, rad
