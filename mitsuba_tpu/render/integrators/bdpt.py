"""Bidirectional path tracer (reference: src/integrators/bdpt/{bdpt.cpp:25,
bdpt_proc.cpp, bdpt_wr.cpp} over libbidir, src/libbidir/{vertex.cpp,
edge.cpp, path.cpp, pathsampler.cpp}).

TPU-native redesign of libbidir: instead of pointer-linked PathVertex
objects recycled through a memory pool (mempool.h), each subpath is a
**struct of (K, R) arrays** — one row per vertex depth, one lane per pixel
— filled by a lock-step random walk. Every (s,t) connection strategy is a
batched tensor expression over those arrays; the python loop over (s,t) is
unrolled at trace time (each strategy compiles once), mirroring the
strategy enumeration in PathSampler::sampleSplats (pathsampler.cpp).

Conventions (this module):
* t = number of eye-side SURFACE vertices z_1..z_t (camera z_0 implicit),
* s = number of light-side vertices y_0..y_{s-1} (y_0 on the emitter),
* a strategy (s,t) renders paths of s+t segments; s=0 means the eye path
  hit the emitter; t=0 means the light subpath splats to the camera
  (accumulated into a shared light image, bdpt_wr.cpp).

MIS weights use the POWER-heuristic (beta=2) pdf-ratio walk over
per-vertex forward/reverse area pdfs (libbidir Path::misWeight,
path.cpp:266 squares every alternative's ratio), with delta vertices'
ratios passed through and zero pdfs remapped to one. The reverse pdfs of
the four junction-adjacent vertices are recomputed per strategy; all
others are filled during the random walk.

Media (vertex.cpp EMediumInteraction role): when the scene carries
media, every walk segment first samples a medium scattering distance;
scatter events become MEDIUM vertices (zero normal, phase-function
extension and junction pdfs, volume-measure density conversion with
cos := 1), transmissive boundaries swap the per-lane medium, and every
connection weights its visibility segment by the attenuated
transmittance through null-boundary chains.

Scope: area + analytic-sphere emitters plus delta-POSITION emitters
(point/spot, vertex.h EDeltaPosition role — their in-view (s=1, t=0)
splat draws the light as a dot exactly like the reference light image)
and delta-DIRECTION emitters (directional/collimated, vertex.h
EDeltaDirection role — degenerate y_0, transport through the
light-tracing family s>=2 + t=0 splats; matches the reference's plain
BDPT strategy set with sampleDirect repositioning omitted). Sensors:
pinhole perspective/thinlens and orthographic (EDeltaDirection camera:
film-area densities + parallel-projection t=0 splats); telecentric is
bidirectional-incompatible exactly like the reference
(telecentric.cpp sampleDirection EError) and routes to the
unidirectional family. Subpaths start in the camera medium.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from ...core.frame import Frame
from .. import bsdf as bsdf_mod
from .. import emitter as em_mod
from .. import medium as medium_mod
from .. import phase as phase_mod
from .. import scene as scene_mod
from .. import sensor as sensor_mod
from ..records import Interaction
from .common import IntegratorConfig, ray_offset
from .ptracer import _shading_normal_correction

# RNG dimension blocks (per sample): eye walk at 4.., light walk at 42..
DIM_EYE_BASE = 4
DIM_LIGHT_EMIT = 40
DIM_LIGHT_BASE = 42
DIMS_PER_BOUNCE = 4
INV_PI = 1.0 / jnp.pi


class Subpath(NamedTuple):
    """(K, R) vertex arrays for one subpath side."""

    p: jnp.ndarray         # (K, R, 3)
    gn: jnp.ndarray        # (K, R, 3) geometric normal
    ns: jnp.ndarray        # (K, R, 3) shading normal
    uv: jnp.ndarray        # (K, R, 2)
    mat_id: jnp.ndarray    # (K, R)
    emitter_id: jnp.ndarray  # (K, R)
    wi_world: jnp.ndarray  # (K, R, 3) unit dir toward the PREVIOUS vertex
    beta: jnp.ndarray      # (K, R, 3) cumulative throughput to this vertex
    pdf_fwd: jnp.ndarray   # (K, R) area pdf of this vertex from the prev
    pdf_rev: jnp.ndarray   # (K, R) area pdf of this vertex from the next
    delta: jnp.ndarray     # (K, R) bool: reached via a delta lobe
    delta_origin: jnp.ndarray  # (K, R) bool: delta-POSITION light vertex
                               # (own s=0 alternative impossible, but the
                               # neighbor's alternatives stay valid —
                               # pbrt/veach IsDeltaLight distinction)
    conn: jnp.ndarray      # (K, R) bool: has a smooth lobe (connectible)
    light_pdf_a: jnp.ndarray  # (K, R) emitter-origin area pdf (0 if none)
    valid: jnp.ndarray     # (K, R)
    is_med: jnp.ndarray    # (K, R) bool: vertex is a medium scatter event
    med_id: jnp.ndarray    # (K, R) int32 medium at a medium vertex (-1 else)

    @staticmethod
    def empty(K, R):
        z3 = jnp.zeros((K, R, 3))
        return Subpath(
            p=z3, gn=z3, ns=z3, uv=jnp.zeros((K, R, 2)),
            mat_id=jnp.full((K, R), -1, jnp.int32),
            emitter_id=jnp.full((K, R), -1, jnp.int32),
            wi_world=z3, beta=z3,
            pdf_fwd=jnp.zeros((K, R)), pdf_rev=jnp.zeros((K, R)),
            delta=jnp.zeros((K, R), bool),
            delta_origin=jnp.zeros((K, R), bool),
            conn=jnp.zeros((K, R), bool),
            light_pdf_a=jnp.zeros((K, R)), valid=jnp.zeros((K, R), bool),
            is_med=jnp.zeros((K, R), bool),
            med_id=jnp.full((K, R), -1, jnp.int32),
        )


def _to_area(pdf_sa, dir_unit, dist2, n_target):
    """Solid-angle pdf at the source -> area pdf at the target vertex.
    Medium vertices carry a ZERO normal and convert with cos := 1 (volume
    density, vertex.cpp EMediumInteraction / pbrt ConvertDensity)."""
    is_vol = m.squared_length(n_target) < 0.5
    cos_t = jnp.where(is_vol, 1.0, jnp.abs(m.dot(n_target, -dir_unit)))
    return pdf_sa * m.safe_div(cos_t, jnp.maximum(dist2, 1e-12))


def _vertex_locals(scene, static, sp: Subpath, k: int):
    """(bsdf locals, nested, frame) for vertex row k."""
    ok_n = sp.valid[k] & (m.squared_length(sp.ns[k]) > 0.5)
    ns_safe = jnp.where(ok_n[..., None], sp.ns[k],
                        jnp.asarray([0.0, 0.0, 1.0]))
    frame = Frame.from_normal(ns_safe)
    its = Interaction(
        valid=sp.valid[k], t=jnp.zeros(sp.valid[k].shape), p=sp.p[k],
        gn=sp.gn[k], sh_frame=frame, uv=sp.uv[k],
        wi=frame.to_local(sp.wi_world[k]), wi_world=sp.wi_world[k],
        mat_id=sp.mat_id[k], emitter_id=sp.emitter_id[k],
        prim_id=jnp.full(sp.valid[k].shape, -1, jnp.int32),
        nee_pdf_area=sp.light_pdf_a[k],
        bary=jnp.zeros(sp.valid[k].shape + (2,)),
    )
    bl = scene_mod.bsdf_locals(scene, its, static)
    nst = scene_mod.bsdf_nested(scene, its, static)
    return bl, nst, frame


def _phase_args(scene, static, med_id):
    """(ptype array, PhaseParams, active phase types) for medium ids."""
    med = scene.media
    mid = jnp.maximum(med_id, 0)
    params = phase_mod.PhaseParams(
        g=med.phase_g[mid], g2=med.phase_g2[mid], w2=med.phase_w2[mid],
        ks=med.phase_ks[mid], exponent=med.phase_exp[mid],
        sigma=med.phase_sigma[mid], axis=med.phase_axis[mid],
    )
    ptypes = static.phase_types if static.phase_types else (0,)
    return med.phase_type[mid], params, ptypes


def _vertex_f(scene, static, sp: Subpath, k: int, loc, wi_world, wo_world):
    """Scattering value at vertex row k: BSDF eval (cos-included, surface)
    or phase value (medium) toward world direction wo (vertex.cpp eval
    dispatch over ESurfaceInteraction/EMediumInteraction)."""
    bl, nst, frame = loc
    wi_l = frame.to_local(wi_world)
    wo_l = frame.to_local(wo_world)
    f = bsdf_mod.eval(bl, wi_l, wo_l, active_types=static.bsdf_types,
                      nested=nst)
    if static.medium_types:
        pt, pp, ptys = _phase_args(scene, static, sp.med_id[k])
        ph, _ = phase_mod.eval_pdf(pt, pp, wi_world, wo_world,
                                   active_types=ptys)
        f = jnp.where(sp.is_med[k][..., None], ph[..., None], f)
    return f


def _vertex_pdf_toward(scene, static, sp: Subpath, k: int, loc, wi_world,
                       wo_world, dist2, n_target):
    """Area pdf of sampling ``wo_world`` at vertex row k (BSDF-or-phase
    directional pdf, converted to the target's measure)."""
    bl, nst, frame = loc
    wi_l = frame.to_local(wi_world)
    wo_l = frame.to_local(wo_world)
    pdf_sa = bsdf_mod.pdf(bl, wi_l, wo_l, active_types=static.bsdf_types,
                          nested=nst)
    if static.medium_types:
        pt, pp, ptys = _phase_args(scene, static, sp.med_id[k])
        _, pdf_ph = phase_mod.eval_pdf(pt, pp, wi_world, wo_world,
                                       active_types=ptys)
        pdf_sa = jnp.where(sp.is_med[k], pdf_ph, pdf_sa)
    return _to_area(pdf_sa, wo_world, dist2, n_target)


class _W(NamedTuple):
    sp: Subpath
    o: jnp.ndarray
    d: jnp.ndarray
    beta: jnp.ndarray
    pdf_dir: jnp.ndarray
    seg_delta: jnp.ndarray
    active: jnp.ndarray
    medium: jnp.ndarray


def random_walk(scene, static, sp: Subpath, o0, d0, beta0, pdf_dir0,
                offset: int, n_steps: int, seed, lane, sample,
                dim_base: int, importance_mode: bool, medium0=None):
    """Fill rows offset..offset+n_steps-1 of ``sp`` by walking from
    (o0, d0). Fills pdf_rev of row j-1 when extending row j (libbidir
    Path::randomWalk, path.cpp). With media present (static.medium_types),
    each segment first samples a medium scattering distance; a scatter
    event records a MEDIUM vertex (vertex.cpp EMediumInteraction role:
    zero normal, phase-function extension, volume-density pdfs) and
    transmissive surface crossings swap the per-lane medium."""
    types = static.bsdf_types
    delta_types = tuple(t for t in types if t in bsdf_mod.DELTA_TYPES)
    mtypes = static.medium_types
    R = o0.shape[0]
    if medium0 is None:
        medium0 = jnp.full(R, -1, jnp.int32)

    st = _W(sp=sp, o=o0, d=d0, beta=beta0, pdf_dir=pdf_dir0,
            seg_delta=jnp.zeros(R, bool),
            active=jnp.max(beta0, -1) > 0,
            medium=medium0)

    def bounce(i, w: _W):
        j = i + offset
        its = scene_mod.ray_intersect(
            scene, static, w.o, w.d, 1e-4, jnp.inf, active=w.active
        )
        hit_surf = w.active & its.valid

        # --- medium distance sampling along the segment (volpath.cpp:104)
        if mtypes:
            t_seg = jnp.where(its.valid, its.t, jnp.inf)
            ms = medium_mod.sample_distance(
                scene.media, mtypes, w.medium, w.o, w.d, t_seg,
                seed, lane, sample, dim_base + i * DIMS_PER_BOUNCE + 1,
                w.active)
            in_scatter = w.active & ms.sampled
            beta_here = w.beta * ms.weight
            active = in_scatter | hit_surf
        else:
            in_scatter = jnp.zeros(R, bool)
            beta_here = w.beta
            active = hit_surf

        dist2 = jnp.where(jnp.isfinite(its.t), its.t * its.t, 1.0)
        if mtypes:
            dist2 = jnp.where(in_scatter, ms.t * ms.t, dist2)
        zero3 = jnp.zeros((R, 3))
        v_p = jnp.where(in_scatter[..., None], ms.p, its.p) if mtypes else its.p
        v_gn = jnp.where(in_scatter[..., None], zero3, its.gn) if mtypes else its.gn
        v_ns = (jnp.where(in_scatter[..., None], zero3, its.sh_frame.n)
                if mtypes else its.sh_frame.n)
        v_mat = jnp.where(in_scatter, -1, its.mat_id) if mtypes else its.mat_id
        v_em = jnp.where(in_scatter, -1, its.emitter_id) if mtypes else its.emitter_id
        v_nee = jnp.where(in_scatter, 0.0, its.nee_pdf_area) if mtypes else its.nee_pdf_area

        pdf_a = jnp.where(
            w.seg_delta, w.pdf_dir,
            _to_area(w.pdf_dir, w.d, dist2, v_gn),
        )
        bl = scene_mod.bsdf_locals(scene, its, static)
        nst = scene_mod.bsdf_nested(scene, its, static)
        mat_is_delta = jnp.isin(
            bl.type, jnp.asarray(delta_types or (-99,), jnp.int32)
        )
        v_conn = jnp.where(in_scatter, True, ~mat_is_delta) if mtypes \
            else ~mat_is_delta
        s = w.sp
        upd = lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, j, 0)
        s = s._replace(
            p=upd(s.p, v_p),
            gn=upd(s.gn, v_gn),
            ns=upd(s.ns, v_ns),
            uv=upd(s.uv, its.uv),
            mat_id=upd(s.mat_id, v_mat),
            emitter_id=upd(s.emitter_id, v_em),
            wi_world=upd(s.wi_world, -w.d),
            beta=upd(s.beta, jnp.where(active[..., None], beta_here, 0.0)),
            pdf_fwd=upd(s.pdf_fwd, jnp.where(active, pdf_a, 0.0)),
            delta=upd(s.delta, w.seg_delta & active),
            conn=upd(s.conn, v_conn & active),
            light_pdf_a=upd(s.light_pdf_a,
                            jnp.where(active, v_nee, 0.0)),
            valid=upd(s.valid, active),
            is_med=upd(s.is_med, in_scatter),
            med_id=upd(s.med_id,
                       jnp.where(in_scatter, w.medium, -1)),
        )

        # extension sample: BSDF at surfaces, phase at medium vertices
        u_b = rng_mod.uniform4(seed, lane, sample,
                               dim_base + i * DIMS_PER_BOUNCE)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        w_ext = bs.weight
        if importance_mode:
            gn_local = its.sh_frame.to_local(its.gn)
            corr = _shading_normal_correction(its.wi, bs.wo, gn_local)
            w_ext = w_ext * (corr * bs.eta * bs.eta)[..., None]
        d_surf = m.normalize(its.sh_frame.to_world(bs.wo))
        pdf_ext = bs.pdf
        ext_delta = bs.is_delta
        if mtypes:
            pt, pp, ptys = _phase_args(scene, static, w.medium)
            u_ph = rng_mod.uniform2(
                seed, lane, sample, dim_base + i * DIMS_PER_BOUNCE + 2)
            wo_ph, w_ph, pdf_ph = phase_mod.sample(
                pt, pp, -w.d, u_ph, active_types=ptys)
            d_new = jnp.where(in_scatter[..., None], wo_ph, d_surf)
            w_ext = jnp.where(in_scatter[..., None], w_ph[..., None], w_ext)
            pdf_ext = jnp.where(in_scatter, pdf_ph, pdf_ext)
            ext_delta = jnp.where(in_scatter, False, ext_delta)
            o_new = jnp.where(in_scatter[..., None], ms.p,
                              ray_offset(its.p, its.gn, d_surf))
        else:
            d_new = d_surf
            o_new = ray_offset(its.p, its.gn, d_new)
        beta_new = beta_here * w_ext

        # reverse pdf of the previous row: density of sampling the arrival
        # direction back toward row j-1 given the new outgoing direction
        pdf_rev_sa = bsdf_mod.pdf(bl, bs.wo, its.wi, active_types=types,
                                  nested=nst)
        if mtypes:
            _, pdf_ph_rev = phase_mod.eval_pdf(pt, pp, d_new, -w.d,
                                               active_types=ptys)
            pdf_rev_sa = jnp.where(in_scatter, pdf_ph_rev, pdf_rev_sa)
        jm1 = jnp.maximum(j - 1, 0)
        prev_gn = jax.lax.dynamic_index_in_dim(s.gn, jm1, 0, keepdims=False)
        prev_vol = m.squared_length(prev_gn) < 0.5
        rev_a = jnp.where(
            ext_delta, pdf_rev_sa,
            pdf_rev_sa * m.safe_div(
                jnp.where(prev_vol, 1.0, jnp.abs(m.dot(prev_gn, w.d))),
                dist2),
        )
        prev_rev = jax.lax.dynamic_index_in_dim(s.pdf_rev, jm1, 0,
                                                keepdims=False)
        s = s._replace(pdf_rev=jax.lax.dynamic_update_index_in_dim(
            s.pdf_rev,
            jnp.where(active & (j > 0), rev_a, prev_rev), jm1, 0))

        # medium swap on transmissive surface crossings (volpath.cpp)
        if mtypes:
            crossed = hit_surf & ~in_scatter & (
                m.dot(d_surf, its.gn) * m.dot(w.d, its.gn) > 0)
            entering = crossed & (m.dot(d_surf, its.gn) < 0)
            mid_c = jnp.maximum(its.mat_id, 0)
            interior = scene.materials.interior_medium[mid_c]
            exterior = scene.materials.exterior_medium[mid_c]
            medium_new = jnp.where(
                crossed, jnp.where(entering, interior, exterior), w.medium)
        else:
            medium_new = w.medium

        alive = active & (pdf_ext > 0) & (jnp.max(beta_new, -1) > 0)
        return _W(sp=s, o=o_new,
                  d=jnp.where(alive[..., None], d_new, w.d),
                  beta=jnp.where(alive[..., None], beta_new, w.beta),
                  pdf_dir=jnp.where(alive, pdf_ext, w.pdf_dir),
                  seg_delta=ext_delta & alive, active=alive,
                  medium=medium_new)

    out = jax.lax.fori_loop(0, n_steps, bounce, st)
    return out.sp


def generate_subpaths(scene, static, cfg: IntegratorConfig, sensor, o, d,
                      seed, lane, sample, K_eye: int, K_light: int,
                      camera_medium: int = -1):
    """Eye subpath z_1..z_{K_eye} from camera rays; light subpath
    y_0..y_{K_light-1} from an emitter sample (row 0 = emitter vertex)."""
    R = o.shape[0]
    pdf_cam = sensor_mod.pdf_ray_direction(sensor, d)
    cam_med = jnp.full(R, int(camera_medium), jnp.int32)
    eye = random_walk(
        scene, static, Subpath.empty(K_eye, R), o, d, jnp.ones((R, 3)),
        pdf_cam, 0, K_eye, seed, lane, sample, DIM_EYE_BASE, False,
        medium0=cam_med,
    )
    # delta-direction sensors (orthographic, sensor.h EDeltaDirection):
    # z_1's camera density is the parallel projection's film-AREA density,
    # not a solid-angle pdf converted with cos/d^2
    is_dd_cam = sensor.type == sensor_mod.ORTHOGRAPHIC
    pdf_cam_a = sensor_mod.camera_pdf_area(sensor, eye.p[0], eye.gn[0])
    eye = eye._replace(pdf_fwd=eye.pdf_fwd.at[0].set(
        jnp.where(is_dd_cam & eye.valid[0], pdf_cam_a, eye.pdf_fwd[0])))

    u_e = rng_mod.uniform4(seed, lane, sample, DIM_LIGHT_EMIT)
    u_ed = rng_mod.uniform2(seed, lane, sample, DIM_LIGHT_EMIT + 1)
    ers = em_mod.sample_ray(scene, static, u_e, u_ed)
    # delta-POSITION emitters (point/spot) start the subpath at their
    # fixed position (vertex.h EDeltaPosition role); the y_0 vertex is
    # marked delta so MIS skips the impossible s=0 alternative
    etype0 = scene.emitters.type[jnp.maximum(ers.e_idx, 0)]
    is_deltaL = ers.valid & ((etype0 == em_mod.POINT)
                             | (etype0 == em_mod.SPOT))
    # delta-DIRECTION emitters (directional/collimated, vertex.h
    # EDeltaDirection role): the y_0 vertex is degenerate — generic s=1
    # connections are measure-zero (conn=False) and the MIS entries walk
    # skips the s'<=1 alternatives via the delta flag; their transport
    # flows through the light-tracing family (s>=2 connections + t=0
    # splats), matching plain BDPT without the reference's sampleDirect
    # repositioning (bdpt.cpp miWeight sampleDirect=false semantics)
    is_deltaD = ers.valid & ((etype0 == em_mod.DIRECTIONAL)
                             | (etype0 == em_mod.COLLIMATED))
    q_valid = ers.valid & (ers.is_area | is_deltaL | is_deltaD)
    beta_q0 = jnp.where(
        q_valid[..., None],
        jnp.where(
            is_deltaL[..., None],
            m.safe_div(scene.emitters.radiance[jnp.maximum(ers.e_idx, 0)],
                       jnp.maximum(ers.epmf, 1e-12)[..., None]),
            m.safe_div(ers.radiance, ers.pdf_area[..., None])), 0.0,
    )
    cos0 = m.dot(ers.n, ers.d)
    pdf_dir0 = jnp.maximum(cos0, 0.0) * INV_PI  # cosine emission pdf
    pdf_dir0 = jnp.where(
        is_deltaL, _emission_dir_pdf(scene, ers.e_idx, ers.d), pdf_dir0)

    # positional pdf of the y_0 vertex: triangle/sphere area pdf for area
    # emitters, the pick pmf for delta positions, pick pmf x disk density
    # for directional (the scene-bounding-disk origin of sample_ray)
    disk_pdf = ers.epmf / jnp.maximum(
        jnp.pi * scene.radius * scene.radius, 1e-12)
    pos_pdf = jnp.where(is_deltaL, ers.epmf,
                        jnp.where(is_deltaD, disk_pdf, ers.pdf_area))
    is_delta0 = is_deltaL | is_deltaD
    pdf_dir0 = jnp.where(is_deltaD, 1.0, pdf_dir0)  # discrete dir measure

    light = Subpath.empty(K_light, R)
    set0 = lambda a, v: a.at[0].set(v)
    gn0 = jnp.where(is_delta0[..., None], 0.0, ers.n)
    light = light._replace(
        p=set0(light.p, ers.o),
        gn=set0(light.gn, gn0),
        ns=set0(light.ns, gn0),
        emitter_id=set0(light.emitter_id,
                        jnp.where(q_valid, ers.e_idx, -1)),
        beta=set0(light.beta, beta_q0),
        pdf_fwd=set0(light.pdf_fwd, jnp.where(q_valid, pos_pdf, 0.0)),
        delta=set0(light.delta, is_deltaD),
        delta_origin=set0(light.delta_origin, is_deltaL),
        conn=set0(light.conn, q_valid & ~is_deltaD),
        light_pdf_a=set0(light.light_pdf_a, pos_pdf),
        valid=set0(light.valid, q_valid),
    )
    if K_light > 1:
        beta_y1 = beta_q0 * m.safe_div(cos0, jnp.maximum(pdf_dir0, 1e-12))[..., None]
        # ers.weight already is full power over all pdfs for every type
        beta_y1 = jnp.where((is_deltaL | is_deltaD)[..., None], ers.weight,
                            beta_y1)
        light = random_walk(
            scene, static, light, ray_offset(ers.o, gn0, ers.d), ers.d,
            jnp.where(q_valid[..., None], beta_y1, 0.0), pdf_dir0,
            1, K_light - 1, seed, lane, sample, DIM_LIGHT_BASE, True,
            medium0=jnp.full(o.shape[0], int(camera_medium), jnp.int32),
        )
    return eye, light


def _emission_dir_pdf(scene, e_idx, d_out):
    """Solid-angle emission-direction pdf of a delta-position emitter
    toward d_out (point: uniform sphere; spot: uniform cone up to the
    cutoff — matching emitter.sample_ray)."""
    from ...core import warp

    e = jnp.maximum(e_idx, 0)
    em = scene.emitters
    etype = em.type[e]
    pdf = jnp.full(d_out.shape[:-1], warp.INV_FOURPI)
    cc = em.spot_cos[e, 0]
    cos_f = m.dot(d_out, em.direction[e])
    pdf_spot = jnp.where(cos_f >= cc,
                         warp.INV_TWOPI / jnp.maximum(1.0 - cc, 1e-6), 0.0)
    return jnp.where(etype == em_mod.SPOT, pdf_spot, pdf)


def _emission_profile(scene, light, ys, d_out):
    """Directional emission factor of the y_0 vertex toward d_out with
    the radiance/intensity already folded into beta: cos for area
    emitters, 1 for point, cone falloff for spot (area.cpp / point.cpp /
    spot.cpp eval semantics)."""
    e = jnp.maximum(light.emitter_id[ys], 0)
    em = scene.emitters
    etype = em.type[e]
    cos_l = jnp.maximum(m.dot(light.gn[ys], d_out), 0.0)
    f = cos_l
    f = jnp.where(etype == em_mod.POINT, 1.0, f)
    cc, cb = em.spot_cos[e, 0], em.spot_cos[e, 1]
    cos_f = m.dot(d_out, em.direction[e])
    fall = jnp.clip(m.safe_div(cos_f - cc, cb - cc), 0.0, 1.0)
    fall = jnp.where(cos_f >= cb, 1.0, fall)
    fall = jnp.where(cos_f <= cc, 0.0, fall)
    return jnp.where(etype == em_mod.SPOT, fall, f)


def _remap0(x):
    return jnp.where(x > 0, x, 1.0)


def _mis_from_entries(eye_entries, light_entries, cam_delta=False):
    """POWER-heuristic (beta=2) weight 1/(1 + sum ri^2) given
    junction-substituted per-vertex {fwd, rev, delta} dicts — the
    reference squares every alternative strategy's pdf ratio
    (Path::miWeight, libbidir/path.cpp:266 `weight += value*value`).
    ``eye_entries`` ordered z_1..z_t, ``light_entries`` y_0..y_{s-1}."""
    sum_ri = jnp.zeros(())
    ri = jnp.ones(())
    # camera side: z_t down to z_1; z_0 (camera) treated non-delta so the
    # t=0 splat alternative is counted
    for k in range(len(eye_entries) - 1, -1, -1):
        e = eye_entries[k]
        ri = ri * m.safe_div(_remap0(e["rev"]), _remap0(e["fwd"]))
        below_delta = eye_entries[k - 1]["delta"] if k > 0 else cam_delta
        use = ~e["delta"] & ~below_delta if k > 0 else ~e["delta"]
        sum_ri = sum_ri + jnp.where(use, ri * ri, 0.0)
    ri = jnp.ones(())
    # light side: y_{s-1} down to y_0; y_0's gate uses the light's own
    # delta flag (area lights: False)
    for k in range(len(light_entries) - 1, -1, -1):
        e = light_entries[k]
        ri = ri * m.safe_div(_remap0(e["rev"]), _remap0(e["fwd"]))
        below_delta = light_entries[k - 1]["delta"] if k > 0 else jnp.zeros((), bool)
        skip = e["delta"] | below_delta | e.get("skip_own", jnp.zeros((), bool))
        sum_ri = sum_ri + jnp.where(~skip, ri * ri, 0.0)
    return m.safe_div(1.0, 1.0 + sum_ri)


def _entries(sp: Subpath, n: int, subs: dict):
    """Per-vertex MIS dicts for rows 0..n-1 with substitutions
    {row: new_rev}."""
    out = []
    for k in range(n):
        out.append(dict(
            fwd=sp.pdf_fwd[k],
            rev=subs.get(k, sp.pdf_rev[k]),
            delta=sp.delta[k],
            skip_own=sp.delta_origin[k],
        ))
    return out


def _visible(scene, static, p_a, gn_a, p_b, gn_b, active,
             medium_a=None, seed=None, lane=None, sample=None, dim0=0):
    """Mutual transmittance between points a and b: (tr (R,3), d_unit,
    dist). Without media this is the boolean shadow ray; with media the
    segment accumulates transmittance through null-boundary chains
    (Scene::evalTransmittance, scene.cpp:854-898). Medium vertices carry
    zero normals, so the shadow origin offset degenerates to p_a there."""
    d = p_b - p_a
    dist = m.length(d)
    d_unit = d / jnp.maximum(dist, 1e-12)[..., None]
    o = ray_offset(p_a, gn_a, d_unit)
    if static.medium_types and medium_a is not None:
        tr = scene_mod.attenuated_transmittance(
            scene, static, o, d_unit, dist * (1.0 - 1e-3), medium_a,
            seed, lane, sample, dim0, active=active)
        return tr, d_unit, dist
    occ = scene_mod.occluded(
        scene, static, o, d_unit, 0.0, dist * (1.0 - 1e-3), active=active
    )
    return (~occ)[..., None].astype(jnp.float32), d_unit, dist


def _vertex_medium_toward(scene, static, sp: Subpath, k: int, d_out):
    """Medium id on the d_out side of vertex row k: the vertex's own
    medium for volume vertices, the hit material's interior/exterior for
    surface vertices (shape.h interior/exteriorMedium)."""
    if not static.medium_types:
        return None
    mid_c = jnp.maximum(sp.mat_id[k], 0)
    interior = scene.materials.interior_medium[mid_c]
    exterior = scene.materials.exterior_medium[mid_c]
    side = jnp.where(m.dot(d_out, sp.gn[k]) < 0, interior, exterior)
    return jnp.where(sp.is_med[k], sp.med_id[k], side)


def _bsdf_pdf_toward(bl, nst, types, frame, wi_world, wo_world,
                     dist2, n_target):
    """Area pdf of sampling the direction ``wo_world`` (toward a target at
    squared distance dist2 with normal n_target) at a vertex."""
    wi_l = frame.to_local(wi_world)
    wo_l = frame.to_local(wo_world)
    pdf_sa = bsdf_mod.pdf(bl, wi_l, wo_l, active_types=types, nested=nst)
    return _to_area(pdf_sa, wo_world, dist2, n_target)


def li_and_splats(scene, static, cfg: IntegratorConfig, sensor, o, d,
                  seed, lane, sample, camera_medium: int = -1):
    """All BDPT strategies for one eye + one light subpath per lane.

    Returns (L (R,3) for the lane's own pixel, splat_uv (S,R,2),
    splat_val (S,R,3)) where S = number of t=0 strategies."""
    N = cfg.max_depth if cfg.max_depth > 0 else 5
    K_eye = N
    K_light = N
    R = o.shape[0]
    types = static.bsdf_types
    eye, light = generate_subpaths(scene, static, cfg, sensor, o, d, seed,
                                   lane, sample, K_eye, K_light,
                                   camera_medium=camera_medium)
    cam_pos = sensor.position

    # cached per-row locals
    eye_loc = [_vertex_locals(scene, static, eye, k) for k in range(K_eye)]
    light_loc = [_vertex_locals(scene, static, light, k)
                 for k in range(K_light)]

    L = jnp.zeros((R, 3))
    splat_uvs = []
    splat_vals = []

    import os as _os
    _smax = int(_os.environ.get("MTS_BDPT_SMAX", "99"))
    _t0 = _os.environ.get("MTS_BDPT_T0", "1") != "0"
    for t in range(0, K_eye + 1):
        for s in range(0, K_light + 1):
            n_seg = s + t
            if n_seg < 1 or n_seg > N:
                continue
            if t == 0 and s == 0:
                continue
            if s > _smax:
                continue
            if t == 0 and not _t0:
                continue

            if s == 0:
                # eye path hit an emitter at z_t
                zt = t - 1
                has_le = eye.valid[zt] & (eye.emitter_id[zt] >= 0)
                if cfg.hide_emitters and t == 1:
                    continue
                # front side only (area.cpp)
                to_prev = eye.wi_world[zt]
                front = m.dot(eye.gn[zt], to_prev) > 0
                e = jnp.maximum(eye.emitter_id[zt], 0)
                Le = scene.emitters.radiance[e]
                contrib = eye.beta[zt] * jnp.where(
                    (has_le & front)[..., None], Le, 0.0)
                # MIS: z_t re-sampled as a light origin; z_{t-1} via the
                # emission direction pdf
                subs = {zt: eye.light_pdf_a[zt]}
                if t >= 2:
                    dvec = eye.p[zt - 1] - eye.p[zt]
                    dist2 = jnp.maximum(m.squared_length(dvec), 1e-12)
                    d_unit = dvec / jnp.sqrt(dist2)[..., None]
                    pdf_dir = jnp.maximum(m.dot(eye.gn[zt], d_unit), 0.0) * INV_PI
                    subs[zt - 1] = _to_area(pdf_dir, d_unit, dist2,
                                            eye.gn[zt - 1])
                w = _mis_weight_st(eye, light, t, s, subs, {})
                L = L + jnp.where(has_le[..., None], contrib * w[..., None], 0.0)
                continue

            ys = s - 1  # junction light row
            if t == 0:
                # light subpath splats to the camera (bdpt_wr light image)
                ok = light.valid[ys] & light.conn[ys]
                ss = sensor_mod.sample_direct(sensor, light.p[ys])
                if s == 1:
                    f_em = _emission_profile(scene, light, ys, ss.d)
                    val = light.beta[ys] * f_em[..., None]
                else:
                    bl, nst, frame = light_loc[ys]
                    wi_l = frame.to_local(light.wi_world[ys])
                    wo_l = frame.to_local(ss.d)
                    f = _vertex_f(scene, static, light, ys, light_loc[ys],
                                  light.wi_world[ys], ss.d)
                    gn_l = frame.to_local(light.gn[ys])
                    corr = _shading_normal_correction(wi_l, wo_l, gn_l)
                    if static.medium_types:
                        corr = jnp.where(light.is_med[ys], 1.0, corr)
                    val = light.beta[ys] * f * corr[..., None]
                ok = ok & ss.valid & (jnp.max(val, -1) > 0)
                o_sh = ray_offset(light.p[ys], light.gn[ys], ss.d)
                if static.medium_types:
                    med_c = _vertex_medium_toward(scene, static, light, ys,
                                                  ss.d)
                    tr = scene_mod.attenuated_transmittance(
                        scene, static, o_sh, ss.d, ss.dist * (1 - 1e-3),
                        med_c, seed, lane, sample,
                        700 + 8 * (t * (N + 1) + s), active=ok)
                    ok = ok & (jnp.max(tr, -1) > 0)
                    val = val * tr
                else:
                    vis = ~scene_mod.occluded(
                        scene, static, o_sh, ss.d, 0.0,
                        ss.dist * (1 - 1e-3), active=ok)
                    ok = ok & vis
                val = jnp.where(ok[..., None], val * ss.imp[..., None], 0.0)
                # MIS: y_{s-1} re-sampled from the camera (area density —
                # perspective converts the directional pdf, orthographic
                # uses the parallel film-area density); y_{s-2} via the
                # bsdf at y_{s-1} with wi from the camera
                lsubs = {ys: sensor_mod.camera_pdf_area(
                    sensor, light.p[ys], light.gn[ys])}
                if s >= 2:
                    dvec = light.p[ys - 1] - light.p[ys]
                    dist2 = jnp.maximum(m.squared_length(dvec), 1e-12)
                    d_unit = dvec / jnp.sqrt(dist2)[..., None]
                    lsubs[ys - 1] = _vertex_pdf_toward(
                        scene, static, light, ys, light_loc[ys], ss.d,
                        d_unit, dist2, light.gn[ys - 1])
                w = _mis_weight_st(eye, light, t, s, {}, lsubs)
                splat_uvs.append(jnp.where(ok[..., None], ss.uv, -1.0))
                splat_vals.append(val * w[..., None])
                continue

            # s >= 1, t >= 1: connect z_t with y_{s-1}
            zt = t - 1
            ok = eye.valid[zt] & eye.conn[zt] & light.valid[ys] & light.conn[ys]
            dvec0 = light.p[ys] - eye.p[zt]
            d_unit0 = dvec0 / jnp.maximum(m.length(dvec0), 1e-12)[..., None]
            med_conn = _vertex_medium_toward(scene, static, eye, zt, d_unit0)
            tr, d_unit, dist = _visible(
                scene, static, eye.p[zt], eye.gn[zt], light.p[ys],
                light.gn[ys], ok, medium_a=med_conn, seed=seed, lane=lane,
                sample=sample, dim0=500 + 8 * (t * (N + 1) + s))
            ok = ok & (jnp.max(tr, -1) > 0)
            dist2 = jnp.maximum(dist * dist, 1e-12)

            f_e = _vertex_f(scene, static, eye, zt, eye_loc[zt],
                            eye.wi_world[zt], d_unit)

            if s == 1:
                # y_0 is the emitter vertex: emission profile toward z_t
                # (cos for area, 1 for point, falloff for spot)
                f_em = _emission_profile(scene, light, ys, -d_unit)
                f_l_over_d2 = m.safe_div(f_em, dist2)
                contrib = eye.beta[zt] * f_e * light.beta[ys] * \
                    f_l_over_d2[..., None] * tr
            else:
                bl_l, nst_l, fr_l = light_loc[ys]
                wi_l = fr_l.to_local(light.wi_world[ys])
                wo_l = fr_l.to_local(-d_unit)
                f_l = _vertex_f(scene, static, light, ys, light_loc[ys],
                                light.wi_world[ys], -d_unit)
                gn_ll = fr_l.to_local(light.gn[ys])
                corr = _shading_normal_correction(wi_l, wo_l, gn_ll)
                if static.medium_types:
                    corr = jnp.where(light.is_med[ys], 1.0, corr)
                contrib = eye.beta[zt] * f_e * light.beta[ys] * f_l * \
                    m.safe_div(corr, dist2)[..., None] * tr
            contrib = jnp.where(ok[..., None], contrib, 0.0)

            # --- junction rev-pdf substitutions
            esubs = {}
            lsubs = {}
            # z_t from the light side
            if s == 1:
                e_id = light.emitter_id[ys]
                etype_l = scene.emitters.type[jnp.maximum(e_id, 0)]
                pdf_dir = jnp.maximum(
                    m.dot(light.gn[ys], -d_unit), 0.0) * INV_PI
                is_dl = ((etype_l == em_mod.POINT)
                         | (etype_l == em_mod.SPOT))
                pdf_dir = jnp.where(
                    is_dl, _emission_dir_pdf(scene, e_id, -d_unit), pdf_dir)
                esubs[zt] = _to_area(pdf_dir, -d_unit, dist2, eye.gn[zt])
            else:
                esubs[zt] = _vertex_pdf_toward(
                    scene, static, light, ys, light_loc[ys],
                    light.wi_world[ys], -d_unit, dist2, eye.gn[zt])
            # z_{t-1} from z_t (wi now from the light side)
            if t >= 2:
                dvec_p = eye.p[zt - 1] - eye.p[zt]
                dist2_p = jnp.maximum(m.squared_length(dvec_p), 1e-12)
                dp_unit = dvec_p / jnp.sqrt(dist2_p)[..., None]
                esubs[zt - 1] = _vertex_pdf_toward(
                    scene, static, eye, zt, eye_loc[zt], d_unit, dp_unit,
                    dist2_p, eye.gn[zt - 1])
            # y_{s-1} from z_t
            lsubs[ys] = _vertex_pdf_toward(
                scene, static, eye, zt, eye_loc[zt], eye.wi_world[zt],
                d_unit, dist2, light.gn[ys])
            # y_{s-2} from y_{s-1} (wi now from the eye side)
            if s >= 2:
                dvec_q = light.p[ys - 1] - light.p[ys]
                dist2_q = jnp.maximum(m.squared_length(dvec_q), 1e-12)
                dq_unit = dvec_q / jnp.sqrt(dist2_q)[..., None]
                lsubs[ys - 1] = _vertex_pdf_toward(
                    scene, static, light, ys, light_loc[ys], -d_unit,
                    dq_unit, dist2_q, light.gn[ys - 1])

            w = _mis_weight_st(eye, light, t, s, esubs, lsubs)
            L = L + contrib * w[..., None]

    if splat_uvs:
        return L, jnp.stack(splat_uvs), jnp.stack(splat_vals)
    return L, jnp.zeros((0, R, 2)), jnp.zeros((0, R, 3))


def _mis_weight_st(eye: Subpath, light: Subpath, t: int, s: int,
                   esubs: dict, lsubs: dict):
    return _mis_from_entries(
        _entries(eye, t, esubs), _entries(light, s, lsubs)
    )
