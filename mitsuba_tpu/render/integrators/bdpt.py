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

MIS weights use the balance-heuristic pdf-ratio walk over per-vertex
forward/reverse area pdfs (libbidir Path::misWeight, path.cpp), with delta
vertices' ratios passed through and zero pdfs remapped to one. The
reverse pdfs of the four junction-adjacent vertices are recomputed per
strategy; all others are filled during the random walk.

Scope: area emitters (delta emitters render through the unidirectional
family); pinhole perspective/thinlens sensors for the t=0 splats.
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
    conn: jnp.ndarray      # (K, R) bool: has a smooth lobe (connectible)
    light_pdf_a: jnp.ndarray  # (K, R) emitter-origin area pdf (0 if none)
    valid: jnp.ndarray     # (K, R)

    @staticmethod
    def empty(K, R):
        z3 = jnp.zeros((K, R, 3))
        return Subpath(
            p=z3, gn=z3, ns=z3, uv=jnp.zeros((K, R, 2)),
            mat_id=jnp.full((K, R), -1, jnp.int32),
            emitter_id=jnp.full((K, R), -1, jnp.int32),
            wi_world=z3, beta=z3,
            pdf_fwd=jnp.zeros((K, R)), pdf_rev=jnp.zeros((K, R)),
            delta=jnp.zeros((K, R), bool), conn=jnp.zeros((K, R), bool),
            light_pdf_a=jnp.zeros((K, R)), valid=jnp.zeros((K, R), bool),
        )


def _to_area(pdf_sa, dir_unit, dist2, n_target):
    """Solid-angle pdf at the source -> area pdf at the target vertex."""
    cos_t = jnp.abs(m.dot(n_target, -dir_unit))
    return pdf_sa * m.safe_div(cos_t, jnp.maximum(dist2, 1e-12))


def _vertex_locals(scene, static, sp: Subpath, k: int):
    """(bsdf locals, nested, frame) for vertex row k."""
    ns_safe = jnp.where(sp.valid[k][..., None], sp.ns[k],
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


class _W(NamedTuple):
    sp: Subpath
    o: jnp.ndarray
    d: jnp.ndarray
    beta: jnp.ndarray
    pdf_dir: jnp.ndarray
    seg_delta: jnp.ndarray
    active: jnp.ndarray


def random_walk(scene, static, sp: Subpath, o0, d0, beta0, pdf_dir0,
                offset: int, n_steps: int, seed, lane, sample,
                dim_base: int, importance_mode: bool):
    """Fill rows offset..offset+n_steps-1 of ``sp`` by walking from
    (o0, d0). Fills pdf_rev of row j-1 when extending row j (libbidir
    Path::randomWalk, path.cpp)."""
    types = static.bsdf_types
    delta_types = tuple(t for t in types if t in bsdf_mod.DELTA_TYPES)

    st = _W(sp=sp, o=o0, d=d0, beta=beta0, pdf_dir=pdf_dir0,
            seg_delta=jnp.zeros(o0.shape[0], bool),
            active=jnp.max(beta0, -1) > 0)

    def bounce(i, w: _W):
        j = i + offset
        its = scene_mod.ray_intersect(
            scene, static, w.o, w.d, 1e-4, jnp.inf, active=w.active
        )
        active = w.active & its.valid
        dist2 = jnp.where(jnp.isfinite(its.t), its.t * its.t, 1.0)
        pdf_a = jnp.where(
            w.seg_delta, w.pdf_dir,
            _to_area(w.pdf_dir, w.d, dist2, its.gn),
        )
        bl = scene_mod.bsdf_locals(scene, its, static)
        nst = scene_mod.bsdf_nested(scene, its, static)
        mat_is_delta = jnp.isin(
            bl.type, jnp.asarray(delta_types or (-99,), jnp.int32)
        )
        s = w.sp
        upd = lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, j, 0)
        s = s._replace(
            p=upd(s.p, its.p),
            gn=upd(s.gn, its.gn),
            ns=upd(s.ns, its.sh_frame.n),
            uv=upd(s.uv, its.uv),
            mat_id=upd(s.mat_id, its.mat_id),
            emitter_id=upd(s.emitter_id, its.emitter_id),
            wi_world=upd(s.wi_world, -w.d),
            beta=upd(s.beta, jnp.where(active[..., None], w.beta, 0.0)),
            pdf_fwd=upd(s.pdf_fwd, jnp.where(active, pdf_a, 0.0)),
            delta=upd(s.delta, w.seg_delta & active),
            conn=upd(s.conn, ~mat_is_delta & active),
            light_pdf_a=upd(s.light_pdf_a,
                            jnp.where(active, its.nee_pdf_area, 0.0)),
            valid=upd(s.valid, active),
        )

        # extension sample
        u_b = rng_mod.uniform4(seed, lane, sample,
                               dim_base + i * DIMS_PER_BOUNCE)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        w_ext = bs.weight
        if importance_mode:
            gn_local = its.sh_frame.to_local(its.gn)
            corr = _shading_normal_correction(its.wi, bs.wo, gn_local)
            w_ext = w_ext * (corr * bs.eta * bs.eta)[..., None]
        beta_new = w.beta * w_ext
        d_new = m.normalize(its.sh_frame.to_world(bs.wo))
        o_new = ray_offset(its.p, its.gn, d_new)

        # reverse pdf of the previous row: density of sampling the arrival
        # direction back toward row j-1 given the new outgoing direction
        pdf_rev_sa = bsdf_mod.pdf(bl, bs.wo, its.wi, active_types=types,
                                  nested=nst)
        jm1 = jnp.maximum(j - 1, 0)
        prev_gn = jax.lax.dynamic_index_in_dim(s.gn, jm1, 0, keepdims=False)
        rev_a = jnp.where(
            bs.is_delta, pdf_rev_sa,
            pdf_rev_sa * m.safe_div(jnp.abs(m.dot(prev_gn, w.d)), dist2),
        )
        prev_rev = jax.lax.dynamic_index_in_dim(s.pdf_rev, jm1, 0,
                                                keepdims=False)
        s = s._replace(pdf_rev=jax.lax.dynamic_update_index_in_dim(
            s.pdf_rev,
            jnp.where(active & (j > 0), rev_a, prev_rev), jm1, 0))

        alive = active & (bs.pdf > 0) & (jnp.max(beta_new, -1) > 0)
        return _W(sp=s, o=o_new,
                  d=jnp.where(alive[..., None], d_new, w.d),
                  beta=jnp.where(alive[..., None], beta_new, w.beta),
                  pdf_dir=jnp.where(alive, bs.pdf, w.pdf_dir),
                  seg_delta=bs.is_delta & alive, active=alive)

    out = jax.lax.fori_loop(0, n_steps, bounce, st)
    return out.sp


def generate_subpaths(scene, static, cfg: IntegratorConfig, sensor, o, d,
                      seed, lane, sample, K_eye: int, K_light: int):
    """Eye subpath z_1..z_{K_eye} from camera rays; light subpath
    y_0..y_{K_light-1} from an emitter sample (row 0 = emitter vertex)."""
    R = o.shape[0]
    pdf_cam = sensor_mod.pdf_ray_direction(sensor, d)
    eye = random_walk(
        scene, static, Subpath.empty(K_eye, R), o, d, jnp.ones((R, 3)),
        pdf_cam, 0, K_eye, seed, lane, sample, DIM_EYE_BASE, False,
    )

    u_e = rng_mod.uniform4(seed, lane, sample, DIM_LIGHT_EMIT)
    u_ed = rng_mod.uniform2(seed, lane, sample, DIM_LIGHT_EMIT + 1)
    ers = em_mod.sample_ray(scene, static, u_e, u_ed)
    q_valid = ers.valid & ers.is_area
    beta_q0 = jnp.where(
        q_valid[..., None],
        m.safe_div(ers.radiance, ers.pdf_area[..., None]), 0.0,
    )
    cos0 = m.dot(ers.n, ers.d)
    pdf_dir0 = jnp.maximum(cos0, 0.0) * INV_PI  # cosine emission pdf

    light = Subpath.empty(K_light, R)
    set0 = lambda a, v: a.at[0].set(v)
    light = light._replace(
        p=set0(light.p, ers.o),
        gn=set0(light.gn, ers.n),
        ns=set0(light.ns, ers.n),
        beta=set0(light.beta, beta_q0),
        pdf_fwd=set0(light.pdf_fwd, jnp.where(q_valid, ers.pdf_area, 0.0)),
        conn=set0(light.conn, q_valid),
        light_pdf_a=set0(light.light_pdf_a, ers.pdf_area),
        valid=set0(light.valid, q_valid),
    )
    if K_light > 1:
        beta_y1 = beta_q0 * m.safe_div(cos0, jnp.maximum(pdf_dir0, 1e-12))[..., None]
        light = random_walk(
            scene, static, light, ray_offset(ers.o, ers.n, ers.d), ers.d,
            jnp.where(q_valid[..., None], beta_y1, 0.0), pdf_dir0,
            1, K_light - 1, seed, lane, sample, DIM_LIGHT_BASE, True,
        )
    return eye, light


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
        sum_ri = sum_ri + jnp.where(~e["delta"] & ~below_delta, ri * ri, 0.0)
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
        ))
    return out


def _visible(scene, static, p_a, gn_a, p_b, gn_b, active):
    """Mutual visibility between surface points a and b."""
    d = p_b - p_a
    dist = m.length(d)
    d_unit = d / jnp.maximum(dist, 1e-12)[..., None]
    o = ray_offset(p_a, gn_a, d_unit)
    occ = scene_mod.occluded(
        scene, static, o, d_unit, 0.0, dist * (1.0 - 1e-3), active=active
    )
    return ~occ, d_unit, dist


def _bsdf_pdf_toward(bl, nst, types, frame, wi_world, wo_world,
                     dist2, n_target):
    """Area pdf of sampling the direction ``wo_world`` (toward a target at
    squared distance dist2 with normal n_target) at a vertex."""
    wi_l = frame.to_local(wi_world)
    wo_l = frame.to_local(wo_world)
    pdf_sa = bsdf_mod.pdf(bl, wi_l, wo_l, active_types=types, nested=nst)
    return _to_area(pdf_sa, wo_world, dist2, n_target)


def li_and_splats(scene, static, cfg: IntegratorConfig, sensor, o, d,
                  seed, lane, sample):
    """All BDPT strategies for one eye + one light subpath per lane.

    Returns (L (R,3) for the lane's own pixel, splat_uv (S,R,2),
    splat_val (S,R,3)) where S = number of t=0 strategies."""
    N = cfg.max_depth if cfg.max_depth > 0 else 5
    K_eye = N
    K_light = N
    R = o.shape[0]
    types = static.bsdf_types
    eye, light = generate_subpaths(scene, static, cfg, sensor, o, d, seed,
                                   lane, sample, K_eye, K_light)
    cam_pos = sensor.position

    # cached per-row locals
    eye_loc = [_vertex_locals(scene, static, eye, k) for k in range(K_eye)]
    light_loc = [_vertex_locals(scene, static, light, k)
                 for k in range(K_light)]

    L = jnp.zeros((R, 3))
    splat_uvs = []
    splat_vals = []

    for t in range(0, K_eye + 1):
        for s in range(0, K_light + 1):
            n_seg = s + t
            if n_seg < 1 or n_seg > N:
                continue
            if t == 0 and s == 0:
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
                    cos_c = m.dot(light.gn[ys], ss.d)
                    val = light.beta[ys] * jnp.maximum(cos_c, 0.0)[..., None]
                else:
                    bl, nst, frame = light_loc[ys]
                    wi_l = frame.to_local(light.wi_world[ys])
                    wo_l = frame.to_local(ss.d)
                    f = bsdf_mod.eval(bl, wi_l, wo_l, active_types=types,
                                      nested=nst)
                    gn_l = frame.to_local(light.gn[ys])
                    corr = _shading_normal_correction(wi_l, wo_l, gn_l)
                    val = light.beta[ys] * f * corr[..., None]
                ok = ok & ss.valid & (jnp.max(val, -1) > 0)
                o_sh = ray_offset(light.p[ys], light.gn[ys], ss.d)
                vis = ~scene_mod.occluded(
                    scene, static, o_sh, ss.d, 0.0, ss.dist * (1 - 1e-3),
                    active=ok)
                ok = ok & vis
                val = jnp.where(ok[..., None], val * ss.imp[..., None], 0.0)
                # MIS: y_{s-1} re-sampled from the camera; y_{s-2} via the
                # bsdf at y_{s-1} with wi from the camera
                dist2_c = jnp.maximum(ss.dist * ss.dist, 1e-12)
                pdf_cam = sensor_mod.pdf_ray_direction(sensor, -ss.d)
                lsubs = {ys: _to_area(pdf_cam, -ss.d, dist2_c, light.gn[ys])}
                if s >= 2:
                    bl, nst, frame = light_loc[ys]
                    dvec = light.p[ys - 1] - light.p[ys]
                    dist2 = jnp.maximum(m.squared_length(dvec), 1e-12)
                    d_unit = dvec / jnp.sqrt(dist2)[..., None]
                    lsubs[ys - 1] = _bsdf_pdf_toward(
                        bl, nst, types, frame, ss.d, d_unit, dist2,
                        light.gn[ys - 1])
                w = _mis_weight_st(eye, light, t, s, {}, lsubs)
                splat_uvs.append(jnp.where(ok[..., None], ss.uv, -1.0))
                splat_vals.append(val * w[..., None])
                continue

            # s >= 1, t >= 1: connect z_t with y_{s-1}
            zt = t - 1
            ok = eye.valid[zt] & eye.conn[zt] & light.valid[ys] & light.conn[ys]
            vis, d_unit, dist = _visible(
                scene, static, eye.p[zt], eye.gn[zt], light.p[ys],
                light.gn[ys], ok)
            ok = ok & vis
            dist2 = jnp.maximum(dist * dist, 1e-12)

            bl_e, nst_e, fr_e = eye_loc[zt]
            wi_e = fr_e.to_local(eye.wi_world[zt])
            wo_e = fr_e.to_local(d_unit)
            f_e = bsdf_mod.eval(bl_e, wi_e, wo_e, active_types=types,
                                nested=nst_e)

            if s == 1:
                # y_0 is the emitter vertex: Le toward z_t, front side
                cos_l = m.dot(light.gn[ys], -d_unit)
                f_l_over_d2 = m.safe_div(jnp.maximum(cos_l, 0.0), dist2)
                contrib = eye.beta[zt] * f_e * light.beta[ys] * \
                    f_l_over_d2[..., None]
            else:
                bl_l, nst_l, fr_l = light_loc[ys]
                wi_l = fr_l.to_local(light.wi_world[ys])
                wo_l = fr_l.to_local(-d_unit)
                f_l = bsdf_mod.eval(bl_l, wi_l, wo_l, active_types=types,
                                    nested=nst_l)
                gn_ll = fr_l.to_local(light.gn[ys])
                corr = _shading_normal_correction(wi_l, wo_l, gn_ll)
                contrib = eye.beta[zt] * f_e * light.beta[ys] * f_l * \
                    m.safe_div(corr, dist2)[..., None]
            contrib = jnp.where(ok[..., None], contrib, 0.0)

            # --- junction rev-pdf substitutions
            esubs = {}
            lsubs = {}
            # z_t from the light side
            if s == 1:
                pdf_dir = jnp.maximum(m.dot(light.gn[ys], -d_unit), 0.0) * INV_PI
                esubs[zt] = _to_area(pdf_dir, -d_unit, dist2, eye.gn[zt])
            else:
                bl_l, nst_l, fr_l = light_loc[ys]
                esubs[zt] = _bsdf_pdf_toward(
                    bl_l, nst_l, types, fr_l, light.wi_world[ys], -d_unit,
                    dist2, eye.gn[zt])
            # z_{t-1} from z_t (wi now from the light side)
            if t >= 2:
                dvec_p = eye.p[zt - 1] - eye.p[zt]
                dist2_p = jnp.maximum(m.squared_length(dvec_p), 1e-12)
                dp_unit = dvec_p / jnp.sqrt(dist2_p)[..., None]
                esubs[zt - 1] = _bsdf_pdf_toward(
                    bl_e, nst_e, types, fr_e, d_unit, dp_unit, dist2_p,
                    eye.gn[zt - 1])
            # y_{s-1} from z_t
            lsubs[ys] = _bsdf_pdf_toward(
                bl_e, nst_e, types, fr_e, eye.wi_world[zt], d_unit, dist2,
                light.gn[ys])
            # y_{s-2} from y_{s-1} (wi now from the eye side)
            if s >= 2:
                bl_l, nst_l, fr_l = light_loc[ys]
                dvec_q = light.p[ys - 1] - light.p[ys]
                dist2_q = jnp.maximum(m.squared_length(dvec_q), 1e-12)
                dq_unit = dvec_q / jnp.sqrt(dist2_q)[..., None]
                lsubs[ys - 1] = _bsdf_pdf_toward(
                    bl_l, nst_l, types, fr_l, -d_unit, dq_unit, dist2_q,
                    light.gn[ys - 1])

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
