"""Photon mapping family: photonmapper / ppm / sppm.

Reference: src/integrators/photonmapper/{photonmapper.cpp:26, ppm.cpp:25,
sppm.cpp:30}, photon storage over a point kd-tree (librender/photonmap.h:34,
core/kdtree.h) filled by parallel photon shooting (gatherproc.cpp).

TPU-native redesign: the kd-tree + kNN gather (pointer-chasing, per-query
recursion — hostile to XLA) is replaced by a **uniform hash grid with
sorted buckets**: photons are binned to cells of size = gather radius,
sorted by bucket id (one device sort), and a query scans its 27 neighbor
cells with a fixed per-bucket fan-out. Everything is static-shape: the
photon walk is a lock-step ``lax.fori_loop`` megabatch (same shape as the
ptracer walk), the gather is a bounded ``fori_loop`` of masked gathers.

SPPM follows Hachisuka & Jensen's update: per-pixel statistics
(radius^2, N, tau) shrink the gather radius as photon passes accumulate;
PPM is the same machinery with fixed (unjittered) gather points; the
classic photonmapper renders in one pass with NEE direct lighting, a
caustic-photon gather, and a one-sample final gather for indirect light.
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
    IntegratorConfig, ray_offset,
)
from .ptracer import _shading_normal_correction

# hash-grid compile-time shape constants
TABLE_SIZE = 1 << 16       # buckets
BUCKET_CAP = 32            # photons examined per bucket per query
_H1, _H2, _H3 = 73856093, 19349663, 83492791  # Teschner et al. spatial hash


# === photon tracing ========================================================

class PhotonMap(NamedTuple):
    """Flat photon storage + sorted hash-grid index (a pytree)."""

    pos: jnp.ndarray        # (P, 3)
    power: jnp.ndarray      # (P, 3) flux (already includes 1/pdf weights)
    wi: jnp.ndarray         # (P, 3) world direction the photon ARRIVED from
    gn: jnp.ndarray         # (P, 3) surface geometric normal at deposit
    caustic: jnp.ndarray    # (P,) bool: delta-only chain from the emitter
    direct: jnp.ndarray     # (P,) bool: deposited at the first bounce
    valid: jnp.ndarray      # (P,) bool
    order: jnp.ndarray      # (P,) int32 photon index sorted by bucket
    bucket_start: jnp.ndarray  # (TABLE_SIZE + 1,) int32
    cell_size: jnp.ndarray  # () grid cell edge (= max gather radius)


class _WalkState(NamedTuple):
    thr: jnp.ndarray
    o: jnp.ndarray
    d: jnp.ndarray
    active: jnp.ndarray
    spec_chain: jnp.ndarray
    # per-bounce deposit buffers, (D, P, ...)
    pos: jnp.ndarray
    power: jnp.ndarray
    wi: jnp.ndarray
    gn: jnp.ndarray
    caustic: jnp.ndarray
    direct: jnp.ndarray
    valid: jnp.ndarray


def trace_photons(scene, static, cfg: IntegratorConfig, seed, photon_idx,
                  sample_idx, max_depth: int):
    """Emit one photon per lane and deposit at every surface hit whose
    material has a smooth component (GatherPhotonProcess semantics,
    gatherproc.cpp; delta surfaces only redirect the walk).

    Returns flat (P*D,) photon arrays (pos/power/wi/gn/caustic/direct/valid).
    """
    P = photon_idx.shape[0]
    D = max_depth
    types = static.bsdf_types

    u_e = rng_mod.uniform4(seed, photon_idx, sample_idx, 0)
    u_ed = rng_mod.uniform2(seed, photon_idx, sample_idx, 1)
    ers = em_mod.sample_ray(scene, static, u_e, u_ed)

    init = _WalkState(
        thr=jnp.where(ers.valid[..., None], ers.weight, 0.0),
        o=ers.o,
        d=ers.d,
        active=ers.valid,
        spec_chain=jnp.ones(P, bool),
        pos=jnp.zeros((D, P, 3)),
        power=jnp.zeros((D, P, 3)),
        wi=jnp.zeros((D, P, 3)),
        gn=jnp.zeros((D, P, 3)),
        caustic=jnp.zeros((D, P), bool),
        direct=jnp.zeros((D, P), bool),
        valid=jnp.zeros((D, P), bool),
    )

    delta_types = tuple(t for t in types if t in bsdf_mod.DELTA_TYPES)

    def bounce(i, s: _WalkState):
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        its = scene_mod.ray_intersect(
            scene, static, s.o, s.d, 1e-4, jnp.inf, active=s.active
        )
        active = s.active & its.valid
        bl = scene_mod.bsdf_locals(scene, its, static)
        nst = scene_mod.bsdf_nested(scene, its, static)
        gn_local = its.sh_frame.to_local(its.gn)

        mat_is_delta = jnp.isin(
            bl.type, jnp.asarray(delta_types or (-99,), jnp.int32)
        )
        store = active & ~mat_is_delta
        s = s._replace(
            pos=s.pos.at[i].set(its.p),
            power=s.power.at[i].set(s.thr),
            wi=s.wi.at[i].set(-s.d),
            gn=s.gn.at[i].set(its.gn),
            caustic=s.caustic.at[i].set(store & s.spec_chain & (i > 0)),
            direct=s.direct.at[i].set(store & (i == 0)),
            valid=s.valid.at[i].set(store),
        )

        # extend the walk (importance transport, like ptracer)
        u_b = rng_mod.uniform4(seed, photon_idx, sample_idx, dim0 + DIM_BSDF)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types, nested=nst)
        corr = _shading_normal_correction(its.wi, bs.wo, gn_local)
        thr_new = s.thr * bs.weight * (corr * bs.eta * bs.eta)[..., None]
        alive = (jnp.max(thr_new, axis=-1) > 0) & (bs.pdf > 0)
        d_new = m.normalize(its.sh_frame.to_world(bs.wo))
        o_new = ray_offset(its.p, its.gn, d_new)

        # RR with throughput-ratio acceptance after rr_depth
        q = jax.lax.stop_gradient(
            jnp.minimum(m.safe_div(jnp.max(thr_new, -1),
                                   jnp.maximum(jnp.max(s.thr, -1), 1e-12)), 0.95)
        )
        u_rr = rng_mod.uniform1(seed, photon_idx, sample_idx, dim0 + DIM_RR)
        do_rr = (i + 1) >= cfg.rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        thr_new = jnp.where((do_rr & survive)[..., None],
                            thr_new * m.safe_div(1.0, q)[..., None], thr_new)

        nxt = active & alive & survive
        return s._replace(
            thr=jnp.where(nxt[..., None], thr_new, s.thr),
            o=jnp.where(nxt[..., None], o_new, s.o),
            d=jnp.where(nxt[..., None], d_new, s.d),
            active=nxt,
            spec_chain=s.spec_chain & (bs.is_delta | ~active),
        )

    out = jax.lax.fori_loop(0, D, bounce, init)
    flat = lambda a: a.reshape((D * P,) + a.shape[2:])
    return (flat(out.pos), flat(out.power), flat(out.wi), flat(out.gn),
            flat(out.caustic), flat(out.direct), flat(out.valid))


# === hash grid =============================================================

def _cell_hash(cell):
    h = (cell[..., 0] * _H1) ^ (cell[..., 1] * _H2) ^ (cell[..., 2] * _H3)
    return (h & 0x7FFFFFFF) % TABLE_SIZE


def build_photon_map(pos, power, wi, gn, caustic, direct, valid,
                     cell_size) -> PhotonMap:
    """Bin photons into the hash grid: one sort by bucket id + bucket
    offsets via searchsorted (replaces PhotonMap::build's kd-tree balance,
    photonmap.cpp)."""
    cell = jnp.floor(pos / cell_size).astype(jnp.int32)
    h = jnp.where(valid, _cell_hash(cell), TABLE_SIZE)
    order = jnp.argsort(h).astype(jnp.int32)
    h_sorted = h[order]
    bucket_start = jnp.searchsorted(
        h_sorted, jnp.arange(TABLE_SIZE + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return PhotonMap(pos=pos, power=power, wi=wi, gn=gn, caustic=caustic,
                     direct=direct, valid=valid, order=order,
                     bucket_start=bucket_start,
                     cell_size=jnp.asarray(cell_size, jnp.float32))


def gather_photons(pm: PhotonMap, bl, frame, query_p, query_gn, wo_local,
                   radius2, types, nested=None, select=None,
                   exclude_direct=False):
    """Radiance-estimate gather: sum f(wi, wo) * power over photons within
    sqrt(radius2) of query_p (PhotonMap::estimateRadiance, photonmap.cpp).

    Returns (flux (R,3) — divide by (pi r^2 N_emit) outside, M (R,) photon
    count). ``select``: optional per-photon class mask ('caustic'/'global').
    """
    R = query_p.shape[0]
    base_cell = jnp.floor(query_p / pm.cell_size).astype(jnp.int32)
    P = pm.pos.shape[0]

    def body(k, acc):
        flux, count = acc
        c = k // BUCKET_CAP
        j = k % BUCKET_CAP
        off = jnp.stack([(c // 9) - 1, ((c // 3) % 3) - 1, (c % 3) - 1])
        hb = _cell_hash(base_cell + off)
        start = pm.bucket_start[hb]
        end = pm.bucket_start[hb + 1]
        idx = pm.order[jnp.minimum(start + j, P - 1)]
        in_bucket = (start + j) < end

        d = pm.pos[idx] - query_p
        d2 = m.squared_length(d)
        ok = in_bucket & pm.valid[idx] & (d2 < radius2)
        # surface-side check: photon deposited on the same side
        ok = ok & (m.dot(pm.gn[idx], query_gn) > 0)
        if exclude_direct:
            ok = ok & ~pm.direct[idx]
        if select is not None:
            ok = ok & select(idx)

        # radiance estimate: L = sum f_r(wi_p -> wo) dPhi_p / (pi r^2); the
        # photon areal density already encodes incidence geometry, so the
        # plain BRDF is needed — strip eval's cos(theta_wo) factor
        # (photonmap.h estimateRadiance semantics).
        wi_l = frame.to_local(pm.wi[idx])
        f = bsdf_mod.eval(bl, wo_local, wi_l, active_types=types,
                          nested=nested)
        f = f * m.safe_div(1.0, jnp.maximum(wi_l[..., 2], 0.01))[..., None]
        contrib = jnp.where(ok[..., None], f * pm.power[idx], 0.0)
        return flux + contrib, count + ok.astype(jnp.float32)

    flux0 = jnp.zeros((R, 3))
    cnt0 = jnp.zeros((R,))
    flux, count = jax.lax.fori_loop(0, 27 * BUCKET_CAP, body, (flux0, cnt0))
    return flux, count


# === eye pass (shared by ppm/sppm/photonmapper) ============================

class GatherPoint(NamedTuple):
    p: jnp.ndarray          # (R, 3)
    gn: jnp.ndarray         # (R, 3)
    frame_s: jnp.ndarray
    frame_t: jnp.ndarray
    frame_n: jnp.ndarray
    wo: jnp.ndarray         # (R, 3) local outgoing (toward camera)
    uv: jnp.ndarray
    mat_id: jnp.ndarray
    thr: jnp.ndarray        # (R, 3) eye-path throughput
    emitted: jnp.ndarray    # (R, 3) accumulated Le along the specular chain
    valid: jnp.ndarray      # (R,) found a smooth surface


def trace_gather_points(scene, static, cfg: IntegratorConfig, o, d, seed,
                        pixel, sample) -> GatherPoint:
    """Walk each eye ray through delta-material chains to its first smooth
    hit (sppm.cpp eye pass): emitted radiance is collected along the way,
    the first ESmooth surface becomes the gather point."""
    R = o.shape[0]
    types = static.bsdf_types
    delta_types = tuple(t for t in types if t in bsdf_mod.DELTA_TYPES)
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 16

    from ...core.frame import Frame

    class _S(NamedTuple):
        thr: jnp.ndarray
        o: jnp.ndarray
        d: jnp.ndarray
        active: jnp.ndarray
        emitted: jnp.ndarray
        gp_p: jnp.ndarray
        gp_gn: jnp.ndarray
        gp_s: jnp.ndarray
        gp_t: jnp.ndarray
        gp_n: jnp.ndarray
        gp_wo: jnp.ndarray
        gp_uv: jnp.ndarray
        gp_mat: jnp.ndarray
        gp_thr: jnp.ndarray
        gp_valid: jnp.ndarray

    z3 = jnp.zeros((R, 3))
    init = _S(thr=jnp.ones((R, 3)), o=o, d=d, active=jnp.ones(R, bool),
              emitted=z3, gp_p=z3, gp_gn=z3, gp_s=z3, gp_t=z3, gp_n=z3,
              gp_wo=z3, gp_uv=jnp.zeros((R, 2)),
              gp_mat=jnp.full(R, -1, jnp.int32), gp_thr=z3,
              gp_valid=jnp.zeros(R, bool))

    def bounce(i, s: _S):
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        its = scene_mod.ray_intersect(
            scene, static, s.o, s.d, 1e-4, jnp.inf, active=s.active
        )
        active = s.active & its.valid
        emitted = s.emitted + jnp.where(
            active[..., None],
            s.thr * scene_mod.emitted_radiance(scene, static, its, s.d), 0.0
        )
        bl = scene_mod.bsdf_locals(scene, its, static)
        mat_is_delta = jnp.isin(
            bl.type, jnp.asarray(delta_types or (-99,), jnp.int32)
        )
        found = active & ~mat_is_delta & ~s.gp_valid

        f = its.sh_frame
        s = s._replace(
            emitted=emitted,
            gp_p=jnp.where(found[..., None], its.p, s.gp_p),
            gp_gn=jnp.where(found[..., None], its.gn, s.gp_gn),
            gp_s=jnp.where(found[..., None], f.s, s.gp_s),
            gp_t=jnp.where(found[..., None], f.t, s.gp_t),
            gp_n=jnp.where(found[..., None], f.n, s.gp_n),
            gp_wo=jnp.where(found[..., None], its.wi, s.gp_wo),
            gp_uv=jnp.where(found[..., None], its.uv, s.gp_uv),
            gp_mat=jnp.where(found, its.mat_id, s.gp_mat),
            gp_thr=jnp.where(found[..., None], s.thr, s.gp_thr),
            gp_valid=s.gp_valid | found,
        )

        # continue only through delta materials
        u_b = rng_mod.uniform4(seed, pixel, sample, dim0 + DIM_BSDF)
        bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                             active_types=types)
        thr_new = s.thr * bs.weight
        cont = active & mat_is_delta & (bs.pdf > 0) & \
            (jnp.max(thr_new, -1) > 0) & (i + 1 < max_depth)
        d_new = m.normalize(its.sh_frame.to_world(bs.wo))
        return s._replace(
            thr=jnp.where(cont[..., None], thr_new, s.thr),
            o=jnp.where(cont[..., None],
                        ray_offset(its.p, its.gn, d_new), s.o),
            d=jnp.where(cont[..., None], d_new, s.d),
            active=cont,
        )

    out = jax.lax.fori_loop(0, max_depth, bounce, init)
    return GatherPoint(
        p=out.gp_p, gn=out.gp_gn, frame_s=out.gp_s, frame_t=out.gp_t,
        frame_n=out.gp_n, wo=out.gp_wo, uv=out.gp_uv, mat_id=out.gp_mat,
        thr=out.gp_thr, emitted=out.emitted, valid=out.gp_valid,
    )


def _gp_locals(scene, static, gp: GatherPoint):
    """Recreate (bsdf locals, frame) at stored gather points."""
    from ...core.frame import Frame
    from ..records import Interaction

    frame = Frame(s=gp.frame_s, t=gp.frame_t, n=gp.frame_n)
    its = Interaction(
        valid=gp.valid, t=jnp.zeros(gp.valid.shape), p=gp.p, gn=gp.gn,
        sh_frame=frame, uv=gp.uv, wi=gp.wo,
        wi_world=frame.to_world(gp.wo), mat_id=gp.mat_id,
        emitter_id=jnp.full(gp.valid.shape, -1, jnp.int32),
        prim_id=jnp.full(gp.valid.shape, -1, jnp.int32),
        nee_pdf_area=jnp.zeros(gp.valid.shape),
        bary=jnp.zeros(gp.valid.shape + (2,)),
    )
    bl = scene_mod.bsdf_locals(scene, its, static)
    nst = scene_mod.bsdf_nested(scene, its, static)
    return bl, nst, frame, its


# === SPPM/PPM progressive state ===========================================

class SppmState(NamedTuple):
    radius2: jnp.ndarray   # (R,)
    n_acc: jnp.ndarray     # (R,) accumulated photon statistic N
    tau: jnp.ndarray       # (R, 3) accumulated (unnormalized) flux
    le: jnp.ndarray        # (R, 3) accumulated emitted+direct-view radiance
    n_passes: jnp.ndarray  # ()
    n_emitted: jnp.ndarray  # () total photons emitted


def sppm_init(n_pixels: int, initial_radius: float) -> SppmState:
    return SppmState(
        radius2=jnp.full((n_pixels,), initial_radius * initial_radius),
        n_acc=jnp.zeros((n_pixels,)),
        tau=jnp.zeros((n_pixels, 3)),
        le=jnp.zeros((n_pixels, 3)),
        n_passes=jnp.zeros(()),
        n_emitted=jnp.zeros(()),
    )


def sppm_pass(scene, static, cfg: IntegratorConfig, sensor, state: SppmState,
              seed, pass_idx, n_photons: int, W: int, H: int,
              jitter: bool, alpha: float = 0.7):
    """One SPPM iteration: photon pass + eye pass + per-pixel statistics
    update (sppm.cpp:30; Hachisuka & Jensen 2009 update rule). ``jitter``
    False gives PPM (fixed gather points, ppm.cpp)."""
    from .. import sensor as sensor_mod

    R = W * H
    pixel_idx = jnp.arange(R, dtype=jnp.int32)

    # --- photon pass
    pid = jnp.arange(n_photons, dtype=jnp.int32)
    depth = cfg.max_depth if cfg.max_depth > 0 else 16
    pp = trace_photons(scene, static, cfg, seed + 101, pid, pass_idx, depth)
    cell = jnp.sqrt(jnp.max(state.radius2))  # radii only shrink
    pm = build_photon_map(*pp, cell_size=jnp.maximum(cell, 1e-6))

    # --- eye pass
    u = rng_mod.uniform2(seed, pixel_idx, pass_idx, 0)
    px = (pixel_idx % W).astype(jnp.float32)
    py = (pixel_idx // W).astype(jnp.float32)
    jit = u if jitter else jnp.full_like(u, 0.5)
    uv = (jnp.stack([px, py], -1) + jit) / jnp.asarray([W, H], jnp.float32)
    u_ap = rng_mod.uniform2(seed, pixel_idx, pass_idx, 1)
    o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
    gp = trace_gather_points(scene, static, cfg, o, d, seed + 7, pixel_idx,
                             pass_idx)

    # --- gather + statistics update
    bl, nst, frame, _ = _gp_locals(scene, static, gp)
    flux, mcount = gather_photons(
        pm, bl, frame, gp.p, gp.gn, gp.wo, state.radius2,
        static.bsdf_types, nested=nst,
    )
    flux = jnp.where(gp.valid[..., None], gp.thr * flux, 0.0)
    mcount = jnp.where(gp.valid, mcount, 0.0)

    n_new = state.n_acc + alpha * mcount
    denom = jnp.maximum(state.n_acc + mcount, 1e-6)
    ratio = jnp.where(mcount > 0, n_new / denom, 1.0)
    r2_new = state.radius2 * ratio
    tau_new = (state.tau + flux) * ratio[..., None]

    return SppmState(
        radius2=r2_new,
        n_acc=n_new,
        tau=tau_new,
        le=state.le + gp.emitted,
        n_passes=state.n_passes + 1,
        n_emitted=state.n_emitted + n_photons,
    )


def sppm_develop(state: SppmState, W: int, H: int):
    inv_pass = m.safe_div(1.0, jnp.maximum(state.n_passes, 1.0))
    indirect = state.tau / (
        jnp.maximum(state.n_emitted, 1.0)
        * jnp.pi * jnp.maximum(state.radius2, 1e-12)
    )[..., None]
    img = state.le * inv_pass + indirect
    return img.reshape(H, W, 3)


# === classic photonmapper ==================================================

def photonmapper_li(scene, static, cfg: IntegratorConfig, pm: PhotonMap,
                    n_emitted, o, d, seed, pixel, sample,
                    lookup_radius: float):
    """One camera sample of the classic photon mapper (photonmapper.cpp:26):
    specular chain -> smooth hit; there: NEE direct light + caustic-map
    gather + one-sample final gather against the global map."""
    types = static.bsdf_types
    gp = trace_gather_points(scene, static, cfg, o, d, seed, pixel, sample)
    bl, nst, frame, its = _gp_locals(scene, static, gp)
    L = gp.emitted
    r2 = jnp.asarray(lookup_radius * lookup_radius)
    inv_area = 1.0 / (jnp.pi * r2 * jnp.maximum(n_emitted, 1.0))

    # --- direct: one NEE sample (emitter importance sampling)
    u_n = rng_mod.uniform4(seed, pixel, sample, DIM_BASE + DIM_NEE)
    ds = em_mod.sample_direct(scene, static, gp.p, u_n[..., :3])
    wo_l = frame.to_local(ds.d)
    f_nee = bsdf_mod.eval(bl, gp.wo, wo_l, active_types=types, nested=nst)
    o_sh = ray_offset(gp.p, gp.gn, ds.d)
    occ = scene_mod.occluded(
        scene, static, o_sh, ds.d, 0.0, ds.dist * (1 - 1e-3),
        active=gp.valid & ds.valid,
    )
    nee = jnp.where(
        (gp.valid & ds.valid & ~occ)[..., None],
        gp.thr * f_nee * ds.radiance / jnp.maximum(ds.pdf_sa, 1e-12)[..., None],
        0.0,
    )
    L = L + nee

    # --- caustics: gather delta-chain photons at the first smooth hit
    caustic_flux, _ = gather_photons(
        pm, bl, frame, gp.p, gp.gn, gp.wo, r2, types, nested=nst,
        select=lambda idx: pm.caustic[idx],
    )
    L = L + jnp.where(gp.valid[..., None], gp.thr * caustic_flux * inv_area, 0.0)

    # --- indirect: one-sample final gather, estimate at the second hit
    u_b = rng_mod.uniform4(seed, pixel, sample, DIM_BASE + DIM_BSDF)
    bs = bsdf_mod.sample(bl, gp.wo, u_b[..., 0], u_b[..., 1:3],
                         active_types=types, nested=nst)
    d2w = m.normalize(frame.to_world(bs.wo))
    o2 = ray_offset(gp.p, gp.gn, d2w)
    its2 = scene_mod.ray_intersect(scene, static, o2, d2w, 1e-4, jnp.inf,
                                   active=gp.valid & (bs.pdf > 0))
    bl2 = scene_mod.bsdf_locals(scene, its2, static)
    nst2 = scene_mod.bsdf_nested(scene, its2, static)
    # exclude caustic photons (counted above) and direct photons (NEE above
    # already covers direct light at the first hit; at the second hit the
    # direct component is part of the full estimate — keep it)
    gflux, _ = gather_photons(
        pm, bl2, its2.sh_frame, its2.p, its2.gn, its2.wi, r2, types,
        nested=nst2, select=lambda idx: ~pm.caustic[idx],
    )
    fg = jnp.where(
        (gp.valid & its2.valid)[..., None],
        gp.thr * bs.weight * gflux * inv_area, 0.0,
    )
    return L + fg
