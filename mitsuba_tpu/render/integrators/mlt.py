"""Metropolis light transport family: pssmlt / mlt / erpt.

Reference parity:
- `pssmlt` (src/integrators/pssmlt/pssmlt.cpp:26, pssmlt_sampler.cpp):
  Kelemen primary-sample-space MLT — a Markov chain over the unit hypercube
  of path-tracer random numbers, with symmetric small-step mutations
  (pssmlt_sampler.cpp mutate1D constants s1=1/1024, s2=1/64) and
  large-step restarts with probability pLarge (pssmlt.cpp:202), two-stage
  luminance normalization (pssmlt.cpp:297-311), and expected-value splatting
  of both current and proposed states (pssmlt_proc.cpp:140).
- `mlt` (src/integrators/mlt/mlt.cpp:25): Veach path-space MLT with a
  portfolio of mutation strategies (bidirectional mutation + lens / caustic /
  multi-chain perturbations, libbidir mut_*.cpp). The TPU build runs the
  chain over the BDPT path sampler's vertex arrays (integrators/bdpt.py):
  the state is the pair of (eye, light) subpaths written as their sampling
  coordinates, the target is the total MIS-weighted contribution of ALL
  (s,t) connection strategies for that pair (pathsampler.cpp
  sampleSplats role), and the mutation portfolio acts STRUCTURALLY on the
  subpaths — the bidirectional mutation regenerates the whole light
  subpath (a discrete path-space jump that changes connection structure,
  mut_bidir.cpp:279 role), lens perturbations wiggle the sensor ray
  (mut_lens.cpp), caustic perturbations wiggle the light emission segment
  so caustic spots slide smoothly (mut_caustic.cpp), multi-chain
  perturbations move every inner vertex (mut_mchain.cpp). Every kernel is
  symmetric (fixed-subset fresh resamples / Kelemen steps), so acceptance
  stays min(1, I'/I); t=0 strategies splat into the light image exactly
  like plain BDPT.
- `erpt` (src/integrators/erpt/erpt.cpp:27): energy redistribution path
  tracing — ordinary path-traced seed samples, each spawning a short
  equal-deposition Metropolis chain that redistributes the seed's energy
  over image space.

TPU-native design: the reference runs one chain per worker thread
(pssmlt_proc.cpp); here a chain occupies a *lane* and thousands of chains
advance in lock-step through the ordinary wavefront `path.li` kernel, driven
by a (chains, slots, 4) PSS table via `rng.pss_mode`. Proposal, evaluation,
acceptance, and film splatting are all batched; the film is a scatter-add
target exactly like the BDPT light image.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import rng as rng_mod
from .. import sensor as sensor_mod
from . import common as icommon
from . import path as int_path

# Kelemen mutation-size constants (pssmlt_sampler.cpp)
_S1 = 1.0 / 1024.0
_S2 = 1.0 / 64.0

# mlt strategy tags (mlt.cpp strategy portfolio)
STRAT_BIDIR = 0   # large restart (bidirectional mutation role)
STRAT_LENS = 1    # perturb sensor/aperture dims only (mut_lens.cpp role)
STRAT_CAUSTIC = 2  # perturb the last two bounce slots (mut_caustic.cpp role)
STRAT_MCHAIN = 3  # perturb all bounce dims, keep the pixel (mut_mchain.cpp)
STRAT_MANIFOLD = 4  # specular-manifold perturbation (mut_manifold.cpp role)

MANIFOLD_THETA = 0.05  # cone half-angle of the exit-direction proposal


def _manifold_capable(static) -> bool:
    """The manifold perturbation targets specular chains the differentiable
    chain map covers: analytic spheres AND/OR triangle-mesh dielectrics up
    to the manifold cap (render/manifold.py; scene.man_tri rows built by
    SceneBuilder — the reference walks arbitrary mesh chains,
    manifold.cpp)."""
    from .. import bsdf as B

    has_diel = (B.DIELECTRIC in static.bsdf_types
                or B.THIN_DIELECTRIC in static.bsdf_types)
    return has_diel and (static.n_spheres > 0
                         or static.n_manifold_tris > 0)


def n_slots(cfg: icommon.IntegratorConfig) -> int:
    depth = cfg.max_depth if cfg.max_depth > 0 else 16
    return icommon.DIM_BASE + depth * icommon.DIMS_PER_BOUNCE


def n_slots_bdpt(cfg: icommon.IntegratorConfig) -> int:
    from . import bdpt as int_bdpt

    depth = cfg.max_depth if cfg.max_depth > 0 else 5
    return int_bdpt.DIM_LIGHT_BASE + depth * int_bdpt.DIMS_PER_BOUNCE


def fresh_table(seed, lane, step, nslots):
    """Independent uniforms for a full PSS table (large step)."""
    return rng_mod.uniform4(
        seed, lane[:, None], step, jnp.arange(nslots, dtype=jnp.int32)[None, :]
    )


def luminance(L):
    return 0.212671 * L[..., 0] + 0.715160 * L[..., 1] + 0.072169 * L[..., 2]


def eval_target(scene, static, sensor, cfg, width, height, u):
    """Path contribution of PSS vector u: returns (L, I, film pos)."""
    R = u.shape[0]
    lane = jnp.arange(R, dtype=jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    with rng_mod.pss_mode(u):
        uv = u[:, icommon.DIM_SENSOR, :2]
        u_ap = u[:, icommon.DIM_APERTURE, :2]
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L = int_path.li(scene, static, cfg, o, d, zero, lane, zero)
    pos = uv * jnp.asarray([width, height], jnp.float32)
    return L, luminance(L), pos


def eval_target_bdpt(scene, static, sensor, cfg, width, height, u):
    """BDPT path-pair contribution of sampling-coordinate table u: returns
    (L own-pixel, splat_uv (S,R,2), splat_val (S,R,3), I total luminance,
    film pos). The Metropolis target I sums the lane pixel's strategies
    AND the t=0 light-image strategies (the reference's path sampler
    splat list, pathsampler.cpp:764)."""
    from . import bdpt as int_bdpt

    R = u.shape[0]
    lane = jnp.arange(R, dtype=jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    with rng_mod.pss_mode(u):
        uv = u[:, icommon.DIM_SENSOR, :2]
        u_ap = u[:, icommon.DIM_APERTURE, :2]
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L, sp_uv, sp_val = int_bdpt.li_and_splats(
            scene, static, cfg, sensor, o, d, zero, lane, zero)
    ok = (sp_uv[..., 0] >= 0).astype(jnp.float32)
    sp_val = sp_val * ok[..., None]
    I = luminance(L) + jnp.sum(luminance(sp_val), axis=0)
    pos = uv * jnp.asarray([width, height], jnp.float32)
    return L, sp_uv, sp_val, I, pos


def small_step(u, r):
    """Symmetric Kelemen mutation of every PSS component.

    r: uniforms of u's shape. Magnitude log-uniform in (s1, s2], sign from
    the same draw (pssmlt_sampler.cpp mutate1D).
    """
    add = r < 0.5
    t = jnp.where(add, 2.0 * r, 2.0 * (r - 0.5))
    dv = _S2 * jnp.exp(-jnp.log(_S2 / _S1) * t)
    v = jnp.where(add, u + dv, u - dv)
    return v - jnp.floor(v)  # wrap to [0,1)


def _slot_mask(nslots, strategy):
    """(nslots,) bool masks per mlt strategy; broadcast over components."""
    slots = jnp.arange(nslots)
    sensor_slots = slots < icommon.DIM_BASE
    bounce_slots = ~sensor_slots
    last2 = slots >= (nslots - 2 * icommon.DIMS_PER_BOUNCE)
    lens = sensor_slots
    caustic = sensor_slots | (bounce_slots & last2)
    mchain = bounce_slots
    table = jnp.stack([jnp.ones_like(lens), lens, caustic, mchain])  # [4, S]
    return table[strategy]


def _slot_masks_bdpt(nslots):
    """Per-strategy masks over the BDPT coordinate layout: which slots a
    SMALL step perturbs (lens/caustic/mchain) or a FRESH resample replaces
    (bidir -> the whole light subpath)."""
    from . import bdpt as int_bdpt

    slots = jnp.arange(nslots)
    sensor_slots = slots < icommon.DIM_BASE
    eye_slots = (slots >= icommon.DIM_BASE) & (slots < int_bdpt.DIM_LIGHT_EMIT)
    light_slots = slots >= int_bdpt.DIM_LIGHT_EMIT
    emit_seg = light_slots & (slots < int_bdpt.DIM_LIGHT_BASE
                              + int_bdpt.DIMS_PER_BOUNCE)
    lens = sensor_slots
    caustic = emit_seg
    mchain = eye_slots | light_slots
    small_table = jnp.stack(
        [jnp.zeros_like(lens), lens, caustic, mchain])       # [4, S]
    # the bidirectional mutation regenerates the WHOLE path pair (the
    # mut_bidir.cpp role of discarding and regrowing a path segment, taken
    # to the full-path case) — this is also what keeps the chain family
    # ergodic over image space; light-subpath-only restarts left chains
    # pinned to their seed pixel (round-2's mlt lost to pssmlt for exactly
    # this reason: 0.93 acceptance, no image-space mixing)
    all_slots = jnp.ones_like(lens)
    fresh_table_m = jnp.stack(
        [all_slots, jnp.zeros_like(lens),
         jnp.zeros_like(lens), jnp.zeros_like(lens)])        # [4, S]
    return small_table, fresh_table_m


def _manifold_proposal(scene, static, u_cur, u_prop, is_mani, seed, lane,
                       step):
    """Specular-manifold perturbation (mut_manifold.cpp:770 role): rotate
    the light subpath's specular-chain exit direction inside a small
    symmetric cone, Newton-solve the emission PSS pair that realizes it
    (render/manifold.py), and return the |det domega/du| acceptance
    correction. Lanes whose walk fails (no convergence, broken round trip,
    or a non-area emitter) propose their current state (self-transition).
    """
    from . import bdpt as int_bdpt
    from .. import bsdf as B
    from .. import emitter as em_mod
    from .. import manifold as mani

    u4_e = u_cur[:, int_bdpt.DIM_LIGHT_EMIT, :]
    u2_e = u_cur[:, int_bdpt.DIM_LIGHT_EMIT + 1, :2]
    ers = em_mod.sample_ray(scene, static, u4_e, u2_e)
    centers = scene.sph_center
    radii = scene.sph_radius
    mtyp = scene.materials.type[scene.sph_mat]
    diel = (mtyp == B.DIELECTRIC) | (mtyp == B.THIN_DIELECTRIC)
    etas = jnp.where(diel, scene.materials.eta[scene.sph_mat, 0], 1.0)
    # specular-MESH rows extend the chain map to triangle dielectrics
    # (manifold.cpp mesh chains); (1, 19) zero rows disable the branch
    mesh = scene.man_tri if static.n_manifold_tris > 0 else None

    o_l, n_l = ers.o, ers.n
    tr = jax.vmap(mani.chain_exit_dir,
                  in_axes=(0, 0, 0, None, None, None, None))
    d0 = tr(u2_e, o_l, n_l, centers, radii, etas, mesh)
    r2 = rng_mod.uniform2(seed + 48611, lane, step, 1)
    d_t = mani.perturb_cone(d0, r2, MANIFOLD_THETA)
    u_new, ok_f = mani.solve_exit_dir(u2_e, o_l, n_l, d_t,
                                      centers, radii, etas, mesh)
    # reverse walk must reproduce the current coordinates, else the move
    # is not reversible (multi-root chain maps) and must self-transition
    u_back, ok_r = mani.solve_exit_dir(u_new, o_l, n_l, d0,
                                       centers, radii, etas, mesh)
    rt = jnp.max(jnp.abs(u_back - u2_e), axis=-1) < 1e-3
    det0 = mani.det_omega(u2_e, o_l, n_l, centers, radii, etas, mesh)
    det1 = mani.det_omega(u_new, o_l, n_l, centers, radii, etas, mesh)
    ok = is_mani & ers.valid & ers.is_area & ok_f & ok_r & rt & (det1 > 1e-12)
    jac_ratio = jnp.where(ok, m.safe_div(det0, det1), 1.0)
    base2 = u_prop[:, int_bdpt.DIM_LIGHT_EMIT + 1, :2]
    new2 = jnp.where(ok[:, None], u_new, u2_e)
    out2 = jnp.where(is_mani[:, None], new2, base2)
    u_prop = u_prop.at[:, int_bdpt.DIM_LIGHT_EMIT + 1, :2].set(out2)
    return u_prop, jac_ratio


class ChainState(NamedTuple):
    u: jnp.ndarray      # (R, S, 4) current PSS tables
    L: jnp.ndarray      # (R, 3) current contributions
    I: jnp.ndarray      # (R,) current luminances
    pos: jnp.ndarray    # (R, 2) current film positions
    sp_uv: jnp.ndarray  # (Sn, R, 2) current light-image splat uvs (mlt)
    sp_val: jnp.ndarray  # (Sn, R, 3) current light-image splat values


def splat_box(film, pos, val, width, height):
    px = jnp.clip(pos[..., 0].astype(jnp.int32), 0, width - 1)
    py = jnp.clip(pos[..., 1].astype(jnp.int32), 0, height - 1)
    return film.at[py, px].add(val, mode="drop")


def _eval_state(scene, static, sensor, cfg, width, height, u,
                mlt_mode: bool):
    """Uniform (L, I, pos, sp_uv, sp_val) evaluation for either target."""
    if mlt_mode:
        L, sp_uv, sp_val, I, pos = eval_target_bdpt(
            scene, static, sensor, cfg, width, height, u)
    else:
        L, I, pos = eval_target(scene, static, sensor, cfg, width, height, u)
        R = u.shape[0]
        sp_uv = jnp.zeros((0, R, 2))
        sp_val = jnp.zeros((0, R, 3))
    return L, I, pos, sp_uv, sp_val


def seed_chains(scene, static, sensor, cfg, width, height, seed, n_chains,
                rounds: int = 4, mlt_mode: bool = False, lane_offset=0):
    """Luminance-proportional chain seeding (the reference draws seeds from
    a luminance CDF over candidate samples, pssmlt_proc.cpp / mlt_proc.cpp);
    here each lane reservoir-samples among `rounds` fresh candidates with
    probability proportional to luminance."""
    nslots = n_slots_bdpt(cfg) if mlt_mode else n_slots(cfg)
    lane = jnp.arange(n_chains, dtype=jnp.int32) + lane_offset

    def body(k, carry):
        st, wsum = carry
        u = fresh_table(seed + 7919, lane, k, nslots)
        L, I, pos, sp_uv, sp_val = _eval_state(
            scene, static, sensor, cfg, width, height, u, mlt_mode)
        wsum_new = wsum + I
        r = rng_mod.uniform1(seed + 104729, lane, k, 0)
        take = (r * wsum_new < I) | (wsum <= 0)
        take_c = take[:, None]
        st2 = ChainState(
            u=jnp.where(take[:, None, None], u, st.u),
            L=jnp.where(take_c, L, st.L),
            I=jnp.where(take, I, st.I),
            pos=jnp.where(take_c, pos, st.pos),
            sp_uv=jnp.where(take[None, :, None], sp_uv, st.sp_uv),
            sp_val=jnp.where(take[None, :, None], sp_val, st.sp_val),
        )
        return st2, wsum_new

    Sn = 0
    if mlt_mode:
        N = cfg.max_depth if cfg.max_depth > 0 else 5
        # t=0 strategies: s runs 1..N (bdpt.li_and_splats splat list length)
        Sn = N
    init = ChainState(
        u=jnp.zeros((n_chains, nslots, 4)),
        L=jnp.zeros((n_chains, 3)),
        I=jnp.zeros((n_chains,)),
        pos=jnp.zeros((n_chains, 2)),
        sp_uv=jnp.zeros((Sn, n_chains, 2)),
        sp_val=jnp.zeros((Sn, n_chains, 3)),
    )
    st, _ = jax.lax.fori_loop(0, rounds, body, (init, jnp.zeros(n_chains)))
    return st


def chain_steps(scene, static, sensor, cfg, width, height, seed,
                st: ChainState, film, step_base, n_steps: int,
                mlt_mode: bool = False, lane_offset=0):
    """Advance every chain by n_steps mutations, splatting into film.

    Splats carry weight C/I per state, expectation-weighted between current
    and proposed (Veach expected-value technique, pssmlt_proc.cpp:140).
    Returns (state, film, mean acceptance) — film accumulates sum over
    mutations of (a * C'/I' + (1-a) * C/I); the caller scales by
    b * n_pixels / N. In mlt_mode the t=0 light-image splats of both
    states land with the same weights (bdpt_wr.cpp merge, made
    Metropolis-weighted)."""
    R = st.u.shape[0]
    nslots = st.u.shape[1]
    lane = jnp.arange(R, dtype=jnp.int32) + lane_offset

    def body(k, carry):
        st, film, acc_sum = carry
        step = step_base + k
        r_sel = rng_mod.uniform4(seed + 15485863, lane, step, 0)
        r_mut = fresh_table(seed + 32452843, lane, step, nslots)
        u_fresh = fresh_table(seed, lane, step, nslots)

        jac_ratio = jnp.ones((R,))
        if mlt_mode:
            # mlt.cpp strategy portfolio, acting structurally on the BDPT
            # subpath coordinates: bidirectional mutation (regenerate the
            # light subpath; occasionally the whole pair for ergodicity),
            # lens / caustic / multi-chain / manifold perturbations
            n_strat = 5 if _manifold_capable(static) else 4
            strat = jnp.minimum((r_sel[:, 0] * n_strat).astype(jnp.int32),
                                n_strat - 1)
            small_m, fresh_m = _slot_masks_bdpt(nslots)
            s4 = jnp.minimum(strat, 3)
            not_mani = (strat < 4)[:, None, None]
            mask_s = small_m[s4][:, :, None] & not_mani
            mask_f = fresh_m[s4][:, :, None] & not_mani
            u_prop = jnp.where(mask_s, small_step(st.u, r_mut), st.u)
            u_prop = jnp.where(mask_f, u_fresh, u_prop)
            if n_strat == 5:
                u_prop, jac_ratio = _manifold_proposal(
                    scene, static, st.u, u_prop, strat == STRAT_MANIFOLD,
                    seed, lane, step)
        else:
            large = r_sel[:, 0] < cfg.p_large
            u_small = small_step(st.u, r_mut)
            u_prop = jnp.where(large[:, None, None], u_fresh, u_small)

        L2, I2, pos2, sp_uv2, sp_val2 = _eval_state(
            scene, static, sensor, cfg, width, height, u_prop, mlt_mode)

        # jac_ratio is the |det domega/du| pushforward correction of the
        # manifold proposal (1 everywhere else)
        a = jnp.where(st.I > 0,
                      jnp.minimum(1.0, m.safe_div(I2, st.I) * jac_ratio), 1.0)
        w_prop = jnp.where(I2 > 0, a / jnp.maximum(I2, 1e-20), 0.0)
        w_cur = jnp.where(st.I > 0, (1.0 - a) / jnp.maximum(st.I, 1e-20), 0.0)
        film = splat_box(film, st.pos, st.L * w_cur[:, None], width, height)
        film = splat_box(film, pos2, L2 * w_prop[:, None], width, height)
        if mlt_mode:
            Wpix = jnp.asarray([width, height], jnp.float32)
            film = splat_box(
                film, (st.sp_uv * Wpix).reshape(-1, 2),
                (st.sp_val * w_cur[None, :, None]).reshape(-1, 3),
                width, height)
            film = splat_box(
                film, (sp_uv2 * Wpix).reshape(-1, 2),
                (sp_val2 * w_prop[None, :, None]).reshape(-1, 3),
                width, height)

        accept = r_sel[:, 1] < a
        st2 = ChainState(
            u=jnp.where(accept[:, None, None], u_prop, st.u),
            L=jnp.where(accept[:, None], L2, st.L),
            I=jnp.where(accept, I2, st.I),
            pos=jnp.where(accept[:, None], pos2, st.pos),
            sp_uv=jnp.where(accept[None, :, None], sp_uv2, st.sp_uv),
            sp_val=jnp.where(accept[None, :, None], sp_val2, st.sp_val),
        )
        return st2, film, acc_sum + jnp.mean(a)

    st, film, acc_sum = jax.lax.fori_loop(
        0, n_steps, body, (st, film, jnp.zeros(())))
    return st, film, acc_sum / jnp.maximum(n_steps, 1)


def estimate_b(scene, static, sensor, cfg, width, height, seed,
               n_samples: int, lanes: int = 8192, mlt_mode: bool = False,
               lane_offset=0):
    """Stage-1 normalization: b = E_uniform[I(u)] (pssmlt.cpp:297-311)."""
    nslots = n_slots_bdpt(cfg) if mlt_mode else n_slots(cfg)
    lanes = min(lanes, max(n_samples, 1))
    rounds = -(-n_samples // lanes)
    n_total = rounds * lanes
    # FLAT global sample ids (offset + k*lanes + i): the sample set
    # [offset, offset + rounds*lanes) is independent of the lanes/rounds
    # chunking, so any disjoint partition across devices reproduces the
    # single-device estimate exactly (mesh-layout independence)
    base = jnp.arange(lanes, dtype=jnp.int32) + lane_offset

    def body(k, acc):
        gid = base + k * lanes
        u = fresh_table(seed + 49979687, gid,
                        jnp.asarray(0, jnp.int32), nslots)
        # stratify the IMAGE-PLANE pair over the flat id (Hammersley +
        # Cranley-Patterson rotation by the id's own uniforms — unbiased):
        # pixel luminance is the heavy-tailed factor of I (emitter pixels
        # are ~50x the walls), so plain-MC b carried a +-4-8% seed wobble
        # at 65k samples that scaled whole pssmlt images (r5 finding);
        # stratified, the same budget lands within ~1%.
        from ...core import qmc as qmc_mod

        u0 = (gid.astype(jnp.float32) + u[:, icommon.DIM_SENSOR, 0]) \
            / jnp.float32(n_total)
        u1 = jnp.mod(qmc_mod.radical_inverse(0, gid)
                     + u[:, icommon.DIM_SENSOR, 1], 1.0)
        u = u.at[:, icommon.DIM_SENSOR, 0].set(u0)
        u = u.at[:, icommon.DIM_SENSOR, 1].set(u1)
        _, I, _, _, _ = _eval_state(scene, static, sensor, cfg, width,
                                    height, u, mlt_mode)
        return acc + jnp.sum(I)

    total = jax.lax.fori_loop(0, rounds, body, jnp.zeros(()))
    return total / n_total


# --------------------------------------------------------------------------
# ERPT (erpt.cpp): path-traced seeds + equal-deposition redistribution chains
# --------------------------------------------------------------------------

def erpt_pass(scene, static, sensor, cfg, width, height, seed, film,
              pass_idx, n_seeds: int, chain_len: int):
    """One ERPT pass: n_seeds independent PT samples; each runs a
    chain_len-step small-mutation Metropolis chain depositing
    I_seed/chain_len energy per mutation (erpt_proc.cpp deposition rule).

    Returns film accumulating n_pixels-normalized splats; the caller divides
    by the seed count per pixel.
    """
    nslots = n_slots(cfg)
    lane = jnp.arange(n_seeds, dtype=jnp.int32)
    u0 = fresh_table(seed, lane, pass_idx, nslots)
    L0, I0, pos0 = eval_target(scene, static, sensor, cfg, width, height, u0)
    ed = I0 / float(chain_len)  # per-mutation deposition energy
    empty_uv = jnp.zeros((0, n_seeds, 2))
    empty_val = jnp.zeros((0, n_seeds, 3))
    st = ChainState(u=u0, L=L0, I=I0, pos=pos0,
                    sp_uv=empty_uv, sp_val=empty_val)

    def body(k, carry):
        st, film = carry
        step = pass_idx * (chain_len + 1) + k + 1
        r_sel = rng_mod.uniform4(seed + 15485863, lane, step, 0)
        r_mut = fresh_table(seed + 32452843, lane, step, nslots)
        u_prop = small_step(st.u, r_mut)
        L2, I2, pos2 = eval_target(scene, static, sensor, cfg, width, height,
                                   u_prop)
        a = jnp.where(st.I > 0, jnp.minimum(1.0, m.safe_div(I2, st.I)), 1.0)
        w_prop = jnp.where(I2 > 0, a * ed / jnp.maximum(I2, 1e-20), 0.0)
        w_cur = jnp.where(st.I > 0,
                          (1.0 - a) * ed / jnp.maximum(st.I, 1e-20), 0.0)
        film = splat_box(film, st.pos, st.L * w_cur[:, None], width, height)
        film = splat_box(film, pos2, L2 * w_prop[:, None], width, height)
        accept = r_sel[:, 1] < a
        st2 = ChainState(
            u=jnp.where(accept[:, None, None], u_prop, st.u),
            L=jnp.where(accept[:, None], L2, st.L),
            I=jnp.where(accept, I2, st.I),
            pos=jnp.where(accept[:, None], pos2, st.pos),
            sp_uv=st.sp_uv, sp_val=st.sp_val,
        )
        return st2, film

    _, film = jax.lax.fori_loop(0, chain_len, body, (st, film))
    return film
