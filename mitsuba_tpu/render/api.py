"""Top-level render orchestration.

The reference's RenderJob/BlockedRenderProcess pipeline (renderjob.cpp,
renderproc.cpp) schedules 32x32 pixel blocks across worker threads. The TPU
analog renders the *whole image* as one megabatch per sample pass (every
pixel is a lane), loops spp passes host-side while XLA pipelines, and
accumulates into the film array. Multi-chip sharding wraps this same pass
function via shard_map (mitsuba_tpu.parallel).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from . import film as film_mod
from . import rfilter
from . import sensor as sensor_mod
from .integrators import common as icommon
from .integrators import direct as int_direct
from .integrators import misc as int_misc
from .integrators import path as int_path
from .integrators import volpath as int_volpath

# sampler types (parity: src/samplers — independent.cpp, stratified.cpp;
# ldsampler/sobol/halton arrive with mitsuba_tpu.core.qmc)
INDEPENDENT = 0
STRATIFIED = 1
LDSAMPLER = 2
SOBOL = 3
HALTON = 4
HAMMERSLEY = 5
FAURE = 6


@dataclass(frozen=True)
class RenderSettings:
    width: int = 256
    height: int = 256
    spp: int = 16
    filter_type: int = rfilter.GAUSSIAN
    sampler_type: int = INDEPENDENT
    spp_per_pass: int = 4
    seed: int = 0
    # ray-cone MIP texture filtering at the primary hit (mipmap.h trilinear
    # role; reference filters bitmap textures through ray differentials)
    mip: bool = True
    # mid-render checkpointing (SURVEY 5.4: the reference only has -r
    # partial flushes, mitsuba.cpp:107-127 — true resume is designed in
    # here): path to a .npz holding (film accumulator, samples done);
    # render() resumes from it if present and rewrites it after every
    # spp chunk. Deterministic counter-based sampling makes a resumed
    # render BITWISE equal to an uninterrupted one.
    checkpoint: str = ""


def _li_fn(cfg: icommon.IntegratorConfig):
    if cfg.type == icommon.VOLPATH:
        return int_volpath.li
    if cfg.type == icommon.PATH:
        return int_path.li
    if cfg.type == icommon.DIRECT:
        return int_direct.li
    if cfg.type == icommon.AO:
        return int_misc.li_ao
    if cfg.type == icommon.FIELD:
        return int_misc.li_field
    raise ValueError(f"unknown integrator type {cfg.type}")


def pixel_sample_positions(settings: RenderSettings, pixel_idx, sample_idx, seed):
    """Continuous film positions for (pixel, sample) lanes.

    Independent: pure PCG jitter. Stratified: spp factored into an
    nx x ny grid, jittered within the stratum (stratified.cpp semantics).
    """
    W = settings.width
    px = (pixel_idx % W).astype(jnp.float32)
    py = (pixel_idx // W).astype(jnp.float32)
    u = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_SENSOR)
    if settings.sampler_type == STRATIFIED:
        nx = max(int(settings.spp ** 0.5), 1)
        ny = max(settings.spp // nx, 1)
        n = nx * ny
        s = sample_idx % n
        jx = ((s % nx).astype(jnp.float32) + u[..., 0]) / nx
        jy = ((s // nx).astype(jnp.float32) + u[..., 1]) / ny
        jit = jnp.stack([jx, jy], axis=-1)
    else:
        jit = u
    return jnp.stack([px, py], axis=-1) + jit


def render_pass(scene, static, sensor, cfg: icommon.IntegratorConfig,
                settings: RenderSettings, film, sample_base, n_samples: int,
                pixel_idx=None):
    """Accumulate ``n_samples`` sample passes into ``film`` (traceable)."""
    H, W = settings.height, settings.width
    if pixel_idx is None:
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    seed = jnp.asarray(settings.seed, jnp.int32)
    li = _li_fn(cfg)
    # fix the RNG strategy for everything traced below (samplers parity):
    # ldsampler/sobol -> scrambled (0,2)-sequences, halton -> radical inverse
    rng_mod.set_sampler(
        {LDSAMPLER: rng_mod.LD, SOBOL: rng_mod.SOBOL, HALTON: rng_mod.HALTON,
         HAMMERSLEY: rng_mod.HAMMERSLEY, FAURE: rng_mod.FAURE}
        .get(settings.sampler_type, rng_mod.INDEPENDENT),
        n=settings.spp,
    )

    for s in range(n_samples):
        sample_idx = sample_base + s
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        if settings.mip and cfg.type == icommon.PATH and static.has_textures:
            spread = sensor_mod.pixel_spread(sensor, W)
            L = li(scene, static, cfg, o, d, seed, pixel_idx, sample_idx,
                   pixel_spread=spread)
        else:
            L = li(scene, static, cfg, o, d, seed, pixel_idx, sample_idx)
        # measurement sensors (irradiancemeter/fluencemeter): constant
        # importance turning the sampled-radiance mean into E / fluence
        L = L * sensor_mod.ray_weight(sensor)
        R = pixel_idx.shape[0]
        if settings.filter_type == rfilter.BOX and R == H * W:
            # full-image fast path: one jittered sample per pixel lane
            img = L.reshape(H, W, 3)
            film = film_mod.splat_aligned(film, img)
        elif R % W == 0:
            # raster-ordered row tile (full image or a dp shard): dense
            # shifted-stencil splat instead of scatter-add (~20x faster)
            rows = R // W
            row0 = (pixel_idx[0] // W).astype(jnp.int32) if rows != H else 0
            film = film_mod.splat_grid(
                film, pos.reshape(rows, W, 2), L.reshape(rows, W, 3),
                settings.filter_type, row0,
            )
        else:
            film = film_mod.splat(film, pos, L, settings.filter_type)
    return film


def render_light_traced(scene, static, sensor, cfg: icommon.IntegratorConfig,
                        settings: RenderSettings):
    """Adjoint render (ptracer): spp * n_pixels particles, traced in
    pixel-count-sized megabatch passes."""
    from .integrators import ptracer as int_pt

    H, W = settings.height, settings.width
    P = H * W  # particles per pass
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)

    @jax.jit
    def one_pass(scene_, film_data, pass_idx):
        pid = jnp.arange(P, dtype=jnp.int32)
        return int_pt.trace_pass(scene_, static, cfg, sensor, film_data,
                                 seed, pid, pass_idx)

    film_data = jnp.zeros((H, W, 4))
    for s in range(settings.spp):
        film_data = one_pass(scene, film_data, jnp.asarray(s, jnp.int32))
    return int_pt.develop_light_image(film_data, settings.spp * P)


def render_vpl(scene, static, sensor, cfg: icommon.IntegratorConfig,
               settings: RenderSettings):
    """Instant-radiosity render: one VPL set, shaded per camera sample."""
    from . import film as film_mod_
    from .integrators import vpl as int_vpl

    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    vpls = jax.jit(
        lambda sc: int_vpl.generate_vpls(sc, static, cfg, cfg.vpl_count, seed + 777)
    )(scene)

    @jax.jit
    def one_pass(scene_, vpls_, film, sample_idx):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L = int_vpl.li(scene_, static, cfg, vpls_, o, d, seed, pixel_idx,
                       sample_idx)
        return film_mod_.splat_aligned(film, L.reshape(H, W, 3))

    film = film_mod.Film.empty(H, W)
    for s in range(settings.spp):
        film = one_pass(scene, vpls, film, jnp.asarray(s, jnp.int32))
    return film_mod.develop(film)


def _auto_radius(scene, cfg: icommon.IntegratorConfig) -> float:
    if cfg.initial_radius > 0:
        return cfg.initial_radius
    import numpy as np

    return float(np.asarray(scene.radius)) * 0.012


def render_sppm(scene, static, sensor, cfg: icommon.IntegratorConfig,
                settings: RenderSettings, jitter: bool):
    """Progressive photon mapping (ppm: fixed gather points / sppm:
    jittered). ``spp`` counts photon+eye passes."""
    from .integrators import photon as int_ph

    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    r0 = _auto_radius(scene, cfg)
    state = int_ph.sppm_init(H * W, r0)

    @jax.jit
    def one_pass(scene_, state_, pass_idx):
        return int_ph.sppm_pass(scene_, static, cfg, sensor, state_, seed,
                                pass_idx, cfg.photon_count, W, H, jitter,
                                cfg.sppm_alpha)

    for s in range(settings.spp):
        state = one_pass(scene, state, jnp.asarray(s, jnp.int32))
    return int_ph.sppm_develop(state, W, H)


def render_photonmapper(scene, static, sensor, cfg: icommon.IntegratorConfig,
                        settings: RenderSettings):
    """Classic photon mapper: one photon map, then spp camera passes with
    NEE + caustic gather + final gather (photonmapper.cpp)."""
    from .integrators import photon as int_ph

    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    r0 = _auto_radius(scene, cfg)
    depth = cfg.max_depth if cfg.max_depth > 0 else 16

    @jax.jit
    def build_map(scene_):
        pid = jnp.arange(cfg.photon_count, dtype=jnp.int32)
        pp = int_ph.trace_photons(scene_, static, cfg, seed + 101, pid,
                                  jnp.asarray(0, jnp.int32), depth)
        return int_ph.build_photon_map(*pp, cell_size=r0)

    pm = build_map(scene)

    @jax.jit
    def one_pass(scene_, pm_, film, sample_idx):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L = int_ph.photonmapper_li(
            scene_, static, cfg, pm_, float(cfg.photon_count), o, d,
            seed, pixel_idx, sample_idx, r0,
        )
        return film_mod.splat_aligned(film, L.reshape(H, W, 3))

    film = film_mod.Film.empty(H, W)
    for s in range(settings.spp):
        film = one_pass(scene, pm, film, jnp.asarray(s, jnp.int32))
    return film_mod.develop(film)


def render_bdpt(scene, static, sensor, cfg: icommon.IntegratorConfig,
                settings: RenderSettings):
    """Bidirectional render: per-pass eye+light subpaths for every pixel
    lane; t>=1 strategies land on the lane's pixel, t=0 strategies
    scatter-add into the shared light image (bdpt_wr.cpp merge)."""
    from .integrators import bdpt as int_bdpt

    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)

    @jax.jit
    def one_pass(scene_, film_data, sample_idx):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L, sp_uv, sp_val = int_bdpt.li_and_splats(
            scene_, static, cfg, sensor, o, d, seed, pixel_idx, sample_idx)
        film_data = film_data.at[:, :, :3].add(L.reshape(H, W, 3))
        # light image: box splat of every t=0 strategy (scale 1: one light
        # subpath per pixel lane per pass)
        Sn = sp_uv.shape[0]
        if Sn:
            px = jnp.clip((sp_uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
            py = jnp.clip((sp_uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
            ok = (sp_uv[..., 0] >= 0).astype(jnp.float32)[..., None]
            film_data = film_data.at[py.reshape(-1), px.reshape(-1), :3].add(
                (sp_val * ok).reshape(-1, 3), mode="drop")
        return film_data

    film_data = jnp.zeros((H, W, 4))
    for s_i in range(settings.spp):
        film_data = one_pass(scene, film_data, jnp.asarray(s_i, jnp.int32))
    return film_data[..., :3] / float(settings.spp)


def render_mlt(scene, static, sensor, cfg: icommon.IntegratorConfig,
               settings: RenderSettings):
    """pssmlt / mlt render: chains-in-lanes Metropolis (integrators/mlt.py).

    Mutation budget = spp * n_pixels, split across cfg.chain_count chains.
    Image = film_sum * b * n_pixels / N_mutations (Veach normalization).
    """
    from .integrators import mlt as int_mlt

    H, W = settings.height, settings.width
    n_pixels = H * W
    seed = int(settings.seed)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    n_chains = min(cfg.chain_count, max(1024, n_pixels))
    total_mut = settings.spp * n_pixels
    n_passes = max(1, (total_mut + n_chains - 1) // n_chains)
    steps_per_call = min(16, n_passes)
    mlt_mode = cfg.type == icommon.MLT

    b = jax.jit(
        lambda sc: int_mlt.estimate_b(sc, static, sensor, cfg, W, H, seed,
                                      cfg.luminance_samples,
                                      mlt_mode=mlt_mode)
    )(scene)

    st = jax.jit(
        lambda sc: int_mlt.seed_chains(sc, static, sensor, cfg, W, H, seed,
                                       n_chains, mlt_mode=mlt_mode)
    )(scene)

    @partial(jax.jit, static_argnums=(4,))
    def steps(sc, st_, film, step_base, n):
        return int_mlt.chain_steps(sc, static, sensor, cfg, W, H, seed,
                                   st_, film, step_base, n,
                                   mlt_mode=mlt_mode)

    film = jnp.zeros((H, W, 3))
    done = 0
    acc_stats = []
    while done < n_passes:
        n = min(steps_per_call, n_passes - done)
        st, film, acc = steps(scene, st, film, jnp.asarray(done, jnp.int32), n)
        acc_stats.append(acc)
        done += n
    from ..utils.logging import get_logger
    get_logger().info(
        "%s: %d chains x %d mutations, b=%.4g, mean acceptance %.3f",
        "mlt" if mlt_mode else "pssmlt", n_chains, n_passes, float(b),
        float(np.mean([float(a) for a in acc_stats])))
    N = n_passes * n_chains
    return film * (b * n_pixels / N)


def render_erpt(scene, static, sensor, cfg: icommon.IntegratorConfig,
                settings: RenderSettings):
    """ERPT render: spp passes of n_pixels seed paths, each redistributed
    over a chain_length Metropolis chain (integrators/mlt.py erpt_pass)."""
    from .integrators import mlt as int_mlt

    H, W = settings.height, settings.width
    n_pixels = H * W
    seed = int(settings.seed)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    n_seeds = min(n_pixels, 65536)

    @jax.jit
    def one_pass(sc, film, pass_idx):
        return int_mlt.erpt_pass(sc, static, sensor, cfg, W, H, seed, film,
                                 pass_idx, n_seeds, cfg.chain_length)

    total_seeds = 0
    film = jnp.zeros((H, W, 3))
    for p in range(max(1, settings.spp * n_pixels // n_seeds)):
        film = one_pass(scene, film, jnp.asarray(p, jnp.int32))
        total_seeds += n_seeds
    return film * (n_pixels / total_seeds)


def render_adaptive(scene, static, sensor, cfg: icommon.IntegratorConfig,
                    settings: RenderSettings):
    """Adaptive sampling with a Student's-t relative-error stopping rule
    (misc/adaptive.cpp: stop a pixel once t_q * sqrt(var/n) < maxError *
    mean, budget-capped at max_sample_factor * base spp).

    TPU-native shape: every pass still traces all pixel lanes in lock-step
    (SPMD lanes are free relative to divergence bookkeeping); converged
    pixels simply stop accumulating. Per-pixel Welford mean/M2 of luminance
    drives the stopping test.
    """
    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    base_cfg = IntegratorConfig_replace(cfg, type=icommon.PATH)
    li = _li_fn(base_cfg)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    # two-sided normal quantile approx of the Student's-t threshold
    # (adaptive.cpp uses boost's quantile; n is large once testing starts)
    quantiles = {0.01: 2.576, 0.05: 1.960, 0.1: 1.645}
    t_q = quantiles.get(round(cfg.p_value, 2), 1.960)

    @jax.jit
    def one_pass(scene_, acc, mean, m2, n, active, sample_idx):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        L = li(scene_, static, base_cfg, o, d, seed, pixel_idx, sample_idx)
        lum = 0.212671 * L[:, 0] + 0.715160 * L[:, 1] + 0.072169 * L[:, 2]
        n2 = jnp.where(active, n + 1.0, n)
        delta = lum - mean
        mean2 = jnp.where(active, mean + delta / jnp.maximum(n2, 1.0), mean)
        m2_new = jnp.where(active, m2 + delta * (lum - mean2), m2)
        acc2 = jnp.where(active[:, None], acc + L, acc)
        return acc2, mean2, m2_new, n2

    acc = jnp.zeros((H * W, 3))
    mean = jnp.zeros(H * W)
    m2 = jnp.zeros(H * W)
    n = jnp.zeros(H * W)
    active = jnp.ones(H * W, bool)
    max_spp = settings.spp * max(1, cfg.max_sample_factor)
    for s in range(max_spp):
        acc, mean, m2, n = one_pass(scene, acc, mean, m2, n, active,
                                    jnp.asarray(s, jnp.int32))
        if s + 1 >= settings.spp:
            var = m2 / jnp.maximum(n - 1.0, 1.0)
            err = t_q * jnp.sqrt(var / jnp.maximum(n, 1.0))
            active = err > cfg.max_error * jnp.maximum(mean, 1e-6)
            if not bool(jnp.any(active)):
                break
    img = acc / jnp.maximum(n, 1.0)[:, None]
    return img.reshape(H, W, 3)


def IntegratorConfig_replace(cfg, **kw):
    from dataclasses import replace
    return replace(cfg, **kw)


def render_multichannel(scene, static, sensor,
                        cfgs, settings: RenderSettings):
    """multichannel integrator (misc/multichannel.cpp): render several
    sub-integrators into one stacked (H, W, C) array — channel groups are
    concatenated in order, 3 channels per sub-integrator."""
    imgs = [render(scene, static, sensor, c, settings) for c in cfgs]
    return jnp.concatenate(imgs, axis=-1)


def render_irrcache(scene, static, sensor, cfg: icommon.IntegratorConfig,
                    settings: RenderSettings):
    """misc/irrcache.cpp: exact direct + Ward-interpolated cached diffuse
    indirect. Cache built once up front (screen-space records), then the
    per-sample pass is as cheap as `direct`."""
    from .integrators import irrcache as int_irrcache

    H, W = settings.height, settings.width
    # the cache estimate must not inherit whatever sampler strategy a
    # previous render left in the module-global state (advisor finding):
    # build it with plain PCG, which build_cache's dim layout assumes
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    cache = jax.jit(
        lambda sc: int_irrcache.build_cache(sc, static, sensor)
    )(scene)

    @partial(jax.jit, static_argnums=(4,))
    def one_pass(scene_, cache_, film, sample_base, n):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        seed = jnp.asarray(settings.seed, jnp.int32)
        for s in range(n):
            sample_idx = sample_base + s
            pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
            uv = pos / jnp.asarray([W, H], jnp.float32)
            u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx,
                                    icommon.DIM_APERTURE)
            o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
            L = int_irrcache.li(scene_, static, cfg, o, d, seed, pixel_idx,
                                sample_idx, cache=cache_)
            film = film_mod.splat_aligned(film, L.reshape(H, W, 3)) \
                if settings.filter_type == rfilter.BOX else \
                film_mod.splat(film, pos, L, settings.filter_type)
        return film

    film = film_mod.Film.empty(H, W)
    s = 0
    while s < settings.spp:
        n = min(settings.spp_per_pass, settings.spp - s)
        film = one_pass(scene, cache, film, jnp.asarray(s, jnp.int32), n)
        s += n
    return film_mod.develop(film)


def render_motion_blur(build_at, sensor, cfg: icommon.IntegratorConfig,
                       settings: RenderSettings, shutter=(0.0, 1.0),
                       time_strata: int = 8, sensor_at=None):
    """Motion blur over a shutter interval by stratified TIME SNAPSHOTS:
    the TPU-native replacement for the reference's space-time kd-tree
    (shapes/deformable.cpp) and AnimatedTransform ray-time machinery
    (track.cpp:394). ``build_at(t) -> (scene, static)`` compiles the scene
    at a fixed time (mesh keyframes lerped / AnimatedTransform poses
    evaluated host-side — core.quat.AnimatedTransform does both); each
    stratum renders spp/strata samples with a jittered time inside its
    stratum, and the strata average IS the shutter integral. Static
    geometry per snapshot keeps every kernel shape-stable under jit; the
    snapshots share one compiled program when their SceneStatic matches.

    ``sensor_at(t)`` optionally animates the camera (camera motion blur).
    """
    from dataclasses import replace

    t0, t1 = shutter
    n = max(1, time_strata)
    spp_each = max(1, settings.spp // n)
    rng = np.random.default_rng(settings.seed)
    acc = None
    for k in range(n):
        t = t0 + (t1 - t0) * (k + rng.random()) / n
        scene_k, static_k = build_at(float(t))
        sens_k = sensor if sensor_at is None else sensor_at(float(t))
        img = render(scene_k, static_k, sens_k, cfg,
                     replace(settings, spp=spp_each, seed=settings.seed + k))
        acc = img if acc is None else acc + img
    return acc / n


def render_motion(scene, static, sensor_t0, sensor_t1,
                  settings: RenderSettings):
    """misc/motion.cpp: per-pixel image-space motion vectors of the first
    hit between two camera poses (the reference differentiates the
    projection with forward-mode duals; here both projections are exact).
    Returns (H, W, 3): (dx_pixels, dy_pixels, hit mask)."""
    H, W = settings.height, settings.width

    @jax.jit
    def mv(scene_):
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
        uv = jnp.stack([((pixel_idx % W) + 0.5) / W,
                        ((pixel_idx // W) + 0.5) / H], axis=-1)
        o, d = sensor_mod.sample_ray(sensor_t0, uv, jnp.full((H * W, 2), 0.5))
        from .scene import ray_intersect
        its = ray_intersect(scene_, static, o, d, 1e-4, jnp.inf)
        s0 = sensor_mod.sample_direct(sensor_t0, its.p)
        s1 = sensor_mod.sample_direct(sensor_t1, its.p)
        res = jnp.asarray([W, H], jnp.float32)
        delta = (s1.uv - s0.uv) * res
        ok = its.valid & s0.valid & s1.valid
        out = jnp.concatenate(
            [jnp.where(ok[..., None], delta, 0.0),
             ok[..., None].astype(jnp.float32)], axis=-1)
        return out.reshape(H, W, 3)

    return mv(scene)


def render_meter(scene, static, sensor, cfg: icommon.IntegratorConfig,
                 settings: RenderSettings):
    """Measurement-sensor render (irradiancemeter/fluencemeter/radiancemeter
    on a 1x1 mfilm, the reference's data/tests/*.xml tier): instead of one
    lane per pixel x spp host passes, megabatch spp samples as lanes —
    pixel 0, per-lane sample index — and average. Returns (1, 1, 3)."""
    li = _li_fn(cfg)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    seed = jnp.asarray(settings.seed, jnp.int32)
    total = jnp.zeros(3)
    chunk = 1 << 15

    @jax.jit
    def one_chunk(scene_, s0):
        sample_idx = s0 + jnp.arange(chunk, dtype=jnp.int32)
        pixel_idx = jnp.zeros(chunk, jnp.int32)
        u = rng_mod.uniform2(seed, pixel_idx, sample_idx, icommon.DIM_SENSOR)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx,
                                icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, u, u_ap)
        L = li(scene_, static, cfg, o, d, seed, pixel_idx, sample_idx)
        return jnp.sum(L, axis=0)

    n = 0
    while n < settings.spp:
        total = total + one_chunk(scene, jnp.asarray(n, jnp.int32))
        n += chunk
    mean = total / n * sensor_mod.ray_weight(sensor)
    return mean.reshape(1, 1, 3)


def render_spectral(scene, static, sensor, cfg: icommon.IntegratorConfig,
                    settings: RenderSettings):
    """Hero-wavelength spectral render (the reference's SPECTRUM_SAMPLES
    spectral build, spectrum.h:25-32, in TPU-native form — see path.li's
    spectral_wl). RGB scene parameters are lifted to smooth spectra on the
    fly; dielectrics with cauchy_b > 0 disperse. Returns (H, W, 3) sRGB."""
    from ..core import spectrum as spec_mod
    from .integrators import path as int_path

    H, W = settings.height, settings.width
    seed = jnp.asarray(settings.seed, jnp.int32)
    pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)

    @jax.jit
    def one_pass(scene_, film, sample_idx):
        pos = pixel_sample_positions(settings, pixel_idx, sample_idx, seed)
        uv = pos / jnp.asarray([W, H], jnp.float32)
        u_ap = rng_mod.uniform2(seed, pixel_idx, sample_idx,
                                icommon.DIM_APERTURE)
        o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
        u_wl = rng_mod.uniform1(seed, pixel_idx, sample_idx,
                                icommon.DIM_WAVELENGTH)
        wl, pdf = spec_mod.sample_wavelengths(u_wl)
        Lspec = int_path.li(scene_, static, cfg, o, d, seed, pixel_idx,
                            sample_idx, spectral_wl=wl)
        L = spec_mod.spectral_to_rgb(Lspec, wl, pdf)
        return film_mod.splat_aligned(film, L.reshape(H, W, 3))

    film = film_mod.Film.empty(H, W)
    for si in range(settings.spp):
        film = one_pass(scene, film, jnp.asarray(si, jnp.int32))
    return film_mod.develop(film)


def render(scene, static, sensor, cfg: icommon.IntegratorConfig,
           settings: RenderSettings):
    """Full render: jit-compiled sample passes, host loop over spp chunks.

    Returns the developed (H, W, 3) image.
    """
    if (settings.width == 1 and settings.height == 1
            and int(sensor.type) in (sensor_mod.RADIANCEMETER,
                                     sensor_mod.IRRADIANCEMETER,
                                     sensor_mod.FLUENCEMETER)
            and cfg.type in (icommon.PATH, icommon.DIRECT, icommon.VOLPATH,
                             icommon.AO)):
        return render_meter(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.ADAPTIVE:
        return render_adaptive(scene, static, sensor, cfg, settings)
    if cfg.type in (icommon.PSSMLT, icommon.MLT):
        return render_mlt(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.ERPT:
        return render_erpt(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.BDPT:
        return render_bdpt(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.PTRACER:
        return render_light_traced(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.VPL:
        return render_vpl(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.SPPM:
        return render_sppm(scene, static, sensor, cfg, settings, jitter=True)
    if cfg.type == icommon.PPM:
        return render_sppm(scene, static, sensor, cfg, settings, jitter=False)
    if cfg.type == icommon.PHOTONMAPPER:
        return render_photonmapper(scene, static, sensor, cfg, settings)
    if cfg.type == icommon.IRRCACHE:
        return render_irrcache(scene, static, sensor, cfg, settings)
    H, W = settings.height, settings.width
    chunk = min(settings.spp_per_pass, settings.spp)

    @partial(jax.jit, static_argnums=(3,))
    def one_pass(scene_, film, sample_base, n):
        return render_pass(scene_, static, sensor, cfg, settings, film,
                           sample_base, n)

    film = film_mod.Film.empty(H, W)
    s = 0
    if settings.checkpoint and os.path.exists(settings.checkpoint):
        ck = np.load(settings.checkpoint)
        if tuple(ck["shape"]) == (H, W) and int(ck["seed"]) == settings.seed:
            film = film_mod.Film(data=jnp.asarray(ck["film"]))
            s = int(ck["samples"])
    while s < settings.spp:
        n = min(chunk, settings.spp - s)
        try:
            film = one_pass(scene, film, jnp.asarray(s, jnp.int32), n)
            jax.block_until_ready(film.data)
        except Exception as e:  # failure containment (SURVEY 5.3): a
            # failed device step is re-issued once with the SAME
            # sample_base — the counter-based RNG makes the retry
            # bitwise identical to what the lost step would have produced
            # (the scheduler's cancelled-work story, minus the data loss)
            from ..utils.logging import get_logger

            get_logger().warning(
                "render pass at spp %d failed (%s); re-issuing once", s, e)
            film = one_pass(scene, film, jnp.asarray(s, jnp.int32), n)
        s += n
        if settings.checkpoint:
            tmp = settings.checkpoint + ".tmp.npz"
            np.savez(tmp, film=np.asarray(film.data), samples=s,
                     shape=(H, W), seed=settings.seed)
            os.replace(tmp, settings.checkpoint)
    return film_mod.develop(film)
