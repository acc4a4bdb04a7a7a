"""SPMD sharded rendering over a TPU device mesh.

The reference parallelizes by fanning 32x32 pixel blocks through a
work-stealing Scheduler to local threads and remote TCP/SSH nodes
(SURVEY §2.7: sched.cpp, sched_remote.cpp). The TPU-native replacement is
GSPMD: a jax Mesh with two axes —

* ``dp`` (pixel/tile parallelism — the BlockedRenderProcess P2 analog),
* ``sp`` (samples-per-pixel parallelism — the ParticleProcess P3 analog),

with the scene replicated in every device's HBM (resource replication P7) and
the film reduced with a single ``psum`` over both axes (the TCP result
stream + film mutex, replaced by one ICI collective). Because the RNG is a
pure counter hash keyed by (pixel, sample), the image is bitwise independent
of the mesh layout, which is the reference's distributed-determinism
property (sampler.h:94-111) for free.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..render import api as api_mod
from ..render import film as film_mod
from ..render.integrators import common as icommon


def make_mesh(devices=None, dp: int = None, sp: int = 1) -> Mesh:
    """Build a (dp, sp) mesh over the given devices (default: all)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp*sp must equal device count ({dp}*{sp} != {n})"
    dev_array = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


def render_pass_sharded(scene, static, sensor, cfg: icommon.IntegratorConfig,
                        settings: api_mod.RenderSettings, mesh: Mesh,
                        film, sample_base, n_samples: int,
                        pixel_idx=None, film_h=None):
    """One sharded accumulation pass.

    Pixels are sharded over ``dp``; each ``sp`` shard renders a disjoint
    slice of the sample indices; the per-device partial films are psum-ed
    into a replicated film. Differentiable end-to-end (psum is linear).
    ``pixel_idx``/``film_h`` support the pad-and-crop path: extra lanes
    carry out-of-image pixel ids and the film carries the padded rows.
    """
    H, W = settings.height, settings.width
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    if pixel_idx is None:
        pixel_idx = jnp.arange(H * W, dtype=jnp.int32)
    Hf = H if film_h is None else film_h
    R = pixel_idx.shape[0]
    assert R % n_dp == 0, "pixel count must divide dp"
    assert n_samples % n_sp == 0, "samples per pass must divide sp"

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("dp")),
        out_specs=P(),
        check_vma=False,  # the bounce-loop carry is legitimately varying
    )
    def work(scene_, film_, pix):
        sp_rank = jax.lax.axis_index("sp")
        local_base = sample_base + sp_rank * (n_samples // n_sp)
        local_film = film_mod.Film.empty(Hf, W)
        local_film = api_mod.render_pass(
            scene_, static, sensor, cfg, settings, local_film,
            local_base, n_samples // n_sp, pixel_idx=pix,
        )
        data = jax.lax.psum(local_film.data, axis_name=("dp", "sp"))
        return film_mod.Film(data=film_.data + data)

    return work(scene, film, pixel_idx)


def render_sharded(scene, static, sensor, cfg, settings, mesh: Mesh):
    """Full sharded render (the multi-chip Scene::render analog).

    Images whose pixel count does not divide the dp axis are padded with
    extra film rows and LANES instead of being rejected — the P2
    block-decomposition never required divisible tilings either. The
    camera mapping keeps the TRUE image height (padding must not change
    any real pixel's uv); padding lanes carry pixel ids placed further
    below the padded film than the widest filter footprint, so every one
    of their splat taps evaluates to zero and the result is exactly the
    unpadded image (mesh-layout independence, checked by the multichip
    dryrun)."""
    from ..render import rfilter as _rf

    H, W = settings.height, settings.width
    n_dp = mesh.shape["dp"]
    H_pad = -(-H // n_dp) * n_dp
    crop = H_pad != H
    pixel_idx = None
    film_h = None
    if crop:
        fp = _rf.footprint(settings.filter_type)
        n_extra = (H_pad - H) * W
        ids_pad = ((H_pad + fp + 2) * W
                   + jnp.arange(n_extra, dtype=jnp.int32))
        pixel_idx = jnp.concatenate(
            [jnp.arange(H * W, dtype=jnp.int32), ids_pad])
        film_h = H_pad
    chunk = min(settings.spp_per_pass, settings.spp)
    n_sp = mesh.shape["sp"]
    chunk = max(chunk, n_sp)

    @partial(jax.jit, static_argnums=(2,))
    def one_pass(scene_, film, n, sample_base):
        return render_pass_sharded(
            scene_, static, sensor, cfg, settings, mesh, film, sample_base,
            n, pixel_idx=pixel_idx, film_h=film_h,
        )

    film = film_mod.Film.empty(H_pad if crop else H, W)
    s = 0
    while s < settings.spp:
        n = min(chunk, settings.spp - s)
        n = max(n - n % n_sp, n_sp)
        film = one_pass(scene, film, n, jnp.asarray(s, jnp.int32))
        s += n
    img = film_mod.develop(film)
    return img[:H] if crop else img


# === sharding the remaining integrator families ===========================
#
# The reference distributes EVERY integrator through the same scheduler:
# bdpt_proc.cpp fans pixel blocks of bidirectional samples, gatherproc.cpp
# fans photon-shooting ranges, pssmlt_proc.cpp / mlt_proc.cpp fan Markov
# chains. The GSPMD analogs below shard the embarrassingly-parallel unit of
# each family over the FLAT device mesh (chains / photons / pixel lanes)
# and psum the film (and light image) exactly like render_pass_sharded.
# Counter-keyed RNG makes every result independent of the mesh layout.

def render_bdpt_sharded(scene, static, sensor, cfg, settings, mesh: Mesh):
    """Sharded bidirectional render (bdpt_proc.cpp role): pixel lanes over
    dp, sample passes over sp; each shard accumulates its own full-size
    light image (t=0 splats land anywhere) which one psum merges."""
    from ..core import rng as rng_mod
    from ..render import sensor as sensor_mod
    from ..render.integrators import bdpt as int_bdpt

    H, W = settings.height, settings.width
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    R = H * W
    assert R % n_dp == 0
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    spp = max(settings.spp // n_sp, 1) * n_sp  # divisible sample budget
    pixel_idx = jnp.arange(R, dtype=jnp.int32)

    @partial(jax.jit, static_argnums=())
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P(),
        check_vma=False,
    )
    def all_passes(scene_, pix):
        sp_rank = jax.lax.axis_index("sp")
        local_spp = spp // n_sp

        def one(s_i, film_data):
            sample_idx = sp_rank * local_spp + s_i
            u = rng_mod.uniform2(seed, pix, sample_idx, icommon.DIM_SENSOR)
            px = (pix % W).astype(jnp.float32)
            py = (pix // W).astype(jnp.float32)
            pos = jnp.stack([px, py], axis=-1) + u
            uv = pos / jnp.asarray([W, H], jnp.float32)
            u_ap = rng_mod.uniform2(seed, pix, sample_idx,
                                    icommon.DIM_APERTURE)
            o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
            L, sp_uv, sp_val = int_bdpt.li_and_splats(
                scene_, static, cfg, sensor, o, d, seed, pix, sample_idx)
            film_data = film_data.at[pix // W, pix % W, :].add(L)
            Sn = sp_uv.shape[0]
            if Sn:
                qx = jnp.clip((sp_uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
                qy = jnp.clip((sp_uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
                ok = (sp_uv[..., 0] >= 0).astype(jnp.float32)[..., None]
                film_data = film_data.at[qy.reshape(-1), qx.reshape(-1), :].add(
                    (sp_val * ok).reshape(-1, 3), mode="drop")
            return film_data

        film_data = jax.lax.fori_loop(
            0, local_spp, one, jnp.zeros((H, W, 3)))
        return jax.lax.psum(film_data, axis_name=("dp", "sp"))

    film = all_passes(scene, pixel_idx)
    return film / float(spp)


def render_photon_sharded(scene, static, sensor, cfg, settings, mesh: Mesh):
    """Sharded photon mapping (gatherproc.cpp role): the photon shooting
    range is sharded over the flat mesh and all-gathered into a replicated
    map (resource replication P7); camera gather passes shard pixels."""
    from ..core import rng as rng_mod
    from ..render import api as api_mod2
    from ..render import sensor as sensor_mod
    from ..render.integrators import photon as int_ph

    H, W = settings.height, settings.width
    n_dev = mesh.devices.size
    seed = jnp.asarray(settings.seed, jnp.int32)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    r0 = api_mod2._auto_radius(scene, cfg)
    depth = cfg.max_depth if cfg.max_depth > 0 else 16
    n_ph = -(-cfg.photon_count // n_dev) * n_dev

    @partial(jax.jit, static_argnums=())
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(("dp", "sp"))),
        out_specs=P(),
        check_vma=False,
    )
    def shoot(scene_, pid):
        pp = int_ph.trace_photons(scene_, static, cfg, seed + 101, pid,
                                  jnp.asarray(0, jnp.int32), depth)
        return tuple(
            jax.lax.all_gather(x, axis_name=("dp", "sp"), tiled=True)
            for x in pp)

    pid = jnp.arange(n_ph, dtype=jnp.int32)
    pp = shoot(scene, pid)
    pm = jax.jit(lambda pp_: int_ph.build_photon_map(*pp_, cell_size=r0))(pp)

    R = H * W
    n_dp = mesh.shape["dp"]
    assert R % n_dp == 0
    pixel_idx = jnp.arange(R, dtype=jnp.int32)

    @partial(jax.jit, static_argnums=())
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("dp")),
        out_specs=P(),
        check_vma=False,
    )
    def gather_pass(scene_, pm_, pix):
        sp_rank = jax.lax.axis_index("sp")
        n_sp = mesh.shape["sp"]
        local_spp = max(settings.spp // n_sp, 1)

        def one(s_i, acc):
            sample_idx = sp_rank * local_spp + s_i
            pos = api_mod2.pixel_sample_positions(
                settings, pix, sample_idx, seed)
            uv = pos / jnp.asarray([W, H], jnp.float32)
            u_ap = rng_mod.uniform2(seed, pix, sample_idx,
                                    icommon.DIM_APERTURE)
            o, d = sensor_mod.sample_ray(sensor, uv, u_ap)
            L = int_ph.photonmapper_li(
                scene_, static, cfg, pm_, float(n_ph), o, d,
                seed, pix, sample_idx, r0)
            return acc.at[pix // W, pix % W, :].add(L)

        acc = jax.lax.fori_loop(
            0, max(settings.spp // mesh.shape["sp"], 1), one,
            jnp.zeros((H, W, 3)))
        return jax.lax.psum(acc, axis_name=("dp", "sp"))

    n_sp = mesh.shape["sp"]
    spp_eff = max(settings.spp // n_sp, 1) * n_sp
    return gather_pass(scene, pm, pixel_idx) / float(spp_eff)


def render_mlt_sharded(scene, static, sensor, cfg, settings, mesh: Mesh):
    """Sharded Metropolis (pssmlt_proc.cpp / mlt_proc.cpp role): chains
    are lanes; the chain block is sharded over the flat mesh, each shard
    advances its chains and splats locally, one psum merges films and the
    normalization constant is psum-averaged."""
    from ..render.integrators import mlt as int_mlt
    from ..core import rng as rng_mod

    H, W = settings.height, settings.width
    n_pixels = H * W
    seed = int(settings.seed)
    rng_mod.set_sampler(rng_mod.INDEPENDENT)
    n_dev = mesh.devices.size
    n_chains = -(-min(cfg.chain_count, max(1024, n_pixels)) // n_dev) * n_dev
    total_mut = settings.spp * n_pixels
    n_passes = max(1, (total_mut + n_chains - 1) // n_chains)
    mlt_mode = cfg.type == icommon.MLT

    lane = jnp.arange(n_chains, dtype=jnp.int32)

    @partial(jax.jit, static_argnums=())
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(("dp", "sp"))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(scene_, lane_):
        # per-shard chain block: seed, then advance n_passes mutations.
        # The luminance normalization b evaluates the SAME flat global
        # sample set on every shard (replicated stage-1 — its cost is a
        # sliver of the chain stage), so b and hence the image scale are
        # exactly mesh-layout independent (SURVEY §4 determinism; checked
        # by the multichip dryrun).
        b_ = int_mlt.estimate_b(
            scene_, static, sensor, cfg, W, H, seed,
            max(cfg.luminance_samples, 1024), mlt_mode=mlt_mode)
        b_ = jax.lax.pmean(b_, axis_name=("dp", "sp"))
        st = int_mlt.seed_chains(
            scene_, static, sensor, cfg, W, H, seed, lane_.shape[0],
            mlt_mode=mlt_mode, lane_offset=lane_[0])
        film = jnp.zeros((H, W, 3))
        st, film, acc = int_mlt.chain_steps(
            scene_, static, sensor, cfg, W, H, seed, st, film,
            jnp.asarray(0, jnp.int32), n_passes, mlt_mode=mlt_mode,
            lane_offset=lane_[0])
        return jax.lax.psum(film, axis_name=("dp", "sp")), b_

    film, b = run(scene, lane)
    N = n_passes * n_chains
    return film * (float(b) * n_pixels / N)
