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
                        film, sample_base, n_samples: int):
    """One sharded accumulation pass.

    Pixels are sharded over ``dp``; each ``sp`` shard renders a disjoint
    slice of the sample indices; the per-device partial films are psum-ed
    into a replicated film. Differentiable end-to-end (psum is linear).
    """
    H, W = settings.height, settings.width
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    R = H * W
    assert R % n_dp == 0, "pixel count must divide dp"
    assert n_samples % n_sp == 0, "samples per pass must divide sp"
    pixel_idx = jnp.arange(R, dtype=jnp.int32)

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
        local_film = film_mod.Film.empty(H, W)
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
    extra film rows (rendered below the image and cropped off afterwards)
    instead of being rejected — the P2 block-decomposition never required
    divisible tilings either."""
    H, W = settings.height, settings.width
    H_orig = H
    n_dp = mesh.shape["dp"]
    H_pad = -(-H // n_dp) * n_dp
    crop = H_pad != H
    if crop:
        from dataclasses import replace

        settings = replace(settings, height=H_pad)
        H = H_pad
    chunk = min(settings.spp_per_pass, settings.spp)
    n_sp = mesh.shape["sp"]
    chunk = max(chunk, n_sp)

    @partial(jax.jit, static_argnums=(2,))
    def one_pass(scene_, film, n, sample_base):
        return render_pass_sharded(
            scene_, static, sensor, cfg, settings, mesh, film, sample_base, n
        )

    film = film_mod.Film.empty(H, W)
    s = 0
    while s < settings.spp:
        n = min(chunk, settings.spp - s)
        n = max(n - n % n_sp, n_sp)
        film = one_pass(scene, film, n, jnp.asarray(s, jnp.int32))
        s += n
    img = film_mod.develop(film)
    return img[:H_orig] if crop else img
