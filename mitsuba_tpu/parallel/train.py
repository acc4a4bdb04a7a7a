"""Differentiable inverse rendering: sharded gradient/optimization steps.

The reference has no differentiable rendering (SURVEY preamble); this is
the capability the TPU build adds on top. Estimator: detached sampling —
all sampling decisions (directions, lobe/emitter picks, RR) are taken with
pdfs treated as constants while the *evaluated* terms (BSDF values, emitted
radiance, textures) carry gradients. That yields unbiased interior
gradients w.r.t. BSDF albedo/roughness, emitter radiance and texture
contents (BASELINE config 5); geometry (silhouette) gradients are a later
reparameterization stage.

The scene pytree IS the parameter store: a gradient step is
`jax.grad(loss_of(render(scene)))` with the non-optimized leaves masked out,
psum-reduced over the mesh by the same collective that assembles the film.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..render import api as api_mod
from ..render import film as film_mod
from ..render.integrators import common as icommon
from .shard import render_pass_sharded


class ParamSpec(NamedTuple):
    """Which scene leaves are trainable (path strings into the Scene pytree)."""

    albedo: bool = True
    emitter_radiance: bool = True
    roughness: bool = False
    texture_stack: bool = False


def split_params(scene, spec: ParamSpec):
    """Split the scene into (params, statics): params is a dict of the
    optimized leaves, statics the scene with those leaves zeroed-out slots
    filled back at merge."""
    params = {}
    if spec.albedo:
        params["albedo"] = scene.materials.albedo
    if spec.emitter_radiance:
        params["emitter_radiance"] = scene.emitters.radiance
    if spec.roughness:
        params["alpha"] = scene.materials.alpha
    if spec.texture_stack:
        params["tex_stack"] = scene.textures.stack
    return params


def merge_params(scene, params):
    mats = scene.materials
    ems = scene.emitters
    texs = scene.textures
    if "albedo" in params:
        mats = mats._replace(albedo=params["albedo"])
    if "alpha" in params:
        mats = mats._replace(alpha=jnp.maximum(params["alpha"], 1e-3))
    if "emitter_radiance" in params:
        ems = ems._replace(radiance=jnp.maximum(params["emitter_radiance"], 0.0))
    if "tex_stack" in params:
        texs = texs._replace(stack=jnp.clip(params["tex_stack"], 0.0, 1.0))
    return scene._replace(materials=mats, emitters=ems, textures=texs)


def render_loss(scene, static, sensor, cfg, settings, target, sample_base,
                n_samples: int, mesh=None):
    """L2 image loss of one stochastic render pass against ``target``."""
    H, W = settings.height, settings.width
    film = film_mod.Film.empty(H, W)
    if mesh is None:
        film = api_mod.render_pass(
            scene, static, sensor, cfg, settings, film, sample_base, n_samples
        )
    else:
        film = render_pass_sharded(
            scene, static, sensor, cfg, settings, mesh, film, sample_base, n_samples
        )
    img = film_mod.develop(film)
    return jnp.mean((img - target) ** 2)


def make_train_step(scene_template, static, sensor, cfg, settings, spec: ParamSpec,
                    optimizer=None, n_samples: int = 4, mesh=None):
    """Build a jitted Adam step closure: (params, opt_state, target, step)
    -> (params, opt_state, loss). This is the framework's "training step" —
    the full fwd render + backward sweep + parameter update."""
    optimizer = optimizer or optax.adam(2e-2)

    def loss_fn(params, target, sample_base):
        scene = merge_params(scene_template, params)
        return render_loss(
            scene, static, sensor, cfg, settings, target, sample_base,
            n_samples, mesh=mesh,
        )

    @jax.jit
    def step(params, opt_state, target, it):
        sample_base = it * n_samples
        loss, grads = jax.value_and_grad(loss_fn)(params, target, sample_base)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(params):
        return optimizer.init(params)

    return step, init
