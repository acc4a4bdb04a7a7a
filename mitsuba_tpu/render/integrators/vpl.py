"""Instant-radiosity VPL renderer (reference: src/integrators/vpl/vpl.cpp,
VPL generation librender/vpl.cpp:76 generateVPLs).

Phase 1 deposits virtual point lights along light-carrying random walks
(same walk as the particle tracer); phase 2 shades every camera first-hit
against the whole VPL set. TPU shape: the VPL set is a fixed-size array
(walks x depth lanes with a validity mask); shading loops over VPLs with a
``lax.fori_loop`` so the R x V shadow-ray work stays one megabatch per VPL.

Contribution of surface VPL k to eye vertex x (path-integral form):
  beta_k * f_vpl_eval(wi_k -> to_x) * f_x_eval(to_vpl -> cam) * V / r^2
(our eval includes |cos| on the outgoing side, supplying both G cosines).
Distance clamping mirrors the reference's relative bound (vpl.cpp
`clamping`): r^2 is floored at (clamp * scene_radius)^2.
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
from .common import DIM_BASE, DIM_BSDF, DIMS_PER_BOUNCE, IntegratorConfig, ray_offset


class VplSet(NamedTuple):
    p: jnp.ndarray        # (V, 3) position
    n: jnp.ndarray        # (V, 3) shading normal
    gn: jnp.ndarray       # (V, 3) geometric normal
    wi_world: jnp.ndarray # (V, 3) incoming direction (toward previous vertex)
    weight: jnp.ndarray   # (V, 3) beta (power / pdf / n_walks)
    mat_id: jnp.ndarray   # (V,) material at the VPL (-1 = emitter vertex)
    uv: jnp.ndarray       # (V, 2)
    valid: jnp.ndarray    # (V,) bool


def generate_vpls(scene, static, cfg: IntegratorConfig, n_walks: int, seed):
    """Random-walk VPL deposition (generateVPLs, vpl.cpp:76). Returns a
    VplSet with V = n_walks * max(max_depth - 1, 1) entries."""
    P = n_walks
    # a surface VPL at walk index i yields light..y_i..x..camera paths of
    # i + 4 vertices; cap at max_depth + 1 total like the path tracer
    depth = max(cfg.max_depth - 2, 0)
    types = static.bsdf_types
    pid = jnp.arange(P, dtype=jnp.int32)
    zero = jnp.zeros((), jnp.int32)

    u_e = rng_mod.uniform4(seed, pid, zero, 0)
    u_ed = rng_mod.uniform2(seed, pid, zero, 1)
    ers = em_mod.sample_ray(scene, static, u_e, u_ed)

    # slot 0 per walk: the emitter vertex itself (radiance Le, weight 1/p_A)
    em_w = jnp.where(
        (ers.valid & ers.is_area)[..., None],
        ers.radiance * m.safe_div(1.0, ers.pdf_area)[..., None],
        0.0,
    )

    vpl_p = [ers.o]
    vpl_n = [ers.n]
    vpl_gn = [ers.n]
    vpl_wi = [ers.n]  # unused for emitter vertices
    vpl_w = [em_w / P]
    vpl_mat = [jnp.full((P,), -1, jnp.int32)]
    vpl_uv = [jnp.zeros((P, 2))]
    vpl_ok = [ers.valid & ers.is_area]

    thr = jnp.where(ers.valid[..., None], ers.weight, 0.0)
    o, d, active = ers.o, ers.d, ers.valid

    for i in range(depth):
        dim0 = DIM_BASE + i * DIMS_PER_BOUNCE
        its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf,
                                      active=active)
        active = active & its.valid
        vpl_p.append(its.p)
        vpl_n.append(its.sh_frame.n)
        vpl_gn.append(its.gn)
        vpl_wi.append(its.wi_world)
        vpl_w.append(jnp.where(active[..., None], thr, 0.0) / P)
        vpl_mat.append(jnp.where(active, its.mat_id, -1))
        vpl_uv.append(its.uv)
        vpl_ok.append(active)

        if i + 1 < depth:
            bl = scene_mod.bsdf_locals(scene, its, static)
            u_b = rng_mod.uniform4(seed, pid, zero, dim0 + DIM_BSDF)
            bs = bsdf_mod.sample(bl, its.wi, u_b[..., 0], u_b[..., 1:3],
                                 active_types=types)
            thr = thr * bs.weight * (bs.eta * bs.eta)[..., None]
            active = active & (bs.pdf > 0) & (jnp.max(thr, axis=-1) > 0)
            d = m.normalize(its.sh_frame.to_world(bs.wo))
            o = ray_offset(its.p, its.gn, d)

    return VplSet(
        p=jnp.concatenate(vpl_p),
        n=jnp.concatenate(vpl_n),
        gn=jnp.concatenate(vpl_gn),
        wi_world=jnp.concatenate(vpl_wi),
        weight=jnp.concatenate(vpl_w),
        mat_id=jnp.concatenate(vpl_mat),
        uv=jnp.concatenate(vpl_uv),
        valid=jnp.concatenate(vpl_ok),
    )


def li(scene, static, cfg: IntegratorConfig, vpls: VplSet, o, d, seed,
       pixel, sample):
    """Shade camera rays against the VPL set (vpl.cpp render loop)."""
    R = o.shape[0]
    types = static.bsdf_types
    its = scene_mod.ray_intersect(scene, static, o, d, 1e-4, jnp.inf)
    active = its.valid
    bl = scene_mod.bsdf_locals(scene, its, static)

    # directly visible emitters
    L = jnp.where(active[..., None],
                  scene_mod.emitted_radiance(scene, static, its, d), 0.0)
    if static.has_env:
        L = L + jnp.where((~its.valid)[..., None],
                          em_mod.eval_env(scene, static, d), 0.0)

    r_min2 = (cfg.vpl_clamp * scene.radius) ** 2
    V = vpls.p.shape[0]

    def body(k, L):
        vp = vpls.p[k]
        vn = vpls.n[k]
        vw = vpls.weight[k]
        vmat = vpls.mat_id[k]
        ok = active & vpls.valid[k]

        to_v = vp[None, :] - its.p
        r2 = m.squared_length(to_v)
        dist = jnp.sqrt(jnp.maximum(r2, 1e-12))
        wo_w = to_v / dist[..., None]

        # eye-side BSDF (includes cos_x)
        wo_local = its.sh_frame.to_local(wo_w)
        f_x = bsdf_mod.eval(bl, its.wi, wo_local, active_types=types)

        # VPL-side outgoing radiance * cos_vpl
        cos_v = m.dot(vn[None, :], -wo_w)
        is_em = vmat < 0
        # emitter vertex: Le * cos; surface vertex: f_vpl_eval via its material
        from ..bsdf import gather_locals

        bl_v = gather_locals(scene.materials, jnp.broadcast_to(jnp.maximum(vmat, 0), (R,)))
        from ...core.frame import Frame

        fr_v = Frame.from_normal(jnp.broadcast_to(vn[None, :], (R, 3)))
        wi_v = fr_v.to_local(jnp.broadcast_to(vpls.wi_world[k][None, :], (R, 3)))
        f_v = bsdf_mod.eval(bl_v, wi_v, fr_v.to_local(-wo_w), active_types=types)
        f_v = jnp.where(is_em, jnp.maximum(cos_v, 0.0)[..., None], f_v)

        g = m.safe_div(1.0, jnp.maximum(r2, r_min2))
        contrib = vw[None, :] * f_x * f_v * g[..., None]
        ok = ok & (jnp.max(contrib, axis=-1) > 0)

        o_sh = ray_offset(its.p, its.gn, wo_w)
        vis = ~scene_mod.occluded(
            scene, static, o_sh, wo_w, 0.0, dist * (1.0 - 1e-3), active=ok
        )
        return L + jnp.where((ok & vis)[..., None], contrib, 0.0)

    L = jax.lax.fori_loop(0, V, body, L)
    return L
