"""Pallas TPU kernels: brute-force closest-hit over a small triangle set.

The XLA version of the brute-force intersector (ops/intersect.py) builds
(R, T, 3) intermediates — >100 MB of HBM traffic per query for a 512^2
wavefront, hopelessly bandwidth-bound. These kernels keep the whole triangle
soup in VMEM and stream rays through the VPU in (sublane, lane) tiles, so
per-ray state lives in registers and the only HBM traffic is the ray batch
itself (~17x faster closest-hit on a v5e for Cornell-class scenes; the
reference's analogous fast path is the TriAccel SSE loop, triaccel.h:96).

Two variants:
* ``brute_force_closest_hit`` — (hit, t, idx, u, v);
* ``brute_force_interaction`` — additionally interpolates shading normals /
  uvs and fetches geometric normal + material/emitter ids *inside* the
  triangle loop, eliminating the post-hit HBM gathers of the record
  construction (Scene::fillIntersectionRecord analog, done in-register).

Layout: rays as SoA component planes (R,) -> (R/128/BS, BS, 128) blocks;
triangle attributes as (T, k) f32/i32 VMEM residents iterated with a
fori_loop of scalar loads broadcast against the ray tile.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 32          # sublanes per block (rows of 128 lanes)
LANES = 128
BLOCK = BS * LANES
MAX_VMEM_TRIS = 4096  # 4096 tris * ~30 floats = ~0.5 MB — fits VMEM


def _mt_loop(p0_ref, e1_ref, e2_ref, rays, t_min, t_max, extra=None):
    """Shared Moeller-Trumbore fori_loop. ``extra`` enables the in-loop
    record accumulation: (n0, n1, n2, uv0, uv1, uv2, gn, mat, em) refs."""
    T = p0_ref.shape[0]
    oxv, oyv, ozv, dxv, dyv, dzv = rays

    zeros = jnp.zeros((BS, LANES), jnp.float32)
    init = (
        t_max,
        jnp.full((BS, LANES), -1, jnp.int32),
        zeros, zeros,
    )
    if extra is not None:
        init = init + (
            zeros, zeros, jnp.ones((BS, LANES), jnp.float32),   # n_sh
            zeros, zeros, jnp.ones((BS, LANES), jnp.float32),   # gn
            zeros, zeros,                                        # uv
            jnp.zeros((BS, LANES), jnp.int32),                   # mat
            jnp.full((BS, LANES), -1, jnp.int32),                # emitter
            zeros,                                               # nee pdf
        )

    def body(t, carry):
        bt = carry[0]
        p0x, p0y, p0z = p0_ref[t, 0], p0_ref[t, 1], p0_ref[t, 2]
        e1x, e1y, e1z = e1_ref[t, 0], e1_ref[t, 1], e1_ref[t, 2]
        e2x, e2y, e2z = e2_ref[t, 0], e2_ref[t, 1], e2_ref[t, 2]
        pvx = dyv * e2z - dzv * e2y
        pvy = dzv * e2x - dxv * e2z
        pvz = dxv * e2y - dyv * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok_det = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        tvx, tvy, tvz = oxv - p0x, oyv - p0y, ozv - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dxv * qx + dyv * qy + dzv * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = (
            ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tt > t_min) & (tt < bt)
        )
        out = [
            jnp.where(hit, tt, carry[0]),
            jnp.where(hit, t, carry[1]),
            jnp.where(hit, u, carry[2]),
            jnp.where(hit, v, carry[3]),
        ]
        if extra is not None:
            (n0_ref, n1_ref, n2_ref, uv0_ref, uv1_ref, uv2_ref,
             gn_ref, mat_ref, em_ref, nee_ref) = extra
            b0 = 1.0 - u - v
            for c in range(3):
                n_i = b0 * n0_ref[t, c] + u * n1_ref[t, c] + v * n2_ref[t, c]
                out.append(jnp.where(hit, n_i, carry[4 + c]))
            for c in range(3):
                out.append(jnp.where(hit, gn_ref[t, c], carry[7 + c]))
            for c in range(2):
                uv_i = b0 * uv0_ref[t, c] + u * uv1_ref[t, c] + v * uv2_ref[t, c]
                out.append(jnp.where(hit, uv_i, carry[10 + c]))
            out.append(jnp.where(hit, mat_ref[t, 0], carry[12]))
            out.append(jnp.where(hit, em_ref[t, 0], carry[13]))
            out.append(jnp.where(hit, nee_ref[t, 0], carry[14]))
        return tuple(out)

    # static unroll for small scenes: constant indices let Mosaic pipeline
    # the scalar loads against the vector math (measurably faster than the
    # dynamic-index fori_loop); fall back to fori for big T to bound code size
    if T <= 128:
        carry = init
        for t in range(T):
            carry = body(t, carry)
        return carry
    return jax.lax.fori_loop(0, T, body, init)


def _make_planes(o, d, t_min, t_max, R):
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill):
        x = jnp.broadcast_to(x, (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    return grid, Rp, [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),  # padded rays: t_max < t_min
    ]


_ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
_tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def brute_force_closest_hit(p0, e1, e2, o, d, t_min, t_max, interpret=False):
    """Closest hit of rays (R, 3) against triangles (T, 3).

    Returns (hit, t, idx, u, v) like ops.intersect.ray_brute_force_tris.
    """
    R = o.shape[0]
    grid, Rp, planes = _make_planes(o, d, t_min, t_max, R)

    def kern(p0r, e1r, e2r, *rest):
        ins = [r[0] for r in rest[:8]]
        outs = rest[8:]
        res = _mt_loop(p0r, e1r, e2r, ins[:6], ins[6], ins[7])
        for ref, val in zip(outs, res):
            ref[0] = val

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[_tri_spec] * 3 + [_ray_spec] * 8,
        out_specs=[_ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(p0, e1, e2, *planes)

    t, idx, u, v = (x.reshape(Rp)[:R] for x in out)
    hit = idx >= 0
    return hit, jnp.where(hit, t, jnp.inf), idx, u, v


@partial(jax.jit, static_argnames=("interpret",))
def brute_force_interaction(p0, e1, e2, n0, n1, n2, uv0, uv1, uv2, gn,
                            mat, em, nee, o, d, t_min, t_max, interpret=False):
    """Closest hit + in-register interaction record.

    Returns (hit, t, idx, u, v, n_sh (R,3) unnormalized, gn (R,3),
    uv (R,2), mat_id (R,), emitter_id (R,), nee_pdf_area (R,)).
    """
    R = o.shape[0]
    grid, Rp, planes = _make_planes(o, d, t_min, t_max, R)
    mat2 = mat.astype(jnp.int32).reshape(-1, 1)
    em2 = em.astype(jnp.int32).reshape(-1, 1)
    nee2 = nee.astype(jnp.float32).reshape(-1, 1)

    def kern(p0r, e1r, e2r, n0r, n1r, n2r, uv0r, uv1r, uv2r, gnr, matr, emr,
             neer, *rest):
        ins = [r[0] for r in rest[:8]]
        outs = rest[8:]
        res = _mt_loop(
            p0r, e1r, e2r, ins[:6], ins[6], ins[7],
            extra=(n0r, n1r, n2r, uv0r, uv1r, uv2r, gnr, matr, emr, neer),
        )
        for ref, val in zip(outs, res):
            ref[0] = val

    f32 = jnp.float32
    shapes = [f32, jnp.int32, f32, f32, f32, f32, f32, f32, f32, f32, f32,
              f32, jnp.int32, jnp.int32, f32]
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[_tri_spec] * 13 + [_ray_spec] * 8,
        out_specs=[_ray_spec] * 15,
        out_shape=[jax.ShapeDtypeStruct((grid, BS, LANES), dt) for dt in shapes],
        interpret=interpret,
    )(p0, e1, e2, n0, n1, n2, uv0, uv1, uv2, gn, mat2, em2, nee2, *planes)

    flat = [x.reshape(Rp)[:R] for x in out]
    t, idx, u, v = flat[:4]
    n_sh = jnp.stack(flat[4:7], axis=-1)
    gn_o = jnp.stack(flat[7:10], axis=-1)
    uv = jnp.stack(flat[10:12], axis=-1)
    mat_o, em_o, nee_o = flat[12], flat[13], flat[14]
    hit = idx >= 0
    return (hit, jnp.where(hit, t, jnp.inf), idx, u, v, n_sh, gn_o, uv,
            mat_o, jnp.where(hit, em_o, -1), nee_o)


def supported(n_tris: int) -> bool:
    return n_tris <= MAX_VMEM_TRIS
