"""Pallas TPU kernel: swept threaded-BVH traversal over fat node rows.

TPU vector lanes cannot gather per-lane node data from VMEM (Mosaic's
dynamic_gather is one-vreg only), so classic per-ray BVH traversal does not
map onto the VPU. The TPU-native alternative exploits a property of the
threaded (skip-link) layout built in accel/build.py: **a ray's node pointer
is strictly increasing** (next is either node+1 or skip[node] > node).
Hence a whole ray block sweeps the *union* of its lanes' traversal paths in
one forward pass: each step takes the minimum pending node across lanes (a
vector reduction), loads that node once with scalar reads, and advances
exactly the lanes parked on it. Every union node is visited once, in order.

Memory layout: Mosaic only allows *dynamic* indexing along the sublane
dimension, and a (N, k) tile pads k to the 128-lane width — so each node is
a **fat row** of one (N, 64) float32 table: AABB, skip link, leaf count,
and up to 4 inlined leaf triangles with their original ids (integers stored
as exact float32 values — node/tri counts stay below 2^24). One
dynamic-sublane row read per step, no separate triangle table.

Coherent ray blocks (primary/shadow tiles) share most of their path so the
union stays near one ray's path length; incoherent blocks degrade toward
O(nodes). Table VMEM: 256 B/node -> ~17 MB at 100k triangles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 8           # sublanes per ray block
LANES = 128
BLOCK = BS * LANES
LEAF_SIZE = 4
ROW = 64         # floats per node row
MAX_PACKED_NODES = 400_000  # ~100 MB VMEM ceiling

# row column layout
_C_LO = 0        # 3 floats
_C_HI = 3        # 3 floats
_C_SKIP = 6      # int32 bitcast
_C_COUNT = 7     # int32 bitcast (0 => internal node)
_C_TRI = 8       # 4 x (p0.xyz, e1.xyz, e2.xyz, orig_id) = 4 x 10


def pack_nodes(bvh, p0, e1, e2) -> np.ndarray:
    """Host-side row packing: (N, ROW) float32 from an accel.build.BVH and
    the ORIGINAL (unpermuted) triangle arrays."""
    N = len(bvh.lo)
    rows = np.zeros((N, ROW), np.float32)
    rows[:, _C_LO:_C_LO + 3] = bvh.lo
    rows[:, _C_HI:_C_HI + 3] = bvh.hi
    assert N < (1 << 24) and len(p0) < (1 << 24)
    rows[:, _C_SKIP] = bvh.skip.astype(np.float32)
    counts = np.where(bvh.prim_first >= 0, bvh.prim_count, 0)
    rows[:, _C_COUNT] = counts.astype(np.float32)
    leaf = np.nonzero(counts > 0)[0]
    for k in range(LEAF_SIZE):
        sel = leaf[counts[leaf] > k]
        tri = bvh.prim_order[bvh.prim_first[sel] + k]
        base = _C_TRI + 10 * k
        rows[sel, base + 0:base + 3] = p0[tri]
        rows[sel, base + 3:base + 6] = e1[tri]
        rows[sel, base + 6:base + 9] = e2[tri]
        rows[sel, base + 9] = tri.astype(np.float32)
    return rows


def _traverse(rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmin, tmaxv,
              any_hit=False):
    N = rows_ref.shape[0]

    def safe_inv(x):
        tiny = jnp.abs(x) < 1e-12
        return 1.0 / jnp.where(tiny, jnp.where(x < 0, -1e-12, 1e-12), x)

    inx, iny, inz = safe_inv(dxv), safe_inv(dyv), safe_inv(dzv)

    state0 = (
        jnp.zeros((), jnp.int32),                   # scalar: current min node
        jnp.zeros((BS, LANES), jnp.int32),
        tmaxv,
        jnp.full((BS, LANES), -1, jnp.int32),
        jnp.zeros((BS, LANES), jnp.float32),
        jnp.zeros((BS, LANES), jnp.float32),
    )

    def cond(st):
        # scalar-only condition: a vector->scalar reduction here would stall
        # the pipeline every iteration (the min is carried from the body)
        return st[0] < N

    def body(st):
        cur, node, bt, bi, bu, bv = st
        here = node == cur

        def f(c):
            return rows_ref[cur, c]

        def i32(c):
            return rows_ref[cur, c].astype(jnp.int32)

        lox, loy, loz = f(_C_LO), f(_C_LO + 1), f(_C_LO + 2)
        hix, hiy, hiz = f(_C_HI), f(_C_HI + 1), f(_C_HI + 2)
        skip = i32(_C_SKIP)
        cnt = i32(_C_COUNT)
        is_leaf = cnt > 0

        t0x = (lox - oxv) * inx
        t1x = (hix - oxv) * inx
        t0y = (loy - oyv) * iny
        t1y = (hiy - oyv) * iny
        t0z = (loz - ozv) * inz
        t1z = (hiz - ozv) * inz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), tmin),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), bt),
        )
        hit_box = here & (tnear <= tfar)

        def leaf_tests(carry):
            bt, bi, bu, bv = carry
            for k in range(LEAF_SIZE):
                base = _C_TRI + 10 * k
                valid = hit_box & (k < cnt)  # cnt==0 on internal nodes
                p0x, p0y, p0z = f(base), f(base + 1), f(base + 2)
                e1x, e1y, e1z = f(base + 3), f(base + 4), f(base + 5)
                e2x, e2y, e2z = f(base + 6), f(base + 7), f(base + 8)
                tid = i32(base + 9)
                pvx = dyv * e2z - dzv * e2y
                pvy = dzv * e2x - dxv * e2z
                pvz = dxv * e2y - dyv * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) > 1e-12
                invd = 1.0 / jnp.where(ok, det, 1.0)
                tvx, tvy, tvz = oxv - p0x, oyv - p0y, ozv - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (dxv * qx + dyv * qy + dzv * qz) * invd
                tt = (e2x * qx + e2y * qy + e2z * qz) * invd
                h = (valid & ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
                     & (tt > tmin) & (tt < bt))
                bt = jnp.where(h, tt, bt)
                bi = jnp.where(h, tid, bi)
                bu = jnp.where(h, uu, bu)
                bv = jnp.where(h, vv, bv)
            return bt, bi, bu, bv

        bt, bi, bu, bv = jax.lax.cond(
            is_leaf, leaf_tests, lambda c: c, (bt, bi, bu, bv)
        )

        descend = hit_box & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, cur + 1, skip)
        node = jnp.where(here, nxt, node)
        if any_hit:
            # occlusion query: a lane retires on its first hit
            # (skdtree.cpp:207 boolean shadow-ray fast path)
            node = jnp.where(bi >= 0, N, node)
        return jnp.min(node), node, bt, bi, bu, bv

    _, _, bt, bi, bu, bv = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv


@partial(jax.jit, static_argnames=("interpret", "any_hit"))
def bvh_traverse_packed(rows, o, d, t_min, t_max, interpret=False,
                        any_hit=False):
    """Swept traversal of rays (R, 3) against packed node rows (N, ROW).

    Returns (hit, t, tri_idx (original ids), u, v). With ``any_hit`` lanes
    retire on the first hit (boolean occlusion semantics; t/idx/u/v then
    report an arbitrary hit, not the closest).
    """
    R = o.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill):
        x = jnp.broadcast_to(x, (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    rays = [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),
    ]

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(rows.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(rows_r, *rest):
        ins = [r[0] for r in rest[:8]]
        outs = rest[8:]
        bt, bi, bu, bv = _traverse(rows_r, *ins, any_hit=any_hit)
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rows, *rays)

    t, idx, u, v = (x.reshape(Rp)[:R] for x in out)
    hitm = idx >= 0
    return hitm, jnp.where(hitm, t, jnp.inf), idx, u, v


def supported(n_nodes: int) -> bool:
    return n_nodes <= MAX_PACKED_NODES


# --- coherence sorting ------------------------------------------------------

def _part1by2(x):
    """Spread 10 bits over 30 (Morton interleave helper)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return x


def ray_sort_keys(o, d, scene_lo, scene_hi):
    """Coherence key: direction octant (3 bits) then origin Morton code.

    The swept traversal's cost is the per-block union of node paths;
    grouping rays by octant+locality shrinks that union by orders of
    magnitude for bounce rays (the TPU analog of CPU packet reordering /
    Reshetov ray streams)."""
    ext = jnp.maximum(scene_hi - scene_lo, 1e-9)
    q = jnp.clip((o - scene_lo) / ext, 0.0, 1.0)
    qi = (q * 1023.0).astype(jnp.uint32)
    morton = (
        _part1by2(qi[:, 0])
        | (_part1by2(qi[:, 1]) << jnp.uint32(1))
        | (_part1by2(qi[:, 2]) << jnp.uint32(2))
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << jnp.uint32(1))
        | ((d[:, 2] >= 0).astype(jnp.uint32) << jnp.uint32(2))
    )
    return (octant << jnp.uint32(29)) | (morton >> jnp.uint32(1))


@partial(jax.jit, static_argnames=("sort", "any_hit"))
def bvh_traverse(rows, o, d, t_min, t_max, scene_lo, scene_hi, sort=True,
                 any_hit=False):
    """Traversal with optional coherence sort (sort -> traverse -> unsort)."""
    if not sort:
        return bvh_traverse_packed(rows, o, d, t_min, t_max, any_hit=any_hit)
    R = o.shape[0]
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    order = jnp.argsort(key)
    inv = jnp.argsort(order)
    res = bvh_traverse_packed(
        rows, o[order], d[order], t_min[order], t_max[order], any_hit=any_hit
    )
    return tuple(x[inv] for x in res)
