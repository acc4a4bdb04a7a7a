"""Data-parallel threaded-BVH traversal (device side).

One `lax.while_loop` advances the whole ray batch in lock-step; each lane
holds its own node pointer and walks `node = hit ? node+1 : skip[node]`.
There is no stack, no recursion and no data-dependent shapes — the XLA-
friendly replacement for the reference's recursive kd-tree traversal
(src/librender/skdtree.cpp:112-207). Leaves hold up to LEAF_SIZE triangles,
intersected with a statically unrolled masked loop.

Query types mirror skdtree.cpp: closest-hit (full record computed later),
and boolean any-hit for shadow rays (lane retires on first hit).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.intersect import ray_aabb, ray_triangle
from .build import BVH, LEAF_SIZE


class DeviceBVH(NamedTuple):
    lo: jnp.ndarray          # (N, 3)
    hi: jnp.ndarray          # (N, 3)
    skip: jnp.ndarray        # (N,)
    prim_first: jnp.ndarray  # (N,)
    prim_count: jnp.ndarray  # (N,)
    # triangle data pre-permuted into leaf order (gathers hit contiguous leaves)
    p0: jnp.ndarray          # (T, 3)
    e1: jnp.ndarray          # (T, 3)
    e2: jnp.ndarray          # (T, 3)
    prim_id: jnp.ndarray     # (T,) original triangle index

    @staticmethod
    def from_host(bvh: BVH, p0, e1, e2) -> "DeviceBVH":
        perm = bvh.prim_order
        return DeviceBVH(
            lo=jnp.asarray(bvh.lo),
            hi=jnp.asarray(bvh.hi),
            skip=jnp.asarray(bvh.skip),
            prim_first=jnp.asarray(bvh.prim_first),
            prim_count=jnp.asarray(bvh.prim_count),
            p0=jnp.asarray(p0[perm]),
            e1=jnp.asarray(e1[perm]),
            e2=jnp.asarray(e2[perm]),
            prim_id=jnp.asarray(perm, dtype=jnp.int32),
        )


def _safe_inv(d):
    tiny = jnp.abs(d) < 1e-12
    return 1.0 / jnp.where(tiny, jnp.where(d < 0, -1e-12, 1e-12), d)


class _TravState(NamedTuple):
    node: jnp.ndarray
    t: jnp.ndarray
    idx: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def bvh_closest_hit(bvh: DeviceBVH, o, d, t_min, t_max):
    """Closest hit of rays (R, 3) against the BVH.

    Returns (hit (R,), t (R,), tri_idx (R,) original ids, u, v).
    """
    R = o.shape[0]
    N = bvh.lo.shape[0]
    inv_d = _safe_inv(d)
    t_min = jnp.broadcast_to(t_min, (R,))
    t_max = jnp.broadcast_to(t_max, (R,))

    init = _TravState(
        node=jnp.zeros(R, jnp.int32),
        t=t_max,
        idx=jnp.full(R, -1, jnp.int32),
        u=jnp.zeros(R), v=jnp.zeros(R),
    )

    def cond(s):
        return jnp.any(s.node < N)

    def body(s):
        nidx = jnp.minimum(s.node, N - 1)
        lo = bvh.lo[nidx]
        hi = bvh.hi[nidx]
        skip = bvh.skip[nidx]
        first = bvh.prim_first[nidx]
        count = bvh.prim_count[nidx]
        active = s.node < N
        abox = ray_aabb(o, inv_d, lo, hi, t_min, s.t) & active
        is_leaf = first >= 0

        t_best, idx_b, u_b, v_b = s.t, s.idx, s.u, s.v
        do_leaf = abox & is_leaf
        for k in range(LEAF_SIZE):
            ti = jnp.clip(first + k, 0, bvh.p0.shape[0] - 1)
            valid = do_leaf & (k < count)
            hit, t, u, v = ray_triangle(
                o, d, bvh.p0[ti], bvh.e1[ti], bvh.e2[ti], t_min, t_best
            )
            hit = hit & valid
            t_best = jnp.where(hit, t, t_best)
            idx_b = jnp.where(hit, ti, idx_b)
            u_b = jnp.where(hit, u, u_b)
            v_b = jnp.where(hit, v, v_b)

        nxt = jnp.where(abox & ~is_leaf, nidx + 1, skip)
        nxt = jnp.where(active, nxt, N)
        return _TravState(node=nxt, t=t_best, idx=idx_b, u=u_b, v=v_b)

    s = jax.lax.while_loop(cond, body, init)
    hit = s.idx >= 0
    orig = jnp.where(hit, bvh.prim_id[jnp.maximum(s.idx, 0)], -1)
    return hit, jnp.where(hit, s.t, jnp.inf), orig, s.u, s.v


def bvh_any_hit(bvh: DeviceBVH, o, d, t_min, t_max):
    """Boolean occlusion query; lanes retire as soon as any hit is found
    (the reference's shadow-ray fast path, skdtree.cpp:207)."""
    R = o.shape[0]
    N = bvh.lo.shape[0]
    inv_d = _safe_inv(d)
    t_min = jnp.broadcast_to(t_min, (R,))
    t_max = jnp.broadcast_to(t_max, (R,))

    def cond(s):
        node, _ = s
        return jnp.any(node < N)

    def body(s):
        node, occluded = s
        nidx = jnp.minimum(node, N - 1)
        lo = bvh.lo[nidx]
        hi = bvh.hi[nidx]
        skip = bvh.skip[nidx]
        first = bvh.prim_first[nidx]
        count = bvh.prim_count[nidx]
        active = node < N
        abox = ray_aabb(o, inv_d, lo, hi, t_min, t_max) & active
        is_leaf = first >= 0

        occ = occluded
        do_leaf = abox & is_leaf
        for k in range(LEAF_SIZE):
            ti = jnp.clip(first + k, 0, bvh.p0.shape[0] - 1)
            valid = do_leaf & (k < count)
            hit, _, _, _ = ray_triangle(
                o, d, bvh.p0[ti], bvh.e1[ti], bvh.e2[ti], t_min, t_max
            )
            occ = occ | (hit & valid)

        nxt = jnp.where(abox & ~is_leaf, nidx + 1, skip)
        nxt = jnp.where(active & ~occ, nxt, N)
        return (nxt, occ)

    _, occluded = jax.lax.while_loop(
        cond, body, (jnp.zeros(R, jnp.int32), jnp.zeros(R, bool))
    )
    return occluded
