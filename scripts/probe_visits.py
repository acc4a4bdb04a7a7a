#!/usr/bin/env python
"""Count node visits per ray: preorder skip-link traversal (what the lane
kernel executes) vs near-child-first ordered traversal with early
termination (what a stack/octant-ordered layout would execute) — on the
real bunny-bench BVH with realistic bounce rays. Decides whether
traversal ORDER (not lane occupancy) is the dominant waste."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import bench
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs

    scene, static = bench.build_bunny_scene()
    p0 = np.asarray(scene.tri_p0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    bvh = build_bvh(lo, hi, leaf_size=1)
    N = len(bvh.lo)
    print(f"nodes {N}", flush=True)

    # children: preorder => left = i+1; right = skip of left; internal if
    # prim_first < 0
    is_leaf = bvh.prim_first >= 0
    left = np.arange(N) + 1
    right = np.where(~is_leaf, bvh.skip[np.minimum(left, N - 1)], -1)

    rng = np.random.default_rng(0)
    R = 4000
    # bounce-like rays: origins on the floor/bunny surface region, cosine
    # directions — approximate with origins at random tri points
    ti = rng.integers(0, len(p0), R)
    u = rng.random((R, 1))
    v = rng.random((R, 1)) * (1 - u)
    o = p0[ti] + u * e1[ti] + v * e2[ti]
    n = np.cross(e1[ti], e2[ti])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    d = rng.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = np.sum(d * n, axis=1) < 0
    d[flip] -= 2 * np.sum(d[flip] * n[flip], axis=1, keepdims=True) * n[flip]
    o = o + 1e-4 * n

    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)

    def slab(i, oo, ii, tmin, tmax):
        t0 = (bvh.lo[i] - oo) * ii
        t1 = (bvh.hi[i] - oo) * ii
        tn = np.maximum(np.minimum(t0, t1).max(), tmin)
        tf = np.minimum(np.maximum(t0, t1).min(), tmax)
        return tn, tf

    def tri_hit(i, oo, dd, tmin, tmax):
        t = bvh.prim_order[bvh.prim_first[i]]
        pv = np.cross(dd, e2[t])
        det = e1[t] @ pv
        if abs(det) < 1e-12:
            return np.inf
        invd = 1.0 / det
        tv = oo - p0[t]
        uu = (tv @ pv) * invd
        qv = np.cross(tv, e1[t])
        vv = (dd @ qv) * invd
        tt = (e2[t] @ qv) * invd
        if uu >= 0 and vv >= 0 and uu + vv <= 1 and tmin < tt < tmax:
            return tt
        return np.inf

    pre_v, ord_v = [], []
    for r in range(1000):
        oo, dd, ii = o[r], d[r], inv[r]
        # --- preorder skip-link walk (the kernel's semantics)
        node = 0
        bt = np.inf
        visits = 0
        while node < N:
            visits += 1
            tn, tf = slab(node, oo, ii, 1e-4, bt)
            if tn <= tf:
                if is_leaf[node]:
                    bt = min(bt, tri_hit(node, oo, dd, 1e-4, bt))
                    node = bvh.skip[node]
                else:
                    node = node + 1
            else:
                node = bvh.skip[node]
        pre_v.append(visits)

        # --- ordered stack walk with near-child-first + early term
        stack = [0]
        bt = np.inf
        visits = 0
        while stack:
            nd = stack.pop()
            visits += 1
            tn, tf = slab(nd, oo, ii, 1e-4, bt)
            if tn > tf:
                continue
            if is_leaf[nd]:
                bt = min(bt, tri_hit(nd, oo, dd, 1e-4, bt))
            else:
                a, b = left[nd], right[nd]
                ta, _ = slab(a, oo, ii, 1e-4, bt)
                tb, _ = slab(b, oo, ii, 1e-4, bt)
                if ta > tb:
                    a, b = b, a
                stack.append(b)
                stack.append(a)
        ord_v.append(visits)

    pre_v = np.asarray(pre_v)
    ord_v = np.asarray(ord_v)
    for name, vv in (("preorder", pre_v), ("ordered ", ord_v)):
        print(f"{name}: mean {vv.mean():7.1f}  p50 {np.percentile(vv,50):7.0f} "
              f"p90 {np.percentile(vv,90):7.0f} p99 {np.percentile(vv,99):7.0f} "
              f"max {vv.max():7d}", flush=True)
    print(f"ordering win factor (mean): {pre_v.mean()/ord_v.mean():.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
