#!/usr/bin/env python
"""Round-5 probe H: HBM tier with page-reuse cache + node-pointer resorts
vs the r4 plain HBM kernel, on the 1.1M-tri bunny-grid scene."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

def timeit(fn, *args, n=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

def main():
    import bench
    from mitsuba_tpu.ops.pallas_bvh import (
        bvh_traverse_lane_hbm, bvh_traverse_lane_hbm_resort)
    # reuse bench's large-scene builder pieces
    res = {}
    import inspect
    src = inspect.getsource(bench.time_large_scene_hbm)
    # replicate the scene construction (bunny 8x tiling) by calling the
    # bench helper up to the traversal
    from mitsuba_tpu.accel.build import build_bvh, triangle_aabbs
    from mitsuba_tpu.ops.pallas_bvh import pack_pages
    from mitsuba_tpu.io.mesh import load_ply
    ply = "/root/reference/data/tests/bunny.ply"
    md = load_ply(ply)
    v0 = md.positions.astype(np.float32)
    f0 = md.faces.astype(np.int64)
    vs, fs = [], []
    off = 0
    for i in range(16):
        dx = (i % 4 - 1.5) * 0.18
        dz = (i // 4 - 1.5) * 0.2
        vs.append(v0 + np.asarray([dx, 0.0, dz], np.float32))
        fs.append(f0 + off)
        off += len(v0)
    v = np.concatenate(vs); f = np.concatenate(fs)
    p0 = v[f[:, 0]].astype(np.float32)
    e1 = (v[f[:, 1]] - v[f[:, 0]]).astype(np.float32)
    e2 = (v[f[:, 2]] - v[f[:, 0]]).astype(np.float32)
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    t0 = time.perf_counter()
    host = build_bvh(lo, hi, leaf_size=1)
    N = len(host.lo)
    pages = jnp.asarray(pack_pages(host, p0, e1, e2))
    print(f"tris {len(f)} nodes {N} pages {pages.nbytes/1e6:.0f} MB "
          f"build {time.perf_counter()-t0:.1f}s", flush=True)
    slo = jnp.asarray(lo.min(0)); shi = jnp.asarray(hi.max(0))
    center = np.asarray(0.5 * (lo.min(0) + hi.max(0)))
    radius = 0.5 * float(np.linalg.norm(hi.max(0) - lo.min(0)))
    R = 1 << 18
    rng = np.random.default_rng(0)
    a = rng.normal(size=(R, 3)); a /= np.linalg.norm(a, axis=1, keepdims=True)
    b2 = rng.normal(size=(R, 3)); b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
    o = jnp.asarray((center + radius * a).astype(np.float32))
    d_np = ((center + 0.4 * radius * b2) - np.asarray(o)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    d = jnp.asarray(d_np)

    @jax.jit
    def q0(o, d):
        return bvh_traverse_lane_hbm(pages, N, o, d, 1e-4, 1e9, slo, shi)
    dt = timeit(q0, o, d)
    print(f"hbm plain (r4 + page cache): {dt*1e3:8.2f} ms -> "
          f"{R/dt/1e6:5.2f} Mrays/s", flush=True)

    for rr, cn in ((3, 24), (6, 16)):
        @jax.jit
        def q1(o, d, rr=rr, cn=cn):
            return bvh_traverse_lane_hbm_resort(
                pages, N, o, d, 1e-4, jnp.full((R,), 1e9), slo, shi,
                rounds=rr, chunk_nit=cn)
        dt = timeit(q1, o, d)
        print(f"hbm resort {rr},{cn}: {dt*1e3:8.2f} ms -> "
              f"{R/dt/1e6:5.2f} Mrays/s", flush=True)

if __name__ == "__main__":
    main()
