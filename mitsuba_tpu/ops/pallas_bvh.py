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

ROUND-5 PERF LEDGER (bunny bench, 262k bounce rays, v5e): the lane-resort
kernel sits on a ~42-46 ms plateau that none of the following moved more
than ~8%: resort schedules (2,16 / 4,12 / 6,8 / 12,6), strip lengths
(3/5/10/20), wide pages (256/512 via *_w kernels below), or
treelet-aligned page packing (pack_pages_treelet — 2x WORSE, padding +
forwarder overhead). probe_visits.py shows mean path length is only ~69
nodes and an ordered (near-first) traversal would save just 1.11x, so
the plateau is per-outer-iteration machinery (the vector->scalar page-id
roundtrip + 88 dynamic-sublane row loads) times the iteration count —
page-size-invariant because big skip jumps cross any feasible page.
Breaking it needs a different gather primitive (cross-vreg dynamic
gather) or per-lane-stack traversal, neither expressible in Mosaic
today. The shipped defaults are the measured best: closest 4,24,strip=5,
shadow any_hit 1,16 (render/scene.py BVH_RESORT*).
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


def _safe_inv_v(x):
    tiny = jnp.abs(x) < 1e-12
    return 1.0 / jnp.where(tiny, jnp.where(x < 0, -1e-12, 1e-12), x)


STRIP = 8        # rows processed per sweep iteration


def _sweep(rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, inx, iny, inz, tmin,
           node0, endv, bt, bi, bu, bv, any_hit=False, strip=STRIP):
    """One bounded sweep: lanes start at node0 and retire when their
    pointer leaves [*, endv). Returns updated (bt, bi, bu, bv).

    Strip-mined: each while iteration processes ``strip`` consecutive rows
    with branchless (masked) leaf tests, amortizing the loop branch and the
    scalar row-load addressing over ``strip`` rows.

    Measured (v5e, bunny.ply): the sweep is VPU-compute-bound per row (the
    ~200 vector ops of box + inlined-triangle tests dominate; amortizing
    the cross-lane min via bigger strips or stale-min pipelining trades
    extra rows for overhead at a net loss), so the min is taken once per
    strip at the body end and consumed across the loop edge."""
    N = rows_ref.shape[0]

    state0 = (
        jnp.min(node0),                             # scalar: current min node
        node0, bt, bi, bu, bv,
        jnp.zeros((), jnp.int32),                   # strip-iteration counter
    )

    def cond(st):
        return st[0] < N

    def body(st):
        base, node, bt, bi, bu, bv, nit = st

        for j in range(strip):
            cur = base + j
            curc = jnp.minimum(cur, N - 1)   # clamped for safe reads only
            here = node == cur

            def f(c):
                return rows_ref[curc, c]

            def i32(c):
                return rows_ref[curc, c].astype(jnp.int32)

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

            for k in range(LEAF_SIZE):
                tbase = _C_TRI + 10 * k
                valid = hit_box & (k < cnt)  # cnt==0 on internal nodes
                p0x, p0y, p0z = f(tbase), f(tbase + 1), f(tbase + 2)
                e1x, e1y, e1z = f(tbase + 3), f(tbase + 4), f(tbase + 5)
                e2x, e2y, e2z = f(tbase + 6), f(tbase + 7), f(tbase + 8)
                tid = i32(tbase + 9)
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

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, cur + 1, skip)
            node = jnp.where(here, nxt, node)
            # lanes leaving their [start, end) treelet range retire
            node = jnp.where(node >= endv, N, node)
            if any_hit:
                # occlusion query: a lane retires on its first hit
                # (skdtree.cpp:207 boolean shadow-ray fast path)
                node = jnp.where(bi >= 0, N, node)

        return jnp.min(node), node, bt, bi, bu, bv, nit + 1

    _, _, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit


def _traverse(rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, tmin, tmaxv,
              startv=None, endv=None, any_hit=False, strip=STRIP):
    """Swept traversal body. ``startv``/``endv`` bound each lane to the
    preorder node range [start, end) — a subtree in DFS layout is exactly
    such a range, so treelet-restricted traversal reuses the same sweep
    (lanes whose pointer leaves their range retire)."""
    N = rows_ref.shape[0]
    inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)

    if startv is None:
        startv = jnp.zeros((BS, LANES), jnp.int32)
    if endv is None:
        endv = jnp.full((BS, LANES), N, jnp.int32)
    node0 = jnp.where(startv < endv, startv, N)

    return _sweep(
        rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, inx, iny, inz, tmin,
        node0, endv,
        tmaxv,
        jnp.full((BS, LANES), -1, jnp.int32),
        jnp.zeros((BS, LANES), jnp.float32),
        jnp.zeros((BS, LANES), jnp.float32),
        any_hit=any_hit, strip=strip,
    )[:4]


@partial(jax.jit, static_argnames=("interpret", "any_hit", "strip"))
def bvh_traverse_packed(rows, o, d, t_min, t_max, start=None, end=None,
                        interpret=False, any_hit=False, strip=STRIP):
    """Swept traversal of rays (R, 3) against packed node rows (N, ROW).

    Returns (hit, t, tri_idx (original ids), u, v). With ``any_hit`` lanes
    retire on the first hit (boolean occlusion semantics; t/idx/u/v then
    report an arbitrary hit, not the closest). Optional per-ray ``start``/
    ``end`` (int32) restrict each lane to the preorder node range
    [start, end) — the treelet fast path; pass start=end to disable a lane.
    """
    R = o.shape[0]
    N = rows.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK
    bounded = start is not None

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    rays = [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),
    ]
    if bounded:
        rays += [plane(start, N, jnp.int32), plane(end, 0, jnp.int32)]
    n_in = len(rays)

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(rows.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(rows_r, *rest):
        ins = [r[0] for r in rest[:n_in]]
        outs = rest[n_in:]
        if bounded:
            bt, bi, bu, bv = _traverse(
                rows_r, *ins[:8], startv=ins[8], endv=ins[9],
                any_hit=any_hit, strip=strip,
            )
        else:
            bt, bi, bu, bv = _traverse(rows_r, *ins, any_hit=any_hit,
                                       strip=strip)
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * n_in,
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
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    r = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
        num_keys=1,
    )
    res = bvh_traverse_packed(
        rows, jnp.stack(r[1:4], -1), jnp.stack(r[4:7], -1), r[7], r[8],
        any_hit=any_hit,
    )
    rr = jax.lax.sort((r[9],) + tuple(res[1:]), num_keys=1)
    hitm = rr[2] >= 0
    return (hitm, rr[1], rr[2], rr[3], rr[4])


# --- two-level treelet traversal --------------------------------------------
#
# The swept kernel's cost per ray block is the UNION of its lanes' node
# paths: incoherent (bounce) blocks degenerate to a full-tree sweep — the
# measured cliff is ~4 decades (bunny.ply: 3391 Mrays/s coherent primaries
# vs 0.37 Mrays/s random rays). The fix is to manufacture coherence: cut
# the preorder node stream into K treelets (contiguous subtree ranges of
# <= ~1k rows, accel/build.treelet_roots), test every ray against the K
# root AABBs densely (pure VPU work — compute is cheap, serial sweeps are
# not), and process one treelet per ray per round, nearest-entry first,
# with lanes grouped by treelet id. Each round's sweep is then bounded by
# the treelet size instead of the whole tree, and closest-hit pruning
# (entry > current best t) usually retires rays after 1-2 rounds.
# This replaces the reference's per-ray recursive kd-tree descent
# (skdtree.cpp:112) the TPU way: sorting + dense box tests + bounded sweeps.

def _safe_inv3(d):
    tiny = jnp.abs(d) < 1e-12
    return 1.0 / jnp.where(tiny, jnp.where(d < 0, -1e-12, 1e-12), d)


def _nearest_treelet(o, inv_d, t_min, t_max, tl_lo, tl_hi):
    """First-round treelet per ray (XLA side, used only for the coherence
    sort key): index of the nearest treelet root box the ray enters."""
    R = o.shape[0]
    K = tl_lo.shape[0]

    def step(carry, k):
        be, bk = carry
        lo = jax.lax.dynamic_slice_in_dim(tl_lo, k, 1, axis=0)[0]
        hi = jax.lax.dynamic_slice_in_dim(tl_hi, k, 1, axis=0)[0]
        t0 = (lo[None, :] - o) * inv_d
        t1 = (hi[None, :] - o) * inv_d
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), t_min)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=1), t_max)
        e = jnp.where(tn <= tf, tn, jnp.inf)
        ok = e < be
        return (jnp.where(ok, e, be), jnp.where(ok, k, bk)), None

    init = (jnp.full((R,), jnp.inf), jnp.zeros((R,), jnp.int32))
    (be, bk), _ = jax.lax.scan(step, init, jnp.arange(K, dtype=jnp.int32))
    return bk


def _treelet_rounds(tab_ref, rows_ref, oxv, oyv, ozv, dxv, dyv, dzv,
                    tmin, tmaxv, K, any_hit=False, strip=STRIP,
                    slim=False, scr_ref=None):
    """Persistent per-block round loop: every round each lane picks its
    nearest PENDING treelet whose entry beats its best hit (dense unrolled
    K-way root-box test — scalar treelet constants against vector lanes, no
    gathers), then a bounded sweep runs that treelet's row range. The block
    retires when no lane can improve. One kernel launch total; blocks
    finish independently."""
    N = rows_ref.shape[0] * (SLIM_SLOTS if slim else 1)
    if slim and scr_ref is not None:
        def sweep_fn(rows_r, *a, **k):
            return _sweep_slim8(rows_r, scr_ref, *a, **k)
    elif slim:
        sweep_fn = _sweep_slim
    else:
        sweep_fn = _sweep
    W32 = -(-K // 32)
    INF = jnp.float32(np.inf)
    inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)

    pend0 = []
    for w in range(W32):
        bits = 0xFFFFFFFF if (w + 1) * 32 <= K else (1 << (K - w * 32)) - 1
        pend0.append(jnp.full((BS, LANES), np.uint32(bits), jnp.uint32))

    st0 = (
        jnp.asarray(True),
        tuple(pend0),
        tmaxv,
        jnp.full((BS, LANES), -1, jnp.int32),
        jnp.zeros((BS, LANES), jnp.float32),
        jnp.zeros((BS, LANES), jnp.float32),
        jnp.zeros((), jnp.int32),   # rounds
        jnp.zeros((), jnp.int32),   # total strip iterations
    )

    def cond(st):
        return st[0]

    def body(st):
        _, pend, bt, bi, bu, bv, nrounds, nstrips = st

        best_e = jnp.full((BS, LANES), INF, jnp.float32)
        selv = jnp.full((BS, LANES), -1, jnp.int32)
        startv = jnp.full((BS, LANES), N, jnp.int32)
        endv = jnp.zeros((BS, LANES), jnp.int32)
        for k in range(K):
            lo0 = tab_ref[k, 0]
            lo1 = tab_ref[k, 1]
            lo2 = tab_ref[k, 2]
            hi0 = tab_ref[k, 3]
            hi1 = tab_ref[k, 4]
            hi2 = tab_ref[k, 5]
            rt = tab_ref[k, 6].astype(jnp.int32)
            sk = tab_ref[k, 7].astype(jnp.int32)
            live = (pend[k // 32] >> jnp.uint32(k % 32)) & jnp.uint32(1)
            t0x = (lo0 - oxv) * inx
            t1x = (hi0 - oxv) * inx
            t0y = (lo1 - oyv) * iny
            t1y = (hi1 - oyv) * iny
            t0z = (lo2 - ozv) * inz
            t1z = (hi2 - ozv) * inz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            e = jnp.where((live == 1) & (tn <= tf), tn, INF)
            upd = e < best_e
            best_e = jnp.where(upd, e, best_e)
            selv = jnp.where(upd, k, selv)
            startv = jnp.where(upd, rt, startv)
            endv = jnp.where(upd, sk, endv)

        active = best_e < INF
        # clear the selected bit
        new_pend = []
        for w in range(W32):
            bit = jnp.where(
                active & (selv >> 5 == w),
                jnp.uint32(1) << (selv & 31).astype(jnp.uint32),
                jnp.uint32(0),
            )
            new_pend.append(pend[w] & ~bit)

        node0 = jnp.where(active, startv, N)
        endv = jnp.where(active, endv, 0)
        bt, bi, bu, bv, nit = sweep_fn(
            rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, inx, iny, inz, tmin,
            node0, endv, bt, bi, bu, bv, any_hit=any_hit, strip=strip,
        )
        if any_hit:
            # occluded lanes retire outright
            occ = bi >= 0
            new_pend = [jnp.where(occ, jnp.uint32(0), p) for p in new_pend]
        return (jnp.any(active), tuple(new_pend), bt, bi, bu, bv,
                nrounds + 1, nstrips + nit)

    _, _, bt, bi, bu, bv, nrounds, nstrips = jax.lax.while_loop(cond, body, st0)
    return bt, bi, bu, bv, nrounds, nstrips


@partial(jax.jit, static_argnames=("sort", "any_hit", "interpret",
                                   "debug_counts", "strip", "slim", "sub8"))
def bvh_traverse_treelets(rows, tl_root, tl_skip, tl_lo, tl_hi,
                          o, d, t_min, t_max, scene_lo, scene_hi,
                          sort=True, any_hit=False, interpret=False,
                          debug_counts=False, strip=STRIP, slim=False,
                          sub8=True):
    """Two-level traversal: the preorder node stream is cut into K treelets
    (contiguous subtree row ranges, accel/build.treelet_roots); rays are
    sorted once by (nearest treelet, octant, origin morton) and the kernel
    loops rounds of dense treelet selection + bounded sweeps per block.

    This replaces the reference's per-ray recursive kd-tree descent
    (skdtree.cpp:112) the TPU way — the swept kernel alone collapses ~4
    decades on incoherent rays (union of lane paths -> whole tree); the
    treelet cut bounds each round's union by the treelet size."""
    R = o.shape[0]
    K = int(tl_root.shape[0])
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    if sort:
        # one dense pass orders rays by (first treelet, octant, morton):
        # blocks then share treelet ranges and direction signs, keeping each
        # round's union near one path. The permutation is applied with ONE
        # multi-payload lax.sort (and undone below with another): XLA
        # argsort + per-array gathers each cost tens of ms at 262k rays on
        # v5e, so moving the payloads inside the sort network is the only
        # affordable way to reorder.
        inv_d = _safe_inv3(d)
        sel0 = _nearest_treelet(o, inv_d, t_min, t_max, tl_lo, tl_hi)
        key = ray_sort_keys(o, d, scene_lo, scene_hi)
        key = (sel0.astype(jnp.uint32) << jnp.uint32(24)) | (key >> jnp.uint32(8))
        # occupancy compaction: dead lanes (inactive rays carry
        # t_max <= t_min) pool into the tail blocks, which then retire in
        # zero sweep iterations instead of diluting live blocks' sharing
        key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
        r = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
            num_keys=1,
        )
        o = jnp.stack(r[1:4], axis=-1)
        d = jnp.stack(r[4:7], axis=-1)
        t_min, t_max, orig = r[7], r[8], r[9]

    N = rows.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    rays = [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),
    ]
    # treelet table (K, 8): lo, hi, root, skip (ints exact below 2^24)
    tab = jnp.concatenate(
        [tl_lo, tl_hi,
         tl_root[:, None].astype(jnp.float32),
         tl_skip[:, None].astype(jnp.float32)], axis=1,
    )

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec(rows.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    use_sub8 = slim and sub8

    def kern(tab_r, rows_r, *rest):
        ins = [r[0] for r in rest[:8]]
        scr = rest[-1] if use_sub8 else None
        outs = rest[8:-1] if use_sub8 else rest[8:]
        bt, bi, bu, bv, nrounds, nstrips = _treelet_rounds(
            tab_r, rows_r, *ins, K=K, any_hit=any_hit, strip=strip,
            slim=slim, scr_ref=scr)
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv
        if debug_counts:
            # packed per-block work stats: strips * 256 + rounds
            outs[4][0] = jnp.full((BS, LANES), nstrips * 256 + nrounds,
                                  jnp.int32)

    n_out = 5 if debug_counts else 4
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec, rows_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
        ] + [jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32)] * (
            1 if debug_counts else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        scratch_shapes=(
            [pltpu.VMEM((BS, 1), jnp.int32)] if use_sub8 else []),
        interpret=interpret,
    )(tab, rows, *rays)

    t, idx, u, v = (x.reshape(Rp)[:R] for x in out[:4])
    if sort:
        # undo the permutation with one multi-payload sort keyed on the
        # carried original indices
        r = jax.lax.sort((orig, t, idx, u, v), num_keys=1)
        t, idx, u, v = r[1], r[2], r[3], r[4]
    hitm = idx >= 0
    res = (hitm, jnp.where(hitm, t, jnp.inf), idx, u, v)
    if debug_counts:
        return res + (out[4][:, 0, 0],)
    return res


# --- slim layout: leaf_size-1 tree, 4 node slots per 128-lane row -----------
#
# The fat-row sweep is VPU-compute-bound: every visited row executes a box
# test PLUS 4 inlined Moller-Trumbore tests (~220 vector ops) even on
# internal nodes. The slim layout builds the BVH with leaf_size=1 and
# overlays one node per 32-lane slot (4 per physical row):
#   slot[0:6]  internal: bbox lo/hi   |  leaf: tri p0, e1[0:3]
#   slot[0:9]  leaf: p0, e1, e2
#   slot[9]    skip link   slot[10]   tri id (>= 0) or -1 for internal
# Each visited node then costs ONE box test + ONE triangle test (~90 ops,
# ~2.4x less vector work per row); the deeper tree adds ~40% more rows for
# a measured net win on incoherent rays. VMEM: 128 B/node (vs 512).

SLIM_SLOTS = 4
_S_SKIP = 9
_S_TID = 10


def pack_nodes_slim(bvh, p0, e1, e2) -> np.ndarray:
    """(ceil(N/4), 128) float32 slot-packed rows from a leaf_size=1 BVH."""
    N = len(bvh.lo)
    counts = np.where(bvh.prim_first >= 0, bvh.prim_count, 0)
    assert counts.max() <= 1, "slim layout requires a leaf_size=1 BVH"
    assert N < (1 << 24) and len(p0) < (1 << 24)
    rows = np.zeros((-(-N // SLIM_SLOTS), 128), np.float32)
    flat = rows.reshape(-1)
    # slot base byte offsets of node n: 128*(n>>2) + 32*(n&3)
    nidx = np.arange(N)
    base = 128 * (nidx >> 2) + 32 * (nidx & 3)
    inner = counts == 0
    for c in range(3):
        flat[base[inner] + c] = bvh.lo[inner, c]
        flat[base[inner] + 3 + c] = bvh.hi[inner, c]
    leaf = ~inner
    tri = np.zeros(N, np.int64)
    tri[leaf] = bvh.prim_order[bvh.prim_first[leaf]]
    for c in range(3):
        flat[base[leaf] + c] = p0[tri[leaf], c]
        flat[base[leaf] + 3 + c] = e1[tri[leaf], c]
        flat[base[leaf] + 6 + c] = e2[tri[leaf], c]
    flat[base + _S_SKIP] = bvh.skip.astype(np.float32)
    flat[base + _S_TID] = np.where(leaf, tri, -1).astype(np.float32)
    return rows


def _sweep_slim(rows_ref, oxv, oyv, ozv, dxv, dyv, dzv, inx, iny, inz, tmin,
                node0, endv, bt, bi, bu, bv, any_hit=False, strip=STRIP):
    """Strip-mined sweep over slot-packed slim rows. Node pointers are in
    NODE units; the jump base stays 4-aligned so slot offsets are static."""
    N4 = rows_ref.shape[0]
    N = N4 * SLIM_SLOTS

    m0 = jnp.min(node0) & ~3
    state0 = (m0, node0, bt, bi, bu, bv, jnp.zeros((), jnp.int32))

    def cond(st):
        return st[0] < N

    def body(st):
        base, node, bt, bi, bu, bv, nit = st
        row0 = base >> 2

        for j in range(strip):
            cur = base + j
            rowc = jnp.minimum(row0 + (j >> 2), N4 - 1)
            c0 = 32 * (j & 3)
            here = node == cur

            def f(c):
                return rows_ref[rowc, c0 + c]

            skip = rows_ref[rowc, c0 + _S_SKIP].astype(jnp.int32)
            tid = rows_ref[rowc, c0 + _S_TID].astype(jnp.int32)
            is_leaf = tid >= 0

            g0, g1, g2 = f(0), f(1), f(2)
            g3, g4, g5 = f(3), f(4), f(5)
            g6, g7, g8 = f(6), f(7), f(8)

            # internal interpretation: slab test on lo=(g0..g2), hi=(g3..g5)
            t0x = (g0 - oxv) * inx
            t1x = (g3 - oxv) * inx
            t0y = (g1 - oyv) * iny
            t1y = (g4 - oyv) * iny
            t0z = (g2 - ozv) * inz
            t1z = (g5 - ozv) * inz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit_box = here & (tnear <= tfar)

            # leaf interpretation: Moller-Trumbore on p0=(g0..2), e1=(g3..5),
            # e2=(g6..8)
            pvx = dyv * g8 - dzv * g7
            pvy = dzv * g6 - dxv * g8
            pvz = dxv * g7 - dyv * g6
            det = g3 * pvx + g4 * pvy + g5 * pvz
            ok = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = oxv - g0, oyv - g1, ozv - g2
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qx = tvy * g5 - tvz * g4
            qy = tvz * g3 - tvx * g5
            qz = tvx * g4 - tvy * g3
            vv = (dxv * qx + dyv * qy + dzv * qz) * invd
            tt = (g6 * qx + g7 * qy + g8 * qz) * invd
            h = (here & is_leaf & ok & (uu >= 0) & (vv >= 0)
                 & (uu + vv <= 1) & (tt > tmin) & (tt < bt))
            bt = jnp.where(h, tt, bt)
            bi = jnp.where(h, tid, bi)
            bu = jnp.where(h, uu, bu)
            bv = jnp.where(h, vv, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, cur + 1, skip)
            node = jnp.where(here, nxt, node)
            node = jnp.where(node >= endv, N, node)
            if any_hit:
                node = jnp.where(bi >= 0, N, node)

        return (jnp.min(node) & ~3, node, bt, bi, bu, bv, nit + 1)

    _, _, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit


# --- slim8: per-sublane node pointers (8 independent subsweeps per block) ---
#
# The single-pointer sweeps above advance ONE node per step for the whole
# (8, 128) block: every lane not parked on that node idles, and the visited
# row count is the union of all 1024 lanes' paths. slim8 gives each of the
# 8 sublanes its own pointer: one step processes 8 different nodes (one per
# 128-lane sublane group) for roughly the same vector-op budget, and each
# subsweep's union covers only its 128 rays. Trick that makes the data
# assembly cheap: each sublane's strip base is aligned down to SLIM_SLOTS,
# so within a strip the slot offset (node & 3) equals (t & 3) — a STATIC
# lane index. Assembling the per-sublane node vreg is then 8 dynamic-sublane
# row loads every 4 steps plus 11 static lane extracts per step; no dynamic
# lane gathers (which Mosaic cannot do across vregs).

def _sweep_slim8(rows_ref, scr_ref, oxv, oyv, ozv, dxv, dyv, dzv,
                 inx, iny, inz, tmin, node0, endv, bt, bi, bu, bv,
                 any_hit=False, strip=STRIP):
    """Per-sublane strip-mined sweep over slot-packed slim rows.
    ``scr_ref``: (BS, 1) int32 VMEM scratch for the vector->scalar
    round-trip of the per-sublane base pointers."""
    N4 = rows_ref.shape[0]
    N = N4 * SLIM_SLOTS

    base0 = jnp.min(node0, axis=1, keepdims=True) & ~3        # (BS, 1)
    state0 = (jnp.min(node0) & ~3, base0, node0, bt, bi, bu, bv,
              jnp.zeros((), jnp.int32))

    def cond(st):
        return st[0] < N

    def body(st):
        _, base8, node, bt, bi, bu, bv, nit = st
        scr_ref[:, :] = base8

        rowv = None
        for t in range(strip):
            if t % SLIM_SLOTS == 0:
                rs = []
                for j in range(BS):
                    rj = jnp.minimum((scr_ref[j, 0] + t) >> 2, N4 - 1)
                    rs.append(rows_ref[rj, :])
                rowv = jnp.stack(rs, axis=0)                  # (BS, 128)
            c0 = 32 * (t % SLIM_SLOTS)

            def f(c):
                # static lane extract -> (BS, 1), broadcasts against rays
                return jax.lax.slice(rowv, (0, c0 + c), (BS, c0 + c + 1))

            cur = base8 + t                                   # (BS, 1)
            here = node == cur

            skip = f(_S_SKIP).astype(jnp.int32)
            tid = f(_S_TID).astype(jnp.int32)
            is_leaf = tid >= 0

            g0, g1, g2 = f(0), f(1), f(2)
            g3, g4, g5 = f(3), f(4), f(5)
            g6, g7, g8 = f(6), f(7), f(8)

            t0x = (g0 - oxv) * inx
            t1x = (g3 - oxv) * inx
            t0y = (g1 - oyv) * iny
            t1y = (g4 - oyv) * iny
            t0z = (g2 - ozv) * inz
            t1z = (g5 - ozv) * inz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit_box = here & (tnear <= tfar)

            pvx = dyv * g8 - dzv * g7
            pvy = dzv * g6 - dxv * g8
            pvz = dxv * g7 - dyv * g6
            det = g3 * pvx + g4 * pvy + g5 * pvz
            ok = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = oxv - g0, oyv - g1, ozv - g2
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qx = tvy * g5 - tvz * g4
            qy = tvz * g3 - tvx * g5
            qz = tvx * g4 - tvy * g3
            vv = (dxv * qx + dyv * qy + dzv * qz) * invd
            tt = (g6 * qx + g7 * qy + g8 * qz) * invd
            h = (here & is_leaf & ok & (uu >= 0) & (vv >= 0)
                 & (uu + vv <= 1) & (tt > tmin) & (tt < bt))
            bt = jnp.where(h, tt, bt)
            bi = jnp.where(h, tid, bi)
            bu = jnp.where(h, uu, bu)
            bv = jnp.where(h, vv, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, cur + 1, skip)
            node = jnp.where(here, nxt, node)
            node = jnp.where(node >= endv, N, node)
            if any_hit:
                node = jnp.where(bi >= 0, N, node)

        base8 = jnp.min(node, axis=1, keepdims=True) & ~3
        return (jnp.min(node) & ~3, base8, node, bt, bi, bu, bv, nit + 1)

    _, _, _, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit


# --- lane traversal: per-lane node pointers via in-vreg dynamic gathers -----
#
# Mosaic lowers jnp.take_along_axis(tab, idx, axis=1) on an (8, 128) vreg to
# a per-sublane dynamic_gather: out[s, l] = tab[s, idx[s, l]], measured ~1
# cycle/vreg (scripts/probe_gather2.py: 11 gathers + adds = 22 ns/iter).
# That primitive turns the union sweep on its head: cut the preorder node
# stream into PAGES of 128 slim nodes, keep each node component as one
# 128-lane row, and give EVERY LANE its own node pointer. Each sublane
# holds the tables of ONE page (its lanes' minimum pending page) in 11
# vregs; a step gathers each lane's node data by its local index and
# advances all in-page lanes at once — up to 1024 node visits per ~120
# cycles, vs 8 for the slim8 union sweep. Monotone skip-link pointers make
# the per-sublane page sequence monotone too, so pages load forward only.
# This is the TPU replacement for the reference's per-ray recursive kd-tree
# descent (skdtree.cpp:112): the "stack" is the threaded layout, the
# "cache" is the per-sublane page register file.

PAGE = 128          # nodes per page
PCOMP = 11          # rows per page (one row per node component; dynamic
                    # sublane indexing needs no tile padding, and the 31%
                    # table shrink vs the padded-16 layout raises the
                    # VMEM-resident ceiling to ~2.3M nodes)
LSTRIP = 10         # traversal steps per page reload


def pack_pages(bvh, p0, e1, e2) -> np.ndarray:
    """(n_pages*PCOMP, 128) float32 page-planar rows from a leaf_size=1 BVH.

    Row p*PCOMP+c holds component c of page p's 128 nodes:
      c 0..2  internal: bbox lo      | leaf: tri p0
      c 3..5  internal: bbox hi      | leaf: e1
      c 6..8  leaf: e2 (zero on internal nodes)
      c 9     skip link (global node id, exact float32 below 2^24)
      c 10    tri id (>= 0) or -1 for internal
    """
    N = len(bvh.lo)
    counts = np.where(bvh.prim_first >= 0, bvh.prim_count, 0)
    assert counts.max() <= 1, "lane layout requires a leaf_size=1 BVH"
    assert N < (1 << 24) and len(p0) < (1 << 24)
    n_pages = -(-N // PAGE)
    comp = np.zeros((PCOMP, n_pages * PAGE), np.float32)
    # padding slots past N must be inert: skip straight to the retire
    # sentinel and read as internal (tid -1), else a retired lane whose
    # pointer aliases into the last page's padding gets resurrected
    comp[9, :] = float(N)
    comp[10, :] = -1.0
    inner = counts == 0
    leaf = ~inner
    tri = np.zeros(N, np.int64)
    tri[leaf] = bvh.prim_order[bvh.prim_first[leaf]]
    idx = np.arange(N)
    for c in range(3):
        comp[c, idx[inner]] = bvh.lo[inner, c]
        comp[3 + c, idx[inner]] = bvh.hi[inner, c]
        comp[c, idx[leaf]] = p0[tri[leaf], c]
        comp[3 + c, idx[leaf]] = e1[tri[leaf], c]
        comp[6 + c, idx[leaf]] = e2[tri[leaf], c]
    comp[9, idx] = bvh.skip.astype(np.float32)
    comp[10, idx] = np.where(leaf, tri, -1).astype(np.float32)
    # interleave to page-planar rows: page p rows [p*PCOMP, (p+1)*PCOMP)
    out = np.zeros((n_pages * PCOMP, PAGE), np.float32)
    for p in range(n_pages):
        out[p * PCOMP:p * PCOMP + 11] = comp[:11, p * PAGE:(p + 1) * PAGE]
    return out


def _sweep_lane(pages_ref, scr_ref, n_nodes, oxv, oyv, ozv, dxv, dyv, dzv,
                inx, iny, inz, tmin, node0, bt, bi, bu, bv,
                any_hit=False, strip=LSTRIP, max_nit=0):
    """Per-lane paged traversal. ``pages_ref``: (n_pages*PCOMP, 128) table;
    ``scr_ref``: (BS, 1) int32 VMEM scratch for the vector->scalar
    round-trip of the per-sublane page ids. ``n_nodes``: real node count
    (pointers retire at >= n_nodes). ``max_nit`` > 0 bounds the strip
    iterations (chunked traversal: the caller re-sorts lanes by node
    pointer between chunks and resumes)."""
    NP = pages_ref.shape[0] // PCOMP
    Nn = n_nodes
    BIG = jnp.int32(NP + 1)

    state0 = (jnp.min(node0), node0, bt, bi, bu, bv,
              jnp.zeros((), jnp.int32))

    def cond(st):
        if max_nit:
            return (st[0] < Nn) & (st[6] < max_nit)
        return st[0] < Nn

    def body(st):
        _, node, bt, bi, bu, bv, nit = st
        pg = jnp.where(node < Nn, node >> 7, BIG)
        p8 = jnp.min(pg, axis=1, keepdims=True)          # (BS, 1)
        scr_ref[:, :] = p8
        base8 = p8 * PAGE

        tabs = []
        rows = []
        for j in range(BS):
            pj = jnp.minimum(scr_ref[j, 0], NP - 1) * PCOMP
            rows.append([pages_ref[pj + c, :] for c in range(11)])
        for c in range(11):
            tabs.append(jnp.stack([rows[j][c] for j in range(BS)], axis=0))

        for _t in range(strip):
            local = node - base8
            # node < Nn guards retired lanes whose sentinel Nn aliases into
            # the last page (Nn is rarely a multiple of PAGE)
            act = (local >= 0) & (local < PAGE) & (node < Nn)
            li = jnp.clip(local, 0, PAGE - 1)
            g0 = jnp.take_along_axis(tabs[0], li, axis=1)
            g1 = jnp.take_along_axis(tabs[1], li, axis=1)
            g2 = jnp.take_along_axis(tabs[2], li, axis=1)
            g3 = jnp.take_along_axis(tabs[3], li, axis=1)
            g4 = jnp.take_along_axis(tabs[4], li, axis=1)
            g5 = jnp.take_along_axis(tabs[5], li, axis=1)
            g6 = jnp.take_along_axis(tabs[6], li, axis=1)
            g7 = jnp.take_along_axis(tabs[7], li, axis=1)
            g8 = jnp.take_along_axis(tabs[8], li, axis=1)
            skip = jnp.take_along_axis(tabs[9], li, axis=1).astype(jnp.int32)
            tid = jnp.take_along_axis(tabs[10], li, axis=1).astype(jnp.int32)
            is_leaf = tid >= 0

            # internal interpretation: slab test on lo=(g0..2), hi=(g3..5)
            t0x = (g0 - oxv) * inx
            t1x = (g3 - oxv) * inx
            t0y = (g1 - oyv) * iny
            t1y = (g4 - oyv) * iny
            t0z = (g2 - ozv) * inz
            t1z = (g5 - ozv) * inz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit_box = act & (tnear <= tfar)

            # leaf interpretation: Moller-Trumbore on p0=(g0..2), e1=(g3..5),
            # e2=(g6..8)
            pvx = dyv * g8 - dzv * g7
            pvy = dzv * g6 - dxv * g8
            pvz = dxv * g7 - dyv * g6
            det = g3 * pvx + g4 * pvy + g5 * pvz
            ok = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = oxv - g0, oyv - g1, ozv - g2
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qx = tvy * g5 - tvz * g4
            qy = tvz * g3 - tvx * g5
            qz = tvx * g4 - tvy * g3
            vv = (dxv * qx + dyv * qy + dzv * qz) * invd
            tt = (g6 * qx + g7 * qy + g8 * qz) * invd
            h = (act & is_leaf & ok & (uu >= 0) & (vv >= 0)
                 & (uu + vv <= 1) & (tt > tmin) & (tt < bt))
            bt = jnp.where(h, tt, bt)
            bi = jnp.where(h, tid, bi)
            bu = jnp.where(h, uu, bu)
            bv = jnp.where(h, vv, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, node + 1, skip)
            node = jnp.where(act, nxt, node)
            if any_hit:
                node = jnp.where(bi >= 0, Nn, node)

        return (jnp.min(node), node, bt, bi, bu, bv, nit + 1)

    _, node_f, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit, node_f


@partial(jax.jit, static_argnames=("n_nodes", "interpret", "any_hit",
                                  "strip", "debug_counts"))
def bvh_traverse_lane_packed(pages, n_nodes, o, d, t_min, t_max,
                             interpret=False, any_hit=False, strip=LSTRIP,
                             debug_counts=False):
    """Per-lane paged traversal of rays (R, 3) against page-planar rows.

    Returns (hit, t, tri_idx (original ids), u, v). With ``any_hit`` lanes
    retire on their first hit (boolean occlusion semantics)."""
    R = o.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    rays = [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),
    ]

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(pages.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(pages_r, *rest):
        ins = [r[0] for r in rest[:8]]
        scr = rest[-1]
        outs = rest[8:-1]
        oxv, oyv, ozv, dxv, dyv, dzv, tmin, tmaxv = ins
        inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)
        # dead lanes (t_max <= t_min) start retired
        node0 = jnp.where(tmaxv > tmin, 0, n_nodes)
        bt, bi, bu, bv, nit, _ = _sweep_lane(
            pages_r, scr, n_nodes, oxv, oyv, ozv, dxv, dyv, dzv,
            inx, iny, inz, tmin, node0, tmaxv,
            jnp.full((BS, LANES), -1, jnp.int32),
            jnp.zeros((BS, LANES), jnp.float32),
            jnp.zeros((BS, LANES), jnp.float32),
            any_hit=any_hit, strip=strip,
        )
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv
        if debug_counts:
            outs[4][0] = jnp.full((BS, LANES), nit, jnp.int32)

    n_out = 5 if debug_counts else 4
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
        ] + [jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32)] * (
            1 if debug_counts else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.VMEM((BS, 1), jnp.int32)],
        interpret=interpret,
    )(pages, *rays)

    t, idx, u, v = (x.reshape(Rp)[:R] for x in out[:4])
    hitm = idx >= 0
    res = (hitm, jnp.where(hitm, t, jnp.inf), idx, u, v)
    if debug_counts:
        return res + (out[4].reshape(Rp)[:R],)
    return res


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "max_nit",
                                  "interpret"))
def _lane_chunk(pages, n_nodes, ox, oy, oz, dx, dy, dz, t_min,
                node_in, t_in, i_in, u_in, v_in,
                any_hit=False, strip=LSTRIP, max_nit=0, interpret=False):
    """One bounded traversal chunk resuming from per-lane state
    (node pointer + best hit); returns the updated (t, idx, u, v, node).
    ``t_in`` doubles as the search upper bound (best-so-far or t_max).
    Ray components arrive as SCALAR (R,) arrays — column-slicing an (R,3)
    stack costs a slow-layout gather per component (~18 ms at 262k)."""
    R = ox.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.asarray(x, dtype)
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    ins = [
        plane(ox, 0.0), plane(oy, 0.0), plane(oz, 0.0),
        plane(dx, 1.0), plane(dy, 0.0), plane(dz, 0.0),
        plane(t_min, 0.0),
        plane(node_in, n_nodes, jnp.int32),
        plane(t_in, 0.0), plane(i_in, -1, jnp.int32),
        plane(u_in, 0.0), plane(v_in, 0.0),
    ]

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(pages.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(pages_r, *rest):
        vals = [r[0] for r in rest[:12]]
        scr = rest[-1]
        outs = rest[12:-1]
        oxv, oyv, ozv, dxv, dyv, dzv, tmin, node0, bt0, bi0, bu0, bv0 = vals
        inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)
        bt, bi, bu, bv, nit, node = _sweep_lane(
            pages_r, scr, n_nodes, oxv, oyv, ozv, dxv, dyv, dzv,
            inx, iny, inz, tmin, node0, bt0, bi0, bu0, bv0,
            any_hit=any_hit, strip=strip, max_nit=max_nit,
        )
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv
        outs[4][0] = node

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * 12,
        out_specs=[ray_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.VMEM((BS, 1), jnp.int32)],
        interpret=interpret,
    )(pages, *ins)
    return tuple(x.reshape(Rp)[:R] for x in out)


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "rounds",
                                  "chunk_nit", "interpret"))
def bvh_traverse_lane_resort(pages, n_nodes, o, d, t_min, t_max,
                             scene_lo, scene_hi, any_hit=False, strip=LSTRIP,
                             rounds=2, chunk_nit=48, interpret=False):
    """Lane traversal with MID-TRAVERSAL compaction: run a bounded chunk,
    re-sort the surviving lanes by their (monotone) node pointer so lanes
    on nearby pages share sublanes, resume — the TPU analog of wavefront
    ray-stream compaction. Incoherent ray batches diverge across pages
    within a few strips; the node-pointer sort restores per-sublane page
    locality at the cost of one multi-payload lax.sort per round."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
    # transpose once so the sort's payload gathers read contiguous (R,)
    # rows — gathering scalar payloads sourced from an (R,3) column lands
    # on a slow-layout path (~18 ms each at 262k)
    oT = o.T
    dT = d.T
    r = jax.lax.sort(
        (key, oT[0], oT[1], oT[2], dT[0], dT[1], dT[2],
         t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
        num_keys=1,
    )
    ox, oy, oz, dx, dy, dz, tmn, tmx, orig = r[1:]
    node = jnp.where(tmx > tmn, 0, n_nodes).astype(jnp.int32)
    bt = tmx
    bi = jnp.full((R,), -1, jnp.int32)
    bu = jnp.zeros((R,))
    bv = jnp.zeros((R,))
    for k in range(rounds):
        bt, bi, bu, bv, node = _lane_chunk(
            pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
            node, bt, bi, bu, bv,
            any_hit=any_hit, strip=strip, max_nit=chunk_nit,
            interpret=interpret)
        rr = jax.lax.sort(
            (node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig),
            num_keys=1,
        )
        node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig = rr
    bt, bi, bu, bv, node = _lane_chunk(
        pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
        node, bt, bi, bu, bv,
        any_hit=any_hit, strip=strip, max_nit=0, interpret=interpret)
    back = jax.lax.sort((orig, bt, bi, bu, bv), num_keys=1)
    hitm = back[2] >= 0
    return (hitm, jnp.where(hitm, back[1], jnp.inf), back[2], back[3],
            back[4])


@partial(jax.jit, static_argnames=("n_nodes", "sort", "any_hit", "strip"))
def bvh_traverse_lane(pages, n_nodes, o, d, t_min, t_max,
                      scene_lo, scene_hi, sort=True, any_hit=False,
                      strip=LSTRIP):
    """Lane traversal with optional coherence sort (sort -> traverse ->
    unsort). Sorting packs rays whose first pages coincide into the same
    sublanes, raising per-step lane occupancy."""
    if not sort:
        return bvh_traverse_lane_packed(pages, n_nodes, o, d, t_min, t_max,
                                        any_hit=any_hit, strip=strip)
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    # dead lanes pool at the tail, where whole blocks retire instantly
    key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
    r = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
        num_keys=1,
    )
    res = bvh_traverse_lane_packed(
        pages, n_nodes, jnp.stack(r[1:4], -1), jnp.stack(r[4:7], -1),
        r[7], r[8], any_hit=any_hit, strip=strip,
    )
    rr = jax.lax.sort((r[9],) + tuple(res[1:]), num_keys=1)
    hitm = rr[2] >= 0
    return (hitm, rr[1], rr[2], rr[3], rr[4])


# --- HBM paging tier: node pages DMA'd on demand (unbounded scene size) ----
#
# The VMEM-resident lane kernel caps out near ~1.8M nodes (pages table
# under the ~120 MB VMEM budget). For larger scenes — the reference
# handles multi-million-triangle meshes routinely (gkdtree.h) — the page
# table stays in HBM and each sublane's CURRENT page is DMA'd into a
# (BS*PCOMP, 128) VMEM scratch at the top of every outer iteration (8
# async copies issued together, one wait each; ~1-2 us amortized over the
# strip's compute). Same traversal, no scene-size ceiling below HBM.

def _sweep_lane_hbm(pages_hbm, scr_ref, res_ref, page_scr, sems, n_nodes,
                    oxv, oyv, ozv, dxv, dyv, dzv,
                    inx, iny, inz, tmin, node0, bt, bi, bu, bv,
                    any_hit=False, strip=LSTRIP, max_nit=0):
    """Per-lane paged traversal with HBM-resident pages. ``page_scr``:
    (BS*PCOMP, 128) VMEM scratch holding each sublane's current page;
    ``sems``: (BS,) DMA semaphores; ``scr_ref``: (BS, 1) int32 VMEM for
    the vector->scalar roundtrip; ``res_ref``: (BS,) int32 SMEM holding
    each sublane's RESIDENT page (page-reuse cache: a sublane that stays
    inside its page across outer iterations — the common case — skips
    the re-DMA entirely). ``max_nit`` > 0 bounds the strip iterations for
    the chunked mid-traversal-resort driver."""
    NP = pages_hbm.shape[0] // PCOMP
    Nn = n_nodes
    BIG = jnp.int32(NP + 1)

    for j in range(BS):
        res_ref[j] = jnp.int32(-1)                       # nothing resident
    state0 = (jnp.min(node0), node0, bt, bi, bu, bv,
              jnp.zeros((), jnp.int32))

    def cond(st):
        if max_nit:
            return (st[0] < Nn) & (st[6] < max_nit)
        return st[0] < Nn

    def body(st):
        _, node, bt, bi, bu, bv, nit = st
        pg = jnp.where(node < Nn, node >> 7, BIG)
        p8 = jnp.min(pg, axis=1, keepdims=True)          # (BS, 1)
        scr_ref[:, :] = p8
        base8 = p8 * PAGE

        dmas = []
        for j in range(BS):
            pj = jnp.minimum(scr_ref[j, 0], NP - 1) * PCOMP
            stale = res_ref[j] != pj

            @pl.when(stale)
            def _(pj=pj, j=j):
                pltpu.make_async_copy(
                    pages_hbm.at[pl.ds(pj, PCOMP), :],
                    page_scr.at[pl.ds(j * PCOMP, PCOMP), :],
                    sems.at[j],
                ).start()
            res_ref[j] = pj
            dmas.append((stale, pj, j))
        for stale, pj, j in dmas:
            @pl.when(stale)
            def _(pj=pj, j=j):
                pltpu.make_async_copy(
                    pages_hbm.at[pl.ds(pj, PCOMP), :],
                    page_scr.at[pl.ds(j * PCOMP, PCOMP), :],
                    sems.at[j],
                ).wait()

        tabs = [
            jnp.stack([page_scr[j * PCOMP + c, :] for j in range(BS)],
                      axis=0)
            for c in range(11)
        ]

        for _t in range(strip):
            local = node - base8
            act = (local >= 0) & (local < PAGE) & (node < Nn)
            li = jnp.clip(local, 0, PAGE - 1)
            g0 = jnp.take_along_axis(tabs[0], li, axis=1)
            g1 = jnp.take_along_axis(tabs[1], li, axis=1)
            g2 = jnp.take_along_axis(tabs[2], li, axis=1)
            g3 = jnp.take_along_axis(tabs[3], li, axis=1)
            g4 = jnp.take_along_axis(tabs[4], li, axis=1)
            g5 = jnp.take_along_axis(tabs[5], li, axis=1)
            g6 = jnp.take_along_axis(tabs[6], li, axis=1)
            g7 = jnp.take_along_axis(tabs[7], li, axis=1)
            g8 = jnp.take_along_axis(tabs[8], li, axis=1)
            skip = jnp.take_along_axis(tabs[9], li, axis=1).astype(jnp.int32)
            tid = jnp.take_along_axis(tabs[10], li, axis=1).astype(jnp.int32)
            is_leaf = tid >= 0

            t0x = (g0 - oxv) * inx
            t1x = (g3 - oxv) * inx
            t0y = (g1 - oyv) * iny
            t1y = (g4 - oyv) * iny
            t0z = (g2 - ozv) * inz
            t1z = (g5 - ozv) * inz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit_box = act & (tnear <= tfar)

            pvx = dyv * g8 - dzv * g7
            pvy = dzv * g6 - dxv * g8
            pvz = dxv * g7 - dyv * g6
            det = g3 * pvx + g4 * pvy + g5 * pvz
            ok = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = oxv - g0, oyv - g1, ozv - g2
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qx = tvy * g5 - tvz * g4
            qy = tvz * g3 - tvx * g5
            qz = tvx * g4 - tvy * g3
            vv = (dxv * qx + dyv * qy + dzv * qz) * invd
            tt = (g6 * qx + g7 * qy + g8 * qz) * invd
            h = (act & is_leaf & ok & (uu >= 0) & (vv >= 0)
                 & (uu + vv <= 1) & (tt > tmin) & (tt < bt))
            bt = jnp.where(h, tt, bt)
            bi = jnp.where(h, tid, bi)
            bu = jnp.where(h, uu, bu)
            bv = jnp.where(h, vv, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, node + 1, skip)
            node = jnp.where(act, nxt, node)
            if any_hit:
                node = jnp.where(bi >= 0, Nn, node)

        return (jnp.min(node), node, bt, bi, bu, bv, nit + 1)

    _, node_f, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit, node_f


@partial(jax.jit, static_argnames=("n_nodes", "interpret", "any_hit",
                                  "strip", "sort"))
def bvh_traverse_lane_hbm(pages, n_nodes, o, d, t_min, t_max,
                          scene_lo, scene_hi, sort=True,
                          interpret=False, any_hit=False, strip=LSTRIP):
    """Lane traversal with HBM-resident pages (+ optional coherence sort):
    no VMEM scene-size ceiling. Same results as bvh_traverse_lane."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    orig = None
    if sort:
        key = ray_sort_keys(o, d, scene_lo, scene_hi)
        key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
        r = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
            num_keys=1,
        )
        o = jnp.stack(r[1:4], -1)
        d = jnp.stack(r[4:7], -1)
        t_min, t_max, orig = r[7], r[8], r[9]

    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.broadcast_to(jnp.asarray(x, dtype), (R,))
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    rays = [
        plane(o[:, 0], 0.0), plane(o[:, 1], 0.0), plane(o[:, 2], 0.0),
        plane(d[:, 0], 1.0), plane(d[:, 1], 0.0), plane(d[:, 2], 0.0),
        plane(t_min, 0.0), plane(t_max, -1.0),
    ]
    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def kern(pages_r, *rest):
        ins = [r[0] for r in rest[:8]]
        scr, res, page_scr, sems = rest[-4], rest[-3], rest[-2], rest[-1]
        outs = rest[8:-4]
        oxv, oyv, ozv, dxv, dyv, dzv, tmin, tmaxv = ins
        inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)
        node0 = jnp.where(tmaxv > tmin, 0, n_nodes)
        bt, bi, bu, bv, _, _ = _sweep_lane_hbm(
            pages_r, scr, res, page_scr, sems, n_nodes, oxv, oyv, ozv,
            dxv, dyv, dzv, inx, iny, inz, tmin, node0, tmaxv,
            jnp.full((BS, LANES), -1, jnp.int32),
            jnp.zeros((BS, LANES), jnp.float32),
            jnp.zeros((BS, LANES), jnp.float32),
            any_hit=any_hit, strip=strip,
        )
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
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, 1), jnp.int32),
            pltpu.SMEM((BS,), jnp.int32),
            pltpu.VMEM((BS * PCOMP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((BS,)),
        ],
        interpret=interpret,
    )(pages, *rays)

    t, idx, u, v = (x.reshape(Rp)[:R] for x in out)
    if sort:
        rr = jax.lax.sort((orig, t, idx, u, v), num_keys=1)
        t, idx, u, v = rr[1], rr[2], rr[3], rr[4]
    hitm = idx >= 0
    return hitm, jnp.where(hitm, t, jnp.inf), idx, u, v


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "max_nit",
                                  "interpret"))
def _lane_chunk_hbm(pages, n_nodes, ox, oy, oz, dx, dy, dz, t_min,
                    node_in, t_in, i_in, u_in, v_in,
                    any_hit=False, strip=LSTRIP, max_nit=0, interpret=False):
    """HBM-paged sibling of _lane_chunk: one bounded traversal chunk
    resuming from per-lane state, pages DMA'd on demand with the
    page-reuse cache."""
    R = ox.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.asarray(x, dtype)
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    ins = [
        plane(ox, 0.0), plane(oy, 0.0), plane(oz, 0.0),
        plane(dx, 1.0), plane(dy, 0.0), plane(dz, 0.0),
        plane(t_min, 0.0),
        plane(node_in, n_nodes, jnp.int32),
        plane(t_in, 0.0), plane(i_in, -1, jnp.int32),
        plane(u_in, 0.0), plane(v_in, 0.0),
    ]

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def kern(pages_r, *rest):
        vals = [r[0] for r in rest[:12]]
        scr, res, page_scr, sems = rest[-4], rest[-3], rest[-2], rest[-1]
        outs = rest[12:-4]
        oxv, oyv, ozv, dxv, dyv, dzv, tmin, node0, bt0, bi0, bu0, bv0 = vals
        inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)
        bt, bi, bu, bv, nit, node = _sweep_lane_hbm(
            pages_r, scr, res, page_scr, sems, n_nodes, oxv, oyv, ozv,
            dxv, dyv, dzv, inx, iny, inz, tmin, node0, bt0, bi0, bu0, bv0,
            any_hit=any_hit, strip=strip, max_nit=max_nit,
        )
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv
        outs[4][0] = node

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * 12,
        out_specs=[ray_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((BS, 1), jnp.int32),
            pltpu.SMEM((BS,), jnp.int32),
            pltpu.VMEM((BS * PCOMP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((BS,)),
        ],
        interpret=interpret,
    )(pages, *ins)
    return tuple(x.reshape(Rp)[:R] for x in out)


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "rounds",
                                  "chunk_nit", "interpret"))
def bvh_traverse_lane_hbm_resort(pages, n_nodes, o, d, t_min, t_max,
                                 scene_lo, scene_hi, any_hit=False,
                                 strip=LSTRIP, rounds=3, chunk_nit=24,
                                 interpret=False):
    """HBM-paged traversal with mid-traversal node-pointer compaction —
    the page-locality lever that makes the beyond-VMEM tier fast: after a
    bounded chunk, lanes are re-sorted by their (monotone) node pointer so
    each sublane's lanes cluster onto FEW pages, turning the 8 per-
    iteration DMAs into mostly cache hits (page-reuse scratch) and raising
    per-step lane occupancy exactly like bvh_traverse_lane_resort."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
    oT = o.T
    dT = d.T
    r = jax.lax.sort(
        (key, oT[0], oT[1], oT[2], dT[0], dT[1], dT[2],
         t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
        num_keys=1,
    )
    ox, oy, oz, dx, dy, dz, tmn, tmx, orig = r[1:]
    node = jnp.where(tmx > tmn, 0, n_nodes).astype(jnp.int32)
    bt = tmx
    bi = jnp.full((R,), -1, jnp.int32)
    bu = jnp.zeros((R,))
    bv = jnp.zeros((R,))
    for k in range(rounds):
        bt, bi, bu, bv, node = _lane_chunk_hbm(
            pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
            node, bt, bi, bu, bv,
            any_hit=any_hit, strip=strip, max_nit=chunk_nit,
            interpret=interpret)
        rr = jax.lax.sort(
            (node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig),
            num_keys=1,
        )
        node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig = rr
    bt, bi, bu, bv, node = _lane_chunk_hbm(
        pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
        node, bt, bi, bu, bv,
        any_hit=any_hit, strip=strip, max_nit=0, interpret=interpret)
    back = jax.lax.sort((orig, bt, bi, bu, bv), num_keys=1)
    hitm = back[2] >= 0
    return (hitm, jnp.where(hitm, back[1], jnp.inf), back[2], back[3],
            back[4])


# node count above which the VMEM-resident page table would not fit the
# Pallas VMEM budget and the HBM-paged kernel takes over (pages table
# bytes = nodes/128 * 11 rows * 512 B)
LANE_VMEM_MAX_NODES = 2_300_000


# --- wide-page lane traversal: PAGE in {128, 256, 512, 1024} ---------------
#
# Measured (r5 probes, bunny bounce rays): with 128-node pages the sweep
# runs at ~5% lane occupancy — after the node-pointer sort, 128 sorted
# lanes span ~1 page only while most lanes are alive; as lanes retire the
# survivors' pointer span grows to thousands of nodes, so a sublane's
# min-page holds few lanes and extra resort rounds stop helping. Wider
# pages attack exactly that: a PAGE-node page needs vpp = PAGE/128 vregs
# per component and each gather becomes a (seg == k)-select over the vpp
# vregs (~1.3x per-step vector ops at 256, ~1.65x at 512) while the
# number of lanes inside the current page grows with PAGE (up to vpp x
# occupancy in the diverged regime) — a net win measured at 256/512.

def pack_pages_w(bvh, p0, e1, e2, page: int = 256) -> np.ndarray:
    """(n_pages * 11 * vpp, 128) float32 wide-page rows (leaf_size=1 BVH).
    Page p, component c, vreg k lives at row p*(11*vpp) + c*vpp + k and
    holds nodes [p*page + k*128, p*page + (k+1)*128)."""
    assert page % 128 == 0
    vpp = page // 128
    pcomp = 11 * vpp
    N = len(bvh.lo)
    counts = np.where(bvh.prim_first >= 0, bvh.prim_count, 0)
    assert counts.max() <= 1, "lane layout requires a leaf_size=1 BVH"
    assert N < (1 << 24) and len(p0) < (1 << 24)
    n_pages = -(-N // page)
    comp = np.zeros((11, n_pages * page), np.float32)
    comp[9, :] = float(N)
    comp[10, :] = -1.0
    inner = counts == 0
    leaf = ~inner
    tri = np.zeros(N, np.int64)
    tri[leaf] = bvh.prim_order[bvh.prim_first[leaf]]
    idx = np.arange(N)
    for c in range(3):
        comp[c, idx[inner]] = bvh.lo[inner, c]
        comp[3 + c, idx[inner]] = bvh.hi[inner, c]
        comp[c, idx[leaf]] = p0[tri[leaf], c]
        comp[3 + c, idx[leaf]] = e1[tri[leaf], c]
        comp[6 + c, idx[leaf]] = e2[tri[leaf], c]
    comp[9, idx] = bvh.skip.astype(np.float32)
    comp[10, idx] = np.where(leaf, tri, -1).astype(np.float32)
    out = np.zeros((n_pages * pcomp, 128), np.float32)
    for p in range(n_pages):
        for c in range(11):
            for k in range(vpp):
                lo_i = p * page + k * 128
                out[p * pcomp + c * vpp + k] = comp[c, lo_i:lo_i + 128]
    return out


def _sweep_lane_w(pages_ref, scr_ref, n_nodes, oxv, oyv, ozv, dxv, dyv, dzv,
                  inx, iny, inz, tmin, node0, bt, bi, bu, bv,
                  any_hit=False, strip=LSTRIP, max_nit=0, page=256):
    """Wide-page per-lane sweep (see pack_pages_w)."""
    vpp = page // 128
    pcomp = 11 * vpp
    pshift = page.bit_length() - 1
    NP = pages_ref.shape[0] // pcomp
    Nn = n_nodes
    BIG = jnp.int32(NP + 1)

    state0 = (jnp.min(node0), node0, bt, bi, bu, bv,
              jnp.zeros((), jnp.int32))

    def cond(st):
        if max_nit:
            return (st[0] < Nn) & (st[6] < max_nit)
        return st[0] < Nn

    def body(st):
        _, node, bt, bi, bu, bv, nit = st
        pg = jnp.where(node < Nn, node >> pshift, BIG)
        p8 = jnp.min(pg, axis=1, keepdims=True)          # (BS, 1)
        scr_ref[:, :] = p8
        base8 = p8 * page

        # tabs[c][k]: (BS, 128) — component c, vreg k of each sublane's page
        rows = []
        for j in range(BS):
            pj = jnp.minimum(scr_ref[j, 0], NP - 1) * pcomp
            rows.append([pages_ref[pj + r, :] for r in range(pcomp)])
        tabs = [[jnp.stack([rows[j][c * vpp + k] for j in range(BS)], axis=0)
                 for k in range(vpp)] for c in range(11)]

        def fetch(c, li, seg):
            g = jnp.take_along_axis(tabs[c][0], li, axis=1)
            for k in range(1, vpp):
                gk = jnp.take_along_axis(tabs[c][k], li, axis=1)
                g = jnp.where(seg == k, gk, g)
            return g

        for _t in range(strip):
            local = node - base8
            act = (local >= 0) & (local < page) & (node < Nn)
            lc = jnp.clip(local, 0, page - 1)
            li = lc & 127
            seg = lc >> 7
            g0 = fetch(0, li, seg)
            g1 = fetch(1, li, seg)
            g2 = fetch(2, li, seg)
            g3 = fetch(3, li, seg)
            g4 = fetch(4, li, seg)
            g5 = fetch(5, li, seg)
            g6 = fetch(6, li, seg)
            g7 = fetch(7, li, seg)
            g8 = fetch(8, li, seg)
            skip = fetch(9, li, seg).astype(jnp.int32)
            tid = fetch(10, li, seg).astype(jnp.int32)
            is_leaf = tid >= 0

            t0x = (g0 - oxv) * inx
            t1x = (g3 - oxv) * inx
            t0y = (g1 - oyv) * iny
            t1y = (g4 - oyv) * iny
            t0z = (g2 - ozv) * inz
            t1z = (g5 - ozv) * inz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt),
            )
            hit_box = act & (tnear <= tfar)

            pvx = dyv * g8 - dzv * g7
            pvy = dzv * g6 - dxv * g8
            pvz = dxv * g7 - dyv * g6
            det = g3 * pvx + g4 * pvy + g5 * pvz
            ok = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tvx, tvy, tvz = oxv - g0, oyv - g1, ozv - g2
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qx = tvy * g5 - tvz * g4
            qy = tvz * g3 - tvx * g5
            qz = tvx * g4 - tvy * g3
            vv = (dxv * qx + dyv * qy + dzv * qz) * invd
            tt = (g6 * qx + g7 * qy + g8 * qz) * invd
            h = (act & is_leaf & ok & (uu >= 0) & (vv >= 0)
                 & (uu + vv <= 1) & (tt > tmin) & (tt < bt))
            bt = jnp.where(h, tt, bt)
            bi = jnp.where(h, tid, bi)
            bu = jnp.where(h, uu, bu)
            bv = jnp.where(h, vv, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            nxt = jnp.where(descend, node + 1, skip)
            node = jnp.where(act, nxt, node)
            if any_hit:
                node = jnp.where(bi >= 0, Nn, node)

        return (jnp.min(node), node, bt, bi, bu, bv, nit + 1)

    _, node_f, bt, bi, bu, bv, nit = jax.lax.while_loop(cond, body, state0)
    return bt, bi, bu, bv, nit, node_f


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "max_nit",
                                  "interpret", "page"))
def _lane_chunk_w(pages, n_nodes, ox, oy, oz, dx, dy, dz, t_min,
                  node_in, t_in, i_in, u_in, v_in,
                  any_hit=False, strip=LSTRIP, max_nit=0, interpret=False,
                  page=256):
    """Wide-page bounded traversal chunk resuming from per-lane state."""
    R = ox.shape[0]
    Rp = -(-R // BLOCK) * BLOCK
    grid = Rp // BLOCK

    def plane(x, fill, dtype=jnp.float32):
        x = jnp.asarray(x, dtype)
        x = jnp.pad(x, (0, Rp - R), constant_values=fill)
        return x.reshape(grid, BS, LANES)

    ins = [
        plane(ox, 0.0), plane(oy, 0.0), plane(oz, 0.0),
        plane(dx, 1.0), plane(dy, 0.0), plane(dz, 0.0),
        plane(t_min, 0.0),
        plane(node_in, n_nodes, jnp.int32),
        plane(t_in, 0.0), plane(i_in, -1, jnp.int32),
        plane(u_in, 0.0), plane(v_in, 0.0),
    ]

    ray_spec = pl.BlockSpec((1, BS, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(pages.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(pages_r, *rest):
        vals = [r[0] for r in rest[:12]]
        scr = rest[-1]
        outs = rest[12:-1]
        oxv, oyv, ozv, dxv, dyv, dzv, tmin, node0, bt0, bi0, bu0, bv0 = vals
        inx, iny, inz = _safe_inv_v(dxv), _safe_inv_v(dyv), _safe_inv_v(dzv)
        bt, bi, bu, bv, nit, node = _sweep_lane_w(
            pages_r, scr, n_nodes, oxv, oyv, ozv, dxv, dyv, dzv,
            inx, iny, inz, tmin, node0, bt0, bi0, bu0, bv0,
            any_hit=any_hit, strip=strip, max_nit=max_nit, page=page,
        )
        outs[0][0] = bt
        outs[1][0] = bi
        outs[2][0] = bu
        outs[3][0] = bv
        outs[4][0] = node

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tab_spec] + [ray_spec] * 12,
        out_specs=[ray_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, BS, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.VMEM((BS, 1), jnp.int32)],
        interpret=interpret,
    )(pages, *ins)
    return tuple(x.reshape(Rp)[:R] for x in out)


@partial(jax.jit, static_argnames=("n_nodes", "any_hit", "strip", "rounds",
                                  "chunk_nit", "interpret", "page"))
def bvh_traverse_lane_resort_w(pages, n_nodes, o, d, t_min, t_max,
                               scene_lo, scene_hi, any_hit=False,
                               strip=LSTRIP, rounds=2, chunk_nit=16,
                               interpret=False, page=256):
    """Wide-page lane traversal with mid-traversal node-pointer resorts
    (see bvh_traverse_lane_resort; same sequence, wide pages)."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    key = ray_sort_keys(o, d, scene_lo, scene_hi)
    key = jnp.where(t_max <= t_min, jnp.uint32(0xFFFFFFFF), key)
    oT = o.T
    dT = d.T
    r = jax.lax.sort(
        (key, oT[0], oT[1], oT[2], dT[0], dT[1], dT[2],
         t_min, t_max, jnp.arange(R, dtype=jnp.int32)),
        num_keys=1,
    )
    ox, oy, oz, dx, dy, dz, tmn, tmx, orig = r[1:]
    node = jnp.where(tmx > tmn, 0, n_nodes).astype(jnp.int32)
    bt = tmx
    bi = jnp.full((R,), -1, jnp.int32)
    bu = jnp.zeros((R,))
    bv = jnp.zeros((R,))
    for k in range(rounds):
        bt, bi, bu, bv, node = _lane_chunk_w(
            pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
            node, bt, bi, bu, bv,
            any_hit=any_hit, strip=strip, max_nit=chunk_nit,
            interpret=interpret, page=page)
        rr = jax.lax.sort(
            (node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig),
            num_keys=1,
        )
        node, ox, oy, oz, dx, dy, dz, tmn, bt, bi, bu, bv, orig = rr
    bt, bi, bu, bv, node = _lane_chunk_w(
        pages, n_nodes, ox, oy, oz, dx, dy, dz, tmn,
        node, bt, bi, bu, bv,
        any_hit=any_hit, strip=strip, max_nit=0, interpret=interpret,
        page=page)
    back = jax.lax.sort((orig, bt, bi, bu, bv), num_keys=1)
    hitm = back[2] >= 0
    return (hitm, jnp.where(hitm, back[1], jnp.inf), back[2], back[3],
            back[4])


# --- treelet-aligned wide pages --------------------------------------------
#
# probe_visits.py: mean path length is only ~69 nodes on the bunny bench,
# yet the lane kernel runs at ~4% effective occupancy — because arbitrary
# page cuts slice subtrees, so a lane's skip jumps leave its sublane's
# page after ~2-3 steps and every outer iteration advances only the few
# lanes sharing the min page. Treelet-ALIGNED packing places every
# subtree of <= page nodes entirely inside one page (units = whole
# treelets or single spine nodes, greedily filled in preorder): all
# intra-subtree skips then stay in-page, a lane leaves its page only at
# true subtree exits, and after a node-pointer sort a sublane's lanes
# concentrate on the same treelet — occupancy by construction.
# Page-boundary padding slots are inert FORWARDERS (infinite box -> the
# +1 descent walks through them), preserving the kernel's node+1 child
# rule across padded boundaries. The sweep kernel is unchanged.

def pack_pages_treelet(bvh, p0, e1, e2, page: int = 256):
    """Returns (rows (n_pages*11*vpp, 128) float32, n_slots int): wide-page
    table with treelet-aligned unit packing + the remapped node count
    (the traversal's retire sentinel)."""
    assert page % 128 == 0
    vpp = page // 128
    pcomp = 11 * vpp
    N = len(bvh.lo)
    counts = np.where(bvh.prim_first >= 0, bvh.prim_count, 0)
    assert counts.max() <= 1, "lane layout requires a leaf_size=1 BVH"
    skip = bvh.skip.astype(np.int64)

    # units: (start, end) — whole subtree if it fits a page, else the
    # spine node alone
    units = []
    i = 0
    while i < N:
        if skip[i] - i <= page:
            units.append((i, int(skip[i])))
            i = int(skip[i])
        else:
            units.append((i, i + 1))
            i += 1

    # greedy page fill; remap old -> new ids
    remap = np.full(N + 1, -1, np.int64)
    fill = 0
    new_id = 0
    for (a, b) in units:
        s = b - a
        if fill + s > page:
            new_id += page - fill          # pad to the page boundary
            fill = 0
        remap[a:b] = new_id + np.arange(s)
        new_id += s
        fill = (fill + s) % page
    n_slots = int(-(-new_id // page) * page)
    remap[N] = n_slots                     # retire sentinel

    n_pages = n_slots // page
    comp = np.zeros((11, n_slots), np.float32)
    # default: inert FORWARDER pads — infinite box, internal, so +1 walks
    # through them to the next real slot
    comp[0:3, :] = -np.inf                 # lo
    comp[3:6, :] = np.inf                  # hi
    comp[9, :] = float(n_slots)
    comp[10, :] = -1.0

    inner = counts == 0
    leaf = ~inner
    tri = np.zeros(N, np.int64)
    tri[leaf] = bvh.prim_order[bvh.prim_first[leaf]]
    nid = remap[:N]
    for c in range(3):
        comp[c, nid[inner]] = bvh.lo[inner, c]
        comp[3 + c, nid[inner]] = bvh.hi[inner, c]
        comp[c, nid[leaf]] = p0[tri[leaf], c]
        comp[3 + c, nid[leaf]] = e1[tri[leaf], c]
        comp[6 + c, nid[leaf]] = e2[tri[leaf], c]
    comp[9, nid] = remap[skip[:N]].astype(np.float32)
    comp[10, nid] = np.where(leaf, tri, -1).astype(np.float32)
    assert n_slots < (1 << 24)

    out = np.zeros((n_pages * pcomp, 128), np.float32)
    for p in range(n_pages):
        for c in range(11):
            for k in range(vpp):
                lo_i = p * page + k * 128
                out[p * pcomp + c * vpp + k] = comp[c, lo_i:lo_i + 128]
    return out, n_slots
