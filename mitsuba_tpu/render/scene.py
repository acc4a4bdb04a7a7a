"""Scene container: compiled array-of-structs scene + device queries.

The reference keeps a retained-mode object graph (Scene in scene.h/
scene.cpp owning Shape/BSDF/Emitter plugin objects, kd-tree built at
initialize(), scene.cpp:322-384). The TPU design compiles the whole scene
into flat device arrays once on the host: triangles + analytic spheres,
a threaded BVH, a material table, a texture stack, and an emitter table
with precomputed NEE pdfs. Device-side queries (ray_intersect, occluded,
sample_emitter_direct) are pure batched functions over those arrays.

Static (non-traced) facts — which BSDF/emitter types exist, whether to use
the BVH — live in SceneStatic, closed over at jit time, so XLA only compiles
the lobes a scene actually uses.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.build import build_bvh, triangle_aabbs
from ..accel.traverse import DeviceBVH, bvh_closest_hit, bvh_any_hit
from ..core import math as m
from ..core.frame import Frame
from ..ops import intersect as isect
from . import bsdf as bsdf_mod
from . import emitter as em_mod
from .records import Interaction
from .texture import TextureTable
from .medium import MediumTable

# below this triangle count brute force beats BVH gathers on TPU
BRUTE_FORCE_MAX_TRIS = 512

# Pallas fast path: None = auto (TPU backend only), True/False = forced.
# The VMEM-resident brute-force kernel is ~17x faster than the XLA
# formulation on a v5e (ops/pallas_intersect.py).
USE_PALLAS_INTERSECT = None


def _pallas_ok(static) -> bool:
    if not (0 < static.n_tris and not static.use_bvh):
        return False
    from ..ops import pallas_intersect as pti

    if not pti.supported(static.n_tris):
        return False
    if USE_PALLAS_INTERSECT is not None:
        return USE_PALLAS_INTERSECT
    import jax

    return jax.default_backend() == "tpu"


# Pallas BVH traversal kernel: "lane" = per-lane paged traversal (each lane
# advances its own node pointer via in-vreg dynamic gathers), "treelet" =
# two-level union sweep (round-2 kernel). Overridable for A/B probing.
BVH_KERNEL = os.environ.get("MTS_BVH_KERNEL", "lane")
# per-query coherence sort (sort -> traverse -> unsort). XLA rewrites the
# multi-payload lax.sort into key-sort + payload gathers that profile at
# ~43 ms each per bounce; the per-lane kernel degrades gracefully on
# unsorted rays, so the sort is optional.
BVH_SORT = os.environ.get("MTS_BVH_SORT", "1") != "0"
# chunked traversal with mid-traversal node-pointer re-sort for bounce
# (non-presorted) queries: "rounds,chunk_nit[,strip]", empty = off.
# Schedules measured on the bunny bench (r5 probes, bounce rays):
# closest 4,24,5 = 42.3 ms (plateau: 2,16,10 = 45.8; 4,12,10 = 41.9);
# shadow (any_hit retires lanes on first hit, fewer rounds pay)
# 1,16 = 31 ms
BVH_RESORT = os.environ.get("MTS_BVH_RESORT", "4,24,5")
BVH_RESORT_SHADOW = os.environ.get("MTS_BVH_RESORT_SHADOW", "1,16")


def _sched(spec):
    parts = [int(x) for x in spec.split(",")]
    rr, cn = parts[0], parts[1]
    st = parts[2] if len(parts) > 2 else 10
    return rr, cn, st


def _pallas_bvh_ok(static) -> bool:
    if not static.use_bvh:
        return False
    if USE_PALLAS_INTERSECT is not None:
        return USE_PALLAS_INTERSECT
    import jax

    return jax.default_backend() == "tpu"


class Scene(NamedTuple):
    """Device scene (a pytree — every leaf is a jnp array)."""

    # triangles
    tri_p0: jnp.ndarray       # (T, 3)
    tri_e1: jnp.ndarray       # (T, 3)
    tri_e2: jnp.ndarray       # (T, 3)
    tri_n0: jnp.ndarray       # (T, 3) shading normals per vertex
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray      # (T, 2)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_gn: jnp.ndarray       # (T, 3) geometric normal (unit)
    tri_mat: jnp.ndarray      # (T,) int32
    tri_emitter: jnp.ndarray  # (T,) int32 (-1 none)
    tri_nee_pdf_area: jnp.ndarray  # (T,) em_pmf * tri_pmf / area (0 if not emissive)
    # packed shading-attribute rows: ONE wide gather per hit instead of ten
    # narrow ones (XLA TPU gathers cost ~1-3 ms each at 262k lanes — the
    # record build was ~30 ms/bounce as separate gathers). Layout:
    # n0 n1 n2 (9) | uv0 uv1 uv2 (6) | gn (3) | mat em nee (3) = 21 cols.
    tri_attrs: jnp.ndarray    # (T, 21) float32
    # p0 e1 e2 (9) | gn (3) | nee pdf (1) = 13 cols: the NEE-side wide
    # gather (per-component (T,3) gathers land on a slow {1,0:T(8,128)}
    # layout path, ~18 ms each at 262k lanes; one wide row costs one)
    tri_nee_attrs: jnp.ndarray  # (T, 13) float32
    # analytic spheres
    sph_center: jnp.ndarray   # (S, 3)
    sph_radius: jnp.ndarray   # (S,)
    sph_mat: jnp.ndarray      # (S,)
    sph_emitter: jnp.ndarray  # (S,)
    # acceleration
    bvh: DeviceBVH
    bvh_rows: jnp.ndarray     # (N/4, 128) slot-packed slim node rows (pallas)
    bvh_pages: jnp.ndarray    # (n_pages*16, 128) page-planar rows (lane kernel)
    # treelet cut of the preorder node stream (two-level traversal; K >= 2
    # enables the bounded-sweep fast path for incoherent rays)
    tl_root: jnp.ndarray      # (K,) int32 treelet root rows
    tl_skip: jnp.ndarray      # (K,) int32 end of each root's subtree range
    tl_lo: jnp.ndarray        # (K, 3) root AABBs
    tl_hi: jnp.ndarray        # (K, 3)
    # tables
    materials: bsdf_mod.MaterialTable
    textures: TextureTable
    emitters: em_mod.EmitterTable
    media: MediumTable
    sss: "SSSTable"           # subsurface table (dipole.cpp parity)
    irawan: "IrawanTable"     # weave patterns (irawan.cpp parity)
    # bounds
    aabb_lo: jnp.ndarray      # (3,)
    aabb_hi: jnp.ndarray      # (3,)
    radius: jnp.ndarray       # () bounding-sphere radius
    # specular-MESH manifold rows [p0 e1 e2 | n0 n1 n2 | eta] (Tm, 19)
    # for render/manifold.py mesh chains ((1, 19) zero when absent or the
    # dielectric mesh exceeds the manifold cap)
    man_tri: jnp.ndarray = jnp.zeros((1, 19))


@dataclass(frozen=True)
class SceneStatic:
    """Hashable compile-time facts about a scene."""

    n_tris: int
    n_spheres: int
    use_bvh: bool
    bsdf_types: tuple          # sorted tuple of bsdf type tags present
    emitter_types: tuple       # sorted tuple of emitter type tags present
    has_env: bool
    has_textures: bool = True  # any material references a texture slot
    has_opacity_tex: bool = False  # any material has an opacity texture
    has_weight_tex: bool = False   # any material has a blend-weight texture
    medium_types: tuple = ()   # medium type tags present (empty = no media)
    phase_types: tuple = ()    # phase function tags present
    nested_bsdf_types: tuple = ()  # bsdf tags reachable via nested_a/nested_b
    has_normal_maps: bool = False  # any material has a normal/bump texture
    has_sss: bool = False      # any material references a subsurface profile
    has_singlescatter: bool = False  # any profile in MODE_SINGLESCATTER
    has_boundary_media: bool = False  # any material carries an interior/exterior medium
    ewa_taps: int = 0          # >1 enables N-tap anisotropic (EWA) filtering
    n_bvh_nodes: int = 0       # node count of the slim BVH (lane kernel)
    n_manifold_tris: int = 0   # dielectric-mesh tris usable by manifold walks


# === device queries =======================================================

def ray_intersect(scene: Scene, static: SceneStatic, o, d, t_min, t_max,
                  active=None, presorted: bool = False) -> Interaction:
    """Closest-hit + full surface interaction record (the reference's
    Scene::rayIntersect + fillIntersectionRecord, split reference
    skdtree.cpp:112 / shape.h)."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if active is not None:
        # inactive lanes trace degenerate rays: keep shapes static, kill range
        t_max = jnp.where(active, t_max, t_min)

    T = static.n_tris
    pallas_record = False
    if T > 0:
        if static.use_bvh:
            if _pallas_bvh_ok(static):
                # Pallas kernels carry no vjp; geometry queries are
                # DETACHED under AD — exactly the detached-sampling
                # estimator (parallel/train.py): hit records are constants
                # w.r.t. material/emitter/texture parameters, which is
                # what the trainable classes differentiate
                o = jax.lax.stop_gradient(o)
                d = jax.lax.stop_gradient(d)
                if BVH_KERNEL == "lane":
                    from ..ops.pallas_bvh import (
                        LANE_VMEM_MAX_NODES, bvh_traverse_lane,
                        bvh_traverse_lane_hbm)

                    trav = (bvh_traverse_lane_hbm
                            if static.n_bvh_nodes > LANE_VMEM_MAX_NODES
                            else bvh_traverse_lane)
                    if (BVH_RESORT and not presorted
                            and trav is bvh_traverse_lane):
                        from ..ops.pallas_bvh import bvh_traverse_lane_resort
                        rr, cn, st = _sched(BVH_RESORT)
                        hit_t, tri_t, tri_idx, tri_u, tri_v = \
                            bvh_traverse_lane_resort(
                                scene.bvh_pages, static.n_bvh_nodes, o, d,
                                t_min, t_max, scene.aabb_lo, scene.aabb_hi,
                                rounds=rr, chunk_nit=cn, strip=st)
                    else:
                        hit_t, tri_t, tri_idx, tri_u, tri_v = trav(
                            scene.bvh_pages, static.n_bvh_nodes, o, d,
                            t_min, t_max, scene.aabb_lo, scene.aabb_hi,
                            sort=BVH_SORT and not presorted,
                        )
                else:
                    from ..ops.pallas_bvh import bvh_traverse_treelets

                    hit_t, tri_t, tri_idx, tri_u, tri_v = bvh_traverse_treelets(
                        scene.bvh_rows, scene.tl_root, scene.tl_skip,
                        scene.tl_lo, scene.tl_hi, o, d, t_min, t_max,
                        scene.aabb_lo, scene.aabb_hi, sort=not presorted,
                        slim=True,
                    )
            else:
                hit_t, tri_t, tri_idx, tri_u, tri_v = bvh_closest_hit(
                    scene.bvh, o, d, t_min, t_max
                )
        elif _pallas_ok(static):
            from ..ops.pallas_intersect import brute_force_interaction

            o = jax.lax.stop_gradient(o)
            d = jax.lax.stop_gradient(d)

            (hit_t, tri_t, tri_idx, tri_u, tri_v, n_sh_raw, gn_tri, uv_tri,
             mat_tri, em_tri, nee_tri) = brute_force_interaction(
                scene.tri_p0, scene.tri_e1, scene.tri_e2,
                scene.tri_n0, scene.tri_n1, scene.tri_n2,
                scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,
                scene.tri_gn, scene.tri_mat, scene.tri_emitter,
                scene.tri_nee_pdf_area, o, d, t_min, t_max,
            )
            n_sh_tri = m.normalize(n_sh_raw)
            pallas_record = True
        else:
            hit_t, tri_t, tri_idx, tri_u, tri_v = isect.ray_brute_force_tris(
                o, d, scene.tri_p0, scene.tri_e1, scene.tri_e2, t_min, t_max
            )
    else:
        hit_t = jnp.zeros(R, bool)
        tri_t = jnp.full(R, jnp.inf)
        tri_idx = jnp.full(R, -1, jnp.int32)
        tri_u = jnp.zeros(R)
        tri_v = jnp.zeros(R)
        nee_tri = jnp.zeros(R)

    if static.n_spheres > 0:
        hit_s, sph_t, sph_idx = isect.ray_brute_force_spheres(
            o, d, scene.sph_center, scene.sph_radius, t_min, t_max
        )
        sphere_closer = hit_s & (~hit_t | (sph_t < tri_t))
    else:
        sphere_closer = jnp.zeros(R, bool)
        sph_t = jnp.full(R, jnp.inf)
        sph_idx = jnp.zeros(R, jnp.int32)

    valid = hit_t | sphere_closer
    t = jnp.where(sphere_closer, sph_t, tri_t)
    # sanitized position for invalid lanes: inf positions would poison
    # downstream NEE math and, through 0*NaN cotangents, the backward pass
    t_safe = jnp.where(valid, t, 1.0)
    p = o + t_safe[..., None] * d

    # --- triangle shading data (gather path; the pallas kernel already
    # produced these in-register) ---
    if not pallas_record:
        ti = jnp.maximum(tri_idx, 0)
        b1, b2 = tri_u, tri_v
        b0 = 1.0 - b1 - b2
        at = scene.tri_attrs[ti]  # ONE wide gather (see Scene.tri_attrs)
        n_sh_tri = m.normalize(
            b0[..., None] * at[:, 0:3]
            + b1[..., None] * at[:, 3:6]
            + b2[..., None] * at[:, 6:9]
        )
        uv_tri = (
            b0[..., None] * at[:, 9:11]
            + b1[..., None] * at[:, 11:13]
            + b2[..., None] * at[:, 13:15]
        )
        gn_tri = at[:, 15:18]
        mat_tri = at[:, 18].astype(jnp.int32)
        em_tri = at[:, 19].astype(jnp.int32)
        nee_tri = at[:, 20]

    if static.n_spheres > 0:
        # --- sphere shading data (sphere.cpp fillIntersectionRecord) ---
        si = jnp.minimum(sph_idx, max(static.n_spheres - 1, 0))
        c = scene.sph_center[si]
        n_sph = m.normalize(p - c)
        theta, phi = m.spherical_coordinates(n_sph)
        uv_sph = jnp.stack([phi * (0.5 / jnp.pi), theta * (1.0 / jnp.pi)], axis=-1)
        mat_sph = scene.sph_mat[si]
        em_sph = scene.sph_emitter[si]

        sc = sphere_closer[..., None]
        gn = jnp.where(sc, n_sph, gn_tri)
        n_sh = jnp.where(sc, n_sph, n_sh_tri)
        uv = jnp.where(sc, uv_sph, uv_tri)
        mat_id = jnp.where(sphere_closer, mat_sph, mat_tri)
        em_id = jnp.where(sphere_closer, em_sph, em_tri)
        prim = jnp.where(sphere_closer, T + sph_idx, tri_idx)
        nee_pdf = jnp.where(sphere_closer | ~hit_t, 0.0, nee_tri)
    else:
        gn, n_sh, uv = gn_tri, n_sh_tri, uv_tri
        mat_id, em_id, prim = mat_tri, em_tri, tri_idx
        nee_pdf = jnp.where(hit_t, nee_tri, 0.0)

    # orient geometric normal to the shading normal's side convention:
    # keep gn as authored; flip shading frame handled by BSDF twosided flag.
    frame = Frame.from_normal(n_sh)
    if static.has_normal_maps and T > 0:
        frame = _perturb_frame(scene, tri_idx, uv, mat_id, frame)
    wi_world = -d
    wi_local = frame.to_local(wi_world)

    mat_id = jnp.where(valid, mat_id, -1)
    em_id = jnp.where(valid, em_id, -1)
    return Interaction(
        valid=valid,
        t=jnp.where(valid, t, jnp.inf),
        p=p,
        gn=gn,
        sh_frame=frame,
        uv=uv,
        wi=wi_local,
        wi_world=wi_world,
        mat_id=mat_id,
        emitter_id=em_id,
        prim_id=jnp.where(valid, prim, -1).astype(jnp.int32),
        nee_pdf_area=nee_pdf,
        bary=jnp.stack([tri_u, tri_v], axis=-1) if T > 0
        else jnp.zeros((R, 2)),
    )


def _perturb_frame(scene: Scene, tri_idx, uv, mat_id, frame: Frame) -> Frame:
    """normalmap.cpp / bumpmap.cpp: rebuild the shading frame from a
    tangent-space normal map or a height texture's finite differences.
    UV-aligned tangents come from the triangle's uv parameterization."""
    from .texture import eval_texture

    mid = jnp.maximum(mat_id, 0)
    ntex = scene.materials.normal_tex[mid]
    btex = scene.materials.bump_tex[mid]
    bscale = scene.materials.bump_scale[mid]
    has_n = ntex >= 0
    has_b = btex >= 0

    # uv-aligned tangent dpdu (trimesh.cpp computeUVTangents)
    ti = jnp.maximum(tri_idx, 0)
    atn = scene.tri_nee_attrs[ti]          # wide gathers: see field note
    ata = scene.tri_attrs[ti]
    e1, e2 = atn[..., 3:6], atn[..., 6:9]
    duv1 = ata[..., 11:13] - ata[..., 9:11]
    duv2 = ata[..., 13:15] - ata[..., 9:11]
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    ok_uv = jnp.abs(det) > 1e-12
    inv = m.safe_div(1.0, jnp.where(ok_uv, det, 1.0))
    dpdu = (e1 * duv2[..., 1:2] - e2 * duv1[..., 1:2]) * inv[..., None]
    # fall back to the default frame tangent for degenerate uvs
    t_u = jnp.where(ok_uv[..., None], dpdu, frame.s)
    n = frame.n
    t_u = t_u - n * m.dot(n, t_u, keepdims=True)
    t_len = m.length(t_u)
    t_u = jnp.where((t_len > 1e-9)[..., None],
                    t_u / jnp.maximum(t_len, 1e-9)[..., None], frame.s)
    b_v = jnp.cross(n, t_u)

    n_new = n
    if True:  # normal map branch (tangent-space rgb in [0,1])
        c = eval_texture(scene.textures, ntex, uv,
                         jnp.broadcast_to(jnp.asarray([0.5, 0.5, 1.0]), n.shape))
        nt = 2.0 * c - 1.0
        n_nm = m.normalize(
            nt[..., 0:1] * t_u + nt[..., 1:2] * b_v + nt[..., 2:3] * n
        )
        n_new = jnp.where(has_n[..., None], n_nm, n_new)
    if True:  # bump map branch (height finite differences, bumpmap.cpp)
        eps = 5e-4
        du = jnp.asarray([eps, 0.0])
        dv = jnp.asarray([0.0, eps])
        zero3 = jnp.zeros(n.shape)
        h0 = eval_texture(scene.textures, btex, uv, zero3)[..., 0]
        hu = eval_texture(scene.textures, btex, uv + du, zero3)[..., 0]
        hv = eval_texture(scene.textures, btex, uv + dv, zero3)[..., 0]
        dhdu = (hu - h0) / eps * bscale
        dhdv = (hv - h0) / eps * bscale
        n_bm = m.normalize(
            jnp.cross(t_u + dhdu[..., None] * n, b_v + dhdv[..., None] * n)
        )
        n_bm = n_bm * jnp.sign(m.dot(n_bm, n, keepdims=True))
        n_new = jnp.where(has_b[..., None], n_bm, n_new)

    new_frame = Frame.from_normal(m.normalize(n_new))
    any_map = (has_n | has_b)[..., None]
    return Frame(
        s=jnp.where(any_map, new_frame.s, frame.s),
        t=jnp.where(any_map, new_frame.t, frame.t),
        n=jnp.where(any_map, new_frame.n, frame.n),
    )


def occluded(scene: Scene, static: SceneStatic, o, d, t_min, t_max,
             active=None, presorted: bool = False):
    """Boolean shadow-ray query (skdtree.cpp:207 fast path)."""
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if active is not None:
        t_max = jnp.where(active, t_max, t_min)
    occ = jnp.zeros(R, bool)
    if static.n_tris > 0:
        if static.use_bvh:
            if _pallas_bvh_ok(static):
                o = jax.lax.stop_gradient(o)
                d = jax.lax.stop_gradient(d)
                if BVH_KERNEL == "lane":
                    from ..ops.pallas_bvh import (
                        LANE_VMEM_MAX_NODES, bvh_traverse_lane,
                        bvh_traverse_lane_hbm)

                    trav = (bvh_traverse_lane_hbm
                            if static.n_bvh_nodes > LANE_VMEM_MAX_NODES
                            else bvh_traverse_lane)
                    if (BVH_RESORT_SHADOW and not presorted
                            and trav is bvh_traverse_lane):
                        from ..ops.pallas_bvh import bvh_traverse_lane_resort
                        rr, cn, st = _sched(BVH_RESORT_SHADOW)
                        h, _, _, _, _ = bvh_traverse_lane_resort(
                            scene.bvh_pages, static.n_bvh_nodes, o, d,
                            t_min, t_max, scene.aabb_lo, scene.aabb_hi,
                            rounds=rr, chunk_nit=cn, any_hit=True,
                            strip=st)
                    else:
                        h, _, _, _, _ = trav(
                            scene.bvh_pages, static.n_bvh_nodes, o, d,
                            t_min, t_max, scene.aabb_lo, scene.aabb_hi,
                            sort=BVH_SORT and not presorted, any_hit=True,
                        )
                else:
                    from ..ops.pallas_bvh import bvh_traverse_treelets

                    h, _, _, _, _ = bvh_traverse_treelets(
                        scene.bvh_rows, scene.tl_root, scene.tl_skip,
                        scene.tl_lo, scene.tl_hi, o, d, t_min, t_max,
                        scene.aabb_lo, scene.aabb_hi, any_hit=True,
                        sort=not presorted, slim=True,
                    )
                occ = h
            else:
                occ = bvh_any_hit(scene.bvh, o, d, t_min, t_max)
        elif _pallas_ok(static):
            from ..ops.pallas_intersect import brute_force_closest_hit

            h, _, _, _, _ = brute_force_closest_hit(
                scene.tri_p0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max
            )
            occ = h
        else:
            h, _, _, _, _ = isect.ray_brute_force_tris(
                o, d, scene.tri_p0, scene.tri_e1, scene.tri_e2, t_min, t_max
            )
            occ = h
    if static.n_spheres > 0:
        hs, _, _ = isect.ray_brute_force_spheres(
            o, d, scene.sph_center, scene.sph_radius, t_min, t_max
        )
        occ = occ | hs
    return occ


def wants_wavefront_sort(scene: Scene, static: SceneStatic) -> bool:
    """True when the integrator should keep its wavefront coherence-sorted
    itself (one multi-payload lax.sort per bounce) and call ray queries
    with presorted=True. This replaces the per-query sort+unsort inside
    the treelet traversal (argsort + gathers measured ~12-45 ms EACH at
    262k rays on v5e — the dominant cost of a naive per-query sort)."""
    # Measured on v5e (139k-tri bench scene, 262k rays): the 19-payload
    # wavefront sort costs ~100 ms and the treelet-first key inside the
    # traversal beats the wavefront key by more than the per-query sort
    # machinery costs once that machinery uses multi-payload lax.sort.
    # Internal per-query sorting therefore wins; keep the wavefront path
    # available for experiments but off by default.
    return False


def attenuated_transmittance(scene: Scene, static: SceneStatic, o, d, dist,
                             medium0, seed, pixel, sample, dim0,
                             active=None, max_crossings=4):
    """Transmittance along a shadow segment through chains of nested media
    (Scene::evalTransmittance / sampleAttenuatedEmitterDirect,
    scene.cpp:854-898): marches the segment through NULL-BSDF boundaries,
    switching the per-lane medium via the hit material's interior/exterior
    medium ids and accumulating each traversed medium's transmittance. Any
    non-null hit occludes (returns 0). Bounded at ``max_crossings``
    boundary crossings (the reference's while loop is unbounded; shadow
    chains deeper than this return 0 — conservative, never brightening).

    Returns (R, 3) transmittance; lanes with ``active`` False return 1.
    """
    from . import bsdf as bsdf_mod
    from . import medium as med_mod

    R = o.shape[0]
    dist = jnp.broadcast_to(jnp.asarray(dist, jnp.float32), (R,))
    mtypes = static.medium_types

    def step(i, carry):
        tr, t_ofs, med_id, alive = carry
        its = ray_intersect(scene, static, o, d, t_ofs + 1e-4, dist,
                            active=alive)
        seg_end = jnp.where(its.valid, its.t, dist)
        if mtypes:
            seg_tr = med_mod.eval_transmittance(
                scene.media, mtypes, med_id,
                o + t_ofs[..., None] * d, d,
                jnp.maximum(seg_end - t_ofs, 0.0),
                seed, pixel, sample, dim0 + 8 * i, alive,
            )
            tr = tr * jnp.where(alive[..., None], seg_tr, 1.0)
        mat = jnp.maximum(its.mat_id, 0)
        is_null = scene.materials.type[mat] == bsdf_mod.NULL
        blocked = alive & its.valid & ~is_null
        tr = jnp.where(blocked[..., None], 0.0, tr)
        # pass through the null boundary: switch medium by crossing side
        crossing = alive & its.valid & is_null
        entering = m.dot(d, its.gn) < 0
        interior = scene.materials.interior_medium[mat]
        exterior = scene.materials.exterior_medium[mat]
        med_id = jnp.where(
            crossing, jnp.where(entering, interior, exterior), med_id
        )
        t_ofs = jnp.where(crossing, its.t, t_ofs)
        return (tr, t_ofs, med_id, crossing)

    carry = (
        jnp.ones((R, 3)),
        jnp.zeros(R),
        jnp.broadcast_to(jnp.asarray(medium0, jnp.int32), (R,)),
        active if active is not None else jnp.ones(R, bool),
    )
    tr, _, _, still_crossing = jax.lax.fori_loop(
        0, max_crossings + 1, step, carry)
    # chains deeper than the bound: conservative occlusion (never brightens)
    return jnp.where(still_crossing[..., None], 0.0, tr)


def uv_footprint(scene: Scene, its: Interaction, spread):
    """Ray-cone texture footprint in uv units (the TPU-native analog of the
    reference's ray differentials, sensor.h:143-265 sampleRayDifferential +
    intersection dpdu/dpdv -> mipmap.h LOD).

    ``spread`` is the angular pixel size at the sensor (radians). A ray
    cone of diameter t*spread lands on the surface stretched by 1/cos
    theta; the triangle's uv density sqrt(area_uv/area_world) converts the
    world-space diameter to uv units. Returns (R,) — 0 on non-triangle or
    invalid lanes (-> finest level)."""
    T = scene.tri_p0.shape[0]
    ti = jnp.clip(its.prim_id, 0, max(T - 1, 0))
    atn = scene.tri_nee_attrs[ti]          # wide gathers: see field note
    ata = scene.tri_attrs[ti]
    e1, e2 = atn[..., 3:6], atn[..., 6:9]
    duv1 = ata[..., 11:13] - ata[..., 9:11]
    duv2 = ata[..., 13:15] - ata[..., 9:11]
    area_w = 0.5 * m.length(jnp.cross(e1, e2))
    area_uv = 0.5 * jnp.abs(
        duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    )
    density = jnp.sqrt(m.safe_div(area_uv, jnp.maximum(area_w, 1e-20)))
    cos_t = jnp.abs(m.dot(its.wi_world, its.gn))
    world_d = jnp.where(jnp.isfinite(its.t), its.t, 0.0) * spread
    # geometric mean of the minor (d) and major (d/cos) footprint axes
    fp = world_d * density / jnp.sqrt(jnp.clip(cos_t, 1e-2, 1.0))
    tri_lane = its.valid & (its.prim_id >= 0) & (its.prim_id < T)
    return jnp.where(tri_lane, fp, 0.0)


def uv_footprint_aniso(scene: Scene, its: Interaction, spread):
    """Anisotropic ray-cone footprint: (duv_minor (R, 2), duv_major (R, 2)).

    The EWA half of mipmap.h:861 — a ray cone of diameter t*spread hits the
    surface as an ellipse: minor axis = cone diameter (perpendicular to the
    in-plane ray direction), major axis = diameter / cos(theta) along it.
    Both axes are mapped world->uv exactly through the hit triangle's
    (e1, e2) -> (duv1, duv2) linear map (the dpdu/dpdv route of
    intersection.cpp), so anisotropy follows the actual parameterization.
    The minor length drives the MIP LOD; duv_major is the full uv-space
    major-axis vector for multi-tap anisotropic filtering."""
    T = scene.tri_p0.shape[0]
    ti = jnp.clip(its.prim_id, 0, max(T - 1, 0))
    atn = scene.tri_nee_attrs[ti]          # wide gathers: see field note
    ata = scene.tri_attrs[ti]
    e1, e2 = atn[..., 3:6], atn[..., 6:9]
    duv1 = ata[..., 11:13] - ata[..., 9:11]
    duv2 = ata[..., 13:15] - ata[..., 9:11]

    d = -its.wi_world                       # unit ray direction
    gn = its.gn
    cos_t = m.dot(d, gn)
    t_vec = d - cos_t[..., None] * gn       # in-plane stretch direction
    t_len = m.length(t_vec)
    fallback = m.normalize(jnp.cross(gn, e1))
    t_dir = jnp.where(
        (t_len > 1e-6)[..., None],
        t_vec / jnp.maximum(t_len, 1e-12)[..., None], fallback)
    cos_a = jnp.clip(jnp.abs(cos_t), 1e-2, 1.0)
    world_d = jnp.where(jnp.isfinite(its.t), its.t, 0.0) * spread
    minor_w = world_d[..., None] * jnp.cross(gn, t_dir)
    major_w = (world_d / cos_a)[..., None] * t_dir

    # solve dp = a e1 + b e2 (normal equations) -> duv = a duv1 + b duv2
    e11 = m.dot(e1, e1)
    e12 = m.dot(e1, e2)
    e22 = m.dot(e2, e2)
    det = jnp.maximum(e11 * e22 - e12 * e12, 1e-20)

    def to_uv(dp):
        p1 = m.dot(dp, e1)
        p2 = m.dot(dp, e2)
        a = (e22 * p1 - e12 * p2) / det
        b = (e11 * p2 - e12 * p1) / det
        return a[..., None] * duv1 + b[..., None] * duv2

    tri_lane = its.valid & (its.prim_id >= 0) & (its.prim_id < T)
    duv_minor = jnp.where(tri_lane[..., None], to_uv(minor_w), 0.0)
    duv_major = jnp.where(tri_lane[..., None], to_uv(major_w), 0.0)
    return duv_minor, duv_major


def eval_albedo(scene: Scene, its: Interaction, static: SceneStatic = None,
                fp_uv=None, duv_minor=None, duv_major=None):
    """Diffuse reflectance with texture lookup (Texture::eval path)."""
    mid = jnp.maximum(its.mat_id, 0)
    base = scene.materials.albedo[mid]
    if static is not None and not static.has_textures:
        return base
    tex_id = scene.materials.albedo_tex[mid]
    from .texture import eval_texture

    # sphere hits store prim_id = T + sphere_id with stale triangle
    # barycentrics; mark them -1 so bary-driven textures (wireframe/
    # vertexcolors/curvature) fall back to color0 instead of rendering an
    # unrelated triangle's attributes (advisor finding)
    prim = jnp.where(its.prim_id < scene.tri_p0.shape[0], its.prim_id, -1)
    taps = static.ewa_taps if static is not None else 0
    return eval_texture(scene.textures, tex_id, its.uv, base,
                        bary=its.bary, prim=prim, fp_uv=fp_uv, p=its.p,
                        duv_minor=duv_minor, duv_major=duv_major,
                        ewa_taps=taps)


def bsdf_locals(scene: Scene, its: Interaction,
                static: SceneStatic = None, fp_uv=None,
                duv_minor=None, duv_major=None) -> bsdf_mod.BsdfLocals:
    opacity = None
    blend = None
    # compile-time gated: an eval_texture call costs the FULL bitmap
    # gather chain for every lane even when all ids are -1, so only scenes
    # that actually texture opacity/blend pay for it (measured ~90 ms each
    # per bounce at 262k lanes on v5e)
    if static is None or (static.has_textures
                          and getattr(static, "has_opacity_tex", True)):
        from .texture import eval_texture

        mid = jnp.maximum(its.mat_id, 0)
        op_tex = scene.materials.opacity_tex[mid]
        ones3 = jnp.ones(its.uv.shape[:-1] + (3,))
        opacity = eval_texture(scene.textures, op_tex, its.uv, ones3)[..., 0]
    if static is None or (static.has_textures
                          and getattr(static, "has_weight_tex", True)):
        from .texture import eval_texture

        mid = jnp.maximum(its.mat_id, 0)
        w_tex = scene.materials.weight_tex[mid]
        ones3 = jnp.ones(its.uv.shape[:-1] + (3,))
        w_base = jnp.broadcast_to(
            scene.materials.weight[mid][..., None], ones3.shape
        )
        blend = eval_texture(scene.textures, w_tex, its.uv, w_base)[..., 0]
    bl = bsdf_mod.gather_locals(
        scene.materials, its.mat_id,
        albedo_override=eval_albedo(scene, its, static, fp_uv=fp_uv,
                                    duv_minor=duv_minor,
                                    duv_major=duv_major),
        opacity_override=opacity, blend_override=blend,
    )
    # irawan lanes: gather the yarn-segment parameters at this uv
    # (compile-time gated on the type set)
    if static is None or bsdf_mod.IRAWAN in static.bsdf_types:
        from . import irawan as irawan_mod

        mid = jnp.maximum(its.mat_id, 0)
        pid = scene.materials.irawan[mid]
        iw_par, iw_ks, iw_kd = irawan_mod.lane_params(
            scene.irawan, pid, its.uv)
        sel = (bl.type == bsdf_mod.IRAWAN)
        bl = bl._replace(
            iw_par=jnp.where(sel[..., None], iw_par, bl.iw_par),
            iw_ks=jnp.where(sel[..., None], iw_ks, bl.iw_ks),
            albedo=jnp.where(sel[..., None], iw_kd, bl.albedo),
        )
    return bl


def bsdf_nested(scene: Scene, its: Interaction, static: SceneStatic):
    """Nested-material locals for mixture/blend/mask/coating rows, or None
    when the scene has no nesting (compile-time gated)."""
    if not static.nested_bsdf_types:
        return None
    mid = jnp.maximum(its.mat_id, 0)
    mat_a = scene.materials.nested_a[mid]
    mat_b = scene.materials.nested_b[mid]

    def _locals_for(nid):
        nid_s = jnp.maximum(nid, 0)
        alb = scene.materials.albedo[nid_s]
        if static.has_textures:
            from .texture import eval_texture

            tex = scene.materials.albedo_tex[nid_s]
            alb = eval_texture(scene.textures, tex, its.uv, alb)
        return bsdf_mod.gather_locals(scene.materials, nid_s,
                                      albedo_override=alb)

    return (_locals_for(mat_a), _locals_for(mat_b), static.nested_bsdf_types)


def emitted_radiance(scene: Scene, static: SceneStatic, its: Interaction, d):
    """Radiance emitted by a hit surface toward -d (AreaEmitter::eval,
    area.cpp: only the front side emits)."""
    has = its.emitter_id >= 0
    e = jnp.maximum(its.emitter_id, 0)
    front = m.dot(its.gn, -d) > 0
    rad = scene.emitters.radiance[e]
    return jnp.where((has & front)[..., None], rad, 0.0)


def pdf_emitter_hit(scene: Scene, its: Interaction, ref_p,
                    static: SceneStatic = None):
    """Solid-angle NEE pdf of the point that a BSDF-sampled ray hit
    (Scene::pdfEmitterDirect, scene.cpp:949) — zero gathers thanks to the
    per-triangle area pdf carried on the interaction record. Analytic
    sphere emitters report the cone-sampling pdf instead (sphere.cpp
    pdfDirect; sample_direct SPHERE branch)."""
    pdf_area = its.nee_pdf_area
    to_hit = its.p - ref_p
    d2 = m.squared_length(to_hit)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    cos_l = jnp.abs(m.dot(its.gn, -to_hit / dist[..., None]))
    pdf = m.safe_div(pdf_area * d2, jnp.maximum(cos_l, 1e-7))
    if (static is not None and em_mod.SPHERE in static.emitter_types
            and static.n_spheres > 0):
        T = scene.tri_p0.shape[0]
        si = jnp.clip(its.prim_id - T, 0, static.n_spheres - 1)
        e_sph = scene.sph_emitter[si]
        is_sph_em = (its.prim_id >= T) & (e_sph >= 0)
        ei = jnp.maximum(e_sph, 0)
        pdf_cone = em_mod.pdf_direct_sphere(
            scene.emitters, ei, ref_p, scene.sph_center[si],
            scene.sph_radius[si])
        pdf = jnp.where(is_sph_em, pdf_cone, pdf)
    return pdf


# === host-side builder ====================================================

@dataclass
class _Mesh:
    verts: np.ndarray
    faces: np.ndarray
    mat: int
    emitter: int
    normals: Optional[np.ndarray] = None
    uvs: Optional[np.ndarray] = None
    vcolors: Optional[np.ndarray] = None  # (V, 3) vertexcolors.cpp attribute


@dataclass
class SceneBuilder:
    """Assemble a scene on the host, then compile to device arrays.

    Mirrors the role of the reference's XML -> Properties -> plugin
    instantiation pipeline (scenehandler.cpp) with a programmatic API
    (the XML front-end in mitsuba_tpu.io.mitsuba_xml drives this)."""

    meshes: list = field(default_factory=list)
    spheres: list = field(default_factory=list)
    mats: list = field(default_factory=list)
    emitters: list = field(default_factory=list)
    textures: list = field(default_factory=list)
    bitmaps: list = field(default_factory=list)
    media: list = field(default_factory=list)
    vol_grids: list = field(default_factory=list)
    ewa_taps: int = 0  # >1: N-tap anisotropic texture filtering (EWA role)

    # --- materials ---
    def add_material(
        self,
        type: int = bsdf_mod.DIFFUSE,
        albedo=(0.5, 0.5, 0.5),
        albedo_tex: int = -1,
        spec_refl=(1.0, 1.0, 1.0),
        spec_trans=(1.0, 1.0, 1.0),
        eta=(1.5046, 1.5046, 1.5046),
        k=(0.0, 0.0, 0.0),
        alpha=(0.1, 0.1),
        alpha_tex: int = -1,
        dist: int = 0,
        nonlinear: bool = False,
        twosided: bool = False,
        opacity_tex: int = -1,
        interior_medium: int = -1,
        exterior_medium: int = -1,
        nested_a: int = -1,
        nested_b: int = -1,
        weight: float = 0.5,
        weight_tex: int = -1,
        normal_tex: int = -1,
        bump_tex: int = -1,
        bump_scale: float = 1.0,
        hk_thickness: float = 1.0,
        hk_g: float = 0.0,
        subsurface: int = -1,
        cauchy_b: float = 0.0,
        irawan: int = -1,
    ) -> int:
        if np.isscalar(eta):
            eta = (float(eta),) * 3
        if np.isscalar(alpha):
            alpha = (float(alpha),) * 2
        self.mats.append(
            dict(
                type=type, albedo=tuple(albedo), albedo_tex=albedo_tex,
                spec_refl=tuple(spec_refl), spec_trans=tuple(spec_trans),
                eta=tuple(eta), k=tuple(k), alpha=tuple(alpha),
                alpha_tex=alpha_tex, dist=dist, nonlinear=nonlinear,
                twosided=twosided, opacity_tex=opacity_tex,
                interior_medium=interior_medium,
                exterior_medium=exterior_medium,
                nested_a=nested_a, nested_b=nested_b, weight=weight,
                weight_tex=weight_tex, normal_tex=normal_tex,
                bump_tex=bump_tex, bump_scale=bump_scale,
                hk_thickness=hk_thickness, hk_g=hk_g, subsurface=subsurface,
                cauchy_b=cauchy_b, irawan=irawan,
            )
        )
        return len(self.mats) - 1

    # --- woven cloth (src/bsdfs/irawan.cpp parity) ---
    def add_irawan_pattern(self, preset: str = "plain", filename: str = "",
                           kd=(0.3, 0.3, 0.3), ks=(0.4, 0.4, 0.4),
                           repeat_u: float = 10.0,
                           repeat_v: float = 10.0) -> int:
        """Register a weave pattern (built-in preset or a reference-format
        ``.cloth`` file); reference it from add_material(type=B.IRAWAN,
        irawan=id)."""
        from . import irawan as irawan_mod
        if not hasattr(self, "_irawan"):
            self._irawan = []
        if filename:
            pd = irawan_mod.load_cloth(filename)
        else:
            pd = irawan_mod.preset(preset, kd=kd, ks=ks)
        self._irawan.append((pd, (float(repeat_u), float(repeat_v))))
        return len(self._irawan) - 1

    def _build_irawan(self):
        from . import irawan as irawan_mod
        pats = getattr(self, "_irawan", [])
        if not pats:
            return irawan_mod.IrawanTable.empty()
        return irawan_mod.build_table([p for p, _ in pats],
                                      [r for _, r in pats])

    # --- subsurface (src/subsurface/dipole.cpp parity) ---
    def add_subsurface(self, sigma_s=(1.0,) * 3, sigma_a=(0.05,) * 3,
                       g: float = 0.0, eta: float = 1.3,
                       mode: int = 0) -> int:
        """Register a subsurface profile; reference it from
        add_material(subsurface=id). mode 0 = dipole BSSRDF (call
        mitsuba_tpu.render.subsurface.prepare(scene, static) once after
        build() to sample the irradiance point cloud); mode 1 = exact
        refracted single scattering (singlescatter.cpp), no preparation
        needed."""
        if not hasattr(self, "_subsurfaces"):
            self._subsurfaces = []
        self._subsurfaces.append(dict(
            sigma_s=tuple(np.asarray(sigma_s, float)),
            sigma_a=tuple(np.asarray(sigma_a, float)),
            g=float(g), eta=float(eta), mode=int(mode)))
        return len(self._subsurfaces) - 1

    def _build_sss(self):
        from .subsurface import SSSTable
        t = SSSTable.empty(len(self.mats))
        t = t._replace(mat_sss=jnp.asarray(
            [mm.get("subsurface", -1) for mm in self.mats], jnp.int32))
        subs = getattr(self, "_subsurfaces", [])
        if subs:
            t = t._replace(
                sigma_s=jnp.asarray([s["sigma_s"] for s in subs], jnp.float32),
                sigma_a=jnp.asarray([s["sigma_a"] for s in subs], jnp.float32),
                g=jnp.asarray([s["g"] for s in subs], jnp.float32),
                eta=jnp.asarray([s["eta"] for s in subs], jnp.float32),
                mode=jnp.asarray([s.get("mode", 0) for s in subs], jnp.int32),
            )
        return t

    # --- media (src/medium, src/volume parity) ---
    @staticmethod
    def _phase_kw(phase_type, phase_g, kw):
        """Collect the full per-medium phase parameter set (src/phase/*)."""
        import numpy as _np
        return dict(
            phase_type=phase_type, phase_g=phase_g,
            phase_g2=kw.get("phase_g2", 0.0),
            phase_w2=kw.get("phase_w2", 0.0),
            phase_ks=kw.get("phase_ks", 0.0),
            phase_exp=kw.get("phase_exp", 4.0),
            phase_sigma=kw.get("phase_sigma", 0.3),
            phase_axis=tuple(_np.asarray(kw.get("phase_axis", (0, 0, 1)),
                                         float)),
        )

    def add_medium_homogeneous(self, sigma_s=(1.0,) * 3, sigma_a=(0.1,) * 3,
                               phase_type: int = 0, phase_g: float = 0.0,
                               scale: float = 1.0, **phase_kw) -> int:
        import numpy as _np
        sigma_s = _np.asarray(sigma_s, float)
        sigma_a = _np.asarray(sigma_a, float)
        sigma_t = sigma_s + sigma_a
        albedo = _np.divide(sigma_s, _np.maximum(sigma_t, 1e-20))
        from .medium import HOMOGENEOUS
        self.media.append(dict(
            type=HOMOGENEOUS, sigma_t=tuple(sigma_t), albedo=tuple(albedo),
            scale=scale, grid=-1, world_to_grid=_np.eye(4),
            **self._phase_kw(phase_type, phase_g, phase_kw),
        ))
        return len(self.media) - 1

    def add_medium_heterogeneous(self, density_grid, sigma_t=(1.0,) * 3,
                                 albedo=(0.8,) * 3, phase_type: int = 0,
                                 phase_g: float = 0.0, scale: float = 1.0,
                                 world_to_grid=None, **phase_kw) -> int:
        import numpy as _np
        from .medium import HETEROGENEOUS
        g = _np.asarray(density_grid, _np.float32)
        self.vol_grids.append(g)
        self.media.append(dict(
            type=HETEROGENEOUS, sigma_t=tuple(_np.asarray(sigma_t, float)),
            albedo=tuple(_np.asarray(albedo, float)),
            scale=scale, grid=len(self.vol_grids) - 1,
            world_to_grid=(_np.eye(4) if world_to_grid is None
                           else _np.asarray(world_to_grid, float)),
            **self._phase_kw(phase_type, phase_g, phase_kw),
        ))
        return len(self.media) - 1

    def _build_media(self) -> MediumTable:
        import numpy as _np
        if not self.media:
            return MediumTable.empty()
        K = len(self.media)
        if self.vol_grids:
            Dm = max(g.shape[0] for g in self.vol_grids)
            Hm = max(g.shape[1] for g in self.vol_grids)
            Wm = max(g.shape[2] for g in self.vol_grids)
            stack = _np.zeros((len(self.vol_grids), Dm, Hm, Wm), _np.float32)
            sizes = _np.zeros((len(self.vol_grids), 3), _np.int32)
            for i, g in enumerate(self.vol_grids):
                stack[i, :g.shape[0], :g.shape[1], :g.shape[2]] = g
                sizes[i] = g.shape
        else:
            stack = _np.zeros((1, 1, 1, 1), _np.float32)
            sizes = _np.ones((1, 3), _np.int32)
        maj = []
        for mm in self.media:
            smax = max(mm["sigma_t"]) * mm["scale"]
            if mm["grid"] >= 0:
                smax = float(_np.mean(mm["sigma_t"])) * mm["scale"] *                     float(self.vol_grids[mm["grid"]].max())
            maj.append(max(smax, 1e-9))

        # per-supercell raw-density majorants, dilated by one voxel
        # (hgridvolume.cpp:216 role; see medium.SUPER_RES tracking)
        from .medium import SUPER_RES as _S
        if self.vol_grids:
            super_maj = _np.zeros(
                (len(self.vol_grids), _S, _S, _S), _np.float32)
            for i, g in enumerate(self.vol_grids):
                D_, H_, W_ = g.shape
                for cz in range(_S):
                    z0 = max(int(_np.floor(cz / _S * (D_ - 1))) - 1, 0)
                    z1 = min(int(_np.ceil((cz + 1) / _S * (D_ - 1))) + 1,
                             D_ - 1)
                    for cy in range(_S):
                        y0 = max(int(_np.floor(cy / _S * (H_ - 1))) - 1, 0)
                        y1 = min(int(_np.ceil((cy + 1) / _S * (H_ - 1))) + 1,
                                 H_ - 1)
                        for cx in range(_S):
                            x0 = max(int(_np.floor(cx / _S * (W_ - 1))) - 1, 0)
                            x1 = min(
                                int(_np.ceil((cx + 1) / _S * (W_ - 1))) + 1,
                                W_ - 1)
                            super_maj[i, cz, cy, cx] = g[
                                z0:z1 + 1, y0:y1 + 1, x0:x1 + 1].max()
        else:
            super_maj = _np.ones((1, 1, 1, 1), _np.float32)
        return MediumTable(
            type=jnp.asarray([mm["type"] for mm in self.media], jnp.int32),
            sigma_t=jnp.asarray([mm["sigma_t"] for mm in self.media], jnp.float32),
            albedo=jnp.asarray([mm["albedo"] for mm in self.media], jnp.float32),
            phase_type=jnp.asarray([mm["phase_type"] for mm in self.media], jnp.int32),
            phase_g=jnp.asarray([mm["phase_g"] for mm in self.media], jnp.float32),
            phase_g2=jnp.asarray([mm["phase_g2"] for mm in self.media], jnp.float32),
            phase_w2=jnp.asarray([mm["phase_w2"] for mm in self.media], jnp.float32),
            phase_ks=jnp.asarray([mm["phase_ks"] for mm in self.media], jnp.float32),
            phase_exp=jnp.asarray([mm["phase_exp"] for mm in self.media], jnp.float32),
            phase_sigma=jnp.asarray([mm["phase_sigma"] for mm in self.media], jnp.float32),
            phase_axis=jnp.asarray([mm["phase_axis"] for mm in self.media], jnp.float32),
            scale=jnp.asarray([mm["scale"] for mm in self.media], jnp.float32),
            grid_idx=jnp.asarray([mm["grid"] for mm in self.media], jnp.int32),
            grids=jnp.asarray(stack),
            grid_size=jnp.asarray(sizes),
            world_to_grid=jnp.asarray(
                _np.stack([mm["world_to_grid"] for mm in self.media]), jnp.float32),
            majorant=jnp.asarray(maj, jnp.float32),
            super_maj=jnp.asarray(super_maj),
        )

    # --- textures ---
    def add_texture_constant(self, value) -> int:
        from .texture import TEX_CONSTANT

        self.textures.append(
            dict(type=TEX_CONSTANT, color0=tuple(value), color1=(0, 0, 0),
                 uv_scale=(1, 1), uv_offset=(0, 0), line_width=0.01,
                 scale=(1, 1, 1), bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_checkerboard(self, color0=(0.4,) * 3, color1=(0.2,) * 3,
                                 uv_scale=(1.0, 1.0), uv_offset=(0.0, 0.0),
                                 scale=(1.0, 1.0, 1.0)) -> int:
        from .texture import TEX_CHECKERBOARD

        self.textures.append(
            dict(type=TEX_CHECKERBOARD, color0=tuple(color0), color1=tuple(color1),
                 uv_scale=tuple(uv_scale), uv_offset=tuple(uv_offset),
                 line_width=0.01, scale=tuple(scale), bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_grid(self, color0=(0.2,) * 3, color1=(0.4,) * 3,
                         line_width=0.01, uv_scale=(1.0, 1.0),
                         uv_offset=(0.0, 0.0)) -> int:
        from .texture import TEX_GRID

        self.textures.append(
            dict(type=TEX_GRID, color0=tuple(color0), color1=tuple(color1),
                 uv_scale=tuple(uv_scale), uv_offset=tuple(uv_offset),
                 line_width=line_width, scale=(1, 1, 1), bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_bitmap(self, image: np.ndarray, uv_scale=(1.0, 1.0),
                           uv_offset=(0.0, 0.0), scale=(1.0, 1.0, 1.0)) -> int:
        from .texture import TEX_BITMAP

        img = np.asarray(image, dtype=np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        self.bitmaps.append(img)
        self.textures.append(
            dict(type=TEX_BITMAP, color0=(0, 0, 0), color1=(0, 0, 0),
                 uv_scale=tuple(uv_scale), uv_offset=tuple(uv_offset),
                 line_width=0.01, scale=tuple(scale),
                 bitmap=len(self.bitmaps) - 1)
        )
        return len(self.textures) - 1

    def add_texture_wireframe(self, interior=(0.5,) * 3, edge=(0.1,) * 3,
                              line_width=0.05) -> int:
        """wireframe.cpp: triangle edges in edge color (barycentric width)."""
        from .texture import TEX_WIREFRAME

        self.textures.append(
            dict(type=TEX_WIREFRAME, color0=tuple(interior), color1=tuple(edge),
                 uv_scale=(1, 1), uv_offset=(0, 0), line_width=line_width,
                 scale=(1, 1, 1), bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_vertexcolors(self) -> int:
        """vertexcolors.cpp: interpolate add_mesh(vertex_colors=...)."""
        from .texture import TEX_VERTEXCOLORS

        self.textures.append(
            dict(type=TEX_VERTEXCOLORS, color0=(0, 0, 0), color1=(0, 0, 0),
                 uv_scale=(1, 1), uv_offset=(0, 0), line_width=0.01,
                 scale=(1, 1, 1), bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_curvature(self, curv_scale: float = 1.0) -> int:
        """curvature.cpp: signed mean curvature (baked per-vertex at build
        time), shown on a diverging red(+)/blue(-) map."""
        from .texture import TEX_CURVATURE

        self.textures.append(
            dict(type=TEX_CURVATURE, color0=(0, 0, 0), color1=(0, 0, 0),
                 uv_scale=(1, 1), uv_offset=(0, 0), line_width=0.01,
                 scale=(curv_scale,) * 3, bitmap=-1)
        )
        return len(self.textures) - 1

    def add_texture_noise(self, color0=(0.2,) * 3, color1=(0.8,) * 3,
                          frequency: float = 4.0) -> int:
        """Perlin-fbm noise over the hit position (libcore noise.cpp:7
        role): lerp(color0, color1, fbm(freq * p))."""
        from .texture import TEX_NOISE

        self.textures.append(dict(
            type=TEX_NOISE, color0=tuple(color0), color1=tuple(color1),
            uv_scale=(float(frequency), float(frequency)),
            uv_offset=(0.0, 0.0), line_width=4.0, scale=(1.0,) * 3,
            bitmap=-1,
        ))
        return len(self.textures) - 1

    def add_texture_scale(self, nested: int, value) -> int:
        """scale.cpp: multiply a nested texture by a constant factor
        (folded into the value multiplier at build time)."""
        src = dict(self.textures[nested])
        v = np.asarray(value, float) * np.ones(3)
        src["scale"] = tuple(np.asarray(src["scale"], float) * v)
        self.textures.append(src)
        return len(self.textures) - 1

    # --- geometry ---
    def add_mesh(self, verts, faces, mat: int, emitter_radiance=None,
                 normals=None, uvs=None, vertex_colors=None) -> None:
        verts = np.asarray(verts, dtype=np.float64)
        faces = np.asarray(faces, dtype=np.int64)
        em = -1
        if emitter_radiance is not None:
            em = self._add_area_emitter(tuple(np.asarray(emitter_radiance, dtype=float)))
        self.meshes.append(_Mesh(verts, faces, mat, em, normals, uvs,
                                 vertex_colors))

    # --- instancing (shapegroup.cpp + instance.cpp) ---
    def add_shapegroup(self, parts) -> int:
        """Register a reusable geometry group: ``parts`` is a list of dicts
        with keys verts/faces/mat (+ optional normals/uvs). Instances are
        flattened into the global BVH at build time — the TPU-friendly
        single-level layout (the reference nests a kd-tree per group)."""
        if not hasattr(self, "_shapegroups"):
            self._shapegroups = []
        self._shapegroups.append(list(parts))
        return len(self._shapegroups) - 1

    def add_instance(self, group: int, to_world=None) -> None:
        """instance.cpp: replicate a shapegroup under a rigid transform."""
        from ..core.transform import Transform as _T
        t = to_world if to_world is not None else _T.identity()
        for part in self._shapegroups[group]:
            v = np.asarray(part["verts"], np.float64)
            n = part.get("normals")
            self.add_mesh(
                t.apply_point(v), part["faces"], part["mat"],
                normals=(t.apply_normal(np.asarray(n, np.float64))
                         if n is not None else None),
                uvs=part.get("uvs"),
            )

    def add_sphere(self, center, radius, mat: int, emitter_radiance=None) -> None:
        if emitter_radiance is not None:
            # Analytic sphere emitter with solid-angle cone NEE
            # (sphere.cpp sampleDirect) — strictly lower variance than the
            # round-2 tessellated-area-CDF fallback: every cone direction
            # hits the sphere, and no silhouette triangles are wasted.
            e = len(self.emitters)
            self.emitters.append(dict(
                type=em_mod.SPHERE, radiance=tuple(emitter_radiance),
                position=tuple(np.asarray(center, float)),
                spot_cos=(float(radius), 0.0),
            ))
            self.spheres.append(
                (np.asarray(center, float), float(radius), mat, e))
            return
        self.spheres.append((np.asarray(center, float), float(radius), mat, -1))

    # --- emitters ---
    def _add_area_emitter(self, radiance) -> int:
        self.emitters.append(dict(type=em_mod.AREA, radiance=radiance))
        return len(self.emitters) - 1

    def add_point_light(self, position, intensity) -> int:
        self.emitters.append(
            dict(type=em_mod.POINT, radiance=tuple(intensity), position=tuple(position))
        )
        return len(self.emitters) - 1

    def add_spot_light(self, position, direction, intensity,
                       cutoff_deg=20.0, beamwidth_deg=None) -> int:
        if beamwidth_deg is None:
            beamwidth_deg = cutoff_deg * 0.75
        d = np.asarray(direction, float)
        d = d / np.linalg.norm(d)
        self.emitters.append(
            dict(type=em_mod.SPOT, radiance=tuple(intensity),
                 position=tuple(position), direction=tuple(d),
                 spot_cos=(float(np.cos(np.deg2rad(cutoff_deg))),
                           float(np.cos(np.deg2rad(beamwidth_deg)))))
        )
        return len(self.emitters) - 1

    def add_directional_light(self, direction, irradiance) -> int:
        d = np.asarray(direction, float)
        d = d / np.linalg.norm(d)
        self.emitters.append(
            dict(type=em_mod.DIRECTIONAL, radiance=tuple(irradiance), direction=tuple(d))
        )
        return len(self.emitters) - 1

    def add_collimated_beam(self, position, direction, power) -> int:
        """collimated.cpp: zero-radius beam. Contributes only through
        light-tracing (sample_ray); NEE/hit queries never see it."""
        d = np.asarray(direction, float)
        d = d / np.linalg.norm(d)
        self.emitters.append(
            dict(type=em_mod.COLLIMATED, radiance=tuple(power),
                 position=tuple(position), direction=tuple(d))
        )
        return len(self.emitters) - 1

    def add_constant_emitter(self, radiance) -> int:
        self.emitters.append(dict(type=em_mod.CONSTANT, radiance=tuple(radiance)))
        return len(self.emitters) - 1

    def add_envmap(self, image: np.ndarray, to_world=None, scale: float = 1.0) -> int:
        self.emitters.append(
            dict(type=em_mod.ENVMAP, radiance=(1.0, 1.0, 1.0),
                 env_map=np.asarray(image, np.float32),
                 env_to_world=(np.eye(3) if to_world is None else np.asarray(to_world)),
                 env_scale=float(scale))
        )
        return len(self.emitters) - 1

    # --- compile ---
    def build(self):
        if not self.mats:
            self.add_material()
        # concatenate meshes
        P0, E1, E2, N0, N1, N2, UV0, UV1, UV2, GN, MAT, EM, AREA_ = (
            [], [], [], [], [], [], [], [], [], [], [], [], []
        )
        from .texture import TEX_CURVATURE, TEX_VERTEXCOLORS, bake_vertex_curvature
        ttypes = {t["type"] for t in self.textures}
        want_corners = bool(ttypes & {TEX_CURVATURE, TEX_VERTEXCOLORS})
        C0, C1, C2 = [], [], []
        for mesh in self.meshes:
            v, f = mesh.verts, mesh.faces
            p0 = v[f[:, 0]]
            p1 = v[f[:, 1]]
            p2 = v[f[:, 2]]
            e1 = p1 - p0
            e2 = p2 - p0
            gn = np.cross(e1, e2)
            area2 = np.linalg.norm(gn, axis=1)
            area = 0.5 * area2
            gn = gn / np.maximum(area2[:, None], 1e-20)
            if mesh.normals is not None:
                n = np.asarray(mesh.normals, dtype=np.float64)
                n0, n1, n2 = n[f[:, 0]], n[f[:, 1]], n[f[:, 2]]
            else:
                n0 = n1 = n2 = gn
            if mesh.uvs is not None:
                uv = np.asarray(mesh.uvs, dtype=np.float64)
                uv0, uv1, uv2 = uv[f[:, 0]], uv[f[:, 1]], uv[f[:, 2]]
            else:
                uv0 = uv1 = uv2 = np.zeros((len(f), 2))
            if want_corners:
                if mesh.vcolors is not None:
                    c = np.asarray(mesh.vcolors, np.float64)
                elif TEX_CURVATURE in ttypes:
                    vn = (np.asarray(mesh.normals, np.float64)
                          if mesh.normals is not None else None)
                    if vn is None:
                        vn = np.zeros_like(v)
                        np.add.at(vn, f[:, 0], gn)
                        np.add.at(vn, f[:, 1], gn)
                        np.add.at(vn, f[:, 2], gn)
                        vn /= np.maximum(
                            np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
                    k = bake_vertex_curvature(v, f, vn)
                    c = np.stack([k, np.zeros_like(k), np.zeros_like(k)], -1)
                else:
                    c = np.zeros_like(v)
                C0.append(c[f[:, 0]]); C1.append(c[f[:, 1]]); C2.append(c[f[:, 2]])
            P0.append(p0); E1.append(e1); E2.append(e2)
            N0.append(n0); N1.append(n1); N2.append(n2)
            UV0.append(uv0); UV1.append(uv1); UV2.append(uv2)
            GN.append(gn)
            MAT.append(np.full(len(f), mesh.mat, np.int32))
            EM.append(np.full(len(f), mesh.emitter, np.int32))
            AREA_.append(area)

        if P0:
            tp0 = np.concatenate(P0); te1 = np.concatenate(E1); te2 = np.concatenate(E2)
            tn0 = np.concatenate(N0); tn1 = np.concatenate(N1); tn2 = np.concatenate(N2)
            tuv0 = np.concatenate(UV0); tuv1 = np.concatenate(UV1); tuv2 = np.concatenate(UV2)
            tgn = np.concatenate(GN)
            tmat = np.concatenate(MAT); tem = np.concatenate(EM)
            tarea = np.concatenate(AREA_)
        else:
            tp0 = np.zeros((1, 3)); te1 = np.zeros((1, 3)); te2 = np.zeros((1, 3))
            te1[0, 0] = 1e-9; te2[0, 1] = 1e-9
            tn0 = tn1 = tn2 = np.array([[0, 0, 1.0]])
            tuv0 = tuv1 = tuv2 = np.zeros((1, 2))
            tgn = np.array([[0, 0, 1.0]])
            tmat = np.zeros(1, np.int32); tem = np.full(1, -1, np.int32)
            tarea = np.zeros(1)
        T = len(tp0) if P0 else 0

        # emitter table + NEE pdfs
        E = max(len(self.emitters), 1)
        etype = np.zeros(E, np.int32)
        erad = np.zeros((E, 3), np.float32)
        epos = np.zeros((E, 3), np.float32)
        edir = np.tile(np.array([[0, 0, -1.0]], np.float32), (E, 1))
        espot = np.tile(np.array([[0.0, 1.0]], np.float32), (E, 1))
        estart = np.zeros(E, np.int32)
        ecount = np.zeros(E, np.int32)
        edelta = np.zeros(E, bool)
        env_index = -1
        env_fields = None
        for i, e in enumerate(self.emitters):
            etype[i] = e["type"]
            erad[i] = np.asarray(e["radiance"], np.float32)
            if "position" in e:
                epos[i] = e["position"]
            if "direction" in e:
                edir[i] = e["direction"]
            if "spot_cos" in e:
                espot[i] = e["spot_cos"]
            edelta[i] = e["type"] in (em_mod.POINT, em_mod.SPOT, em_mod.DIRECTIONAL)
            if e["type"] in (em_mod.CONSTANT, em_mod.ENVMAP):
                env_index = i
            if e["type"] == em_mod.ENVMAP:
                env_fields = _build_envmap(e)

        n_emitters = len(self.emitters)
        pmf = np.full(E, 1.0 / max(n_emitters, 1), np.float32)
        if n_emitters == 0:
            pmf[:] = 0.0
        cdf = np.cumsum(pmf).astype(np.float32)
        if n_emitters:
            cdf[-1] = 1.0

        # emissive triangles, grouped by emitter, area-weighted local cdf
        etri_tri_l, etri_cdf_l = [], []
        tri_nee = np.zeros(max(T, 1), np.float32)
        for i, e in enumerate(self.emitters):
            if e["type"] != em_mod.AREA:
                continue
            sel = np.nonzero(tem == i)[0]
            estart[i] = len(etri_tri_l)
            ecount[i] = len(sel)
            if len(sel) == 0:
                continue
            a = tarea[sel]
            local_pmf = a / a.sum()
            local_cdf = np.cumsum(local_pmf)
            local_cdf[-1] = 1.0
            etri_tri_l.extend(sel.tolist())
            etri_cdf_l.extend((i + local_cdf).tolist())
            # dense per-triangle NEE area pdf (folds emitter pmf in)
            tri_nee[sel] = pmf[i] * local_pmf / np.maximum(a, 1e-20)

        etri_tri = np.asarray(etri_tri_l or [0], np.int32)
        etri_cdf = np.asarray(etri_cdf_l or [np.inf], np.float32)

        env = env_fields or {
            k: np.asarray(v) for k, v in
            ((k, v) for k, v in em_mod.EmitterTable.empty_env_fields().items())
        }

        emitters = em_mod.EmitterTable(
            type=jnp.asarray(etype), radiance=jnp.asarray(erad),
            position=jnp.asarray(epos), direction=jnp.asarray(edir),
            spot_cos=jnp.asarray(espot), tri_start=jnp.asarray(estart),
            tri_count=jnp.asarray(ecount), delta=jnp.asarray(edelta),
            pmf=jnp.asarray(pmf), cdf=jnp.asarray(cdf),
            etri_tri=jnp.asarray(etri_tri), etri_cdf=jnp.asarray(etri_cdf),
            env_index=jnp.asarray(env_index, jnp.int32),
            env_map=jnp.asarray(env["env_map"]),
            env_alias=jnp.asarray(env["env_alias"]),
            env_hw=jnp.asarray(env["env_hw"], jnp.int32),
            env_to_world=jnp.asarray(env["env_to_world"]),
            env_scale=jnp.asarray(env["env_scale"]),
        )

        # material table
        Mn = len(self.mats)
        # rough-transmittance polynomial bake (rtrans.h / rdielprec role):
        # roughplastic + roughcoating rows get fitted T(cos) + internal
        # diffuse reflectance; others carry zeros (never evaluated)
        from ..core import rtrans as rtrans_mod

        rt_coef = np.zeros((Mn, rtrans_mod.RT_DEG), np.float32)
        rt_fdr = np.zeros(Mn, np.float32)
        for i, mm in enumerate(self.mats):
            if mm["type"] in (bsdf_mod.ROUGH_PLASTIC, bsdf_mod.ROUGHCOATING):
                a = float(mm["alpha"][0])
                e = float(mm["eta"][0])
                d = int(mm["dist"])
                rt_coef[i], _ = rtrans_mod.fit_poly(d, a, e)
                rt_fdr[i] = 1.0 - rtrans_mod.diffuse_transmittance(
                    d, a, 1.0 / e)
        materials = bsdf_mod.MaterialTable(
            type=jnp.asarray([mm["type"] for mm in self.mats], jnp.int32),
            dist=jnp.asarray([mm["dist"] for mm in self.mats], jnp.int32),
            albedo=jnp.asarray([mm["albedo"] for mm in self.mats], jnp.float32),
            albedo_tex=jnp.asarray([mm["albedo_tex"] for mm in self.mats], jnp.int32),
            spec_refl=jnp.asarray([mm["spec_refl"] for mm in self.mats], jnp.float32),
            spec_trans=jnp.asarray([mm["spec_trans"] for mm in self.mats], jnp.float32),
            eta=jnp.asarray([mm["eta"] for mm in self.mats], jnp.float32),
            k=jnp.asarray([mm["k"] for mm in self.mats], jnp.float32),
            alpha=jnp.asarray([mm["alpha"] for mm in self.mats], jnp.float32),
            alpha_tex=jnp.asarray([mm["alpha_tex"] for mm in self.mats], jnp.int32),
            nonlinear=jnp.asarray([mm["nonlinear"] for mm in self.mats], bool),
            twosided=jnp.asarray([mm["twosided"] for mm in self.mats], bool),
            opacity_tex=jnp.asarray([mm["opacity_tex"] for mm in self.mats], jnp.int32),
            interior_medium=jnp.asarray(
                [mm.get("interior_medium", -1) for mm in self.mats], jnp.int32),
            exterior_medium=jnp.asarray(
                [mm.get("exterior_medium", -1) for mm in self.mats], jnp.int32),
            nested_a=jnp.asarray([mm.get("nested_a", -1) for mm in self.mats], jnp.int32),
            nested_b=jnp.asarray([mm.get("nested_b", -1) for mm in self.mats], jnp.int32),
            weight=jnp.asarray([mm.get("weight", 0.5) for mm in self.mats], jnp.float32),
            weight_tex=jnp.asarray([mm.get("weight_tex", -1) for mm in self.mats], jnp.int32),
            normal_tex=jnp.asarray([mm.get("normal_tex", -1) for mm in self.mats], jnp.int32),
            bump_tex=jnp.asarray([mm.get("bump_tex", -1) for mm in self.mats], jnp.int32),
            bump_scale=jnp.asarray([mm.get("bump_scale", 1.0) for mm in self.mats], jnp.float32),
            hk_thickness=jnp.asarray([mm.get("hk_thickness", 1.0) for mm in self.mats], jnp.float32),
            hk_g=jnp.asarray([mm.get("hk_g", 0.0) for mm in self.mats], jnp.float32),
            cauchy_b=jnp.asarray([mm.get("cauchy_b", 0.0) for mm in self.mats], jnp.float32),
            rt_coef=jnp.asarray(rt_coef),
            rt_fdr=jnp.asarray(rt_fdr),
            irawan=jnp.asarray(
                [mm.get("irawan", -1) for mm in self.mats], jnp.int32),
        )

        corners = None
        if want_corners and C0:
            corners = (np.concatenate(C0), np.concatenate(C1),
                       np.concatenate(C2))
        textures = self._build_textures(corners)

        # spheres
        S = len(self.spheres)
        if S:
            sc = np.stack([s[0] for s in self.spheres]).astype(np.float32)
            sr = np.array([s[1] for s in self.spheres], np.float32)
            sm = np.array([s[2] for s in self.spheres], np.int32)
            se = np.array([s[3] for s in self.spheres], np.int32)
        else:
            sc = np.zeros((1, 3), np.float32)
            sr = np.zeros(1, np.float32)
            sm = np.zeros(1, np.int32)
            se = np.full(1, -1, np.int32)

        # BVH (only if worthwhile)
        use_bvh = T > BRUTE_FORCE_MAX_TRIS
        bvh_rows = np.zeros((1, 128), np.float32)
        bvh_pages = np.zeros((16, 128), np.float32)
        n_bvh_nodes = 0
        tl_root = np.zeros(1, np.int32)
        tl_skip = np.ones(1, np.int32)
        tl_lo = np.zeros((1, 3), np.float32)
        tl_hi = np.zeros((1, 3), np.float32)
        if T > 0:
            lo, hi = triangle_aabbs(tp0, tp0 + te1, tp0 + te2)
            if use_bvh:
                # leaf_size-1 tree + slot-packed slim rows: one box OR one
                # triangle test per visited node (ops/pallas_bvh.py slim
                # layout — measured faster on incoherent bounce rays and
                # 4x smaller than fat rows)
                host_bvh = build_bvh(lo, hi, leaf_size=1)
                from ..accel.build import treelet_roots
                from ..ops.pallas_bvh import pack_nodes_slim, pack_pages

                bvh_rows = pack_nodes_slim(
                    host_bvh, tp0.astype(np.float32), te1.astype(np.float32),
                    te2.astype(np.float32),
                )
                bvh_pages = pack_pages(
                    host_bvh, tp0.astype(np.float32), te1.astype(np.float32),
                    te2.astype(np.float32),
                )
                n_bvh_nodes = len(host_bvh.lo)
                roots = treelet_roots(host_bvh, max_nodes=4096)
                tl_root = roots
                tl_skip = host_bvh.skip[roots].astype(np.int32)
                tl_lo = host_bvh.lo[roots]
                tl_hi = host_bvh.hi[roots]
            else:
                host_bvh = build_bvh(lo, hi, leaf_size=max(T, 1))
            bvh = DeviceBVH.from_host(
                host_bvh,
                tp0.astype(np.float32), te1.astype(np.float32), te2.astype(np.float32),
            )
            scene_lo = lo.min(axis=0)
            scene_hi = hi.max(axis=0)
        else:
            host_bvh = build_bvh(np.zeros((1, 3)), np.ones((1, 3)) * 1e-9)
            bvh = DeviceBVH.from_host(
                host_bvh, tp0.astype(np.float32), te1.astype(np.float32),
                te2.astype(np.float32),
            )
            scene_lo = np.zeros(3)
            scene_hi = np.ones(3)
        if S:
            scene_lo = np.minimum(scene_lo, (sc - sr[:, None]).min(axis=0))
            scene_hi = np.maximum(scene_hi, (sc + sr[:, None]).max(axis=0))
        radius = 0.5 * float(np.linalg.norm(scene_hi - scene_lo)) + 1e-3

        scene = Scene(
            tri_p0=jnp.asarray(tp0, jnp.float32),
            tri_e1=jnp.asarray(te1, jnp.float32),
            tri_e2=jnp.asarray(te2, jnp.float32),
            tri_n0=jnp.asarray(tn0, jnp.float32),
            tri_n1=jnp.asarray(tn1, jnp.float32),
            tri_n2=jnp.asarray(tn2, jnp.float32),
            tri_uv0=jnp.asarray(tuv0, jnp.float32),
            tri_uv1=jnp.asarray(tuv1, jnp.float32),
            tri_uv2=jnp.asarray(tuv2, jnp.float32),
            tri_gn=jnp.asarray(tgn, jnp.float32),
            tri_mat=jnp.asarray(tmat),
            tri_emitter=jnp.asarray(tem),
            tri_nee_pdf_area=jnp.asarray(tri_nee),
            tri_attrs=jnp.asarray(np.concatenate([
                tn0, tn1, tn2, tuv0, tuv1, tuv2, tgn,
                np.asarray(tmat, np.float64)[:, None],
                np.asarray(tem, np.float64)[:, None],
                np.asarray(tri_nee, np.float64)[:, None],
            ], axis=1), jnp.float32),
            tri_nee_attrs=jnp.asarray(np.concatenate([
                tp0, te1, te2, tgn,
                np.asarray(tri_nee, np.float64)[:, None],
            ], axis=1), jnp.float32),
            sph_center=jnp.asarray(sc),
            sph_radius=jnp.asarray(sr),
            sph_mat=jnp.asarray(sm),
            sph_emitter=jnp.asarray(se),
            bvh=bvh,
            bvh_rows=jnp.asarray(bvh_rows),
            bvh_pages=jnp.asarray(bvh_pages),
            tl_root=jnp.asarray(tl_root),
            tl_skip=jnp.asarray(tl_skip),
            tl_lo=jnp.asarray(tl_lo, jnp.float32),
            tl_hi=jnp.asarray(tl_hi, jnp.float32),
            materials=materials,
            textures=textures,
            emitters=emitters,
            media=self._build_media(),
            sss=self._build_sss(),
            irawan=self._build_irawan(),
            aabb_lo=jnp.asarray(scene_lo, jnp.float32),
            aabb_hi=jnp.asarray(scene_hi, jnp.float32),
            radius=jnp.asarray(radius, jnp.float32),
        )
        # specular-MESH triangles usable by the manifold walk (capped:
        # the walk brute-forces the set per Newton step, manifold.py)
        MAX_MANIFOLD_TRIS = 4096
        n_man = 0
        man_rows = np.zeros((1, 19), np.float32)
        if T > 0:
            mtypes_arr = np.asarray([mm["type"] for mm in self.mats])
            tri_types = mtypes_arr[np.asarray(tmat)]
            diel = np.isin(tri_types, (bsdf_mod.DIELECTRIC,
                                       bsdf_mod.THIN_DIELECTRIC))
            idx = np.nonzero(diel)[0]
            if 0 < idx.size <= MAX_MANIFOLD_TRIS:
                etas_arr = np.asarray(
                    [mm["eta"][0] for mm in self.mats], np.float64)
                man_rows = np.concatenate([
                    tp0[idx], te1[idx], te2[idx],
                    tn0[idx], tn1[idx], tn2[idx],
                    etas_arr[np.asarray(tmat)[idx], None],
                ], axis=1).astype(np.float32)
                n_man = int(idx.size)
        scene = scene._replace(man_tri=jnp.asarray(man_rows))
        static = SceneStatic(
            n_tris=T,
            n_spheres=S,
            use_bvh=use_bvh,
            bsdf_types=tuple(sorted({mm["type"] for mm in self.mats})),
            emitter_types=tuple(sorted({e["type"] for e in self.emitters})),
            has_env=env_index >= 0,
            has_textures=any(
                mm["albedo_tex"] >= 0 or mm["alpha_tex"] >= 0
                or mm["opacity_tex"] >= 0 or mm.get("weight_tex", -1) >= 0
                for mm in self.mats
            ),
            has_opacity_tex=any(
                mm["opacity_tex"] >= 0 for mm in self.mats),
            has_weight_tex=any(
                mm.get("weight_tex", -1) >= 0 for mm in self.mats),
            medium_types=tuple(sorted({mm["type"] for mm in self.media})),
            phase_types=tuple(sorted({mm["phase_type"] for mm in self.media})),
            nested_bsdf_types=tuple(sorted({
                self.mats[mm[key]]["type"]
                for mm in self.mats for key in ("nested_a", "nested_b")
                if mm.get(key, -1) >= 0
            })),
            has_normal_maps=any(
                mm.get("normal_tex", -1) >= 0 or mm.get("bump_tex", -1) >= 0
                for mm in self.mats
            ),
            has_sss=any(mm.get("subsurface", -1) >= 0 for mm in self.mats),
            has_singlescatter=any(
                mm.get("subsurface", -1) >= 0
                and getattr(self, "_subsurfaces", [])[mm["subsurface"]]
                .get("mode", 0) == 1
                for mm in self.mats),
            has_boundary_media=any(
                mm.get("interior_medium", -1) >= 0
                or mm.get("exterior_medium", -1) >= 0 for mm in self.mats),
            ewa_taps=int(getattr(self, "ewa_taps", 0)),
            n_bvh_nodes=n_bvh_nodes,
            n_manifold_tris=n_man,
        )
        return scene, static

    def _build_textures(self, corners=None) -> TextureTable:
        from .texture import build_mip_chain
        if not self.textures:
            return TextureTable.empty()
        K = len(self.textures)
        if self.bitmaps:
            Hm = max(b.shape[0] for b in self.bitmaps)
            Wm = max(b.shape[1] for b in self.bitmaps)
            stack = np.zeros((len(self.bitmaps), Hm, Wm, 3), np.float32)
            sizes = np.zeros((len(self.bitmaps), 2), np.int32)
            for i, b in enumerate(self.bitmaps):
                stack[i, : b.shape[0], : b.shape[1]] = b[..., :3]
                sizes[i] = (b.shape[0], b.shape[1])
            mips = build_mip_chain(stack, sizes)
        else:
            stack = np.zeros((1, 1, 1, 3), np.float32)
            sizes = np.ones((1, 2), np.int32)
            mips = np.zeros((1, 1, 1, 3), np.float32)
        if corners is None:
            c0 = c1 = c2 = np.zeros((1, 3), np.float32)
        else:
            c0, c1, c2 = (np.asarray(c, np.float32) for c in corners)
        return TextureTable(
            type=jnp.asarray([t["type"] for t in self.textures], jnp.int32),
            color0=jnp.asarray([t["color0"] for t in self.textures], jnp.float32),
            color1=jnp.asarray([t["color1"] for t in self.textures], jnp.float32),
            uv_scale=jnp.asarray([t["uv_scale"] for t in self.textures], jnp.float32),
            uv_offset=jnp.asarray([t["uv_offset"] for t in self.textures], jnp.float32),
            line_width=jnp.asarray([t["line_width"] for t in self.textures], jnp.float32),
            scale=jnp.asarray([t["scale"] for t in self.textures], jnp.float32),
            bitmap_idx=jnp.asarray([t["bitmap"] for t in self.textures], jnp.int32),
            stack=jnp.asarray(
                np.ascontiguousarray(stack).reshape(-1, 3)),
            stack_hw=jnp.asarray(stack.shape[1:3], jnp.int32),
            sizes=jnp.asarray(sizes),
            mips=jnp.asarray(np.ascontiguousarray(mips).reshape(-1, 3)),
            mips_hw=jnp.asarray(mips.shape[1:3], jnp.int32),
            corner0=jnp.asarray(c0),
            corner1=jnp.asarray(c1),
            corner2=jnp.asarray(c2),
        )


def _build_envmap(e: dict):
    """Precompute the row/column luminance CDFs + solid-angle pdf table
    (envmap.cpp:99-299 importance sampling)."""
    img = np.asarray(e["env_map"], np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    H, W = img.shape[:2]
    lum = img[..., 0] * 0.212671 + img[..., 1] * 0.715160 + img[..., 2] * 0.072169
    theta = (np.arange(H) + 0.5) / H * np.pi
    sin_t = np.sin(theta)
    w = lum * sin_t[:, None] + 1e-12
    row_w = w.sum(axis=1)
    cdf_rows = np.cumsum(row_w) / row_w.sum()
    cdf_rows[-1] = 1.0
    cdf_cond = np.cumsum(w, axis=1) / w.sum(axis=1, keepdims=True)
    cdf_cond[:, -1] = 1.0
    # solid-angle pdf: p(texel) / texel_solid_angle
    p_texel = w / w.sum()
    texel_sa = (2 * np.pi / W) * (np.pi / H) * sin_t[:, None]
    pdf = p_texel / np.maximum(texel_sa, 1e-12)
    rad_pdf = np.concatenate(
        [img.reshape(-1, 3), pdf.reshape(-1, 1)], axis=1)
    prob, alias = _build_alias(p_texel.reshape(-1))
    return dict(
        env_map=np.ascontiguousarray(rad_pdf, np.float32),
        env_alias=np.ascontiguousarray(
            np.stack([prob, alias.astype(np.float32)], axis=1), np.float32),
        env_hw=np.asarray([H, W], np.int32),
        env_to_world=np.asarray(e.get("env_to_world", np.eye(3)), np.float32),
        env_scale=np.asarray(e.get("env_scale", 1.0), np.float32),
    )


def _build_alias(p):
    """Walker/Vose alias table for pmf p (N,): returns (prob, alias)."""
    N = len(p)
    p = np.asarray(p, np.float64)
    p = p / p.sum()
    scaled = p * N
    prob = np.ones(N)
    alias = np.arange(N, dtype=np.int64)
    small = [i for i in range(N) if scaled[i] < 1.0]
    large = [i for i in range(N) if scaled[i] >= 1.0]
    while small and large:
        s_ = small.pop()
        l_ = large.pop()
        prob[s_] = scaled[s_]
        alias[s_] = l_
        scaled[l_] = scaled[l_] - (1.0 - scaled[s_])
        (small if scaled[l_] < 1.0 else large).append(l_)
    return prob.astype(np.float32), alias
