"""Utility launcher: ``python -m mitsuba_tpu.mtsutil <utility> [...]``.

Parity with the reference's mtsutil tier (src/mitsuba/mtsutil.cpp loading
Utility plugins from src/utils):
* ``tonemap``   — HDR -> LDR conversion with gamma / Reinhard + multipliers
                  (utils/tonemap.cpp role, ldrfilm.cpp operators)
* ``addimages`` — weighted sum of two images (utils/addimages.cpp)
* ``joinrgb``   — merge three single-channel images into RGB
                  (utils/joinrgb.cpp)
* ``kdbench``   — ray-throughput benchmark of the acceleration structure
                  over a mesh, reporting rays/s for coherent and incoherent
                  batches (utils/kdbench.cpp:30-64: random rays through the
                  scene bounding sphere)
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load(path):
    from .io.mitsuba_xml import _load_image

    return _load_image(path)


def _write(path, img):
    from .io.image import write_image

    write_image(path, np.asarray(img, np.float32))


def tonemap(argv):
    ap = argparse.ArgumentParser(prog="mtsutil tonemap")
    ap.add_argument("input")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-g", "--gamma", type=float, default=-1.0,
                    help="gamma (-1 = sRGB curve)")
    ap.add_argument("-m", "--multiplier", type=float, default=1.0)
    ap.add_argument("-t", "--tonemap", choices=["gamma", "reinhard"],
                    default="gamma")
    ap.add_argument("-k", "--key", type=float, default=0.18,
                    help="reinhard key value")
    ap.add_argument("-b", "--burn", type=float, default=0.0,
                    help="reinhard burn in [0,1]")
    a = ap.parse_args(argv)
    img = _load(a.input) * a.multiplier
    if a.tonemap == "reinhard":
        import jax.numpy as jnp

        from .render.film import Film, develop_ldr

        data = jnp.concatenate(
            [jnp.asarray(img), jnp.ones(img.shape[:2] + (1,))], axis=-1)
        out = np.asarray(develop_ldr(Film(data=data), tonemap="reinhard",
                                     gamma=a.gamma, key=a.key, burn=a.burn))
        _write(a.output, out)
        print(f"tonemapped {a.input} -> {a.output}")
        return 0
    if a.gamma <= 0:
        from .core.spectrum import srgb_gamma
        import jax.numpy as jnp

        out = np.asarray(srgb_gamma(jnp.asarray(img)))
    else:
        out = np.clip(img, 0.0, 1.0) ** (1.0 / a.gamma)
    _write(a.output, out)
    print(f"tonemapped {a.input} -> {a.output}")
    return 0


def addimages(argv):
    ap = argparse.ArgumentParser(prog="mtsutil addimages")
    ap.add_argument("weight_a", type=float)
    ap.add_argument("image_a")
    ap.add_argument("weight_b", type=float)
    ap.add_argument("image_b")
    ap.add_argument("output")
    a = ap.parse_args(argv)
    ia, ib = _load(a.image_a), _load(a.image_b)
    assert ia.shape == ib.shape, (ia.shape, ib.shape)
    _write(a.output, a.weight_a * ia + a.weight_b * ib)
    print(f"wrote {a.output}")
    return 0


def joinrgb(argv):
    ap = argparse.ArgumentParser(prog="mtsutil joinrgb")
    ap.add_argument("red")
    ap.add_argument("green")
    ap.add_argument("blue")
    ap.add_argument("output")
    a = ap.parse_args(argv)
    chans = [_load(p) for p in (a.red, a.green, a.blue)]
    chans = [c[..., 0] if c.ndim == 3 else c for c in chans]
    _write(a.output, np.stack(chans, axis=-1))
    print(f"wrote {a.output}")
    return 0


def kdbench(argv):
    """Accel-structure throughput benchmark (kdbench.cpp:30-64 analog):
    loads a mesh, builds the BVH, and times coherent (camera-grid) and
    incoherent (bounding-sphere chord) ray batches through the production
    traversal kernel. Prints rays/s for each."""
    ap = argparse.ArgumentParser(prog="mtsutil kdbench")
    ap.add_argument("mesh", help=".ply/.obj/.serialized mesh file")
    ap.add_argument("-n", "--rays", type=int, default=1 << 18)
    ap.add_argument("-r", "--repeat", type=int, default=3)
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .accel.build import build_bvh, treelet_roots, triangle_aabbs
    from .io.mesh import load_mesh, load_obj
    from .ops.pallas_bvh import (bvh_traverse_lane_resort,
                                 bvh_traverse_treelets, pack_nodes_slim,
                                 pack_pages)

    meshes = (load_obj(a.mesh) if a.mesh.endswith(".obj")
              else [load_mesh(a.mesh)])
    v = np.concatenate([m.positions for m in meshes]).astype(np.float32)
    offs, f = 0, []
    for m in meshes:
        f.append(m.faces + offs)
        offs += len(m.positions)
    f = np.concatenate(f).astype(np.int32)
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    lo, hi = triangle_aabbs(p0, p0 + e1, p0 + e2)
    t0 = time.perf_counter()
    bvh = build_bvh(lo, hi, leaf_size=1)
    t_build = time.perf_counter() - t0
    rows = jnp.asarray(pack_nodes_slim(bvh, p0, e1, e2))
    pages = jnp.asarray(pack_pages(bvh, p0, e1, e2))
    n_nodes = len(bvh.lo)
    roots = treelet_roots(bvh, max_nodes=4096)
    tl = (jnp.asarray(roots), jnp.asarray(bvh.skip[roots]),
          jnp.asarray(bvh.lo[roots]), jnp.asarray(bvh.hi[roots]))
    slo, shi = lo.min(axis=0), hi.max(axis=0)
    center, radius = (slo + shi) / 2, 0.5 * np.linalg.norm(shi - slo)
    print(f"{a.mesh}: {len(p0)} tris, {len(bvh.lo)} nodes, "
          f"{len(roots)} treelets, build {t_build*1e3:.0f} ms")

    R = a.rays
    rng = np.random.default_rng(0)

    def run(o, d, tag):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        tmin = jnp.zeros(R)
        tmax = jnp.full(R, np.inf)
        for kern, kname in (
            (lambda: bvh_traverse_treelets(
                rows, *tl, o, d, tmin, tmax, jnp.asarray(slo),
                jnp.asarray(shi), slim=True), "treelet"),
            (lambda: bvh_traverse_lane_resort(
                pages, n_nodes, o, d, tmin, tmax, jnp.asarray(slo),
                jnp.asarray(shi)), "lane-resort"),
        ):
            out = kern()
            np.asarray(out[1])
            t0 = time.perf_counter()
            for _ in range(a.repeat):
                out = kern()
                np.asarray(out[1])
            dt = (time.perf_counter() - t0) / a.repeat
            hr = float(np.asarray(out[0]).mean())
            print(f"  {tag} {kname:11s}: {R/dt/1e6:8.2f} Mrays/s  "
                  f"(hit rate {hr:.3f})")

    # incoherent: chords through the bounding sphere (kdbench.cpp:47)
    u = rng.normal(size=(R, 3)); u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.normal(size=(R, 3)); w /= np.linalg.norm(w, axis=1, keepdims=True)
    o_inc = (center + radius * 1.2 * u).astype(np.float32)
    d_inc = (center + radius * 0.8 * w - o_inc)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)
    # coherent: camera grid
    side = int(np.sqrt(R))
    px, py = np.meshgrid(np.linspace(-.5, .5, side), np.linspace(-.5, .5, side))
    eye = center + np.array([0, 0.4 * radius, 2.5 * radius])
    fwd = center - eye; fwd /= np.linalg.norm(fwd)
    rt = np.cross(fwd, [0, 1, 0]); rt /= np.linalg.norm(rt)
    up = np.cross(rt, fwd)
    d_coh = (fwd[None] + 0.7 * (px.ravel()[:, None] * rt[None]
             + py.ravel()[:, None] * up[None]))
    d_coh = np.pad(d_coh, ((0, R - len(d_coh)), (0, 0)), mode="edge")
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.broadcast_to(eye, (R, 3)).astype(np.float32)

    run(o_coh, d_coh.astype(np.float32), "coherent  ")
    run(o_inc, d_inc, "incoherent")
    return 0


def rdielprec(argv):
    """Precompute rough dielectric transmittance tables (the rdielprec
    utility, src/utils — feeds rtrans.h / data/microfacet): prints T(cos)
    samples + the fitted polynomial + the diffuse average for a given
    (distribution, alpha, eta) grid, optionally saving an .npz."""
    import argparse

    import numpy as np

    from .core import rtrans

    ap = argparse.ArgumentParser(prog="mtsutil rdielprec")
    ap.add_argument("--dist", choices=["beckmann", "ggx"], default="beckmann")
    ap.add_argument("--alpha", type=float, nargs="+", default=[0.1, 0.3])
    ap.add_argument("--eta", type=float, nargs="+", default=[1.5])
    ap.add_argument("-o", "--output", default="",
                    help="save tables to this .npz")
    args = ap.parse_args(argv)
    dist = 0 if args.dist == "beckmann" else 1
    cos = np.linspace(0.02, 1.0, 32)
    out = {}
    for a in args.alpha:
        for e in args.eta:
            T = rtrans.rough_transmittance(dist, a, e, cos)
            coef, _ = rtrans.fit_poly(dist, a, e)
            tbar = rtrans.diffuse_transmittance(dist, a, e)
            key = f"{args.dist}_a{a:g}_eta{e:g}"
            out[key] = T
            out[key + "_poly"] = coef
            print(f"{key}: Tbar={tbar:.5f} "
                  f"T(0.1)={np.interp(0.1, cos, T):.5f} "
                  f"T(1.0)={T[-1]:.5f} poly={np.round(coef, 5).tolist()}")
    if args.output:
        np.savez(args.output, cos=cos, **out)
        print(f"wrote {args.output}")
    return 0


def cylclip(argv):
    """Cylinder/AABB clipping inspector — the headless TPU-build analog of
    the reference's GL cylclip viewer (src/utils/cylclip.cpp, a libhw
    Viewer visualizing Cylinder::getClippedAABB). Computes the tightly
    clipped AABB of a cylinder against a box via the cylinder/plane
    ellipse construction (src/shapes/cylinder.cpp:277-447,
    geometrictools.com IntersectionCylinderPlane), prints both the naive
    and clipped boxes + the volume ratio, cross-checks against dense
    surface sampling, and optionally writes a top-view visualization
    bitmap instead of the interactive GL view."""
    import argparse

    import numpy as np

    from .core.mathutil import cyl_clipped_aabb, cyl_naive_aabb

    ap = argparse.ArgumentParser(prog="mtsutil cylclip")
    ap.add_argument("--p0", type=float, nargs=3, default=[0.0, 0.0, -1.0])
    ap.add_argument("--p1", type=float, nargs=3, default=[0.0, 0.0, 1.0])
    ap.add_argument("--radius", type=float, default=0.2)
    ap.add_argument("--box", type=float, nargs=6, metavar="B",
                    help="clip box lo.xyz hi.xyz (default: naive AABB "
                         "shrunk 30%% — the viewer's interactive box)")
    ap.add_argument("-o", "--output", default="",
                    help="write a top-view visualization image (PNG)")
    args = ap.parse_args(argv)
    p0 = np.asarray(args.p0, np.float64)
    p1 = np.asarray(args.p1, np.float64)
    naive_lo, naive_hi = cyl_naive_aabb(p0, p1, args.radius)
    if args.box:
        box_lo = np.asarray(args.box[:3], np.float64)
        box_hi = np.asarray(args.box[3:], np.float64)
    else:
        c = 0.5 * (naive_lo + naive_hi)
        box_lo = c + (naive_lo - c) * 0.7
        box_hi = c + (naive_hi - c) * 0.7
    lo, hi = cyl_clipped_aabb(p0, p1, args.radius, box_lo, box_hi)
    vol = np.prod(np.maximum(hi - lo, 0.0))
    bvol = np.prod(np.maximum(box_hi - box_lo, 0.0))
    print(f"cylinder p0={p0.tolist()} p1={p1.tolist()} r={args.radius}")
    print(f"naive  AABB: {naive_lo.round(5).tolist()} "
          f"{naive_hi.round(5).tolist()}")
    print(f"box        : {box_lo.round(5).tolist()} "
          f"{box_hi.round(5).tolist()}")
    print(f"clipped    : {lo.round(5).tolist()} {hi.round(5).tolist()}")
    print(f"volume ratio clipped/box: {vol / max(bvol, 1e-30):.4f}")
    if args.output:
        from .io.image import write_image
        # top view (x/z plane): box, clipped AABB, sampled cylinder points
        W = H = 256
        img = np.full((H, W, 3), 0.12, np.float32)
        span_lo = np.minimum(naive_lo, box_lo) - 0.05
        span_hi = np.maximum(naive_hi, box_hi) + 0.05

        def to_px(p):
            q = (p - span_lo) / np.maximum(span_hi - span_lo, 1e-9)
            return (int(q[0] * (W - 1)), int((1.0 - q[2]) * (H - 1)))

        def draw_box(lo3, hi3, color):
            x0, y1 = to_px(lo3)
            x1, y0 = to_px(hi3)
            x0, x1 = sorted((max(x0, 0), min(x1, W - 1)))
            y0, y1 = sorted((max(y0, 0), min(y1, H - 1)))
            img[y0, x0:x1 + 1] = color
            img[y1, x0:x1 + 1] = color
            img[y0:y1 + 1, x0] = color
            img[y0:y1 + 1, x1] = color

        draw_box(box_lo, box_hi, (0.5, 0.5, 0.5))
        draw_box(lo, hi, (0.2, 0.4, 1.0))
        ts = np.linspace(0.0, 1.0, 400)[:, None]
        phis = np.linspace(0.0, 2 * np.pi, 64)
        axis = p1 - p0
        a = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 * np.linalg.norm(
            axis) else np.array([0, 1.0, 0])
        s = np.cross(axis, a)
        s /= np.linalg.norm(s)
        t2 = np.cross(axis, s)
        t2 /= np.linalg.norm(t2)
        for phi in phis:
            n = np.cos(phi) * s + np.sin(phi) * t2
            pts = p0 + ts * axis + args.radius * n
            inside = np.all((pts >= box_lo) & (pts <= box_hi), axis=1)
            for p in pts[inside][::4]:
                x, y = to_px(p)
                if 0 <= x < W and 0 <= y < H:
                    img[y, x] = (1.0, 0.25, 0.2)
        write_image(args.output, img)
        print(f"wrote {args.output}")
    return 0


def preview(argv):
    """Progressive VPL preview — the headless analog of the reference's
    libhw/mtsgui GL preview (src/mtsgui/preview.h:34 VPLSceneManager: the
    GUI rasterizes one VPL set per refresh to preview the scene while the
    real render runs). Here each pass renders one low-spp instant-
    radiosity image on the accelerator and rewrites the output file, so
    the picture sharpens progressively like the GUI preview; no GL/libhw
    needed on a TPU."""
    import argparse
    import time as _time

    import numpy as np

    from .io.image import write_image
    from .io.mitsuba_xml import load_scene
    from .render import api
    from .render.integrators.common import IntegratorConfig, VPL

    ap = argparse.ArgumentParser(prog="mtsutil preview")
    ap.add_argument("scene")
    ap.add_argument("-o", "--output", default="preview.png")
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--spp", type=int, default=1, help="spp per pass")
    ap.add_argument("--vpls", type=int, default=64,
                    help="VPLs per pass (preview.h vplCount role)")
    ap.add_argument("--size", type=int, default=0,
                    help="override preview resolution (largest side)")
    ap.add_argument("-D", action="append", default=[],
                    metavar="key=value", help="scene parameter substitution")
    args = ap.parse_args(argv)
    defines = dict(kv.split("=", 1) for kv in args.D)
    sc = load_scene(args.scene, defines=defines or None)
    st = sc.settings
    W, H = st.width, st.height
    if args.size:
        s = args.size / max(W, H)
        W, H = max(int(W * s), 8), max(int(H * s), 8)
    cfg = IntegratorConfig(type=VPL, max_depth=3, vpl_count=args.vpls)
    acc = np.zeros((H, W, 3), np.float32)
    from dataclasses import replace as _replace
    for k in range(args.passes):
        t0 = _time.perf_counter()
        stk = _replace(st, width=W, height=H, spp=args.spp,
                       spp_per_pass=args.spp, seed=st.seed + 7 * k)
        img = np.asarray(api.render(sc.scene, sc.static, sc.sensor, cfg,
                                    stk))
        acc += (img - acc) / (k + 1)
        write_image(args.output, acc)
        print(f"pass {k + 1}/{args.passes}: "
              f"{(_time.perf_counter() - t0) * 1e3:.0f} ms -> "
              f"{args.output}", flush=True)
    return 0


UTILITIES = {"tonemap": tonemap, "addimages": addimages,
             "joinrgb": joinrgb, "kdbench": kdbench,
             "rdielprec": rdielprec, "cylclip": cylclip,
             "preview": preview}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in UTILITIES:
        print("usage: python -m mitsuba_tpu.mtsutil "
              f"{{{','.join(UTILITIES)}}} [args...]", file=sys.stderr)
        return 2
    return UTILITIES[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
