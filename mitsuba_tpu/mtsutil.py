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


UTILITIES = {"tonemap": tonemap, "addimages": addimages,
             "joinrgb": joinrgb, "kdbench": kdbench,
             "rdielprec": rdielprec}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in UTILITIES:
        print("usage: python -m mitsuba_tpu.mtsutil "
              f"{{{','.join(UTILITIES)}}} [args...]", file=sys.stderr)
        return 2
    return UTILITIES[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
