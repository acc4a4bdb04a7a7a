"""Irawan-Marschner woven-cloth pattern machinery (reference:
src/bsdfs/irawan.{h,cpp} — WeavePattern/Yarn structures, the boost-spirit
``.cloth`` file grammar, and the specular normalization of configure()).

The BRDF math lives in render/bsdf.py (``_irawan_eval``); this module owns
the weave-pattern data: a device table of yarn segments per pattern, the
per-lane yarn lookup (uv -> tile cell -> yarn -> segment-local
coordinates, irawan.cpp:200-230), a plain-text ``.cloth`` file parser
compatible with the reference's grammar (irawan.h:340-395), two built-in
presets (plain weave and 2/2 twill — standard textile structures with
parameters in the model's published ranges; the reference itself ships no
patterns, users supply .cloth files), and the Monte-Carlo specular
normalization from IrawanClothBRDF::configure() (irawan.cpp:138-171).
"""
from __future__ import annotations

import re
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core import noise as noise_mod

DEG = np.pi / 180.0


class IrawanTable(NamedTuple):
    """Stacked weave patterns, padded to common tile / yarn counts."""
    pattern: jnp.ndarray   # (P, Hm, Wm) int32 0-based yarn ids
    tile_w: jnp.ndarray    # (P,) int32
    tile_h: jnp.ndarray    # (P,) int32
    yarns: jnp.ndarray     # (P, Ym, 8): type, psi, umax, kappa, w, l, cU, cV
    yarn_kd: jnp.ndarray   # (P, Ym, 3)
    yarn_ks: jnp.ndarray   # (P, Ym, 3)
    meta: jnp.ndarray      # (P, 12): alpha, beta, ss, hwidth, warpA, weftA,
                           #  fineness, period, dWarpU/dWarp, dWarpU/dWeft,
                           #  dWeftU/dWarp, dWeftU/dWeft
    repeat: jnp.ndarray    # (P, 2) repeatU, repeatV
    spec_norm: jnp.ndarray  # (P,)

    @staticmethod
    def empty() -> "IrawanTable":
        return IrawanTable(
            pattern=jnp.zeros((1, 1, 1), jnp.int32),
            tile_w=jnp.ones((1,), jnp.int32),
            tile_h=jnp.ones((1,), jnp.int32),
            yarns=jnp.zeros((1, 1, 8)),
            yarn_kd=jnp.zeros((1, 1, 3)),
            yarn_ks=jnp.zeros((1, 1, 3)),
            meta=jnp.zeros((1, 12)),
            repeat=jnp.ones((1, 2)),
            spec_norm=jnp.zeros((1,)),
        )


# --- built-in presets ------------------------------------------------------
# Plain weave: 2x2 tile, warp/weft alternate over-under; 2/2 twill: 4x4
# tile with the diagonal wale. Yarn geometry values sit in the ranges the
# model was published with (umax 25-35 deg, staple psi ~30 deg).

def _yarn(kind, psi_deg, umax_deg, kappa, w, l, cu, cv, kd, ks):
    return dict(type=0 if kind == "warp" else 1, psi=psi_deg * DEG,
                umax=umax_deg * DEG, kappa=kappa, width=w, length=l,
                centerU=cu, centerV=cv, kd=kd, ks=ks)


def preset(name: str, kd=(0.3, 0.3, 0.3), ks=(0.4, 0.4, 0.4)) -> dict:
    if name == "plain":
        return dict(
            name="plain weave", tileWidth=2, tileHeight=2,
            alpha=0.05, beta=4.0, ss=0.5, hWidth=0.5,
            warpArea=0.5, weftArea=0.5,
            pattern=[1, 2, 3, 4],
            yarns=[
                _yarn("warp", 30, 30, 0.5, 1.0, 2.0, 0.25, 0.25, kd, ks),
                _yarn("weft", 30, 30, 0.5, 1.0, 2.0, 0.75, 0.25, kd, ks),
                _yarn("weft", 30, 30, 0.5, 1.0, 2.0, 0.25, 0.75, kd, ks),
                _yarn("warp", 30, 30, 0.5, 1.0, 2.0, 0.75, 0.75, kd, ks),
            ],
        )
    if name == "twill":
        pat = []
        for yy in range(4):
            for xx in range(4):
                # 2/2 twill: warp floats over two, under two, advancing one
                pat.append(1 + ((xx - yy) % 4 < 2))
        return dict(
            name="2/2 twill", tileWidth=4, tileHeight=4,
            alpha=0.05, beta=4.0, ss=0.5, hWidth=0.5,
            warpArea=0.5, weftArea=0.5,
            pattern=pat,
            yarns=[
                _yarn("warp", 0, 35, 0.5, 1.0, 3.0, 0.5, 0.5, kd, ks),
                _yarn("weft", 30, 30, 0.5, 1.0, 2.0, 0.5, 0.5, kd, ks),
            ],
        )
    raise ValueError(f"unknown irawan preset '{name}'")


# --- .cloth file parser ----------------------------------------------------

_NUM = r"[-+0-9.eE]+"


def _kv_pairs(body):
    out = {}
    for mm in re.finditer(rf"(\w+)\s*=\s*({_NUM}|\"[^\"]*\"|\w+)", body):
        k, v = mm.group(1), mm.group(2)
        if v.startswith('"'):
            out[k] = v.strip('"')
        else:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    for mm in re.finditer(rf"(\w+)\s*=\s*\{{\s*({_NUM})\s*,\s*({_NUM})"
                          rf"\s*,\s*({_NUM})\s*\}}", body):
        out[mm.group(1)] = (float(mm.group(2)), float(mm.group(3)),
                            float(mm.group(4)))
    return out


def load_cloth(path: str) -> dict:
    """Parse the reference's ``.cloth`` weave-pattern format
    (irawan.h:340-395 grammar: a ``weave { ... }`` block with scalar
    fields, a ``pattern { ... }`` id list, and ``yarn { ... }`` blocks;
    angles in degrees)."""
    text = open(path).read()
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    pat_m = re.search(r"pattern\s*\{([^}]*)\}", text)
    if pat_m is None:
        raise ValueError(f"{path}: no pattern block")
    pattern = [int(float(x)) for x in re.findall(_NUM, pat_m.group(1))]
    yarns = []
    # brace-aware body capture: a yarn block may END with a nested
    # {r, g, b} spectrum tuple (the grammar is order-free), so the body
    # must consume one level of nested braces rather than stopping at the
    # first '}' (which would truncate a trailing kd/ks to its default)
    for ym in re.finditer(r"yarn\s*\{((?:[^{}]|\{[^{}]*\})*)\}",
                          text, flags=re.S):
        body = ym.group(1)
        kv = _kv_pairs(body)
        yarns.append(dict(
            type=0 if str(kv.get("type", "warp")) == "warp" else 1,
            psi=float(kv.get("psi", 0.0)) * DEG,
            umax=float(kv.get("umax", 30.0)) * DEG,
            kappa=float(kv.get("kappa", 0.0)),
            width=float(kv.get("width", 1.0)),
            length=float(kv.get("length", 2.0)),
            centerU=float(kv.get("centerU", 0.5)),
            centerV=float(kv.get("centerV", 0.5)),
            kd=kv.get("kd", (0.3, 0.3, 0.3)),
            ks=kv.get("ks", (0.4, 0.4, 0.4)),
        ))
    head = text.split("pattern")[0]
    kv = _kv_pairs(head)
    return dict(
        name=str(kv.get("name", "cloth")),
        tileWidth=int(float(kv.get("tileWidth", 2))),
        tileHeight=int(float(kv.get("tileHeight", 2))),
        alpha=float(kv.get("alpha", 0.05)),
        beta=float(kv.get("beta", 4.0)),
        ss=float(kv.get("ss", 0.5)),
        hWidth=float(kv.get("hWidth", 0.5)),
        warpArea=float(kv.get("warpArea", 0.5)),
        weftArea=float(kv.get("weftArea", 0.5)),
        fineness=float(kv.get("fineness", 0.0)),
        period=float(kv.get("period", 0.0)),
        dWarpUmaxOverDWarp=float(kv.get("dWarpUmaxOverDWarp", 0.0)) * DEG,
        dWarpUmaxOverDWeft=float(kv.get("dWarpUmaxOverDWeft", 0.0)) * DEG,
        dWeftUmaxOverDWarp=float(kv.get("dWeftUmaxOverDWarp", 0.0)) * DEG,
        dWeftUmaxOverDWeft=float(kv.get("dWeftUmaxOverDWeft", 0.0)) * DEG,
        pattern=pattern,
        yarns=yarns,
    )


# --- device table build + per-lane lookup ---------------------------------

def build_table(patterns: list, repeats: list) -> IrawanTable:
    """Stack host pattern dicts (preset()/load_cloth() output) into one
    padded device table; computes each pattern's specular normalization."""
    if not patterns:
        return IrawanTable.empty()
    tab = build_table_nonorm(patterns, repeats)
    norms = np.asarray([_specular_normalization(pd) for pd in patterns],
                       np.float32)
    return tab._replace(spec_norm=jnp.asarray(norms))


def lane_params(tab: IrawanTable, pid, uv):
    """Per-lane yarn lookup: uv -> tile cell -> yarn segment -> the
    BsdfLocals (iw_par, iw_ks, kd) triple (irawan.cpp eval:200-230).

    iw_par layout: [is_weft, psi, umax, kappa, width, length, x, y,
    alpha, beta, ss, hwidth, specnorm * area_ratio]."""
    pid = jnp.maximum(pid, 0)
    rep = tab.repeat[pid]
    tw = tab.tile_w[pid].astype(jnp.float32)
    th = tab.tile_h[pid].astype(jnp.float32)
    u = uv[..., 0] * rep[..., 0]
    v = (1.0 - uv[..., 1]) * rep[..., 1]
    x = u * tw
    y = v * th
    lx = jnp.mod(jnp.floor(x), tw).astype(jnp.int32)
    ly = jnp.mod(jnp.floor(y), th).astype(jnp.int32)
    yid = tab.pattern[pid, ly, lx]
    yarn = tab.yarns[pid, yid]                     # (R, 8)
    center_x = jnp.floor(x / tw) * tw + yarn[..., 6] * tw
    center_y = jnp.floor(y / th) * th + (1.0 - yarn[..., 7]) * th
    xx = x - center_x
    yy = -(y - center_y)
    mt = tab.meta[pid]                             # (R, 12)
    is_weft = yarn[..., 0] > 0.5
    area = jnp.where(is_weft, mt[..., 5], mt[..., 4])
    area_ratio = m.safe_div(mt[..., 4] + mt[..., 5], area)
    snorm = tab.spec_norm[pid] * area_ratio

    umax = yarn[..., 2]
    # --- correlated yarn-tension noise (irawan.cpp:255-275): when
    # period > 0 each yarn segment perturbs its umax by 1-D Perlin noise
    # seeded per segment. Deviation: the per-segment jitter hash is PCG4D
    # (the build's counter RNG) rather than TEA — same role, different
    # stream (the reference's noise is itself arbitrary pseudo-random).
    period = mt[..., 7]
    has_period = period > 0.0
    psafe = jnp.where(has_period, period, 1.0)
    cxu = center_x.astype(jnp.int32).astype(jnp.uint32)
    cyu = center_y.astype(jnp.int32).astype(jnp.uint32)
    j1 = _hash01(cxu, 2 * cyu)
    j2 = _hash01(cxu, 2 * cyu + 1)
    rep_v = th * rep[..., 1]
    rep_u = tw * rep[..., 0]
    t1 = (center_x * (rep_v + j1) + center_y) / psafe
    t2 = (center_y * (rep_u + j2) + center_x) / psafe
    z = jnp.zeros_like(t1)
    r1 = noise_mod.perlin_3d(jnp.stack([t1, z, z], axis=-1))
    r2 = noise_mod.perlin_3d(jnp.stack([t2, z, z], axis=-1))
    dU_warp = jnp.where(is_weft, mt[..., 10], mt[..., 8])
    dU_weft = jnp.where(is_weft, mt[..., 11], mt[..., 9])
    umax = jnp.where(has_period,
                     umax + r1 * dU_warp + r2 * dU_weft, umax)

    # --- specular intensity variation (irawan.cpp:293-302): fineness^2
    # seeds per texture unit scale the specular term by min(-log xi, 10).
    # Direction-independent, so folded into the snorm column here. Index
    # coordinates use the rotated segment-local frame exactly as eval does.
    fineness = mt[..., 6]
    xr = jnp.where(is_weft, -yy, xx)
    yr2 = jnp.where(is_weft, xx, yy)
    i1 = ((center_x + xr) * fineness).astype(jnp.int32).astype(jnp.uint32)
    i2 = ((center_y + yr2) * fineness).astype(jnp.int32).astype(jnp.uint32)
    xi = jnp.maximum(_hash01(i1, i2), 1e-9)
    ivar = jnp.minimum(-jnp.log(xi), 10.0)
    snorm = jnp.where(fineness > 0.0, snorm * ivar, snorm)

    iw_par = jnp.stack([
        yarn[..., 0], yarn[..., 1], umax, yarn[..., 3],
        yarn[..., 4], yarn[..., 5], xx, yy,
        mt[..., 0], mt[..., 1], mt[..., 2], mt[..., 3], snorm,
    ], axis=-1)
    return iw_par, tab.yarn_ks[pid, yid], tab.yarn_kd[pid, yid]


def _hash01(a, b):
    """Deterministic [0,1) float from two uint32 indices (PCG4D mix — the
    sampleTEAFloat role of qmc.h:146-217 with the build's counter hash)."""
    from ..core import rng as rng_mod

    a = jnp.asarray(a, jnp.uint32)
    v = jnp.stack([a, jnp.asarray(b, jnp.uint32),
                   jnp.full_like(a, 0x9E3779B9, dtype=jnp.uint32),
                   jnp.full_like(a, 0x85EBCA6B, dtype=jnp.uint32)], axis=-1)
    return rng_mod._to_unit_float(rng_mod.pcg4d(v)[..., 0])


def _specular_normalization(pd: dict, n: int = 10000, seed: int = 5) -> float:
    """IrawanClothBRDF::configure() (irawan.cpp:138-171): average the raw
    specular integrand over cosine wi/wo and uniform uv, normalize so the
    diffusely-illuminated specular reflectance peaks at 1/pi."""
    from . import bsdf as B
    from ..core import warp as W

    tab = build_table_raw(pd)
    rng = np.random.default_rng(seed)
    wi = np.asarray(W.square_to_cosine_hemisphere(
        jnp.asarray(rng.random((n, 2), np.float32))))
    wo = np.asarray(W.square_to_cosine_hemisphere(
        jnp.asarray(rng.random((n, 2), np.float32))))
    uvs = jnp.asarray(rng.random((n, 2), np.float32))
    pid = jnp.zeros(n, jnp.int32)
    # raw table has spec_norm 1, so the snorm column is exactly the
    # warp/weft area ratio — which the reference INCLUDES in its
    # normalization sum (irawan.cpp:305-312 run in initialization mode)
    iw_par, _, _ = lane_params(tab, pid, uvs)
    bl = _norm_locals(n, iw_par)
    f = B._irawan_eval(bl, jnp.asarray(wi), jnp.asarray(wo))
    cos_o = np.maximum(np.asarray(wo)[..., 2], 1e-6)
    total = float((np.asarray(f[..., 0]) / cos_o).sum())
    if total <= 0:
        return 0.0
    return n / (total * np.pi)


def build_table_raw(pd: dict) -> IrawanTable:
    """Single-pattern table with unit normalization (helper for the
    normalization MC)."""
    tab = build_table_nonorm([pd], [(1.0, 1.0)])
    return tab


def build_table_nonorm(patterns, repeats) -> IrawanTable:
    P = len(patterns)
    Hm = max(p["tileHeight"] for p in patterns)
    Wm = max(p["tileWidth"] for p in patterns)
    Ym = max(len(p["yarns"]) for p in patterns)
    pat = np.zeros((P, Hm, Wm), np.int32)
    yr = np.zeros((P, Ym, 8), np.float32)
    kd = np.zeros((P, Ym, 3), np.float32)
    ks = np.zeros((P, Ym, 3), np.float32)
    meta = np.zeros((P, 12), np.float32)
    for i, pd in enumerate(patterns):
        tw, th = pd["tileWidth"], pd["tileHeight"]
        grid = np.asarray(pd["pattern"], np.int32).reshape(th, tw) - 1
        pat[i, :th, :tw] = grid
        for j, y in enumerate(pd["yarns"]):
            yr[i, j] = [y["type"], y["psi"], y["umax"], y["kappa"],
                        y["width"], y["length"], y["centerU"], y["centerV"]]
            kd[i, j] = y["kd"]
            ks[i, j] = y["ks"]
        meta[i] = [pd["alpha"], pd["beta"], pd["ss"], pd["hWidth"],
                   pd["warpArea"], pd["weftArea"],
                   pd.get("fineness", 0.0), pd.get("period", 0.0),
                   pd.get("dWarpUmaxOverDWarp", 0.0),
                   pd.get("dWarpUmaxOverDWeft", 0.0),
                   pd.get("dWeftUmaxOverDWarp", 0.0),
                   pd.get("dWeftUmaxOverDWeft", 0.0)]
    return IrawanTable(
        pattern=jnp.asarray(pat),
        tile_w=jnp.asarray([p["tileWidth"] for p in patterns], jnp.int32),
        tile_h=jnp.asarray([p["tileHeight"] for p in patterns], jnp.int32),
        yarns=jnp.asarray(yr), yarn_kd=jnp.asarray(kd),
        yarn_ks=jnp.asarray(ks), meta=jnp.asarray(meta),
        repeat=jnp.asarray(np.asarray(repeats, np.float32).reshape(P, 2)),
        spec_norm=jnp.ones((P,)),
    )


def _norm_locals(n, iw_par):
    from . import bsdf as B

    z1 = jnp.zeros((n,))
    z3 = jnp.zeros((n, 3))
    return B.BsdfLocals(
        type=jnp.full((n,), B.IRAWAN, jnp.int32), dist=jnp.zeros((n,), jnp.int32),
        albedo=z3, spec_refl=jnp.ones((n, 3)), spec_trans=jnp.ones((n, 3)),
        eta_s=jnp.full((n,), 1.5), eta_c=jnp.ones((n, 3)), k_c=z3,
        alpha=jnp.full((n, 2), 0.1), nonlinear=jnp.zeros((n,), bool),
        twosided=jnp.zeros((n,), bool), opacity=jnp.ones((n,)),
        blend_w=jnp.full((n,), 0.5), hk_thickness=jnp.ones((n,)),
        hk_g=z1, rt_coef=jnp.zeros((n, 6)), rt_fdr=z1,
        iw_par=iw_par, iw_ks=jnp.ones((n, 3)),
    )
