"""Texture system (reference: src/textures/*, mipmap.h).

All bitmaps live in one padded stack array (B, Hmax, Wmax, 3) so a per-lane
gather with a dynamic texture index stays a single XLA gather — the TPU
replacement for per-plugin virtual Texture::eval. Procedural textures
(checkerboard, grid, wireframe, curvature, vertexcolors) are evaluated
analytically and selected by type mask.

Parity: bitmap.cpp (bilinear + trilinear MIP via a compact vertically
stacked pyramid — the TMIPMap of mipmap.h:861; EWA reduces to trilinear
here because TPU lanes carry an isotropic footprint estimate, not full ray
differentials), checkerboard.cpp, gridtexture.cpp, scale.cpp (folded into
the value multiplier at build time and exposed as add_texture_scale),
wireframe.cpp (barycentric edge distance), curvature.cpp (per-vertex
umbrella-Laplacian mean curvature baked at build time, diverging red/blue
map), vertexcolors.cpp (per-corner attribute interpolation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1
TEX_BITMAP = 2
TEX_GRID = 3
TEX_WIREFRAME = 4
TEX_VERTEXCOLORS = 5
TEX_CURVATURE = 6
TEX_NOISE = 7       # Perlin fbm over the hit position (libcore noise.cpp)


class TextureTable(NamedTuple):
    type: jnp.ndarray        # (K,) int32
    color0: jnp.ndarray      # (K, 3) constant value / checker dark / interior
    color1: jnp.ndarray      # (K, 3) checker bright / grid+wire line color
    uv_scale: jnp.ndarray    # (K, 2)
    uv_offset: jnp.ndarray   # (K, 2)
    line_width: jnp.ndarray  # (K,) gridtexture/wireframe line width
    scale: jnp.ndarray       # (K, 3) value multiplier (scale.cpp folded in)
    bitmap_idx: jnp.ndarray  # (K,) int32 into stack, -1 if procedural
    # bitmaps are stored FLAT as (B*H*W, 3) with explicit strides: gathers
    # from multi-dim arrays (img[b, y, x]) and from derived views hit
    # XLA:TPU's slow general-gather path (measured ~3 ms per gather at
    # 262k lanes vs 0.03 ms for a flat (N, 3) row gather)
    stack: jnp.ndarray       # (B*H*W, 3) padded bitmap stack rows
    stack_hw: jnp.ndarray    # (2,) int32 padded (H, W) stride of the stack
    sizes: jnp.ndarray       # (B, 2) int32 (h, w) true sizes
    mips: jnp.ndarray        # (B*H*(W//2), 3) vertically packed MIP chain
                             # (level l>=1 at row offset H - (H >> (l-1)));
                             # 1 row when no mipmapping requested
    mips_hw: jnp.ndarray     # (2,) int32 padded (H, W//2) stride of mips
    corner0: jnp.ndarray     # (T, 3) per-triangle corner attribute
    corner1: jnp.ndarray     # (vertex colors, or baked curvature in ch 0;
    corner2: jnp.ndarray     #  (1, 3) dummy when unused)

    @staticmethod
    def empty() -> "TextureTable":
        return TextureTable(
            type=jnp.zeros((1,), jnp.int32),
            color0=jnp.ones((1, 3)),
            color1=jnp.ones((1, 3)),
            uv_scale=jnp.ones((1, 2)),
            uv_offset=jnp.zeros((1, 2)),
            line_width=jnp.full((1,), 0.01),
            scale=jnp.ones((1, 3)),
            bitmap_idx=jnp.full((1,), -1, jnp.int32),
            stack=jnp.zeros((1, 3)),
            stack_hw=jnp.ones((2,), jnp.int32),
            sizes=jnp.ones((1, 2), jnp.int32),
            mips=jnp.zeros((1, 3)),
            mips_hw=jnp.ones((2,), jnp.int32),
            corner0=jnp.zeros((1, 3)),
            corner1=jnp.zeros((1, 3)),
            corner2=jnp.zeros((1, 3)),
        )


def eval_texture(tt: TextureTable, tex_id, uv, default,
                 bary=None, prim=None, lod=None, fp_uv=None, p=None,
                 duv_minor=None, duv_major=None, ewa_taps=0):
    """Evaluate textures for a batch: tex_id (R,) int32 (-1 -> default),
    uv (R, 2), default (R, 3). Optional: bary (R, 2) triangle barycentrics
    + prim (R,) triangle ids (wireframe/vertexcolors/curvature), lod (R,)
    MIP level (trilinear; None -> finest), fp_uv (R,) ray-cone footprint
    in uv units from which the MIP LOD is derived per texture size
    (mipmap.h:861 trilinear role). With ``duv_minor``/``duv_major`` (R, 2)
    — the uv-space footprint ellipse axes — and ``ewa_taps`` > 1, bitmap
    lookups average ewa_taps trilinear taps spread along the major axis
    while the MIP LOD follows the minor axis, with the ellipse eccentricity
    capped at 2*taps (each trilinear tap covers ~2x its footprint, so taps
    spaced major/(2*taps) apart still overlap — the reference's
    mipmap.h:861 evalEWA caps eccentricity at maxAnisotropy the same way,
    enlarging only the minor axis). Realized as fixed unrolled taps — the
    TPU-friendly form of hardware aniso filtering. Note the taps execute at
    every bounce even though the integrators zero duv_* after the primary
    hit (N-x gather cost; batched lanes cannot branch). Returns (R, 3)."""
    tid = jnp.maximum(tex_id, 0)
    ttype = tt.type[tid]
    uv_t = uv * tt.uv_scale[tid] + tt.uv_offset[tid]

    aniso = duv_minor is not None and duv_major is not None and ewa_taps > 1
    if lod is None and (fp_uv is not None or aniso):
        # footprint in texel units at the base level -> fractional level;
        # uv_scale stretches the footprint in texture space too
        bi_fp = jnp.maximum(tt.bitmap_idx[tid], 0)
        wh = jnp.stack([tt.sizes[bi_fp, 1], tt.sizes[bi_fp, 0]],
                       axis=-1).astype(jnp.float32)      # (R, 2) [W, H]
        if aniso:
            # per-component texel-space axis lengths (projected through
            # uv_scale and the texture's own W/H, not max-size scalars)
            sc = tt.uv_scale[tid] * wh
            mn = jnp.linalg.norm(duv_minor * sc, axis=-1)
            mj = jnp.linalg.norm(duv_major * sc, axis=-1)
            # eccentricity cap: the taps cover the major axis, so the
            # per-tap footprint (-> LOD) is max(minor, major/(2*taps))
            texels = jnp.maximum(mn, mj / (2 * ewa_taps))
        else:
            size = jnp.max(wh, axis=-1)
            s_mag = jnp.max(jnp.abs(tt.uv_scale[tid]), axis=-1)
            texels = fp_uv * s_mag * size
        lod = jnp.where(texels > 1.0,
                        jnp.log2(jnp.maximum(texels, 1.0)), 0.0)

    out = tt.color0[tid]

    # checkerboard.cpp: color0/color1 on integer parity of 2x-scaled uv
    iu = jnp.floor(uv_t[..., 0] * 2.0).astype(jnp.int32)
    iv = jnp.floor(uv_t[..., 1] * 2.0).astype(jnp.int32)
    checker = ((iu + iv) % 2) == 0
    v_check = jnp.where(checker[..., None], tt.color0[tid], tt.color1[tid])
    out = jnp.where((ttype == TEX_CHECKERBOARD)[..., None], v_check, out)

    # gridtexture.cpp: line of width w on the unit-cell boundary
    fu = uv_t[..., 0] - jnp.floor(uv_t[..., 0])
    fv = uv_t[..., 1] - jnp.floor(uv_t[..., 1])
    lw = tt.line_width[tid]
    on_line = (fu < lw) | (fu > 1.0 - lw) | (fv < lw) | (fv > 1.0 - lw)
    v_grid = jnp.where(on_line[..., None], tt.color1[tid], tt.color0[tid])
    out = jnp.where((ttype == TEX_GRID)[..., None], v_grid, out)

    # Perlin-fbm procedural noise over the world-space hit position
    # (libcore noise.cpp role): lerp(color0, color1, fbm in [0,1]);
    # uv_scale[0] is the spatial frequency, line_width the octave count
    # (static 4 used here; the field is kept for forward compat)
    if p is not None:
        from ..core.noise import fbm

        freq = tt.uv_scale[tid][..., 0]
        nval = 0.5 * (fbm(p * freq[..., None], octaves=4) + 1.0)
        v_noise = (tt.color0[tid]
                   + nval[..., None] * (tt.color1[tid] - tt.color0[tid]))
        out = jnp.where((ttype == TEX_NOISE)[..., None], v_noise, out)

    # bitmap.cpp: bilinear (or trilinear MIP) lookup with repeat wrapping
    if lod is None:
        v_bitmap = _bitmap_bilinear_level(tt, tid, uv_t, None)
    elif aniso:
        # anisotropic: average taps along the uv-space major axis (scaled
        # into texture space like uv itself); LOD already tracks the minor
        # axis, so elongated footprints stay sharp across and filtered along
        duv_t = duv_major * tt.uv_scale[tid]
        acc = 0.0
        for i in range(ewa_taps):
            w = (i + 0.5) / ewa_taps - 0.5
            acc = acc + _bitmap_trilinear(tt, tid, uv_t + w * duv_t, lod)
        v_bitmap = acc / ewa_taps
    else:
        v_bitmap = _bitmap_trilinear(tt, tid, uv_t, lod)
    out = jnp.where((ttype == TEX_BITMAP)[..., None], v_bitmap, out)

    if bary is not None:
        b1 = bary[..., 0]
        b2 = bary[..., 1]
        b0 = 1.0 - b1 - b2
        # prim < 0 marks lanes without valid triangle barycentrics (e.g.
        # analytic-sphere hits): bary branches fall back to color0 there
        tri_ok = jnp.ones(b0.shape, bool) if prim is None else (prim >= 0)

        # wireframe.cpp: edge color within line_width of a triangle edge
        # (barycentric distance; the reference measures world-space distance
        # — equivalent up to per-triangle scaling)
        edge = tri_ok & (jnp.minimum(jnp.minimum(b0, b1), b2) < lw)
        v_wire = jnp.where(edge[..., None], tt.color1[tid], tt.color0[tid])
        out = jnp.where((ttype == TEX_WIREFRAME)[..., None], v_wire, out)

        if prim is not None and tt.corner0.shape[0] > 1:
            ti = jnp.clip(prim, 0, tt.corner0.shape[0] - 1)
            attr = (b0[..., None] * tt.corner0[ti]
                    + b1[..., None] * tt.corner1[ti]
                    + b2[..., None] * tt.corner2[ti])
            attr = jnp.where(tri_ok[..., None], attr, tt.color0[tid])
            # vertexcolors.cpp: interpolated per-vertex colors
            out = jnp.where((ttype == TEX_VERTEXCOLORS)[..., None], attr, out)
            # curvature.cpp: signed curvature -> diverging red/blue map
            k = attr[..., 0] * tt.scale[tid, 0]
            pos = jnp.clip(k, 0.0, 1.0)
            neg = jnp.clip(-k, 0.0, 1.0)
            v_curv = jnp.stack([pos, jnp.zeros_like(pos), neg], axis=-1)
            v_curv = jnp.where(tri_ok[..., None], v_curv, tt.color0[tid])
            out = jnp.where((ttype == TEX_CURVATURE)[..., None], v_curv, out)

    curv_sel = ttype == TEX_CURVATURE  # scale already applied to curvature
    out = jnp.where(curv_sel[..., None], out, out * tt.scale[tid])
    return jnp.where((tex_id >= 0)[..., None], out, default)


def n_mip_levels(h, w):
    """Levels below base resolution available in the packed chain."""
    import numpy as np
    n = 0
    while (h >> (n + 1)) >= 1 and (w >> (n + 1)) >= 1:
        n += 1
    return n


def _bitmap_bilinear_level(tt: TextureTable, tid, uv, level):
    """Bilinear lookup at an integer MIP level (None/0 = base stack)."""
    bi = jnp.maximum(tt.bitmap_idx[tid], 0)
    h0 = tt.sizes[bi, 0]
    w0 = tt.sizes[bi, 1]
    if level is None:
        h = h0.astype(jnp.float32)
        w = w0.astype(jnp.float32)
        img = tt.stack
        sh, sw = tt.stack_hw[0], tt.stack_hw[1]
        row0 = jnp.zeros_like(h0)
    else:
        lv = jnp.maximum(level, 1)
        h_i = jnp.maximum(h0 >> lv, 1)
        w_i = jnp.maximum(w0 >> lv, 1)
        # packed chain: level l at row offset H - (H >> (l-1))
        row0 = h0 - jnp.maximum(h0 >> (lv - 1), 1)
        h = h_i.astype(jnp.float32)
        w = w_i.astype(jnp.float32)
        img = tt.mips
        sh, sw = tt.mips_hw[0], tt.mips_hw[1]

    # repeat wrap; v flipped (uv origin bottom-left, image row 0 top)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i, x1i = wrap(x0, w), wrap(x0 + 1, w)
    y0i, y1i = wrap(y0, h), wrap(y0 + 1, h)
    y0i = y0i + row0
    y1i = y1i + row0
    base0 = (bi * sh + y0i) * sw
    base1 = (bi * sh + y1i) * sw
    c00 = img[base0 + x0i]
    c10 = img[base0 + x1i]
    c01 = img[base1 + x0i]
    c11 = img[base1 + x1i]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def _bitmap_trilinear(tt: TextureTable, tid, uv, lod):
    """Trilinear MIP interpolation (TMIPMap::evalTrilinear analog)."""
    bi = jnp.maximum(tt.bitmap_idx[tid], 0)
    max_l = jnp.log2(jnp.maximum(
        jnp.minimum(tt.sizes[bi, 0], tt.sizes[bi, 1]).astype(jnp.float32),
        1.0))
    lod = jnp.clip(lod, 0.0, max_l - 1e-3)
    l0 = jnp.floor(lod).astype(jnp.int32)
    fl = (lod - l0.astype(jnp.float32))[..., None]
    lo = jnp.where((l0 == 0)[..., None],
                   _bitmap_bilinear_level(tt, tid, uv, None),
                   _bitmap_bilinear_level(tt, tid, uv, l0))
    hi = _bitmap_bilinear_level(tt, tid, uv, l0 + 1)
    return lo * (1.0 - fl) + hi * fl


def build_mip_chain(stack, sizes):
    """Host-side packed pyramid construction (numpy): 2x2 box downsample
    per level, level l >= 1 stored at row offset H - (H >> (l-1))."""
    import numpy as np
    B, H, W, _ = stack.shape
    out = np.zeros((B, H, max(W // 2, 1), 3), np.float32)
    for b in range(B):
        h, w = int(sizes[b, 0]), int(sizes[b, 1])
        img = stack[b, :h, :w]
        lvl = 1
        while h >> lvl >= 1 and w >> lvl >= 1:
            hh, ww = h >> lvl, w >> lvl
            img = img[: hh * 2, : ww * 2]
            img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                          + img[0::2, 1::2] + img[1::2, 1::2])
            row0 = h - max(h >> (lvl - 1), 1)
            out[b, row0: row0 + hh, :ww] = img
            lvl += 1
    return out


def bake_vertex_curvature(verts, faces, normals):
    """Per-vertex signed mean-curvature estimate via the umbrella Laplacian
    (host-side; curvature.cpp's differential-geometry role)."""
    import numpy as np
    V = verts.shape[0]
    acc = np.zeros((V, 3))
    cnt = np.zeros((V,))
    elen = np.zeros((V,))
    for a, b in ((0, 1), (1, 2), (2, 0)):
        i, j = faces[:, a], faces[:, b]
        np.add.at(acc, i, verts[j] - verts[i])
        np.add.at(cnt, i, 1.0)
        np.add.at(elen, i, np.linalg.norm(verts[j] - verts[i], axis=-1))
        np.add.at(acc, j, verts[i] - verts[j])
        np.add.at(cnt, j, 1.0)
        np.add.at(elen, j, np.linalg.norm(verts[j] - verts[i], axis=-1))
    cnt = np.maximum(cnt, 1.0)
    mean_e = np.maximum(elen / cnt, 1e-9)
    lap = acc / cnt[:, None]
    # umbrella operator ~ (e^2/2) * H * n: recover H with the e^2 scale.
    # signed: positive when the surface bends away from the normal (convex)
    return -2.0 * np.einsum("ij,ij->i", lap, normals) / (mean_e * mean_e)
