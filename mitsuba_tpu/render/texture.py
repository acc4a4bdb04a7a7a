"""Texture system (reference: src/textures/*, mipmap.h).

All bitmaps live in one padded stack array (B, Hmax, Wmax, 3) so a per-lane
gather with a dynamic texture index stays a single XLA gather — the TPU
replacement for per-plugin virtual Texture::eval. Procedural textures
(checkerboard, grid) are evaluated analytically and selected by type mask.

Parity: bitmap.cpp (bilinear; MIP/EWA arrives with the mipmap module),
checkerboard.cpp, gridtexture.cpp, scale.cpp (folded into uv/value transform
at build time), wireframe/curvature later.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1
TEX_BITMAP = 2
TEX_GRID = 3


class TextureTable(NamedTuple):
    type: jnp.ndarray        # (K,) int32
    color0: jnp.ndarray      # (K, 3) constant value / checker dark
    color1: jnp.ndarray      # (K, 3) checker bright / grid line color
    uv_scale: jnp.ndarray    # (K, 2)
    uv_offset: jnp.ndarray   # (K, 2)
    line_width: jnp.ndarray  # (K,) gridtexture line width
    scale: jnp.ndarray       # (K, 3) value multiplier (scale.cpp folded in)
    bitmap_idx: jnp.ndarray  # (K,) int32 into stack, -1 if procedural
    stack: jnp.ndarray       # (B, H, W, 3) padded bitmap stack (B >= 1)
    sizes: jnp.ndarray       # (B, 2) int32 (h, w) true sizes

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
            stack=jnp.zeros((1, 1, 1, 3)),
            sizes=jnp.ones((1, 2), jnp.int32),
        )


def eval_texture(tt: TextureTable, tex_id, uv, default):
    """Evaluate textures for a batch: tex_id (R,) int32 (-1 -> default),
    uv (R, 2), default (R, 3). Returns (R, 3)."""
    tid = jnp.maximum(tex_id, 0)
    ttype = tt.type[tid]
    uv_t = uv * tt.uv_scale[tid] + tt.uv_offset[tid]

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

    # bitmap.cpp: bilinear lookup with repeat wrapping
    v_bitmap = _bitmap_bilinear(tt, tid, uv_t)
    out = jnp.where((ttype == TEX_BITMAP)[..., None], v_bitmap, out)

    out = out * tt.scale[tid]
    return jnp.where((tex_id >= 0)[..., None], out, default)


def _bitmap_bilinear(tt: TextureTable, tid, uv):
    bi = jnp.maximum(tt.bitmap_idx[tid], 0)
    h = tt.sizes[bi, 0].astype(jnp.float32)
    w = tt.sizes[bi, 1].astype(jnp.float32)
    # repeat wrap; v flipped (uv origin bottom-left, image row 0 top)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i, x1i = wrap(x0, w), wrap(x0 + 1, w)
    y0i, y1i = wrap(y0, h), wrap(y0 + 1, h)
    c00 = tt.stack[bi, y0i, x0i]
    c10 = tt.stack[bi, y0i, x1i]
    c01 = tt.stack[bi, y1i, x0i]
    c11 = tt.stack[bi, y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
