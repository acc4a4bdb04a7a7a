"""Film accumulation (reference: imageblock.h put(), film.h, hdrfilm.cpp).

The reference splats every sample into a bordered per-block Bitmap with
filter-weighted accumulation (ImageBlock::put, imageblock.h:122-142) and
reassembles blocks into the film. Here the film is one (H, W, 4) device
array (RGB + filter weight) and a whole wavefront of samples is splatted
with a single scatter-add per footprint tap — deterministic given sample
order, and differentiable (the splat is linear).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rfilter


class Film(NamedTuple):
    data: jnp.ndarray  # (H, W, 4): rgb-weighted sum + weight

    @staticmethod
    def empty(height: int, width: int) -> "Film":
        return Film(data=jnp.zeros((height, width, 4)))

    @property
    def height(self):
        return self.data.shape[0]

    @property
    def width(self):
        return self.data.shape[1]


def splat(film: Film, pos, value, filter_type: int = rfilter.GAUSSIAN) -> Film:
    """Accumulate samples: pos (R, 2) in continuous pixel coordinates
    (x, y), value (R, 3) radiance. NaN/negative samples are dropped with the
    same policy as ImageBlock::put's warnInvalid."""
    H, W = film.height, film.width
    finite = jnp.all(jnp.isfinite(value), axis=-1) & jnp.all(value > -1e-5, axis=-1)
    value = jnp.where(finite[..., None], value, 0.0)

    fp = rfilter.footprint(filter_type)
    # pixel whose center is nearest below/at the sample
    base_x = jnp.floor(pos[..., 0] - 0.5).astype(jnp.int32)
    base_y = jnp.floor(pos[..., 1] - 0.5).astype(jnp.int32)

    data = film.data
    updates = []
    idx_y = []
    idx_x = []
    for oy in range(-fp + 1, fp + 1):
        py = base_y + oy
        wy = rfilter.eval_1d(filter_type, py.astype(jnp.float32) + 0.5 - pos[..., 1])
        for ox in range(-fp + 1, fp + 1):
            px = base_x + ox
            wx = rfilter.eval_1d(filter_type, px.astype(jnp.float32) + 0.5 - pos[..., 0])
            w = wx * wy * finite.astype(jnp.float32)
            inside = (px >= 0) & (px < W) & (py >= 0) & (py < H)
            w = jnp.where(inside, w, 0.0)
            contrib = jnp.concatenate(
                [value * w[..., None], w[..., None]], axis=-1
            )
            updates.append(contrib)
            idx_y.append(jnp.clip(py, 0, H - 1))
            idx_x.append(jnp.clip(px, 0, W - 1))

    ys = jnp.concatenate(idx_y)
    xs = jnp.concatenate(idx_x)
    ups = jnp.concatenate(updates)
    data = data.at[ys, xs].add(ups, mode="drop")
    return Film(data=data)


def splat_grid(film: Film, pos, value, filter_type: int, row0=0) -> Film:
    """Fast filter splat for the regular one-sample-per-pixel-lane layout.

    ``pos`` (rows, W, 2) continuous positions (each in its own pixel),
    ``value`` (rows, W, 3); the tile's first row is global row ``row0``
    (traced ok — used by dp-sharded tiles). Because every sample lives in a
    distinct pixel, the footprint-F scatter becomes F^2 shifted *dense*
    adds — no scatter-add, ~20x faster on TPU and exactly equal to
    ``splat`` up to float addition order.
    """
    H, W = film.height, film.width
    rows = value.shape[0]
    fp = rfilter.footprint(filter_type)

    finite = jnp.all(jnp.isfinite(value), axis=-1) & jnp.all(value > -1e-5, axis=-1)
    value = jnp.where(finite[..., None], value, 0.0)
    wmask = finite.astype(jnp.float32)

    # pixel index of each sample within the tile
    py = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1).astype(jnp.float32)

    # accumulate taps into a padded canvas (dense shifted adds), then crop.
    # canvas row 0 = global row (row0 - pad); col 0 = global col -pad.
    pad = fp
    contrib = jnp.concatenate([value, jnp.ones_like(value[..., :1])], axis=-1)
    canvas = jnp.zeros((rows + 2 * pad, W + 2 * pad, 4))
    # the stencil is pixel-centered (not sample-centered like `splat`), so
    # it needs the full (2fp+1)^2 window to cover every reachable pixel
    for oy in range(-fp, fp + 1):
        wy = rfilter.eval_1d(filter_type, py + oy + 0.5 - pos[..., 1])
        for ox in range(-fp, fp + 1):
            wx = rfilter.eval_1d(filter_type, px + ox + 0.5 - pos[..., 0])
            w = (wx * wy * wmask)[..., None]
            canvas = canvas + jnp.pad(
                contrib * w,
                ((pad + oy, pad - oy), (pad + ox, pad - ox), (0, 0)),
            )
    big = jnp.zeros((H + 2 * pad, W + 2 * pad, 4))
    big = jax.lax.dynamic_update_slice(big, canvas, (row0, 0, 0))
    data = film.data + big[pad:-pad, pad:-pad]
    return Film(data=data)


def splat_aligned(film: Film, value_image) -> Film:
    """Fast path for samplers that produce exactly one jittered sample per
    pixel with a box filter: value_image (H, W, 3) adds directly."""
    H, W = film.height, film.width
    finite = jnp.all(jnp.isfinite(value_image), axis=-1, keepdims=True)
    v = jnp.where(finite, value_image, 0.0)
    add = jnp.concatenate([v, finite.astype(jnp.float32)], axis=-1)
    return Film(data=film.data + add)


def develop(film: Film):
    """Normalize accumulated splats -> (H, W, 3) radiance image
    (Film::develop)."""
    w = film.data[..., 3:4]
    return film.data[..., :3] / jnp.maximum(w, 1e-12)


def develop_ldr(film: Film, tonemap: str = "gamma", gamma: float = -1.0,
                exposure: float = 0.0, key: float = 0.18,
                burn: float = 0.0):
    """ldrfilm.cpp: tonemapped low-dynamic-range develop in [0, 1].

    tonemap='gamma': exposure scale + gamma curve (gamma<0 -> sRGB).
    tonemap='reinhard': photographic operator (Reinhard et al., the
    ldrfilm.cpp 'reinhard' method with key/burn)."""
    img = develop(film) * (2.0 ** exposure)
    if tonemap == "reinhard":
        # luminance-based photographic tonemapper (ldrfilm.cpp:L>200)
        lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
               + 0.072169 * img[..., 2])
        log_avg = jnp.exp(jnp.mean(jnp.log(1e-3 + lum)))
        scale = key / log_avg
        lw = lum * scale
        # ldrfilm.cpp: invWp2 = 1 / (Lwhite^2 (1-burn)^4) — burn -> 1 drives
        # invWp2 up, clipping MORE highlights (round-1 had this inverted)
        lwhite = jnp.maximum(jnp.max(lw), 1e-3)
        inv_wp2 = 1.0 / (lwhite * lwhite
                         * jnp.maximum(1.0 - burn, 1e-8) ** 4)
        ld = lw * (1.0 + lw * inv_wp2) / (1.0 + lw)
        img = img * m_safe_div(ld, lum)[..., None]
    if gamma < 0:
        a = jnp.abs(img)
        img = jnp.sign(img) * jnp.where(
            a <= 0.0031308, 12.92 * a,
            1.055 * jnp.power(jnp.maximum(a, 1e-12), 1.0 / 2.4) - 0.055)
    else:
        img = jnp.power(jnp.maximum(img, 0.0), 1.0 / gamma)
    return jnp.clip(img, 0.0, 1.0)


def m_safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-12, 1.0, b) * (jnp.abs(b) >= 1e-12)


def develop_tiled(film: Film, tile: int = 64):
    """tiledhdrfilm.cpp analog: develop one tile at a time on the host so
    images far larger than device memory stream out of HBM tile-by-tile.
    Yields ((y0, x0), tile_image)."""
    H, W = film.height, film.width
    for y0 in range(0, H, tile):
        for x0 in range(0, W, tile):
            block = film.data[y0:y0 + tile, x0:x0 + tile]
            w = block[..., 3:4]
            yield (y0, x0), block[..., :3] / jnp.maximum(w, 1e-12)
