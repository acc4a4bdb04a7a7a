"""Reconstruction filters (reference: src/rfilters/*, rfilter.h).

Parity: box, tent, gaussian, mitchell, catmullrom, lanczos — evaluated
directly on the VPU (the reference discretizes into a lookup table for
scalar CPUs; direct evaluation is cheaper here).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BOX = 0
TENT = 1
GAUSSIAN = 2
MITCHELL = 3
CATMULLROM = 4
LANCZOS = 5

RADIUS = {
    BOX: 0.5,
    TENT: 1.0,
    GAUSSIAN: 2.0,
    MITCHELL: 2.0,
    CATMULLROM: 2.0,
    LANCZOS: 3.0,
}


def eval_1d(ftype: int, x):
    """Filter value at (1D) offset x; filters are separable products."""
    ax = jnp.abs(x)
    if ftype == BOX:
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if ftype == TENT:
        return jnp.maximum(0.0, 1.0 - ax)
    if ftype == GAUSSIAN:
        # gaussian.cpp: stddev 0.5, offset so it reaches 0 at the radius
        sigma = 0.5
        r = RADIUS[GAUSSIAN]
        alpha = -1.0 / (2.0 * sigma * sigma)
        return jnp.maximum(0.0, jnp.exp(alpha * ax * ax) - np.exp(alpha * r * r))
    if ftype in (MITCHELL, CATMULLROM):
        if ftype == MITCHELL:
            B = C = 1.0 / 3.0
        else:
            B, C = 0.0, 0.5
        x2, x3 = ax * ax, ax * ax * ax
        inner = (
            (12.0 - 9.0 * B - 6.0 * C) * x3
            + (-18.0 + 12.0 * B + 6.0 * C) * x2
            + (6.0 - 2.0 * B)
        ) / 6.0
        outer = (
            (-B - 6.0 * C) * x3
            + (6.0 * B + 30.0 * C) * x2
            + (-12.0 * B - 48.0 * C) * ax
            + (8.0 * B + 24.0 * C)
        ) / 6.0
        return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))
    if ftype == LANCZOS:
        tau = 3.0

        def sinc(t):
            t = jnp.abs(t) * jnp.pi
            return jnp.where(t < 1e-6, 1.0, jnp.sin(t) / jnp.maximum(t, 1e-12))

        return jnp.where(ax < tau, sinc(ax) * sinc(ax / tau), 0.0)
    raise ValueError(ftype)


def footprint(ftype: int) -> int:
    """Half-width in whole pixels of the splat footprint (>= 1 so even the
    box filter's single containing pixel is covered by the tap window)."""
    return max(1, int(np.ceil(RADIUS[ftype] - 0.5 + 1e-6)))
