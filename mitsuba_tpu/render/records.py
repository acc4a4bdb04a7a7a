"""Interaction & sampling records (reference: include/mitsuba/render/
common.h:82-238, shape.h Intersection).

Pytrees of batched arrays; `valid` masks replace the reference's
sentinel-t convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.frame import Frame


class Interaction(NamedTuple):
    """Surface interaction for a batch of rays (R lanes)."""

    valid: jnp.ndarray      # (R,) hit anything
    t: jnp.ndarray          # (R,) distance
    p: jnp.ndarray          # (R, 3) hit position
    gn: jnp.ndarray         # (R, 3) geometric normal
    sh_frame: Frame         # shading frame (n = interpolated normal)
    uv: jnp.ndarray         # (R, 2)
    wi: jnp.ndarray         # (R, 3) direction toward origin, *local frame*
    wi_world: jnp.ndarray   # (R, 3) direction toward origin, world
    mat_id: jnp.ndarray     # (R,) int32, -1 if invalid
    emitter_id: jnp.ndarray # (R,) int32, -1 if not emissive
    prim_id: jnp.ndarray    # (R,) int32 triangle id, or T + sphere id
    nee_pdf_area: jnp.ndarray  # (R,) precomputed area pdf of NEE for this prim
    bary: jnp.ndarray       # (R, 2) triangle barycentrics (b1, b2); zeros
                            # when synthesized away from a triangle hit


class DirectSample(NamedTuple):
    """Result of next-event estimation emitter sampling
    (reference DirectSamplingRecord, common.h:238)."""

    d: jnp.ndarray          # (R, 3) unit direction from ref point to emitter
    dist: jnp.ndarray       # (R,) distance to the sampled point
    radiance: jnp.ndarray   # (R, 3) emitted radiance toward ref (or delta value)
    pdf_sa: jnp.ndarray     # (R,) solid-angle pdf (1 for delta emitters)
    delta: jnp.ndarray      # (R,) bool: delta emitter (no BSDF-side MIS)
    valid: jnp.ndarray      # (R,) sample admissible (front-facing etc.)


class PositionSample(NamedTuple):
    """reference PositionSamplingRecord (common.h:82)."""

    p: jnp.ndarray          # (R, 3)
    n: jnp.ndarray          # (R, 3)
    uv: jnp.ndarray         # (R, 2)
    pdf_area: jnp.ndarray   # (R,)
    tri: jnp.ndarray        # (R,) int32 triangle sampled
