"""Shading frames (reference: include/mitsuba/core/frame.h).

A Frame is just a pytree of three (..., 3) arrays (s, t, n). Local-frame
trigonometry helpers follow the reference's Z-up convention: in local
coordinates the normal is +Z, so cos_theta(w) = w.z.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as m


class Frame(NamedTuple):
    s: jnp.ndarray  # (..., 3) tangent
    t: jnp.ndarray  # (..., 3) bitangent
    n: jnp.ndarray  # (..., 3) normal

    @staticmethod
    def from_normal(n):
        s, t = m.coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v):
        return jnp.stack(
            [m.dot(v, self.s), m.dot(v, self.t), m.dot(v, self.n)], axis=-1
        )

    def to_world(self, v):
        return (
            v[..., 0:1] * self.s + v[..., 1:2] * self.t + v[..., 2:3] * self.n
        )


# --- local-frame trig (w is a unit vector in local coords, normal = +Z) ---

def cos_theta(w):
    return w[..., 2]


def cos_theta_2(w):
    return w[..., 2] * w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin_theta_2(w):
    return jnp.maximum(0.0, 1.0 - w[..., 2] * w[..., 2])


def sin_theta(w):
    return jnp.sqrt(sin_theta_2(w))


def tan_theta(w):
    return m.safe_div(sin_theta(w), w[..., 2])


def tan_theta_2(w):
    ct2 = w[..., 2] * w[..., 2]
    return m.safe_div(jnp.maximum(0.0, 1.0 - ct2), ct2)


def sin_phi(w):
    st = sin_theta(w)
    return jnp.where(st > 1e-9, jnp.clip(m.safe_div(w[..., 1], st), -1.0, 1.0), 0.0)


def cos_phi(w):
    st = sin_theta(w)
    return jnp.where(st > 1e-9, jnp.clip(m.safe_div(w[..., 0], st), -1.0, 1.0), 1.0)


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0
