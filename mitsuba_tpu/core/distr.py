"""Discrete distributions (reference: include/mitsuba/core/pmf.h).

The reference builds a CDF over emitter weights and binary-searches it per
sample (DiscreteDistribution::sampleReuse, used by scene.cpp:834). Here the
CDF is a device array and sampling is a vectorized ``searchsorted`` — one
warp-wide binary search per lane, no data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiscreteDistribution(NamedTuple):
    cdf: jnp.ndarray        # (N,) inclusive normalized CDF, cdf[-1] == 1
    pmf: jnp.ndarray        # (N,) normalized probabilities
    normalization: jnp.ndarray  # scalar: sum of the original weights

    @staticmethod
    def from_weights(weights) -> "DiscreteDistribution":
        w = jnp.maximum(jnp.asarray(weights, dtype=jnp.float32), 0.0)
        total = jnp.sum(w)
        safe_total = jnp.where(total > 0, total, 1.0)
        pmf = w / safe_total
        cdf = jnp.cumsum(pmf)
        # force exact 1.0 at the end so u=1-eps can't fall off
        cdf = cdf / jnp.maximum(cdf[-1], 1e-30)
        return DiscreteDistribution(cdf=cdf, pmf=pmf, normalization=total)

    def sample(self, u):
        """u in [0,1) -> index (int32)."""
        idx = jnp.searchsorted(self.cdf, u, side="right")
        return jnp.clip(idx, 0, self.cdf.shape[0] - 1).astype(jnp.int32)

    def sample_reuse(self, u):
        """Sample and rescale u to [0,1) within the chosen bin
        (reference pmf.h sampleReuse) — preserves stratification."""
        idx = self.sample(u)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        p = jnp.maximum(self.pmf[idx], 1e-30)
        u_re = jnp.clip((u - lo) / p, 0.0, 1.0 - 1e-7)
        return idx, u_re

    def prob(self, idx):
        return self.pmf[idx]


def build_alias_table(weights: np.ndarray):
    """Walker alias table (host-side build): O(1) sampling alternative for
    very large emitter sets (e.g. envmap texels). Returns (prob, alias)."""
    w = np.asarray(weights, dtype=np.float64)
    n = len(w)
    p = w / w.sum() * n
    prob = np.zeros(n)
    alias = np.zeros(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
        alias[i] = i
    return prob.astype(np.float32), alias
