"""Chi-square goodness-of-fit harness for directional samplers.

Parity with the reference's flagship test idea (include/mitsuba/core/
chisquare.h:143-162 + src/tests/test_chisquare.cpp): verify that a
``sample()`` really draws from the density claimed by ``pdf()`` by
discretizing the sphere into (cos_theta, phi) cells, histogramming a large
batch of samples, numerically integrating the pdf per cell, and applying
Pearson's chi-square test with low-count cell pooling.

Vectorized end-to-end: one call histograms ~1e6 samples and integrates the
pdf on a midpoint subgrid in a single batched pdf evaluation.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of the chi-square distribution via the regularized
    upper incomplete gamma (scipy-free)."""
    from jax.scipy.special import gammainc

    return float(1.0 - gammainc(k / 2.0, x / 2.0))


def spherical_cell_of(d, res_theta: int, res_phi: int):
    """Map unit directions to cell indices over (cosθ, φ) — equal-area rows."""
    ct = np.clip(np.asarray(d[..., 2]), -1.0, 1.0)
    phi = np.arctan2(np.asarray(d[..., 1]), np.asarray(d[..., 0]))
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    it = np.minimum(((ct + 1.0) * 0.5 * res_theta).astype(np.int64), res_theta - 1)
    ip = np.minimum((phi / (2 * np.pi) * res_phi).astype(np.int64), res_phi - 1)
    return it * res_phi + ip


def chi2_test(
    sample_fn,
    pdf_fn,
    n_samples: int = 1_000_000,
    res_theta: int = 16,
    res_phi: int = 32,
    sub: int = 8,
    significance: float = 0.001,
    min_exp_cell: float = 5.0,
    sample_weight_fn=None,
):
    """Run the test.

    sample_fn(n) -> (n, 3) unit directions (may include invalid rows marked
    by zero vectors — they count into a discard bucket matching pdf mass
    outside the support only if pdf integrates < 1).
    pdf_fn(d (m, 3)) -> (m,) solid-angle density.

    Returns (passed: bool, p_value, stat, dof, info_str).
    """
    d = np.asarray(sample_fn(n_samples))
    valid = np.linalg.norm(d, axis=-1) > 0.5
    n_valid = int(valid.sum())
    cells = spherical_cell_of(d[valid], res_theta, res_phi)
    counts = np.bincount(cells, minlength=res_theta * res_phi).astype(np.float64)

    def integrate(s):
        """Midpoint integration of pdf per cell at subgrid factor s."""
        ct_edges = np.linspace(-1.0, 1.0, res_theta * s + 1)
        phi_edges = np.linspace(0.0, 2 * np.pi, res_phi * s + 1)
        ct_mid = 0.5 * (ct_edges[:-1] + ct_edges[1:])
        phi_mid = 0.5 * (phi_edges[:-1] + phi_edges[1:])
        CT, PH = np.meshgrid(ct_mid, phi_mid, indexing="ij")
        ST = np.sqrt(np.maximum(1.0 - CT * CT, 0.0))
        dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1)
        p = np.asarray(pdf_fn(jnp.asarray(dirs.reshape(-1, 3), jnp.float32)))
        p = p.reshape(res_theta * s, res_phi * s).astype(np.float64)
        cell_area = (2.0 / (res_theta * s)) * (2 * np.pi / (res_phi * s))
        return p.reshape(res_theta, s, res_phi, s).sum(axis=(1, 3)) * cell_area

    # Richardson check: cells where refinement still moves the integral hold
    # near-singular pdfs (e.g. the rough-dielectric TIR ring) that midpoint
    # quadrature cannot pin down — exclude them from the statistic (the
    # reference harness solves this with adaptive quadrature instead).
    p_coarse = integrate(sub)
    p_int = integrate(sub * 2)
    unreliable = np.abs(p_int - p_coarse) > np.maximum(0.03 * p_int, 2e-4)
    reliable = (~unreliable).reshape(-1)

    expected = (p_int * n_samples).reshape(-1)

    total_p = p_int.sum()
    # sanity: pdf should integrate to the fraction of valid samples
    # (allow slack proportional to the unreliable-cell mass)
    frac = n_valid / n_samples
    slack = 0.02 * max(frac, 1e-3) + 5e-3 + 1.5 * p_int.reshape(-1)[~reliable].sum()
    if abs(total_p - frac) > slack:
        return (
            False, 0.0, np.inf, 0,
            f"pdf integrates to {total_p:.5f} but sample() produced "
            f"{frac:.5f} valid fraction",
        )
    counts = counts[reliable]
    expected = expected[reliable]

    # pool low-expectation cells (chisquare.h pooling)
    order = np.argsort(expected)
    exp_sorted = expected[order]
    cnt_sorted = counts[order]
    pooled_exp, pooled_cnt = [], []
    acc_e = acc_c = 0.0
    for e, c in zip(exp_sorted, cnt_sorted):
        acc_e += e
        acc_c += c
        if acc_e >= min_exp_cell:
            pooled_exp.append(acc_e)
            pooled_cnt.append(acc_c)
            acc_e = acc_c = 0.0
    if acc_e > 0 and pooled_exp:
        pooled_exp[-1] += acc_e
        pooled_cnt[-1] += acc_c
    pooled_exp = np.asarray(pooled_exp)
    pooled_cnt = np.asarray(pooled_cnt)
    dof = len(pooled_exp) - 1
    if dof < 1:
        return False, 0.0, np.inf, 0, "too few cells with expected mass"
    stat = float(np.sum((pooled_cnt - pooled_exp) ** 2 / np.maximum(pooled_exp, 1e-9)))
    pval = _chi2_sf(stat, dof)
    passed = pval >= significance
    return (
        passed, pval, stat, dof,
        f"chi2={stat:.1f} dof={dof} p={pval:.5f} "
        f"(n={n_samples}, pdf_mass={total_p:.4f}, valid={frac:.4f})",
    )
