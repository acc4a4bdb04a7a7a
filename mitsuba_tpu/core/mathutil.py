"""Math utility tier: splines, quadrature, spherical harmonics, von
Mises-Fisher.

Reference coverage (SURVEY.md §2.1 "math utilities"):
* spline.cpp      — Catmull-Rom cubic interpolation + definite integral
* quad.cpp        — Gauss-Legendre / composite quadrature
* shvector.cpp    — real spherical harmonics basis eval + projection
* vmf.cpp         — von Mises-Fisher distribution (pdf/sample/fit)

All device functions are batched jnp; node/weight generation is host-side
numpy (numpy.polynomial supplies Gauss-Legendre — generated, not copied).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# --- splines (spline.cpp evalCubicInterp1D role) ----------------------------

def catmull_rom(x, xs, ys):
    """Evaluate the Catmull-Rom cubic through uniform-or-not nodes
    (xs (N,), ys (N,)) at batched x (...,). Clamps outside the domain."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    n = xs.shape[0]
    x = jnp.clip(jnp.asarray(x), xs[0], xs[-1])
    k = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0, n - 2)
    x0 = xs[k]
    x1 = xs[k + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    f0 = ys[k]
    f1 = ys[k + 1]
    # one-sided derivative estimates at the segment ends (non-uniform CR)
    km = jnp.maximum(k - 1, 0)
    kp = jnp.minimum(k + 2, n - 1)
    d0 = (f1 - ys[km]) / jnp.maximum(x1 - xs[km], 1e-12) * (x1 - x0)
    d1 = (ys[kp] - f0) / jnp.maximum(xs[kp] - x0, 1e-12) * (x1 - x0)
    t2 = t * t
    t3 = t2 * t
    return ((2 * t3 - 3 * t2 + 1) * f0 + (t3 - 2 * t2 + t) * d0
            + (-2 * t3 + 3 * t2) * f1 + (t3 - t2) * d1)


def integrate_catmull_rom(xs, ys) -> float:
    """Definite integral of the Catmull-Rom interpolant over its domain
    (host-side; spline.cpp integrateCubicInterp1D role)."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    n = len(xs)
    total = 0.0
    for k in range(n - 1):
        x0, x1 = xs[k], xs[k + 1]
        f0, f1 = ys[k], ys[k + 1]
        km, kp = max(k - 1, 0), min(k + 2, n - 1)
        h = x1 - x0
        d0 = (f1 - ys[km]) / max(x1 - xs[km], 1e-12) * h
        d1 = (ys[kp] - f0) / max(xs[kp] - x0, 1e-12) * h
        # integral of the Hermite basis over [0,1] times h
        total += h * (0.5 * (f0 + f1) + (d0 - d1) / 12.0)
    return float(total)


# --- quadrature (quad.cpp role) ----------------------------------------------

def gauss_legendre(n: int):
    """Nodes/weights on [-1, 1] (host-side, generated)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_lobatto(n: int):
    """Gauss-Lobatto nodes/weights on [-1, 1] (endpoints included):
    interior nodes are the roots of P'_{n-1} (eigen-free Newton solve)."""
    assert n >= 2
    # initial guesses: Chebyshev-Lobatto points
    x = np.cos(np.pi * np.arange(n) / (n - 1))
    P = np.zeros((n, n))
    x_old = np.full(n, 2.0)
    while np.max(np.abs(x - x_old)) > 1e-14:
        x_old = x.copy()
        P[:, 0] = 1.0
        P[:, 1] = x
        for k in range(2, n):
            P[:, k] = ((2 * k - 1) * x * P[:, k - 1]
                       - (k - 1) * P[:, k - 2]) / k
        x = x_old - (x * P[:, n - 1] - P[:, n - 2]) / (n * P[:, n - 1])
    w = 2.0 / ((n - 1) * n * P[:, n - 1] ** 2)
    order = np.argsort(x)
    return x[order], w[order]


def integrate(f, a: float, b: float, n: int = 64) -> float:
    """Host-side adaptive-free Gauss-Legendre integral of a python/numpy
    callable over [a, b]."""
    x, w = gauss_legendre(n)
    xm = 0.5 * (b + a) + 0.5 * (b - a) * x
    return float(0.5 * (b - a) * np.sum(w * np.asarray(f(xm))))


# --- real spherical harmonics (shvector.cpp role) ----------------------------

def sh_eval(d, order: int):
    """Real SH basis values for unit directions d (..., 3) up to ``order``
    (inclusive): returns (..., (order+1)^2) in the standard (l, m) layout.
    Hardcoded closed forms to l=3 (the range the reference's SHVector uses
    in practice for rotations/products)."""
    assert order <= 3, "sh_eval implements l <= 3"
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full(x.shape, 0.282094791773878)]
    if order >= 1:
        c = 0.488602511902920
        out += [-c * y, c * z, -c * x]
    if order >= 2:
        out += [
            1.092548430592079 * x * y,
            -1.092548430592079 * y * z,
            0.315391565252520 * (3 * z * z - 1.0),
            -1.092548430592079 * x * z,
            0.546274215296040 * (x * x - y * y),
        ]
    if order >= 3:
        out += [
            -0.590043589926644 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.457045799464466 * y * (5 * z * z - 1.0),
            0.373176332590115 * z * (5 * z * z - 3.0),
            -0.457045799464466 * x * (5 * z * z - 1.0),
            1.445305721320277 * z * (x * x - y * y),
            -0.590043589926644 * x * (x * x - 3 * y * y),
        ]
    return jnp.stack(out, axis=-1)


def sh_project(f_vals, dirs, weights, order: int):
    """Project sampled function values (N,) at unit dirs (N, 3) with
    quadrature weights (N,) onto SH up to ``order`` -> ((order+1)^2,)."""
    basis = sh_eval(dirs, order)
    return jnp.sum(f_vals[..., None] * weights[..., None] * basis, axis=0)


def sh_reconstruct(coeffs, dirs, order: int):
    return jnp.sum(coeffs * sh_eval(dirs, order), axis=-1)


# --- von Mises-Fisher (vmf.cpp role) -----------------------------------------

def vmf_pdf(cos_theta, kappa):
    """vMF density w.r.t. solid angle around the mean direction."""
    kappa = jnp.asarray(kappa)
    small = kappa < 1e-6
    norm = kappa / (4.0 * jnp.pi * jnp.sinh(jnp.where(small, 1.0, kappa)))
    val = norm * jnp.exp(kappa * (jnp.asarray(cos_theta) - 0.0))
    # numerically-stable form: k e^{k(c-1)} / (2 pi (1 - e^{-2k}))
    stable = (kappa * jnp.exp(kappa * (cos_theta - 1.0))
              / (2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa))))
    return jnp.where(small, 1.0 / (4.0 * jnp.pi), stable)


def vmf_sample(u, kappa):
    """Sample directions around +Z from a vMF with concentration kappa:
    u (..., 2) -> (..., 3) (inverse-CDF in cos theta, Jakob's trick)."""
    u = jnp.asarray(u)
    kappa = jnp.asarray(kappa)
    small = kappa < 1e-6
    k = jnp.where(small, 1.0, kappa)
    ct = 1.0 + jnp.log1p(
        jnp.exp(-2.0 * k) * u[..., 0] + (u[..., 0] - 1.0)
        * jnp.exp(-2.0 * k * 0.0) * (1.0 - jnp.exp(-2.0 * k)) * 0.0
        + (u[..., 0] - 1.0) * (1.0 - jnp.exp(-2.0 * k))) / k
    ct = jnp.where(small, 1.0 - 2.0 * u[..., 0], ct)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def vmf_fit(mean_cosine):
    """Concentration kappa from the mean resultant length (vmf.cpp
    forMeanCosine — Banerjee et al. approximation)."""
    r = jnp.clip(jnp.asarray(mean_cosine), 0.0, 0.9999)
    return r * (3.0 - r * r) / (1.0 - r * r)


# --- cylinder/AABB clipping (host-side, numpy) -----------------------------
# The ellipse construction from the cylinder/plane intersection, after
# geometrictools.com IntersectionCylinderPlane.pdf — the math behind the
# reference's Cylinder::getClippedAABB (src/shapes/cylinder.cpp:277-447)
# and its interactive cylclip inspector (src/utils/cylclip.cpp). Used by
# the mtsutil cylclip utility and by tight per-node hair/cylinder bounds.

def _np_coordinate_system(n):
    import numpy as np
    if abs(n[0]) > abs(n[1]):
        inv = 1.0 / np.sqrt(n[0] * n[0] + n[2] * n[2])
        a = np.array([n[2] * inv, 0.0, -n[0] * inv])
    else:
        inv = 1.0 / np.sqrt(n[1] * n[1] + n[2] * n[2])
        a = np.array([0.0, n[2] * inv, -n[1] * inv])
    return a, np.cross(n, a)


def cyl_naive_aabb(p0, p1, radius):
    """Exact (unclipped) AABB of a finite cylinder: per-component extent
    of the end-cap circles."""
    import numpy as np
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    axis = p1 - p0
    ln = np.linalg.norm(axis)
    d = axis / max(ln, 1e-30)
    s, t = _np_coordinate_system(d)
    x1, x2 = radius * s, radius * t
    rng = np.sqrt(x1 * x1 + x2 * x2)
    return (np.minimum(p0, p1) - rng, np.maximum(p0, p1) + rng)


def _cyl_plane_ellipse(plane_pt, plane_n, cyl_pt, cyl_d, radius):
    """Ellipse of an infinite cylinder cut by a plane: returns
    (center, axisA, axisB, lenA, lenB) or None when near-parallel."""
    import numpy as np
    if abs(np.dot(plane_n, cyl_d)) < 1e-7:
        return None
    A = cyl_d - np.dot(cyl_d, plane_n) * plane_n
    ln = np.linalg.norm(A)
    if ln != 0:
        A = A / ln
        B = np.cross(plane_n, A)
    else:
        A, B = _np_coordinate_system(plane_n)
    delta = plane_pt - cyl_pt
    delta_proj = delta - cyl_d * np.dot(delta, cyl_d)
    aD = np.dot(A, cyl_d)
    bD = np.dot(B, cyl_d)
    c0 = 1.0 - aD * aD
    c1 = 1.0 - bD * bD
    c2 = 2.0 * np.dot(A, delta_proj)
    c3 = 2.0 * np.dot(B, delta_proj)
    c4 = np.dot(delta, delta_proj) - radius * radius
    lam = (c2 * c2 / (4 * c0) + c3 * c3 / (4 * c1) - c4) / (c0 * c1)
    if lam < 0:
        return None
    center = plane_pt + (-c2 / (2 * c0)) * A + (-c3 / (2 * c1)) * B
    return center, A, B, np.sqrt(c1 * lam), np.sqrt(c0 * lam)


def _cyl_face_points(axis, fmin, fmax, cyl_pt, cyl_d, radius):
    """Points of the cylinder/face-plane ellipse lying inside the face
    rectangle: edge crossings + in-face componentwise ellipse extrema."""
    import numpy as np
    a1, a2 = (axis + 1) % 3, (axis + 2) % 3
    n = np.zeros(3)
    n[axis] = 1.0
    ell = _cyl_plane_ellipse(fmin, n, cyl_pt, cyl_d, radius)
    if ell is None:
        return []
    center, A, B, la, lb = ell
    if la < 1e-30 or lb < 1e-30:
        return []
    pts = []
    for i in range(4):
        p1 = np.zeros(3)
        p2 = np.zeros(3)
        p1[axis] = p2[axis] = fmin[axis]
        p1[a1] = fmin[a1] if ((i + 1) & 2) else fmax[a1]
        p1[a2] = fmin[a2] if ((i + 0) & 2) else fmax[a2]
        p2[a1] = fmin[a1] if ((i + 2) & 2) else fmax[a1]
        p2[a2] = fmin[a2] if ((i + 1) & 2) else fmax[a2]
        q1 = np.array([np.dot(p1 - center, A) / la,
                       np.dot(p1 - center, B) / lb])
        q2 = np.array([np.dot(p2 - center, A) / la,
                       np.dot(p2 - center, B) / lb])
        rel = q2 - q1
        qa = np.dot(rel, rel)
        qb = 2.0 * np.dot(q1, rel)
        qc = np.dot(q1, q1) - 1.0
        disc = qb * qb - 4 * qa * qc
        if disc >= 0 and qa > 0:
            sd = np.sqrt(disc)
            for x in ((-qb - sd) / (2 * qa), (-qb + sd) / (2 * qa)):
                if 0.0 <= x <= 1.0:
                    pts.append(p1 + (p2 - p1) * x)
    eA, eB = A * la, B * lb
    for j in (a1, a2):
        alpha, beta = eA[j], eB[j]
        nrm = np.sqrt(alpha * alpha + beta * beta)
        if nrm < 1e-30:
            continue
        ct, st = alpha / nrm, beta / nrm
        for sgn in (1.0, -1.0):
            p = center + sgn * (ct * eA + st * eB)
            if np.all(p >= fmin - 1e-9) and np.all(p <= fmax + 1e-9):
                pts.append(p)
    return pts


def cyl_clipped_aabb(p0, p1, radius, box_lo, box_hi):
    """Tight AABB of the (infinite-axis) cylinder clipped to box:
    accumulates the cylinder/face ellipse points over all 6 faces of the
    naive-AABB∩box base box, then clips to the box."""
    import numpy as np
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    box_lo = np.asarray(box_lo, np.float64)
    box_hi = np.asarray(box_hi, np.float64)
    nlo, nhi = cyl_naive_aabb(p0, p1, radius)
    blo = np.maximum(nlo, box_lo)
    bhi = np.minimum(nhi, box_hi)
    if np.any(blo > bhi):
        return blo, np.maximum(blo, bhi)
    d = (p1 - p0)
    d = d / max(np.linalg.norm(d), 1e-30)
    pts = []
    for axis in range(3):
        lo_face_min = blo.copy()
        lo_face_max = bhi.copy()
        lo_face_max[axis] = blo[axis]
        pts += _cyl_face_points(axis, lo_face_min, lo_face_max, p0, d,
                                radius)
        hi_face_min = blo.copy()
        hi_face_min[axis] = bhi[axis]
        pts += _cyl_face_points(axis, hi_face_min, bhi, p0, d, radius)
    if not pts:
        return blo, bhi
    pts = np.asarray(pts)
    lo = np.clip(pts.min(axis=0), box_lo, box_hi)
    hi = np.clip(pts.max(axis=0), box_lo, box_hi)
    return lo, hi
