"""Math utility tier tests: quaternions/AnimatedTransform (track.cpp:394),
splines (spline.cpp), quadrature (quad.cpp), spherical harmonics
(shvector.cpp), von Mises-Fisher (vmf.cpp)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import mathutil as mu
from mitsuba_tpu.core import quat as Q
from mitsuba_tpu.core.transform import Transform


def test_quaternion_algebra():
    rng = np.random.default_rng(0)
    ax = rng.normal(size=3)
    q = Q.quat_from_axis_angle(ax, 0.7)
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    # quat rotation == matrix rotation
    R = np.asarray(Q.quat_to_matrix(q))
    got = np.asarray(Q.quat_rotate(q, v))
    want = np.asarray(v) @ R.T
    assert np.allclose(got, want, atol=1e-5)
    # composition: q*q == rotation by twice the angle
    q2 = Q.quat_multiply(q, q)
    want2 = np.asarray(Q.quat_rotate(Q.quat_from_axis_angle(ax, 1.4), v))
    assert np.allclose(np.asarray(Q.quat_rotate(q2, v)), want2, atol=1e-5)
    # round trip through matrix
    q_back = Q.quat_from_matrix(R)
    assert np.allclose(np.abs(np.dot(q_back, np.asarray(q))), 1.0, atol=1e-5)


def test_animated_transform_interpolation():
    t0 = Transform.translate([0, 0, 0])
    t1 = Transform.translate([2.0, 0, 0]) * Transform.rotate([0, 0, 1], 90.0)
    at = Q.AnimatedTransform([0.0, 1.0], [t0, t1])
    # endpoints match the keyframes
    p = jnp.asarray([[1.0, 0.0, 0.0]])
    assert np.allclose(np.asarray(at.apply_point(jnp.asarray([0.0]), p)),
                       [[1, 0, 0]], atol=1e-5)
    assert np.allclose(np.asarray(at.apply_point(jnp.asarray([1.0]), p)),
                       t1.apply_point([1.0, 0, 0]), atol=1e-5)
    # halfway: translation lerps, rotation slerps (45 deg)
    mid = np.asarray(at.apply_point(jnp.asarray([0.5]), p))[0]
    c = np.cos(np.pi / 4)
    assert np.allclose(mid, [1.0 + c, c, 0.0], atol=1e-4), mid
    # clamping outside the track
    lo = np.asarray(at.apply_point(jnp.asarray([-5.0]), p))[0]
    assert np.allclose(lo, [1, 0, 0], atol=1e-5)


def test_catmull_rom_spline():
    xs = np.linspace(0.0, np.pi, 24)
    ys = np.sin(xs)
    x = jnp.asarray(np.linspace(0.05, np.pi - 0.05, 200))
    got = np.asarray(mu.catmull_rom(x, xs, ys))
    assert np.allclose(got, np.sin(np.asarray(x)), atol=2e-3)
    # definite integral of sin over [0, pi] = 2
    assert abs(mu.integrate_catmull_rom(xs, ys) - 2.0) < 5e-3


def test_quadrature():
    # Gauss-Legendre integrates polynomials of degree 2n-1 exactly
    x, w = mu.gauss_legendre(8)
    assert abs(np.sum(w * x**10) - 2.0 / 11.0) < 1e-12
    xl, wl = mu.gauss_lobatto(8)
    assert abs(xl[0] + 1.0) < 1e-12 and abs(xl[-1] - 1.0) < 1e-12
    assert abs(np.sum(wl) - 2.0) < 1e-12
    assert abs(np.sum(wl * xl**8) - 2.0 / 9.0) < 1e-10
    assert abs(mu.integrate(np.exp, 0.0, 1.0) - (np.e - 1.0)) < 1e-12


def test_spherical_harmonics_orthonormal():
    # Monte-Carlo orthonormality of the real SH basis up to l=3
    rng = np.random.default_rng(1)
    n = 400_000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    B = np.asarray(mu.sh_eval(jnp.asarray(d, jnp.float32), 3))
    G = (B.T @ B) * (4 * np.pi / n)
    assert np.allclose(G, np.eye(16), atol=0.03), np.abs(G - np.eye(16)).max()
    # projection round trip of a smooth function: f = 1 + z
    f = 1.0 + d[:, 2]
    w = np.full(n, 4 * np.pi / n)
    coeffs = np.asarray(mu.sh_project(jnp.asarray(f, jnp.float32),
                                      jnp.asarray(d, jnp.float32),
                                      jnp.asarray(w, jnp.float32), 3))
    rec = np.asarray(mu.sh_reconstruct(jnp.asarray(coeffs),
                                       jnp.asarray(d[:1000], jnp.float32), 3))
    assert np.allclose(rec, f[:1000], atol=0.02)


def test_vmf():
    # pdf integrates to 1 over the sphere; sampling matches the pdf moments
    kappa = 8.0
    ct = np.linspace(-1, 1, 20001)
    pdf = np.asarray(mu.vmf_pdf(jnp.asarray(ct), kappa))
    total = np.trapezoid(pdf, ct) * 2 * np.pi
    assert abs(total - 1.0) < 1e-3, total
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((200_000, 2)), jnp.float32)
    d = np.asarray(mu.vmf_sample(u, kappa))
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    mean_ct = d[:, 2].mean()
    # analytic mean cosine: coth(k) - 1/k
    want = 1.0 / np.tanh(kappa) - 1.0 / kappa
    assert abs(mean_ct - want) < 5e-3, (mean_ct, want)
    # fit recovers kappa from the mean cosine
    k_fit = float(mu.vmf_fit(jnp.asarray(mean_ct)))
    assert abs(k_fit - kappa) / kappa < 0.1, k_fit


def test_cyl_clipped_aabb_tight_vs_sampling():
    """cylclip math (cylinder.cpp:277-447 ellipse construction): the
    clipped AABB must cover — and be within 2% of — the bounds of densely
    sampled cylinder-surface points inside the clip box."""
    import numpy as np
    from mitsuba_tpu.core.mathutil import cyl_clipped_aabb

    rng = np.random.RandomState(7)
    for _ in range(5):
        p0 = rng.uniform(-1, 1, 3)
        p1 = rng.uniform(-1, 1, 3)
        if np.linalg.norm(p1 - p0) < 0.5:
            p1 = p0 + np.array([0.0, 0.0, 1.0])
        r = rng.uniform(0.05, 0.3)
        box_lo = np.minimum(p0, p1) - r * 0.5
        box_hi = np.maximum(p0, p1) + r * 0.5
        lo, hi = cyl_clipped_aabb(p0, p1, r, box_lo, box_hi)
        ts = rng.rand(60000, 1)
        phi = rng.rand(60000) * 2 * np.pi
        axis = p1 - p0
        d = axis / np.linalg.norm(axis)
        a = (np.array([1.0, 0, 0]) if abs(d[0]) < 0.9
             else np.array([0, 1.0, 0]))
        s = np.cross(d, a)
        s /= np.linalg.norm(s)
        t2 = np.cross(d, s)
        pts = p0 + ts * axis + r * (np.cos(phi)[:, None] * s
                                    + np.sin(phi)[:, None] * t2)
        inb = np.all((pts >= box_lo) & (pts <= box_hi), axis=1)
        if inb.sum() < 100:
            continue
        mc_lo, mc_hi = pts[inb].min(0), pts[inb].max(0)
        ext = np.maximum(box_hi - box_lo, 1e-6)
        assert np.all(lo <= mc_lo + 1e-3 * ext)
        assert np.all(hi >= mc_hi - 1e-3 * ext)
        assert np.all(mc_lo <= lo + 0.05 * ext)
        assert np.all(mc_hi >= hi - 0.05 * ext)
