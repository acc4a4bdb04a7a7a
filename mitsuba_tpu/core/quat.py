"""Quaternions + keyframe-interpolated rigid transforms.

Reference: include/mitsuba/core/quat.h (Quaternion) and track.h:508 /
track.cpp:394 (AnimatedTransform with per-keyframe translation / rotation
/ scale tracks, slerp'd rotation). TPU-native form: batched jnp quaternion
algebra plus an AnimatedTransform that decomposes keyframe matrices
host-side and evaluates pose(t) as a traced function of per-lane times —
the building block for transform motion blur (shapes/deformable.cpp role
is time-interpolated geometry on top of this).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def quat_multiply(a, b):
    """Hamilton product of (..., 4) quaternions stored (x, y, z, w)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_conjugate(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0])


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qv = q[..., :3]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., 3:4] * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis, angle_rad):
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    h = jnp.asarray(angle_rad) * 0.5
    return jnp.concatenate(
        [axis * jnp.sin(h)[..., None],
         jnp.cos(h)[..., None]], axis=-1)


def quat_to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrices."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
    ], axis=-2)


def quat_from_matrix(m) -> np.ndarray:
    """Host-side 3x3 rotation -> quaternion (Shepperd's method)."""
    m = np.asarray(m, np.float64)
    t = np.trace(m)
    if t > 0:
        w = np.sqrt(1.0 + t) / 2
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[i] = s / 4
        q[j] = (m[j, i] + m[i, j]) / s
        q[k] = (m[k, i] + m[i, k]) / s
        w = (m[k, j] - m[j, k]) / s
        x, y, z = q[0], q[1], q[2]
    return np.array([x, y, z, w], np.float32)


def slerp(q0, q1, t):
    """Spherical linear interpolation (track.h slerp path), batched over t.
    Falls back to nlerp for nearly-parallel quaternions."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    near = sin_t < 1e-5
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_t))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_t))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class AnimatedTransform:
    """Keyframe track of rigid(ish) transforms (track.cpp:394 semantics):
    each keyframe matrix is decomposed host-side into (translation,
    rotation quaternion, scale); ``eval(t)`` interpolates per-lane times
    with lerp(T), slerp(R), lerp(S) and returns batched (..., 3, 4) pose
    matrices. Times outside the track clamp to the end keyframes."""

    def __init__(self, times, transforms):
        from .transform import Transform

        assert len(times) == len(transforms) >= 1
        self.times = np.asarray(times, np.float32)
        trs, quats, scales = [], [], []
        for tr in transforms:
            m = tr.m if isinstance(tr, Transform) else np.asarray(tr)
            a = np.asarray(m, np.float64)
            t = a[:3, 3]
            rs = a[:3, :3]
            # polar-ish decomposition: scale = column norms (no shear support)
            s = np.linalg.norm(rs, axis=0)
            r = rs / s[None, :]
            trs.append(t)
            quats.append(quat_from_matrix(r))
            scales.append(s)
        # keep quaternion hemispheres consistent for shortest-arc slerp
        for i in range(1, len(quats)):
            if np.dot(quats[i], quats[i - 1]) < 0:
                quats[i] = -quats[i]
        self.trans = jnp.asarray(np.stack(trs), jnp.float32)
        self.quats = jnp.asarray(np.stack(quats), jnp.float32)
        self.scales = jnp.asarray(np.stack(scales), jnp.float32)
        self.jtimes = jnp.asarray(self.times)

    def eval(self, t):
        """t (...,) in track time units -> (..., 3, 4) affine poses."""
        t = jnp.asarray(t, jnp.float32)
        k = jnp.clip(
            jnp.searchsorted(self.jtimes, t, side="right") - 1,
            0, max(len(self.times) - 2, 0),
        )
        t0 = self.jtimes[k]
        t1 = self.jtimes[jnp.minimum(k + 1, len(self.times) - 1)]
        u = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        tr = (1 - u[..., None]) * self.trans[k] + u[..., None] * self.trans[
            jnp.minimum(k + 1, len(self.times) - 1)]
        q = slerp(self.quats[k],
                  self.quats[jnp.minimum(k + 1, len(self.times) - 1)],
                  u[..., None])
        sc = (1 - u[..., None]) * self.scales[k] + u[..., None] * self.scales[
            jnp.minimum(k + 1, len(self.times) - 1)]
        R = quat_to_matrix(q) * sc[..., None, :]
        return jnp.concatenate([R, tr[..., :, None]], axis=-1)

    def apply_point(self, t, p):
        A = self.eval(t)
        return jnp.einsum("...ij,...j->...i", A[..., :3], p) + A[..., 3]

    def apply_vector(self, t, v):
        A = self.eval(t)
        return jnp.einsum("...ij,...j->...i", A[..., :3], v)
