"""Rigid-body transforms as batched JAX arrays.

TPU-native counterpart of the reference's `cartographer/transform/`
(`rigid_transform.h` Rigid3<T>, `transform.h` angle/yaw helpers): instead of a
templated C++ class, a `Rigid3` NamedTuple pytree of a unit quaternion
``(w, x, y, z)`` and a translation, with every operation written to broadcast
over arbitrary leading batch dimensions so it composes with `vmap`/`scan`/`jit`.

All functions are pure and differentiable; float32 by default (the reference
uses float64 via Eigen — see SURVEY.md §7 "Numerics").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS = 1e-12


def quat_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) (w, x, y, z)."""
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a * b; (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q. Shapes broadcast on the left.

    Uses the expanded form (two cross products) rather than q*v*q^-1 — cheaper
    and VPU-friendly.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_inverse_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector (..., 3) -> quaternion (..., 4).

    Taylor-safe near zero.
    """
    angle_sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    half = 0.5 * angle
    small = angle_sq < 1e-10
    # sin(a/2)/a with series fallback 0.5 - a^2/48
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * axis_angle], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: quaternion (..., 4) -> rotation vector (..., 3)."""
    q = quat_normalize(q)
    # Force w >= 0 for the shortest arc.
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    vn_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn_sq, _EPS))
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn_sq < 1e-12
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / vn)
    return k * v


def quat_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Absolute rotation angle of quaternion(s); reference transform.h GetAngle."""
    q = quat_normalize(q)
    w = jnp.abs(q[..., 0])
    vn = jnp.linalg.norm(q[..., 1:4], axis=-1)
    return 2.0 * jnp.arctan2(vn, w)


def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_rotation_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), branch-free.

    Shepperd's method evaluated on all four branches and selected with
    `where` so it vectorizes (no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cs = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cs, axis=-1)[..., None]

    q = jnp.where(
        best == 0, qw, jnp.where(best == 1, qx, jnp.where(best == 2, qy, qz))
    )
    return quat_normalize(q)


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical linear interpolation from a (t=0) to b (t=1).

    Falls back to nlerp for nearly-parallel quaternions. `t` broadcasts.
    """
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(a) - 1 else jnp.asarray(t)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0.0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    near = dot > 1.0 - 1e-6
    wa = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    wb = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(wa * a + wb * b)


def quat_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw angle of the rotation (reference transform.h GetYaw: atan2 of
    rotated unit-x direction)."""
    d = quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0], dtype=q.dtype))
    return jnp.arctan2(d[..., 1], d[..., 0])


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * jnp.asarray(yaw)
    zero = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)], axis=-1)


def quat_remove_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Left-remove yaw: returns Rz(-yaw(q)) * q, the gravity-aligned residual
    rotation used throughout the reference's loop-closure initial guesses."""
    return quat_multiply(quat_from_yaw(-quat_yaw(q)), q)


def quat_from_two_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Shortest-arc rotation taking direction a to direction b
    (Eigen Quaterniond::FromTwoVectors analog; vectorized, antiparallel-safe)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    q = jnp.concatenate([1.0 + d, c], axis=-1)
    # Antiparallel: pick any axis orthogonal to a.
    ortho = jnp.cross(a, jnp.asarray([1.0, 0.0, 0.0], dtype=a.dtype))
    ortho2 = jnp.cross(a, jnp.asarray([0.0, 1.0, 0.0], dtype=a.dtype))
    ortho = jnp.where(
        jnp.linalg.norm(ortho, axis=-1, keepdims=True) < 1e-6, ortho2, ortho
    )
    ortho = ortho / jnp.maximum(jnp.linalg.norm(ortho, axis=-1, keepdims=True), _EPS)
    flip = jnp.concatenate([jnp.zeros_like(d), ortho], axis=-1)
    q = jnp.where(d < -(1.0 - 1e-6), flip, q)
    return quat_normalize(q)


def so3_hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector exponential to a rotation matrix."""
    return quat_to_rotation_matrix(quat_from_axis_angle(v))


def so3_log(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix log to a rotation vector."""
    return quat_to_axis_angle(quat_from_rotation_matrix(m))


class Rigid3(NamedTuple):
    """Rigid transform pytree: rotation quaternion (..., 4) wxyz + translation
    (..., 3). The batched analog of the reference's transform::Rigid3<T>."""

    rotation: jnp.ndarray
    translation: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Rigid3":
        return Rigid3(
            rotation=quat_identity(batch_shape, dtype),
            translation=jnp.zeros(batch_shape + (3,), dtype=dtype),
        )

    @staticmethod
    def from_parts(rotation, translation) -> "Rigid3":
        return Rigid3(jnp.asarray(rotation), jnp.asarray(translation))

    @staticmethod
    def translation_only(translation) -> "Rigid3":
        t = jnp.asarray(translation)
        return Rigid3(quat_identity(t.shape[:-1], t.dtype), t)

    @staticmethod
    def rotation_only(rotation) -> "Rigid3":
        q = jnp.asarray(rotation)
        return Rigid3(q, jnp.zeros(q.shape[:-1] + (3,), q.dtype))

    def compose(self, other: "Rigid3") -> "Rigid3":
        """self ∘ other (apply other first)."""
        return Rigid3(
            rotation=quat_normalize(quat_multiply(self.rotation, other.rotation)),
            translation=quat_rotate(self.rotation, other.translation)
            + self.translation,
        )

    def __matmul__(self, other: "Rigid3") -> "Rigid3":
        return self.compose(other)

    def inverse(self) -> "Rigid3":
        rot_inv = quat_conjugate(self.rotation)
        return Rigid3(
            rotation=rot_inv, translation=-quat_rotate(rot_inv, self.translation)
        )

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform point(s) (..., 3). Rotation broadcasts over points."""
        return quat_rotate(self.rotation, points) + self.translation

    def interpolate(self, other: "Rigid3", t) -> "Rigid3":
        """Pose interpolation: lerp translation, slerp rotation (reference
        transform.h Interpolate / LTB3D InterpolatePose)."""
        t = jnp.asarray(t)
        return Rigid3(
            rotation=quat_slerp(self.rotation, other.rotation, t),
            translation=self.translation
            + t[..., None] * (other.translation - self.translation)
            if t.ndim == self.translation.ndim - 1
            else self.translation + t * (other.translation - self.translation),
        )

    def astype(self, dtype) -> "Rigid3":
        return Rigid3(self.rotation.astype(dtype), self.translation.astype(dtype))


# ---------------------------------------------------------------------------
# Host-side numpy mirror. Pose-graph ingest and other host bookkeeping paths
# run at node rate with TINY operands; routing them through jnp costs one
# device dispatch (+ sync) per op, which dominates long-trajectory host loops
# (round-2 soak: 5k nodes). These mirrors keep the math on the host in
# float64 (the reference's Ceres/GTSAM precision for graph state).
# ---------------------------------------------------------------------------

import numpy as _np


def np_rigid(p: Rigid3, dtype=_np.float64) -> Rigid3:
    """Rigid3 re-backed by numpy arrays (one device→host transfer if the
    inputs live on device; all later math is dispatch-free)."""
    return Rigid3(
        _np.asarray(p.rotation, dtype), _np.asarray(p.translation, dtype)
    )


def np_quat_multiply(a: _np.ndarray, b: _np.ndarray) -> _np.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return _np.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def np_quat_conjugate(q: _np.ndarray) -> _np.ndarray:
    return q * _np.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def np_quat_rotate(q: _np.ndarray, v: _np.ndarray) -> _np.ndarray:
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = _np.cross(u, v)
    return v + 2.0 * (w * uv + _np.cross(u, uv))


def np_quat_yaw(q: _np.ndarray) -> float:
    d = np_quat_rotate(q, _np.asarray([1.0, 0.0, 0.0], dtype=q.dtype))
    return float(_np.arctan2(d[..., 1], d[..., 0]))


def np_compose(a: Rigid3, b: Rigid3) -> Rigid3:
    """a ∘ b on numpy-backed Rigid3 (see Rigid3.compose)."""
    q = np_quat_multiply(_np.asarray(a.rotation), _np.asarray(b.rotation))
    q = q / max(float(_np.linalg.norm(q)), 1e-12)
    return Rigid3(
        rotation=q,
        translation=np_quat_rotate(
            _np.asarray(a.rotation), _np.asarray(b.translation)
        )
        + _np.asarray(a.translation),
    )


def np_inverse(a: Rigid3) -> Rigid3:
    rot_inv = np_quat_conjugate(_np.asarray(a.rotation))
    return Rigid3(
        rotation=rot_inv,
        translation=-np_quat_rotate(rot_inv, _np.asarray(a.translation)),
    )


def np_quat_slerp(a: _np.ndarray, b: _np.ndarray, t: float) -> _np.ndarray:
    """Host numpy mirror of quat_slerp for scalar t (bookkeeping paths)."""
    a = _np.asarray(a, _np.float64)
    b = _np.asarray(b, _np.float64)
    dot = float(_np.dot(a, b))
    if dot < 0.0:
        b, dot = -b, -dot
    dot = min(dot, 1.0)
    if dot > 1.0 - 1e-6:
        out = (1.0 - t) * a + t * b
    else:
        theta = _np.arccos(min(dot, 1.0 - 1e-7))
        sin_theta = max(_np.sin(theta), 1e-12)
        out = (
            _np.sin((1.0 - t) * theta) / sin_theta * a
            + _np.sin(t * theta) / sin_theta * b
        )
    return out / max(float(_np.linalg.norm(out)), 1e-12)
