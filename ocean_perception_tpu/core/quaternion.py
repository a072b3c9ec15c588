"""Unit-quaternion utilities for the error-state EKF.

Convention: ``q = [w, x, y, z]`` (scalar first), Hamilton product, world-frame
rotation ``p' = R(q) p``. The reference EKF (src/vehicle/vio/state_ekf.cpp)
uses Eigen quaternions with the same Hamilton convention; only the storage
order differs and is documented here to avoid parity mistakes in tests.
All functions are jit/vmap safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
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


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q: R(q) v."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector → unit quaternion (exp map).

    Parity: state_ekf.cpp predict step ``q ← exp(dt*w) ⊗ q`` uses the same
    half-angle construction.
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-8
    theta_safe = jnp.where(small, 1.0, theta)
    s = jnp.where(small, 0.5 - theta**2 / 48.0, jnp.sin(half) / theta_safe)
    return jnp.concatenate([jnp.cos(half), s * w], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → rotation vector (log map)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # shortest arc
    qv = q[..., 1:4]
    sin_half = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    cos_half = q[..., 0:1]
    half = jnp.arctan2(sin_half, cos_half)
    small = sin_half < 1e-8
    scale = jnp.where(small, 2.0 / jnp.clip(cos_half, 1e-6), 2.0 * half / jnp.where(small, 1.0, sin_half))
    return scale * qv


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix → unit quaternion [w,x,y,z] (branch-free Shepperd).

    Computes all four candidate quaternions (one per dominant component) and
    selects the numerically best with ``jnp.where`` so it is trace-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    sw = jnp.sqrt(jnp.clip(tw, 1e-12)) * 0.5
    sx = jnp.sqrt(jnp.clip(tx, 1e-12)) * 0.5
    sy = jnp.sqrt(jnp.clip(ty, 1e-12)) * 0.5
    sz = jnp.sqrt(jnp.clip(tz, 1e-12)) * 0.5

    qw = jnp.stack([sw, (m21 - m12) / (4 * sw), (m02 - m20) / (4 * sw), (m10 - m01) / (4 * sw)], axis=-1)
    qx = jnp.stack([(m21 - m12) / (4 * sx), sx, (m01 + m10) / (4 * sx), (m02 + m20) / (4 * sx)], axis=-1)
    qy = jnp.stack([(m02 - m20) / (4 * sy), (m01 + m10) / (4 * sy), sy, (m12 + m21) / (4 * sy)], axis=-1)
    qz = jnp.stack([(m10 - m01) / (4 * sz), (m02 + m20) / (4 * sz), (m12 + m21) / (4 * sz), sz], axis=-1)

    ts = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(ts, axis=-1)
    qs = jnp.stack([qw, qx, qy, qz], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(jnp.where(q[..., 0:1] < 0, -q, q))
