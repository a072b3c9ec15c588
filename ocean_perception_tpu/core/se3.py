"""SE(3)/SO(3) Lie-group operations as pure JAX functions.

Reference parity: src/vehicle/core/transform_util.{hpp,cpp} — ``skew``,
``expmap_se3`` / ``logmap_se3`` (twist convention x = [t(3), w(3)]),
``inverse_se3``, ``GetGravityAxis``. All functions here are jit/vmap/grad
compatible and written with Taylor-safe small-angle branches (via
``jnp.where`` rather than data-dependent Python branching) so they are valid
inside any traced computation.

Transforms are represented as 4x4 homogeneous matrices (row-major), matching
the reference's Matrix4d. Batched variants come free via ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector → 3x3 skew-symmetric matrix (transform_util.cpp skew)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# NOTE on AD safety: these helpers are differentiated through by the VIO
# smoother's autodiff linearization, usually AT the identity (delta = 0).
# norm/arccos have NaN/inf derivatives at 0, so every small-angle branch is
# written in terms of theta^2 = sum(w^2) (smooth everywhere) and the sqrt is
# only evaluated on a where-guarded safe value.


def _sinc_sq(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """sin(t)/t with t = sqrt(theta_sq); AD-safe at 0."""
    small = theta_sq < 1e-10
    t = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    return jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(t) / t)


def _cosc_sq(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(t))/t^2; AD-safe at 0."""
    small = theta_sq < 1e-10
    t_sq = jnp.where(small, 1.0, theta_sq)
    t = jnp.sqrt(t_sq)
    return jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(t)) / t_sq)


def _vc_sq(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """(t - sin(t))/t^3; AD-safe at 0."""
    small = theta_sq < 1e-10
    t_sq = jnp.where(small, 1.0, theta_sq)
    t = jnp.sqrt(t_sq)
    return jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (t - jnp.sin(t)) / (t_sq * t))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector → rotation matrix (Rodrigues; fast_skewexp parity)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    S = skew(w)
    S2 = S @ S
    a = _sinc_sq(theta_sq)[..., None, None]
    b = _cosc_sq(theta_sq)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), S.shape)
    return eye + a * S + b * S2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → rotation vector (skewcoords/logmap parity).

    AD-safe at the identity: the small-angle scale is a polynomial in
    u = 1 - cos(theta) (smooth), never touching arccos'(1).
    """
    # Trace-based angle.
    tr = jnp.trace(R)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    u = 1.0 - cos_theta
    # Antisymmetric part gives axis*sin(theta).
    v = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin_sq = jnp.clip(1.0 - cos_theta * cos_theta, 0.0, 1.0)
    small = sin_sq < 1e-12
    theta = jnp.arccos(jnp.where(small, 0.0, cos_theta))  # guarded arccos
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, sin_sq))
    # Generic: w = theta/(2 sin) * v. Small angle: series in u = 1 - cos:
    # theta/(2 sin) = 1/2 + u/6 + u^2/15 + O(u^3).
    scale = jnp.where(
        small, 0.5 + u / 6.0 + u * u / 15.0, theta / (2.0 * sin_theta)
    )
    w_generic = scale * v
    # Near pi the antisymmetric part vanishes: recover axis from diagonal.
    near_pi = cos_theta < -0.99
    theta_pi = jnp.arccos(jnp.clip(cos_theta, -1.0, -0.5))  # smooth in this branch
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta) / jnp.where(u < 1e-9, 1.0, u), 0.0, None)
    axis = jnp.sqrt(axis_sq + 1e-12)
    # Fix axis signs using off-diagonal sums (R + R^T terms).
    sx = jnp.sign(jnp.where(jnp.abs(v[..., 0]) > 1e-9, v[..., 0], 1.0))
    sy = jnp.where(R[..., 0, 1] + R[..., 1, 0] >= 0.0, sx, -sx)
    sz = jnp.where(R[..., 0, 2] + R[..., 2, 0] >= 0.0, sx, -sx)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    w_pi = theta_pi[..., None] * axis
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """V matrix of SE(3) exp (transform_util.cpp expmap_se3 V term)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    S = skew(w)
    S2 = S @ S
    b = _cosc_sq(theta_sq)[..., None, None]
    c = _vc_sq(theta_sq)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), S.shape)
    return eye + b * S + c * S2


def se3_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Twist [t(3), w(3)] → 4x4 transform (transform_util.cpp expmap_se3)."""
    t, w = x[..., :3], x[..., 3:6]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    trans = jnp.einsum("...ij,...j->...i", V, t)
    T = jnp.zeros(x.shape[:-1] + (4, 4), dtype=x.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(trans)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform → twist [t(3), w(3)] (transform_util.cpp logmap_se3)."""
    R = T[..., :3, :3]
    w = so3_log(R)
    V = _so3_left_jacobian(w)
    t = jnp.linalg.solve(V, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([t, w], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse (transform_util.cpp inverse_se3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Tinv = jnp.zeros_like(T)
    Tinv = Tinv.at[..., :3, :3].set(Rt)
    Tinv = Tinv.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    Tinv = Tinv.at[..., 3, 3].set(1.0)
    return Tinv


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A @ B for 4x4 transforms."""
    return A @ B


def se3_transform(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply transform to (..., 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, points) + t


def gravity_axis(n_gravity) -> tuple[int, jnp.ndarray]:
    """Dominant gravity axis index and signed unit vector.

    Reference parity: transform_util.cpp GetGravityAxis — picks the axis with
    the largest |component| of the configured world gravity vector; the depth
    sensor measures along this axis. Static (config-time) so computed with
    plain numpy semantics on concrete values.
    """
    import numpy as np

    g = np.asarray(n_gravity, dtype=np.float64)
    axis = int(np.argmax(np.abs(g)))
    if abs(g[axis]) <= 0:
        raise ValueError(f"zero gravity vector: {g}")
    unit = np.zeros(3)
    unit[axis] = np.sign(g[axis])
    return axis, jnp.asarray(unit)
