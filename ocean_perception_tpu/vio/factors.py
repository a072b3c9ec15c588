"""Standalone measurement factors and initialization helpers.

Reference parity:
- MagPoseFactor (vio/mag_pose_factor.hpp:17-84): residual between the
  measured body-frame magnetic field and the world field rotated into the
  body: r = (R_world_body^T · (scale·local_field) + bias) - measured.
- SingleAxisFactor (vio/single_axis_factor.hpp:11-45): translation prior on
  one axis (the depth factor inside the smoother).
- EstimateAttitude (vio/state_estimator_util.hpp:28-40 +
  attitude_measurement.hpp): roll/pitch from the accelerometer at rest —
  find world_R_body aligning the measured specific force with -gravity.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.se3 import so3_exp


def mag_residual(
    R_world_body: jnp.ndarray,   # (3,3)
    measured_field: jnp.ndarray,  # (3,) sensor frame (== body by default)
    local_field: jnp.ndarray,     # (3,) world-frame unit field direction
    scale: float = 1.0,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    pred = R_world_body.T @ (scale * local_field)
    if bias is not None:
        pred = pred + bias
    return pred - measured_field


def single_axis_residual(p: jnp.ndarray, axis_unit: jnp.ndarray, measured: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(axis_unit, p) - measured


def estimate_attitude(accel_body: jnp.ndarray, n_gravity: jnp.ndarray) -> jnp.ndarray:
    """world_R_body from a specific-force measurement at rest.

    At rest the accelerometer reads f = -R^T g (specific force opposing
    gravity); find the smallest rotation mapping the measured direction onto
    -g's direction. Yaw is unobservable and left at zero about the gravity
    axis (EstimateAttitude parity).
    """
    f = accel_body / jnp.maximum(jnp.linalg.norm(accel_body), 1e-9)
    g_unit = n_gravity / jnp.maximum(jnp.linalg.norm(n_gravity), 1e-9)
    target = -g_unit  # world direction that body-frame f should map to
    # Rotation taking f (in body) to target (in world): axis = f x target.
    axis = jnp.cross(f, target)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(f, target)
    angle = jnp.arctan2(s, c)
    axis = jnp.where(s > 1e-9, axis / jnp.maximum(s, 1e-9), jnp.array([1.0, 0, 0], f.dtype))
    return so3_exp(axis * angle)
