"""15-DoF error-state EKF for high-rate state output.

Reference parity: vio/state_ekf.{hpp,cpp} —
- state x = [t(3) v(3) a(3) q(4) w(3)] (world t/v/a, world-from-body q, body
  w) with 15x15 covariance in [t v a theta w] error coordinates;
- Predict: constant-acceleration translation + quaternion integration
  q ← exp(dt·w) ⊗ q with analytic G = d(uq)/dw (state_ekf.cpp:123-175);
  S ← F S Fᵀ + dt·Q;
- All updates use Joseph form (I-KH)S(I-KH)ᵀ + KRKᵀ and re-symmetrization
  (cpp:190-218);
- IMU update: gyro measures w directly; accelerometer measures
  R(q)ᵀ(a - g)… the reference rotates the body-frame measurement into the
  world and removes gravity additively (RotateAndRemoveGravity, cpp:177-188);
- Pose update is on-manifold (local coordinates), depth is a 1-DoF update on
  the gravity axis, range a 1-DoF update along the receiver→beacon unit
  vector with the body_T_receiver lever arm (cpp:366-432).

Rewind/ReapplyImu (cpp:84-120) is host-side: core/buffers.ItemHistory stores
(t, EkfState) snapshots; replay calls these pure functions again.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.quaternion import (
    quat_exp,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
)


@struct.dataclass
class EkfParams:
    sigma_Q_t: float = struct.field(pytree_node=False, default=1e-3)
    sigma_Q_v: float = struct.field(pytree_node=False, default=1e-2)
    sigma_Q_a: float = struct.field(pytree_node=False, default=1e-2)
    sigma_Q_theta: float = struct.field(pytree_node=False, default=1e-3)
    sigma_Q_w: float = struct.field(pytree_node=False, default=1e-2)
    sigma_R_imu_a: float = struct.field(pytree_node=False, default=0.1)
    sigma_R_imu_w: float = struct.field(pytree_node=False, default=0.01)
    sigma_R_depth: float = struct.field(pytree_node=False, default=0.05)
    sigma_R_range: float = struct.field(pytree_node=False, default=0.2)
    # Chi-square innovation gate on range updates: reject measurements whose
    # normalized innovation r^2/(H P H^T + R) exceeds gate^2 sigma. The
    # reference applies range updates unconditionally (state_ekf.cpp:394-432)
    # — the round-5 mission stress matrix measured that 20% gross range
    # outliers then drag ATE 5 cm -> 40 cm (50% -> 1.7 m); the gate bounds
    # it (docs/PERFORMANCE.md round-5 matrix). 0 disables (reference parity).
    range_gate_sigmas: float = struct.field(pytree_node=False, default=5.0)


class EkfState(NamedTuple):
    t: jnp.ndarray       # (3,) world position
    v: jnp.ndarray       # (3,) world velocity
    a: jnp.ndarray       # (3,) world acceleration
    q: jnp.ndarray       # (4,) wxyz world_q_body
    w: jnp.ndarray       # (3,) body angular velocity
    S: jnp.ndarray       # (15,15) covariance [t v a theta w]


def ekf_initialize(
    t0=None, q0=None, cov_scale: float = 0.1, dtype=jnp.float32
) -> EkfState:
    z3 = jnp.zeros(3, dtype)
    return EkfState(
        t=z3 if t0 is None else jnp.asarray(t0, dtype),
        v=z3,
        a=z3,
        q=jnp.array([1.0, 0, 0, 0], dtype) if q0 is None else jnp.asarray(q0, dtype),
        w=z3,
        S=jnp.eye(15, dtype=dtype) * cov_scale,
    )


def _dquat_dw(w: jnp.ndarray, dt) -> jnp.ndarray:
    """Analytic d(theta_err)/dw for the quaternion propagation ~ I*dt."""
    return jnp.eye(3, dtype=w.dtype) * dt


def ekf_predict(state: EkfState, dt, params: EkfParams) -> EkfState:
    """Constant-acceleration + gyro-rate propagation (state_ekf.cpp Predict)."""
    dtype = state.t.dtype
    dt = jnp.asarray(dt, dtype)
    t = state.t + state.v * dt + 0.5 * state.a * dt * dt
    v = state.v + state.a * dt
    uq = quat_exp(state.w * dt)
    q = quat_normalize(quat_mul(uq, state.q))

    F = jnp.eye(15, dtype=dtype)
    F = F.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[0:3, 6:9].set(jnp.eye(3, dtype=dtype) * 0.5 * dt * dt)
    F = F.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[9:12, 12:15].set(_dquat_dw(state.w, dt))

    Q = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, params.sigma_Q_t**2, dtype),
                jnp.full(3, params.sigma_Q_v**2, dtype),
                jnp.full(3, params.sigma_Q_a**2, dtype),
                jnp.full(3, params.sigma_Q_theta**2, dtype),
                jnp.full(3, params.sigma_Q_w**2, dtype),
            ]
        )
    )
    S = F @ state.S @ F.T + dt * Q
    S = 0.5 * (S + S.T)
    return EkfState(t=t, v=v, a=state.a, q=q, w=state.w, S=S)


def _joseph_update(state: EkfState, H: jnp.ndarray, r: jnp.ndarray, R: jnp.ndarray) -> EkfState:
    """Generic Joseph-form update with on-manifold quaternion correction."""
    dtype = state.t.dtype
    S = state.S
    PHt = S @ H.T
    K = PHt @ jnp.linalg.inv(H @ PHt + R)
    dx = K @ r
    I_KH = jnp.eye(15, dtype=dtype) - K @ H
    S_new = I_KH @ S @ I_KH.T + K @ R @ K.T
    S_new = 0.5 * (S_new + S_new.T)
    dq = quat_exp(dx[9:12])
    return EkfState(
        t=state.t + dx[0:3],
        v=state.v + dx[3:6],
        a=state.a + dx[6:9],
        q=quat_normalize(quat_mul(dq, state.q)),
        w=state.w + dx[12:15],
        S=S_new,
    )


def ekf_update_imu(
    state: EkfState,
    w_meas: jnp.ndarray,      # (3,) body gyro
    a_meas: jnp.ndarray,      # (3,) body specific force
    n_gravity: jnp.ndarray,   # (3,) world gravity (e.g. [0, 9.81, 0])
    params: EkfParams,
    q_body_imu: jnp.ndarray | None = None,
) -> EkfState:
    """IMU update: world-frame acceleration + body angular rate
    (state_ekf.cpp:177-188 RotateAndRemoveGravity semantics: the measured
    specific force rotated to world plus gravity gives inertial accel)."""
    dtype = state.t.dtype
    if q_body_imu is not None:
        w_meas = quat_rotate(q_body_imu, w_meas)
        a_meas = quat_rotate(q_body_imu, a_meas)
    a_world = quat_rotate(state.q, a_meas) + n_gravity

    H = jnp.zeros((6, 15), dtype)
    H = H.at[0:3, 6:9].set(jnp.eye(3, dtype=dtype))    # accel
    H = H.at[3:6, 12:15].set(jnp.eye(3, dtype=dtype))  # gyro
    r = jnp.concatenate([a_world - state.a, w_meas - state.w])
    R = jnp.diag(
        jnp.concatenate(
            [jnp.full(3, params.sigma_R_imu_a**2, dtype), jnp.full(3, params.sigma_R_imu_w**2, dtype)]
        )
    )
    return _joseph_update(state, H, r, R)


def ekf_replay_imu(
    state: EkfState,
    dts: jnp.ndarray,        # (N,) seconds between consecutive samples
    gyros: jnp.ndarray,      # (N, 3) body angular rates
    accels: jnp.ndarray,     # (N, 3) body specific forces
    mask: jnp.ndarray,       # (N,) bool — padded slots are no-ops
    n_gravity: jnp.ndarray,  # (3,) world gravity
    params: EkfParams,
    q_body_imu: jnp.ndarray | None = None,
) -> EkfState:
    """Rewind/ReapplyImu replay (state_ekf.cpp:84-120) as ONE lax.scan.

    The host-loop equivalent costs 2 dispatches per sample — on a remote TPU
    that is 2N x the ~50-130 ms RPC floor. Padding N to a capacity bucket and
    scanning keeps replay a single dispatch with a bounded set of compiles.
    """

    def step(s, inp):
        dt, w_m, a_m, use = inp
        s1 = ekf_predict(s, jnp.maximum(dt, 0.0), params)
        s1 = ekf_update_imu(s1, w_m, a_m, n_gravity, params, q_body_imu)
        s_out = jax.tree.map(lambda a, b: jnp.where(use, a, b), s1, s)
        return s_out, None

    out, _ = jax.lax.scan(step, state, (dts, gyros, accels, mask))
    return out


def ekf_update_depth(
    state: EkfState, depth_meas, gravity_unit: jnp.ndarray, params: EkfParams
) -> EkfState:
    """1-DoF update along the gravity axis (state_ekf.cpp:366-392)."""
    dtype = state.t.dtype
    H = jnp.zeros((1, 15), dtype)
    H = H.at[0, 0:3].set(gravity_unit)
    pred = jnp.dot(gravity_unit, state.t)
    r = jnp.asarray([depth_meas - pred], dtype)
    R = jnp.asarray([[params.sigma_R_depth**2]], dtype)
    return _joseph_update(state, H, r, R)


def ekf_update_range(
    state: EkfState,
    range_meas,
    beacon_world: jnp.ndarray,
    params: EkfParams,
    body_t_receiver: jnp.ndarray | None = None,
) -> EkfState:
    """1-DoF update along receiver→beacon (state_ekf.cpp:394-432)."""
    dtype = state.t.dtype
    recv = state.t
    if body_t_receiver is not None:
        recv = state.t + quat_rotate(state.q, body_t_receiver)
    delta = beacon_world - recv
    dist = jnp.linalg.norm(delta)
    unit = delta / jnp.maximum(dist, 1e-6)
    H = jnp.zeros((1, 15), dtype)
    H = H.at[0, 0:3].set(-unit)
    r = jnp.asarray([range_meas - dist], dtype)
    R = jnp.asarray([[params.sigma_R_range**2]], dtype)
    upd = _joseph_update(state, H, r, R)
    if params.range_gate_sigmas <= 0:
        return upd
    innov_var = (H @ state.S @ H.T + R)[0, 0]
    accept = r[0] * r[0] <= params.range_gate_sigmas**2 * innov_var
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), upd, state
    )


def ekf_update_pose(
    state: EkfState,
    t_meas: jnp.ndarray,
    q_meas: jnp.ndarray,
    cov_pose: jnp.ndarray,   # (6,6) [t, theta]
) -> EkfState:
    """Full 6-DoF pose update, rotation residual in local coordinates
    (state_ekf.cpp:219-270 manifold update)."""
    dtype = state.t.dtype
    H = jnp.zeros((6, 15), dtype)
    H = H.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    H = H.at[3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    dq = quat_mul(q_meas, quat_normalize(state.q * jnp.array([1.0, -1, -1, -1], dtype)))
    r = jnp.concatenate([t_meas - state.t, quat_log(dq)])
    return _joseph_update(state, H, r, cov_pose)
