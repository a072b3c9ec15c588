"""On-manifold IMU preintegration (Forster et al. RSS'15 formulation).

Replaces GTSAM ``PreintegratedCombinedMeasurements`` used by the reference's
ImuManager/FixedLagSmoother (imu_manager.cpp:57-135). Accumulates
bias-corrected relative rotation/velocity/position deltas between keyposes,
their 9x9 covariance, and first-order bias Jacobians, as a masked
``lax.scan`` over a fixed-size (N, 7) sample window [dt, w(3), a(3)].

The matching factor residual (used by the smoother) and the state-predict
helper (used by the EKF/smoother initialization) live here too.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.se3 import skew, so3_exp, so3_log


_EYE9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


@struct.dataclass
class ImuCalibration:
    """Noise densities (continuous-time) — config/shared yaml noise_model.

    body_R_imu / body_t_imu: the /shared/imu0/body_T_imu sensor extrinsic
    (state_estimator.cpp:49; GTSAM pim_params.setBodyPSensor at
    imu_manager.cpp:47). Raw samples are transformed into the body frame
    before integration: gyro rotated, accel rotated minus the centrifugal
    lever-arm term w x (w x arm) (the angular-acceleration term is neglected,
    matching GTSAM's correctMeasurementsBySensorPose). Biases are therefore
    estimated in the BODY frame (self-consistent; GTSAM keeps them in the
    sensor frame — a convention difference, not an accuracy one)."""

    accel_noise_sigma: float = struct.field(pytree_node=False, default=0.001)
    gyro_noise_sigma: float = struct.field(pytree_node=False, default=0.0004)
    accel_bias_rw_sigma: float = struct.field(pytree_node=False, default=0.0001)
    gyro_bias_rw_sigma: float = struct.field(pytree_node=False, default=0.00004)
    body_R_imu: tuple = struct.field(pytree_node=False, default=_EYE9)
    body_t_imu: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 0.0))


class PreintegratedImu(NamedTuple):
    dR: jnp.ndarray        # (3,3) integrated rotation
    dv: jnp.ndarray        # (3,)
    dp: jnp.ndarray        # (3,)
    dt: jnp.ndarray        # scalar total time
    cov: jnp.ndarray       # (9,9) preintegration covariance [theta, v, p]
    dR_dbg: jnp.ndarray    # (3,3) d(theta)/d(gyro bias)
    dv_dbg: jnp.ndarray
    dv_dba: jnp.ndarray
    dp_dbg: jnp.ndarray
    dp_dba: jnp.ndarray
    bias_gyro: jnp.ndarray  # (3,) bias used during integration
    bias_accel: jnp.ndarray
    n_samples: jnp.ndarray


def preintegrate(
    samples: jnp.ndarray,     # (N, 7): [dt, wx, wy, wz, ax, ay, az]
    mask: jnp.ndarray,        # (N,) valid samples
    bias_gyro: jnp.ndarray,
    bias_accel: jnp.ndarray,
    calib: ImuCalibration = ImuCalibration(),
) -> PreintegratedImu:
    dtype = samples.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    sig_g2 = calib.gyro_noise_sigma**2
    sig_a2 = calib.accel_noise_sigma**2

    # Sensor-to-body correction (static check: free for identity rigs).
    if tuple(calib.body_R_imu) != _EYE9 or tuple(calib.body_t_imu) != (0.0, 0.0, 0.0):
        R_bi = jnp.asarray(calib.body_R_imu, dtype).reshape(3, 3)
        arm = jnp.asarray(calib.body_t_imu, dtype)
        w_b = samples[:, 1:4] @ R_bi.T
        a_b = samples[:, 4:7] @ R_bi.T - jnp.cross(w_b, jnp.cross(w_b, arm[None, :]))
        samples = jnp.concatenate([samples[:, :1], w_b, a_b], axis=1)

    def step(carry, xs):
        (dR, dv, dp, T, cov, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba) = carry
        row, m = xs
        dt = row[0] * m
        w = row[1:4] - bias_gyro
        a = row[4:7] - bias_accel

        dRk = so3_exp(w * dt)
        a_skew = skew(a)

        # Covariance propagation (A state transition on [dtheta, dv, dp]).
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(dRk.T)
        A = A.at[3:6, 0:3].set(-dR @ a_skew * dt)
        A = A.at[3:6, 3:6].set(eye3)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ a_skew * dt * dt)
        A = A.at[6:9, 3:6].set(eye3 * dt)
        A = A.at[6:9, 6:9].set(eye3)
        # Noise: gyro into dtheta, accel into dv/dp (discretized).
        dt_safe = jnp.maximum(dt, 1e-9)
        Q = jnp.zeros((9, 9), dtype)
        Q = Q.at[0:3, 0:3].set(eye3 * sig_g2 / dt_safe)
        Q = Q.at[3:6, 3:6].set(eye3 * sig_a2 / dt_safe)
        cov_new = A @ cov @ A.T
        B = jnp.zeros((9, 9), dtype)
        B = B.at[0:3, 0:3].set(eye3 * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        cov_new = cov_new + B @ Q @ B.T

        # Bias Jacobians (first order).
        dp_dbg_new = dp_dbg + dv_dbg * dt - 0.5 * dR @ a_skew @ dR_dbg * dt * dt
        dp_dba_new = dp_dba + dv_dba * dt - 0.5 * dR * dt * dt
        dv_dbg_new = dv_dbg - dR @ a_skew @ dR_dbg * dt
        dv_dba_new = dv_dba - dR * dt
        # Right Jacobian of so3 ~ I for small steps; use exact-ish form.
        dR_dbg_new = dRk.T @ dR_dbg - _right_jacobian(w * dt) * dt

        dp_new = dp + dv * dt + 0.5 * dR @ a * dt * dt
        dv_new = dv + dR @ a * dt
        dR_new = dR @ dRk
        T_new = T + dt

        live = m > 0
        out = (
            jnp.where(live, dR_new, dR),
            jnp.where(live, dv_new, dv),
            jnp.where(live, dp_new, dp),
            jnp.where(live, T_new, T),
            jnp.where(live, cov_new, cov),
            jnp.where(live, dR_dbg_new, dR_dbg),
            jnp.where(live, dv_dbg_new, dv_dbg),
            jnp.where(live, dv_dba_new, dv_dba),
            jnp.where(live, dp_dbg_new, dp_dbg),
            jnp.where(live, dp_dba_new, dp_dba),
        )
        return out, None

    init = (
        eye3,
        jnp.zeros(3, dtype),
        jnp.zeros(3, dtype),
        jnp.zeros((), dtype),
        jnp.zeros((9, 9), dtype),
        jnp.zeros((3, 3), dtype),
        jnp.zeros((3, 3), dtype),
        jnp.zeros((3, 3), dtype),
        jnp.zeros((3, 3), dtype),
        jnp.zeros((3, 3), dtype),
    )
    maskf = mask.astype(dtype)
    (dR, dv, dp, T, cov, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba), _ = jax.lax.scan(
        step, init, (samples, maskf)
    )
    return PreintegratedImu(
        dR=dR, dv=dv, dp=dp, dt=T, cov=cov,
        dR_dbg=dR_dbg, dv_dbg=dv_dbg, dv_dba=dv_dba, dp_dbg=dp_dbg, dp_dba=dp_dba,
        bias_gyro=bias_gyro, bias_accel=bias_accel,
        n_samples=jnp.sum(mask.astype(jnp.int32)),
    )


def _right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian Jr(phi); AD-safe at 0 (theta^2-based branches)."""
    theta_sq = jnp.sum(phi * phi)
    S = skew(phi)
    small = theta_sq < 1e-12
    t_sq = jnp.where(small, 1.0, theta_sq)
    t = jnp.sqrt(t_sq)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(t)) / t_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (t - jnp.sin(t)) / (t_sq * t))
    return jnp.eye(3, dtype=phi.dtype) - a * S + b * (S @ S)


def bias_corrected_deltas(
    pim: PreintegratedImu, bias_gyro: jnp.ndarray, bias_accel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order bias update of the deltas (GTSAM biasCorrectedDeltas)."""
    dbg = bias_gyro - pim.bias_gyro
    dba = bias_accel - pim.bias_accel
    dR = pim.dR @ so3_exp(pim.dR_dbg @ dbg)
    dv = pim.dv + pim.dv_dbg @ dbg + pim.dv_dba @ dba
    dp = pim.dp + pim.dp_dbg @ dbg + pim.dp_dba @ dba
    return dR, dv, dp


def predict_state(
    R_i: jnp.ndarray,
    p_i: jnp.ndarray,
    v_i: jnp.ndarray,
    pim: PreintegratedImu,
    gravity: jnp.ndarray,
    bias_gyro: jnp.ndarray | None = None,
    bias_accel: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Propagate (R, p, v) through the preintegrated window."""
    bg = pim.bias_gyro if bias_gyro is None else bias_gyro
    ba = pim.bias_accel if bias_accel is None else bias_accel
    dR, dv, dp = bias_corrected_deltas(pim, bg, ba)
    dt = pim.dt
    R_j = R_i @ dR
    v_j = v_i + gravity * dt + R_i @ dv
    p_j = p_i + v_i * dt + 0.5 * gravity * dt * dt + R_i @ dp
    return R_j, p_j, v_j


def imu_factor_residual(
    R_i, p_i, v_i, R_j, p_j, v_j, bias_gyro, bias_accel, pim: PreintegratedImu, gravity
) -> jnp.ndarray:
    """9-vector preintegration residual [r_theta, r_v, r_p] (Forster eq. 37)."""
    dR, dv, dp = bias_corrected_deltas(pim, bias_gyro, bias_accel)
    dt = pim.dt
    r_R = so3_log(dR.T @ (R_i.T @ R_j))
    r_v = R_i.T @ (v_j - v_i - gravity * dt) - dv
    r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp
    return jnp.concatenate([r_R, r_v, r_p])
