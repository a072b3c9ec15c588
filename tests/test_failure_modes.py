"""Failure detection & recovery tests (SURVEY §5.3 parity) + factor
derivative checks (the reference validates custom factors against numerical
derivatives; single_axis_factor_test / mag_pose_factor_test style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import ImuMeasurement, StereoImage
from ocean_perception_tpu.core.se3 import so3_exp
from ocean_perception_tpu.vio.factors import mag_residual, single_axis_residual
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import (
    SmootherMode,
    StateEstimator,
    StateEstimatorParams,
)

GRAVITY = np.array([0.0, 0.0, -9.81])


@pytest.mark.slow
def test_vision_dropout_switches_mode_and_keeps_estimating():
    """Garbage stereo frames → frontend fails → VISION_UNAVAILABLE → IMU
    keyposes keep the smoother constrained (reference mode machine,
    state_estimator.cpp:333-434)."""
    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        max_imu_per_keypose=128,
        max_sec_btw_keyposes=0.5,
    )
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))

    rng = np.random.default_rng(0)
    results = []
    est.smoother_callbacks.append(results.append)
    for i in range(1, 200):
        t_ns = int(i * 1e7)
        est.receive_imu(ImuMeasurement(t_ns, np.zeros(3), -GRAVITY))
        if i % 20 == 0:
            # Uncorrelated noise pairs: tracking/odometry must fail.
            l = rng.random((120, 160)).astype(np.float32)
            r = rng.random((120, 160)).astype(np.float32)
            est.receive_stereo(StereoImage(t_ns + 1, 0, l, r))
    assert est.mode is SmootherMode.VISION_UNAVAILABLE
    assert len(results) >= 2  # IMU-cadence keyposes kept the smoother running
    assert np.isfinite(np.asarray(results[-1].p)).all()


def test_mag_factor_numerical_derivative():
    """Autodiff through the mag residual matches finite differences
    (mag_pose_factor_test.cpp parity — there vs GTSAM numericalDerivative)."""
    field = jnp.asarray([0.3, -0.1, 0.9])
    field = field / jnp.linalg.norm(field)
    measured = jnp.asarray([10.0, -20.0, 40.0])

    def res_of_theta(theta):
        R = so3_exp(theta)
        return mag_residual(R, measured, field, scale=50.0)

    theta0 = jnp.asarray([0.2, -0.1, 0.4])
    J_ad = jax.jacfwd(res_of_theta)(theta0)
    eps = 1e-6
    J_num = np.zeros((3, 3))
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        J_num[:, k] = (
            np.asarray(res_of_theta(theta0 + jnp.asarray(d)))
            - np.asarray(res_of_theta(theta0 - jnp.asarray(d)))
        ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(J_ad), J_num, atol=1e-5)


def test_single_axis_factor_numerical_derivative():
    axis = jnp.asarray([0.0, 0.0, 1.0])

    def res(p):
        return single_axis_residual(p, axis, 2.5)

    p0 = jnp.asarray([1.0, -2.0, 3.0])
    J_ad = jax.grad(res)(p0)
    np.testing.assert_allclose(np.asarray(J_ad), [0, 0, 1], atol=1e-9)
    assert float(res(p0)) == pytest.approx(0.5)


def test_ekf_hard_reset_on_divergence():
    """Filter far from smoother → hard correction re-initializes
    (state_estimator.cpp:507-543)."""
    from ocean_perception_tpu.vio.ekf import ekf_initialize
    from ocean_perception_tpu.vio.smoother import SmootherResult

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(n_gravity=GRAVITY.copy())
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    # Push the filter far away.
    est.ekf_state = est.ekf_state._replace(t=jnp.asarray([10.0, 0.0, 0.0]))
    est._ekf_history.add(100, est.ekf_state)

    fake = SmootherResult(
        R=jnp.eye(3), p=jnp.zeros(3), v=jnp.zeros(3),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
        timestamp=jnp.asarray(1e-7),
        cov_newest=jnp.eye(15) * 1e-4,
        cov_slot1=jnp.eye(15) * 1e-4,
        error=jnp.asarray(0.0),
    )
    est._sync_filter(100, fake)
    # Hard reset: filter snapped to the smoother position.
    np.testing.assert_allclose(np.asarray(est.ekf_state.t), np.zeros(3), atol=1e-9)
