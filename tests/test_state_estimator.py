"""End-to-end StateEstimator test: IMU + depth driven, no vision.

Drives the engine with a synthetic constant-velocity trajectory at 100 Hz IMU
and 2 Hz depth; checks that (a) the EKF tracks at IMU rate, (b) IMU-cadence
keyposes feed the smoother (VISION_UNAVAILABLE path), (c) smoother results
arrive and the filter stays consistent with the trajectory.
"""

import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import DepthMeasurement, ImuMeasurement
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import (
    SmootherMode,
    StateEstimator,
    StateEstimatorParams,
)

GRAVITY = np.array([0.0, 0.0, -9.81])


def make_estimator():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, baseline=0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=4),
        max_imu_per_keypose=128,
        max_sec_btw_keyposes=0.5,
    )
    return StateEstimator(params, rig)


@pytest.mark.slow
def test_imu_depth_pipeline():
    est = make_estimator()
    est.initialize(0, np.eye(4))

    vel = np.array([0.2, 0.0, -0.1])  # m/s, world frame (sinking forward)
    dt = 0.01  # 100 Hz
    n_steps = 300  # 3 seconds

    smoother_results = []
    est.smoother_callbacks.append(smoother_results.append)

    p = np.zeros(3)
    for i in range(1, n_steps + 1):
        t_ns = int(i * dt * 1e9)
        p = vel * (i * dt)
        if i % 50 == 0:  # 2 Hz depth (measured along gravity unit = -z),
            # delivered just before the IMU sample that closes the keypose.
            depth = float(np.array([0, 0, -1.0]) @ p)
            est.receive_depth(DepthMeasurement(timestamp=t_ns - 1, depth=depth))
        # Constant velocity: specific force = -g (identity attitude).
        est.receive_imu(
            ImuMeasurement(
                timestamp=t_ns,
                angular_velocity=np.zeros(3),
                linear_acceleration=-GRAVITY,
            )
        )

    assert est.mode is SmootherMode.VISION_UNAVAILABLE
    # Smoother ran on IMU-cadence keyposes.
    assert len(smoother_results) >= 3

    # Filter state: the EKF has no velocity observability without vision, but
    # with IMU updates it must at least remain bounded and report finite state.
    fs = est.filter_state()
    assert np.isfinite(fs.world_T_body).all()
    assert fs.timestamp == int(n_steps * dt * 1e9)

    # Smoother newest keypose should respect the depth measurements (z known).
    ss = est.smoother_state()
    assert ss is not None
    true_depth_axis = -p[2]  # gravity unit is -z
    est_depth_axis = -ss.world_T_body[2, 3]
    assert abs(est_depth_axis - true_depth_axis) < 0.25


@pytest.mark.slow
def test_window_slides_without_error():
    est = make_estimator()
    est.initialize(0, np.eye(4))
    dt = 0.01
    # Run long enough that keyposes exceed the window size (6).
    for i in range(1, 500):
        t_ns = int(i * dt * 1e9)
        est.receive_imu(
            ImuMeasurement(
                timestamp=t_ns,
                angular_velocity=np.zeros(3),
                linear_acceleration=-GRAVITY,
            )
        )
    assert est._n_keyposes <= est.params.smoother.window
    r = est._last_smoother_result
    assert r is not None
    assert np.isfinite(np.asarray(r.p)).all()
