"""Threaded estimator, odometry manager, and ANMS tests."""

import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import ImuMeasurement
from ocean_perception_tpu.core.se3 import se3_exp
from ocean_perception_tpu.tracking.anms import ssc_anms
from ocean_perception_tpu.vio.odometry_manager import OdometryManager
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import StateEstimatorParams
from ocean_perception_tpu.vio.threaded_estimator import ThreadedStateEstimator

GRAVITY = np.array([0.0, 0.0, -9.81])


@pytest.mark.slow
def test_threaded_estimator_drains_and_tracks():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        max_imu_per_keypose=128,
    )
    est = ThreadedStateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    results = []
    est.smoother_callbacks.append(results.append)
    for i in range(1, 200):
        est.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    assert est.wait_idle(timeout=120)
    fs = est.filter_state()
    assert fs.timestamp == int(199 * 1e7)
    assert np.isfinite(fs.world_T_body).all()
    assert len(results) >= 1  # smoother ran on IMU-cadence keyposes
    est.shutdown()


@pytest.mark.slow
def test_threaded_estimator_survives_malformed_measurement():
    """One bad measurement must not silently kill a worker thread (the
    reference's LCM handlers run indefinitely; a poisoned message killing
    the filter loop would freeze the estimator at its last state forever)."""
    from ocean_perception_tpu.core.measurements import PoseMeasurement

    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        max_imu_per_keypose=128,
    )
    est = ThreadedStateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    for i in range(1, 50):
        est.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    # Poison pill: a pose fix whose covariance cannot broadcast.
    est.receive_pose(
        PoseMeasurement(
            int(50 * 1e7), np.eye(4), covariance=np.zeros((2, 3))
        )
    )
    # The filter thread must keep processing measurements afterwards.
    for i in range(51, 120):
        est.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    assert est.wait_idle(timeout=120)
    fs = est.filter_state()
    assert fs.timestamp == int(119 * 1e7)
    assert np.isfinite(fs.world_T_body).all()
    est.shutdown()


def test_odometry_manager_relative():
    import jax.numpy as jnp

    om = OdometryManager()
    T0 = np.asarray(se3_exp(jnp.asarray([0.0, 0, 0, 0, 0, 0.0])))
    T1 = np.asarray(se3_exp(jnp.asarray([1.0, 0, 0, 0, 0, 0.3])))
    om.add_pose(100, T0)
    om.add_pose(200, T1)
    rel = om.relative(100, 200)
    np.testing.assert_allclose(rel, np.linalg.inv(T0) @ T1, atol=1e-12)
    assert om.relative(50, 200) is None  # nothing before t=50


def test_ssc_anms_spreads_points(rng):
    # Dense cluster + sparse far points, sorted by "response" = cluster first.
    cluster = rng.normal([50, 50], 3, size=(300, 2))
    spread = rng.uniform(0, 400, size=(100, 2))
    pts = np.concatenate([cluster, spread])
    idx = ssc_anms(pts, num_ret=50, rows=400, cols=400)
    sel = pts[idx]
    assert 30 <= len(sel) <= 70
    # Selected points must not all be in the cluster.
    far = (np.linalg.norm(sel - [50, 50], axis=1) > 30).sum()
    assert far > len(sel) * 0.4
    # Pairwise min distance is meaningfully large (suppression works).
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert np.median(d.min(axis=1)) > 10
