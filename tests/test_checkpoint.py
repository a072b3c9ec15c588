"""Checkpoint/resume: estimator state round trip."""

import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import ImuMeasurement
from ocean_perception_tpu.vio.checkpoint import load_estimator, save_estimator
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import StateEstimator, StateEstimatorParams

GRAVITY = np.array([0.0, 0.0, -9.81])


def make_est():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        max_imu_per_keypose=64,
    )
    return StateEstimator(params, rig)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    est = make_est()
    est.initialize(0, np.eye(4))
    for i in range(1, 120):
        est.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    path = str(tmp_path / "state.npz")
    save_estimator(est, path)

    est2 = make_est()
    load_estimator(est2, path)
    assert est2._n_keyposes == est._n_keyposes
    assert est2._last_keypose_t == est._last_keypose_t
    np.testing.assert_allclose(np.asarray(est2.window.p), np.asarray(est.window.p))
    np.testing.assert_allclose(np.asarray(est2.ekf_state.t), np.asarray(est.ekf_state.t))

    # Resumed estimator keeps processing without error.
    for i in range(120, 180):
        est2.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    fs = est2.filter_state()
    assert np.isfinite(fs.world_T_body).all()
