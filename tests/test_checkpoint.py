"""Checkpoint/resume: estimator state round trip."""

import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import ImuMeasurement
from ocean_perception_tpu.vio.checkpoint import load_estimator, save_estimator
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import StateEstimator, StateEstimatorParams

GRAVITY = np.array([0.0, 0.0, -9.81])


def make_est(max_landmarks=0, window=6):
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=window, iterations=3,
                                max_landmarks=max_landmarks),
        max_imu_per_keypose=64,
    )
    return StateEstimator(params, rig)


@pytest.mark.slow
def test_checkpoint_landmark_geometry_migration(tmp_path):
    """A checkpoint saved with max_landmarks=0 must load into a 16-column
    estimator (landmark history is additive — resume with empty columns,
    the r4 default change must not strand old mission checkpoints), while a
    CORE window-geometry mismatch still fails loudly."""
    est = make_est(max_landmarks=0)
    est.initialize(0, np.eye(4))
    for i in range(1, 120):
        est.receive_imu(ImuMeasurement(int(i * 1e7), np.zeros(3), -GRAVITY))
    path = str(tmp_path / "state.npz")
    save_estimator(est, path)

    est16 = make_est(max_landmarks=16)
    load_estimator(est16, path)
    assert est16._n_keyposes == est._n_keyposes
    assert est16.window.lmk_valid.shape[1] == 16
    assert not np.asarray(est16.window.lmk_valid).any()
    np.testing.assert_allclose(np.asarray(est16.window.p), np.asarray(est.window.p))

    bad = make_est(window=8)  # core geometry change: must refuse
    with pytest.raises(ValueError, match="window geometry"):
        load_estimator(bad, path)


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


def test_node_resume_from_checkpoint(tmp_path):
    """Node-level mid-mission restart: a fresh node restored from a
    checkpoint continues filtering WITHOUT waiting for an init pose
    (fabric/nodes/state_estimator_node.py --checkpoint)."""
    import os

    from ocean_perception_tpu.fabric.messages import ImuMessage, PoseStampedMessage
    from ocean_perception_tpu.fabric.nodes.state_estimator_node import StateEstimatorNode
    from ocean_perception_tpu.fabric.pubsub import InProcessBus
    from ocean_perception_tpu.vio.checkpoint import load_estimator, save_estimator

    node_yaml = os.path.join(
        os.path.dirname(__file__), "..", "config", "nodes", "StateEstimatorNode.yaml"
    )
    shared_yaml = os.path.join(
        os.path.dirname(__file__), "..", "config", "shared", "ZEDMini.yaml"
    )
    ckpt = str(tmp_path / "est.npz")

    bus1 = InProcessBus()
    node1 = StateEstimatorNode.from_config(bus1, node_yaml, shared_yaml)
    bus1.publish(
        "vio/init_pose", PoseStampedMessage(timestamp=0, pose=np.array([1.0, 0, 0, 0, 0, 0, 0]))
    )
    for k in range(5):
        bus1.publish(
            "sensors/imu",
            ImuMessage(int((k + 1) * 1e7), np.zeros(3), np.array([0.0, -9.81, 0.0])),
        )
    save_estimator(node1.est, ckpt)

    # Restart: new node, restore, skip the init wait, keep filtering.
    bus2 = InProcessBus()
    node2 = StateEstimatorNode.from_config(bus2, node_yaml, shared_yaml)
    load_estimator(node2.est, ckpt)
    node2._init.set()
    poses = []
    bus2.subscribe("vio/pose/filter", lambda _c, m: poses.append(m))
    for k in range(5, 10):
        bus2.publish(
            "sensors/imu",
            ImuMessage(int((k + 1) * 1e7), np.zeros(3), np.array([0.0, -9.81, 0.0])),
        )
    assert node2.est.ekf_state is not None
    assert node2.est._ekf_time == int(1e8)
    assert len(poses) >= 1
