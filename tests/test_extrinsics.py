"""Sensor-extrinsics wiring tests: a deliberately NON-IDENTITY rig must flow
from YAML through every consumer (reference plumbing: state_estimator.cpp:49,
state_ekf.cpp:54-56+394-432, fixed_lag_smoother.cpp:62-68, smoother.cpp:282,
imu_manager.cpp:47). All shipped rig configs are identity, which is exactly
why these paths need synthetic coverage before real data arrives."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import RangeMeasurement, StereoImage
from ocean_perception_tpu.vio.ekf import EkfParams, ekf_initialize, ekf_update_range
from ocean_perception_tpu.vio.imu_preintegration import ImuCalibration, preintegrate
from ocean_perception_tpu.vio.smoother import (
    SmootherConfig,
    _residuals,
    make_window,
    preintegrate_window,
)
from ocean_perception_tpu.vio.state_estimator import StateEstimator, StateEstimatorParams

GRAVITY = np.array([0.0, 0.0, -9.81])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def test_ekf_range_lever_arm():
    """Receiver offset 0.5 m along +x: a range consistent with the RECEIVER
    position must leave the state untouched; ignoring the lever arm pulls it
    (state_ekf.cpp:394-432)."""
    params = EkfParams(sigma_R_range=0.05)
    beacon = jnp.asarray([10.0, 0.0, 0.0])
    true_range = 9.5  # beacon to receiver at (0.5, 0, 0)

    s0 = ekf_initialize(dtype=jnp.float64)
    s_arm = ekf_update_range(
        s0, true_range, beacon, params, body_t_receiver=jnp.asarray([0.5, 0.0, 0.0])
    )
    np.testing.assert_allclose(np.asarray(s_arm.t), 0.0, atol=1e-9)

    s_noarm = ekf_update_range(s0, true_range, beacon, params)
    assert np.linalg.norm(np.asarray(s_noarm.t)) > 0.2  # the bug this guards


def _minimal_window(cfg, **overrides):
    win = make_window(cfg, 8)
    win = win._replace(
        valid=jnp.asarray([True, True]),
        timestamps=jnp.asarray([0.0, 1.0]),
        # Prior == slot-0 state so the prior rows vanish.
    )
    return win._replace(**overrides)


def _total_error(win, cfg):
    pims = preintegrate_window(win)
    r = _residuals(jnp.zeros((2, 15), win.p.dtype), win, pims,
                   jnp.asarray(GRAVITY), jnp.asarray([0.0, 0.0, -1.0]), cfg)
    return float(jnp.sum(r * r))


def test_smoother_range_receiver_lever_arm():
    """Range rows must measure beacon -> RECEIVER (RangeFactorWithTransform
    parity): a range consistent with the offset receiver gives zero residual
    only when the lever arm is applied."""
    beacon = np.array([10.0, 0.0, 0.0])
    arm = np.array([0.5, 0.0, 0.0])
    true_range = float(np.linalg.norm(beacon - arm))  # 9.5

    def build(cfg):
        win = _minimal_window(cfg)
        rng_vals = np.zeros((2, cfg.max_ranges))
        rng_beacons = np.zeros((2, cfg.max_ranges, 3))
        rng_valid = np.zeros((2, cfg.max_ranges), bool)
        rng_vals[1, 0] = true_range
        rng_beacons[1, 0] = beacon
        rng_valid[1, 0] = True
        return win._replace(
            ranges=jnp.asarray(rng_vals),
            range_beacons=jnp.asarray(rng_beacons),
            range_valid=jnp.asarray(rng_valid),
        )

    cfg_arm = SmootherConfig(window=2, body_t_receiver=(0.5, 0.0, 0.0))
    assert _total_error(build(cfg_arm), cfg_arm) < 1e-9

    cfg_noarm = SmootherConfig(window=2)
    assert _total_error(build(cfg_noarm), cfg_noarm) > 1.0


def test_smoother_mag_sensor_rotation_and_bias():
    """Mag measured in the SENSOR frame: prediction must rotate through
    body_T_sensor and add the hard-iron bias (mag_pose_factor.hpp:68-72)."""
    R_wb = _rz(0.7)
    R_bs = _rz(np.pi / 2)
    field = np.array([0.2, -0.4, 0.89])
    scale, bias = 50.0, np.array([1.0, -2.0, 0.5])
    measured = R_bs.T @ R_wb.T @ (field * scale) + bias

    cfg = SmootherConfig(
        window=2,
        mag_local_field=tuple(field.tolist()),
        mag_scale=scale,
        mag_body_R_sensor=tuple(R_bs.reshape(-1).tolist()),
        mag_bias=tuple(bias.tolist()),
    )
    win = _minimal_window(cfg)
    # Same attitude on both slots (keeps the no-motion fallback factor at
    # zero — this test isolates the mag rows).
    R = np.stack([R_wb, R_wb])
    mag = np.zeros((2, 3))
    mag[1] = measured
    win = win._replace(
        R=jnp.asarray(R),
        prior_R=jnp.asarray(R_wb, win.p.dtype),
        mag=jnp.asarray(mag),
        mag_valid=jnp.asarray([False, True]),
    )
    assert _total_error(win, cfg) < 1e-9

    # Identity-mount config on the same measurement: residual must be large.
    cfg0 = SmootherConfig(window=2, mag_local_field=tuple(field.tolist()), mag_scale=scale)
    assert _total_error(win, cfg0) > 1.0


def test_imu_preintegration_sensor_rotation():
    """Gyro samples in a yawed/rolled sensor frame integrate to the correct
    BODY rotation when body_R_imu is set (GTSAM setBodyPSensor parity)."""
    R_bi = _rx(np.pi / 2)
    w_body = np.array([0.0, 0.0, 0.3])
    w_sensor = R_bi.T @ w_body
    n = 100
    rows = np.zeros((n, 7))
    rows[:, 0] = 0.01
    rows[:, 1:4] = w_sensor

    calib = ImuCalibration(
        body_R_imu=tuple(R_bi.reshape(-1).tolist()), body_t_imu=(0.0, 0.0, 0.0)
    )
    pim = preintegrate(
        jnp.asarray(rows), jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), calib
    )
    expected = _rz(0.3)  # 0.3 rad/s about body z for 1 s
    np.testing.assert_allclose(np.asarray(pim.dR), expected, atol=1e-4)

    # Without the extrinsic the integrated axis is wrong by construction.
    pim0 = preintegrate(
        jnp.asarray(rows), jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), ImuCalibration()
    )
    assert np.abs(np.asarray(pim0.dR) - expected).max() > 0.1


def test_imu_preintegration_centrifugal_lever_arm():
    """A sensor mounted off-axis on a spinning body measures centripetal
    acceleration; the w x (w x arm) correction must cancel it exactly
    (GTSAM correctMeasurementsBySensorPose)."""
    w = np.array([0.0, 0.0, 2.0])
    arm = np.array([0.2, 0.0, 0.0])
    a_meas = np.cross(w, np.cross(w, arm))  # what the off-axis sensor feels
    n = 50
    rows = np.zeros((n, 7))
    rows[:, 0] = 0.01
    rows[:, 1:4] = w
    rows[:, 4:7] = a_meas

    calib = ImuCalibration(body_t_imu=tuple(arm.tolist()))
    pim = preintegrate(
        jnp.asarray(rows), jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), calib
    )
    assert np.linalg.norm(np.asarray(pim.dv)) < 1e-6

    pim0 = preintegrate(
        jnp.asarray(rows), jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), ImuCalibration()
    )
    assert np.linalg.norm(np.asarray(pim0.dv)) > 0.3


def test_vo_conjugated_into_body_frame():
    """Camera yawed 90 deg about body z: camera-frame forward motion must
    become body-frame motion via body_P_cam conjugation (smoother.cpp:282).
    Fails on pre-wiring code (camera frame silently taken as body frame)."""
    from flax import struct as _struct  # noqa: F401  (jnp VoResult fields)
    from ocean_perception_tpu.vio.stereo_frontend import VoResult

    body_T_cam = np.eye(4)
    body_T_cam[:3, :3] = _rz(np.pi / 2)

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=4),
        min_sec_btw_keyposes=0.05,
        max_sec_btw_keyposes=100.0,
        body_T_cam=body_T_cam,
    )
    est = StateEstimator(params, rig)
    est.initialize(int(1e8), np.eye(4))

    t_cam = np.array([0.4, 0.0, 0.0])  # camera-frame step, camera x-axis
    T_vo = np.eye(4)
    T_vo[:3, 3] = t_cam

    def fake_track(left, right):
        K = 4
        return VoResult(
            T_prev_cur=jnp.asarray(T_vo),
            covariance=jnp.eye(6) * 1e-4,
            is_keyframe=jnp.asarray(True),
            status=jnp.asarray(0, jnp.int32),
            n_tracked=jnp.asarray(50),
            n_inliers=jnp.asarray(50),
            avg_reprojection_err=jnp.asarray(0.1),
            lmk_ids=jnp.zeros(K, jnp.int32),
            lmk_pixels=jnp.zeros((K, 2)),
            lmk_disparities=jnp.zeros(K),
            lmk_valid=jnp.zeros(K, bool),
        )

    est.frontend.track = fake_track
    dummy = np.zeros((120, 160), np.float32)
    est.receive_stereo(StereoImage(int(2e8), 0, dummy, dummy))  # chain start
    est.receive_stereo(StereoImage(int(3e8), 0, dummy, dummy))  # VO keypose

    p = np.asarray(est.smoother_state().world_T_body[:3, 3])
    expected = body_T_cam[:3, :3] @ t_cam  # = [0, 0.4, 0]
    np.testing.assert_allclose(p, expected, atol=0.05)
    assert abs(p[1] - 0.4) < 0.05 and abs(p[0]) < 0.05


def test_yaml_extrinsics_reach_estimator():
    """Non-identity extrinsics in the shared rig YAML must reach every
    consumer through load_state_estimator_params (config/bindings.py)."""
    from ocean_perception_tpu.config.bindings import load_state_estimator_params
    from ocean_perception_tpu.config.yaml_parser import YamlParser

    def mat(T):
        return {"rows": 4, "cols": 4, "data": [float(v) for v in np.asarray(T).reshape(-1)]}

    T_imu = np.eye(4)
    T_imu[:3, :3] = _rx(np.pi / 2)
    T_recv = np.eye(4)
    T_recv[:3, 3] = [0.5, 0.0, -0.1]
    T_mag = np.eye(4)
    T_mag[:3, :3] = _rz(np.pi / 2)
    T_cam = np.eye(4)
    T_cam[:3, :3] = _rz(-np.pi / 2)
    T_cam[:3, 3] = [0.0, 0.1, 0.0]

    shared = {
        "n_gravity": [0.0, 0.0, -9.81],
        "imu0": {"body_T_imu": mat(T_imu)},
        "aps0": {"body_T_receiver": mat(T_recv)},
        "mag0": {"body_T_sensor": mat(T_mag), "sensor_bias": [1.0, 2.0, 3.0]},
        "stereo_forward": {"camera_left": {"body_T_cam": mat(T_cam)}},
    }
    p = YamlParser(node_tree={}, shared_tree=shared)
    params = load_state_estimator_params(p)
    np.testing.assert_allclose(params.body_T_imu, T_imu)
    np.testing.assert_allclose(params.body_T_receiver, T_recv)
    np.testing.assert_allclose(params.body_T_mag, T_mag)
    np.testing.assert_allclose(params.body_T_cam, T_cam)
    np.testing.assert_allclose(params.mag_sensor_bias, [1.0, 2.0, 3.0])

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    est = StateEstimator(params, rig)
    assert est._q_body_imu is not None
    assert est._body_t_receiver is not None
    np.testing.assert_allclose(np.asarray(est._body_t_receiver), T_recv[:3, 3])
    assert not est._cam_is_identity
    np.testing.assert_allclose(
        np.asarray(est._smoother_cfg.body_t_receiver), T_recv[:3, 3]
    )
    np.testing.assert_allclose(
        np.asarray(est._smoother_cfg.mag_bias), [1.0, 2.0, 3.0]
    )
    np.testing.assert_allclose(
        np.asarray(est.params.imu_calib.body_R_imu).reshape(3, 3), T_imu[:3, :3]
    )
