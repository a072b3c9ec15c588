"""Trajectory evaluation (vio/evaluation.py): ATE/RPE/alignment.

The reference has no numeric trajectory metric (it renders groundtruth,
tools/vio_dataset_player/main.cpp:135-137); these tests lock the TUM-style
evaluation we add on top with analytically-known trajectories."""

import numpy as np
import pytest

from ocean_perception_tpu.core.measurements import GroundtruthPose
from ocean_perception_tpu.vio.evaluation import (
    absolute_trajectory_error,
    align_umeyama,
    evaluate_trajectory,
    interpolate_poses,
    relative_pose_error,
    _load_tum_or_euroc_csv,
)


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _circle_trajectory(n=50, radius=2.0, hz=10.0):
    """Body moves on a circle, yaw tangent to it. Returns (ts_ns, (N,4,4))."""
    ts = (np.arange(n) / hz * 1e9).astype(np.int64)
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        T = np.eye(4)
        T[:3, :3] = _rot_z(th)
        T[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0.1 * np.sin(3 * th)]
        poses.append(T)
    return ts, np.stack(poses)


def test_umeyama_recovers_known_transform():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(40, 3))
    R_true = _rot_z(0.7) @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    s_true = 1.7
    dst = (s_true * (R_true @ src.T)).T + t_true
    s, R, t = align_umeyama(src, dst, with_scale=True)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    # SE3 mode pins scale to 1.
    s2, _, _ = align_umeyama(src, dst, with_scale=False)
    assert s2 == 1.0


def test_ate_zero_on_identical_and_offset_without_alignment():
    ts, poses = _circle_trajectory()
    ate = absolute_trajectory_error(ts, poses, ts, poses, align="none")
    assert ate.rmse < 1e-12 and ate.n == len(ts)

    est = poses.copy()
    est[:, :3, 3] += np.array([0.3, -0.4, 0.0])  # |offset| = 0.5
    raw = absolute_trajectory_error(ts, est, ts, poses, align="none")
    assert abs(raw.rmse - 0.5) < 1e-9
    # A rigid offset is exactly what SE3 alignment removes.
    aligned = absolute_trajectory_error(ts, est, ts, poses, align="se3")
    assert aligned.rmse < 1e-9


def test_ate_sim3_recovers_scale():
    ts, poses = _circle_trajectory()
    est = poses.copy()
    est[:, :3, 3] *= 0.5  # monocular-style scale error
    sim3 = absolute_trajectory_error(ts, est, ts, poses, align="sim3")
    assert sim3.rmse < 1e-9 and abs(sim3.scale - 2.0) < 1e-9
    se3 = absolute_trajectory_error(ts, est, ts, poses, align="se3")
    assert se3.rmse > 0.1  # scale error survives a rigid fit


def test_interpolation_midpoint_position_and_rotation():
    gt_ts = np.array([0, 1_000_000_000], np.int64)
    T0, T1 = np.eye(4), np.eye(4)
    T1[:3, :3] = _rot_z(np.pi / 2)
    T1[:3, 3] = [2.0, 0.0, 4.0]
    out, mask = interpolate_poses(gt_ts, np.stack([T0, T1]), np.array([500_000_000]))
    assert mask.all() and out.shape == (1, 4, 4)
    np.testing.assert_allclose(out[0, :3, 3], [1.0, 0.0, 2.0], atol=1e-12)
    np.testing.assert_allclose(out[0, :3, :3], _rot_z(np.pi / 4), atol=1e-9)
    # Out-of-span queries are masked out, not extrapolated.
    out2, mask2 = interpolate_poses(
        gt_ts, np.stack([T0, T1]), np.array([-5, 500_000_000, 2_000_000_000])
    )
    assert list(mask2) == [False, True, False] and out2.shape[0] == 1


def test_rpe_measures_drift_rate():
    ts, poses = _circle_trajectory(n=80, hz=10.0)
    drift_per_s = 0.05
    est = poses.copy()
    est[:, :3, 3, ] += (ts[:, None] / 1e9) * np.array([drift_per_s, 0, 0])
    rpe = relative_pose_error(ts, est, ts, poses, delta_s=1.0)
    # Closest-match pairing (TUM semantics) pairs trailing samples with the
    # LAST sample when it lies within tolerance of the 1 s target, so those
    # pairs span slightly less than 1 s of drift: rmse lands just below the
    # per-second rate, never above it.
    assert 0.95 * drift_per_s < rpe.trans_rmse <= drift_per_s + 1e-9
    assert rpe.rot_rmse_deg < 1e-6
    # Interior pairs are exact: restricting to a tight tolerance recovers
    # the exact per-second drift.
    rpe_tight = relative_pose_error(ts, est, ts, poses, delta_s=1.0, tol_frac=0.01)
    assert abs(rpe_tight.trans_rmse - drift_per_s) < 1e-9
    # ... while ATE sees the accumulated error (much larger than the rate).
    ate = absolute_trajectory_error(ts, est, ts, poses, align="none")
    assert ate.max > 5 * drift_per_s


def test_rpe_rotation_error():
    ts, poses = _circle_trajectory(n=40, hz=10.0)
    est = poses.copy()
    # Inject 2 deg of extra yaw per second of motion.
    for i in range(len(ts)):
        extra = np.radians(2.0) * ts[i] / 1e9
        est[i, :3, :3] = _rot_z(extra) @ est[i, :3, :3]
    rpe = relative_pose_error(ts, est, ts, poses, delta_s=1.0, tol_frac=0.01)
    assert abs(rpe.rot_rmse_deg - 2.0) < 1e-6
    # Default tolerance includes sub-1s tail pairs: bounded by the rate.
    rpe_loose = relative_pose_error(ts, est, ts, poses, delta_s=1.0)
    assert 0.9 * 2.0 < rpe_loose.rot_rmse_deg <= 2.0 + 1e-6


def test_evaluate_trajectory_with_groundtruth_records():
    # Constant-velocity straight line with fixed attitude: linear
    # interpolation of groundtruth is then EXACT, so an estimate sampled at
    # off-grid times can be computed analytically and must score ~zero.
    vel = np.array([1.0, 0.5, -0.2])
    R = _rot_z(0.3)

    def pose_at(t_ns):
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = vel * (t_ns / 1e9)
        return T

    gt_ts = (np.arange(50) * 100_000_000).astype(np.int64)
    gt = [GroundtruthPose(int(t), pose_at(t)) for t in gt_ts]
    est_ts = gt_ts[1:-1] + 50_000_000  # halfway between groundtruth samples
    est = np.stack([pose_at(t) for t in est_ts])
    report = evaluate_trajectory(est_ts, est, gt, rpe_deltas_s=[0.5, 1.0])
    assert report["ate_rmse_m"] < 1e-9
    assert set(report["rpe"]) == {"0.5s", "1s"}
    assert report["rpe"]["1s"]["trans_rmse_m"] < 1e-9


def test_no_overlap_raises():
    ts, poses = _circle_trajectory()
    with pytest.raises(ValueError, match="overlap"):
        absolute_trajectory_error(ts + 10**12, poses, ts, poses)


def test_csv_loader_euroc_and_tum(tmp_path):
    ts, poses = _circle_trajectory(n=12)
    from ocean_perception_tpu.vio.evaluation import _mat_to_quat

    euroc = tmp_path / "euroc.csv"
    with open(euroc, "w") as f:
        f.write("#timestamp, qw, qx, qy, qz, tx, ty, tz\n")
        for t, P in zip(ts + 10**15, poses):  # big ns timestamps
            q = _mat_to_quat(P[:3, :3])
            f.write(f"{t},{q[0]},{q[1]},{q[2]},{q[3]},{P[0,3]},{P[1,3]},{P[2,3]}\n")
    tum = tmp_path / "tum.txt"
    with open(tum, "w") as f:
        for t, P in zip(ts, poses):
            q = _mat_to_quat(P[:3, :3])
            f.write(
                f"{t/1e9:.9f} {P[0,3]} {P[1,3]} {P[2,3]} {q[1]} {q[2]} {q[3]} {q[0]}\n"
            )
    ts_e, poses_e = _load_tum_or_euroc_csv(str(euroc))
    ts_t, poses_t = _load_tum_or_euroc_csv(str(tum))
    np.testing.assert_allclose(poses_e, poses, atol=1e-9)
    np.testing.assert_allclose(poses_t, poses, atol=1e-6)
    np.testing.assert_array_equal(ts_t, ts)
    ate = absolute_trajectory_error(ts_e, poses_e, ts_e, poses, align="none")
    assert ate.rmse < 1e-9


def test_csv_loader_real_euroc_groundtruth_layout(tmp_path):
    """A genuine EuRoC state_groundtruth_estimate0/data.csv: position-FIRST,
    qw-FIRST, 17 columns. Regression: the quat-norm heuristic used to route
    this to the TUM branch with the quaternion component order scrambled."""
    ts, poses = _circle_trajectory(n=12)
    from ocean_perception_tpu.vio.evaluation import _mat_to_quat

    gt = tmp_path / "data.csv"
    with open(gt, "w") as f:
        f.write(
            "#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m],"
            " q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z [],"
            " v_RS_R_x [m s^-1], v_RS_R_y [m s^-1], v_RS_R_z [m s^-1],"
            " b_w_RS_S_x [rad s^-1], b_w_RS_S_y [rad s^-1],"
            " b_w_RS_S_z [rad s^-1], b_a_RS_S_x [m s^-2],"
            " b_a_RS_S_y [m s^-2], b_a_RS_S_z [m s^-2]\n"
        )
        for t, P in zip(ts + 10**15, poses):
            q = _mat_to_quat(P[:3, :3])
            vel_bias = ",".join(["0.0"] * 9)
            f.write(
                f"{t},{P[0,3]},{P[1,3]},{P[2,3]},"
                f"{q[0]},{q[1]},{q[2]},{q[3]},{vel_bias}\n"
            )
    ts_g, poses_g = _load_tum_or_euroc_csv(str(gt))
    np.testing.assert_array_equal(ts_g, ts + 10**15)
    np.testing.assert_allclose(poses_g, poses, atol=1e-9)
    # Width alone (no header) must also route correctly.
    gt2 = tmp_path / "data2.csv"
    with open(gt2, "w") as f:
        for t, P in zip(ts + 10**15, poses):
            q = _mat_to_quat(P[:3, :3])
            f.write(
                f"{t},{P[0,3]},{P[1,3]},{P[2,3]},"
                f"{q[0]},{q[1]},{q[2]},{q[3]}," + ",".join(["0.0"] * 9) + "\n"
            )
    _, poses_g2 = _load_tum_or_euroc_csv(str(gt2))
    np.testing.assert_allclose(poses_g2, poses, atol=1e-9)


def test_csv_loader_tum_integer_seconds(tmp_path):
    """TUM timestamps are SECONDS even when integral. Regression: whole-
    second stamps used to be taken as nanoseconds (1e9x too small)."""
    ts, poses = _circle_trajectory(n=5)
    from ocean_perception_tpu.vio.evaluation import _mat_to_quat

    tum = tmp_path / "tum_int.txt"
    with open(tum, "w") as f:
        for k, P in enumerate(poses):
            q = _mat_to_quat(P[:3, :3])
            f.write(
                f"{k} {P[0,3]} {P[1,3]} {P[2,3]} {q[1]} {q[2]} {q[3]} {q[0]}\n"
            )
    ts_t, poses_t = _load_tum_or_euroc_csv(str(tum))
    np.testing.assert_array_equal(ts_t, np.arange(5) * 10**9)
    np.testing.assert_allclose(poses_t, poses, atol=1e-9)


def test_rpe_pairs_with_trailing_sample():
    """ts=[0, 0.8s], delta=1s, tol=0.25: the 0.8 s sample is the closest
    match and within tolerance — it must pair (regression: searchsorted
    returning len(ts) used to drop all trailing pairs)."""
    from ocean_perception_tpu.vio.evaluation import relative_pose_error

    ts = np.array([0, int(0.8e9)], np.int64)
    poses = np.stack([np.eye(4), np.eye(4)])
    est = poses.copy()
    est[1, 0, 3] = 0.04  # 4 cm over the 0.8 s pair
    rpe = relative_pose_error(ts, est, ts, poses, delta_s=1.0, tol_frac=0.25)
    assert rpe.n == 1
    assert abs(rpe.trans_rmse - 0.04) < 1e-12
