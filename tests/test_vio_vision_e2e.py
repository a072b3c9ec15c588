"""End-to-end VISION-driven VIO: rendered stereo sequence → StateEstimator.

A textured planar scene at known depth, camera translating laterally at
constant velocity. Every stage runs: detection, LK tracking, stripe stereo
matching, LM odometry, keyposing, smoothing. The recovered trajectory must
match the ground-truth motion.
"""

import cv2
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import StereoImage
from ocean_perception_tpu.tracking import DetectorParams, LKParams, StripeMatcherParams
from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams
from ocean_perception_tpu.vio.odometry import OdometryParams
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import (
    SmootherMode,
    StateEstimator,
    StateEstimatorParams,
)
from ocean_perception_tpu.vio.stereo_frontend import FrontendParams

H, W = 160, 240
FX = 200.0
BASELINE = 0.3
DEPTH = 5.0            # planar scene depth [m]
DISP = FX * BASELINE / DEPTH  # = 12 px


@pytest.mark.slow
def test_vision_only_trajectory():
    rng = np.random.default_rng(4)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.0) * 0.8 + 0.1

    # Camera moves +x; for a plane at depth z, image content shifts by
    # fx * tx / z pixels (left), right image additionally offset by DISP.
    def render(i):
        px_shift = i * 4  # 4 px/frame
        left = canvas[:, 40 + px_shift : 40 + px_shift + W]
        right = canvas[:, 40 + px_shift + int(DISP) : 40 + px_shift + int(DISP) + W]
        return left, right

    dx_per_frame = 4 * DEPTH / FX  # meters of true motion per frame = 0.1 m

    cam = PinholeCamera.create(FX, FX, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, BASELINE)
    params = StateEstimatorParams(
        n_gravity=np.array([0.0, 0.0, -9.81]),
        frontend=FrontendParams(
            tracker=StereoTrackerParams(
                capacity=96,
                detector=DetectorParams(max_features=96, min_distance=10, border=10),
                lk=LKParams(max_level=2),
                matcher=StripeMatcherParams(
                    max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.3
                ),
                trigger_keyframe_k=2,
            ),
            odometry=OdometryParams(),
            pixel_sigma=1.0,
        ),
        smoother=SmootherConfig(window=8, iterations=5),
        min_sec_btw_keyposes=0.05,
        max_sec_btw_keyposes=10.0,  # never fall back to IMU keyposes
    )
    est = StateEstimator(params, rig)
    # Initialize at the FIRST measurement time (as vio_dataset_player does
    # from groundtruth): the VO alignment gate (fixed_lag_smoother.cpp:277)
    # only accepts keyframe chains that start at the previous keypose.
    est.initialize(int(1e8), np.eye(4))

    n_frames = 8
    traj = []  # (t_ns, world_T_body) at every smoother advance
    for i in range(n_frames):
        t_ns = int((i + 1) * 1e8)  # 10 Hz
        l, r = render(i)
        est.receive_stereo(StereoImage(t_ns, 0, l, r))
        ss_i = est.smoother_state()
        if ss_i is not None and (not traj or ss_i.timestamp != traj[-1][0]):
            traj.append((ss_i.timestamp, np.asarray(ss_i.world_T_body)))

    assert est.mode is SmootherMode.VISION_AVAILABLE
    ss = est.smoother_state()
    assert ss is not None
    p = ss.world_T_body[:3, 3]
    # The camera x-axis motion: total true displacement at the newest keypose.
    # Keyposes happen on keyframes; the newest one is at or before frame n-1.
    total_true = (n_frames - 1) * dx_per_frame
    # Direction dominated by +x, magnitude within 25%.
    assert p[0] > 0.5 * total_true
    assert abs(p[0] - total_true) / total_true < 0.3
    assert abs(p[1]) < 0.15 and abs(p[2]) < 0.15

    # Whole-trajectory metric (not just the endpoint): ATE in the shared
    # odometry frame against the analytic constant-velocity groundtruth.
    from ocean_perception_tpu.vio.evaluation import absolute_trajectory_error

    assert len(traj) >= 3
    est_ts = np.array([t for t, _ in traj], np.int64)
    est_poses = np.stack([T for _, T in traj])
    gt_poses = np.stack(
        [np.eye(4) for _ in est_ts]
    )
    gt_poses[:, 0, 3] = (est_ts / 1e8 - 1.0) * dx_per_frame  # frame k is at (k+1)*1e8 ns
    ate = absolute_trajectory_error(est_ts, est_poses, est_ts, gt_poses, align="none")
    assert ate.rmse < 0.15, ate


@pytest.mark.slow
def test_vo_composes_across_skipped_keyframes():
    """When min_sec_btw_keyposes drops keyframes, the keypose between factor
    must span the COMPOSED motion across all skipped keyframes, not just the
    last keyframe interval (vo.T_prev_cur is last-keyframe->current because
    the tracker re-snapshots on every keyframe)."""
    rng = np.random.default_rng(4)
    canvas = rng.random((H, W + 260)).astype(np.float32)
    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.0) * 0.8 + 0.1

    def render(i):
        px_shift = i * 4
        left = canvas[:, 40 + px_shift : 40 + px_shift + W]
        right = canvas[:, 40 + px_shift + int(DISP) : 40 + px_shift + int(DISP) + W]
        return left, right

    dx_per_frame = 4 * DEPTH / FX  # 0.1 m

    cam = PinholeCamera.create(FX, FX, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, BASELINE)
    params = StateEstimatorParams(
        n_gravity=np.array([0.0, 0.0, -9.81]),
        frontend=FrontendParams(
            tracker=StereoTrackerParams(
                capacity=96,
                detector=DetectorParams(max_features=96, min_distance=10, border=10),
                lk=LKParams(max_level=2),
                matcher=StripeMatcherParams(
                    max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.3
                ),
                trigger_keyframe_k=2,  # keyframe every 2 frames = 0.2 s
            ),
            odometry=OdometryParams(),
            pixel_sigma=1.0,
        ),
        smoother=SmootherConfig(window=8, iterations=5),
        min_sec_btw_keyposes=0.25,  # drops every other keyframe
        max_sec_btw_keyposes=10.0,
    )
    est = StateEstimator(params, rig)
    est.initialize(int(1e8), np.eye(4))

    n_frames = 10
    for i in range(n_frames):
        t_ns = int((i + 1) * 1e8)
        l, r = render(i)
        est.receive_stereo(StereoImage(t_ns, 0, l, r))

    ss = est.smoother_state()
    assert ss is not None
    newest_i = int(float(ss.timestamp) * 1e-9 * 10 + 0.5) - 1  # frame index
    total_true = newest_i * dx_per_frame
    p = ss.world_T_body[:3, 3]
    # Without composition, each keypose misses one full keyframe interval and
    # the trajectory comes out ~half-length.
    assert abs(p[0] - total_true) / total_true < 0.3, (p[0], total_true)
    assert abs(p[1]) < 0.15 and abs(p[2]) < 0.15


@pytest.mark.slow
def test_vision_trajectory_with_landmark_factors():
    """The estimator-level landmark path (host id->column assignment,
    recycling, window writes, structureless stereo projection factors) driven
    end to end: with max_landmarks > 0 the recovered trajectory must stay
    accurate. Also locks the rig baseline reaching the smoother's disparity
    rows (it was silently left at the 0.2 default)."""
    rng = np.random.default_rng(4)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.0) * 0.8 + 0.1

    def render(i):
        px_shift = i * 4
        left = canvas[:, 40 + px_shift : 40 + px_shift + W]
        right = canvas[:, 40 + px_shift + int(DISP) : 40 + px_shift + int(DISP) + W]
        return left, right

    dx_per_frame = 4 * DEPTH / FX

    cam = PinholeCamera.create(FX, FX, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, BASELINE)
    params = StateEstimatorParams(
        n_gravity=np.array([0.0, 0.0, -9.81]),
        frontend=FrontendParams(
            tracker=StereoTrackerParams(
                capacity=96,
                detector=DetectorParams(max_features=96, min_distance=10, border=10),
                lk=LKParams(max_level=2),
                matcher=StripeMatcherParams(
                    max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.3
                ),
                trigger_keyframe_k=2,
            ),
            odometry=OdometryParams(),
            pixel_sigma=1.0,
        ),
        smoother=SmootherConfig(
            window=8, iterations=5, max_landmarks=24, lmk_sigma_px=2.0
        ),
        min_sec_btw_keyposes=0.05,
        max_sec_btw_keyposes=10.0,
    )
    est = StateEstimator(params, rig)
    # The rig baseline must reach the smoother's stereo disparity rows.
    assert est._smoother_cfg.cam_baseline == pytest.approx(BASELINE)
    est.initialize(int(1e8), np.eye(4))

    n_frames = 8
    for i in range(n_frames):
        t_ns = int((i + 1) * 1e8)
        l, r = render(i)
        est.receive_stereo(StereoImage(t_ns, 0, l, r))

    # Landmarks actually attached: some window columns valid.
    assert int(np.asarray(est.window.lmk_valid).sum()) > 10
    assert len(est._lmk_columns) > 0

    ss = est.smoother_state()
    assert ss is not None
    p = ss.world_T_body[:3, 3]
    total_true = (n_frames - 1) * dx_per_frame
    assert abs(p[0] - total_true) / total_true < 0.3, (p[0], total_true)
    assert abs(p[1]) < 0.15 and abs(p[2]) < 0.15
