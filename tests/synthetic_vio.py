"""Synthetic EuRoC-format VIO dataset: a textured plane at known depth with
the camera accelerating from rest along +x, plus physically-consistent IMU.

Shared by the end-to-end estimator tests and the process-level fabric smoke.
The reference's vio_dataset_player drives exactly this dataset shape
(tools/vio_dataset_player/main.cpp:65-168)."""

from __future__ import annotations

import numpy as np

H, W = 160, 240
FX = 200.0
BASELINE = 0.3
DEPTH = 5.0
DISP = FX * BASELINE / DEPTH  # 12 px
ACC = 2.0                     # m/s^2 along +x, from rest at T0
T0 = 0.1                      # first frame time [s]
GRAVITY = np.array([0.0, 0.0, -9.81])


def x_of(t: float) -> float:
    """Ground-truth world x position at time t."""
    return 0.5 * ACC * max(t - T0, 0.0) ** 2


# Bounded oscillation for LONG missions: the constant-accel profile outruns
# the canvas's 320-px slack after ~26 frames (px = 40*x saturates at the
# border and VO sees a frozen scene while the IMU keeps accelerating).
# x in [0, 2*SIN_A]; px stays within the canvas for any duration.
SIN_A = 2.5          # metres: half the travel
SIN_W = 2.0 * np.pi / 8.0  # rad/s: 8 s period, a_max = A*w^2 = 1.54 m/s^2


def x_of_sin(t: float) -> float:
    return SIN_A * (1.0 - np.cos(SIN_W * max(t - T0, 0.0)))


def a_of_sin(t: float) -> float:
    return SIN_A * SIN_W**2 * np.cos(SIN_W * max(t - T0, 0.0))


def write_synthetic_euroc(root: str, n_frames: int = 16, imu_hz: int = 100, seed: int = 3,
                          motion: str = "accel", yaw_amp_deg: float = 0.0,
                          yaw_period_s: float = 4.0):
    """Write the dataset under `root` (EuRoC mav0 layout). Returns the
    ground-truth x(t). motion="accel" (default, the tests' contract) or
    "sin" (bounded oscillation — required for missions past ~26 frames,
    see x_of_sin).

    yaw_amp_deg > 0 adds an aggressive-heading profile psi(t) =
    amp*sin(2pi t/period) about the camera's optical axis. The camera films
    a fronto-parallel plane, so optical-axis rotation is in-plane image
    rotation — and the stereo RIG rotates rigidly, so the right image is
    sampled at +DISP along the ROTATED image x-axis (rectification
    preserved; both views share the rotation). Groundtruth carries
    R(t) = Rz(psi) and the IMU the matching body rates/specific force.
    Used by the mission stress matrix's aggressive-yaw scenarios."""
    import cv2

    from ocean_perception_tpu.core.measurements import GroundtruthPose, ImuMeasurement
    from ocean_perception_tpu.datasets.euroc import EurocDataWriter

    rng = np.random.default_rng(seed)
    canvas = cv2.GaussianBlur(
        rng.random((H + 8, W + 320)).astype(np.float32), (5, 5), 1.0
    ) * 0.8 + 0.1
    x_fn = x_of if motion == "accel" else x_of_sin
    yaw_w = 2.0 * np.pi / yaw_period_s

    def psi_of(t: float) -> float:
        return np.deg2rad(yaw_amp_deg) * np.sin(yaw_w * max(t - T0, 0.0))

    def psidot_of(t: float) -> float:
        return np.deg2rad(yaw_amp_deg) * yaw_w * np.cos(yaw_w * max(t - T0, 0.0))

    def Rz(a: float) -> np.ndarray:
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])

    cimg = np.array([W / 2 - 0.5, H / 2 - 0.5])

    def frame(t: float):
        px = FX * x_fn(t) / DEPTH
        c0 = np.array([40 + px + W / 2 - 0.5, 4 + H / 2 - 0.5])
        psi = psi_of(t)
        if abs(psi) < 1e-9:
            cl = cv2.getRectSubPix(canvas, (W, H), tuple(c0))
            cr = cv2.getRectSubPix(canvas, (W, H), (c0[0] + DISP, c0[1]))
            return cl, cr
        c, s = np.cos(psi), np.sin(psi)
        R2 = np.array([[c, -s], [s, c]])

        def snap(disp: float):
            # dst pixel u -> canvas point c0 + R(psi) @ (u - cimg + [disp, 0])
            A = np.zeros((2, 3), np.float64)
            A[:, :2] = R2
            A[:, 2] = c0 + R2 @ (np.array([disp, 0.0]) - cimg)
            return cv2.warpAffine(
                canvas, A.astype(np.float32), (W, H),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                borderMode=cv2.BORDER_REPLICATE,
            )

        return snap(0.0), snap(DISP)

    wtr = EurocDataWriter(root)
    for i in range(n_frames):
        t = (i + 1) * 0.1
        cl, cr = frame(t)
        wtr.write_stereo(int(t * 1e9), cl, cr)
        T = np.eye(4)
        T[:3, :3] = Rz(psi_of(t))
        T[0, 3] = x_fn(t)
        wtr.write_groundtruth(GroundtruthPose(int(t * 1e9), T))
    dt = 1.0 / imu_hz
    for k in range(n_frames * int(0.1 * imu_hz)):
        t = T0 + k * dt
        ax = ACC if motion == "accel" else a_of_sin(t)
        a_world = np.array([ax, 0.0, 0.0])
        R = Rz(psi_of(t))
        a_body = R.T @ (a_world - GRAVITY)
        gyro = np.array([0.0, 0.0, psidot_of(t)])
        wtr.write_imu(ImuMeasurement(int(t * 1e9), gyro, a_body))
    wtr.finish()
    return x_fn


SHARED_YAML = f"""
n_gravity: [0, 0, -9.81]

imu0:
  frame_id: imu0
  body_T_imu:
    rows: 4
    cols: 4
    data: [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
  noise_model:
    accel_noise_sigma: 0.001
    gyro_noise_sigma: 0.0004
    accel_bias_rw_sigma: 0.0001
    gyro_bias_rw_sigma: 0.00004

stereo_forward:
  camera_left:
    frame_id: camera_left
    body_T_cam:
      rows: 4
      cols: 4
      data: [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
    image_height: {H}
    image_width: {W}
    camera_model: pinhole
    intrinsics: [{FX}, {FX}, {W / 2}, {H / 2}]
    distortion_model: radial-tangential
    distortion_coefficients: [0.0, 0.0, 0.0, 0.0]
  camera_right:
    frame_id: camera_right
    body_T_cam:
      rows: 4
      cols: 4
      data: [1, 0, 0, {BASELINE},  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
    image_height: {H}
    image_width: {W}
    camera_model: pinhole
    intrinsics: [{FX}, {FX}, {W / 2}, {H / 2}]
    distortion_model: radial-tangential
    distortion_coefficients: [0.0, 0.0, 0.0, 0.0]
"""

NODE_YAML = """
filter_publish_hz: 50

StateEstimator:
  min_sec_btw_keyposes: 0.15
  max_sec_btw_keyposes: 10.0
  allowed_misalignment_depth: 0.05
  allowed_misalignment_range: 0.15
  soft_correction_pos: 0.05
  hard_correction_pos: 0.5

  FixedLagSmoother:
    window: 8
    iterations: 5

  StereoFrontend:
    sigma_tracked_point: 1.0
    lm_max_iters: 20
    lm_max_error_stdevs: 3.0

    StereoTracker:
      stereo_max_depth: 20.0
      stereo_min_depth: 0.2
      trigger_keyframe_min_lmks: 10
      trigger_keyframe_k: 2

      FeatureDetector:
        max_features_per_frame: 96
        min_distance_btw_tracked_and_detected_features: 10
        gftt_quality_level: 0.01
        gftt_block_size: 9

      FeatureTracker:
        klt_maxiters: 30
        klt_epsilon: 0.01
        klt_winsize: 21
        klt_max_level: 3

      StereoMatcher:
        templ_cols: 15
        templ_rows: 11
        max_disp: 32
        max_matching_cost: 0.3
"""
