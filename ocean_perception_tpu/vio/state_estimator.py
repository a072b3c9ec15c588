"""StateEstimator: the top-level VIO engine (smoother + EKF hybrid).

Reference parity: vio/state_estimator.{hpp,cpp} — three worker threads
(frontend / smoother / filter) connected by queues, with:
- keypose-aligned measurement gathering with per-sensor misalignment
  tolerances (cpp:237-282),
- smoother mode state machine VISION_AVAILABLE/UNAVAILABLE: keyposes come
  from VO when tracking works, else from IMU/range cadence (cpp:333-434),
- filter↔smoother sync: on each smoother result the EKF rewinds to the
  keypose time, applies a soft (pose measurement) or hard (re-initialize)
  correction depending on divergence, then replays IMU (cpp:496-549).

TPU-native redesign: the engine core is a *synchronous, deterministic*
``process_*`` API driven by the caller (dataset playback or fabric node) —
threads belong to the transport layer, not the estimator. All numeric work
happens in jitted pure functions (frontend step, smoother solve, EKF
predict/update); this class only routes measurements, manages host-side
history buffers, and implements the sync policy. ``SmootherMode`` and the
failure-handling semantics match the reference.
"""

from __future__ import annotations

import collections
import dataclasses
import enum
import threading
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.buffers import DataManager, ItemHistory
from ..core.cameras import StereoCamera
from ..core.measurements import (
    DepthMeasurement,
    ImuMeasurement,
    MagMeasurement,
    RangeMeasurement,
    StereoImage,
)
from ..core.quaternion import quat_to_matrix, matrix_to_quat

# filter_state() runs per filter callback at the IMU rate — one program,
# not ~10 eager dispatches.
_quat_to_matrix_jit = jax.jit(quat_to_matrix)
from ..core.se3 import gravity_axis
from .ekf import (
    EkfParams,
    EkfState,
    ekf_initialize,
    ekf_predict,
    ekf_replay_imu,
    ekf_update_depth,
    ekf_update_imu,
    ekf_update_pose,
    ekf_update_range,
)
from .imu_preintegration import ImuCalibration
from .smoother import (
    KeyposeWindow,
    SmootherConfig,
    SmootherResult,
    make_window,
    preintegrate_window,
    slide_window,
    solve_window,
)
from .stereo_frontend import FrontendParams, FrontendStatus, StereoFrontend, VoResult


class SmootherMode(enum.Enum):
    VISION_AVAILABLE = 0
    VISION_UNAVAILABLE = 1


@dataclasses.dataclass
class StateEstimatorParams:
    frontend: FrontendParams = dataclasses.field(default_factory=FrontendParams)
    smoother: SmootherConfig = dataclasses.field(default_factory=SmootherConfig)
    ekf: EkfParams = dataclasses.field(default_factory=EkfParams)
    imu_calib: ImuCalibration = dataclasses.field(default_factory=ImuCalibration)
    n_gravity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 9.81, 0.0])
    )
    max_imu_per_keypose: int = 256
    min_sec_btw_keyposes: float = 0.5
    max_sec_btw_keyposes: float = 1.0
    # Misalignment tolerances for attaching measurements to a keypose (sec).
    depth_tolerance: float = 0.1
    # External pose fixes attach to a keypose only within this window (a
    # 6-DoF fix Δt away is biased by v·Δt, unlike slowly-varying depth).
    fix_tolerance: float = 0.05
    range_tolerance: float = 0.2
    # Filter divergence thresholds vs smoother (soft = measurement update,
    # hard = re-initialize; state_estimator.cpp:507-543).
    soft_correction_pos: float = 0.05
    hard_correction_pos: float = 0.5
    ekf_history_sec: float = 10.0
    # VO-chain alignment gate: the accumulated keyframe-to-keyframe VO is
    # only usable as a keypose between factor when its chain starts at the
    # previous keypose (fixed_lag_smoother.cpp:277 uses 0.01 s).
    vo_align_tolerance: float = 0.01
    # Feed depth/range measurements to the EKF (they always reach the
    # smoother); StateEstimatorLcm.yaml filter_use_depth / filter_use_range.
    filter_use_depth: bool = True
    filter_use_range: bool = True
    # VO-timeout slack: the reference smoother loop waits
    # max_sec_btw_keyposes + 0.1 s for a VO result before declaring vision
    # unavailable (WaitForResultOrTimeout, state_estimator.cpp:336-342).
    vo_timeout_slack: float = 0.1
    # Sensor extrinsics from the shared rig file (config/shared/*.yaml; the
    # reference pipes these through its param structs — state_estimator.cpp
    # :49, state_ekf.cpp:54-56, fixed_lag_smoother.cpp:62-68). All shipped
    # rigs are identity except the camera translations.
    body_T_cam: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    body_T_imu: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    body_T_receiver: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    body_T_mag: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    mag_sensor_bias: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))


@dataclasses.dataclass
class StateStamped:
    timestamp: int
    world_T_body: np.ndarray
    velocity: np.ndarray
    covariance: Optional[np.ndarray] = None


class StateEstimator:
    """Deterministic VIO engine; feed measurements in timestamp order."""

    def __init__(self, params: StateEstimatorParams, rig: StereoCamera):
        self.params = params
        self.rig = rig
        self._gravity_axis, g_unit = gravity_axis(params.n_gravity)
        self._gravity_unit = np.asarray(g_unit, np.float64)
        self._gravity = np.asarray(params.n_gravity, np.float64)

        self.frontend = StereoFrontend(params.frontend, rig)
        self.mode = SmootherMode.VISION_UNAVAILABLE

        # Measurement managers (host).
        self.imu_manager: DataManager[ImuMeasurement] = DataManager(max_size=10000)
        self.depth_manager: DataManager[DepthMeasurement] = DataManager(max_size=1000)
        self.range_manager: DataManager[RangeMeasurement] = DataManager(max_size=1000)
        self.mag_manager: DataManager[MagMeasurement] = DataManager(max_size=1000)
        # External fixes queue host-side until smoother attachment. A plain
        # deque + lock, NOT a DataManager: multi-source fixes (fiducial node
        # stamps frame time, USBL stamps ping time) legitimately arrive out
        # of order, and DataManager's monotonic push would drop them.
        self._fix_queue: collections.deque = collections.deque(maxlen=200)
        self._fix_lock = threading.Lock()

        # Sensor extrinsics (identity on all shipped rigs). VO is conjugated
        # into the body frame at intake; the EKF rotates IMU samples and
        # offsets range by the receiver lever arm; the smoother gets the
        # camera/receiver/mag mounts baked into its static config.
        self._body_T_cam = np.asarray(params.body_T_cam, np.float64)
        self._cam_is_identity = np.allclose(self._body_T_cam, np.eye(4))
        R_bi = np.asarray(params.body_T_imu[:3, :3], np.float64)
        self._imu_is_identity = np.allclose(params.body_T_imu, np.eye(4))
        self._q_body_imu = (
            None if np.allclose(R_bi, np.eye(3))
            else jnp.asarray(np.asarray(matrix_to_quat(jnp.asarray(R_bi))))
        )
        t_recv = np.asarray(params.body_T_receiver[:3, 3], np.float64)
        self._body_t_receiver = None if np.allclose(t_recv, 0) else jnp.asarray(t_recv)

        # Smoother window. Landmark projection factors need the left-camera
        # intrinsics baked into the (static) smoother config.
        smoother_cfg = params.smoother
        if smoother_cfg.max_landmarks > 0:
            smoother_cfg = smoother_cfg.replace(
                cam_fx=float(rig.left.fx), cam_fy=float(rig.left.fy),
                cam_cx=float(rig.left.cx), cam_cy=float(rig.left.cy),
                cam_baseline=float(rig.baseline),  # stereo disparity rows
            )
        smoother_cfg = smoother_cfg.replace(
            body_R_cam=tuple(self._body_T_cam[:3, :3].reshape(-1).tolist()),
            body_t_cam=tuple(self._body_T_cam[:3, 3].tolist()),
            body_t_receiver=tuple(t_recv.tolist()),
            mag_body_R_sensor=tuple(
                np.asarray(params.body_T_mag[:3, :3], np.float64).reshape(-1).tolist()
            ),
            mag_bias=tuple(np.asarray(params.mag_sensor_bias, np.float64).tolist()),
        )
        if not self._imu_is_identity:
            params.imu_calib = params.imu_calib.replace(
                body_R_imu=tuple(R_bi.reshape(-1).tolist()),
                body_t_imu=tuple(np.asarray(params.body_T_imu[:3, 3]).tolist()),
            )
        self._smoother_cfg = smoother_cfg
        self.window = make_window(smoother_cfg, params.max_imu_per_keypose)
        self._lmk_columns: dict = {}  # landmark id -> window landmark column
        self._n_keyposes = 0
        # Host-side int-ns keypose timestamps, one per filled slot. The
        # window's own timestamps array is f32 on-chip (epoch-scale ns
        # quantizes to ~hundreds of seconds there), so anything that must
        # MATCH a keypose by time — external fix attachment — reads these.
        self._keypose_times_ns: List[int] = []
        # The window stores MISSION-RELATIVE seconds (t - origin): f32 epoch
        # seconds quantize to ~128 s, which destroys dt_pair differences in
        # the bias random-walk whitening and the result timestamp. The
        # origin is the initialization time; relative seconds stay f32-exact
        # to sub-ms over multi-hour missions.
        self._time_origin_ns: int = 0
        self._last_smoother_t_ns: Optional[int] = None
        self._last_keypose_t: Optional[int] = None
        self._last_smoother_result: Optional[SmootherResult] = None

        # Running keyframe-to-keyframe VO composition. The tracker
        # re-snapshots its keyframe table on EVERY keyframe, so a single
        # vo.T_prev_cur spans only last-keyframe -> current; when the
        # min_sec_btw_keyposes gate drops a keyframe, the keypose between
        # factor must span the COMPOSED motion across all skipped keyframes.
        # _pending_vo_start_t records which keyframe the chain starts at, so
        # the factor is only used when the chain aligns with the previous
        # keypose (reference alignment gate, fixed_lag_smoother.cpp:277).
        self._pending_vo: Optional[np.ndarray] = None
        self._pending_vo_start_t: Optional[int] = None
        self._last_kf_t: Optional[int] = None
        # Last stereo frame ARRIVAL (any frame, keyframe or not): drives the
        # VO-timeout check so total camera silence flips the mode machine to
        # VISION_UNAVAILABLE instead of wedging it (the reference's smoother
        # loop gets this for free from WaitForResultOrTimeout,
        # state_estimator.cpp:336-397).
        self._last_stereo_t: Optional[int] = None

        # EKF + history for rewind/replay.
        self.ekf_params = params.ekf
        self.ekf_state: Optional[EkfState] = None
        self._ekf_time: Optional[int] = None
        self._ekf_history: ItemHistory = ItemHistory(lag_seconds=params.ekf_history_sec)
        self._imu_history: ItemHistory = ItemHistory(lag_seconds=params.ekf_history_sec)

        self.smoother_callbacks: List[Callable[[SmootherResult], None]] = []
        self.filter_callbacks: List[Callable[[StateStamped], None]] = []
        self._last_imu_t: Optional[int] = None
        # Set by ThreadedStateEstimator: held around every EKF-state mutation
        # so the vision thread's filter sync and the filter thread's IMU
        # updates serialize WITHOUT serializing the (long) smoother solve.
        self.sync_lock = None

        # Per-stage latency stats (reference: StatsTracker use at
        # state_estimator.cpp:395-396, 427-428).
        from ..utils.timing import StatsTracker

        self.stats = StatsTracker("state_estimator")
        self.print_stats = False

        self._solve = jax.jit(
            lambda win, pims, slot: solve_window(
                win,
                pims,
                jnp.asarray(self._gravity),
                jnp.asarray(self._gravity_unit),
                self._smoother_cfg,
                slot,
            )
        )
        self._replay_jit = jax.jit(
            lambda s, dts, g, a, m: ekf_replay_imu(
                s, dts, g, a, m, jnp.asarray(self._gravity), self.ekf_params,
                q_body_imu=self._q_body_imu,
            )
        )
        # The 100 Hz filter hot path MUST be one compiled program: eagerly,
        # predict+update is ~150 op dispatches (~17 ms/step on CPU — below
        # the IMU rate); jitted it is one (~0.2 ms). Same pattern for the
        # lower-rate depth/range updates.
        self._predict_update_jit = jax.jit(
            lambda s, dt, w, a: ekf_update_imu(
                ekf_predict(s, dt, self.ekf_params),
                w, a, jnp.asarray(self._gravity), self.ekf_params,
                q_body_imu=self._q_body_imu,
            )
        )
        self._update_depth_jit = jax.jit(
            lambda s, depth: ekf_update_depth(
                s, depth, jnp.asarray(self._gravity_unit), self.ekf_params
            )
        )
        self._update_range_jit = jax.jit(
            lambda s, rng, point: ekf_update_range(
                s, rng, point, self.ekf_params,
                body_t_receiver=self._body_t_receiver,
            )
        )

    # -- initialization -------------------------------------------------------

    def initialize(self, timestamp: int, world_T_body: np.ndarray) -> None:
        """External pose initialization (state_estimator_lcm InitializeLcm)."""
        R0 = world_T_body[:3, :3]
        p0 = world_T_body[:3, 3]
        q0 = matrix_to_quat(jnp.asarray(R0))
        self.ekf_state = ekf_initialize(t0=p0, q0=np.asarray(q0), dtype=jnp.float64)
        self._ekf_time = timestamp
        self._time_origin_ns = timestamp
        self._push_keypose(
            timestamp, R0, p0, np.zeros(3),
            vo_T=None, imu_rows=None, depth=None, ranges=(),
            prior_anchor=True,
        )

    # -- measurement intake ---------------------------------------------------

    def receive_imu(self, m: ImuMeasurement, check_keypose: bool = True) -> None:
        """check_keypose=False runs the FILTER path only (EKF + history); the
        threaded wrapper drives keypose creation from its vision/smoother
        thread via poll_imu_keypose() so a solve never blocks 100 Hz filter
        output (reference thread split, state_estimator.cpp:133-138)."""
        self.imu_manager.push(m)
        self._imu_history.add(m.timestamp, m)
        self._last_imu_t = m.timestamp
        if self.ekf_state is not None:
            self._filter_predict_update(m)
        if check_keypose:
            self._maybe_imu_keypose(m.timestamp)

    def poll_imu_keypose(self) -> None:
        """IMU-fallback keypose check at the newest IMU time (threaded mode)."""
        if self._last_imu_t is not None:
            self._maybe_imu_keypose(self._last_imu_t)

    def receive_depth(self, m: DepthMeasurement) -> None:
        self.depth_manager.push(m)
        if self.ekf_state is not None and self.params.filter_use_depth:
            self.ekf_state = self._update_depth_jit(self.ekf_state, m.depth)

    def receive_range(self, m: RangeMeasurement) -> None:
        self.range_manager.push(m)
        if self.ekf_state is not None and self.params.filter_use_range:
            self.ekf_state = self._update_range_jit(
                self.ekf_state, m.range, jnp.asarray(m.point, jnp.float64)
            )

    def receive_mag(self, m: MagMeasurement) -> None:
        self.mag_manager.push(m)

    def receive_pose(self, m) -> None:
        """External absolute pose aiding (core.measurements.PoseMeasurement:
        a fiducial relocalization fix from tracking.apriltags
        .estimate_camera_pose, a USBL fix, a surface GPS pose).

        Applied twice, like the reference treats depth/range: (1) as a
        manifold pose measurement at the EKF snapshot closest before the
        fix's timestamp, then IMU is replayed — the identical
        rewind/update/replay path a smoother soft correction takes; and
        (2) queued for the smoother, where the keypose nearest the fix gets
        a 6-DoF absolute factor (KeyposeWindow.fix_*), so the SMOOTHED
        trajectory is corrected too. Exceeds the reference, whose only
        external pose input is the one-shot initialization
        (state_estimator_lcm.cpp:137-176).
        """
        if self.ekf_state is None:
            return
        with self._fix_lock:
            self._fix_queue.append(m)
        cov = (
            np.eye(6) * 1e-4 if m.covariance is None
            else np.asarray(m.covariance, np.float64)
        )
        T = np.asarray(m.world_T_body, np.float64)
        q_meas = jnp.asarray(np.asarray(matrix_to_quat(jnp.asarray(T[:3, :3]))))
        t_meas = jnp.asarray(T[:3, 3])
        rewind = self._ekf_history.closest_before(m.timestamp)
        if rewind is None:
            # No snapshot at/before the fix: update the current state in
            # place without replay (a replay from an already-advanced state
            # would double-apply IMU — same guard as _sync_filter_locked).
            self.ekf_state = ekf_update_pose(
                self.ekf_state, t_meas, q_meas, jnp.asarray(cov)
            )
            return
        state = ekf_update_pose(rewind[1], t_meas, q_meas, jnp.asarray(cov))
        # Replay from the SNAPSHOT's time, not the fix's: snapshots live at
        # IMU sample times while fix stamps are camera/ping times, and
        # replaying from the later stamp would silently drop the
        # (t_snap, t_fix] propagation interval (up to one IMU period) on
        # every fix.
        self._commit_rewound_state(state, rewind[0])

    def receive_stereo(self, m: StereoImage) -> None:
        self._last_stereo_t = m.timestamp
        vo = self.frontend.track(m.left, m.right)
        status = int(vo.status)
        vision_ok = not (status & FrontendStatus.ODOM_ESTIMATION_FAILED) and not (
            status & FrontendStatus.NO_FEATURES_FROM_LAST_KF
        )
        self.mode = (
            SmootherMode.VISION_AVAILABLE if vision_ok else SmootherMode.VISION_UNAVAILABLE
        )
        if bool(vo.is_keyframe):
            if vision_ok:
                # Compose this keyframe's VO into the running chain so the
                # next accepted keypose spans the full interval even when
                # intermediate keyframes are dropped by the cadence gate.
                if self._pending_vo is None:
                    self._pending_vo = np.eye(4)
                    self._pending_vo_start_t = self._last_kf_t
                # VO measures camera motion; convert to BODY odometry by
                # conjugation (reference smoother.cpp:282: body_P_odom =
                # body_P_cam * cam_odom * body_P_cam^-1).
                T_cam = np.asarray(vo.T_prev_cur, np.float64)
                if not self._cam_is_identity:
                    T_cam = self._body_T_cam @ T_cam @ np.linalg.inv(self._body_T_cam)
                self._pending_vo = self._pending_vo @ T_cam
                self._last_kf_t = m.timestamp
                self._vision_keypose(m.timestamp, vo)
            else:
                # Tracking broke: the chain no longer spans a clean interval.
                self._pending_vo = None
                self._pending_vo_start_t = None
                self._last_kf_t = m.timestamp

    # -- keypose creation -----------------------------------------------------

    def _maybe_imu_keypose(self, timestamp: int) -> None:
        """VISION_UNAVAILABLE fallback: keyposes at min cadence from IMU.

        Also the VO-timeout check: while VISION_AVAILABLE, if no stereo frame
        has arrived within max_sec_btw_keyposes + slack of `timestamp`, vision
        has gone silent (cable pull, driver hang) and the mode flips to
        VISION_UNAVAILABLE here — otherwise a dead camera would wedge the
        estimator forever with the smoother stalled (the reference's smoother
        loop times out on the VO queue instead: state_estimator.cpp:336-397).
        """
        if self._last_keypose_t is None or self.ekf_state is None:
            return
        if self.mode is SmootherMode.VISION_AVAILABLE:
            last_seen = self._last_stereo_t
            if last_seen is None:
                last_seen = self._last_keypose_t
            silence = (timestamp - last_seen) * 1e-9
            if silence <= self.params.max_sec_btw_keyposes + self.params.vo_timeout_slack:
                return
            self.mode = SmootherMode.VISION_UNAVAILABLE
            # The keyframe chain no longer ends at a live keypose.
            self._pending_vo = None
            self._pending_vo_start_t = None
        dt = (timestamp - self._last_keypose_t) * 1e-9
        # Fallback keyposes come at MIN spacing (the reference creates them at
        # min_sec_btw_keyposes cadence once VO has timed out,
        # state_estimator.cpp:336-397) — vision-denied operation is exactly
        # when the graph needs keyposes most.
        if dt < self.params.min_sec_btw_keyposes:
            return
        imu_rows = self._gather_imu(self._last_keypose_t, timestamp)
        # Snapshot ONCE: under the threaded wrapper the filter thread rebinds
        # self.ekf_state concurrently (all EKF updates are functional); three
        # separate dereferences could mix R from one state with p/v from a
        # later one. A single reference read is consistent.
        st = self.ekf_state
        R = np.asarray(quat_to_matrix(st.q))
        p = np.asarray(st.t)
        v = np.asarray(st.v)
        self._push_keypose(
            timestamp, R, p, v,
            vo_T=None, imu_rows=imu_rows,
            depth=self._gather_depth(timestamp),
            ranges=self._gather_ranges(timestamp),
            # The reference attaches the mag factor to ANY keypose
            # (fixed_lag_smoother.cpp:401-411) — heading aiding matters most
            # exactly when vision is down.
            mag=self._gather_mag(timestamp),
        )
        self._run_smoother(timestamp)

    def _vision_keypose(self, timestamp: int, vo: VoResult) -> None:
        if self._last_keypose_t is not None:
            dt = (timestamp - self._last_keypose_t) * 1e-9
            if dt < self.params.min_sec_btw_keyposes:
                return  # keyframe skipped; _pending_vo keeps accumulating
        imu_rows = (
            self._gather_imu(self._last_keypose_t, timestamp)
            if self._last_keypose_t is not None
            else None
        )
        # The keypose between factor uses the ACCUMULATED keyframe chain —
        # valid only if the chain starts at the previous keypose (an IMU
        # fallback keypose or a tracking break invalidates alignment).
        tol_ns = int(self.params.vo_align_tolerance * 1e9)
        chain_aligned = (
            self._pending_vo is not None
            and self._pending_vo_start_t is not None
            and self._last_keypose_t is not None
            and abs(self._pending_vo_start_t - self._last_keypose_t) <= tol_ns
        )
        T_rel = self._pending_vo if chain_aligned else None
        # Chain is consumed either way: the next chain starts at this keyframe.
        self._pending_vo = None
        self._pending_vo_start_t = None

        prev_slot = self._newest_slot()
        if T_rel is not None:
            # Predicted new state: previous keypose composed with VO.
            R_prev = np.asarray(self.window.R[prev_slot])
            p_prev = np.asarray(self.window.p[prev_slot])
            R = R_prev @ T_rel[:3, :3]
            p = p_prev + R_prev @ T_rel[:3, 3]
            v = np.asarray(self.window.v[prev_slot])
        elif self.ekf_state is not None:
            st = self.ekf_state  # one snapshot: filter thread rebinds concurrently
            R = np.asarray(quat_to_matrix(st.q))
            p = np.asarray(st.t)
            v = np.asarray(st.v)
        else:
            R = np.asarray(self.window.R[prev_slot])
            p = np.asarray(self.window.p[prev_slot])
            v = np.asarray(self.window.v[prev_slot])
        self._push_keypose(
            timestamp, R, p, v,
            vo_T=T_rel, imu_rows=imu_rows,
            depth=self._gather_depth(timestamp),
            ranges=self._gather_ranges(timestamp),
            mag=self._gather_mag(timestamp),
        )
        self._attach_landmarks(vo)
        self._run_smoother(timestamp)

    def _gather_imu(self, t0: int, t1: int) -> Optional[np.ndarray]:
        items = [m for m in self.imu_manager.pop_until(t1) if m.timestamp > t0]
        if not items:
            return None
        # Boundary-dt padding (imu_manager.cpp:57-135): the preintegration
        # interval must span exactly [t0, t1] — the first row's dt covers the
        # gap from the keypose to the first sample, and a final padding row
        # (re-using the last measurement) covers last-sample -> t1.
        pad_ns = t1 - items[-1].timestamp
        n = len(items) + (1 if pad_ns > 0 else 0)
        rows = np.zeros((n, 7))
        t_prev = t0
        for i, m in enumerate(items):
            rows[i, 0] = (m.timestamp - t_prev) * 1e-9
            rows[i, 1:4] = m.angular_velocity
            rows[i, 4:7] = m.linear_acceleration
            t_prev = m.timestamp
        if pad_ns > 0:
            rows[-1, 0] = pad_ns * 1e-9
            rows[-1, 1:4] = items[-1].angular_velocity
            rows[-1, 4:7] = items[-1].linear_acceleration
        return rows

    def _gather_depth(self, t: int) -> Optional[float]:
        tol = int(self.params.depth_tolerance * 1e9)
        self.depth_manager.discard_before(t - tol)
        items = self.depth_manager.pop_until(t + tol)
        return items[-1].depth if items else None

    def _gather_ranges(self, t: int):
        tol = int(self.params.range_tolerance * 1e9)
        self.range_manager.discard_before(t - tol)
        items = self.range_manager.pop_until(t + tol)
        return [(m.range, np.asarray(m.point, np.float64)) for m in items[-self._smoother_cfg.max_ranges:]]

    def _gather_mag(self, t: int) -> Optional[np.ndarray]:
        tol = int(self.params.depth_tolerance * 1e9)
        self.mag_manager.discard_before(t - tol)
        items = self.mag_manager.pop_until(t + tol)
        return np.asarray(items[-1].field, np.float64) if items else None

    def _fix_tuple(self, m, dt_signed_sec: float, v_kp: np.ndarray):
        """PoseMeasurement → (R, p, sigma6) for the window's fix factor.

        PoseMeasurement covariance order is [t, theta]; the window's
        fix_sigma order is [rot, trans] (matching the residual layout).

        dt_signed_sec = t_keypose - t_fix. A fix measured Δt away from its
        keypose is BIASED by the body's true motion over Δt (up to v·Δt —
        measured 3x ATE degradation on a dynamic mission when fixes landed
        between keyposes); the position is therefore TRANSPORTED to the
        keypose time with the keypose's current velocity estimate, and the
        translational sigma is inflated only for the transport's own error
        (velocity-estimate error ~10% of speed, plus a 0.1 m/s floor for
        unmodeled acceleration over Δt)."""
        T = np.asarray(m.world_T_body, np.float64)
        cov = (
            np.eye(6) * 1e-4 if m.covariance is None
            else np.asarray(m.covariance, np.float64)
        )
        sig = np.sqrt(np.clip(np.diag(cov), 1e-12, None))
        sigma6 = np.concatenate([sig[3:6], sig[0:3]])
        p = T[:3, 3].copy()
        if dt_signed_sec != 0.0:
            v = np.asarray(v_kp, np.float64)
            p = p + dt_signed_sec * v
            speed = float(np.linalg.norm(v))
            slop = abs(dt_signed_sec) * (0.1 * speed + 0.1)
            sigma6[3:6] = np.sqrt(sigma6[3:6] ** 2 + slop**2)
        return T[:3, :3], p, sigma6

    def _attach_pending_fixes(self) -> None:
        """Attach queued external pose fixes to their closest keypose slot
        (within ±fix_tolerance).

        A fix normally arrives AFTER the keypose for its frame exists (the
        fiducial detector / USBL solver has latency), so attachment is
        retroactive: this runs before every solve, on the window-owning
        thread (the filter thread's receive_pose must not mutate the
        window). Fixes newer than the newest keypose stay queued for the
        keypose still to come; first fix per slot wins.

        Matching uses the HOST int-ns keypose times (_keypose_times_ns) —
        the window's own f32 timestamps quantize epoch-scale ns far coarser
        than fix_tolerance on-chip."""
        if self._n_keyposes == 0 or self._last_keypose_t is None:
            return
        tol_ns = int(self.params.fix_tolerance * 1e9)
        times = self._keypose_times_ns
        bound = self._last_keypose_t + tol_ns
        with self._fix_lock:
            take = [m for m in self._fix_queue if m.timestamp <= bound]
            if not take:
                return
            keep = [m for m in self._fix_queue if m.timestamp > bound]
            self._fix_queue.clear()
            self._fix_queue.extend(keep)
        win = self.window
        fix_valid = np.asarray(win.fix_valid).copy()
        changed = False
        for m in take:
            cand = [
                k for k in range(len(times))
                if not fix_valid[k] and abs(times[k] - m.timestamp) <= tol_ns
            ]
            if not cand:
                continue  # no matching keypose: the filter already used it
            k = min(cand, key=lambda i: abs(times[i] - m.timestamp))
            R, p, sigma6 = self._fix_tuple(
                m, (times[k] - m.timestamp) * 1e-9, np.asarray(win.v[k])
            )
            win = win._replace(
                fix_R=win.fix_R.at[k].set(jnp.asarray(R)),
                fix_p=win.fix_p.at[k].set(jnp.asarray(p)),
                fix_sigma=win.fix_sigma.at[k].set(jnp.asarray(sigma6)),
                fix_valid=win.fix_valid.at[k].set(True),
            )
            fix_valid[k] = True
            changed = True
        if changed:
            self.window = win

    def _attach_landmarks(self, vo: VoResult) -> None:
        """Write this keypose's landmark pixel observations into the window
        (structureless projection factors; legacy Smoother landmark parity).

        Landmark identity across keyposes = window COLUMN; the host keeps the
        id→column assignment and recycles columns of landmarks that dropped
        out of the tracker."""
        L = self._smoother_cfg.max_landmarks
        if L <= 0:
            return
        slot = self._newest_slot()
        ids = np.asarray(vo.lmk_ids)
        valid = np.asarray(vo.lmk_valid)
        pixels = np.asarray(vo.lmk_pixels)
        live = {int(i) for i in ids[valid]}
        # Recycle columns whose landmark has left the tracker.
        self._lmk_columns = {i: c for i, c in self._lmk_columns.items() if i in live}
        used = set(self._lmk_columns.values())
        free = [c for c in range(L) if c not in used]

        disps = np.asarray(vo.lmk_disparities)
        uv = np.zeros((L, 2))
        dsp = np.zeros(L)
        v_mask = np.zeros(L, bool)
        for k in np.where(valid)[0]:
            lmk = int(ids[k])
            col = self._lmk_columns.get(lmk)
            if col is None:
                if not free:
                    continue
                col = free.pop()
                self._lmk_columns[lmk] = col
                # A recycled column's stale history belongs to another
                # landmark: clear it across the window.
                self.window = self.window._replace(
                    lmk_valid=self.window.lmk_valid.at[:, col].set(False)
                )
            uv[col] = pixels[k]
            dsp[col] = max(float(disps[k]), 0.0)
            v_mask[col] = True
        self.window = self.window._replace(
            lmk_uv=self.window.lmk_uv.at[slot].set(jnp.asarray(uv)),
            lmk_disp=self.window.lmk_disp.at[slot].set(jnp.asarray(dsp)),
            lmk_valid=self.window.lmk_valid.at[slot].set(jnp.asarray(v_mask)),
        )

    def _newest_slot(self) -> int:
        return min(self._n_keyposes, self._smoother_cfg.window) - 1

    def _push_keypose(
        self, timestamp, R, p, v, vo_T, imu_rows, depth, ranges,
        mag=None, prior_anchor=False,
    ) -> None:
        cfg = self._smoother_cfg
        win = self.window
        if self._n_keyposes >= cfg.window:
            # Slide: the marginal covariance of slot 1 — the keypose that
            # becomes the new slot 0 — anchors the slid window (NOT the
            # newest slot's marginal, which is the largest in the window).
            cov = (
                np.asarray(self._last_smoother_result.cov_slot1)
                if self._last_smoother_result is not None
                else np.eye(15) * 1e-2
            )
            win = slide_window(win, jnp.asarray(cov))
            self._n_keyposes = cfg.window - 1
            if self._keypose_times_ns:
                del self._keypose_times_ns[0]
        slot = self._n_keyposes

        n_imu = self.params.max_imu_per_keypose
        samples = np.zeros((n_imu, 7))
        mask = np.zeros(n_imu, bool)
        if imu_rows is not None:
            k = min(len(imu_rows), n_imu)
            samples[:k] = imu_rows[:k]
            mask[:k] = True

        B = cfg.max_ranges
        rng_vals = np.zeros(B)
        rng_beacons = np.zeros((B, 3))
        rng_valid = np.zeros(B, bool)
        for i, (rv, bp) in enumerate(ranges[:B]):
            rng_vals[i], rng_beacons[i], rng_valid[i] = rv, bp, True

        win = win._replace(
            timestamps=win.timestamps.at[slot].set(
                (timestamp - self._time_origin_ns) * 1e-9
            ),
            R=win.R.at[slot].set(jnp.asarray(R)),
            p=win.p.at[slot].set(jnp.asarray(p)),
            v=win.v.at[slot].set(jnp.asarray(v)),
            valid=win.valid.at[slot].set(True),
            vo_T=win.vo_T.at[slot].set(jnp.asarray(vo_T if vo_T is not None else np.eye(4))),
            vo_valid=win.vo_valid.at[slot].set(vo_T is not None),
            imu_samples=win.imu_samples.at[slot].set(jnp.asarray(samples)),
            imu_mask=win.imu_mask.at[slot].set(jnp.asarray(mask)),
            imu_valid=win.imu_valid.at[slot].set(imu_rows is not None),
            depth=win.depth.at[slot].set(depth if depth is not None else 0.0),
            depth_valid=win.depth_valid.at[slot].set(depth is not None),
            ranges=win.ranges.at[slot].set(jnp.asarray(rng_vals)),
            range_beacons=win.range_beacons.at[slot].set(jnp.asarray(rng_beacons)),
            range_valid=win.range_valid.at[slot].set(jnp.asarray(rng_valid)),
            mag=win.mag.at[slot].set(jnp.asarray(mag if mag is not None else np.zeros(3))),
            mag_valid=win.mag_valid.at[slot].set(mag is not None),
            # External pose fixes attach RETROACTIVELY (_attach_pending_fixes
            # before each solve) — a fresh slot starts fix-less.
            fix_valid=win.fix_valid.at[slot].set(False),
        )
        if prior_anchor:
            win = win._replace(
                prior_R=jnp.asarray(R),
                prior_p=jnp.asarray(p),
                prior_v=jnp.asarray(v),
                prior_sqrt_info=jnp.eye(15) * 100.0,
            )
        self.window = win
        self._n_keyposes += 1
        self._keypose_times_ns.append(timestamp)
        self._last_keypose_t = timestamp

    # -- smoother + filter sync ----------------------------------------------

    def _run_smoother(self, timestamp: int) -> None:
        if self._n_keyposes < 2:
            return
        import time as _time

        t0 = _time.perf_counter()
        self._attach_pending_fixes()
        pims = preintegrate_window(self.window, self.params.imu_calib)
        slot = jnp.asarray(self._newest_slot(), jnp.int32)
        self.window, result = self._solve(self.window, pims, slot)
        jax.block_until_ready(result.p)
        self.stats.add("smoother_update_ms", (_time.perf_counter() - t0) * 1e3, self.print_stats)
        self._last_smoother_result = result
        # Exact host time of the solved keypose: smoother_state must not
        # round-trip the timestamp through the window's f32 seconds.
        self._last_smoother_t_ns = timestamp
        for cb in self.smoother_callbacks:
            cb(result)
        self._sync_filter(timestamp, result)

    def _sync_filter(self, timestamp: int, result: SmootherResult) -> None:
        """Rewind → soft/hard correction → IMU replay (cpp:496-549)."""
        import contextlib

        with self.sync_lock if self.sync_lock is not None else contextlib.nullcontext():
            self._sync_filter_locked(timestamp, result)

    def _sync_filter_locked(self, timestamp: int, result: SmootherResult) -> None:
        if self.ekf_state is None:
            return
        rewind = self._ekf_history.closest_before(timestamp)
        state_at = rewind[1] if rewind is not None else self.ekf_state

        p_s = np.asarray(result.p)
        p_f = np.asarray(state_at.t)
        divergence = float(np.linalg.norm(p_s - p_f))

        q_s = matrix_to_quat(jnp.asarray(np.asarray(result.R)))
        base_t = timestamp
        if divergence > self.params.hard_correction_pos:
            # Hard: re-initialize the filter at the smoother state. The new
            # state is DEFINED at the keypose time, so replay starts there.
            state = ekf_initialize(t0=p_s, q0=np.asarray(q_s), dtype=jnp.float64)
            state = state._replace(v=jnp.asarray(np.asarray(result.v)))
        elif rewind is None:
            # No snapshot before the keypose: the current state has already
            # integrated IMU past `timestamp`, so a soft correction followed
            # by replay would double-apply those samples. Skip (a hard reset
            # above is safe — it discards the state entirely).
            return
        elif divergence > self.params.soft_correction_pos:
            # Soft: treat the smoother pose as a measurement.
            cov6 = np.asarray(result.cov_newest)[np.ix_([3, 4, 5, 0, 1, 2], [3, 4, 5, 0, 1, 2])]
            cov6 = cov6 + np.eye(6) * 1e-6
            state = ekf_update_pose(
                state_at, jnp.asarray(p_s), jnp.asarray(np.asarray(q_s)), jnp.asarray(cov6)
            )
            # Soft update was applied at the SNAPSHOT's state: replay from
            # the snapshot time so the (t_snap, keypose] IMU interval (up to
            # one period — keyposes carry camera stamps, snapshots IMU
            # stamps) is not dropped.
            base_t = rewind[0]
        else:
            return  # filter agrees; nothing to do

        self._commit_rewound_state(state, base_t)

    def _commit_rewound_state(self, state, timestamp: int) -> None:
        """Replay IMU newer than the rewind point onto `state` and commit —
        one lax.scan dispatch over a power-of-two-padded batch (vs 2
        dispatches/sample; see ekf.ekf_replay_imu). Pow-2 buckets bound the
        compile count."""
        self._ekf_history.discard_after(timestamp)
        times, items = self._imu_items_after(timestamp)
        t_cur = timestamp
        if times:
            n = len(times)
            cap = 1 << (n - 1).bit_length()
            dts = np.zeros(cap)
            gyr = np.zeros((cap, 3))
            acc = np.zeros((cap, 3))
            mask = np.zeros(cap, bool)
            for i, (t_m, m) in enumerate(zip(times, items)):
                dts[i] = max((t_m - t_cur) * 1e-9, 0.0)
                gyr[i] = np.asarray(m.angular_velocity)
                acc[i] = np.asarray(m.linear_acceleration)
                mask[i] = True
                t_cur = t_m
            state = self._replay_jit(
                state, jnp.asarray(dts), jnp.asarray(gyr), jnp.asarray(acc),
                jnp.asarray(mask),
            )
        self.ekf_state = state
        self._ekf_time = t_cur

    def _imu_items_after(self, t: int):
        times, items = [], []
        hist = self._imu_history
        with hist._lock:  # snapshot
            for tt, m in zip(hist._times, hist._items):
                if tt > t:
                    times.append(tt)
                    items.append(m)
        return times, items

    def _filter_predict_update(self, m: ImuMeasurement) -> None:
        dt = 0.0 if self._ekf_time is None else (m.timestamp - self._ekf_time) * 1e-9
        state = self._predict_update_jit(
            self.ekf_state,
            max(dt, 0.0),
            jnp.asarray(m.angular_velocity),
            jnp.asarray(m.linear_acceleration),
        )
        self.ekf_state = state
        self._ekf_time = m.timestamp
        self._ekf_history.add(m.timestamp, state)
        if self.filter_callbacks:
            out = self.filter_state()
            for cb in self.filter_callbacks:
                cb(out)

    # -- outputs --------------------------------------------------------------

    def filter_state(self) -> StateStamped:
        assert self.ekf_state is not None and self._ekf_time is not None
        T = np.eye(4)
        # jitted: this runs per filter callback at the IMU rate.
        T[:3, :3] = np.asarray(_quat_to_matrix_jit(self.ekf_state.q))
        T[:3, 3] = np.asarray(self.ekf_state.t)
        return StateStamped(
            timestamp=self._ekf_time,
            world_T_body=T,
            velocity=np.asarray(self.ekf_state.v),
            covariance=np.asarray(self.ekf_state.S),
        )

    def smoother_state(self) -> Optional[StateStamped]:
        r = self._last_smoother_result
        if r is None:
            return None
        T = np.eye(4)
        T[:3, :3] = np.asarray(r.R)
        T[:3, 3] = np.asarray(r.p)
        return StateStamped(
            timestamp=(
                self._last_smoother_t_ns
                if self._last_smoother_t_ns is not None
                # Fallback (pre-solve): window-relative f32 seconds + origin.
                else int(round(float(r.timestamp) * 1e9)) + self._time_origin_ns
            ),
            world_T_body=T,
            velocity=np.asarray(r.v),
            covariance=np.asarray(r.cov_newest),
        )
