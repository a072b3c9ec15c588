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


def _run_camera_silence(threaded: bool):
    """Good tracking, then the camera dies ENTIRELY (no frames at all — cable
    pull / driver hang, the §5.3 first-class failure). The VO-timeout check
    must flip the mode machine to VISION_UNAVAILABLE from the IMU path so
    keyposes keep appearing at min_sec cadence (reference
    state_estimator.cpp:336-397 WaitForResultOrTimeout)."""
    import cv2

    H, W = 120, 160
    rng = np.random.default_rng(7)
    canvas = rng.random((H, W)).astype(np.float32)
    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.0) * 0.8 + 0.1
    disp_px = 8
    left = canvas
    right = np.roll(canvas, -disp_px, axis=1)

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, H, W)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=8, iterations=3),
        max_imu_per_keypose=128,
        min_sec_btw_keyposes=0.5,
        max_sec_btw_keyposes=1.0,
    )
    if threaded:
        from ocean_perception_tpu.vio.threaded_estimator import ThreadedStateEstimator

        est = ThreadedStateEstimator(params, rig)
        core = est.core
    else:
        est = core = StateEstimator(params, rig)

    keypose_times = []
    core.smoother_callbacks.append(
        lambda r: keypose_times.append(float(r.timestamp))
    )
    est.initialize(0, np.eye(4))

    # 2 s of good stereo (static scene => identity VO) + 100 Hz IMU at rest.
    t_ns = 0
    for i in range(1, 701):  # 7 s of IMU
        t_ns = int(i * 1e7)
        est.receive_imu(ImuMeasurement(t_ns, np.zeros(3), -GRAVITY))
        if i % 10 == 0 and i <= 200:  # stereo at 10 Hz, dies at t=2 s
            est.receive_stereo(StereoImage(t_ns + 1, 0, left, right))
        if threaded and i % 100 == 0:
            est.wait_idle(timeout=120)
    if threaded:
        # First-use jit compiles (tracker + solve) can take minutes on a
        # loaded CI box; wait_idle tracks in-flight vision work.
        assert est.wait_idle(timeout=900), "threaded estimator failed to drain"
        est.shutdown()

    assert core.mode is SmootherMode.VISION_UNAVAILABLE
    # Vision died at t=2.0; the VO timeout flips the mode by ~3.1 s and
    # fallback keyposes then appear at min_sec cadence until t=7.
    late = [t for t in keypose_times if t > 3.2]
    assert len(late) >= 5, f"keyposes stalled after camera death: {keypose_times}"
    gaps = np.diff(sorted(late))
    assert gaps.max() < 0.75, f"fallback cadence too slow: {gaps}"
    # Stationary platform: bounded position error throughout.
    p = np.asarray(core.smoother_state().world_T_body[:3, 3])
    assert np.linalg.norm(p) < 0.5


@pytest.mark.slow
def test_camera_silence_keeps_keyposes_alive():
    _run_camera_silence(threaded=False)


@pytest.mark.slow
def test_camera_silence_threaded():
    _run_camera_silence(threaded=True)


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


def test_external_pose_aiding_bounds_drift():
    """External absolute pose fixes (fiducial relocalization / USBL,
    receive_pose) rewind-update-replay the filter and bound IMU drift;
    unaided the same biased-IMU stream diverges. Exceeds the reference
    (only a one-shot init pose, state_estimator_lcm.cpp:137-176)."""
    from ocean_perception_tpu.core.measurements import PoseMeasurement

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        # Keyposes/smoother suppressed: isolate the filter pose-aiding path.
        min_sec_btw_keyposes=1e6,
        max_sec_btw_keyposes=2e6,
    )
    bias = np.array([0.12, -0.08, 0.0])

    def run(aided: bool) -> float:
        est = StateEstimator(params, rig)
        est.initialize(0, np.eye(4))
        for i in range(1, 401):  # 4 s at 100 Hz, body at rest
            t_ns = int(i * 1e7)
            est.receive_imu(
                ImuMeasurement(t_ns, np.zeros(3), -GRAVITY + bias),
                check_keypose=False,
            )
            if aided and i % 50 == 0:
                # Fix timestamped slightly BEFORE the newest sample: the
                # rewind + replay path must engage (closest_before + scan).
                est.receive_pose(
                    PoseMeasurement(t_ns - int(2.5e6), np.eye(4), np.eye(6) * 1e-4)
                )
        return float(np.linalg.norm(est.filter_state().world_T_body[:3, 3]))

    err_free = run(False)
    err_aided = run(True)
    assert err_free > 0.3, err_free  # biased IMU alone drifts
    assert err_aided < 0.05, err_aided  # half-second fixes bound it
    assert err_aided < 0.1 * err_free


@pytest.mark.slow
def test_external_pose_fix_corrects_smoother_trajectory():
    """External fixes become absolute factors on the nearest keypose
    (KeyposeWindow.fix_*): with vision dead and a biased IMU, the SMOOTHED
    trajectory stays pinned — a relative-only graph cannot make that
    correction. (The filter-level effect is covered separately above.)"""
    from ocean_perception_tpu.core.measurements import PoseMeasurement

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    bias = np.array([0.3, -0.2, 0.0])

    def run(aided: bool) -> float:
        params = StateEstimatorParams(
            n_gravity=GRAVITY.copy(),
            smoother=SmootherConfig(window=8, iterations=3),
            max_imu_per_keypose=128,
            min_sec_btw_keyposes=0.5,
            max_sec_btw_keyposes=1.0,
        )
        est = StateEstimator(params, rig)
        est.initialize(0, np.eye(4))
        n_fix_slots = 0
        for i in range(1, 401):  # 4 s at 100 Hz, body at rest
            t_ns = int(i * 1e7)
            if aided and i % 25 == 0:  # 4 Hz fixes: every keypose gets one
                est.receive_pose(
                    PoseMeasurement(t_ns - int(2.5e6), np.eye(4), np.eye(6) * 1e-4)
                )
            est.receive_imu(ImuMeasurement(t_ns, np.zeros(3), -GRAVITY + bias))
        if aided:
            n_fix_slots = int(np.asarray(est.window.fix_valid).sum())
            assert n_fix_slots >= 3, "fixes never reached the window"
        s = est.smoother_state()
        assert s is not None
        return float(np.linalg.norm(s.world_T_body[:3, 3]))

    err_free = run(False)
    err_aided = run(True)
    assert err_free > 0.5, err_free  # biased IMU smoother drifts unaided
    assert err_aided < 0.05, err_aided  # fixes pin the smoothed trajectory
    assert err_aided < 0.05 * err_free


def test_pose_fix_between_keyposes_is_transported():
    """A fix measured Δt away from its keypose must be TRANSPORTED to the
    keypose time with the velocity estimate, not attached raw: under dynamic
    motion a raw fix is biased by v·Δt and DEGRADES the trajectory (the
    soak measured 3x worse ATE with groundtruth fixes than without).

    Body accelerates at 2 m/s² (speed reaches 8 m/s); truth-valued fixes
    arrive 40 ms BEFORE each keypose — raw attachment would drag keyposes
    back by up to 0.32 m."""
    from ocean_perception_tpu.core.measurements import PoseMeasurement

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    acc = np.array([2.0, 0.0, 0.0])
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=8, iterations=3),
        max_imu_per_keypose=128,
        min_sec_btw_keyposes=0.5,
        max_sec_btw_keyposes=1.0,
    )
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))

    def true_x(t_sec: float) -> float:
        return 0.5 * acc[0] * t_sec**2

    for i in range(1, 401):  # 4 s at 100 Hz
        t_ns = int(i * 1e7)
        if i % 50 == 46:  # 0.46, 0.96, ... = 40 ms before the 0.5s keyposes
            t_fix = t_ns * 1e-9
            T = np.eye(4)
            T[0, 3] = true_x(t_fix)
            est.receive_pose(PoseMeasurement(t_ns, T, np.eye(6) * 1e-4))
        est.receive_imu(ImuMeasurement(t_ns, np.zeros(3), acc - GRAVITY))

    assert int(np.asarray(est.window.fix_valid).sum()) >= 3
    s = est.smoother_state()
    assert s is not None
    err = abs(float(s.world_T_body[0, 3]) - true_x(s.timestamp * 1e-9))
    # Raw (untransported) attachment fails this at ~0.1-0.3 m.
    assert err < 0.05, err


@pytest.mark.slow
def test_epoch_scale_timestamps_stay_exact():
    """Production datasets stamp ns since epoch (~1.6e18). The window must
    store MISSION-RELATIVE seconds (f32 epoch seconds quantize to ~128 s,
    silently breaking dt_pair whitening and fix time-matching on-chip), and
    smoother output timestamps must round-trip exactly via the host."""
    from ocean_perception_tpu.core.measurements import PoseMeasurement

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        max_imu_per_keypose=128,
        min_sec_btw_keyposes=0.5,
        max_sec_btw_keyposes=1.0,
    )
    est = StateEstimator(params, rig)
    T0 = 1_600_000_000_000_000_000  # Sep 2020, ns since epoch
    est.initialize(T0, np.eye(4))
    for i in range(1, 201):  # 2 s at 100 Hz
        t_ns = T0 + int(i * 1e7)
        if i % 50 == 0:
            est.receive_pose(
                PoseMeasurement(t_ns - int(2.5e6), np.eye(4), np.eye(6) * 1e-4)
            )
        est.receive_imu(ImuMeasurement(t_ns, np.zeros(3), -GRAVITY))
    # Window times are mission-relative seconds, not epoch seconds.
    ts = np.asarray(est.window.timestamps)[: est._n_keyposes]
    assert ts.max() < 10.0, ts
    # Fixes time-matched at epoch scale (host int-ns matching).
    assert int(np.asarray(est.window.fix_valid).sum()) >= 2
    # The smoother output timestamp is the EXACT keypose stamp.
    s = est.smoother_state()
    assert s is not None and s.timestamp == est._last_keypose_t
    assert s.timestamp > T0
    assert np.isfinite(s.world_T_body).all()


def test_external_pose_aiding_threaded_matches_sync():
    """The threaded wrapper routes PoseMeasurement through the fast queue in
    ingest order — the result must equal the synchronous core's."""
    from ocean_perception_tpu.core.measurements import PoseMeasurement
    from ocean_perception_tpu.vio.threaded_estimator import ThreadedStateEstimator

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        min_sec_btw_keyposes=1e6,
        max_sec_btw_keyposes=2e6,
    )
    bias = np.array([0.05, 0.02, 0.0])

    def feed(est, check_keypose_kw: bool):
        for i in range(1, 151):
            t_ns = int(i * 1e7)
            m = ImuMeasurement(t_ns, np.zeros(3), -GRAVITY + bias)
            if check_keypose_kw:
                est.receive_imu(m, check_keypose=False)
            else:
                est.receive_imu(m)
            if i % 50 == 0:
                est.receive_pose(
                    PoseMeasurement(t_ns - int(2.5e6), np.eye(4), np.eye(6) * 1e-4)
                )

    sync = StateEstimator(params, rig)
    sync.initialize(0, np.eye(4))
    feed(sync, True)

    thr = ThreadedStateEstimator(params, rig)
    thr.initialize(0, np.eye(4))
    feed(thr, False)
    assert thr.wait_idle(timeout=60.0)
    p_sync = sync.filter_state().world_T_body[:3, 3]
    p_thr = thr.filter_state().world_T_body[:3, 3]
    thr.shutdown()
    np.testing.assert_allclose(p_thr, p_sync, atol=1e-9)
