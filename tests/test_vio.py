"""VIO numerics tests: odometry LM, IMU preintegration, EKF, trilateration.

Mirrors the reference's unit-test strategy (SURVEY.md §4): quaternion/expmap
round trips, preintegration against gravity, EKF convergence — but with
numeric goldens from synthetic trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.quaternion import quat_exp, quat_rotate, quat_to_matrix
from ocean_perception_tpu.core.se3 import se3_exp, se3_inverse, so3_exp
from ocean_perception_tpu.vio.ekf import (
    EkfParams,
    ekf_initialize,
    ekf_predict,
    ekf_update_depth,
    ekf_update_imu,
    ekf_update_pose,
    ekf_update_range,
)
from ocean_perception_tpu.vio.imu_preintegration import (
    ImuCalibration,
    bias_corrected_deltas,
    imu_factor_residual,
    predict_state,
    preintegrate,
)
from ocean_perception_tpu.vio.odometry import OdometryParams, optimize_odometry
from ocean_perception_tpu.vio.trilateration import trilaterate


def make_rig():
    cam = PinholeCamera.create(300.0, 300.0, 320.0, 240.0, 480, 640)
    return StereoCamera.create(cam, cam, baseline=0.2)


class TestOdometry:
    def _setup(self, rng, n=60, noise=0.3, T_true=None):
        rig = make_rig()
        if T_true is None:
            T_true = se3_exp(jnp.asarray([0.1, -0.05, 0.08, 0.02, -0.03, 0.01]))
        P0 = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-2, 2, n),
                    rng.uniform(-1.5, 1.5, n),
                    rng.uniform(2, 8, n),
                ],
                -1,
            )
        )
        P1 = (T_true[:3, :3] @ P0.T).T + T_true[:3, 3]
        p_obs = rig.left.project(P1) + jnp.asarray(rng.normal(0, noise, (n, 2)))
        sigmas = jnp.full(n, 1.0)
        mask = jnp.ones(n, bool)
        return rig, T_true, P0, p_obs, sigmas, mask

    def test_recovers_pose(self, rng):
        rig, T_true, P0, p_obs, sigmas, mask = self._setup(rng)
        res = optimize_odometry(P0, p_obs, sigmas, mask, rig)
        assert bool(res.success)
        np.testing.assert_allclose(res.T_10, T_true, atol=5e-3)
        assert float(res.error) < 1.0

    def test_robust_to_outliers(self, rng):
        rig, T_true, P0, p_obs, sigmas, mask = self._setup(rng, n=80)
        # Corrupt 20% of observations badly.
        p_obs = p_obs.at[:16].add(jnp.asarray(rng.uniform(30, 80, (16, 2))))
        res = optimize_odometry(P0, p_obs, sigmas, mask, rig)
        assert bool(res.success)
        np.testing.assert_allclose(res.T_10, T_true, atol=2e-2)
        assert int(res.n_inliers) >= 60

    def test_too_few_points_fails(self, rng):
        rig, T_true, P0, p_obs, sigmas, mask = self._setup(rng, n=10)
        mask = mask.at[4:].set(False)
        res = optimize_odometry(P0, p_obs, sigmas, mask, rig)
        assert not bool(res.success)
        np.testing.assert_allclose(res.T_10, np.eye(4))

    def test_identity_when_static(self, rng):
        rig, _, P0, _, sigmas, mask = self._setup(rng, T_true=jnp.eye(4))
        p_obs = rig.left.project(P0)
        res = optimize_odometry(P0, p_obs, sigmas, mask, rig)
        np.testing.assert_allclose(res.T_10, np.eye(4), atol=1e-6)


class TestPreintegration:
    def _samples(self, w, a, n=100, dt=0.01):
        rows = np.zeros((n, 7))
        rows[:, 0] = dt
        rows[:, 1:4] = w
        rows[:, 4:7] = a
        return jnp.asarray(rows), jnp.ones(n, bool)

    def test_static_under_gravity(self):
        """Body at rest, accelerometer reads -g; deltas integrate specific force."""
        g = np.array([0, 0, -9.81])
        samples, mask = self._samples([0, 0, 0], -g)  # specific force = -g
        pim = preintegrate(samples, mask, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(pim.dt, 1.0, atol=1e-9)
        np.testing.assert_allclose(pim.dR, np.eye(3), atol=1e-9)
        # Predict from rest with gravity: should stay put.
        R_j, p_j, v_j = predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3), pim, jnp.asarray(g))
        np.testing.assert_allclose(v_j, np.zeros(3), atol=1e-6)
        np.testing.assert_allclose(p_j, np.zeros(3), atol=1e-6)

    def test_constant_rotation(self):
        w = np.array([0.0, 0.0, 0.5])  # rad/s yaw
        samples, mask = self._samples(w, [0, 0, 0], n=200, dt=0.005)
        pim = preintegrate(samples, mask, jnp.zeros(3), jnp.zeros(3))
        expected = so3_exp(jnp.asarray(w * 1.0))
        np.testing.assert_allclose(pim.dR, expected, atol=1e-5)

    def test_constant_accel_no_gravity(self):
        a = np.array([1.0, 0.0, 0.0])
        samples, mask = self._samples([0, 0, 0], a)
        pim = preintegrate(samples, mask, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(pim.dv, a * 1.0, atol=1e-6)
        np.testing.assert_allclose(pim.dp, 0.5 * a * 1.0, atol=1e-2)

    def test_bias_correction_first_order(self):
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.3, 3)
        a = rng.normal(0, 1.0, 3)
        samples, mask = self._samples(w, a, n=100)
        bg = jnp.asarray([0.01, -0.02, 0.005])
        ba = jnp.asarray([0.03, 0.01, -0.02])
        # Integrate with zero bias, then correct to (bg, ba)...
        pim0 = preintegrate(samples, mask, jnp.zeros(3), jnp.zeros(3))
        dR_c, dv_c, dp_c = bias_corrected_deltas(pim0, bg, ba)
        # ...must match reintegrating with the true bias.
        pim1 = preintegrate(samples, mask, bg, ba)
        np.testing.assert_allclose(dR_c, pim1.dR, atol=2e-4)
        np.testing.assert_allclose(dv_c, pim1.dv, atol=2e-3)
        np.testing.assert_allclose(dp_c, pim1.dp, atol=2e-3)

    def test_factor_residual_zero_at_truth(self):
        g = np.array([0, 0, -9.81])
        w = np.array([0.1, -0.05, 0.2])
        a_body = np.array([0.5, 0.2, -0.1])
        n, dt = 100, 0.01
        # Simulate the true trajectory and the IMU specific-force readings.
        R = np.eye(3)
        p = np.zeros(3)
        v = np.zeros(3)
        rows = np.zeros((n, 7))
        for i in range(n):
            a_world = R @ a_body
            rows[i] = [dt, *w, *(a_body - R.T @ g)]
            p = p + v * dt + 0.5 * a_world * dt * dt
            v = v + a_world * dt
            R = R @ np.asarray(so3_exp(jnp.asarray(w * dt)))
        pim = preintegrate(jnp.asarray(rows), jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3))
        r = imu_factor_residual(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(R), jnp.asarray(p), jnp.asarray(v),
            jnp.zeros(3), jnp.zeros(3), pim, jnp.asarray(g),
        )
        assert float(jnp.abs(r).max()) < 2e-3

    def test_masked_samples_ignored(self):
        samples, _ = self._samples([0, 0, 0.3], [1, 0, 0], n=100)
        mask_half = jnp.arange(100) < 50
        pim_half = preintegrate(samples, mask_half, jnp.zeros(3), jnp.zeros(3))
        samples50, mask50 = self._samples([0, 0, 0.3], [1, 0, 0], n=50)
        pim50 = preintegrate(samples50, mask50, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(pim_half.dR, pim50.dR, atol=1e-12)
        np.testing.assert_allclose(pim_half.dp, pim50.dp, atol=1e-12)
        np.testing.assert_allclose(pim_half.dt, pim50.dt)


class TestEkf:
    def test_predict_constant_velocity(self):
        s = ekf_initialize(dtype=jnp.float64)
        s = s._replace(v=jnp.asarray([1.0, 0, 0]))
        p = EkfParams()
        for _ in range(10):
            s = ekf_predict(s, 0.1, p)
        np.testing.assert_allclose(s.t, [1.0, 0, 0], atol=1e-9)

    def test_predict_rotation(self):
        s = ekf_initialize(dtype=jnp.float64)
        s = s._replace(w=jnp.asarray([0.0, 0.0, 1.0]))
        p = EkfParams()
        for _ in range(100):
            s = ekf_predict(s, 0.01, p)
        R = quat_to_matrix(s.q)
        np.testing.assert_allclose(R, so3_exp(jnp.asarray([0.0, 0, 1.0])), atol=1e-6)

    def test_imu_update_converges_accel(self):
        g = jnp.asarray([0.0, 0, -9.81])
        s = ekf_initialize(dtype=jnp.float64)
        p = EkfParams()
        # Body at rest: specific force = -g in body frame (identity attitude).
        for _ in range(50):
            s = ekf_predict(s, 0.01, p)
            s = ekf_update_imu(s, jnp.zeros(3), -g, g, p)
        np.testing.assert_allclose(s.a, np.zeros(3), atol=1e-3)
        np.testing.assert_allclose(s.w, np.zeros(3), atol=1e-6)
        # Covariance stays symmetric PSD.
        S = np.asarray(s.S)
        np.testing.assert_allclose(S, S.T, atol=1e-12)
        assert np.linalg.eigvalsh(S).min() > 0

    def test_replay_scan_matches_loop(self):
        """ekf_replay_imu (one lax.scan dispatch) must reproduce the
        predict/update host loop exactly, with padded slots as no-ops."""
        from ocean_perception_tpu.vio.ekf import ekf_replay_imu

        rng = np.random.default_rng(3)
        g = jnp.asarray([0.0, 0, -9.81])
        p = EkfParams()
        n, cap = 11, 16
        dts = np.full(cap, 0.01)
        gyr = rng.normal(0, 0.1, (cap, 3))
        acc = rng.normal(0, 0.2, (cap, 3)) - np.asarray(g)
        mask = np.arange(cap) < n

        s_loop = ekf_initialize(dtype=jnp.float64)
        for i in range(n):
            s_loop = ekf_predict(s_loop, dts[i], p)
            s_loop = ekf_update_imu(
                s_loop, jnp.asarray(gyr[i]), jnp.asarray(acc[i]), g, p
            )

        s_scan = ekf_replay_imu(
            ekf_initialize(dtype=jnp.float64),
            jnp.asarray(dts), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.asarray(mask), g, p,
        )
        np.testing.assert_allclose(np.asarray(s_scan.t), np.asarray(s_loop.t), atol=1e-12)
        np.testing.assert_allclose(np.asarray(s_scan.q), np.asarray(s_loop.q), atol=1e-12)
        np.testing.assert_allclose(np.asarray(s_scan.S), np.asarray(s_loop.S), atol=1e-12)

    def test_replay_all_masked_is_identity(self):
        """A fully-padded replay batch (no real samples) must return the
        input state unchanged — the estimator hits this when the rewind
        point is newer than every buffered IMU sample."""
        from ocean_perception_tpu.vio.ekf import ekf_replay_imu

        g = jnp.asarray([0.0, 0, -9.81])
        p = EkfParams()
        s0 = ekf_initialize(dtype=jnp.float64)
        s0 = s0._replace(v=jnp.asarray([1.0, -2.0, 0.5]))
        out = ekf_replay_imu(
            s0, jnp.full(8, 0.01), jnp.ones((8, 3)), jnp.ones((8, 3)),
            jnp.zeros(8, bool), g, p,
        )
        for a, b in zip(out, s0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_depth_update_moves_gravity_axis(self):
        s = ekf_initialize(dtype=jnp.float64)
        p = EkfParams()
        gravity_unit = jnp.asarray([0.0, 0, 1.0])
        for _ in range(30):
            s = ekf_update_depth(s, 2.0, gravity_unit, p)
        np.testing.assert_allclose(s.t[2], 2.0, atol=1e-2)
        np.testing.assert_allclose(s.t[:2], np.zeros(2), atol=1e-9)

    def test_range_update_pulls_toward_beacon(self):
        s = ekf_initialize(dtype=jnp.float64)
        s = s._replace(t=jnp.asarray([1.0, 0.0, 0.0]))
        p = EkfParams()
        beacon = jnp.asarray([5.0, 0.0, 0.0])
        for _ in range(30):
            s = ekf_update_range(s, 3.0, beacon, p)  # true range from x=2
        np.testing.assert_allclose(s.t[0], 2.0, atol=5e-2)

    def test_pose_update(self):
        s = ekf_initialize(dtype=jnp.float64)
        q_meas = quat_exp(jnp.asarray([0.0, 0, 0.3]))
        t_meas = jnp.asarray([0.5, -0.2, 0.1])
        cov = jnp.eye(6, dtype=jnp.float64) * 1e-4
        for _ in range(20):
            s = ekf_update_pose(s, t_meas, q_meas, cov)
        np.testing.assert_allclose(s.t, t_meas, atol=1e-3)
        np.testing.assert_allclose(
            quat_to_matrix(s.q), quat_to_matrix(q_meas), atol=1e-3
        )


def test_trilateration(rng):
    p_true = np.array([1.0, -2.0, 3.0])
    beacons = np.array(
        [[10, 0, 0], [0, 10, 0], [0, 0, 10], [-10, -10, 0], [5, 5, 5]], np.float64
    )
    ranges = np.linalg.norm(beacons - p_true, axis=1) + rng.normal(0, 0.01, 5)
    res = trilaterate(
        jnp.asarray(beacons), jnp.asarray(ranges), jnp.full(5, 0.01), jnp.ones(5, bool)
    )
    assert bool(res.success)
    np.testing.assert_allclose(res.position, p_true, atol=0.05)


def test_trilateration_too_few():
    beacons = jnp.asarray(np.eye(3) * 10)
    res = trilaterate(beacons, jnp.ones(3) * 10.0, jnp.ones(3), jnp.asarray([True, True, False]))
    assert not bool(res.success)
