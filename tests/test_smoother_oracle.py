"""Smoother vs independent scipy f64 oracle (vio/oracle.py).

The windowed GN solve was the last subsystem whose correctness evidence was
self-referential (sliding-vs-batch, NEES, f32-vs-f64 of the same code).
These tests solve the IDENTICAL residual set with scipy.optimize
least_squares + scipy Rotation over randomized fully-loaded windows
(VO + IMU + depth + ranges + mag + pose fix + landmarks, masked rows and
invalid slots included) and assert state AND covariance agreement.
Cross-checks the factor graph of reference fixed_lag_smoother.cpp:232-468.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ocean_perception_tpu.vio.oracle import oracle_solve
from ocean_perception_tpu.vio.smoother import (
    SmootherConfig,
    preintegrate_window,
    solve_window,
)

from test_smoother import (  # noqa: E402 — sibling test module (rootdir on path)
    G_UNIT,
    GRAVITY,
    build_window,
    simulate,
)

# Non-identity sensor rig: every extrinsic path in the factor set active.
R_BC = Rotation.from_rotvec([0.03, -0.05, 0.1]).as_matrix()
T_BC = np.array([0.12, -0.03, 0.05])
T_RECV = np.array([0.0, 0.25, -0.1])
R_MAG = Rotation.from_rotvec([0.0, 0.02, -0.04]).as_matrix()
MAG_BIAS = (0.01, -0.02, 0.005)
BEACONS = np.array([[5.0, 2.0, -1.0], [-3.0, 6.0, 0.5]])
MAG_FIELD = (0.4, 0.1, -0.9)


def _loaded_config(**kw):
    base = dict(
        # 80 GN iterations: both solvers must sit at the SAME stationary
        # point for a ~1e-4 state comparison; at the production 6 the damped
        # GN is accurate to ~1e-3 but not yet at the fixed point (measured:
        # identical objective to 12 digits at either solution).
        window=8, iterations=80, max_ranges=2,
        body_R_cam=tuple(R_BC.reshape(-1)), body_t_cam=tuple(T_BC),
        body_t_receiver=tuple(T_RECV),
        mag_body_R_sensor=tuple(R_MAG.reshape(-1)), mag_bias=MAG_BIAS,
        mag_local_field=MAG_FIELD,
    )
    base.update(kw)
    return SmootherConfig(**base)


def _add_absolute_factors(win, states, config, rng, with_fix=True,
                          with_landmarks=False):
    """Load ranges + mag (+ fix, + landmark tracks) from the true states."""
    M = config.window
    M_used = len(states)
    B = config.max_ranges

    ranges = np.zeros((M, B))
    beacons = np.zeros((M, B, 3))
    range_valid = np.zeros((M, B), bool)
    mag = np.zeros((M, 3))
    mag_valid = np.zeros(M, bool)
    field = np.asarray(MAG_FIELD) * config.mag_scale
    for k, (Rk, pk, _) in enumerate(states):
        p_recv = pk + Rk @ T_RECV
        for b_i in range(B):
            beacons[k, b_i] = BEACONS[b_i]
            ranges[k, b_i] = np.linalg.norm(BEACONS[b_i] - p_recv) + rng.normal(0, 0.02)
            range_valid[k, b_i] = (k + b_i) % 3 != 0  # masked rows exercised
        mag[k] = R_MAG.T @ (Rk.T @ field) + MAG_BIAS + rng.normal(0, 0.005, 3)
        mag_valid[k] = k % 2 == 0
    win = win._replace(
        ranges=jnp.asarray(ranges), range_beacons=jnp.asarray(beacons),
        range_valid=jnp.asarray(range_valid),
        mag=jnp.asarray(mag), mag_valid=jnp.asarray(mag_valid),
    )

    if with_fix:
        fix_R = np.asarray(win.fix_R).copy()
        fix_p = np.asarray(win.fix_p).copy()
        fix_sigma = np.asarray(win.fix_sigma).copy()
        fix_valid = np.zeros(M, bool)
        for k in (1, M_used - 1):
            Rk, pk, _ = states[k]
            fix_R[k] = Rk @ Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix()
            fix_p[k] = pk + rng.normal(0, 0.02, 3)
            fix_sigma[k] = [0.02, 0.02, 0.02, 0.05, 0.05, 0.05]
            fix_valid[k] = True
        win = win._replace(
            fix_R=jnp.asarray(fix_R), fix_p=jnp.asarray(fix_p),
            fix_sigma=jnp.asarray(fix_sigma), fix_valid=jnp.asarray(fix_valid),
        )

    if with_landmarks and config.max_landmarks > 0:
        L = config.max_landmarks
        fx, fy = config.cam_fx, config.cam_fy
        cx, cy = config.cam_cx, config.cam_cy
        # True points ~4 m ahead of the mid-trajectory camera.
        R2, p2, _ = states[min(2, M_used - 1)]
        Rc2 = R2 @ R_BC
        pc2 = p2 + R2 @ T_BC
        pts_cam = np.stack([rng.uniform(-1.2, 1.2, L), rng.uniform(-0.9, 0.9, L),
                            rng.uniform(3.0, 6.0, L)], axis=1)
        X_true = pc2[None] + pts_cam @ Rc2.T
        lmk_uv = np.zeros((M, L, 2))
        lmk_disp = np.zeros((M, L))
        lmk_valid = np.zeros((M, L), bool)
        for k, (Rk, pk, _) in enumerate(states):
            Rc = Rk @ R_BC
            pc = pk + Rk @ T_BC
            Xc = (X_true - pc) @ Rc
            for l_i in range(L):
                x, y, z = Xc[l_i]
                if z < 0.5:
                    continue
                u = fx * x / z + cx + rng.normal(0, 0.3)
                v = fy * y / z + cy + rng.normal(0, 0.3)
                if not (0 <= u < 2 * cx and 0 <= v < 2 * cy):
                    continue
                lmk_uv[k, l_i] = (u, v)
                # A third of the observations are mono (disp <= 0).
                if (k + l_i) % 3 != 0:
                    lmk_disp[k, l_i] = fx * config.cam_baseline / z + rng.normal(0, 0.2)
                lmk_valid[k, l_i] = True
        win = win._replace(
            lmk_uv=jnp.asarray(lmk_uv), lmk_disp=jnp.asarray(lmk_disp),
            lmk_valid=jnp.asarray(lmk_valid),
        )
    return win


def _compare(win, config, state_tol=2e-4, cov_rtol=5e-3):
    pims = preintegrate_window(win)
    w_jax, result = solve_window(
        win, pims, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), config,
        jnp.asarray(int(np.asarray(win.valid).sum()) - 1, jnp.int32),
    )
    states, cov, rnorm = oracle_solve(win, pims, GRAVITY, G_UNIT, config)

    valid = np.asarray(win.valid)
    R_j = np.asarray(w_jax.R)
    for k in np.flatnonzero(valid):
        dtheta = np.linalg.norm(
            Rotation.from_matrix(states["R"][k].T @ R_j[k]).as_rotvec())
        assert dtheta < state_tol, f"slot {k}: rotation diverges {dtheta}"
    for name, arr in (("p", w_jax.p), ("v", w_jax.v), ("bg", w_jax.bg),
                      ("ba", w_jax.ba)):
        d = np.abs(np.asarray(arr) - states[name])[valid]
        assert d.max() < state_tol, f"{name} diverges: {d.max()}"

    # Covariance of the newest keypose and of the next slide anchor.
    sl = int(valid.sum()) - 1
    for label, got, want in (
        ("cov_newest", np.asarray(result.cov_newest),
         cov[sl * 15:(sl + 1) * 15, sl * 15:(sl + 1) * 15]),
        ("cov_slot1", np.asarray(result.cov_slot1), cov[15:30, 15:30]),
    ):
        denom = np.linalg.norm(want)
        rel = np.linalg.norm(got - want) / denom
        assert rel < cov_rtol, f"{label} diverges: rel {rel}"
    return rnorm


@pytest.mark.slow
def test_oracle_fully_loaded_window():
    """Every factor type live at once, non-identity extrinsics, masked rows,
    two invalid slots: converged state agreement ~1e-4 and marginal
    covariance agreement on cov_newest/cov_slot1."""
    rng = np.random.default_rng(7)
    config = _loaded_config(max_landmarks=5)
    states, imu_windows = simulate(M_used=6, seed=7)
    win = build_window(states, imu_windows, config, vo_noise=0.01,
                       state_noise=0.05, seed=7)
    win = _add_absolute_factors(win, states, config, rng,
                                with_fix=True, with_landmarks=True)
    _compare(win, config)


@pytest.mark.slow
def test_oracle_degraded_window():
    """VO and IMU both dropped on one interior pair (no-motion fallback row
    active), depth missing on half the slots, no fix, no landmarks."""
    rng = np.random.default_rng(3)
    config = _loaded_config()
    states, imu_windows = simulate(M_used=6, seed=3)
    win = build_window(states, imu_windows, config, vo_noise=0.005,
                       state_noise=0.03, seed=3)
    win = _add_absolute_factors(win, states, config, rng, with_fix=False)
    vo_valid = np.asarray(win.vo_valid).copy()
    imu_valid = np.asarray(win.imu_valid).copy()
    vo_valid[3] = False
    imu_valid[3] = False
    depth_valid = np.asarray(win.depth_valid).copy()
    depth_valid[::2] = False
    win = win._replace(
        vo_valid=jnp.asarray(vo_valid), imu_valid=jnp.asarray(imu_valid),
        depth_valid=jnp.asarray(depth_valid),
    )
    _compare(win, config)


@pytest.mark.slow
def test_oracle_random_seeds():
    """Randomized sweep: three seeds, VO+IMU+depth+range+mag windows."""
    for seed in (11, 23, 42):
        rng = np.random.default_rng(seed)
        config = _loaded_config()
        states, imu_windows = simulate(
            M_used=6, yaw_rate=0.1 + 0.05 * (seed % 3), seed=seed)
        win = build_window(states, imu_windows, config, vo_noise=0.01,
                           state_noise=0.04, seed=seed)
        win = _add_absolute_factors(win, states, config, rng, with_fix=False)
        _compare(win, config)
