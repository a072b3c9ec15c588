"""Fixed-lag smoother tests: synthetic trajectory recovery with VO+IMU+depth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.se3 import se3_inverse, so3_exp
from ocean_perception_tpu.vio.smoother import (
    KeyposeWindow,
    SmootherConfig,
    make_window,
    preintegrate_window,
    slide_window,
    solve_window,
)

GRAVITY = np.array([0.0, 0.0, -9.81])
G_UNIT = np.array([0.0, 0.0, -1.0])  # depth measured downward (= -z here)
N_IMU = 60
DT_KP = 0.5  # seconds between keyposes


def simulate(M_used=6, yaw_rate=0.2, vel=np.array([0.4, 0.1, -0.05]), seed=0):
    """Ground-truth keypose states + consistent IMU windows + VO + depth."""
    rng = np.random.default_rng(seed)
    dt = DT_KP / N_IMU
    R = np.eye(3)
    p = np.zeros(3)
    v = vel.copy()
    w_body = np.array([0.0, 0.0, yaw_rate])

    states = [(R.copy(), p.copy(), v.copy())]
    imu_windows = []
    for k in range(M_used - 1):
        rows = np.zeros((N_IMU, 7))
        for i in range(N_IMU):
            a_world = np.zeros(3)  # constant velocity
            # specific force in body frame: R^T (a_world - g)
            rows[i] = [dt, *w_body, *(R.T @ (a_world - GRAVITY))]
            p = p + v * dt + 0.5 * a_world * dt * dt
            v = v + a_world * dt
            R = R @ np.asarray(so3_exp(jnp.asarray(w_body * dt)))
        imu_windows.append(rows)
        states.append((R.copy(), p.copy(), v.copy()))
    return states, imu_windows


def build_window(states, imu_windows, config, vo_noise=0.0, state_noise=0.0, seed=1,
                 with_imu=True, with_vo=True, with_depth=True):
    rng = np.random.default_rng(seed)
    M = config.window
    win = make_window(config, N_IMU)
    M_used = len(states)

    ts = win.timestamps
    R = np.asarray(win.R).copy()
    p = np.asarray(win.p).copy()
    v = np.asarray(win.v).copy()
    valid = np.zeros(M, bool)
    vo_T = np.asarray(win.vo_T).copy()
    vo_valid = np.zeros(M, bool)
    imu_samples = np.asarray(win.imu_samples).copy()
    imu_mask = np.zeros((M, N_IMU), bool)
    imu_valid = np.zeros(M, bool)
    depth = np.zeros(M)
    depth_valid = np.zeros(M, bool)
    ts = np.zeros(M)

    for k, (Rk, pk, vk) in enumerate(states):
        ts[k] = k * DT_KP
        # Noisy initial estimates (what the optimizer must correct).
        R[k] = Rk @ np.asarray(so3_exp(jnp.asarray(rng.normal(0, state_noise, 3))))
        p[k] = pk + rng.normal(0, state_noise, 3)
        v[k] = vk + rng.normal(0, state_noise, 3)
        valid[k] = True
        if k > 0:
            if with_imu:
                imu_samples[k] = imu_windows[k - 1]
                imu_mask[k] = True
                imu_valid[k] = True
            if with_vo:
                R_prev, p_prev, _ = states[k - 1]
                T_rel = np.eye(4)
                T_rel[:3, :3] = R_prev.T @ Rk
                T_rel[:3, 3] = R_prev.T @ (pk - p_prev)
                if vo_noise > 0:
                    T_rel[:3, 3] += rng.normal(0, vo_noise, 3)
                vo_T[k] = T_rel
                vo_valid[k] = True
        if with_depth:
            depth[k] = G_UNIT @ pk
            depth_valid[k] = True

    # Anchor prior = true slot-0 state.
    R0, p0, v0 = states[0]
    return win._replace(
        timestamps=jnp.asarray(ts),
        R=jnp.asarray(R), p=jnp.asarray(p), v=jnp.asarray(v),
        valid=jnp.asarray(valid),
        vo_T=jnp.asarray(vo_T), vo_valid=jnp.asarray(vo_valid),
        imu_samples=jnp.asarray(imu_samples), imu_mask=jnp.asarray(imu_mask),
        imu_valid=jnp.asarray(imu_valid),
        depth=jnp.asarray(depth), depth_valid=jnp.asarray(depth_valid),
        prior_R=jnp.asarray(R0), prior_p=jnp.asarray(p0), prior_v=jnp.asarray(v0),
        prior_sqrt_info=jnp.eye(15) * 100.0,
    )


@pytest.fixture(scope="module")
def config():
    return SmootherConfig(window=8, iterations=8)


def _solve(win, config):
    pims = preintegrate_window(win)
    return solve_window(
        win, pims, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), config,
        jnp.asarray(5, jnp.int32),
    )


def test_smoother_recovers_trajectory(config):
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config, state_noise=0.05)
    w, result = _solve(win, config)
    for k, (Rk, pk, vk) in enumerate(states):
        np.testing.assert_allclose(np.asarray(w.p[k]), pk, atol=2e-2)
        np.testing.assert_allclose(np.asarray(w.v[k]), vk, atol=5e-2)
        np.testing.assert_allclose(np.asarray(w.R[k]), Rk, atol=2e-2)
    # Newest-slot result matches the last state.
    np.testing.assert_allclose(np.asarray(result.p), states[5][1], atol=2e-2)
    # Covariance is SPD.
    cov = np.asarray(result.cov_newest)
    np.testing.assert_allclose(cov, cov.T, atol=1e-9)
    assert np.linalg.eigvalsh(cov).min() > 0


def test_smoother_imu_only(config):
    """No VO: IMU + depth + prior still constrain the trajectory."""
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config, state_noise=0.03, with_vo=False)
    w, result = _solve(win, config)
    np.testing.assert_allclose(np.asarray(w.p[5]), states[5][1], atol=5e-2)


def test_smoother_no_motion_fallback(config):
    """Neither VO nor IMU: the no-motion prior keeps the graph constrained
    (fixed_lag_smoother.cpp:413-428 parity)."""
    states, imu_windows = simulate(vel=np.zeros(3), yaw_rate=0.0)
    win = build_window(
        states, imu_windows, config, state_noise=0.02, with_vo=False, with_imu=False
    )
    w, result = _solve(win, config)
    # Everything should collapse toward the anchored (static) pose.
    np.testing.assert_allclose(np.asarray(w.p[5]), states[0][1], atol=5e-2)


def test_slide_window(config):
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config, state_noise=0.0)
    w, result = _solve(win, config)
    cov1 = np.eye(15) * 1e-4
    slid = slide_window(w, jnp.asarray(cov1))
    # Slot 0 now holds what was slot 1.
    np.testing.assert_allclose(np.asarray(slid.p[0]), np.asarray(w.p[1]))
    assert not bool(slid.valid[-1])
    # Prior anchors the new slot 0 at its current state.
    np.testing.assert_allclose(np.asarray(slid.prior_p), np.asarray(w.p[1]))
    # sqrt_info^T sqrt_info ≈ inv(cov).
    si = np.asarray(slid.prior_sqrt_info)
    np.testing.assert_allclose(si.T @ si, np.linalg.inv(cov1), rtol=1e-4)


def test_pose_fix_factor_pins_global_offset(config):
    """Absolute pose fix factors (external aiding) pull a globally-offset,
    internally-consistent VO chain back onto the true trajectory — the
    correction a relative-only graph cannot make."""
    states, imu_windows = simulate()
    offset = np.array([0.5, -0.3, 0.2])
    win = build_window(
        states, imu_windows, config, with_imu=False, with_depth=False
    )
    # Shift EVERY state estimate and the anchor by a constant world offset:
    # VO between factors are all still perfectly satisfied.
    win = win._replace(
        p=win.p + jnp.asarray(offset),
        prior_p=win.prior_p + jnp.asarray(offset),
        prior_sqrt_info=jnp.eye(15) * 1.0,  # soft anchor: fixes may override
    )
    w0, _ = _solve(win, config)
    # Without fixes the offset persists (nothing absolute in the graph).
    assert np.linalg.norm(np.asarray(w0.p[5]) - states[5][1]) > 0.4

    fix_R = np.asarray(win.fix_R).copy()
    fix_p = np.asarray(win.fix_p).copy()
    fix_valid = np.zeros(win.fix_valid.shape[0], bool)
    for k in (2, 4):
        fix_R[k], fix_p[k] = states[k][0], states[k][1]
        fix_valid[k] = True
    win_fix = win._replace(
        fix_R=jnp.asarray(fix_R),
        fix_p=jnp.asarray(fix_p),
        fix_sigma=jnp.full_like(win.fix_sigma, 1e-3),
        fix_valid=jnp.asarray(fix_valid),
    )
    w, _ = _solve(win_fix, config)
    for k, (Rk, pk, _vk) in enumerate(states):
        np.testing.assert_allclose(np.asarray(w.p[k]), pk, atol=2e-2)
        np.testing.assert_allclose(np.asarray(w.R[k]), Rk, atol=2e-2)


def test_pose_fix_snap_preserves_velocities(config):
    """A fix conflicting with a TIGHT drifted anchor must translate the
    window RIGIDLY, not stretch it: the anchor's pose block is gauge-
    relaxed when any fix is active (smoother._residuals). Without that,
    the snap is absorbed as a velocity kink across the window — measured
    on a dynamic mission as 3x worse ATE with truth-valued fixes than
    without any aiding."""
    states, imu_windows = simulate()
    offset = np.array([0.3, -0.2, 0.1])
    win = build_window(states, imu_windows, config)  # full IMU+VO+depth
    # Drifted-but-internally-consistent estimates AND an overconfident
    # anchor carrying the same drift (the fixed-lag slide-anchor state).
    win = win._replace(
        p=win.p + jnp.asarray(offset),
        prior_p=win.prior_p + jnp.asarray(offset),
        prior_sqrt_info=jnp.eye(15) * 100.0,  # ~1 cm anchor confidence
        depth_valid=jnp.zeros_like(win.depth_valid),  # depth would fight z
    )
    win = win._replace(
        fix_R=win.fix_R.at[4].set(jnp.asarray(states[4][0])),
        fix_p=win.fix_p.at[4].set(jnp.asarray(states[4][1])),
        fix_sigma=win.fix_sigma.at[4].set(jnp.full(6, 1e-2)),
        fix_valid=win.fix_valid.at[4].set(True),
    )
    w, _ = _solve(win, config)
    # Positions snap onto truth...
    np.testing.assert_allclose(np.asarray(w.p[4]), states[4][1], atol=3e-2)
    # ...and the velocities stay at their TRUE values (a stretch would
    # shift them by ~|offset| / window_span ≈ 0.1+ m/s).
    for k, (_Rk, _pk, vk) in enumerate(states):
        np.testing.assert_allclose(np.asarray(w.v[k]), vk, atol=4e-2)


def test_weak_fix_does_not_unpin_tight_anchor(config):
    """The anchor gauge relax must SCALE with fix tightness: a meters-
    sigma fix (noisy USBL ping) may not un-pin a cm-confident anchor and
    drag the window onto its own noise. With the unconditional x100 relax
    this scenario moved the window ~80% of the way onto a fix 2 m off
    truth; with the scaled relax the anchor holds."""
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config)
    win = win._replace(
        prior_sqrt_info=jnp.eye(15) * 100.0,  # ~1 cm anchor confidence
    )
    bogus_p = np.asarray(states[4][1]) + np.array([2.0, 0.0, 0.0])
    win = win._replace(
        fix_R=win.fix_R.at[4].set(jnp.asarray(states[4][0])),
        fix_p=win.fix_p.at[4].set(jnp.asarray(bogus_p)),
        fix_sigma=win.fix_sigma.at[4].set(jnp.full(6, 3.0)),  # ~3 m ping
        fix_valid=win.fix_valid.at[4].set(True),
    )
    w, _ = _solve(win, config)
    # The window stays on the (correct, anchor-pinned) trajectory: the
    # 2 m-off weak fix moves slot 4 by at most a few cm.
    err = float(np.linalg.norm(np.asarray(w.p[4]) - states[4][1]))
    assert err < 0.05, err


def test_no_fix_at_180_degree_attitude_stays_finite(config):
    """AD trap: masked fix rows must not feed so3_log an arbitrary absolute
    rotation. A down-looking rig (R = diag(1,-1,-1), θ=π vs the identity
    fix_R placeholder) with NO fixes attached must solve finite — arccos'
    derivative at cosθ=-1 is infinite and inf·0 = NaN under jacfwd."""
    states, imu_windows = simulate(yaw_rate=0.0, vel=np.array([0.1, 0.0, 0.0]))
    flip = np.diag([1.0, -1.0, -1.0])
    states = [(Rk @ flip, pk, vk) for Rk, pk, vk in states]
    # Re-express the IMU specific force for the flipped body frame:
    # simplest consistent graph = VO+depth only (no IMU factors).
    win = build_window(states, imu_windows, config, with_imu=False)
    w, result = _solve(win, config)
    assert np.isfinite(np.asarray(w.p)).all()
    assert np.isfinite(np.asarray(result.cov_newest)).all()
    np.testing.assert_allclose(np.asarray(w.p[5]), states[5][1], atol=5e-2)


def test_slide_preserves_fix_fields(config):
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config)
    sig = np.full(6, 0.01)
    win = win._replace(
        fix_R=win.fix_R.at[3].set(jnp.asarray(states[3][0])),
        fix_p=win.fix_p.at[3].set(jnp.asarray(states[3][1])),
        fix_sigma=win.fix_sigma.at[3].set(jnp.asarray(sig)),
        fix_valid=win.fix_valid.at[3].set(True),
    )
    slid = slide_window(win, jnp.asarray(np.eye(15) * 1e-4))
    assert bool(slid.fix_valid[2]) and not bool(slid.fix_valid[3])
    np.testing.assert_allclose(np.asarray(slid.fix_p[2]), states[3][1])
    np.testing.assert_allclose(np.asarray(slid.fix_sigma[2]), sig)
    assert not bool(slid.fix_valid[-1])


def test_smoother_jit_compiles(config):
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config, state_noise=0.05)
    pims = preintegrate_window(win)
    f = jax.jit(
        lambda w, pm: solve_window(
            w, pm, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), config, jnp.asarray(5, jnp.int32)
        )
    )
    w1, r1 = f(win, pims)
    w2, r2 = f(win, pims)
    np.testing.assert_allclose(np.asarray(r1.p), np.asarray(r2.p))


def test_smoother_float32(config):
    """TPU has no float64 — the QR-based damped GN (cond(J), not cond(JᵀJ))
    must recover the trajectory in pure f32, the on-chip solve path."""
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, config, state_noise=0.05)
    win32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        win,
    )
    pims = preintegrate_window(win32)
    w, result = solve_window(
        win32, pims,
        jnp.asarray(GRAVITY, jnp.float32), jnp.asarray(G_UNIT, jnp.float32),
        config, jnp.asarray(5, jnp.int32),
    )
    assert w.p.dtype == jnp.float32
    for k, (Rk, pk, vk) in enumerate(states):
        np.testing.assert_allclose(np.asarray(w.p[k]), pk, atol=5e-2)
        np.testing.assert_allclose(np.asarray(w.v[k]), vk, atol=8e-2)
        np.testing.assert_allclose(np.asarray(w.R[k]), Rk, atol=3e-2)
    cov = np.asarray(result.cov_newest)
    assert np.isfinite(cov).all()
    assert np.linalg.eigvalsh(0.5 * (cov + cov.T)).min() > 0


def test_landmark_projection_factors(config):
    """Structureless landmark factors: noisy poses + exact pixel tracks of
    fixed 3D points must pull the trajectory back (legacy Smoother parity)."""
    # lmk_cauchy_k=0: exact outlier-free tracks are the ONLY motion
    # constraint here, so the robust reweighting (designed for real tracked
    # data with mistracks) only slows the GN — plain L2 isolates the factor
    # geometry. The robust default is covered by
    # test_landmark_outlier_rejected below.
    cfg = SmootherConfig(window=8, iterations=20, max_landmarks=12,
                         cam_fx=200.0, cam_fy=200.0, cam_cx=80.0, cam_cy=60.0,
                         lmk_cauchy_k=0.0)
    states, imu_windows = simulate()
    win = build_window(states, imu_windows, cfg, state_noise=0.05, with_vo=False, with_imu=False)

    # 10 landmarks in front of the trajectory, observed by all 6 keyposes.
    rng = np.random.default_rng(2)
    pts = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], size=(10, 3))
    M = cfg.window
    L = cfg.max_landmarks
    uv = np.zeros((M, L, 2))
    disp = np.zeros((M, L))
    vmask = np.zeros((M, L), bool)
    for k, (Rk, pk, _) in enumerate(states):
        cam = (np.asarray(Rk).T @ (pts - pk).T).T
        u = 200.0 * cam[:, 0] / cam[:, 2] + 80.0
        v = 200.0 * cam[:, 1] / cam[:, 2] + 60.0
        uv[k, :10] = np.stack([u, v], -1)
        disp[k, :10] = 200.0 * cfg.cam_baseline / cam[:, 2]
        vmask[k, :10] = cam[:, 2] > 0.5
    win = win._replace(lmk_uv=jnp.asarray(uv), lmk_disp=jnp.asarray(disp), lmk_valid=jnp.asarray(vmask))

    pims = preintegrate_window(win)
    w, result = solve_window(
        win, pims, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), cfg, jnp.asarray(5, jnp.int32)
    )
    # Landmarks + anchor prior pull the trajectory back from 5 cm noise.
    # (Structureless GN converges slowly along the scale direction when
    # landmarks are the ONLY motion constraint — in practice VO/IMU factors
    # run alongside; assert strong improvement and near-truth recovery.)
    p_err0 = np.linalg.norm(np.asarray(win.p)[:6] - np.asarray([s[1] for s in states]), axis=1)
    p_err1 = np.linalg.norm(np.asarray(w.p)[:6] - np.asarray([s[1] for s in states]), axis=1)
    assert np.median(p_err1) < 0.6 * np.median(p_err0)
    for k, (Rk, pk, vk) in enumerate(states):
        np.testing.assert_allclose(np.asarray(w.p[k]), pk, atol=6e-2)
        np.testing.assert_allclose(np.asarray(w.R[k]), Rk, atol=3e-2)


def test_landmark_outlier_rejected():
    """One grossly mistracked landmark (60 px off in every frame) must NOT
    drag the window when the Cauchy default is on — and must visibly corrupt
    it with plain L2 (the measured failure mode that motivated the robust
    weight: mission ATE tripled with L2 landmarks on real tracked data)."""
    states, imu_windows = simulate()
    rng = np.random.default_rng(5)
    pts = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], size=(8, 3))

    def solve_with(k_cauchy):
        cfg = SmootherConfig(window=8, iterations=20, max_landmarks=8,
                             cam_fx=200.0, cam_fy=200.0, cam_cx=80.0,
                             cam_cy=60.0, lmk_cauchy_k=k_cauchy)
        win = build_window(states, imu_windows, cfg, state_noise=0.01, seed=5)
        M, L = cfg.window, cfg.max_landmarks
        uv = np.zeros((M, L, 2))
        disp = np.zeros((M, L))
        vmask = np.zeros((M, L), bool)
        for kk, (Rk, pk, _) in enumerate(states):
            cam = (np.asarray(Rk).T @ (pts - pk).T).T
            uv[kk, :8, 0] = 200.0 * cam[:, 0] / cam[:, 2] + 80.0
            uv[kk, :8, 1] = 200.0 * cam[:, 1] / cam[:, 2] + 60.0
            disp[kk, :8] = 200.0 * cfg.cam_baseline / cam[:, 2]
            vmask[kk, :8] = cam[:, 2] > 0.5
            # Landmark 0 is a consistent mistrack: 60 px off.
            uv[kk, 0] += 60.0
        win = win._replace(lmk_uv=jnp.asarray(uv), lmk_disp=jnp.asarray(disp),
                           lmk_valid=jnp.asarray(vmask))
        pims = preintegrate_window(win)
        w, _ = solve_window(
            win, pims, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), cfg,
            jnp.asarray(5, jnp.int32),
        )
        return np.linalg.norm(
            np.asarray(w.p)[:6] - np.asarray([s[1] for s in states]), axis=1
        ).max()

    err_robust = solve_with(3.0)
    err_l2 = solve_with(0.0)
    # Robust: the outlier saturates; accuracy stays at the VO+IMU level.
    assert err_robust < 0.02, err_robust
    # And the robust loss genuinely changes the outcome vs plain L2.
    assert err_l2 > 2.0 * err_robust, (err_l2, err_robust)


@pytest.mark.slow
def test_sliding_matches_batch_solve():
    """Slide the window across 3x its length and check the final pose against
    a full batch solve over ALL keyposes. Catches mis-anchored slide priors
    (the anchor must be the slot-1 marginal, not the newest slot's)."""
    W = 6
    n_total = 3 * W
    cfg_s = SmootherConfig(window=W, iterations=8)
    cfg_b = SmootherConfig(window=n_total, iterations=10)
    states, imu_windows = simulate(M_used=n_total)

    # Full batch solve over every keypose = ground truth estimator.
    full = build_window(states, imu_windows, cfg_b, state_noise=0.02, seed=7)
    wb, rb = solve_window(
        full, preintegrate_window(full), jnp.asarray(GRAVITY), jnp.asarray(G_UNIT),
        cfg_b, jnp.asarray(n_total - 1, jnp.int32),
    )

    # Sliding solve: stream the same keyposes through a W-slot window,
    # anchoring each slide with the slot-1 marginal from the previous solve
    # (exactly what StateEstimator._push_keypose does).
    win = make_window(cfg_s, N_IMU)
    n_kp = 0
    last = None
    solve_s = jax.jit(
        lambda w, pm, slot: solve_window(
            w, pm, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), cfg_s, slot
        )
    )  # one compile for all 17 incremental solves (same static shapes)
    for k in range(n_total):
        if n_kp >= W:
            cov = last.cov_slot1 if last is not None else jnp.eye(15) * 1e-2
            win = slide_window(win, jnp.asarray(cov))
            n_kp = W - 1
        slot = n_kp
        win = win._replace(
            timestamps=win.timestamps.at[slot].set(full.timestamps[k]),
            R=win.R.at[slot].set(full.R[k]),
            p=win.p.at[slot].set(full.p[k]),
            v=win.v.at[slot].set(full.v[k]),
            valid=win.valid.at[slot].set(True),
            vo_T=win.vo_T.at[slot].set(full.vo_T[k]),
            vo_valid=win.vo_valid.at[slot].set(full.vo_valid[k]),
            imu_samples=win.imu_samples.at[slot].set(full.imu_samples[k]),
            imu_mask=win.imu_mask.at[slot].set(full.imu_mask[k]),
            imu_valid=win.imu_valid.at[slot].set(full.imu_valid[k]),
            depth=win.depth.at[slot].set(full.depth[k]),
            depth_valid=win.depth_valid.at[slot].set(full.depth_valid[k]),
        )
        if k == 0:
            win = win._replace(
                prior_R=full.prior_R, prior_p=full.prior_p, prior_v=full.prior_v,
                prior_sqrt_info=jnp.eye(15) * 100.0,
            )
        n_kp += 1
        if n_kp >= 2:
            pims = preintegrate_window(win)
            win, last = solve_s(win, pims, jnp.asarray(n_kp - 1, jnp.int32))

    assert last is not None
    # Final keypose agrees with the all-keypose batch solution AND the truth.
    np.testing.assert_allclose(np.asarray(last.p), np.asarray(rb.p), atol=2e-2)
    np.testing.assert_allclose(np.asarray(last.p), states[-1][1], atol=5e-2)
    np.testing.assert_allclose(np.asarray(last.R), states[-1][0], atol=2e-2)


@pytest.mark.slow
def test_imu_factor_nees_consistency():
    """NEES consistency of the full-covariance IMU whitening: with IMU noise
    injected at exactly the calibration's densities and a hard truth prior on
    slot 0, the newest-state error normalized by the reported 9-dof marginal
    should be chi-square-consistent (mean ~9 for [theta p v]; we accept a
    generous band — measured ~6, i.e. slightly conservative covariances,
    which is the safe side for the EKF divergence thresholds)."""
    from ocean_perception_tpu.core.se3 import so3_log
    from ocean_perception_tpu.vio.imu_preintegration import ImuCalibration

    cfg = SmootherConfig(window=6, iterations=8)
    calib = ImuCalibration()
    solve_j = jax.jit(
        lambda w, pm: solve_window(
            w, pm, jnp.asarray(GRAVITY), jnp.asarray(G_UNIT), cfg,
            jnp.asarray(5, jnp.int32),
        )
    )  # one compile for all 10 seeds
    nees_vals = []
    for seed in range(10):
        rng = np.random.default_rng(100 + seed)
        states, imu_windows = simulate(M_used=6)
        win = build_window(
            states, imu_windows, cfg, state_noise=0.0, with_vo=False, with_depth=False
        )
        samples = np.asarray(win.imu_samples).copy()
        for k in range(6):
            if not bool(win.imu_valid[k]):
                continue
            dts = samples[k, :, 0:1]
            live = dts > 0
            scale = 1.0 / np.sqrt(np.maximum(dts, 1e-9)) * live
            samples[k, :, 1:4] += rng.normal(0, 1, (N_IMU, 3)) * calib.gyro_noise_sigma * scale
            samples[k, :, 4:7] += rng.normal(0, 1, (N_IMU, 3)) * calib.accel_noise_sigma * scale
        win = win._replace(
            imu_samples=jnp.asarray(samples), prior_sqrt_info=jnp.eye(15) * 1e4
        )
        pims = preintegrate_window(win, calib)
        _, res = solve_j(win, pims)
        Rt, pt, vt = states[5]
        e_th = np.asarray(so3_log(jnp.asarray(Rt.T) @ res.R))
        e = np.concatenate([e_th, np.asarray(res.p) - pt, np.asarray(res.v) - vt])
        cov9 = np.asarray(res.cov_newest)[:9, :9]
        nees_vals.append(float(e @ np.linalg.solve(cov9, e)))

    mean_nees = float(np.mean(nees_vals))
    assert 2.5 < mean_nees < 20.0, (mean_nees, nees_vals)


def test_preintegrate_window_program_cache():
    """Regression for the round-3 leak: preintegrate_window must reuse ONE
    jitted program per calibration value (a fresh vmap closure per smoother
    update re-compiled every keypose and leaked LLVM JIT mappings until
    'Cannot allocate memory' hours into a mission)."""
    from ocean_perception_tpu.vio.imu_preintegration import ImuCalibration
    from ocean_perception_tpu.vio.smoother import _preintegrate_window_jit

    c1 = ImuCalibration()
    c2 = ImuCalibration()          # equal value, distinct object
    c3 = ImuCalibration(accel_noise_sigma=0.5)
    assert _preintegrate_window_jit(c1) is _preintegrate_window_jit(c2)
    assert _preintegrate_window_jit(c1) is not _preintegrate_window_jit(c3)

    before = _preintegrate_window_jit.cache_info().hits
    win = make_window(SmootherConfig(window=4), 8)
    preintegrate_window(win, c1)
    preintegrate_window(win, c2)
    info = _preintegrate_window_jit.cache_info()
    assert info.hits >= before + 2, info
