"""Independent f64 oracle for the fixed-lag smoother solve.

Every other numeric subsystem has an implementation-independent oracle
(stereo/oracle.py, imaging/oracle.py, cv2-verified LK, fingerprint-pinned
LCM). This module closes the last gap: a plain numpy + scipy re-derivation
of the smoother's ENTIRE factor set (vio/smoother.py _residuals — the
reference's fixed_lag_smoother.cpp:232-468 graph: slot-0 prior, VO between
with Cauchy, IMU preintegration, bias random walk, depth, range, mag,
absolute pose fix, structureless landmark projection, no-motion fallback)
solved by `scipy.optimize.least_squares` instead of the library's damped-QR
Gauss-Newton, with SO(3) exp/log via `scipy.spatial.transform.Rotation`
instead of core/se3.py.

Shared inputs, independent math: the oracle consumes the same
`KeyposeWindow` and the same stacked `PreintegratedImu` (preintegration is
a MEASUREMENT here — its own correctness is covered by the NEES test and
predict/propagate tests), then re-derives the residuals, the bias
correction, the whitening, the robust weight, the structureless landmark
elimination, and the covariance from the written factor definitions. A
silent Jacobian or residual bug in the jitted path shows up as state or
covariance divergence against this solver.

Notes on exactness:
- The library's Marquardt damping rows penalize the GN *step*, not the
  state, and its absolute-floor rows only act on a stationary point through
  the floor term; at convergence (J^T r = 0) both solvers sit at the same
  undamped stationary point, so converged states must agree to solver
  tolerance.
- The covariance intentionally replicates the library's estimator
  *definition* — inv(J^T J + floor^2 I) at the converged state with floor =
  sqrt(damping + 1e-8) (solve_window's undamped-plus-floor QR) — but J
  itself comes from central finite differences of THIS module's residual.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation


def _exp(phi: np.ndarray) -> np.ndarray:
    return Rotation.from_rotvec(np.asarray(phi, float)).as_matrix()


def _log(R: np.ndarray) -> np.ndarray:
    return Rotation.from_matrix(np.asarray(R, float)).as_rotvec()


def _np_window(win) -> dict:
    """Pull every KeyposeWindow field to f64 numpy."""
    return {k: np.asarray(getattr(win, k), float if getattr(win, k).dtype != bool else bool)
            for k in win._fields}


def _np_pims(pims) -> dict:
    return {k: np.asarray(getattr(pims, k), float) for k in pims._fields}


def _bias_corrected(pims: dict, k: int, bg: np.ndarray, ba: np.ndarray):
    """GTSAM biasCorrectedDeltas, re-derived (imu_preintegration.py:178-187)."""
    dbg = bg - pims["bias_gyro"][k]
    dba = ba - pims["bias_accel"][k]
    dR = pims["dR"][k] @ _exp(pims["dR_dbg"][k] @ dbg)
    dv = pims["dv"][k] + pims["dv_dbg"][k] @ dbg + pims["dv_dba"][k] @ dba
    dp = pims["dp"][k] + pims["dp_dbg"][k] @ dbg + pims["dp_dba"][k] @ dba
    return dR, dv, dp


def _retract(w: dict, delta: np.ndarray) -> dict:
    """Boxplus on every slot: R·exp(theta), additive on p/v/bg/ba."""
    out = dict(w)
    M = w["R"].shape[0]
    d = delta.reshape(M, 15)
    out["R"] = np.stack([w["R"][i] @ _exp(d[i, 0:3]) for i in range(M)])
    out["p"] = w["p"] + d[:, 3:6]
    out["v"] = w["v"] + d[:, 6:9]
    out["bg"] = w["bg"] + d[:, 9:12]
    out["ba"] = w["ba"] + d[:, 12:15]
    return out


def oracle_residuals(
    delta: np.ndarray,
    win: dict,
    pims: dict,
    gravity: np.ndarray,
    gravity_unit: np.ndarray,
    config,
) -> np.ndarray:
    """The identical whitened/masked residual set, from the factor
    definitions (NOT transcribed jax): see vio/smoother.py _residuals for
    the factor list and fixed_lag_smoother.cpp:232-468 for the reference
    graph being cross-checked."""
    M = win["valid"].shape[0]
    w = _retract(win, delta)
    valid = win["valid"]

    prev = lambda a: np.roll(a, 1, axis=0)
    pair_ok = valid & prev(valid)
    pair_ok[0] = False

    res = []

    # Slot-0 prior with the fix-aware gauge relax on its pose block.
    r_prior = np.concatenate([
        _log(win["prior_R"].T @ w["R"][0]),
        w["p"][0] - win["prior_p"],
        w["v"][0] - win["prior_v"],
        w["bg"][0] - win["prior_bg"],
        w["ba"][0] - win["prior_ba"],
    ])
    s_anchor = 1.0 / (np.linalg.norm(win["prior_sqrt_info"][:, 3:6]) / np.sqrt(3.0) + 1e-12)
    fix_active = win["fix_valid"] & valid
    sig_means = np.mean(win["fix_sigma"][:, 3:6], axis=1)
    s_fix = np.min(np.where(fix_active, sig_means, np.inf))
    relax = np.clip(100.0 * s_anchor / s_fix, 1.0, 100.0)
    col_scale = np.concatenate([np.full(6, 1.0 / relax), np.ones(9)])
    res.append((win["prior_sqrt_info"] * col_scale[None, :]) @ r_prior * float(valid[0]))

    # VO between factors, Cauchy-robustified on the combined 6-vector norm.
    R_prev = np.where(pair_ok[:, None, None], prev(w["R"]), w["R"])
    p_prev = np.where(pair_ok[:, None], prev(w["p"]), w["p"])
    R_rel = np.einsum("mji,mjk->mik", R_prev, w["R"])
    p_rel = np.einsum("mji,mj->mi", R_prev, w["p"] - p_prev)
    r_rot = np.stack([_log(win["vo_T"][i, :3, :3].T @ R_rel[i]) for i in range(M)])
    r_trans = p_rel - win["vo_T"][:, :3, 3]
    vo_ok = (win["vo_valid"] & pair_ok).astype(float)[:, None]
    r_vo = np.concatenate([r_rot / config.vo_rot_sigma, r_trans / config.vo_trans_sigma], axis=1)
    nrm2 = np.sum(r_vo * r_vo, axis=1, keepdims=True)
    cauchy = 1.0 / np.sqrt(1.0 + nrm2 / (0.1 / config.vo_trans_sigma) ** 2)
    res.append((r_vo * cauchy * vo_ok).reshape(-1))

    # IMU preintegration factors (Forster eq. 37), whitened by the Cholesky
    # factor of the (symmetrized, floored) 9x9 preintegration covariance.
    imu_ok = (win["imu_valid"] & pair_ok).astype(float)[:, None]
    p_im = prev(w["p"])
    v_im = prev(w["v"])
    bg_im = prev(w["bg"])
    ba_im = prev(w["ba"])
    r_imu_all = np.zeros((M, 9))
    for i in range(M):
        dR, dv, dp = _bias_corrected(pims, i, bg_im[i], ba_im[i])
        dt = pims["dt"][i]
        R_i = R_prev[i]
        r_R = _log(dR.T @ (R_i.T @ w["R"][i]))
        r_v = R_i.T @ (w["v"][i] - v_im[i] - gravity * dt) - dv
        r_p = R_i.T @ (w["p"][i] - p_im[i] - v_im[i] * dt - 0.5 * gravity * dt * dt) - dp
        rr = np.concatenate([r_R, r_v, r_p])
        cov9 = 0.5 * (pims["cov"][i] + pims["cov"][i].T) + config.imu_sigma_floor**2 * np.eye(9)
        L = np.linalg.cholesky(cov9)
        r_imu_all[i] = np.linalg.solve(L, rr)
    res.append((r_imu_all * imu_ok).reshape(-1))

    # Bias random walk between consecutive keyposes.
    dt_pair = np.clip(w["timestamps"] - prev(w["timestamps"]), 1e-3, None)[:, None]
    rw_g = (w["bg"] - prev(w["bg"])) / (config.bias_rw_gyro_sigma * np.sqrt(dt_pair))
    rw_a = (w["ba"] - prev(w["ba"])) / (config.bias_rw_accel_sigma * np.sqrt(dt_pair))
    res.append((np.concatenate([rw_g, rw_a], axis=1) * imu_ok).reshape(-1))

    # Depth along the gravity axis.
    d_pred = w["p"] @ gravity_unit
    res.append((d_pred - win["depth"]) / config.depth_sigma
               * (win["depth_valid"] & valid).astype(float))

    # Ranges, beacon -> receiver lever arm.
    t_recv = np.asarray(config.body_t_receiver, float)
    p_recv = w["p"] + np.einsum("mij,j->mi", w["R"], t_recv)
    delta_b = win["range_beacons"] - p_recv[:, None, :]
    dist = np.linalg.norm(delta_b + 1e-12, axis=-1)
    r_range = (dist - win["ranges"]) / config.range_sigma
    if config.range_cauchy_k > 0:
        r_range = r_range / np.sqrt(1.0 + (r_range * r_range) / config.range_cauchy_k**2)
    res.append((r_range * (win["range_valid"] & valid[:, None]).astype(float)).reshape(-1))

    # Magnetometer (MagPoseFactor): field predicted in the sensor frame.
    field = np.asarray(config.mag_local_field, float) * config.mag_scale
    R_bs = np.asarray(config.mag_body_R_sensor, float).reshape(3, 3)
    mag_pred = np.einsum("ij,mkj,k->mi", R_bs.T, w["R"], field) \
        + np.asarray(config.mag_bias, float)
    r_mag = (mag_pred - win["mag"]) / config.mag_sigma
    res.append((r_mag * (win["mag_valid"] & valid).astype(float)[:, None]).reshape(-1))

    # Absolute pose fix: 6-DoF unary prior whitened by the fix's own sigmas,
    # with the masked-row log-argument substitution.
    fix_ok = (win["fix_valid"] & valid).astype(float)[:, None]
    fix_R_eff = np.where(win["fix_valid"][:, None, None], win["fix_R"], w["R"])
    r_fix_rot = np.stack([_log(fix_R_eff[i].T @ w["R"][i]) for i in range(M)])
    r_fix = np.concatenate([r_fix_rot, w["p"] - win["fix_p"]], axis=1)
    res.append((r_fix / np.maximum(win["fix_sigma"], 1e-9) * fix_ok).reshape(-1))

    # Structureless landmark projection factors (stereo smart factors).
    if config.max_landmarks > 0:
        fx, fy, cx, cy = config.cam_fx, config.cam_fy, config.cam_cx, config.cam_cy
        obs_ok = (win["lmk_valid"] & valid[:, None]).astype(float)
        lmk_ok = (np.sum(obs_ok, axis=0) >= 2.0).astype(float)

        R_bc = np.asarray(config.body_R_cam, float).reshape(3, 3)
        t_bc = np.asarray(config.body_t_cam, float)
        R_cam = np.einsum("mij,jk->mik", w["R"], R_bc)
        p_cam = w["p"] + np.einsum("mij,j->mi", w["R"], t_bc)

        xn = (win["lmk_uv"][..., 0] - cx) / fx
        yn = (win["lmk_uv"][..., 1] - cy) / fy
        dirs_cam = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
        dirs_w = np.einsum("mij,mlj->mli", R_cam, dirs_cam)
        dirs_w = dirs_w / np.maximum(np.linalg.norm(dirs_w, axis=-1, keepdims=True), 1e-9)

        has_disp = (win["lmk_disp"] > 0).astype(float) * obs_ok
        z_meas = fx * config.cam_baseline / np.maximum(win["lmk_disp"], 1e-3)
        X_cam_meas = np.stack([xn * z_meas, yn * z_meas, z_meas], axis=-1)
        X_meas = p_cam[:, None, :] + np.einsum("mij,mlj->mli", R_cam, X_cam_meas)
        n_stereo = np.sum(has_disp, axis=0)
        X_stereo = np.sum(X_meas * has_disp[..., None], axis=0) \
            / np.maximum(n_stereo, 1.0)[:, None]
        eye3 = np.eye(3)
        Pm = (eye3[None, None] - dirs_w[..., :, None] * dirs_w[..., None, :]) \
            * obs_ok[..., None, None]
        A = np.sum(Pm, axis=0) + (1e-6 + (1.0 - lmk_ok))[:, None, None] * eye3[None]
        b = np.sum(np.einsum("mlij,mj->mli", Pm, p_cam), axis=0)
        X_mono = np.linalg.solve(A, b[..., None])[..., 0]
        X = np.where((n_stereo > 0)[:, None], X_stereo, X_mono)

        X_cam = np.einsum("mji,mlj->mli", R_cam, X[None] - p_cam[:, None, :])
        z_cam = X_cam[..., 2]
        behind = z_cam < 0.1
        z_safe = np.maximum(z_cam, 0.1)
        u_pred = fx * X_cam[..., 0] / z_safe + cx
        v_pred = fy * X_cam[..., 1] / z_safe + cy
        w_lmk = obs_ok * lmk_ok[None, :] * (~behind).astype(float) / config.lmk_sigma_px
        r_u = (u_pred - win["lmk_uv"][..., 0]) * w_lmk
        r_v = (v_pred - win["lmk_uv"][..., 1]) * w_lmk
        disp_pred = fx * config.cam_baseline / z_safe
        hd = (win["lmk_disp"] > 0).astype(float)
        r_d = (disp_pred - win["lmk_disp"]) * w_lmk * hd
        if config.lmk_cauchy_k > 0:
            n2 = r_u * r_u + r_v * r_v + r_d * r_d
            w_rob = 1.0 / np.sqrt(1.0 + n2 / config.lmk_cauchy_k**2)
            r_u, r_v, r_d = r_u * w_rob, r_v * w_rob, r_d * w_rob
        res.append(r_u.reshape(-1))
        res.append(r_v.reshape(-1))
        res.append(r_d.reshape(-1))

    # No-motion fallback pairs.
    nm_ok = (pair_ok & ~win["vo_valid"] & ~win["imu_valid"]).astype(float)[:, None]
    r_nm = np.concatenate([
        np.stack([_log(R_rel[i]) for i in range(M)]) / config.no_motion_rot_sigma,
        p_rel / config.no_motion_trans_sigma,
    ], axis=1)
    res.append((r_nm * nm_ok).reshape(-1))

    return np.concatenate(res)


def oracle_solve(win, pims, gravity, gravity_unit, config,
                 tol: float = 1e-14):
    """Solve the identical window problem with scipy's TRF least-squares in
    f64. Only valid slots' 15-vectors are free (the library freezes invalid
    slots); returns (states dict, cov (15M,15M), residual norm).

    The covariance replicates solve_window's estimator definition —
    inv(J^T J + floor^2 I) at the converged state — with J from central
    finite differences of THIS residual."""
    w = _np_window(win)
    pim = _np_pims(pims)
    g = np.asarray(gravity, float)
    gu = np.asarray(gravity_unit, float)
    M = w["valid"].shape[0]
    valid = np.asarray(w["valid"], bool)
    free = np.repeat(valid, 15)
    n_free = int(free.sum())

    def res_of_free(x):
        delta = np.zeros(M * 15)
        delta[free] = x
        return oracle_residuals(delta, w, pim, g, gu, config)

    sol = least_squares(
        res_of_free, np.zeros(n_free), method="trf",
        xtol=tol, ftol=tol, gtol=tol, max_nfev=20000,
    )
    delta = np.zeros(M * 15)
    delta[free] = sol.x
    conv = _retract(w, delta)

    # Full-window covariance at the converged state (delta re-zeroed there).
    def res_of_full(d):
        return oracle_residuals(d, conv, pim, g, gu, config)

    r0 = res_of_full(np.zeros(M * 15))
    n = M * 15
    J = np.zeros((r0.shape[0], n))
    h = 1e-6
    for j in range(n):
        e = np.zeros(n)
        e[j] = h
        J[:, j] = (res_of_full(e) - res_of_full(-e)) / (2 * h)
    floor2 = config.damping + 1e-8
    cov = np.linalg.inv(J.T @ J + floor2 * np.eye(n))
    states = {k: conv[k] for k in ("R", "p", "v", "bg", "ba")}
    return states, cov, float(np.linalg.norm(sol.fun))
