"""Fixed-lag smoother: windowed factor-graph optimization over keyposes.

Reference parity: vio/fixed_lag_smoother.{hpp,cpp} — the reference builds a
GTSAM IncrementalFixedLagSmoother (ISAM2, ~10 s lag) with factors per keypose
(fixed_lag_smoother.cpp:232-468):
  - VO BetweenFactor with Cauchy-robust noise,
  - CombinedImuFactor + bias random-walk Between,
  - depth prior on the gravity-axis translation (SingleAxisFactor),
  - range factors to beacons,
  - a no-motion fallback prior when neither VO nor IMU is available.

TPU-native redesign (not a port): instead of incremental ISAM2, a fixed-size
window of M keyposes is re-solved by batch Gauss-Newton each update — dense
(15M x 15M) normal equations are tiny on an MXU, and a static-shape window
jits once. States are lifted to local coordinates around the current
estimate each iteration ("boxplus" retraction, rotvec for rotation);
residuals are whitened and the Jacobian comes from jax.jacfwd (autodiff
replaces GTSAM's hand-derived factor Jacobians). Sliding the window anchors
the new oldest keypose with its marginal covariance from the previous solve
(prior anchoring — a first-order approximation of full Schur-complement
marginalization).

Keypose state: rotation R (world_R_body), position p, velocity v, gyro bias
bg, accel bias ba — 15 error DoF in [theta(3), p(3), v(3), bg(3), ba(3)].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.se3 import so3_exp, so3_log
from .imu_preintegration import PreintegratedImu, bias_corrected_deltas


_EYE9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
_ZERO3 = (0.0, 0.0, 0.0)


@struct.dataclass
class SmootherConfig:
    window: int = struct.field(pytree_node=False, default=12)
    iterations: int = struct.field(pytree_node=False, default=6)
    damping: float = struct.field(pytree_node=False, default=1e-6)
    vo_rot_sigma: float = struct.field(pytree_node=False, default=0.02)
    vo_trans_sigma: float = struct.field(pytree_node=False, default=0.05)
    depth_sigma: float = struct.field(pytree_node=False, default=0.05)
    range_sigma: float = struct.field(pytree_node=False, default=0.3)
    bias_rw_gyro_sigma: float = struct.field(pytree_node=False, default=1e-4)
    bias_rw_accel_sigma: float = struct.field(pytree_node=False, default=1e-3)
    no_motion_rot_sigma: float = struct.field(pytree_node=False, default=0.05)
    no_motion_trans_sigma: float = struct.field(pytree_node=False, default=0.1)
    mag_sigma: float = struct.field(pytree_node=False, default=0.1)
    mag_scale: float = struct.field(pytree_node=False, default=1.0)
    # World-frame field direction (config/shared mag0.local_field).
    mag_local_field: tuple = struct.field(pytree_node=False, default=(0.0, 0.0, 1.0))
    # Landmark (structureless projection) factors — the reference legacy
    # Smoother's SmartStereoProjectionPoseFactor equivalent (smoother.cpp:
    # 455-490). max_landmarks columns track landmark identity across the
    # window (assigned host-side); 0 disables.
    max_landmarks: int = struct.field(pytree_node=False, default=0)
    lmk_sigma_px: float = struct.field(pytree_node=False, default=2.0)
    # Cauchy scale (in sigma units) for the landmark rows. Real tracked
    # observations contain occasional mistracks; a plain-L2 projection
    # factor lets ONE bad track drag the whole window (measured on the
    # synthetic mission: ATE 0.078 -> 0.185 m when enabling plain-L2
    # landmarks). The VO rows already use Cauchy; landmarks get the same
    # treatment, applied per observation over its [u, v, disp] residual
    # norm. <= 0 disables (plain L2).
    lmk_cauchy_k: float = struct.field(pytree_node=False, default=3.0)
    # Cauchy scale (sigma units) for the range rows. The round-5 mission
    # stress matrix measured plain-L2 range rows dragging the window to
    # meters of ATE under gross acoustic outliers (multipath-style: 20%
    # outliers -> 0.4-1.0 m, 50% -> 1.7-2 m) even with the EKF's innovation
    # gate (the smoother re-consumes the raw measurements). Same loss
    # family as the VO/landmark rows; 0 = plain L2 (reference parity —
    # the reference's RangeFactor noise is not robust either).
    range_cauchy_k: float = struct.field(pytree_node=False, default=3.0)
    # Left-camera intrinsics for the projection factors.
    cam_fx: float = struct.field(pytree_node=False, default=300.0)
    cam_fy: float = struct.field(pytree_node=False, default=300.0)
    cam_cx: float = struct.field(pytree_node=False, default=320.0)
    cam_cy: float = struct.field(pytree_node=False, default=240.0)
    cam_baseline: float = struct.field(pytree_node=False, default=0.2)
    imu_sigma_floor: float = struct.field(pytree_node=False, default=1e-5)
    max_ranges: int = struct.field(pytree_node=False, default=4)
    # Sensor extrinsics (config/shared/*.yaml; the reference pipes these as
    # body_P_cam / body_P_receiver / body_P_mag — fixed_lag_smoother.cpp:62-68).
    # body_R_cam/body_t_cam: left camera in body frame — the landmark
    # projection factors observe through this camera. body_t_receiver: range
    # receiver lever arm (RangeFactorWithTransform parity). mag_body_R_sensor
    # /mag_bias: magnetometer mounting rotation + hard-iron bias
    # (MagPoseFactor body_P_sensor + bias_, mag_pose_factor.hpp:32-72).
    body_R_cam: tuple = struct.field(pytree_node=False, default=_EYE9)
    body_t_cam: tuple = struct.field(pytree_node=False, default=_ZERO3)
    body_t_receiver: tuple = struct.field(pytree_node=False, default=_ZERO3)
    mag_body_R_sensor: tuple = struct.field(pytree_node=False, default=_EYE9)
    mag_bias: tuple = struct.field(pytree_node=False, default=_ZERO3)


class KeyposeWindow(NamedTuple):
    """Fixed M-slot state + factor storage. Slot i connects to slot i-1."""

    timestamps: jnp.ndarray    # (M,) MISSION-RELATIVE seconds (t - origin):
    #                            epoch-scale seconds in f32 quantize to
    #                            ~128 s, which would destroy the dt_pair
    #                            differences in the bias random-walk factor
    R: jnp.ndarray             # (M, 3, 3)
    p: jnp.ndarray             # (M, 3)
    v: jnp.ndarray             # (M, 3)
    bg: jnp.ndarray            # (M, 3)
    ba: jnp.ndarray            # (M, 3)
    valid: jnp.ndarray         # (M,)
    # Factors from slot i-1 to slot i:
    vo_T: jnp.ndarray          # (M, 4, 4) relative BODY pose i-1 -> i (VO is
    #                            conjugated by body_T_cam at intake,
    #                            state_estimator.receive_stereo; reference
    #                            smoother.cpp:282)
    vo_valid: jnp.ndarray      # (M,)
    imu_samples: jnp.ndarray   # (M, N_IMU, 7) raw windows for re-preintegration
    imu_mask: jnp.ndarray      # (M, N_IMU)
    imu_valid: jnp.ndarray     # (M,)
    depth: jnp.ndarray         # (M,)
    depth_valid: jnp.ndarray   # (M,)
    ranges: jnp.ndarray        # (M, B)
    range_beacons: jnp.ndarray  # (M, B, 3)
    range_valid: jnp.ndarray   # (M, B)
    mag: jnp.ndarray           # (M, 3) measured field, sensor==body frame
    mag_valid: jnp.ndarray     # (M,)
    # Absolute pose fix factors (external aiding: fiducial relocalization,
    # USBL, surface GPS). No reference equivalent — its absolute inputs are
    # depth/range/mag only; this is what lets external fixes correct the
    # SMOOTHED trajectory, not just the filter (receive_pose).
    fix_R: jnp.ndarray         # (M, 3, 3) measured world_R_body
    fix_p: jnp.ndarray         # (M, 3) measured world position
    fix_sigma: jnp.ndarray     # (M, 6) stdevs [rot(3), trans(3)]
    fix_valid: jnp.ndarray     # (M,)
    # Landmark observations: column l holds ONE landmark's pixel track
    # across the window (host keeps the id→column assignment).
    lmk_uv: jnp.ndarray        # (M, L, 2)
    lmk_disp: jnp.ndarray      # (M, L) stereo disparity (<=0: mono obs)
    lmk_valid: jnp.ndarray     # (M, L)
    # Prior on slot 0 (marginalization anchor): mean uses slot-0 state.
    prior_sqrt_info: jnp.ndarray  # (15, 15)
    prior_R: jnp.ndarray          # (3, 3)
    prior_p: jnp.ndarray
    prior_v: jnp.ndarray
    prior_bg: jnp.ndarray
    prior_ba: jnp.ndarray


def make_window(config: SmootherConfig, n_imu: int, dtype=None) -> KeyposeWindow:
    # Default to f64 under x64 (host/CPU testing), f32 otherwise (TPU has no
    # f64; the QR-based GN in solve_window is f32-safe — see _qr_step).
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    M, B = config.window, config.max_ranges
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (M, 3, 3))
    return KeyposeWindow(
        timestamps=jnp.zeros(M, dtype),
        R=eye,
        p=jnp.zeros((M, 3), dtype),
        v=jnp.zeros((M, 3), dtype),
        bg=jnp.zeros((M, 3), dtype),
        ba=jnp.zeros((M, 3), dtype),
        valid=jnp.zeros(M, bool),
        vo_T=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (M, 4, 4)),
        vo_valid=jnp.zeros(M, bool),
        imu_samples=jnp.zeros((M, n_imu, 7), dtype),
        imu_mask=jnp.zeros((M, n_imu), bool),
        imu_valid=jnp.zeros(M, bool),
        depth=jnp.zeros(M, dtype),
        depth_valid=jnp.zeros(M, bool),
        ranges=jnp.zeros((M, B), dtype),
        range_beacons=jnp.zeros((M, B, 3), dtype),
        range_valid=jnp.zeros((M, B), bool),
        mag=jnp.zeros((M, 3), dtype),
        mag_valid=jnp.zeros(M, bool),
        fix_R=eye,
        fix_p=jnp.zeros((M, 3), dtype),
        fix_sigma=jnp.ones((M, 6), dtype),
        fix_valid=jnp.zeros(M, bool),
        lmk_uv=jnp.zeros((M, max(config.max_landmarks, 1), 2), dtype),
        lmk_disp=jnp.zeros((M, max(config.max_landmarks, 1)), dtype),
        lmk_valid=jnp.zeros((M, max(config.max_landmarks, 1)), bool),
        prior_sqrt_info=jnp.eye(15, dtype=dtype) * 10.0,
        prior_R=jnp.eye(3, dtype=dtype),
        prior_p=jnp.zeros(3, dtype),
        prior_v=jnp.zeros(3, dtype),
        prior_bg=jnp.zeros(3, dtype),
        prior_ba=jnp.zeros(3, dtype),
    )


def _retract(win: KeyposeWindow, delta: jnp.ndarray) -> KeyposeWindow:
    """Apply (M, 15) local increments [theta p v bg ba] to the window states."""
    dR = jax.vmap(so3_exp)(delta[:, 0:3])
    return win._replace(
        R=jnp.einsum("mij,mjk->mik", win.R, dR),
        p=win.p + delta[:, 3:6],
        v=win.v + delta[:, 6:9],
        bg=win.bg + delta[:, 9:12],
        ba=win.ba + delta[:, 12:15],
    )


def _residuals(
    delta: jnp.ndarray,
    win: KeyposeWindow,
    pims: PreintegratedImu,          # stacked (M, ...) preintegrations i-1 -> i
    gravity: jnp.ndarray,
    gravity_unit: jnp.ndarray,
    config: SmootherConfig,
) -> jnp.ndarray:
    """Whitened residual vector of every factor, masked rows zeroed."""
    M = win.valid.shape[0]
    w = _retract(win, delta)
    dtype = delta.dtype

    prev = lambda arr: jnp.roll(arr, 1, axis=0)  # slot i-1 aligned with i
    pair_ok = win.valid & prev(win.valid)
    pair_ok = pair_ok.at[0].set(False)

    res = []

    # -- prior on slot 0 ------------------------------------------------------
    r_prior = jnp.concatenate(
        [
            so3_log(w.prior_R.T @ w.R[0]),
            w.p[0] - w.prior_p,
            w.v[0] - w.prior_v,
            w.bg[0] - w.prior_bg,
            w.ba[0] - w.prior_ba,
        ]
    )
    # When a TIGHT external pose fix is active in the window, the FIX
    # provides the absolute pose gauge, not the slide anchor: the anchor's
    # pose carries all accumulated drift but its marginal (conditioned only
    # on relative factors + the previous anchor) still claims ~cm
    # confidence. Left at full weight, the solver STRETCHES the window
    # between the overconfident drifted anchor and the fix — measured on a
    # dynamic mission as a velocity kink after every fix that triples ATE.
    # Down-weighting the anchor's pose block (velocity/bias rows stay
    # tight) lets the window translate rigidly onto the fix at ~zero
    # relative-factor cost. The relax SCALES with the fix's tightness
    # relative to the anchor's claimed sigma: a fix as tight as the anchor
    # fully un-pins it (x100 sigma), a fix 100x weaker leaves the anchor
    # pinned — so a meters-sigma USBL ping cannot un-pin a cm-confident
    # anchor and inject its own noise into the window.
    s_anchor = 1.0 / (
        jnp.linalg.norm(win.prior_sqrt_info[:, 3:6]) / jnp.sqrt(3.0) + 1e-12
    )
    fix_active = win.fix_valid & win.valid
    s_fix = jnp.min(
        jnp.where(fix_active, jnp.mean(win.fix_sigma[:, 3:6], axis=1), jnp.inf)
    )
    relax = jnp.clip(100.0 * s_anchor / s_fix, 1.0, 100.0)
    gauge = (1.0 / relax).astype(dtype)
    col_scale = jnp.concatenate(
        [jnp.full(6, gauge, dtype), jnp.ones(9, dtype)]
    )
    prior_S = w.prior_sqrt_info * col_scale[None, :]
    res.append((prior_S @ r_prior) * win.valid[0].astype(dtype))

    # -- VO between factors ---------------------------------------------------
    # Masked-pair AD safety: invalid pairs — above all the slot-0 wraparound
    # (prev = jnp.roll) — would feed so3_log an ARBITRARY relative rotation
    # (e.g. a down-looking keypose vs an unfilled slot's identity = θ=π,
    # where arccos' derivative is infinite and the ×0 mask yields NaN under
    # jacfwd). Substitute the slot's own rotation so masked relative
    # rotations are ≈identity, inside the θ² Taylor guard.
    R_prev = jnp.where(pair_ok[:, None, None], prev(w.R), w.R)
    p_prev = jnp.where(pair_ok[:, None], prev(w.p), w.p)
    R_rel = jnp.einsum("mji,mjk->mik", R_prev, w.R)         # R_{i-1}^T R_i
    p_rel = jnp.einsum("mji,mj->mi", R_prev, w.p - p_prev)
    r_rot = jax.vmap(so3_log)(jnp.einsum("mji,mjk->mik", win.vo_T[:, :3, :3], R_rel))
    r_trans = p_rel - win.vo_T[:, :3, 3]
    vo_ok = (win.vo_valid & pair_ok).astype(dtype)[:, None]
    # Cauchy robust weight on the combined residual norm (fixed_lag_smoother
    # uses a Cauchy(0.1) noise model on the VO between factor).
    r_vo_raw = jnp.concatenate(
        [r_rot / config.vo_rot_sigma, r_trans / config.vo_trans_sigma], axis=1
    )
    nrm2 = jnp.sum(r_vo_raw * r_vo_raw, axis=1, keepdims=True)
    cauchy = 1.0 / jnp.sqrt(1.0 + nrm2 / (0.1 / config.vo_trans_sigma) ** 2)
    res.append((r_vo_raw * cauchy * vo_ok).reshape(-1))

    # -- IMU preintegration factors ------------------------------------------
    def imu_res(i_pim, R_i, p_i, v_i, bg_i, ba_i, R_j, p_j, v_j):
        dR, dv, dp = bias_corrected_deltas(i_pim, bg_i, ba_i)
        dt = i_pim.dt
        r_R = so3_log(dR.T @ (R_i.T @ R_j))
        r_v = R_i.T @ (v_j - v_i - gravity * dt) - dv
        r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp
        return jnp.concatenate([r_R, r_v, r_p])

    r_imu = jax.vmap(imu_res)(
        pims,
        # R_prev (pair-masked) for the same θ=π AD-safety as the VO rows:
        # imu_res's so3_log otherwise sees the raw wraparound rotation.
        R_prev, prev(w.p), prev(w.v), prev(w.bg), prev(w.ba),
        w.R, w.p, w.v,
    )  # (M, 9)
    # Whiten with the FULL 9x9 preintegration covariance (Cholesky factor,
    # matching the reference's CombinedImuFactor noise model,
    # fixed_lag_smoother.cpp:168-229). A sigma floor keeps empty/degenerate
    # windows positive definite; symmetrize against propagation drift.
    cov9 = 0.5 * (pims.cov + jnp.swapaxes(pims.cov, -1, -2))
    cov9 = cov9 + (config.imu_sigma_floor**2) * jnp.eye(9, dtype=dtype)
    L_imu = jnp.linalg.cholesky(cov9)
    r_imu_w = jax.vmap(
        lambda L, rr: jax.scipy.linalg.solve_triangular(L, rr, lower=True)
    )(L_imu, r_imu)
    imu_ok = (win.imu_valid & pair_ok).astype(dtype)[:, None]
    res.append((r_imu_w * imu_ok).reshape(-1))

    # -- bias random walk between consecutive keyposes ------------------------
    dt_pair = jnp.clip(w.timestamps - prev(w.timestamps), 1e-3, None)[:, None]
    rw_g = (w.bg - prev(w.bg)) / (config.bias_rw_gyro_sigma * jnp.sqrt(dt_pair))
    rw_a = (w.ba - prev(w.ba)) / (config.bias_rw_accel_sigma * jnp.sqrt(dt_pair))
    res.append((jnp.concatenate([rw_g, rw_a], axis=1) * imu_ok).reshape(-1))

    # -- depth factors (gravity-axis translation) -----------------------------
    d_pred = jnp.einsum("mi,i->m", w.p, gravity_unit)
    r_depth = (d_pred - win.depth) / config.depth_sigma
    res.append(r_depth * (win.depth_valid & win.valid).astype(dtype))

    # -- range factors --------------------------------------------------------
    # Receiver lever arm (RangeFactorWithTransform / state_ekf.cpp:394-432):
    # the measured range is beacon -> RECEIVER, not beacon -> body origin.
    t_recv = jnp.asarray(config.body_t_receiver, dtype)
    p_recv = w.p + jnp.einsum("mij,j->mi", w.R, t_recv)
    delta_b = win.range_beacons - p_recv[:, None, :]
    dist = jnp.linalg.norm(delta_b + 1e-12, axis=-1)
    r_range = (dist - win.ranges) / config.range_sigma
    if config.range_cauchy_k > 0:
        # Per-measurement Cauchy: a multipath/outlier range saturates
        # instead of dragging the window (see SmootherConfig.range_cauchy_k).
        r_range = r_range / jnp.sqrt(1.0 + (r_range * r_range) / config.range_cauchy_k**2)
    res.append((r_range * (win.range_valid & win.valid[:, None]).astype(dtype)).reshape(-1))

    # -- magnetometer heading factors (MagPoseFactor parity) ------------------
    # Field predicted in the SENSOR frame: (R_world_body·R_body_sensor)^T·nM
    # + bias (mag_pose_factor.hpp:68-72).
    local_field = jnp.asarray(config.mag_local_field, dtype) * config.mag_scale
    R_bs = jnp.asarray(config.mag_body_R_sensor, dtype).reshape(3, 3)
    mag_pred = jnp.einsum("ji,mkj,k->mi", R_bs, w.R, local_field)
    mag_pred = mag_pred + jnp.asarray(config.mag_bias, dtype)
    r_mag = (mag_pred - win.mag) / config.mag_sigma
    res.append((r_mag * (win.mag_valid & win.valid).astype(dtype)[:, None]).reshape(-1))

    # -- absolute pose fix factors (external aiding) ---------------------------
    # 6-DoF unary prior on a keypose from an external absolute fix
    # (fiducial relocalization / USBL / GPS): r = [log(fix_Rᵀ·R), p − fix_p]
    # whitened per-axis by the fix's own sigmas. This is the between-world
    # analog of the reference's one-shot init pose, attached continuously.
    fix_ok = (win.fix_valid & win.valid).astype(dtype)[:, None]
    # AD-safety: masked rows must NOT feed so3_log an arbitrary absolute
    # rotation (fix_R=eye vs a 180° keypose puts the argument at θ=π, where
    # arccos has an infinite derivative and jacfwd's inf·0 mask = NaN —
    # CLAUDE.md AD rule). Substitute the keypose's own rotation so masked
    # rows log ≈identity, inside the θ²-Taylor guard.
    fix_R_eff = jnp.where(win.fix_valid[:, None, None], win.fix_R, w.R)
    r_fix_rot = jax.vmap(so3_log)(jnp.einsum("mji,mjk->mik", fix_R_eff, w.R))
    r_fix = jnp.concatenate([r_fix_rot, w.p - win.fix_p], axis=1)
    res.append((r_fix / jnp.maximum(win.fix_sigma, 1e-9) * fix_ok).reshape(-1))

    # -- landmark projection factors (structureless smart factors) ------------
    if config.max_landmarks > 0:
        fx, fy = config.cam_fx, config.cam_fy
        cx, cy = config.cam_cx, config.cam_cy
        obs_ok = (win.lmk_valid & win.valid[:, None]).astype(dtype)  # (M, L)
        # Only landmarks with >= 2 observations constrain anything.
        n_obs = jnp.sum(obs_ok, axis=0)                               # (L,)
        lmk_ok = (n_obs >= 2.0).astype(dtype)

        # Observations come through the LEFT CAMERA, mounted at body_T_cam
        # (the reference's smart factors carry body_P_cam,
        # smoother.cpp:455-490): camera pose = keypose ∘ body_T_cam.
        R_bc = jnp.asarray(config.body_R_cam, dtype).reshape(3, 3)
        t_bc = jnp.asarray(config.body_t_cam, dtype)
        R_cam = jnp.einsum("mij,jk->mik", w.R, R_bc)                  # (M, 3, 3)
        p_cam = w.p + jnp.einsum("mij,j->mi", w.R, t_bc)              # (M, 3)

        # Bearing rays in world frame per (keypose, landmark).
        xn = (win.lmk_uv[..., 0] - cx) / fx
        yn = (win.lmk_uv[..., 1] - cy) / fy
        dirs_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)    # (M, L, 3)
        dirs_w = jnp.einsum("mij,mlj->mli", R_cam, dirs_cam)
        dirs_w = dirs_w / jnp.maximum(jnp.linalg.norm(dirs_w, axis=-1, keepdims=True), 1e-9)

        # Structureless elimination: the landmark is re-estimated in closed
        # form at every linearization. Observations with stereo disparity
        # give full 3D point measurements (z = fx·b/disp — the reference's
        # stereo smart factors work the same way); the landmark estimate is
        # their masked mean, with a ray-midpoint fallback blended in for
        # mono-only tracks. AD flows through, so the Schur-complement effect
        # on the pose Jacobians is automatic.
        eye3 = jnp.eye(3, dtype=dtype)
        has_disp = (win.lmk_disp > 0).astype(dtype) * obs_ok           # (M, L)
        z_meas = fx * config.cam_baseline / jnp.maximum(win.lmk_disp, 1e-3)
        X_cam_meas = jnp.stack([xn * z_meas, yn * z_meas, z_meas], axis=-1)
        X_meas = p_cam[:, None, :] + jnp.einsum("mij,mlj->mli", R_cam, X_cam_meas)
        n_stereo = jnp.sum(has_disp, axis=0)                           # (L,)
        X_stereo = jnp.sum(X_meas * has_disp[..., None], axis=0) / jnp.maximum(n_stereo, 1.0)[:, None]
        # Ray-midpoint fallback (mono tracks).
        Pm = eye3[None, None] - dirs_w[..., :, None] * dirs_w[..., None, :]
        Pm = Pm * obs_ok[..., None, None]
        A = jnp.sum(Pm, axis=0) + (1e-6 + (1.0 - lmk_ok))[:, None, None] * eye3[None]
        b = jnp.sum(jnp.einsum("mlij,mj->mli", Pm, p_cam), axis=0)
        X_mono = jnp.linalg.solve(A, b[..., None])[..., 0]             # (L, 3)
        X = jnp.where((n_stereo > 0)[:, None], X_stereo, X_mono)

        # Reprojection residuals into every observing keypose.
        X_cam = jnp.einsum("mji,mlj->mli", R_cam, X[None] - p_cam[:, None, :])
        z_cam = X_cam[..., 2]
        behind = z_cam < 0.1
        z_safe = jnp.maximum(z_cam, 0.1)
        u_pred = fx * X_cam[..., 0] / z_safe + cx
        v_pred = fy * X_cam[..., 1] / z_safe + cy
        w_lmk = obs_ok * lmk_ok[None, :] * (~behind).astype(dtype) / config.lmk_sigma_px
        r_u = (u_pred - win.lmk_uv[..., 0]) * w_lmk
        r_v = (v_pred - win.lmk_uv[..., 1]) * w_lmk
        # Stereo row: predicted disparity fx·b/z vs observed — this is what
        # makes the factor STEREO (SmartStereoProjectionPoseFactor) and pins
        # the scale gauge that mono projection factors leave free.
        disp_pred = fx * config.cam_baseline / z_safe
        has_disp = (win.lmk_disp > 0).astype(dtype)
        r_d = (disp_pred - win.lmk_disp) * w_lmk * has_disp
        if config.lmk_cauchy_k > 0:
            # Per-observation Cauchy over the [u, v, disp] residual norm:
            # a mistracked landmark saturates instead of dragging the
            # window (same loss family as the VO rows; the AD flows
            # through the weight like the VO Cauchy).
            n2 = r_u * r_u + r_v * r_v + r_d * r_d
            w_rob = 1.0 / jnp.sqrt(1.0 + n2 / config.lmk_cauchy_k**2)
            r_u, r_v, r_d = r_u * w_rob, r_v * w_rob, r_d * w_rob
        res.append(r_u.reshape(-1))
        res.append(r_v.reshape(-1))
        res.append(r_d.reshape(-1))

    # -- no-motion fallback (neither VO nor IMU between a valid pair) ---------
    nm_ok = (pair_ok & ~win.vo_valid & ~win.imu_valid).astype(dtype)[:, None]
    r_nm = jnp.concatenate(
        [
            jax.vmap(so3_log)(R_rel) / config.no_motion_rot_sigma,
            p_rel / config.no_motion_trans_sigma,
        ],
        axis=1,
    )
    res.append((r_nm * nm_ok).reshape(-1))

    return jnp.concatenate(res)


@functools.lru_cache(maxsize=8)
def _preintegrate_window_jit(calib):
    """One jitted batch-preintegration program per calibration.

    This MUST be cached on the (hashable, frozen) calib: building a fresh
    ``jax.vmap(lambda ...)`` per call re-traces and re-compiles the scan on
    EVERY smoother update (~1 s/keypose on CPU), and the leaked LLVM JIT
    code mappings eventually exhaust vm.max_map_count on long missions
    ("LLVM compilation error: Cannot allocate memory")."""
    from .imu_preintegration import preintegrate

    return jax.jit(
        jax.vmap(lambda s, m, bg, ba: preintegrate(s, m, bg, ba, calib))
    )


def preintegrate_window(win: KeyposeWindow, calib=None) -> PreintegratedImu:
    """Preintegrate each slot's IMU window at the predecessor's bias estimate."""
    from .imu_preintegration import ImuCalibration

    calib = calib or ImuCalibration()
    bg_prev = jnp.roll(win.bg, 1, axis=0)
    ba_prev = jnp.roll(win.ba, 1, axis=0)
    return _preintegrate_window_jit(calib)(
        win.imu_samples, win.imu_mask, bg_prev, ba_prev
    )


class SmootherResult(NamedTuple):
    R: jnp.ndarray           # newest keypose rotation
    p: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    timestamp: jnp.ndarray   # mission-relative seconds (window convention);
    #                          StateEstimator.smoother_state() restores epoch ns
    cov_newest: jnp.ndarray  # (15,15) marginal covariance of newest keypose
    cov_slot1: jnp.ndarray   # (15,15) marginal of slot 1 — the keypose that
    #                          becomes the anchor when the window next slides
    #                          (fixed_lag_smoother.cpp marginals, cpp:430-468)
    error: jnp.ndarray


def solve_window(
    win: KeyposeWindow,
    pims: PreintegratedImu,
    gravity: jnp.ndarray,
    gravity_unit: jnp.ndarray,
    config: SmootherConfig,
    newest_slot: jnp.ndarray,
) -> Tuple[KeyposeWindow, SmootherResult]:
    """Batch Gauss-Newton over the whole window. Jit-safe."""
    M = win.valid.shape[0]
    dtype = win.p.dtype

    def _qr_step(J, r):
        """Damped GN step via QR of the stacked system — cond(J) instead of
        cond(JᵀJ), which keeps the solve healthy in float32 (TPUs have no
        f64). Damping rows: sqrt(λ·diag(JᵀJ) + floor) (Marquardt + absolute
        floor so inactive-slot columns stay invertible)."""
        n = J.shape[1]
        diag_H = jnp.sum(J * J, axis=0)
        damp = jnp.sqrt(config.damping * diag_H + (config.damping + 1e-8))
        A = jnp.concatenate([J, jnp.diag(damp)], axis=0)
        b = jnp.concatenate([-r, jnp.zeros(n, dtype)])
        q, r_mat = jnp.linalg.qr(A)
        delta = jax.scipy.linalg.solve_triangular(r_mat, q.T @ b, lower=False)
        return jnp.where(jnp.isfinite(delta), delta, 0.0), r_mat

    def gn_iter(_, w):
        def res_of(delta_flat):
            return _residuals(
                delta_flat.reshape(M, 15), w, pims, gravity, gravity_unit, config
            )

        delta0 = jnp.zeros(M * 15, dtype)
        r = res_of(delta0)
        J = jax.jacfwd(res_of)(delta0)
        delta, _ = _qr_step(J, r)
        # Freeze invalid slots.
        delta = delta.reshape(M, 15) * w.valid[:, None].astype(dtype)
        return _retract(w, delta)

    w = jax.lax.fori_loop(0, config.iterations, gn_iter, win)

    # Final linearization for covariances: cov = (RᵀR)^-1 from the damped QR.
    def res_of(delta_flat):
        return _residuals(delta_flat.reshape(M, 15), w, pims, gravity, gravity_unit, config)

    r = res_of(jnp.zeros(M * 15, dtype))
    J = jax.jacfwd(res_of)(jnp.zeros(M * 15, dtype))
    # Covariances come from the UNDAMPED linearization (the reference's
    # marginals do too, fixed_lag_smoother.cpp:430-468): the Marquardt rows
    # in _qr_step would bias every marginal small, and the bias compounds
    # through the slot-1 prior chain across hundreds of slides. Only the
    # absolute floor rows are kept, for rank of inactive-slot columns.
    n_cols = J.shape[1]
    floor = jnp.sqrt(jnp.asarray(config.damping + 1e-8, dtype))
    A = jnp.concatenate([J, floor * jnp.eye(n_cols, dtype=dtype)], axis=0)
    r_mat = jnp.linalg.qr(A, mode="r")
    rinv = jax.scipy.linalg.solve_triangular(
        r_mat, jnp.eye(M * 15, dtype=dtype), lower=False
    )
    cov = rinv @ rinv.T

    sl = newest_slot
    cov_new = jax.lax.dynamic_slice(cov, (sl * 15, sl * 15), (15, 15))
    result = SmootherResult(
        R=w.R[sl], p=w.p[sl], v=w.v[sl], bg=w.bg[sl], ba=w.ba[sl],
        timestamp=w.timestamps[sl],
        cov_newest=cov_new,
        cov_slot1=cov[15:30, 15:30],
        error=jnp.sum(r * r),
    )
    return w, result


def slide_window(win: KeyposeWindow, cov_slot1: jnp.ndarray) -> KeyposeWindow:
    """Drop slot 0, shift everything left, anchor the new slot 0 with its
    marginal covariance (prior anchoring)."""
    shift = lambda arr: jnp.roll(arr, -1, axis=0)
    out = win._replace(
        timestamps=shift(win.timestamps), R=shift(win.R), p=shift(win.p),
        v=shift(win.v), bg=shift(win.bg), ba=shift(win.ba), valid=shift(win.valid),
        vo_T=shift(win.vo_T), vo_valid=shift(win.vo_valid),
        imu_samples=shift(win.imu_samples), imu_mask=shift(win.imu_mask),
        imu_valid=shift(win.imu_valid),
        depth=shift(win.depth), depth_valid=shift(win.depth_valid),
        ranges=shift(win.ranges), range_beacons=shift(win.range_beacons),
        range_valid=shift(win.range_valid),
        mag=shift(win.mag), mag_valid=shift(win.mag_valid),
        fix_R=shift(win.fix_R), fix_p=shift(win.fix_p),
        fix_sigma=shift(win.fix_sigma), fix_valid=shift(win.fix_valid),
        lmk_uv=shift(win.lmk_uv), lmk_disp=shift(win.lmk_disp),
        lmk_valid=shift(win.lmk_valid),
    )
    # Invalidate the freed last slot.
    out = out._replace(
        valid=out.valid.at[-1].set(False),
        vo_valid=out.vo_valid.at[-1].set(False),
        imu_valid=out.imu_valid.at[-1].set(False),
        depth_valid=out.depth_valid.at[-1].set(False),
        range_valid=out.range_valid.at[-1].set(False),
        mag_valid=out.mag_valid.at[-1].set(False),
        fix_valid=out.fix_valid.at[-1].set(False),
        lmk_valid=out.lmk_valid.at[-1].set(False),
    )
    # New anchor: slot 0's state with sqrt information from its marginal.
    info = jnp.linalg.inv(cov_slot1 + 1e-9 * jnp.eye(15, dtype=cov_slot1.dtype))
    info = 0.5 * (info + info.T)
    evals, evecs = jnp.linalg.eigh(info)
    sqrt_info = evecs @ jnp.diag(jnp.sqrt(jnp.clip(evals, 0.0, None))) @ evecs.T
    return out._replace(
        prior_sqrt_info=sqrt_info,
        prior_R=out.R[0],
        prior_p=out.p[0],
        prior_v=out.v[0],
        prior_bg=out.bg[0],
        prior_ba=out.ba[0],
    )
