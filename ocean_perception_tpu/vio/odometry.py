"""LM odometry: optimize relative pose T_10 from 3D(frame0)↔2D(frame1) points.

Reference parity: vio/optimize_odometry.cpp —
- residual r_i = |p_obs - project(T_10 · P0)| / sigma with Cauchy weight
  w = 1/(1+r²) applied to residual and Jacobian rows;
- analytic 6-DoF Jacobian in the left-multiplicative convention
  T ← expmap_se3(eps) · T (Blanco SE(3) tech report p.54 form);
- LM with Marquardt diag damping, lambda0 = 8e-2, x2 / ÷3 schedule;
- covariance C = H^{-1};
- two-stage OptimizeOdometryIterative: solve, drop outliers with residual
  > max_err_stdevs·sigma, refine; < 6 inliers → failure with identity pose.

TPU design: fixed-size point arrays with validity masks; the whole two-stage
optimization is one jittable function (outlier removal = reweighting the
mask, not resizing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.cameras import StereoCamera
from ..core.se3 import se3_exp


@struct.dataclass
class OdometryParams:
    max_iters: int = struct.field(pytree_node=False, default=20)
    lambda0: float = struct.field(pytree_node=False, default=8e-2)
    lambda_up: float = struct.field(pytree_node=False, default=2.0)
    lambda_down: float = struct.field(pytree_node=False, default=3.0)
    max_error_stdevs: float = struct.field(pytree_node=False, default=3.0)
    min_inliers: int = struct.field(pytree_node=False, default=6)


class OdometryResult(NamedTuple):
    T_10: jnp.ndarray        # (4,4) pose of frame0 in frame1
    covariance: jnp.ndarray  # (6,6)
    error: jnp.ndarray       # mean residual (sigmas)
    n_inliers: jnp.ndarray   # int32
    success: jnp.ndarray     # bool


def _linearize(P0, p_obs, sigma, mask, fx, fy, cx, cy, T):
    """Residuals/Jacobian for all points; masked rows are zero.

    2-D pixel residuals per point (2N rows) with a Cauchy weight on the
    residual norm. The reference linearizes the scalar norm |r| directly
    (optimize_odometry.cpp:205-227); that form has a spurious null space
    whenever one residual component vanishes (e.g. pure-x image motion),
    which float32 — the only dtype TPUs have — turns into divergence. The
    2-D form is the standard BA Jacobian: same minimum, same robust
    weighting, well-conditioned in f32.
    """
    P1 = (T[:3, :3] @ P0.T).T + T[:3, 3]
    gz = jnp.maximum(P1[:, 2], 1e-5)
    u = fx * P1[:, 0] / gz + cx
    v = fy * P1[:, 1] / gz + cy
    rx = p_obs[:, 0] - u
    ry = p_obs[:, 1] - v
    r = jnp.sqrt(rx * rx + ry * ry)
    r_sigma = r / sigma
    w = jnp.sqrt(1.0 / (1.0 + r_sigma * r_sigma)) * mask  # sqrt: applied to rows of a 2-norm
    scale = w / sigma

    gx, gy = P1[:, 0], P1[:, 1]
    gz2 = gz * gz
    zeros = jnp.zeros_like(gz)
    # d(u)/d(eps) for the left-multiplicative update T ← exp(eps)·T.
    Ju = jnp.stack(
        [fx / gz, zeros, -fx * gx / gz2,
         -fx * gx * gy / gz2, fx * (1.0 + gx * gx / gz2), -fx * gy / gz],
        axis=-1,
    )
    Jv = jnp.stack(
        [zeros, fy / gz, -fy * gy / gz2,
         -fy * (1.0 + gy * gy / gz2), fy * gx * gy / gz2, fy * gx / gz],
        axis=-1,
    )
    # Residual rows = scale·(obs - proj); J = d(residual)/d(eps) = -scale·Jproj.
    J = jnp.concatenate([-scale[:, None] * Ju, -scale[:, None] * Jv], axis=0)
    R = jnp.concatenate([scale * rx, scale * ry])
    n = jnp.maximum(jnp.sum(mask), 1.0)
    err = jnp.sum(r_sigma * mask) / n
    return J, R, err, r_sigma


def _lm(P0, p_obs, sigma, mask, rig: StereoCamera, T0, p: OdometryParams):
    fx, fy = rig.left.fx, rig.left.fy
    cx, cy = rig.left.cx, rig.left.cy

    def error_of(T):
        _, _, err, _ = _linearize(P0, p_obs, sigma, mask, fx, fy, cx, cy, T)
        return err

    J0, R0, err0, _ = _linearize(P0, p_obs, sigma, mask, fx, fy, cx, cy, T0)

    def body(_, state):
        T, lam, err = state
        J, R, _, _ = _linearize(P0, p_obs, sigma, mask, fx, fy, cx, cy, T)
        # Augmented least squares solved by QR instead of normal equations:
        # cond(J) = sqrt(cond(JᵀJ)), which keeps the near-degenerate planar
        # cases solvable in float32 (TPUs have no f64). Marquardt damping rows
        # sqrt(λ)·sqrt(diag(JᵀJ)) appended as pseudo-measurements.
        diag_H = jnp.sum(J * J, axis=0)
        damp = jnp.sqrt(lam * jnp.maximum(diag_H, 1e-12))
        A = jnp.concatenate([J, jnp.diag(damp)], axis=0)
        b = jnp.concatenate([-R, jnp.zeros(6, dtype=T.dtype)])
        q, r_mat = jnp.linalg.qr(A)
        eps = jax.scipy.linalg.solve_triangular(r_mat, q.T @ b, lower=False)
        eps = jnp.where(jnp.all(jnp.isfinite(eps)), eps, jnp.zeros_like(eps))
        T_test = se3_exp(eps) @ T
        err_new = error_of(T_test)
        better = err_new < err
        T = jnp.where(better, T_test, T)
        lam = jnp.where(better, lam / p.lambda_down, lam * p.lambda_up)
        err = jnp.where(better, err_new, err)
        return (T, lam, err)

    T, _, err = jax.lax.fori_loop(
        0, p.max_iters, body, (T0, jnp.asarray(p.lambda0, T0.dtype), err0)
    )
    J, R, err, r_sigma = _linearize(P0, p_obs, sigma, mask, fx, fy, cx, cy, T)
    H = J.T @ J
    cov = jnp.linalg.inv(H + 1e-9 * jnp.eye(6, dtype=T.dtype))
    return T, cov, err, r_sigma


def optimize_odometry(
    P0: jnp.ndarray,       # (N, 3) landmarks in frame-0 camera coordinates
    p_obs: jnp.ndarray,    # (N, 2) observed pixels in frame 1
    sigmas: jnp.ndarray,   # (N,) pixel noise
    mask: jnp.ndarray,     # (N,) valid correspondences
    rig: StereoCamera,
    T_init: jnp.ndarray | None = None,
    params: OdometryParams = OdometryParams(),
) -> OdometryResult:
    """Two-stage robust pose solve (OptimizeOdometryIterative parity)."""
    dtype = P0.dtype
    T0 = jnp.eye(4, dtype=dtype) if T_init is None else T_init
    maskf = mask.astype(dtype)

    T1, cov1, err1, r_sigma = _lm(P0, p_obs, sigmas, maskf, rig, T0, params)
    # Outlier rejection: residual beyond max_err_stdevs sigmas.
    inlier = maskf * (r_sigma <= params.max_error_stdevs).astype(dtype)
    T2, cov2, err2, _ = _lm(P0, p_obs, sigmas, inlier, rig, T1, params)

    n_inliers = jnp.sum(inlier).astype(jnp.int32)
    success = n_inliers >= params.min_inliers
    eye = jnp.eye(4, dtype=dtype)
    T_final = jnp.where(success, T2, eye)
    cov_final = jnp.where(success, cov2, jnp.eye(6, dtype=dtype) * 1e9)
    return OdometryResult(
        T_10=T_final, covariance=cov_final, error=err2, n_inliers=n_inliers, success=success
    )
