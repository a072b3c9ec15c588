"""Numpy re-derivation of the reference's imaging LM fits — the test oracle.

Scalar/loop-faithful reimplementation of the reference algorithms with their
exact sampling, weighting, lambda schedules and clamps, used ONLY by tests to
adjudicate the JAX fits' convergence on the real Sea-thru fixtures (the same
methodology as stereo/oracle.py for PatchMatch):

- find_dark_fast             <- imaging/backscatter.cpp:41-80 (binary search)
- estimate_backscatter_oracle <- backscatter.cpp:83-176 + LinearizeImageFormation
  (:176-277): residual = Cauchy-weighted per-pixel channel SSD, analytic
  Jacobian, lambda0 = 1e-3 max diag(JtJ), x2 on worse / /3 on better, step
  0.5, X clamped nonnegative. H is rebuilt fresh each iteration.
- estimate_beta_oracle        <- attenuation.cpp:37-140 + LinearizeBeta
  (:174-250): range-domain residual z - (-log E / beta(z)), uniform-grid
  sampling with 5-px border skip then shuffle+cap, lambda x4 / /3, step 0.5,
  a,c >= 0 and b,d <= 0 clamps. NOTE the reference adds lambda to H's
  diagonal IN PLACE each iteration and only rebuilds H on accept, so damping
  ACCUMULATES across consecutive rejections — reproduced faithfully.

Errors returned are the reference's accept/reject error: mean UNWEIGHTED
channel SSD over the samples (their success thresholds: < 0.1,
enhance.cpp:54,78).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def find_dark_fast(
    intensity: np.ndarray,
    range_img: np.ndarray,
    percentile: float = 0.01,
    iters: int = 8,
) -> Tuple[float, np.ndarray]:
    """Binary-search intensity threshold for the darkest `percentile` of
    pixels with valid range (backscatter.cpp:41-80). Returns (thresh, mask)."""
    N = float(intensity.size)
    n_desired = int(percentile * N)
    range_valid = range_img > 0.1

    low, high = 0.0, 0.5
    thresh = 1.5 * percentile
    mask = (intensity <= thresh) & range_valid
    n_dark = int(mask.sum())
    if n_dark < n_desired:
        low = thresh
    elif n_dark > n_desired:
        high = thresh
    else:
        return thresh, mask
    for _ in range(iters):
        thresh = (high + low) / 2.0
        mask = (intensity <= thresh) & range_valid
        n_dark = int(mask.sum())
        if n_dark < n_desired:
            low = thresh
        elif n_dark > n_desired:
            high = thresh
        else:
            return thresh, mask
    thresh = (high + low) / 2.0
    return thresh, (intensity <= thresh) & range_valid


def _formation_model(z: np.ndarray, X: np.ndarray) -> np.ndarray:
    """I_model = B(1 - e^{-beta_B z}) + Jp e^{-beta_D z}; X = [B, beta_B, Jp,
    beta_D] packed (12,), z (N,). Returns (N, 3)."""
    B, beta_B, Jp, beta_D = X[0:3], X[3:6], X[6:9], X[9:12]
    zz = z[:, None]
    return B * (1.0 - np.exp(-beta_B * zz)) + Jp * np.exp(-beta_D * zz)


def _formation_error(colors: np.ndarray, z: np.ndarray, X: np.ndarray) -> float:
    r_c = colors - _formation_model(z, X)
    return float(np.sum(r_c * r_c, axis=1).mean())


def estimate_backscatter_oracle(
    image: np.ndarray,      # (H, W, 3) float, channel order irrelevant
    range_img: np.ndarray,  # (H, W)
    dark_mask: np.ndarray,  # (H, W) bool
    num_px: int = 256,
    iters: int = 10,
    X0: np.ndarray | None = None,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """EstimateBackscatter per backscatter.cpp:83-176. Returns (X, err)."""
    if X0 is None:
        # enhance.cpp:44-48 initial guess (D5-3374 derived).
        X0 = np.array(
            [0.132, 0.115, 0.0559, 0.358, 0.695, 1.11,
             0.05, 0.05, 0.05, 1.17, 1.23, 0.891]
        )
    ys, xs = np.nonzero(dark_mask)
    idx = np.random.default_rng(seed).permutation(len(ys))[: min(num_px, len(ys))]
    colors = image[ys[idx], xs[idx]].astype(np.float64)      # (N, 3)
    z = range_img[ys[idx], xs[idx]].astype(np.float64)       # (N,)

    def linearize(X):
        B, beta_B, Jp, beta_D = X[0:3], X[3:6], X[6:9], X[9:12]
        zz = z[:, None]
        atten_back = 1.0 - np.exp(-beta_B * zz)
        exp_beta_B = np.exp(-beta_B * zz)
        exp_beta_D = np.exp(-beta_D * zz)
        model = B * atten_back + Jp * exp_beta_D
        r_c = colors - model                                  # (N, 3)
        r = np.sum(r_c * r_c, axis=1)                         # (N,)
        w = 1.0 / (1.0 + r * r)                               # Cauchy on r
        R = w * r
        J = np.concatenate(
            [
                -2.0 * r_c * atten_back,
                -2.0 * r_c * B * zz * exp_beta_B,
                -2.0 * r_c * exp_beta_D,
                2.0 * r_c * Jp * zz * exp_beta_D,
            ],
            axis=1,
        ) * w[:, None]
        err = float(r.mean())
        return J, R, err

    X = np.asarray(X0, np.float64).copy()
    J, R, err_prev = linearize(X)
    lam = 1e-3 * float(np.abs(np.diag(J.T @ J)).max())
    for _ in range(iters):
        H = J.T @ J            # rebuilt fresh each iteration (cpp:135)
        g = -J.T @ R
        H[np.diag_indices(12)] += lam
        dX = 0.5 * np.linalg.lstsq(H, g, rcond=None)[0]
        X_test = np.maximum(X + dX, 0.0)
        err = _formation_error(colors, z, X_test)
        if err > err_prev:
            lam *= 2.0
        else:
            lam /= 3.0
            X = X_test
            J, R, err_prev = linearize(X)
    return X, err_prev


def _beta_of_z(z: np.ndarray, X: np.ndarray) -> np.ndarray:
    a, b, c, d = X[0:3], X[3:6], X[6:9], X[9:12]
    zz = z[:, None]
    return a * np.exp(b * zz) + c * np.exp(d * zz)


def _beta_error(z: np.ndarray, log_E: np.ndarray, X: np.ndarray) -> float:
    beta = np.maximum(_beta_of_z(z, X), 1e-3)
    z_c = -log_E / beta
    r_c = z[:, None] - z_c
    return float(np.sum(r_c * r_c, axis=1).mean())


def _clamp_beta(X: np.ndarray) -> np.ndarray:
    out = X.copy()
    out[0:3] = np.maximum(out[0:3], 0.0)   # a >= 0
    out[6:9] = np.maximum(out[6:9], 0.0)   # c >= 0
    out[3:6] = np.minimum(out[3:6], 0.0)   # b <= 0
    out[9:12] = np.minimum(out[9:12], 0.0)  # d <= 0
    return out


def beta_grid_samples(
    range_img: np.ndarray, illuminant: np.ndarray, num_px: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform-grid sample positions per attenuation.cpp:41-61 (5-px border
    skip, stride from sqrt(4 num_px), valid-range filter, shuffle, cap)."""
    rows, cols = range_img.shape
    px_per_row = int(np.sqrt(4 * num_px))
    stride_x = max(1, (cols - 10) // px_per_row)
    stride_y = max(1, (rows - 10) // px_per_row)
    pts = [
        (y, x)
        for x in range(5, cols - 5, stride_x)
        for y in range(5, rows - 5, stride_y)
        if range_img[y, x] > 1e-3
    ]
    idx = np.random.default_rng(seed).permutation(len(pts))[: min(num_px, len(pts))]
    pts = np.asarray(pts, np.int64)[idx]
    z = range_img[pts[:, 0], pts[:, 1]].astype(np.float64)
    E = illuminant[pts[:, 0], pts[:, 1]].astype(np.float64)
    return z, E


def estimate_beta_oracle(
    range_img: np.ndarray,
    illuminant: np.ndarray,   # (H, W, 3)
    X0: np.ndarray,
    num_px: int = 256,
    iters: int = 20,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """EstimateBeta per attenuation.cpp:37-140. Returns (X, err)."""
    z, E = beta_grid_samples(range_img, illuminant, num_px, seed)
    log_E = np.log(np.maximum(E, 1e-3))

    def linearize(X):
        a, b, c, d = X[0:3], X[3:6], X[6:9], X[9:12]
        zz = z[:, None]
        exp_bz = np.exp(b * zz)
        exp_dz = np.exp(d * zz)
        beta = a * exp_bz + c * exp_dz
        beta_inv = 1.0 / np.maximum(beta, 1e-3)
        beta2_inv = 1.0 / np.maximum(beta * beta, 1e-3)
        z_c = -log_E * beta_inv
        r_c = zz - z_c
        r = np.sum(r_c * r_c, axis=1)
        w = 1.0 / (1.0 + r * r)
        R = w * r
        outer = -2.0 * r_c * log_E * beta2_inv
        J = np.concatenate(
            [outer * exp_bz, outer * zz * a * exp_bz,
             outer * exp_dz, outer * zz * c * exp_dz],
            axis=1,
        ) * w[:, None]
        H = J.T @ J
        g = -J.T @ R
        return H, g, float(r.mean())

    X = _clamp_beta(np.asarray(X0, np.float64))
    H, g, err_prev = linearize(X)
    lam = 1e-3 * float(np.abs(np.diag(H)).max())
    for _ in range(iters):
        # In-place diagonal bump: damping accumulates over consecutive
        # rejections until the next accept rebuilds H (attenuation.cpp:90).
        H[np.diag_indices(12)] += lam
        dX = 0.5 * np.linalg.lstsq(H, g, rcond=None)[0]
        X_test = _clamp_beta(X + dX)
        err = _beta_error(z, log_E, X_test)
        if err > err_prev:
            lam *= 4.0
        else:
            lam /= 3.0
            X = X_test
            H, g, err_prev = linearize(X)
    return X, err_prev
