"""Backscatter estimation and removal (Sea-thru stage 1).

Reference parity: imaging/backscatter.cpp —
- FindDarkFast (:41-80): 1st-percentile intensity threshold among pixels with
  valid range, via bounded bisection (here: ops.histogram, one reduce per
  iteration instead of countNonZero).
- EstimateBackscatter (:83-176): LM over 12 params X=[B, beta_B, J', beta_D']
  on <=num_px sampled dark pixels; residual per sample = channel SSD with
  Cauchy weight w=1/(1+r^2) applied to both residual and analytic Jacobian;
  lambda schedule x2 / ÷3, step 0.5, X clamped nonnegative; accept/reject on
  the unweighted mean SSD.
- RemoveBackscatter (:280-311): D = max(I - B(1-exp(-beta_B z)), 0), zero
  ranges defaulted to 20 m.

TPU design notes: pixel sampling uses a hash-ranked top-k over the dark mask
(static shapes, deterministic given the image) instead of random_shuffle;
masked-out sample rows carry zero weight so the normal equations are exact
for the live rows.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.histogram import masked_percentile_threshold
from ..ops.image import compute_intensity
from ..ops.lm import LMConfig, lm_solve

BACKGROUND_RANGE = 20.0  # meters; backscatter.cpp kBackgroundRange
MIN_VALID_RANGE = 0.1    # meters; pixels closer than this have no range signal


def find_dark_mask(
    intensity: jnp.ndarray,
    range_img: jnp.ndarray,
    percentile: float = 0.01,
    iters: int = 10,
) -> jnp.ndarray:
    """Boolean mask of the darkest `percentile` of valid-range pixels."""
    valid = range_img > MIN_VALID_RANGE
    thresh = masked_percentile_threshold(intensity, valid, percentile, iters)
    return jnp.logical_and(valid, intensity < thresh)


def _hash_rank(n: int) -> jnp.ndarray:
    """Deterministic pseudo-random ranking of flat pixel indices (Knuth hash).

    Replaces the reference's std::random_shuffle sample selection with a
    static-shape, reproducible ordering.
    """
    idx = jnp.arange(n, dtype=jnp.uint32)
    return (idx * jnp.uint32(2654435761)) ^ (idx >> 16)


def sample_masked_pixels(
    image: jnp.ndarray,
    range_img: jnp.ndarray,
    mask: jnp.ndarray,
    num_px: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick up to num_px pixels from `mask`: returns (rgb (N,3), z (N,), valid (N,)).

    Selection is a lattice-bucketed hash-argmax: pixel (r, c) belongs to
    bucket (r mod s1, c mod s2) with s1*s2 = num_px (16x16 for the default
    256), and each bucket contributes its masked pixel of highest hash
    rank. Any dark region larger than one s1 x s2 tile therefore touches
    every bucket — spatial clustering (and the column aliasing a strided
    i % num_px scheme suffers when W is a multiple of num_px) cannot
    starve the sample. One max-reduce over the image instead of a full
    921k-element sort: the previous `lax.top_k` formulation measured
    ~2.6 ms/frame at (720, 1280) B=4 on the v5e — a third of the whole
    perception step (examples/profile_b4_enhance.py). Deterministic,
    backend-independent, and the sample population is the same
    pseudo-random-over-dark-pixels design (the reference uses
    std::random_shuffle; backscatter.cpp:83-109).
    """
    H, W = range_img.shape
    n = H * W
    s1 = int(num_px**0.5)
    while num_px % s1:
        s1 -= 1
    s2 = num_px // s1
    hb, wb = -(-H // s1), -(-W // s2)
    rank = _hash_rank(n).reshape(H, W)
    # Masked-out pixels score -1; hash >> 1 keeps scores in int32 range.
    score = jnp.where(mask, (rank >> 1).astype(jnp.int32), jnp.int32(-1))
    score = jnp.pad(score, ((0, hb * s1 - H), (0, wb * s2 - W)), constant_values=-1)
    # (s1, s2, hb, wb) → bucket (a, b) holds pixels (a + i*s1, b + j*s2).
    tiles = score.reshape(hb, s1, wb, s2).transpose(1, 3, 0, 2).reshape(num_px, hb * wb)
    j = jnp.argmax(tiles, axis=1)                             # (num_px,)
    valid = jnp.take_along_axis(tiles, j[:, None], axis=1)[:, 0] >= 0
    b = jnp.arange(num_px, dtype=j.dtype)
    rp = (j // wb) * s1 + b // s2
    cp = (j % wb) * s2 + b % s2
    idx = jnp.minimum(rp, H - 1) * W + jnp.minimum(cp, W - 1)
    rgb = image.reshape(-1, 3)[idx]
    z = range_img.reshape(-1)[idx]
    return rgb, z, valid


class BackscatterFit(NamedTuple):
    B: jnp.ndarray         # (3,)
    beta_B: jnp.ndarray    # (3,)
    Jp: jnp.ndarray        # (3,)
    beta_Dp: jnp.ndarray   # (3,)
    error: jnp.ndarray     # mean channel-SSD over samples


def _pack(B, beta_B, Jp, beta_Dp):
    return jnp.concatenate([B, beta_B, Jp, beta_Dp])


def _residual_terms(X: jnp.ndarray, rgb: jnp.ndarray, z: jnp.ndarray):
    """Per-sample channel residuals and model terms."""
    B, beta_B, Jp, beta_Dp = X[0:3], X[3:6], X[6:9], X[9:12]
    zz = z[:, None]
    atten_back = 1.0 - jnp.exp(-beta_B * zz)         # (N,3)
    exp_beta_D = jnp.exp(-beta_Dp * zz)              # (N,3)
    model = B * atten_back + Jp * exp_beta_D
    r_c = rgb - model                                 # (N,3)
    return r_c, atten_back, exp_beta_D


def estimate_backscatter(
    image: jnp.ndarray,
    range_img: jnp.ndarray,
    dark_mask: jnp.ndarray,
    num_px: int = 256,
    iters: int = 10,
    B0=None,
    beta_B0=None,
    Jp0=None,
    beta_Dp0=None,
) -> BackscatterFit:
    """Fit the 12-parameter backscatter model to sampled dark pixels."""
    from .formation import B_DEFAULT, BETA_B_DEFAULT, BETA_DP_DEFAULT, JP_DEFAULT

    B0 = jnp.asarray(B_DEFAULT if B0 is None else B0, jnp.float32)
    beta_B0 = jnp.asarray(BETA_B_DEFAULT if beta_B0 is None else beta_B0, jnp.float32)
    Jp0 = jnp.asarray(JP_DEFAULT if Jp0 is None else Jp0, jnp.float32)
    beta_Dp0 = jnp.asarray(BETA_DP_DEFAULT if beta_Dp0 is None else beta_Dp0, jnp.float32)

    rgb, z, valid = sample_masked_pixels(image, range_img, dark_mask, num_px)
    w_valid = valid.astype(jnp.float32)
    n_valid = jnp.sum(w_valid)

    def residual_jac(X):
        r_c, atten_back, exp_beta_D = _residual_terms(X, rgb, z)
        r = jnp.sum(r_c * r_c, axis=-1)               # (N,) scalar SSD residual
        w = 1.0 / (1.0 + r * r) * w_valid             # Cauchy weight, masked
        zz = z[:, None]
        B = X[0:3]
        Jp = X[6:9]
        exp_beta_B = jnp.exp(-X[3:6] * zz)
        # Analytic dr/dX (backscatter.cpp LinearizeImageFormation).
        J_B = -2.0 * r_c * atten_back                  # (N,3)
        J_beta_B = -2.0 * r_c * B * zz * exp_beta_B
        J_Jp = -2.0 * r_c * exp_beta_D
        J_beta_Dp = 2.0 * r_c * Jp * zz * exp_beta_D
        J = jnp.concatenate([J_B, J_beta_B, J_Jp, J_beta_Dp], axis=-1)  # (N,12)
        return w * r, w[:, None] * J

    def error_fn(X):
        r_c, _, _ = _residual_terms(X, rgb, z)
        r = jnp.sum(r_c * r_c, axis=-1) * w_valid
        return jnp.sum(r) / jnp.maximum(n_valid, 1.0)

    result = lm_solve(
        residual_jac,
        _pack(B0, beta_B0, Jp0, beta_Dp0),
        LMConfig(max_iters=iters, lambda0_scale=1e-3, lambda_up=2.0, lambda_down=3.0,
                 step_size=1.0, marquardt_diag=True),
        project=lambda X: jnp.maximum(X, 0.0),
        valid_count=n_valid,
        error_fn=error_fn,
    )
    X = result.x
    return BackscatterFit(X[0:3], X[3:6], X[6:9], X[9:12], result.error)


def remove_backscatter(
    image: jnp.ndarray,
    range_img: jnp.ndarray,
    B: jnp.ndarray,
    beta_B: jnp.ndarray,
) -> jnp.ndarray:
    """D = max(I - B(1 - exp(-beta_B z)), 0); zero ranges → 20 m background."""
    z = jnp.where(range_img > 1e-3, range_img, BACKGROUND_RANGE)
    scatter = B * (1.0 - jnp.exp(-beta_B * z[..., None]))
    return jnp.maximum(image - scatter, 0.0)
