"""Wideband attenuation estimation and correction (Sea-thru stage 2).

Reference parity: imaging/attenuation.cpp —
- EstimateBeta (:37-140): fit beta_D(z) = a·e^{bz} + c·e^{dz} (12 params over
  RGB) by LM on <=num_px grid-sampled pixels with valid range. The residual
  is in the *range domain*: predicted z_c = -log(E_c)/beta_D_c(z) vs observed
  z, channel SSD, Cauchy-weighted normal equations but unweighted
  accept/reject error. lambda x4 / ÷3, step 0.5; a,c clamped >= 0 and
  b,d <= 0 each step.
- CorrectAttenuation (:256-299): J = E-domain multiply
  out = D · exp(beta_D(z)·z), with zero ranges set to the image max range.

TPU design: grid sampling is a static strided slice + validity mask (the
reference shuffles a host vector; sample *positions* match its uniform grid
with 5-px border skip).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.lm import LMConfig, lm_solve
from .formation import beta_d_of_z


def _grid_samples(
    range_img: jnp.ndarray, illuminant: jnp.ndarray, num_px: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform-grid sample of (z, E, valid), static shape (num_px,·)."""
    H, W = range_img.shape
    px_per_row = max(1, int((4 * num_px) ** 0.5))
    stride_y = max(1, (H - 10) // px_per_row)
    stride_x = max(1, (W - 10) // px_per_row)
    ys = jnp.arange(5, H - 5, stride_y)
    xs = jnp.arange(5, W - 5, stride_x)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    yy = yy.reshape(-1)
    xx = xx.reshape(-1)
    # Cap/pad to num_px rows (static shape). The reference random-shuffles
    # before capping; an even stride over the grid keeps the same spatial/z
    # diversity deterministically.
    n = yy.shape[0]
    if n >= num_px:
        stride = n // num_px
        sel = (jnp.arange(num_px) * stride).astype(jnp.int32)
        yy, xx = yy[sel], xx[sel]
        n = num_px
    z = range_img[yy, xx]
    E = illuminant[yy, xx]
    valid = z > 1e-3
    if n < num_px:
        pad = num_px - n
        z = jnp.pad(z, (0, pad))
        E = jnp.pad(E, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    return z, E, valid


class BetaFit(NamedTuple):
    X: jnp.ndarray      # (12,) [a, b, c, d] packed per RGB channel
    error: jnp.ndarray  # mean range-domain SSD


def _clamp_beta(X: jnp.ndarray) -> jnp.ndarray:
    """a,c >= 0; b,d <= 0 (attenuation.cpp:98-105, enhance.cpp:70-76)."""
    return jnp.concatenate(
        [
            jnp.maximum(X[0:3], 0.0),
            jnp.minimum(X[3:6], 0.0),
            jnp.maximum(X[6:9], 0.0),
            jnp.minimum(X[9:12], 0.0),
        ]
    )


def estimate_beta(
    range_img: jnp.ndarray,
    illuminant: jnp.ndarray,
    num_px: int = 256,
    iters: int = 20,
    X0: jnp.ndarray | None = None,
) -> BetaFit:
    from .formation import BETA_GUESS_1

    X0 = jnp.asarray(BETA_GUESS_1 if X0 is None else X0, jnp.float32)
    X0 = _clamp_beta(X0)
    z, E, valid = _grid_samples(range_img, illuminant, num_px)
    w_valid = valid.astype(jnp.float32)
    n_valid = jnp.sum(w_valid)
    log_E = jnp.log(jnp.maximum(E, 1e-3))  # (N,3)

    def terms(X):
        a, b, c, d = X[0:3], X[3:6], X[6:9], X[9:12]
        zz = z[:, None]
        exp_bz = jnp.exp(b * zz)
        exp_dz = jnp.exp(d * zz)
        beta = a * exp_bz + c * exp_dz
        beta_inv = 1.0 / jnp.maximum(beta, 1e-3)
        z_pred = -log_E * beta_inv
        r_c = z[:, None] - z_pred  # (N,3)
        return r_c, exp_bz, exp_dz, beta

    def residual_jac(X):
        a, c = X[0:3], X[6:9]
        r_c, exp_bz, exp_dz, beta = terms(X)
        r = jnp.sum(r_c * r_c, axis=-1)
        w = 1.0 / (1.0 + r * r) * w_valid
        zz = z[:, None]
        beta2_inv = 1.0 / jnp.maximum(beta * beta, 1e-3)
        outer = -2.0 * r_c * log_E * beta2_inv  # (N,3)
        J_a = outer * exp_bz
        J_b = outer * zz * a * exp_bz
        J_c = outer * exp_dz
        J_d = outer * zz * c * exp_dz
        J = jnp.concatenate([J_a, J_b, J_c, J_d], axis=-1)
        return w * r, w[:, None] * J

    def error_fn(X):
        r_c, _, _, _ = terms(X)
        r = jnp.sum(r_c * r_c, axis=-1) * w_valid
        return jnp.sum(r) / jnp.maximum(n_valid, 1.0)

    result = lm_solve(
        residual_jac,
        X0,
        # Reference schedule is λI damping with step 0.5 (attenuation.cpp);
        # Marquardt diag scaling with full steps reaches the same minima in
        # ~4x fewer iterations on this ill-scaled fit, so it is the default.
        LMConfig(max_iters=iters, lambda0_scale=1e-3, lambda_up=4.0, lambda_down=3.0,
                 step_size=1.0, marquardt_diag=True),
        project=_clamp_beta,
        valid_count=n_valid,
        error_fn=error_fn,
    )
    return BetaFit(result.x, result.error)


def estimate_beta_multi_start(
    range_img: jnp.ndarray,
    illuminant: jnp.ndarray,
    guesses: jnp.ndarray,   # (G, 12) initial guesses
    num_px: int = 256,
    iters: int = 20,
) -> BetaFit:
    """Run the LM fit from several initial guesses and keep the best.

    The 2-exponential model's convergence depends strongly on the per-site
    initial guess (attenuation.hpp:12-29: BetaInitialGuess1 for D1-D3,
    BetaInitialGuess2 for D5 — the reference requires choosing manually).
    The fit is a tiny 12-parameter problem, so running every guess vmapped
    and keeping the lowest-error result costs almost nothing and removes
    the manual site selection."""
    fits = jax.vmap(
        lambda g: estimate_beta(range_img, illuminant, num_px=num_px, iters=iters, X0=g)
    )(jnp.asarray(guesses, jnp.float32))
    best = jnp.argmin(fits.error)
    return BetaFit(fits.X[best], fits.error[best])


def correct_attenuation(
    image: jnp.ndarray, range_img: jnp.ndarray, X: jnp.ndarray
) -> jnp.ndarray:
    """J = D · exp(beta_D(z)·z); zero ranges → per-image max range.

    The exponent is clamped at 60: a diverged beta fit (large a,c with b,d
    near 0) can otherwise push beta·z past ~88 where exp() overflows f32 to
    inf and poisons downstream stats. e^60 ≈ 1e26 keeps failure visible
    (absurdly bright) without producing non-finite pixels."""
    zmax = jnp.max(range_img)
    z = jnp.where(range_img > 0.0, range_img, zmax)
    E = jnp.exp(jnp.minimum(beta_d_of_z(X, z) * z[..., None], 60.0))
    return image * E
