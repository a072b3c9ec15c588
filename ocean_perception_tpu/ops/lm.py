"""Shared Levenberg-Marquardt solver on fixed-size parameter vectors.

The reference hand-rolls LM four times (backscatter.cpp:83-176,
attenuation.cpp:37-140, optimize_odometry.cpp:99-161, trilateration.cpp) with
slightly different schedules. This module is the single TPU-native driver all
of them share: fixed iteration count (`lax.fori_loop` — XLA-friendly, no
data-dependent trip counts), damped normal equations, accept/reject with
per-use-case lambda schedules and a projection hook for box constraints
(the reference's `cwiseMax(0)` clamps).

The problem supplies ``residual_jac(x) -> (r, J)`` with static shapes
(r: (N,), J: (N, P)); masked rows (weight 0) handle variable sample counts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    max_iters: int = 20
    lambda0_scale: float = 1e-3  # λ₀ = scale · max diag(JᵀJ)  (backscatter.cpp:124)
    lambda_up: float = 2.0       # on rejected step (×2 backscatter, ×4 attenuation)
    lambda_down: float = 3.0     # on accepted step (÷3 in both)
    step_size: float = 1.0       # damped update x ← x + step·δ (reference uses 0.5)
    min_lambda: float = 1e-12
    max_lambda: float = 1e12
    # λ·diag(JᵀJ) damping (Marquardt scaling) instead of the reference's λ·I —
    # converges much faster on ill-scaled problems like the two-exponential
    # attenuation fit; off by default for reference-schedule parity.
    marquardt_diag: bool = False


class LMResult(NamedTuple):
    x: jnp.ndarray
    error: jnp.ndarray       # final mean squared residual (reference's err metric)
    lambda_: jnp.ndarray
    n_accepted: jnp.ndarray


def _mean_sq(r: jnp.ndarray, weight_count: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(r * r) / jnp.maximum(weight_count, 1.0)


def lm_solve(
    residual_jac: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    x0: jnp.ndarray,
    config: LMConfig = LMConfig(),
    project: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    valid_count: Optional[jnp.ndarray] = None,
    error_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> LMResult:
    """Minimize ‖r(x)‖² with LM. All shapes static; jit/vmap safe.

    ``valid_count``: number of live residual rows (masked-out rows must be
    zero in both r and J); used only to normalize the reported error so it
    matches the reference's mean-residual convergence thresholds.

    ``error_fn``: custom accept/reject error metric. The reference's imaging
    fits robust-weight the residual/Jacobian used in the normal equations but
    accept/reject on the *unweighted* mean SSD ("weighting the error is
    misleading", attenuation.cpp) — pass that metric here to match.
    """
    x0 = jnp.asarray(x0)
    r0, J0 = residual_jac(x0)
    count = jnp.asarray(valid_count if valid_count is not None else r0.shape[0], dtype=r0.dtype)
    JtJ0 = J0.T @ J0
    lam0 = config.lambda0_scale * jnp.max(jnp.diag(JtJ0))
    err0 = error_fn(x0) if error_fn is not None else _mean_sq(r0, count)

    def eval_error(x, r):
        return error_fn(x) if error_fn is not None else _mean_sq(r, count)

    def body(_, state):
        x, lam, err, n_acc = state
        r, J = residual_jac(x)
        JtJ = J.T @ J
        Jtr = J.T @ r
        P = x.shape[0]
        if config.marquardt_diag:
            damp = jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12))
        else:
            damp = jnp.eye(P, dtype=x.dtype)
        A = JtJ + lam * damp
        # Solve damped normal equations; protect against singular A.
        delta = jnp.linalg.solve(A, -Jtr)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        x_new = x + config.step_size * delta
        if project is not None:
            x_new = project(x_new)
        r_new, _ = residual_jac(x_new)
        err_new = eval_error(x_new, r_new)
        better = err_new < err
        x = jnp.where(better, x_new, x)
        err = jnp.where(better, err_new, err)
        lam = jnp.where(better, lam / config.lambda_down, lam * config.lambda_up)
        lam = jnp.clip(lam, config.min_lambda, config.max_lambda)
        n_acc = n_acc + better.astype(n_acc.dtype)
        return (x, lam, err, n_acc)

    init = (x0, lam0, err0, jnp.zeros((), dtype=jnp.int32))
    x, lam, err, n_acc = jax.lax.fori_loop(0, config.max_iters, body, init)
    return LMResult(x=x, error=err, lambda_=lam, n_accepted=n_acc)


def gauss_newton_step(
    r: jnp.ndarray, J: jnp.ndarray, damping: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One damped GN step: returns (delta, H). Used by the VIO smoother."""
    H = J.T @ J
    if damping:
        H = H + damping * jnp.eye(H.shape[0], dtype=H.dtype)
    delta = jnp.linalg.solve(H, -(J.T @ r))
    return delta, H
