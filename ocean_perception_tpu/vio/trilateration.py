"""Position trilateration from beacon ranges.

Reference parity: vio/trilateration.{hpp,cpp} — LM with residual
(‖p - b_i‖ - r_i)/sigma_i, Jacobian rows = unit vectors beacon→robot,
covariance from the final Hessian. Requires >= 3 beacons for a fix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.lm import LMConfig, lm_solve


class TrilaterationResult(NamedTuple):
    position: jnp.ndarray    # (3,)
    covariance: jnp.ndarray  # (3,3)
    error: jnp.ndarray
    success: jnp.ndarray


def trilaterate(
    beacons: jnp.ndarray,   # (N, 3) beacon world positions
    ranges: jnp.ndarray,    # (N,)
    sigmas: jnp.ndarray,    # (N,)
    mask: jnp.ndarray,      # (N,) valid measurements
    p0: jnp.ndarray | None = None,
    iters: int = 20,
) -> TrilaterationResult:
    dtype = beacons.dtype
    maskf = mask.astype(dtype)
    if p0 is None:
        denom = jnp.maximum(jnp.sum(maskf), 1.0)
        p0 = jnp.sum(beacons * maskf[:, None], axis=0) / denom

    def residual_jac(p):
        delta = p - beacons
        dist = jnp.linalg.norm(delta, axis=-1)
        unit = delta / jnp.maximum(dist, 1e-9)[:, None]
        r = (dist - ranges) / sigmas * maskf
        J = unit / sigmas[:, None] * maskf[:, None]
        return r, J

    res = lm_solve(residual_jac, p0, LMConfig(max_iters=iters, marquardt_diag=True))
    r, J = residual_jac(res.x)
    H = J.T @ J
    cov = jnp.linalg.inv(H + 1e-9 * jnp.eye(3, dtype=dtype))
    n = jnp.sum(mask.astype(jnp.int32))
    return TrilaterationResult(
        position=res.x, covariance=cov, error=res.error, success=n >= 3
    )
