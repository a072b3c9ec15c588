"""Masked percentile threshold via bisection.

Parity: imaging/backscatter.cpp FindDarkFast (reference :41-80) — find the
intensity threshold t such that ~`percentile` of masked pixels fall below t,
by bounded binary search on t (8 iters → ±0.4%, 10 iters → ±0.1%, per the
reference's accuracy notes). Fully vectorized: each iteration is one masked
count-reduce over the image — ideal VPU shape, no sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_percentile_threshold(
    values: jnp.ndarray,
    mask: jnp.ndarray,
    percentile: float,
    iters: int = 10,
) -> jnp.ndarray:
    """Return threshold t with  frac(values[mask] < t) ≈ percentile.

    `mask` is boolean; empty masks return the value minimum.
    """
    mask_f = mask.astype(values.dtype)
    total = jnp.sum(mask_f)
    big = jnp.asarray(jnp.finfo(values.dtype).max, dtype=values.dtype)
    lo0 = jnp.min(jnp.where(mask, values, big))
    hi0 = jnp.max(jnp.where(mask, values, -big))

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        frac = jnp.sum(jnp.where(values < mid, mask_f, 0.0)) / jnp.maximum(total, 1.0)
        too_many = frac > percentile
        return (jnp.where(too_many, lo, mid), jnp.where(too_many, mid, hi))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    return 0.5 * (lo + hi)
