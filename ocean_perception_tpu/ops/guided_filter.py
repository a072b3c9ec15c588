"""Fast guided filter (He & Sun, arXiv 1505.00996) as pure XLA ops.

Parity: imaging/fast_guided_filter.{hpp,cpp} (vendored in the reference) used
range-guided by EstimateIlluminantRangeGuided (illuminant.cpp:24-34). The
fast variant runs the linear-model fit at 1/s resolution (nearest subsample,
box radius r/s), then bilinearly upsamples the (a, b) coefficients and applies
them at full resolution: q = a·I + b.

Guide I is single-channel (the range image); the filtered target p may be
(H, W) or (H, W, C) — channels share the guide, matching the reference's
per-channel filter3 path.
"""

from __future__ import annotations

import jax.numpy as jnp

from .image import box_filter, resize


def fast_guided_filter(
    guide: jnp.ndarray,
    target: jnp.ndarray,
    radius: int,
    eps: float,
    subsample: int = 8,
) -> jnp.ndarray:
    """Edge-preserving smoothing of `target` guided by `guide`.

    radius: box radius at FULL resolution (reference passes r = NextEvenInt
    (2·cols/3), eps=0.01, s=8 from enhance.cpp:59-63).
    """
    H, W = guide.shape[0], guide.shape[1]
    s = max(1, int(subsample))
    h, w = max(2, H // s), max(2, W // s)
    r_small = max(1, int(round(radius / s)))

    # Small-res fit math always runs f32: the full-res target stream may be
    # bf16 (imaging.EnhanceParams.bf16_streams) but box-filter cumsums in
    # bf16 lose the means' low bits.
    I = resize(guide, (h, w), method="nearest").astype(jnp.float32)
    p = resize(target, (h, w), method="nearest").astype(jnp.float32)

    multi = p.ndim == 3
    I_ = I[..., None] if multi else I

    mean_I = box_filter(I, r_small)
    mean_p = box_filter(p, r_small)
    corr_I = box_filter(I * I, r_small)
    corr_Ip = box_filter(I_ * p if multi else I * p, r_small)

    var_I = corr_I - mean_I * mean_I
    mean_I_ = mean_I[..., None] if multi else mean_I
    var_I_ = var_I[..., None] if multi else var_I
    cov_Ip = corr_Ip - mean_I_ * mean_p

    a = cov_Ip / (var_I_ + eps)
    b = mean_p - a * mean_I_

    mean_a = box_filter(a, r_small)
    mean_b = box_filter(b, r_small)

    mean_a = resize(mean_a, (H, W), method="linear")
    mean_b = resize(mean_b, (H, W), method="linear")

    guide_full = guide[..., None] if multi else guide
    return mean_a * guide_full + mean_b
