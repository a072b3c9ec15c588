"""Subpixel sampling primitives.

Two regimes, chosen for TPU cost:
- ``bilinear_sample``: arbitrary scattered points via gather — fine for a few
  hundred keypoints (tracking front-end), poison for dense per-pixel use.
- ``sample_patches_bilinear``: separable bilinear patch extraction expressed
  as two small matmuls per patch (MXU-friendly) — the workhorse of the LK
  tracker where each keypoint resamples a window every iteration.

Border semantics: coordinates are clamped to the valid interior, matching the
reference's GetSubpixel behavior at edges (patchmatch_gpu.cu:18-42 reads
clamped/padded GpuMats).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample image at float (y, x); clamps to borders.

    Parity: patchmatch_gpu.cu GetSubpixel (floor/ceil corners, lerp rows then
    cols). Works on (H, W) or (H, W, C) images; y/x broadcast to any shape.
    """
    H, W = image.shape[0], image.shape[1]
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ty = (y - y0.astype(y.dtype))
    tx = (x - x0.astype(x.dtype))
    if image.ndim == 3:
        ty = ty[..., None]
        tx = tx[..., None]
    c00 = image[y0, x0]
    c01 = image[y0, x1]
    c10 = image[y1, x0]
    c11 = image[y1, x1]
    c0 = (1.0 - ty) * c00 + ty * c10
    c1 = (1.0 - ty) * c01 + ty * c11
    return (1.0 - tx) * c0 + tx * c1


def _axis_weights(center: jnp.ndarray, size: int, window: int, dtype) -> jnp.ndarray:
    """(size, window) bilinear weight matrix for 1D resampling.

    Row i holds the two-tap weights selecting position center + i - size//2
    from a length-`window` source axis. Built with comparisons against iota
    (no gather), so the 2D patch sample is W_y @ patch @ W_xᵀ.
    """
    offs = jnp.arange(size, dtype=dtype) - (size // 2)
    pos = jnp.clip(center + offs, 0.0, window - 1.0)  # (size,)
    p0 = jnp.floor(pos)
    t = pos - p0
    src = jnp.arange(window, dtype=dtype)  # (window,)
    is0 = (src[None, :] == p0[:, None]).astype(dtype)
    is1 = (src[None, :] == jnp.minimum(p0 + 1.0, window - 1.0)[:, None]).astype(dtype)
    # When p0 == window-1 both taps hit the same column; combine weights.
    return is0 * (1.0 - t)[:, None] + is1 * t[:, None]


def sample_patches_bilinear(
    window: jnp.ndarray,
    center_y: jnp.ndarray,
    center_x: jnp.ndarray,
    patch_h: int,
    patch_w: int,
) -> jnp.ndarray:
    """Extract a (patch_h, patch_w) patch around a float center of `window`.

    `window` is a small (Hw, Ww) array already resident in registers/VMEM
    (e.g. a per-keypoint search window). The bilinear interpolation is
    separable, so the patch is W_y @ window @ W_xᵀ: two (patch, window)-sized
    matmuls instead of 4·patch_h·patch_w gathers. vmap over keypoints for the
    batched version.
    """
    dtype = window.dtype
    Wy = _axis_weights(center_y, patch_h, window.shape[0], dtype)  # (ph, Hw)
    Wx = _axis_weights(center_x, patch_w, window.shape[1], dtype)  # (pw, Ww)
    return Wy @ window @ Wx.T
