"""Dense image operations as fusable XLA ops.

These replace the reference's OpenCV calls (Sobel, boxFilter, morphology,
pyrDown, resize — see SURVEY.md §7). Convolutions use reflect-101 padding to
match OpenCV's BORDER_DEFAULT so parity tests against the reference semantics
hold at borders. All functions take (H, W) or (H, W, C) float32 arrays and
are jit/vmap/grad-safe; none of them touch the host.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_reflect101(image: jnp.ndarray, ry: int, rx: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 (edge pixel not duplicated)."""
    pad = [(ry, ry), (rx, rx)] + [(0, 0)] * (image.ndim - 2)
    return jnp.pad(image, pad, mode="reflect")


def _sep_conv2d(image: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Separable 2D correlation with reflect-101 borders.

    Written as two small dense matmul-free convolutions expressed with shifts
    so XLA fuses them into neighboring elementwise work (no gather).
    """
    ky = np.asarray(ky, dtype=np.float32).reshape(-1)
    kx = np.asarray(kx, dtype=np.float32).reshape(-1)
    ry, rx = len(ky) // 2, len(kx) // 2
    padded = _pad_reflect101(image, ry, rx)
    H, W = image.shape[0], image.shape[1]

    # Vertical pass.
    acc = None
    for i, w in enumerate(ky):
        sl = padded[i : i + H, :]
        term = w * sl
        acc = term if acc is None else acc + term
    # Horizontal pass.
    out = None
    for j, w in enumerate(kx):
        sl = acc[:, j : j + W]
        term = w * sl
        out = term if out is None else out + term
    return out


def sobel_x(image: jnp.ndarray) -> jnp.ndarray:
    """OpenCV Sobel(dx=1, dy=0, ksize=3) parity: smooth [1,2,1]ᵀ ⊗ diff [-1,0,1]."""
    return _sep_conv2d(image, [1.0, 2.0, 1.0], [-1.0, 0.0, 1.0])


def sobel_y(image: jnp.ndarray) -> jnp.ndarray:
    """OpenCV Sobel(dx=0, dy=1, ksize=3) parity."""
    return _sep_conv2d(image, [-1.0, 0.0, 1.0], [1.0, 2.0, 1.0])


def gradient_magnitude(image: jnp.ndarray) -> jnp.ndarray:
    """sqrt(Gx² + Gy²) — parity with patchmatch_gpu GradientMagnitude
    (reference patchmatch_gpu.cu:307-319: Sobel-3 x/y then cu::magnitude)."""
    gx = sobel_x(image)
    gy = sobel_y(image)
    return jnp.sqrt(gx * gx + gy * gy)


def _box_sum_1d(padded: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Windowed sum of width k along `axis` via cumsum difference (O(1)/px)."""
    S = jnp.cumsum(padded, axis=axis)
    zero_shape = list(S.shape)
    zero_shape[axis] = 1
    S0 = jnp.concatenate([jnp.zeros(zero_shape, S.dtype), S], axis=axis)
    n_out = padded.shape[axis] - k + 1
    hi = jax.lax.slice_in_dim(S0, k, k + n_out, axis=axis)
    lo = jax.lax.slice_in_dim(S0, 0, n_out, axis=axis)
    return hi - lo


# Above this radius the integral (cumsum) path replaces the shifted-add
# separable conv: the shift formulation unrolls 2r+1 adds PER AXIS at trace
# time — at the fast-guided-filter's r≈107 that is ~430 full-plane adds per
# box_filter call, which dominated the enhance stage profile
# (examples/profile_b4_enhance.py --slope: illuminant 0.70 ms/frame).
_BOX_SHIFT_MAX_RADIUS = 8


def box_filter(image: jnp.ndarray, radius: int, normalize: bool = True) -> jnp.ndarray:
    """(2r+1)² box sum/mean with reflect-101 borders (cv::boxFilter parity)."""
    k = 2 * radius + 1
    if radius <= _BOX_SHIFT_MAX_RADIUS:
        kk = np.ones(k, dtype=np.float32)
        if normalize:
            kk = kk / kk.sum()
        return _sep_conv2d(image, kk, kk)
    padded = _pad_reflect101(image, radius, radius)
    out = _box_sum_1d(padded, k, 0)
    out = _box_sum_1d(out, k, 1)
    if normalize:
        out = out * np.float32(1.0 / (k * k))
    return out


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    if radius is None:
        radius = max(1, int(round(3.0 * sigma)))
    k = gaussian_kernel1d(sigma, radius)
    return _sep_conv2d(image, k, k)


def _reduce_window_2d(image: jnp.ndarray, ksize: Tuple[int, int], init, op) -> jnp.ndarray:
    """Same-size min/max window reduce with edge padding.

    Rect min/max is separable: two 1-D passes (kh + kw work per pixel
    instead of kh*kw — a 35x35 mesher/seed dilation is ~17x cheaper)."""
    kh, kw = ksize
    ry, rx = kh // 2, kw // 2
    pad_y = [(ry, kh - 1 - ry)] + [(0, 0)] * (image.ndim - 1)
    padded = jnp.pad(image, pad_y, mode="edge")
    window_y = (kh,) + (1,) * (image.ndim - 1)
    strides = (1,) * image.ndim
    out = jax.lax.reduce_window(padded, init, op, window_y, strides, "VALID")
    pad_x = [(0, 0), (rx, kw - 1 - rx)] + [(0, 0)] * (image.ndim - 2)
    padded = jnp.pad(out, pad_x, mode="edge")
    window_x = (1, kw) + (1,) * (image.ndim - 2)
    return jax.lax.reduce_window(padded, init, op, window_x, strides, "VALID")


def dilate(image: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Grayscale dilation, square structuring element (cv::dilate parity)."""
    return _reduce_window_2d(image, (ksize, ksize), -jnp.inf, jax.lax.max).astype(image.dtype)


def erode(image: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Grayscale erosion, square structuring element (cv::erode parity)."""
    return _reduce_window_2d(image, (ksize, ksize), jnp.inf, jax.lax.min).astype(image.dtype)


def morph_gradient(image: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """dilate - erode (cv::morphologyEx MORPH_GRADIENT) — the mesher's
    foreground-texture cue (reference object_mesher.cpp:35-65)."""
    return dilate(image, ksize) - erode(image, ksize)


# cv::pyrDown 5-tap kernel.
_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


@functools.lru_cache(maxsize=32)
def _pyr_decimation_matrix(n: int) -> np.ndarray:
    """(ceil(n/2), n) banded matrix: row i = the 5-tap kernel centered at
    column 2i with reflect-101 edge folding — blur+decimate as one matmul."""
    m = -(-n // 2)
    D = np.zeros((m, n), np.float32)
    for i in range(m):
        for k in range(5):
            j = 2 * i + k - 2
            if n == 1:
                j = 0
            while j < 0 or j >= n:  # multi-reflection for n < 5
                j = -j if j < 0 else 2 * n - 2 - j
            D[i, j] += _PYR_K[k]
    return D


def pyr_down(image: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur (cv::pyrDown 5-tap) then 2x decimation.

    Vertical pass: 5 shifted adds + a stride-2 row slice — local work, so a
    row-sharded image (parallel/sharded_pipeline.py) needs only the halo-2
    exchange. Horizontal pass: banded decimation matmul on the MXU at
    Precision.HIGHEST (exact to ~1e-7 of the shift formulation). The old
    all-shifts + [::2, ::2] version paid a stride-2 relayout on the lane
    (W) axis: 0.487 → 0.084 ms/image at (720, 1280) on the v5e
    (examples/profile_pyr.py; conv_general_dilated measured 0.230 and the
    default-precision MXU path is bf16-truncated — rejected)."""
    H, W = image.shape[0], image.shape[1]
    padded = _pad_reflect101(image, 2, 0)
    acc = None
    for i, w in enumerate(_PYR_K):
        term = w * padded[i : i + H]
        acc = term if acc is None else acc + term
    acc = acc[::2]
    Dh = jnp.asarray(_pyr_decimation_matrix(W))
    hi = jax.lax.Precision.HIGHEST
    if image.ndim == 2:
        return jnp.dot(acc, Dh.T, precision=hi)
    return jnp.einsum("hwc,sw->hsc", acc, Dh, precision=hi)


def image_pyramid(image: jnp.ndarray, num_levels: int) -> Sequence[jnp.ndarray]:
    """List of num_levels images, level 0 = full resolution."""
    levels = [image]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    return levels


def resize(image: jnp.ndarray, shape: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize to (H, W) with half-pixel-center sampling (cv::resize parity)."""
    out_shape = (shape[0], shape[1]) + image.shape[2:]
    return jax.image.resize(image, out_shape, method=method)


def to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """RGB → luma (BT.601 weights, cv::cvtColor RGB2GRAY parity)."""
    if image.ndim == 2:
        return image
    w = jnp.array([0.299, 0.587, 0.114], dtype=image.dtype)
    return image @ w


def compute_intensity(image_rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma intensity — parity with imaging ComputeIntensity (reference
    vision_core/image_util.cpp uses cvtColor BGR2GRAY, i.e. BT.601 luma)."""
    return to_grayscale(image_rgb)
