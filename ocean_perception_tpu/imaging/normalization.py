"""Image normalization / tone utilities.

Reference parity: imaging/normalization.{hpp,cpp} — contrast stretch, simple
white balance, gamma conversion, gray-world color correction. All pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_unit(image: jnp.ndarray) -> jnp.ndarray:
    """(I - min) / (max - min) over the whole image (Normalize)."""
    vmin = jnp.min(image)
    vmax = jnp.max(image)
    return (image - vmin) / jnp.maximum(vmax - vmin, 1e-9)


def enhance_contrast(image: jnp.ndarray) -> jnp.ndarray:
    """Per-image dynamic-range stretch (EnhanceContrast)."""
    return normalize_unit(image)


def enhance_contrast_factor(image: jnp.ndarray, factor: float = 1.5) -> jnp.ndarray:
    """Fixed-gain contrast about mid-gray (EnhanceContrastFactor,
    normalization.cpp:72-76): clip(factor*(I - 0.5) + 0.5, 0, 1)."""
    return jnp.clip(factor * (image - 0.5) + 0.5, 0.0, 1.0)


def enhance_contrast_clip(image: jnp.ndarray, vmin: float, vmax: float) -> jnp.ndarray:
    """Clip to [vmin, vmax] then stretch to [0,1] (EnhanceContrastDerya)."""
    clipped = jnp.clip(image, vmin, vmax)
    return (clipped - vmin) / jnp.maximum(vmax - vmin, 1e-9)


def white_balance_simple(image: jnp.ndarray) -> jnp.ndarray:
    """Scale channels so their means match the overall mean (WhiteBalanceSimple)."""
    ch_mean = jnp.mean(image, axis=(0, 1))
    gray = jnp.mean(ch_mean)
    scale = gray / jnp.maximum(ch_mean, 1e-6)
    return jnp.clip(image * scale, 0.0, 1.0)


def correct_color_ratio(image: jnp.ndarray) -> jnp.ndarray:
    """Gray-world normalization: average pixel color → gray (CorrectColorRatio)."""
    ch_mean = jnp.mean(image, axis=(0, 1))
    max_mean = jnp.max(ch_mean)
    scale = max_mean / jnp.maximum(ch_mean, 1e-6)
    return jnp.clip(image * scale, 0.0, 1.0)


def linear_to_gamma(image: jnp.ndarray, gamma_power: float = 0.4545) -> jnp.ndarray:
    return jnp.power(jnp.maximum(image, 0.0), gamma_power)


def gamma_to_linear(image: jnp.ndarray, gamma_power: float = 2.2) -> jnp.ndarray:
    return jnp.power(jnp.maximum(image, 0.0), gamma_power)


def normalize_color_illuminant(image: jnp.ndarray, sigma: float = 15.0) -> jnp.ndarray:
    """Remove the global color cast using a local illuminant estimate
    (NormalizeColorIlluminant): divide by a heavily blurred per-channel
    illuminant and renormalize to gray."""
    from ..ops.image import gaussian_blur

    il = jnp.stack([gaussian_blur(image[..., c], sigma) for c in range(image.shape[-1])], axis=-1)
    out = image / jnp.maximum(il, 1e-3)
    return jnp.clip(out * jnp.mean(il), 0.0, 1.0)


def sharpen(gray: jnp.ndarray, amount: float = 1.0, sigma: float = 1.0) -> jnp.ndarray:
    """Unsharp mask (Sharpen)."""
    from ..ops.image import gaussian_blur

    blurred = gaussian_blur(gray, sigma)
    return jnp.clip(gray + amount * (gray - blurred), 0.0, 1.0)
