"""Local illuminant estimation (Sea-thru LSAC approximation).

Reference parity: imaging/illuminant.cpp — the local space-average color is
a range-guided fast guided filter of the descattered image (or a Gaussian
blur), times the Akkaynak factor of 2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.guided_filter import fast_guided_filter
from ..ops.image import gaussian_blur


def estimate_illuminant_range_guided(
    descattered: jnp.ndarray,
    range_img: jnp.ndarray,
    radius: int,
    eps: float = 0.01,
    subsample: int = 8,
) -> jnp.ndarray:
    """il = 2 · GuidedFilter(range → D)  (illuminant.cpp:24-34)."""
    lsac = fast_guided_filter(range_img, descattered, radius, eps, subsample)
    return 2.0 * lsac


def estimate_illuminant_gaussian(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """il = 2 · GaussianBlur(D)  (illuminant.cpp EstimateIlluminantGaussian)."""
    if image.ndim == 3:
        blurred = jnp.stack(
            [gaussian_blur(image[..., c], sigma) for c in range(image.shape[-1])], axis=-1
        )
    else:
        blurred = gaussian_blur(image, sigma)
    return 2.0 * blurred
