"""Foreground texture mask via morphological gradient.

Reference parity: mesher/object_mesher.cpp EstimateForegroundMask (:35-65) —
downsample by `downsize`, morphological gradient with a (2·ksize/downsize+1)
square element, threshold at min_gradient, upsample back. Images here are
float [0,1], so min_gradient is on the 0..255 scale and rescaled internally
to preserve the reference's config values (e.g. foreground_min_gradient: 20).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.image import morph_gradient, resize


def estimate_foreground_mask(
    gray: jnp.ndarray,
    ksize: int = 15,
    min_gradient: float = 20.0,
    downsize: int = 4,
) -> jnp.ndarray:
    """Boolean (H, W) mask of textured (object) regions."""
    H, W = gray.shape
    scaled_ksize = max(2, ksize // downsize)
    kwidth = 2 * scaled_ksize + 1
    small = resize(gray, (H // downsize, W // downsize), method="linear") if downsize > 1 else gray
    grad = morph_gradient(small, kwidth)
    mask_small = grad > (min_gradient / 255.0)
    if downsize > 1:
        mask = resize(mask_small.astype(jnp.float32), (H, W), method="linear") > 0.5
    else:
        mask = mask_small
    return mask
