"""Kernel library: jnp/XLA image ops, solvers, and Pallas TPU kernels.

This is the layer the reference implements with OpenCV + CUDA; here every op
is a pure JAX function (fusable under one jit) or a Pallas kernel. Image
convention: float32, (H, W) grayscale or (H, W, 3) RGB in [0, 1]; batches add
leading axes via vmap.
"""

from .image import (  # noqa: F401
    sobel_x,
    sobel_y,
    gradient_magnitude,
    box_filter,
    gaussian_blur,
    erode,
    dilate,
    morph_gradient,
    pyr_down,
    resize,
    image_pyramid,
)
from .interp import bilinear_sample, sample_patches_bilinear  # noqa: F401
from .lm import lm_solve, LMConfig  # noqa: F401
from .histogram import masked_percentile_threshold  # noqa: F401
from .guided_filter import fast_guided_filter  # noqa: F401
