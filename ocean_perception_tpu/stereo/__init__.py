"""Dense stereo disparity estimation.

Reference parity: src/vehicle/patchmatch_gpu (CUDA PatchMatch — the
centerpiece kernel, SURVEY.md §3.2/§A.2), src/vehicle/stereo_matching (CPU
PatchMatch + cv::StereoSGBM wrapper). One API, several engines:

- ``patchmatch``: faithful PatchMatch semantics (noise → 4 directional
  propagation passes x iters → background mask → L/R occlusion mask) built on
  an integer-disparity cost volume with strip-parallel scans — the TPU analog
  of the CUDA strip decomposition (16 chunks, ±5 halo).
- ``sgm``: semi-global aggregation over the same cost volume (the
  cv::StereoSGBM-equivalent, and the quality/speed default on TPU).
- ``wta``: winner-take-all over the cost volume (block-matching equivalent).

All engines share the exact reference matching cost (X-stencil
alpha·|I| + (1-alpha)·|grad|, A.2) and the background/occlusion mask
semantics. ``ocean_perception_tpu.stereo.oracle`` is a slow numpy
re-derivation of the CUDA algorithm used as numeric ground truth in tests.
"""

from .cost import cost_volume, cost_of_disparity  # noqa: F401
from .patchmatch import PatchMatchParams, patchmatch_disparity  # noqa: F401
from .sgm import SgmParams, sgm_aggregate, sgm_disparity  # noqa: F401
from .api import StereoEngine, estimate_disparity, DisparityResult  # noqa: F401
