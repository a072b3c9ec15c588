"""Underwater image enhancement (Sea-thru variant), fully on-device.

Reference parity: src/vehicle/imaging (enhance.cpp orchestration; see
SURVEY.md §A.1 for the numeric contracts). The whole pipeline —
dark-pixel search, 12-param backscatter LM fit, backscatter removal,
range-guided illuminant, 12-param attenuation LM fit, attenuation correction
— is one jittable function, batchable over images with vmap and shardable
over cameras with pjit.
"""

from .formation import synthesize_underwater, BETA_GUESS_1, BETA_GUESS_2  # noqa: F401
from .backscatter import (  # noqa: F401
    find_dark_mask,
    estimate_backscatter,
    remove_backscatter,
)
from .attenuation import estimate_beta, correct_attenuation  # noqa: F401
from .illuminant import estimate_illuminant_range_guided, estimate_illuminant_gaussian  # noqa: F401
from .normalization import (  # noqa: F401
    enhance_contrast,
    enhance_contrast_clip,
    enhance_contrast_factor,
    white_balance_simple,
    gamma_to_linear,
    linear_to_gamma,
    correct_color_ratio,
    normalize_unit,
)
from .enhance import enhance_underwater, EnhanceInfo, EnhanceParams, EnhanceSequence  # noqa: F401
