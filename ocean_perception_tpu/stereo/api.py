"""Unified dense-stereo API: one call, selectable engine.

Reference parity: the reference exposes three disparity paths behind ad-hoc
APIs (PatchmatchGpu::Match, stereo::Patchmatch stages, stereo::
EstimateDisparity/SGBM). Here a single ``estimate_disparity(left, right,
engine=...)`` covers them, all jit-safe, returning left/right maps with
background+occlusion masking applied.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .cost import cost_volume, right_cost_volume_from_left, subpixel_refine
from .patchmatch import PatchMatchParams, patchmatch_disparity
from .sgm import SgmParams, sgm_disparity


class StereoEngine(str, enum.Enum):
    PATCHMATCH = "patchmatch"  # reference-semantics propagation engine
    SGM = "sgm"                # semi-global aggregation (quality default)
    WTA = "wta"                # plain winner-take-all block matching


class DisparityResult(NamedTuple):
    left: jnp.ndarray       # masked left disparity (0 = background/occluded)
    right: jnp.ndarray      # right disparity
    left_raw: jnp.ndarray   # left before occlusion masking


def wta_disparity(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    max_disp: int = 128,
    alpha: float = 0.9,
    subpixel: bool = True,
) -> DisparityResult:
    """Winner-take-all over the reference cost (block-matching equivalent)."""
    C = cost_volume(iml, imr, max_disp, alpha)
    C_r = right_cost_volume_from_left(C)
    d_l = jnp.argmin(C, axis=-1).astype(jnp.int32)
    d_r = jnp.argmin(C_r, axis=-1).astype(jnp.int32)
    if subpixel:
        disp_l = subpixel_refine(C, d_l)
        disp_r = subpixel_refine(C_r, d_r)
    else:
        disp_l = d_l.astype(jnp.float32)
        disp_r = d_r.astype(jnp.float32)
    # LR consistency (gather-free).
    from .cost import sample_at_disparity

    d_int = jnp.clip(jnp.round(disp_l), 0, max_disp - 1).astype(jnp.int32)
    dr = sample_at_disparity(disp_r, d_int, max_disp)
    ok = jnp.abs(dr - disp_l) <= 1.5
    return DisparityResult(jnp.where(ok, disp_l, 0.0), disp_r, disp_l)


def estimate_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    engine: StereoEngine | str = StereoEngine.SGM,
    patchmatch_params: Optional[PatchMatchParams] = None,
    sgm_params: Optional[SgmParams] = None,
    max_disp: int = 128,
) -> DisparityResult:
    engine = StereoEngine(engine)
    if engine is StereoEngine.PATCHMATCH:
        p = patchmatch_params or PatchMatchParams(max_disp=max_disp)
        r = patchmatch_disparity(left, right, p)
        return DisparityResult(r.left, r.right, r.left_raw)
    if engine is StereoEngine.SGM:
        p = sgm_params or SgmParams(max_disp=max_disp)
        r = sgm_disparity(left, right, p)
        return DisparityResult(r.left, r.right, r.left_raw)
    return wta_disparity(left, right, max_disp=max_disp)
