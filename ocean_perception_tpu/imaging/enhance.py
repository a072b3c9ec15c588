"""EnhanceUnderwater: the full Sea-thru pipeline as one jittable function.

Reference parity: imaging/enhance.cpp:22-88 —
  intensity → FindDark → EstimateBackscatter → RemoveBackscatter →
  EstimateIlluminantRangeGuided(r = NextEvenInt(2W/3), eps=.01, s=8) →
  EstimateBeta → CorrectAttenuation,
with success thresholds error < 0.1 for both fits and a reusable beta_D
guess threaded across a sequence (enhance_test.cpp:117-148).

TPU design: the whole pipeline is a single XLA graph (no host round trips);
`jax.vmap(enhance_underwater, ...)` batches over frames/cameras; sharding the
batch axis over an ICI mesh is provided by ocean_perception_tpu.parallel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from ..ops.image import compute_intensity
from .attenuation import correct_attenuation, estimate_beta
from .backscatter import estimate_backscatter, find_dark_mask, remove_backscatter
from .illuminant import estimate_illuminant_range_guided


@struct.dataclass
class EnhanceParams:
    back_num_px: int = struct.field(pytree_node=False, default=256)
    back_opt_iters: int = struct.field(pytree_node=False, default=10)
    beta_num_px: int = struct.field(pytree_node=False, default=256)
    beta_opt_iters: int = struct.field(pytree_node=False, default=20)
    dark_percentile: float = struct.field(pytree_node=False, default=0.01)
    guided_eps: float = struct.field(pytree_node=False, default=0.01)
    guided_subsample: int = struct.field(pytree_node=False, default=8)
    # NOTE (round 5): bf16 inter-stage streams (D, il) were built and
    # MEASURED as a negative result — quantizing the illuminant shifts the
    # 12-param attenuation fit into different local minima (err 0.58 vs
    # 0.37 on the same scene; ~7% median output drift through the exp
    # amplification), and the only fit-safe stream (D alone) moves ~16 MB
    # of the stage's counted 0.697 GB — the counters over-attribute fused
    # traffic, the same lesson as the in-kernel volume build
    # (docs/PERFORMANCE.md round 5). Streams stay f32.


class EnhanceInfo(NamedTuple):
    B: jnp.ndarray
    beta_B: jnp.ndarray
    Jp: jnp.ndarray
    beta_Dp: jnp.ndarray
    beta_D: jnp.ndarray        # (12,) attenuation fit result
    error_backscatter: jnp.ndarray
    error_attenuation: jnp.ndarray
    success_backscatter: jnp.ndarray  # error < 0.1 (enhance.cpp:54)
    success_attenuation: jnp.ndarray  # error < 0.1 (enhance.cpp:78)


def _next_even_int(x: int) -> int:
    """core/math_util NextEvenInt."""
    return x if x % 2 == 0 else x + 1


def enhance_underwater(
    image: jnp.ndarray,
    range_img: jnp.ndarray,
    params: EnhanceParams = EnhanceParams(),
    beta_D_guess: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, EnhanceInfo]:
    """Enhance an RGB image (H,W,3) given a per-pixel range map (H,W).

    Returns (enhanced image, fit info). Jit-safe; static shapes throughout.
    """
    image = jnp.asarray(image, jnp.float32)
    range_img = jnp.asarray(range_img, jnp.float32)

    intensity = compute_intensity(image)
    dark = find_dark_mask(intensity, range_img, params.dark_percentile)

    fit = estimate_backscatter(
        image, range_img, dark, num_px=params.back_num_px, iters=params.back_opt_iters
    )

    D = remove_backscatter(image, range_img, fit.B, fit.beta_B)

    radius = _next_even_int(image.shape[1] // 3)  # NextEvenInt(2W/3 / 2): enhance.cpp uses D.cols/3
    il = estimate_illuminant_range_guided(
        D, range_img, radius, params.guided_eps, params.guided_subsample
    )

    # Multi-start the 12-param attenuation fit and keep the best: always the
    # two reference site guesses (attenuation.hpp:12-29 — the reference
    # requires picking manually per Sea-thru site), plus the caller's guess
    # when given. A supplied guess ALONE can trap the fit: a previous frame's
    # converged X is a near-stationary start where this LM schedule stalls
    # (measured ~0.09 on the D3 neutral-variant reuse vs 0.025 from a fresh
    # guess; the numpy reference-LM oracle confirms the data supports 0.023
    # — tests/test_imaging_oracle.py). Each vmapped fit costs almost nothing.
    from .attenuation import estimate_beta_multi_start
    from .formation import BETA_GUESS_1, BETA_GUESS_2

    starts = [jnp.asarray(BETA_GUESS_1), jnp.asarray(BETA_GUESS_2)]
    if beta_D_guess is not None:
        starts.append(jnp.asarray(beta_D_guess, jnp.float32))
    beta_fit = estimate_beta_multi_start(
        range_img, il, jnp.stack(starts),
        num_px=params.beta_num_px, iters=params.beta_opt_iters,
    )

    out = correct_attenuation(D, range_img, beta_fit.X)

    info = EnhanceInfo(
        B=fit.B,
        beta_B=fit.beta_B,
        Jp=fit.Jp,
        beta_Dp=fit.beta_Dp,
        beta_D=beta_fit.X,
        error_backscatter=fit.error,
        error_attenuation=beta_fit.error,
        success_backscatter=fit.error < 0.1,
        success_attenuation=beta_fit.error < 0.1,
    )
    return out, info


class EnhanceSequence:
    """Stateful sequence driver: reuse the last successful beta_D fit as the
    next frame's initial guess (reference enhance_test.cpp:117-148 — the fit
    is expensive to re-converge and water properties drift slowly)."""

    def __init__(self, params: EnhanceParams = EnhanceParams(), beta_D_guess=None):
        import jax

        from .formation import BETA_GUESS_1

        self.params = params
        self._guess = jnp.asarray(BETA_GUESS_1 if beta_D_guess is None else beta_D_guess)
        self._step = jax.jit(
            lambda img, rng, guess: enhance_underwater(img, rng, params, guess)
        )

    def __call__(self, image, range_img):
        out, info = self._step(jnp.asarray(image, jnp.float32), jnp.asarray(range_img, jnp.float32), self._guess)
        if bool(info.success_attenuation):
            self._guess = info.beta_D
        return out, info
