"""Feature detection: Shi-Tomasi / Harris corner scoring with spatial spread.

Reference parity: ft/FeatureDetector (feature_detector.cpp:88-123) — GFTT
(min-eigenvalue or Harris score), quality-level threshold relative to the
best corner, masking around already-tracked points, then ANMS (RangeTree) to
cap the count with spatial distribution.

TPU design: scoring is dense VPU work (Sobel products + box sums). The
sequential RangeTree ANMS becomes grid-bucketed selection: the image is
tiled into ~max_features cells, the best corner per cell survives, then a
global top-K — same spatial-spread intent, fully parallel, static shapes.
Masking around K existing points is a scatter-splat + max-dilate.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.image import box_filter, dilate, sobel_x, sobel_y


@struct.dataclass
class DetectorParams:
    max_features: int = struct.field(pytree_node=False, default=200)
    quality_level: float = struct.field(pytree_node=False, default=0.01)
    block_size: int = struct.field(pytree_node=False, default=9)
    use_harris: bool = struct.field(pytree_node=False, default=False)
    harris_k: float = struct.field(pytree_node=False, default=0.04)
    min_distance: float = struct.field(pytree_node=False, default=20.0)
    border: int = struct.field(pytree_node=False, default=8)
    # Subpixel corner refinement (reference cornerSubPix option,
    # feature_detector.cpp:88-123): quadratic peak fit on the corner-score
    # map around each selected corner.
    subpixel: bool = struct.field(pytree_node=False, default=False)


class Detections(NamedTuple):
    points: jnp.ndarray   # (K, 2) float32 (x, y)
    scores: jnp.ndarray   # (K,)
    valid: jnp.ndarray    # (K,) bool


def corner_score(image: jnp.ndarray, params: DetectorParams) -> jnp.ndarray:
    """Dense GFTT score map: min eigenvalue (or Harris response) of the
    structure tensor box-summed over block_size."""
    gx = sobel_x(image)
    gy = sobel_y(image)
    r = params.block_size // 2
    a = box_filter(gx * gx, r)
    b = box_filter(gx * gy, r)
    c = box_filter(gy * gy, r)
    if params.use_harris:
        det = a * c - b * b
        tr = a + c
        return det - params.harris_k * tr * tr
    # Min eigenvalue of [[a, b], [b, c]].
    return 0.5 * ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b))


def mask_around_points(
    shape: Tuple[int, int],
    points: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Boolean mask that is True within `radius` (square) of any valid point.

    Replaces the reference's cv::circle mask (feature_detector.cpp mask around
    tracked points) with a scatter + square max-dilation.
    """
    H, W = shape
    splat = jnp.zeros((H, W), jnp.float32)
    xs = jnp.clip(jnp.round(points[:, 0]), 0, W - 1).astype(jnp.int32)
    ys = jnp.clip(jnp.round(points[:, 1]), 0, H - 1).astype(jnp.int32)
    splat = splat.at[ys, xs].max(valid.astype(jnp.float32))
    k = 2 * int(radius) + 1
    return dilate(splat, k) > 0.5


def detect_features(
    image: jnp.ndarray,
    params: DetectorParams = DetectorParams(),
    exclude_points: Optional[jnp.ndarray] = None,
    exclude_valid: Optional[jnp.ndarray] = None,
) -> Detections:
    """Top-K spatially-spread corners. Static output shape (K slots + mask)."""
    H, W = image.shape
    K = params.max_features
    score = corner_score(image, params)

    # 3x3 non-max suppression.
    is_peak = score >= dilate(score, 3)
    score = jnp.where(is_peak, score, 0.0)

    # Quality threshold relative to the best corner (GFTT semantics).
    score = jnp.where(score >= params.quality_level * jnp.max(score), score, 0.0)

    # Border and tracked-point exclusion.
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    b = params.border
    interior = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    score = jnp.where(interior, score, 0.0)
    if exclude_points is not None:
        excl = mask_around_points((H, W), exclude_points, exclude_valid, params.min_distance)
        score = jnp.where(excl, 0.0, score)

    # Grid-bucketed spatial spread (ANMS stand-in): best corner per cell.
    # Cell size ~ min_distance so selected corners are naturally spread.
    cell = max(4, int(params.min_distance))
    Hc, Wc = -(-H // cell), -(-W // cell)
    padded = jnp.pad(score, ((0, Hc * cell - H), (0, Wc * cell - W)))
    cells = padded.reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3).reshape(Hc * Wc, cell * cell)
    cell_best = jnp.max(cells, axis=1)
    cell_arg = jnp.argmax(cells, axis=1)
    # Winner coordinates per cell.
    cy = (jnp.arange(Hc * Wc) // Wc) * cell + cell_arg // cell
    cx = (jnp.arange(Hc * Wc) % Wc) * cell + cell_arg % cell

    k_eff = min(K, Hc * Wc)
    top_scores, top_idx = jax.lax.top_k(cell_best, k_eff)
    iy = cy[top_idx]
    ix = cx[top_idx]
    pts = jnp.stack([ix.astype(jnp.float32), iy.astype(jnp.float32)], axis=-1)
    valid = top_scores > 0.0

    if params.subpixel:
        # Quadratic (parabola) peak fit per axis on the raw score map — the
        # reference's optional cornerSubPix pass. Offsets are clamped to
        # +-0.5 (a true local peak never needs more).
        raw = corner_score(image, params)
        ge = jnp.pad(raw, 1, mode="edge")

        def refine(y, x):
            c = ge[y + 1, x + 1]
            sx0, sx1 = ge[y + 1, x], ge[y + 1, x + 2]
            sy0, sy1 = ge[y, x + 1], ge[y + 2, x + 1]
            denx = sx0 + sx1 - 2.0 * c
            deny = sy0 + sy1 - 2.0 * c
            dx = jnp.where(jnp.abs(denx) > 1e-12, 0.5 * (sx0 - sx1) / denx, 0.0)
            dy = jnp.where(jnp.abs(deny) > 1e-12, 0.5 * (sy0 - sy1) / deny, 0.0)
            return jnp.stack([jnp.clip(dx, -0.5, 0.5), jnp.clip(dy, -0.5, 0.5)])

        offs = jax.vmap(refine)(iy, ix)
        pts = pts + jnp.where(valid[:, None], offs, 0.0)

    if k_eff < K:
        pts = jnp.pad(pts, ((0, K - k_eff), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, K - k_eff))
        valid = jnp.pad(valid, (0, K - k_eff))
    return Detections(points=pts, scores=top_scores, valid=valid)
