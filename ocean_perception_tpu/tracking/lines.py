"""2D/3D line-feature geometry (latent line-VO support).

Reference parity: vision_core/line_feature.hpp + line_util.hpp (stvo-pl
style; the reference carries these with **no consumer in its main path** —
SURVEY.md §2.1 — as groundwork for point+line VO). Provided here for the
same reason: segment overlap, extrapolation, and endpoint-disparity
propagation for rectified stereo line matching.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class LineSegment2d(NamedTuple):
    p0: jnp.ndarray  # (2,)
    p1: jnp.ndarray  # (2,)


def line_equation(seg: LineSegment2d) -> jnp.ndarray:
    """Homogeneous line l = p0 x p1 (normalized so that |n| = 1)."""
    a = jnp.concatenate([seg.p0, jnp.ones(1, seg.p0.dtype)])
    b = jnp.concatenate([seg.p1, jnp.ones(1, seg.p1.dtype)])
    l = jnp.cross(a, b)
    n = jnp.linalg.norm(l[:2])
    return l / jnp.maximum(n, 1e-9)


def point_line_distance(line: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    p = jnp.concatenate([point, jnp.ones(1, point.dtype)])
    return jnp.abs(jnp.dot(line, p))


def segment_overlap_y(seg_a: LineSegment2d, seg_b: LineSegment2d) -> jnp.ndarray:
    """Vertical-interval overlap ratio of two segments (line_util
    SegmentOverlap): used to gate left/right line matches in rectified pairs."""
    a0, a1 = jnp.minimum(seg_a.p0[1], seg_a.p1[1]), jnp.maximum(seg_a.p0[1], seg_a.p1[1])
    b0, b1 = jnp.minimum(seg_b.p0[1], seg_b.p1[1]), jnp.maximum(seg_b.p0[1], seg_b.p1[1])
    inter = jnp.maximum(0.0, jnp.minimum(a1, b1) - jnp.maximum(a0, b0))
    union = jnp.maximum(a1, b1) - jnp.minimum(a0, b0)
    return inter / jnp.maximum(union, 1e-9)


def extrapolate_to_rows(seg: LineSegment2d, y0, y1) -> LineSegment2d:
    """Extend/trim a segment so its endpoints lie on rows y0/y1
    (ExtrapolateLineSegment): makes left/right endpoints row-aligned so
    endpoint disparities are valid."""
    dy = seg.p1[1] - seg.p0[1]
    t0 = (y0 - seg.p0[1]) / jnp.where(jnp.abs(dy) < 1e-9, 1.0, dy)
    t1 = (y1 - seg.p0[1]) / jnp.where(jnp.abs(dy) < 1e-9, 1.0, dy)
    d = seg.p1 - seg.p0
    return LineSegment2d(seg.p0 + t0 * d, seg.p0 + t1 * d)


def endpoint_disparities(
    left: LineSegment2d, right: LineSegment2d
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disparities of the (row-aligned) endpoints of a matched line pair."""
    r = extrapolate_to_rows(right, left.p0[1], left.p1[1])
    return left.p0[0] - r.p0[0], left.p1[0] - r.p1[0]


def backproject_line(
    seg: LineSegment2d, disp0, disp1, fx, fy, cx, cy, baseline
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Endpoints → 3D via their disparities (rectified stereo)."""
    def bp(p, d):
        z = fx * baseline / jnp.maximum(d, 1e-6)
        x = (p[0] - cx) / fx * z
        y = (p[1] - cy) / fy * z
        return jnp.stack([x, y, z])

    return bp(seg.p0, disp0), bp(seg.p1, disp1)
