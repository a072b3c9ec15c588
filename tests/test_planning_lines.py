"""RRT* planner and line-feature geometry tests."""

import jax.numpy as jnp
import numpy as np

from ocean_perception_tpu.planning import RrtParams, RrtStar
from ocean_perception_tpu.tracking.lines import (
    LineSegment2d,
    endpoint_disparities,
    extrapolate_to_rows,
    line_equation,
    point_line_distance,
    segment_overlap_y,
)


def test_rrt_plans_around_wall():
    # 2D world [0,10]^2 with a wall at x=5, gap at y in [4, 6].
    def is_free(a, b):
        a, b = np.asarray(a), np.asarray(b)
        # Sample along segment; blocked if crossing wall outside the gap.
        for t in np.linspace(0, 1, 20):
            p = a + t * (b - a)
            if 4.8 <= p[0] <= 5.2 and not (4.0 <= p[1] <= 6.0):
                return False
        return True

    rrt = RrtStar(np.zeros(2), np.full(2, 10.0), is_free, RrtParams(max_iters=3000, step_size=0.8), seed=1)
    path = rrt.plan(np.array([1.0, 1.0]), np.array([9.0, 9.0]))
    assert path is not None
    np.testing.assert_allclose(path[0], [1, 1])
    np.testing.assert_allclose(path[-1], [9, 9])
    # Path passes through the gap.
    crossing = [p for p in path if 4.5 <= p[0] <= 5.5]
    assert all(3.5 <= p[1] <= 6.5 for p in crossing)
    # Path is collision free edge-by-edge.
    for a, b in zip(path[:-1], path[1:]):
        assert is_free(a, b)


def test_rrt_no_path():
    def blocked(a, b):
        a, b = np.asarray(a), np.asarray(b)
        for t in np.linspace(0, 1, 20):
            p = a + t * (b - a)
            if 4.8 <= p[0] <= 5.2:
                return False
        return True

    rrt = RrtStar(np.zeros(2), np.full(2, 10.0), blocked, RrtParams(max_iters=400), seed=2)
    assert rrt.plan(np.array([1.0, 5.0]), np.array([9.0, 5.0])) is None


def test_line_geometry():
    seg = LineSegment2d(jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 0.0]))
    l = line_equation(seg)
    assert float(point_line_distance(l, jnp.asarray([5.0, 3.0]))) == 3.0

    a = LineSegment2d(jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 10.0]))
    b = LineSegment2d(jnp.asarray([1.0, 5.0]), jnp.asarray([1.0, 15.0]))
    assert abs(float(segment_overlap_y(a, b)) - 5.0 / 15.0) < 1e-6

    # Extrapolate a diagonal segment to rows 0 and 20: endpoints land there.
    seg2 = LineSegment2d(jnp.asarray([2.0, 5.0]), jnp.asarray([4.0, 15.0]))
    ext = extrapolate_to_rows(seg2, 0.0, 20.0)
    assert abs(float(ext.p0[1])) < 1e-6 and abs(float(ext.p1[1]) - 20.0) < 1e-6

    # A right segment shifted left by d has endpoint disparities d.
    left = LineSegment2d(jnp.asarray([10.0, 2.0]), jnp.asarray([12.0, 8.0]))
    right = LineSegment2d(jnp.asarray([6.0, 2.0]), jnp.asarray([8.0, 8.0]))
    d0, d1 = endpoint_disparities(left, right)
    assert abs(float(d0) - 4.0) < 1e-6 and abs(float(d1) - 4.0) < 1e-6
