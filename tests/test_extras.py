"""Tests for factors, visualization, ellipsoids, and grid lookup."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.core.grid import GridLookup, map_to_grid_cells, populate_grid
from ocean_perception_tpu.core.se3 import so3_exp
from ocean_perception_tpu.tracking.visualization import (
    colorize_disparity,
    draw_features,
    draw_stereo_matches,
    draw_tracks,
)
from ocean_perception_tpu.vio.factors import estimate_attitude, mag_residual
from ocean_perception_tpu.vio.visualizer import (
    TrajectoryVisualizer,
    covariance_ellipsoid_points,
    write_ply,
)


def test_estimate_attitude_recovers_tilt():
    g = jnp.asarray([0.0, 0.0, -9.81])
    # Body tilted 20 degrees about x: the accelerometer reads -R^T g.
    R_true = so3_exp(jnp.asarray([0.35, 0.0, 0.0]))
    accel = -(R_true.T @ g)
    R_est = estimate_attitude(accel, g)
    # Estimated attitude maps the measurement back onto -g.
    np.testing.assert_allclose(np.asarray(R_est @ accel), -np.asarray(g), atol=1e-5)


def test_mag_residual_zero_at_truth():
    R = so3_exp(jnp.asarray([0.1, -0.2, 0.5]))
    field = jnp.asarray([0.0, 0.0, 1.0])
    measured = R.T @ (50.0 * field)
    r = mag_residual(R, measured, field, scale=50.0)
    np.testing.assert_allclose(np.asarray(r), np.zeros(3), atol=1e-6)


def test_draw_functions_shapes(rng):
    img = rng.random((40, 60)).astype(np.float32)
    pts = np.array([[10.0, 10.0], [30.0, 20.0]])
    out = draw_features(img, pts)
    assert out.shape == (40, 60, 3) and out.dtype == np.uint8
    out2 = draw_tracks(img, pts, pts + 3.0)
    assert out2.shape == (40, 60, 3)
    out3 = draw_stereo_matches(img, img, pts, np.array([5.0, -1.0]))
    assert out3.shape == (40, 120, 3)
    cd = colorize_disparity(rng.random((40, 60)).astype(np.float32) * 32, 32)
    assert cd.shape == (40, 60, 3)


def test_covariance_ellipsoid():
    cov = np.diag([4.0, 1.0, 0.25])
    pts = covariance_ellipsoid_points(cov, np.array([1.0, 2.0, 3.0]), n_sigma=1.0)
    d = pts - [1, 2, 3]
    # Max extents along the principal axes ~ sqrt(eigenvalue).
    assert abs(np.abs(d[:, 0]).max() - 2.0) < 0.2
    assert abs(np.abs(d[:, 2]).max() - 0.5) < 0.1


def test_trajectory_visualizer(tmp_path):
    viz = TrajectoryVisualizer(str(tmp_path))
    T = np.eye(4)
    for i in range(10):
        T = T.copy()
        T[:3, 3] = [i * 0.1, np.sin(i * 0.3), 0.0]
        viz.add_pose(T, np.eye(3) * 0.01)
    viz.add_landmarks(np.random.rand(20, 3))
    files = viz.save()
    assert len(files) >= 3
    for f in files:
        assert os.path.exists(f)
    ply = [f for f in files if f.endswith("trajectory.ply")][0]
    header = open(ply).read().splitlines()
    assert header[0] == "ply" and "element vertex 10" in "\n".join(header)


def test_grid_lookup_roi():
    grid = GridLookup(4, 4)
    pts = np.array([[5.0, 5.0], [35.0, 5.0], [60.0, 60.0]])
    cells = map_to_grid_cells(pts, 64, 64, 4, 4)
    populate_grid(cells, grid)
    # ROI around cell (0,0)-(1,1) catches the first two points.
    hits = grid.get_roi((0, 0), (1, 2))
    assert set(hits) == {0, 1}
    assert grid.get_roi((3, 3), (3, 3)) == [2]
