"""Mission stress-matrix regression bounds (slow tier).

The estimator's robustness is scored the way stereo is oracle-scored: each
cell of examples/mission_matrix.py is a full mission (dataset -> estimator
-> ATE) under a failure scenario. These tests pin a representative subset
with bounds set ~2x above the round-5 measured medians
(docs/PERFORMANCE.md round-5 matrix) so a regression that doubles any
recovery path's error fails loudly. Reference failure paths:
state_estimator.cpp:336-397, fixed_lag_smoother.cpp:413-428.
"""

import pytest

pytestmark = pytest.mark.slow

FRAMES = 24  # shorter battery than the example's 32 to keep CI bounded


def _run(scenario, severity, seed=0):
    from examples.mission_matrix import run_cell

    r = run_cell(scenario, severity, FRAMES, seed=seed)
    assert "error" not in r, r
    return r["ate_rmse_m"]


def test_matrix_baseline_clean():
    assert _run("baseline", 0.0) < 0.10


def test_matrix_vo_dropout_bounded():
    # Blinded camera for 0.8 s: mode machine + IMU dead-reckoning keep the
    # mission bounded (measured median 0.10 m at 32 frames).
    assert _run("vo_dropout", 0.8) < 0.35


def test_matrix_range_outliers_rejected():
    """50% gross range outliers must be absorbed by the EKF innovation gate
    + the smoother's Cauchy range rows (round 5: 2.03 m -> 0.049 m)."""
    clean = _run("range_outlier", 0.0)
    stressed = _run("range_outlier", 0.5)
    assert stressed < 0.15
    assert stressed < 3.0 * max(clean, 0.03)


def test_matrix_mag_bounds_gyro_drift():
    """0.02 rad/s heading-rate bias: magnetometer aiding must at least not
    hurt, and keep the mission under the unaided drift bound."""
    unaided = _run("gyro_bias", 0.02)
    aided = _run("mag_bias", 5.0)
    assert aided < 0.20
    assert aided < unaided * 1.5


def test_matrix_moderate_yaw_tracked():
    assert _run("yaw", 25.0) < 0.12
