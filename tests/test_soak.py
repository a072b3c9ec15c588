"""Long-mission steady-state soak: ZERO recompiles once warm.

Round 3 found two host-path defects that only long runs exposed (a fresh
vmap closure per smoother update recompiling every keypose until LLVM ran
out of JIT code mappings, and the eager EKF path re-dispatching ~150 ops
per IMU sample — docs/PERFORMANCE.md "host-side filter path"). This test
institutionalizes the check: after warmup, a steady-state stream of IMU
samples and IMU-fallback keypose solves must trigger NO jit tracing or XLA
compilation at all, counted via jax's own compile logging."""

import logging

import numpy as np
import pytest

from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
from ocean_perception_tpu.core.measurements import DepthMeasurement, ImuMeasurement
from ocean_perception_tpu.vio.smoother import SmootherConfig
from ocean_perception_tpu.vio.state_estimator import StateEstimator, StateEstimatorParams

GRAVITY = np.array([0.0, 0.0, -9.81])


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling ") or msg.startswith("Finished tracing"):
            self.events.append(msg)


@pytest.mark.slow
def test_estimator_steady_state_zero_recompiles():
    import jax

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        min_sec_btw_keyposes=0.05,
        max_sec_btw_keyposes=0.2,   # IMU-fallback keyposes drive real solves
        max_imu_per_keypose=32,
    )
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    n_filter = [0]
    est.filter_callbacks.append(lambda s: n_filter.__setitem__(0, n_filter[0] + 1))

    dt_ns = int(1e7)  # 100 Hz
    # Warmup: past window-fill + first slide so every program variant
    # (prefill solve, sliding solve, replay, depth update) has compiled.
    i = 1
    for _ in range(250):
        est.receive_imu(ImuMeasurement(i * dt_ns, np.zeros(3), -GRAVITY))
        if i % 10 == 0:
            est.receive_depth(DepthMeasurement(i * dt_ns, 0.0))
        i += 1
    counter = _CompileCounter()
    loggers = [
        logging.getLogger("jax._src.interpreters.pxla"),
        logging.getLogger("jax._src.dispatch"),
    ]
    ts_before = est.smoother_state().timestamp
    with jax.log_compiles():
        for lg in loggers:
            lg.addHandler(counter)
        try:
            n0 = n_filter[0]
            for _ in range(400):  # 4 s of mission: ~20 more keypose solves
                est.receive_imu(ImuMeasurement(i * dt_ns, np.zeros(3), -GRAVITY))
                if i % 10 == 0:
                    est.receive_depth(DepthMeasurement(i * dt_ns, 0.0))
                i += 1
        finally:
            for lg in loggers:
                lg.removeHandler(counter)

    assert counter.events == [], (
        f"steady state retraced/recompiled {len(counter.events)} programs; "
        f"first: {counter.events[:3]}"
    )
    # The mission actually ran: filter ticked every sample, smoother advanced.
    assert n_filter[0] - n0 == 400
    assert est.smoother_state().timestamp > ts_before
