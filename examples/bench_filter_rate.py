#!/usr/bin/env python
"""Measure the host-side filter (EKF) rates against the reference's design
targets (vio/README.md: filter output 50+ Hz at the IMU rate, smoother ~1 Hz
on its own thread).

Two numbers, both on host CPU (the deployment path — the reference's filter
is CPU-side too):

1. steady-state eager EKF IMU update rate (receive_imu -> filter callback),
   single-threaded core;
2. the same rate measured WHILE a real (numeric, compiled) smoother solve
   runs on the vision thread of ThreadedStateEstimator.

Usage: python examples/bench_filter_rate.py [--samples 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the host-side filter runs double

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.81])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2000)
    args = ap.parse_args()

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.core.measurements import ImuMeasurement
    from ocean_perception_tpu.vio.smoother import SmootherConfig
    from ocean_perception_tpu.vio.state_estimator import (
        StateEstimator,
        StateEstimatorParams,
    )

    cam = PinholeCamera.create(200.0, 200.0, 80.0, 60.0, 120, 160)
    rig = StereoCamera.create(cam, cam, 0.2)
    params = StateEstimatorParams(
        n_gravity=GRAVITY.copy(),
        smoother=SmootherConfig(window=6, iterations=3),
        min_sec_btw_keyposes=0.05,
        max_sec_btw_keyposes=0.2,  # IMU-fallback keyposes drive real solves
        # 0.2 s @ 100 Hz = 20 rows/keypose; the 256-row default pads the
        # preintegration jacobians 12x wider and makes the one-time CPU
        # solve compile take tens of minutes. 32 keeps it honest + fast.
        max_imu_per_keypose=32,
    )

    # --- 0. pure filter rate: EKF predict only, keyposes disabled --------
    pure = StateEstimator(
        StateEstimatorParams(
            n_gravity=GRAVITY.copy(),
            smoother=SmootherConfig(window=6, iterations=3),
            min_sec_btw_keyposes=1e6,
            max_sec_btw_keyposes=1e6,
            max_imu_per_keypose=32,
        ),
        rig,
    )
    pure.initialize(0, np.eye(4))
    pticks = []
    pure.filter_callbacks.append(lambda s: pticks.append(time.perf_counter()))
    dt_ns0 = int(1e7)
    for i in range(1, 51):
        pure.receive_imu(ImuMeasurement(i * dt_ns0, np.zeros(3), -GRAVITY))
    pticks.clear()
    t0 = time.perf_counter()
    for i in range(51, 51 + args.samples):
        pure.receive_imu(ImuMeasurement(i * dt_ns0, np.zeros(3), -GRAVITY))
    hz_pure = len(pticks) / (time.perf_counter() - t0)
    print(
        f"pure EKF predict rate (no keyposes): {hz_pure:,.0f} Hz", flush=True
    )

    # --- 1. single-threaded eager EKF rate -------------------------------
    est = StateEstimator(params, rig)
    est.initialize(0, np.eye(4))
    ticks = []
    est.filter_callbacks.append(lambda s: ticks.append(time.perf_counter()))

    dt_ns = int(1e7)  # 100 Hz timestamps
    # Warmup (traces + compiles the EKF update and any keypose path).
    print("warming up single-threaded core (compiles the EKF + solve)...", flush=True)
    for i in range(1, 51):
        est.receive_imu(ImuMeasurement(i * dt_ns, np.zeros(3), -GRAVITY))
    print("warmup done", flush=True)
    ticks.clear()
    t0 = time.perf_counter()
    for i in range(51, 51 + args.samples):
        est.receive_imu(ImuMeasurement(i * dt_ns, np.zeros(3), -GRAVITY))
    elapsed = time.perf_counter() - t0
    hz_single = len(ticks) / elapsed
    print(
        f"eager EKF update rate (single-threaded core): {hz_single:,.0f} Hz "
        f"({len(ticks)} callbacks / {elapsed:.2f} s)"
    )

    # --- 2. threaded: filter rate while numeric solves run ---------------
    from ocean_perception_tpu.vio.threaded_estimator import ThreadedStateEstimator

    test = ThreadedStateEstimator(params, rig)
    t_ticks: list[float] = []
    test.core.filter_callbacks.append(lambda s: t_ticks.append(time.perf_counter()))
    solve_spans: list[tuple[float, float]] = []
    inner_solve = test.core._solve

    def timed_solve(win, pims, slot):
        a = time.perf_counter()
        out = inner_solve(win, pims, slot)
        solve_spans.append((a, time.perf_counter()))
        return out

    test.core._solve = timed_solve
    test.initialize(0, np.eye(4))

    # Warmup through the first solve compile (max_sec=0.2 s -> keyposes from
    # IMU alone; the first solve jit-compiles for seconds).
    for i in range(1, 200):
        test.receive_imu(ImuMeasurement(i * dt_ns, np.zeros(3), -GRAVITY))
    test.wait_idle(timeout=600)
    n_warm_solves = len(solve_spans)
    solve_spans.clear()
    t_ticks.clear()

    # Steady state: pump IMU as fast as the filter thread absorbs it.
    t0 = time.perf_counter()
    i0 = 200
    n = 0
    while time.perf_counter() - t0 < 5.0:
        n += 1
        test.receive_imu(ImuMeasurement((i0 + n) * dt_ns, np.zeros(3), -GRAVITY))
        time.sleep(0)  # yield so the filter/vision threads get slices
    test.wait_idle(timeout=600)
    test.shutdown()

    span = t_ticks[-1] - t_ticks[0] if len(t_ticks) > 1 else float("nan")
    hz_threaded = (len(t_ticks) - 1) / span
    print(
        f"threaded filter rate (smoother solving concurrently): {hz_threaded:,.0f} Hz "
        f"({len(t_ticks)} callbacks; {len(solve_spans)} numeric solves during the "
        f"window, {n_warm_solves} in warmup)"
    )
    if solve_spans:
        durs = [b - a for a, b in solve_spans]
        print(
            f"numeric solve wall time on CPU: median {np.median(durs) * 1e3:.0f} ms, "
            f"max {max(durs) * 1e3:.0f} ms"
        )
        # Rate inside solve windows only (the reference's critical property).
        inside = [
            t for t in t_ticks if any(a < t < b for a, b in solve_spans)
        ]
        tot = sum(b - a for a, b in solve_spans)
        if tot > 0:
            print(f"filter rate INSIDE solve windows: {len(inside) / tot:,.0f} Hz")


if __name__ == "__main__":
    main()
