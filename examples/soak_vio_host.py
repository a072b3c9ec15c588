#!/usr/bin/env python
"""Long-mission VIO soak: memory boundedness + latency stability + accuracy.

The estimator must run mission-length workloads without host memory growth
(the fixed-lag window, ItemHistory buffers, and fix queue are all bounded by
design — this MEASURES it) and with stable per-frame latency. Plays a long
synthetic EuRoC mission through the full StateEstimator (vision frontend +
smoother + filter, the vio_mission_demo flow), sampling RSS and per-window
step latency every --sample-every frames, then scores the trajectory.

Run:  python examples/soak_vio_host.py --frames 600
Output: one JSON line {rss_start_mb, rss_end_mb, rss_growth_mb_per_100_frames,
ate_rmse_m, frame_ms_p50, frame_ms_p90, ...} plus per-sample progress lines.
All per-frame numbers count STEREO frames (DataProvider.step() dispatches
single measurements — ~12 of them per stereo frame at 10 Hz/100 Hz).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side mission soak
jax.config.update("jax_enable_x64", True)

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=600,
                    help="synthetic mission length (10 Hz stereo)")
    ap.add_argument("--sample-every", type=int, default=50)
    ap.add_argument("--pose-fix-every", type=float, default=5.0,
                    help="external pose fixes every SEC (0 = off)")
    args = ap.parse_args()

    # examples/ itself (vio_mission_demo is a sibling script, not a package
    # module — needed when invoked as `python -m examples.soak_vio_host`).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.synthetic_vio import write_synthetic_euroc
    from vio_mission_demo import build_estimator  # examples/ sibling

    from ocean_perception_tpu.core.measurements import PoseMeasurement
    from ocean_perception_tpu.datasets.euroc import EurocDataset
    from ocean_perception_tpu.vio.evaluation import evaluate_trajectory

    root = tempfile.mkdtemp(prefix="vio_soak_")
    # Bounded sinusoidal motion: the default constant-accel scene outruns
    # its canvas after ~26 frames (a long mission would score the FIXTURE's
    # saturation, not the estimator).
    write_synthetic_euroc(root, n_frames=args.frames, motion="sin")
    ds = EurocDataset(root)
    est, _rig = build_estimator()
    est.initialize(ds.pose_data[0].timestamp, ds.pose_data[0].world_T_body)

    traj = []

    def on_solve(_r):
        s = est.smoother_state()
        if s is not None and (not traj or s.timestamp != traj[-1][0]):
            traj.append((s.timestamp, np.asarray(s.world_T_body, np.float64)))

    est.smoother_callbacks.append(on_solve)
    if args.pose_fix_every > 0:
        period_ns = int(args.pose_fix_every * 1e9)
        fix_rng = np.random.default_rng(0)
        last = [-(1 << 62)]

        def on_gt(gt):
            if gt.timestamp - last[0] < period_ns:
                return
            last[0] = gt.timestamp
            T = np.array(gt.world_T_body, np.float64)
            T[:3, 3] += fix_rng.normal(0, 0.01, 3)
            est.receive_pose(PoseMeasurement(gt.timestamp, T, np.eye(6) * 1e-4))

        ds.register_groundtruth_callback(on_gt)
    ds.register_stereo_callback(est.receive_stereo)
    ds.register_imu_callback(est.receive_imu)
    ds.register_depth_callback(est.receive_depth)
    ds.register_range_callback(est.receive_range)

    # DataProvider.step() dispatches ONE measurement (10 Hz stereo + 100 Hz
    # IMU + gt ≈ 12 measurements per stereo frame). All per-frame metrics
    # below count STEREO frames: latency is measured around the step that
    # delivered a stereo callback (the frame that runs the vision frontend
    # + any smoother solve), and RSS growth is per 100 stereo frames.
    stereo_count = [0]
    ds.register_stereo_callback(lambda *_a: stereo_count.__setitem__(0, stereo_count[0] + 1))
    samples = []  # (stereo_frame_idx, rss_mb)
    frame_ms_all = []  # per-STEREO-frame step latency
    t_block = time.perf_counter()
    last_sampled = 0
    while True:
        before = stereo_count[0]
        t0 = time.perf_counter()
        if not ds.step():
            break
        dt_ms = (time.perf_counter() - t0) * 1e3
        if stereo_count[0] > before:
            frame_ms_all.append(dt_ms)
        if stereo_count[0] > last_sampled and stereo_count[0] % args.sample_every == 0:
            last_sampled = stereo_count[0]
            r = rss_mb()
            samples.append((stereo_count[0], r))
            block_s = time.perf_counter() - t_block
            t_block = time.perf_counter()
            print(f"frame {stereo_count[0]}: rss {r:.1f} MB, "
                  f"{block_s * 1e3 / args.sample_every:.1f} ms/frame avg, "
                  f"{len(traj)} poses", flush=True)

    report = {}
    if len(traj) >= 3:
        est_ts = np.array([t for t, _ in traj], np.int64)
        est_poses = np.stack([T for _, T in traj])
        report = evaluate_trajectory(est_ts, est_poses, ds.pose_data,
                                     align="none", rpe_deltas_s=[1.0])
    # Leak fit: RSS growth per 100 STEREO frames over the post-warmup samples.
    growth = 0.0
    if len(samples) >= 3:
        xs = np.array([s[0] for s in samples], np.float64)
        ys = np.array([s[1] for s in samples], np.float64)
        growth = float(np.polyfit(xs, ys, 1)[0] * 100.0)
    # Latency stats exclude the first 10 stereo frames: the frontend,
    # smoother, and fix-attachment programs all compile within that span on
    # a fresh cache (multi-second spikes that are startup, not steady state).
    warm = frame_ms_all[10:] if len(frame_ms_all) > 20 else frame_ms_all
    lat = np.asarray(warm)
    print(json.dumps({
        "metric": "vio_host_soak",
        "stereo_frames": stereo_count[0],
        "smoother_poses": len(traj),
        "rss_start_mb": round(samples[0][1], 1) if samples else None,
        "rss_end_mb": round(samples[-1][1], 1) if samples else None,
        "rss_growth_mb_per_100_frames": round(growth, 3),
        "frame_ms_p50": round(float(np.percentile(lat, 50)), 2),
        "frame_ms_p90": round(float(np.percentile(lat, 90)), 2),
        "frame_ms_max": round(float(lat.max()), 1),
        "ate_rmse_m": report.get("ate_rmse_m"),
        "rpe_1s_trans_m": (report.get("rpe", {}).get("1s", {}) or {}).get("trans_rmse_m"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
