#!/usr/bin/env python
"""Complete offline VIO mission: dataset -> estimator -> scored trajectory.

Writes the synthetic EuRoC dataset (with groundtruth), plays it through the
StateEstimator via the DataProvider callback fabric (the same path
vio_dataset_player uses), logs the smoother trajectory, scores it with the
numeric ATE/RPE evaluation (vio/evaluation.py), and saves a top-down PNG +
PLY via the headless visualizer.

Usage:
  python examples/vio_mission_demo.py [--dataset DIR] [--out DIR] [--frames 16]

With --dataset pointing at a real EuRoC-layout dataset (with imu0_poses.txt
groundtruth), the same flow scores a real mission.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side mission replay demo
jax.config.update("jax_enable_x64", True)  # host filter runs f64, like the tests

import numpy as np


def build_estimator(max_landmarks: int = 0):
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.tracking import (
        DetectorParams,
        LKParams,
        StripeMatcherParams,
    )
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams
    from ocean_perception_tpu.vio.odometry import OdometryParams
    from ocean_perception_tpu.vio.smoother import SmootherConfig
    from ocean_perception_tpu.vio.state_estimator import (
        StateEstimator,
        StateEstimatorParams,
    )
    from ocean_perception_tpu.vio.stereo_frontend import FrontendParams

    from tests.synthetic_vio import BASELINE, FX, H, W

    cam = PinholeCamera.create(FX, FX, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, BASELINE)
    params = StateEstimatorParams(
        n_gravity=np.array([0.0, 0.0, -9.81]),
        frontend=FrontendParams(
            tracker=StereoTrackerParams(
                capacity=96,
                detector=DetectorParams(max_features=96, min_distance=10, border=10),
                lk=LKParams(max_level=2),
                matcher=StripeMatcherParams(
                    max_disp=32, templ_cols=15, templ_rows=11, max_matching_cost=0.3
                ),
                trigger_keyframe_k=2,
            ),
            odometry=OdometryParams(),
            pixel_sigma=1.0,
        ),
        smoother=SmootherConfig(
            window=8, iterations=5,
            # Structureless stereo landmark projection factors (legacy
            # Smoother parity, smoother.cpp:455-490): the camera model must
            # match the rig the tracker observes through.
            max_landmarks=max_landmarks,
            cam_fx=FX, cam_fy=FX, cam_cx=W / 2, cam_cy=H / 2,
            cam_baseline=BASELINE,
        ),
        min_sec_btw_keyposes=0.15,
        max_sec_btw_keyposes=10.0,
    )
    return StateEstimator(params, rig), rig


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default=None, help="EuRoC-layout dataset dir (default: synthesize)")
    ap.add_argument("--out", default="/tmp/vio_mission", help="output dir")
    ap.add_argument("--frames", type=int, default=16, help="synthetic dataset length")
    ap.add_argument(
        "--pose-fix-every", type=float, default=0.0,
        help="simulate external absolute pose fixes (USBL/fiducial "
        "relocalization) from groundtruth every SEC seconds; they aid the "
        "filter (receive_pose) AND become smoother fix factors",
    )
    ap.add_argument(
        "--pose-fix-noise", type=float, default=0.01,
        help="fix position noise stdev, meters",
    )
    ap.add_argument(
        "--max-landmarks", type=int, default=0,
        help="landmark projection factor columns in the smoother window "
        "(0 = reference production default: disabled)",
    )
    args = ap.parse_args()

    from ocean_perception_tpu.datasets.euroc import EurocDataset
    from ocean_perception_tpu.vio.evaluation import evaluate_trajectory
    from ocean_perception_tpu.vio.visualizer import TrajectoryVisualizer

    os.makedirs(args.out, exist_ok=True)
    root = args.dataset
    if root is None:
        root = tempfile.mkdtemp(prefix="vio_synth_")
        from tests.synthetic_vio import write_synthetic_euroc

        write_synthetic_euroc(root, n_frames=args.frames)
        print(f"synthesized dataset at {root}")

    ds = EurocDataset(root)
    ds.sanity_check()
    est, _rig = build_estimator(max_landmarks=args.max_landmarks)

    # Initialize from the dataset's first groundtruth pose, like the
    # reference player (vio_dataset_player/main.cpp:80-96).
    if ds.pose_data:
        est.initialize(ds.pose_data[0].timestamp, ds.pose_data[0].world_T_body)
    else:
        t0 = ds.next_timestamp()
        est.initialize(t0, np.eye(4))

    traj = []

    def on_solve(_result):
        s = est.smoother_state()
        if s is not None and (not traj or s.timestamp != traj[-1][0]):
            traj.append((s.timestamp, np.asarray(s.world_T_body, np.float64)))

    est.smoother_callbacks.append(on_solve)
    if args.pose_fix_every > 0 and ds.pose_data:
        from ocean_perception_tpu.core.measurements import PoseMeasurement

        fix_rng = np.random.default_rng(0)
        period_ns = int(args.pose_fix_every * 1e9)
        fix_state = {"last": -(1 << 62), "n": 0}

        def on_gt(gt):
            if gt.timestamp - fix_state["last"] < period_ns:
                return
            fix_state["last"] = gt.timestamp
            fix_state["n"] += 1
            T = np.array(gt.world_T_body, np.float64)
            T[:3, 3] += fix_rng.normal(0, args.pose_fix_noise, 3)
            cov = np.eye(6) * max(args.pose_fix_noise, 1e-3) ** 2
            est.receive_pose(PoseMeasurement(gt.timestamp, T, cov))

        ds.register_groundtruth_callback(on_gt)
    ds.register_stereo_callback(est.receive_stereo)
    ds.register_imu_callback(est.receive_imu)
    ds.register_depth_callback(est.receive_depth)
    ds.register_range_callback(est.receive_range)
    n = ds.play_all()
    print(f"played {n} measurements; {len(traj)} smoother poses")
    sb = est.stats.stats("smoother_update_ms")
    if sb.count():
        print(
            f"smoother solve latency (max_landmarks={args.max_landmarks}): "
            f"n={sb.count()} mean={sb.mean():.1f} ms "
            f"min={sb.min():.1f} max={sb.max():.1f}"
        )
    if args.pose_fix_every > 0 and ds.pose_data:
        print(f"injected {fix_state['n']} simulated external pose fixes")

    # Trajectory CSV (same EuRoC state format the estimator node's
    # --trajectory-out writes, readable by vio.evaluation's CLI).
    from ocean_perception_tpu.core.quaternion import matrix_to_quat
    import jax.numpy as jnp

    csv_path = os.path.join(args.out, "trajectory.csv")
    with open(csv_path, "w") as f:
        f.write("#timestamp, qw, qx, qy, qz, tx, ty, tz\n")
        for t, T in traj:
            q = np.asarray(matrix_to_quat(jnp.asarray(T[:3, :3])))
            f.write(f"{t},{q[0]},{q[1]},{q[2]},{q[3]},{T[0,3]},{T[1,3]},{T[2,3]}\n")
    print(f"wrote {csv_path}")

    viz = TrajectoryVisualizer(args.out)
    for _, T in traj:
        viz.add_pose(T)
    for p in viz.save(prefix="mission"):
        print(f"wrote {p}")

    if ds.pose_data and len(traj) >= 3:
        est_ts = np.array([t for t, _ in traj], np.int64)
        est_poses = np.stack([T for _, T in traj])
        report = evaluate_trajectory(
            est_ts, est_poses, ds.pose_data, align="none", rpe_deltas_s=[0.5, 1.0]
        )
        report_path = os.path.join(args.out, "evaluation.json")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report))
        print(f"wrote {report_path}")
    else:
        print("no groundtruth in dataset (or too few poses): skipping scoring")
    return 0


if __name__ == "__main__":
    sys.exit(main())
