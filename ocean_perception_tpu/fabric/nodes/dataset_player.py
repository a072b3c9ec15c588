"""Dataset player: offline dataset → StateEstimator → pose output.

Reference parity: tools/vio_dataset_player/main.cpp — wires a dataset's
callbacks into the estimator, plays back at a speed factor, publishes filter
and smoother poses on the bus, and optionally dumps a trajectory CSV.

Usage:
    python -m ocean_perception_tpu.fabric.nodes.dataset_player \
        --dataset euroc --path /data/farmsim_seq --speed 2.0 \
        --out-trajectory /tmp/traj.csv
"""

from __future__ import annotations

import argparse
import csv
import sys
from typing import List, Optional

import numpy as np

from ...core.measurements import StereoImage
from ...datasets import get_dataset_by_name
from ...vio.state_estimator import StateEstimator, StateEstimatorParams, StateStamped
from ..messages import PoseStampedMessage
from ..pubsub import InProcessBus, PubSub, UdpMulticastBus
from ...core.cameras import PinholeCamera, StereoCamera


def _pose_msg(s: StateStamped) -> PoseStampedMessage:
    from ...core.quaternion import matrix_to_quat
    import jax.numpy as jnp

    q = np.asarray(matrix_to_quat(jnp.asarray(s.world_T_body[:3, :3])))
    pose = np.concatenate([q, s.world_T_body[:3, 3]])
    cov = None
    if s.covariance is not None and s.covariance.shape[0] >= 6:
        cov = s.covariance[:6, :6]
    return PoseStampedMessage(timestamp=s.timestamp, pose=pose, covariance=cov)


def run(
    dataset_name: str,
    path: str,
    rig: Optional[StereoCamera] = None,
    speed: float = 0.0,
    bus: Optional[PubSub] = None,
    params: Optional[StateEstimatorParams] = None,
    out_trajectory: Optional[str] = None,
    max_steps: Optional[int] = None,
) -> List[StateStamped]:
    dataset = get_dataset_by_name(dataset_name, path)
    if rig is None:
        cam = PinholeCamera.create(336.0, 336.0, 336.0, 188.0, 376, 672)
        rig = StereoCamera.create(cam, cam, baseline=0.2)
    params = params or StateEstimatorParams()
    est = StateEstimator(params, rig)
    bus = bus or InProcessBus()

    trajectory: List[StateStamped] = []

    def on_smoother(result):
        s = est.smoother_state()
        if s is not None:
            trajectory.append(s)
            bus.publish("vio/pose/smoother", _pose_msg(s))

    est.smoother_callbacks.append(on_smoother)

    initialized = [False]

    def on_stereo(img: StereoImage):
        if not initialized[0]:
            # Initialize from groundtruth if available, else identity
            # (vio_dataset_player main.cpp:156-157).
            T0 = dataset.pose_data[0].world_T_body if dataset.pose_data else np.eye(4)
            est.initialize(img.timestamp, T0)
            initialized[0] = True
        est.receive_stereo(img)
        fs = est.filter_state() if est.ekf_state is not None else None
        if fs is not None:
            bus.publish("vio/pose/filter", _pose_msg(fs))

    dataset.register_stereo_callback(on_stereo)
    dataset.register_imu_callback(est.receive_imu)
    dataset.register_depth_callback(est.receive_depth)
    dataset.register_range_callback(est.receive_range)

    if speed > 0:
        dataset.playback(speed, block=True)
    else:
        n = 0
        while dataset.step():
            n += 1
            if max_steps is not None and n >= max_steps:
                break

    if out_trajectory:
        with open(out_trajectory, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["#timestamp_ns", "tx", "ty", "tz"])
            for s in trajectory:
                w.writerow([s.timestamp, *s.world_T_body[:3, 3].tolist()])
    return trajectory


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="euroc")
    ap.add_argument("--path", required=True)
    ap.add_argument("--speed", type=float, default=0.0, help="0 = as fast as possible")
    ap.add_argument("--udp", action="store_true", help="publish on UDP multicast")
    ap.add_argument("--out-trajectory", default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args(argv)

    bus = UdpMulticastBus() if args.udp else InProcessBus()
    traj = run(
        args.dataset, args.path, speed=args.speed, bus=bus,
        out_trajectory=args.out_trajectory, max_steps=args.max_steps,
    )
    print(f"played dataset; {len(traj)} smoother poses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
