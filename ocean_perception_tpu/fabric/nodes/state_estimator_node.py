"""StateEstimator node: bus-driven VIO service.

Reference parity: lcm_nodes/state_estimator_lcm.cpp — waits for an initial
pose message, subscribes imu/depth/range/stereo channels (stereo may arrive
via the shm ring), republishes the filter pose (rate-limited) and the
smoother pose.

Channels (configurable): vio/init_pose, sensors/imu, sensors/depth,
sensors/range, sensors/stereo (StereoImageMessage) or sensors/stereo_shm
(ShmImageHeader pairs), outputs vio/pose/filter + vio/pose/smoother.
"""

from __future__ import annotations

import argparse
import sys
import threading
from typing import Optional

import numpy as np

from ...core.cameras import PinholeCamera, StereoCamera
from ...core.measurements import (
    DepthMeasurement,
    ImuMeasurement,
    RangeMeasurement,
    StereoImage,
)
from ...utils.timing import DataSubsampler
from ...vio.state_estimator import StateEstimator, StateEstimatorParams
from ..messages import (
    DepthMessage,
    ImuMessage,
    PoseStampedMessage,
    RangeMessage,
    ShmImageHeader,
    StereoImageMessage,
)
from ..pubsub import PubSub, UdpMulticastBus
from ..shm_ring import ShmRingReader


class StateEstimatorNode:
    def __init__(
        self,
        bus: PubSub,
        rig: StereoCamera,
        params: Optional[StateEstimatorParams] = None,
        filter_pose_hz: float = 20.0,
        channel_prefix: str = "",
    ):
        self.bus = bus
        self.est = StateEstimator(params or StateEstimatorParams(), rig)
        self._init = threading.Event()
        self._subsampler = DataSubsampler(filter_pose_hz)
        self._shm_readers = {}
        p = channel_prefix

        bus.subscribe(p + "vio/init_pose", self._on_init)
        bus.subscribe(p + "sensors/imu", self._on_imu)
        bus.subscribe(p + "sensors/depth", self._on_depth)
        bus.subscribe(p + "sensors/range", self._on_range)
        bus.subscribe(p + "sensors/stereo", self._on_stereo)
        bus.subscribe(p + "sensors/stereo_shm_left", self._on_shm("left"))
        bus.subscribe(p + "sensors/stereo_shm_right", self._on_shm("right"))
        self._pending_shm = {}
        self._out_prefix = p

        self.est.smoother_callbacks.append(self._publish_smoother)

    # -- handlers -------------------------------------------------------------

    def _on_init(self, _ch, msg: PoseStampedMessage):
        from ...core.quaternion import quat_to_matrix
        import jax.numpy as jnp

        T = np.eye(4)
        T[:3, :3] = np.asarray(quat_to_matrix(jnp.asarray(msg.pose[:4])))
        T[:3, 3] = msg.pose[4:7]
        self.est.initialize(msg.timestamp, T)
        self._init.set()

    def _on_imu(self, _ch, m: ImuMessage):
        if not self._init.is_set():
            return
        self.est.receive_imu(
            ImuMeasurement(m.timestamp, m.angular_velocity, m.linear_acceleration)
        )
        fs = self.est.filter_state()
        if self._subsampler.should_sample(fs.timestamp * 1e-9):
            self._publish_filter(fs)

    def _on_depth(self, _ch, m: DepthMessage):
        if self._init.is_set():
            self.est.receive_depth(DepthMeasurement(m.timestamp, m.depth))

    def _on_range(self, _ch, m: RangeMessage):
        if self._init.is_set():
            self.est.receive_range(
                RangeMeasurement(m.timestamp, m.range, m.point, m.beacon_id)
            )

    def _on_stereo(self, _ch, m: StereoImageMessage):
        if not self._init.is_set():
            return
        self.est.receive_stereo(
            StereoImage(m.timestamp, m.camera_id, m.left.to_array(), m.right.to_array())
        )

    def _on_shm(self, side: str):
        def handler(_ch, hdr: ShmImageHeader):
            if not self._init.is_set():
                return
            reader = self._shm_readers.get(hdr.shm_path)
            if reader is None:
                reader = ShmRingReader(hdr.shm_path)
                self._shm_readers[hdr.shm_path] = reader
            frame = reader.read(hdr.seq)
            if frame is None:
                return
            ts, img = frame
            pending = self._pending_shm.setdefault(hdr.timestamp, {})
            pending[side] = img
            if "left" in pending and "right" in pending:
                del self._pending_shm[hdr.timestamp]
                self.est.receive_stereo(
                    StereoImage(hdr.timestamp, 0, pending["left"], pending["right"])
                )

        return handler

    # -- outputs --------------------------------------------------------------

    def _pose_message(self, s) -> PoseStampedMessage:
        from ...core.quaternion import matrix_to_quat
        import jax.numpy as jnp

        q = np.asarray(matrix_to_quat(jnp.asarray(s.world_T_body[:3, :3])))
        return PoseStampedMessage(
            timestamp=s.timestamp,
            pose=np.concatenate([q, s.world_T_body[:3, 3]]),
            covariance=s.covariance[:6, :6] if s.covariance is not None else None,
        )

    def _publish_filter(self, fs) -> None:
        self.bus.publish(self._out_prefix + "vio/pose/filter", self._pose_message(fs))

    def _publish_smoother(self, _result) -> None:
        s = self.est.smoother_state()
        if s is not None:
            self.bus.publish(self._out_prefix + "vio/pose/smoother", self._pose_message(s))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fx", type=float, default=336.0)
    ap.add_argument("--baseline", type=float, default=0.2)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--height", type=int, default=376)
    args = ap.parse_args(argv)

    cam = PinholeCamera.create(args.fx, args.fx, args.width / 2, args.height / 2, args.height, args.width)
    rig = StereoCamera.create(cam, cam, args.baseline)
    bus = UdpMulticastBus()
    node = StateEstimatorNode(bus, rig)
    print("state_estimator_node listening (waiting for vio/init_pose)...")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
