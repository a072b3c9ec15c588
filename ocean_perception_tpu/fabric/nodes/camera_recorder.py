"""Camera recorder: live stereo source → EuRoC-layout dataset on disk.

Reference parity: tools/zed_recorder (ZED SDK capture → EurocDataWriter).
The ZED SDK isn't available on TPU hosts, so the recorder is source-generic:
it subscribes bus channels (stereo + imu + depth) and persists them; a
``--source zed`` path is stubbed with a clear error until an SDK exists.
"""

from __future__ import annotations

import argparse
import sys
import threading

from ...core.measurements import DepthMeasurement, ImuMeasurement
from ...datasets.euroc import EurocDataWriter
from ..messages import DepthMessage, ImuMessage, StereoImageMessage
from ..pubsub import UdpMulticastBus


class CameraRecorderNode:
    def __init__(self, bus, out_folder: str, channel_prefix: str = "sensors/"):
        self.writer = EurocDataWriter(out_folder)
        bus.subscribe(channel_prefix + "stereo", self._on_stereo)
        bus.subscribe(channel_prefix + "imu", self._on_imu)
        bus.subscribe(channel_prefix + "depth", self._on_depth)

    def _on_stereo(self, _ch, m: StereoImageMessage):
        self.writer.write_stereo(m.timestamp, m.left.to_array(), m.right.to_array())

    def _on_imu(self, _ch, m: ImuMessage):
        self.writer.write_imu(
            ImuMeasurement(m.timestamp, m.angular_velocity, m.linear_acceleration)
        )

    def _on_depth(self, _ch, m: DepthMessage):
        self.writer.write_depth(DepthMeasurement(m.timestamp, m.depth))

    def finish(self) -> None:
        self.writer.finish()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--source", default="bus", choices=["bus", "zed"])
    args = ap.parse_args(argv)
    if args.source == "zed":
        print("ZED SDK capture is not available in this environment; "
              "publish frames on the bus instead (source=bus).", file=sys.stderr)
        return 2
    bus = UdpMulticastBus()
    node = CameraRecorderNode(bus, args.out)
    print(f"recording bus sensors to {args.out} (ctrl-c to stop)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        node.finish()
    return 0


if __name__ == "__main__":
    sys.exit(main())
