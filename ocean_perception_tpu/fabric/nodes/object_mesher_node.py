"""ObjectMesher node: stereo frames in → obstacle meshes out.

Reference parity: lcm_nodes/object_mesher_lcm.cpp — subscribes the stereo
channel (shm path supported), optionally downscales to mesher_input_height,
publishes MeshMessage on the mesh channel.
"""

from __future__ import annotations

import argparse
import sys
import threading
from typing import Optional

import numpy as np

from ...core.cameras import PinholeCamera, StereoCamera
from ...mesher import ObjectMesher, ObjectMesherParams
from ..messages import MeshMessage, ShmImageHeader, StereoImageMessage
from ..pubsub import PubSub, UdpMulticastBus
from ..shm_ring import ShmRingReader


class ObjectMesherNode:
    def __init__(
        self,
        bus: PubSub,
        rig: StereoCamera,
        params: Optional[ObjectMesherParams] = None,
        mesher_input_height: Optional[int] = None,
        channel_input: str = "sensors/stereo",
        channel_output: str = "object_mesher/mesh",
    ):
        self.bus = bus
        self.rig = rig
        self.input_height = mesher_input_height
        self.channel_output = channel_output
        # Downscaled processing (object_mesher_lcm.cpp mesher_input_height
        # path): the mesher's camera must be RESCALED to the processing
        # resolution — pixels, disparities, AND the depth gates then stay
        # mutually consistent (scaling only the disparity would backproject
        # reduced-scale pixels through full-scale intrinsics).
        self._scale = 1.0
        mesher_rig = rig
        if mesher_input_height is not None and int(rig.left.height) > mesher_input_height:
            self._scale = mesher_input_height / float(rig.left.height)
            mesher_rig = rig.rescale(self._scale)
        self.mesher = ObjectMesher(params or ObjectMesherParams(), mesher_rig)
        self._shm_readers = {}
        bus.subscribe(channel_input, self._on_stereo)
        bus.subscribe(channel_input + "_shm_left", self._on_shm("left"))
        bus.subscribe(channel_input + "_shm_right", self._on_shm("right"))
        self._pending = {}

    def _maybe_downscale(self, img: np.ndarray) -> np.ndarray:
        if self.input_height is None or img.shape[0] <= self.input_height:
            return img
        import cv2

        w = int(round(img.shape[1] * self.input_height / img.shape[0]))
        return cv2.resize(img, (w, self.input_height))

    def _process(self, timestamp: int, left: np.ndarray, right: np.ndarray) -> None:
        left = self._maybe_downscale(left)
        right = self._maybe_downscale(right)
        mesh = self.mesher.process_stereo(left, right)
        if mesh.num_triangles > 0:
            self.bus.publish(
                self.channel_output,
                MeshMessage(timestamp=timestamp, vertices=mesh.vertices, triangles=mesh.triangles),
            )

    def _on_stereo(self, _ch, m: StereoImageMessage):
        self._process(m.timestamp, m.left.to_array(), m.right.to_array())

    def _on_shm(self, side: str):
        def handler(_ch, hdr: ShmImageHeader):
            reader = self._shm_readers.get(hdr.shm_path)
            if reader is None:
                reader = ShmRingReader(hdr.shm_path)
                self._shm_readers[hdr.shm_path] = reader
            frame = reader.read(hdr.seq)
            if frame is None:
                return
            _, img = frame
            pending = self._pending.setdefault(hdr.timestamp, {})
            pending[side] = img
            if "left" in pending and "right" in pending:
                del self._pending[hdr.timestamp]
                self._process(hdr.timestamp, pending["left"], pending["right"])

        return handler


def from_config(bus: PubSub, node_config_path: str, shared_config_path: str) -> "ObjectMesherNode":
    """Build the complete node from the two-file YAML model (reference:
    object_mesher_lcm.cpp params + config/auv/lcm_nodes/ObjectMesherLcm.yaml)."""
    from ...config.bindings import load_mesher_params, load_rig
    from ...config.yaml_parser import YamlParser

    parser = YamlParser(node_path=node_config_path, shared_path=shared_config_path)
    rig = load_rig(parser)
    params = load_mesher_params(parser)
    h = parser.get("mesher_input_height", None)
    return ObjectMesherNode(
        bus, rig, params=params,
        mesher_input_height=int(h) if h is not None else None,
        channel_input=parser.get("channel_input_stereo", "sensors/stereo"),
        channel_output=parser.get("channel_output_mesh", "object_mesher/mesh"),
    )


def main(argv=None) -> int:
    from ...utils.platform import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()  # axon overrides JAX_PLATFORMS; restore it
    enable_compile_cache()  # mission restarts skip the 1-5 min recompiles
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="node YAML (ObjectMesherNode.yaml)")
    ap.add_argument("--shared", default=None, help="shared rig YAML (config/shared/*.yaml)")
    ap.add_argument("--port", type=int, default=None, help="UDP multicast port")
    ap.add_argument("--fx", type=float, default=336.0)
    ap.add_argument("--baseline", type=float, default=0.2)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--mesher-input-height", type=int, default=None)
    ap.add_argument(
        "--lcm", action="store_true",
        help="speak real LCM wire format (interop with reference-era peers)",
    )
    args = ap.parse_args(argv)

    bus_cls = UdpMulticastBus
    if args.lcm:
        from ..lcm_wire import LcmUdpBus as bus_cls
    bus = bus_cls(port=args.port) if args.port else bus_cls()
    if args.config and args.shared:
        node = from_config(bus, args.config, args.shared)
    else:
        cam = PinholeCamera.create(args.fx, args.fx, args.width / 2, args.height / 2, args.height, args.width)
        rig = StereoCamera.create(cam, cam, args.baseline)
        node = ObjectMesherNode(bus, rig, mesher_input_height=args.mesher_input_height)
    print("object_mesher_node listening...")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
