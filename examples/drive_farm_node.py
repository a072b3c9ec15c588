"""Drive the farm perception node end-to-end at 720p: publish N synthetic
camera streams on the UDP bus and report the node's sustained fleet rate.

This is the SYSTEM-level check of the farm package: the node process pays
real decode (u8 wire frames -> float), batching, the TPU dispatch, and the
host Delaunay + mesh publish per camera — everything between the wire and
the mesh channel. Start the node first, e.g.:

  python -m ocean_perception_tpu.fabric.nodes.farm_perception_node \
      --cameras 4 --port 7793 --stats-every 5

then:

  python examples/drive_farm_node.py --cameras 4 --port 7793 --fps 30 \
      --seconds 60
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cameras", type=int, default=4)
    ap.add_argument("--port", type=int, default=7793)
    ap.add_argument("--fps", type=float, default=30.0, help="per-camera publish rate")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args()

    import numpy as np

    from ocean_perception_tpu.fabric.messages import ImageMessage, StereoImageMessage
    from ocean_perception_tpu.fabric.pubsub import UdpMulticastBus

    H, W = args.height, args.width
    rng = np.random.default_rng(0)
    # Textured scene with a disparity-8 shift; quantized u8 wire frames.
    canvas = rng.random((H, W + 64)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)

    def u8_image(ts, arr):
        u8 = (np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8)
        return ImageMessage(ts, u8.shape[1], u8.shape[0], 1, "u8", u8.tobytes())

    frames = []
    for c in range(args.cameras):
        off = 4 * c
        left = canvas[:, off : off + W]
        right = canvas[:, off + 8 : off + 8 + W]
        frames.append((left, right))

    bus = UdpMulticastBus(port=args.port)
    meshes = [0] * args.cameras
    for c in range(args.cameras):
        bus.subscribe(
            f"farm/mesh/cam{c}",
            (lambda cc: (lambda _ch, m: meshes.__setitem__(cc, meshes[cc] + 1)))(c),
        )

    period = 1.0 / args.fps
    t_end = time.time() + args.seconds
    n = 0
    while time.time() < t_end:
        t0 = time.time()
        ts = int(t0 * 1e9)
        for c in range(args.cameras):
            l, r = frames[c]
            bus.publish(
                f"sensors/stereo/cam{c}",
                StereoImageMessage(ts, c, u8_image(ts, l), u8_image(ts, r)),
            )
        n += 1
        time.sleep(max(0.0, period - (time.time() - t0)))
    time.sleep(1.0)
    print(f"published {n} fleet frames x {args.cameras} cameras at {args.fps} fps")
    print(f"meshes received per camera: {meshes}")
    bus.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
