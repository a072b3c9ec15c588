#!/usr/bin/env python
"""Mesher demo: run ObjectMesher on a dataset without any bus (reference:
src/sandbox/mesher_demo). Saves foreground masks and mesh PLYs per frame.

    python examples/mesher_demo.py --dataset himb --path /data/himb --out /tmp/mesher
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="himb")
    ap.add_argument("--path", required=True)
    ap.add_argument("--out", default="/tmp/mesher_demo")
    ap.add_argument("--fx", type=float, default=336.0)
    ap.add_argument("--baseline", type=float, default=0.2)
    ap.add_argument("--max-frames", type=int, default=20)
    args = ap.parse_args()

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.datasets import get_dataset_by_name
    from ocean_perception_tpu.mesher import ObjectMesher, ObjectMesherParams
    from ocean_perception_tpu.vio.visualizer import write_ply

    os.makedirs(args.out, exist_ok=True)
    ds = get_dataset_by_name(args.dataset, args.path)
    first = ds.stereo_data[0]
    from ocean_perception_tpu.utils.image_io import load_image

    sample = load_image(first.left_path, True)
    H, W = sample.shape
    cam = PinholeCamera.create(args.fx, args.fx, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, args.baseline)
    mesher = ObjectMesher(ObjectMesherParams(), rig)

    count = [0]

    def on_stereo(img):
        if count[0] >= args.max_frames:
            return
        mesh = mesher.process_stereo(img.left, img.right)
        if mesh.num_triangles:
            path = os.path.join(args.out, f"mesh_{img.timestamp}.ply")
            write_ply(path, mesh.vertices, mesh.triangles)
            print(f"frame {count[0]}: {mesh.num_triangles} triangles -> {path}")
        else:
            print(f"frame {count[0]}: no mesh yet")
        count[0] += 1

    ds.register_stereo_callback(on_stereo)
    while ds.step() and count[0] < args.max_frames:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
