#!/usr/bin/env python
"""Underwater enhancement demo on the bundled Sea-thru fixtures.

    python examples/enhance_demo.py --out /tmp/enhance
    python examples/enhance_demo.py --image my.png --depth my_depth.exr

Writes before/after PNGs and prints the fit diagnostics (reference:
test/imaging/enhance_test.cpp, but headless and numeric).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None, help="RGB image (default: reference D5-3374 fixture)")
    ap.add_argument("--depth", default=None, help="range map (.exr or image)")
    ap.add_argument("--out", default="/tmp/enhance_demo")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--site-guess", type=int, default=2, choices=[1, 2])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocean_perception_tpu.imaging import EnhanceSequence
    from ocean_perception_tpu.imaging.formation import BETA_GUESS_1, BETA_GUESS_2
    from ocean_perception_tpu.utils.exr import read_exr
    from ocean_perception_tpu.utils.image_io import load_image, reference_resource, save_image

    image_path = args.image or reference_resource("test_images_enhance/images/3374_bluegreen.png")
    depth_path = args.depth or reference_resource("test_images_enhance/depth/depth_3374.exr")

    rgb = load_image(image_path)
    depth = read_exr(depth_path) if depth_path.endswith(".exr") else load_image(depth_path, True) * 20.0
    if depth.ndim == 3:
        depth = depth[..., 0]

    import cv2

    scale = args.width / rgb.shape[1]
    size = (args.width, int(rgb.shape[0] * scale))
    rgb_s = cv2.resize(rgb, size)
    dep_s = cv2.resize(depth.astype(np.float32), size)

    guess = BETA_GUESS_2 if args.site_guess == 2 else BETA_GUESS_1
    seq = EnhanceSequence(beta_D_guess=jnp.asarray(guess))
    out, info = seq(rgb_s, dep_s)
    o = np.clip(np.asarray(out), 0, 1)

    os.makedirs(args.out, exist_ok=True)
    save_image(os.path.join(args.out, "input.png"), rgb_s)
    save_image(os.path.join(args.out, "enhanced.png"), o)
    print(f"backscatter: err={float(info.error_backscatter):.4f} success={bool(info.success_backscatter)}")
    print(f"  B={np.round(np.asarray(info.B), 3)} beta_B={np.round(np.asarray(info.beta_B), 3)}")
    print(f"attenuation: err={float(info.error_attenuation):.3f}")
    print(f"mean RGB: {np.round(rgb_s.mean((0, 1)), 3)} -> {np.round(o.mean((0, 1)), 3)}")
    print(f"wrote {args.out}/input.png and {args.out}/enhanced.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
