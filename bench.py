#!/usr/bin/env python
"""Headline benchmark: enhance + PatchMatch depth at 1280x720, frames/sec/chip.

Target (BASELINE.json): >= 60 fps/chip on TPU with the reference operating
point (/2 internal downsample, max_disp 128 full-scale). Prints ONE JSON line:
    {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}

Run with no args on the TPU terminal. First call pays remote compile.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280
BASELINE_FPS = 60.0
ENGINE = "patchmatch" if "--sgm" not in sys.argv else "sgm"


def make_inputs():
    """Synthetic 720p underwater stereo scene with a known disparity layout."""
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    # Smooth it so the cost has structure.
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    canvas = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, canvas)
    left = canvas[:, 100 : 100 + W]
    right = np.roll(canvas, 8, axis=1)[:, 100 : 100 + W]  # ~8 px disparity
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    left_rgb = np.clip(left[..., None] * tint + 0.05, 0, 1)
    right_rgb = np.clip(right[..., None] * tint + 0.05, 0, 1)
    return jnp.asarray(left_rgb), jnp.asarray(right_rgb)


def main() -> None:
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import (
        PerceptionConfig,
        perception_step,
    )

    left, right = make_inputs()
    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)
    config = PerceptionConfig(engine=ENGINE, max_disp=128, internal_scale=2)

    step = jax.jit(lambda l, r: perception_step(l, r, rig, config))

    out = step(left, right)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(left, right)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"enhance+{ENGINE}_depth_720p_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
