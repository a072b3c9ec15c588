#!/usr/bin/env python
"""Multi-camera operating-point sweep for the single-chip perception step.

Measures total/per-camera streaming fps (bench.py methodology: digest-chained
lax.scan, scalar readback, min-of-3, perturbed inputs) at 720p over a grid of
{B, chunks, scan_unroll, internal_scale}. Maintains the table in
docs/PERFORMANCE.md ("multi-camera operating points").

Usage: python examples/sweep_operating_points.py [--points name1,name2] [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280


def make_inputs():
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    l = np.clip(canvas[:, 100 : 100 + W, None] * tint + 0.05, 0, 1)
    r = np.clip(canvas[:, 108 : 108 + W, None] * tint + 0.05, 0, 1)
    return jnp.asarray(l), jnp.asarray(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="")
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import PerceptionConfig, perception_step

    left, right = make_inputs()
    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)

    # name -> (B, config)
    points = {
        "B4": (4, PerceptionConfig(max_disp=128, internal_scale=2)),
        "B4_chunks8": (4, PerceptionConfig(max_disp=128, internal_scale=2, chunks=8)),
        "B8_unroll1": (8, PerceptionConfig(max_disp=128, internal_scale=2, scan_unroll=1)),
        "farm4_B4": (4, PerceptionConfig(max_disp=128, internal_scale=4)),
        "farm4_B8_unroll1": (8, PerceptionConfig(max_disp=128, internal_scale=4, scan_unroll=1)),
        "B6": (6, PerceptionConfig(max_disp=128, internal_scale=2)),
        # Whole-frame fused Pallas PatchMatch (interior fori_loop variant) —
        # single-kernel-win measured 2.81 vs 3.60 ms/frame; these decide the
        # end-to-end production default (bench_fused_perception.py overlaps).
        "B1_fused": (1, PerceptionConfig(max_disp=128, internal_scale=2,
                                         use_pallas_fused=True)),
        "B2_fused": (2, PerceptionConfig(max_disp=128, internal_scale=2,
                                         use_pallas_fused=True)),
        "B8_fused": (8, PerceptionConfig(max_disp=128, internal_scale=2,
                                         use_pallas_fused=True)),
    }
    sel = [s.strip() for s in args.points.split(",") if s.strip()] or list(points)

    n = args.frames
    print(f"720p, {n} frames/stream, min-of-3, total fps (per-camera):")
    for name in sel:
        B, config = points[name]
        bl = jnp.stack([left] * B)
        br = jnp.stack([right] * B)

        @jax.jit
        def stream(l, r, config=config, B=B):
            def frame(carry, i):
                out = jax.vmap(lambda a, b: perception_step(a, b, rig, config))(
                    l + carry * 1e-12 + i.astype(jnp.float32) * 1e-7, r
                )
                digest = jnp.sum(out.disparity) * 1e-6 + jnp.sum(
                    out.enhanced_left[:, ::64, ::64]
                )
                return digest, digest

            final, _ = jax.lax.scan(
                frame, jnp.asarray(0.0, jnp.float32), jnp.arange(max(1, n // B))
            )
            return final

        try:
            float(stream(bl, br))
        except Exception as e:  # noqa: BLE001 — report compile crashes per point
            print(f"  {name:18s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        best = np.inf
        for rep in range(3):
            t0 = time.perf_counter()
            float(stream(bl + np.float32((rep + 1) * 1e-7), br))
            best = min(best, time.perf_counter() - t0)
        steps = max(1, n // B)
        fps_total = steps * B / best
        print(f"  {name:18s} {fps_total:7.1f} total fps  ({fps_total / B:5.1f}/camera)")


if __name__ == "__main__":
    main()
