"""Micro-bench: pyramidal LK tracking cost per frame on the real TPU chip.

The fleet ablation (docs/PERFORMANCE.md round-3) showed the farm step is
per-POINT bound in the bidirectional LK walk (~31 us/pt/cam/frame). This
bench isolates track_points at 720p and compares the matmul-resample
iterations against the correlation-surface iterations (LKParams.corr_iters).

Method per CLAUDE.md: N tracking steps chained inside ONE jitted scan (the
next frame of step i is a rolled/perturbed function of the carry, so nothing
is cacheable), scalar digest readback forces completion, min-of-R repeats.
Run with --slope to difference N and 3N scans and cancel the dispatch floor.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ocean_perception_tpu.tracking.lk import LKParams, track_points
from ocean_perception_tpu.utils.platform import enable_compile_cache


def make_inputs(H, W, K, seed=0):
    rng = np.random.default_rng(seed)
    import cv2

    im = rng.random((H, W)).astype(np.float32)
    im = cv2.GaussianBlur(im, (5, 5), 1.2) * 0.7 + 0.15
    pts = cv2.goodFeaturesToTrack(im, maxCorners=K, qualityLevel=0.005, minDistance=9)
    pts = pts.reshape(-1, 2).astype(np.float32)
    if len(pts) < K:  # pad by tiling with jitter
        extra = pts[rng.integers(0, len(pts), K - len(pts))] + rng.normal(0, 3, (K - len(pts), 2)).astype(np.float32)
        pts = np.concatenate([pts, extra])
    return jnp.asarray(im), jnp.asarray(pts[:K])


def build_step(params: LKParams, n_frames: int):
    @jax.jit
    def run(im, pts):
        def step(carry, i):
            cur_pts, digest = carry
            # A slightly shifted next frame per step: roll + tiny brightness
            # ramp keyed on i so no two steps see identical inputs.
            nxt = jnp.roll(im, shift=1 + (i % 2), axis=1) * (1.0 + 1e-4 * i)
            res = track_points(im, nxt, cur_pts, jnp.ones(cur_pts.shape[0], bool), params)
            new_pts = jnp.where(res.status[:, None], res.points, cur_pts)
            digest = digest + jnp.sum(new_pts) + jnp.sum(res.status)
            return (jnp.where(res.status[:, None], cur_pts, new_pts), digest), None

        (_, digest), _ = jax.lax.scan(step, (pts, jnp.float32(0.0)), jnp.arange(n_frames))
        return digest

    return run


def time_run(run, im, pts, repeats):
    best = float("inf")
    for r in range(repeats):
        p = pts + np.float32(r) * 1e-3
        t0 = time.perf_counter()
        float(run(im, p))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--slope", action="store_true", help="difference N and 3N scans")
    ap.add_argument("--modes", default="matmul,corr")
    args = ap.parse_args()

    enable_compile_cache()
    im, pts = make_inputs(args.height, args.width, args.k)
    print(f"device={jax.devices()[0].platform} {args.height}x{args.width} K={args.k} frames={args.frames}")

    for mode in args.modes.split(","):
        base, _, u = mode.partition("-u")
        params = LKParams(
            corr_iters=base.startswith("corr") or base == "pallas",
            corr_impl="slices" if base == "corrsl" else "einsum",
            exit_unroll=int(u) if u else 1,
            pallas_iters=(base == "pallas"),
        )
        run1 = build_step(params, args.frames)
        t1 = time_run(run1, im, pts, args.repeats)
        if args.slope:
            run3 = build_step(params, 3 * args.frames)
            t3 = time_run(run3, im, pts, args.repeats)
            per = (t3 - t1) / (2 * args.frames)
        else:
            per = t1 / args.frames
        print(f"mode={mode:7s} total={t1*1e3:8.2f} ms  per-frame={per*1e3:7.3f} ms  ({args.k} pts, bidirectional)")


if __name__ == "__main__":
    main()
