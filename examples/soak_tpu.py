"""Sustained-throughput soak of the production perception step on real TPU.

bench.py reports min-of-3 60-frame bursts; this drives the SAME streaming
program continuously for --seconds wall-clock and reports the distribution
of per-dispatch throughput, so rig contention / thermal / tunnel jitter are
visible instead of hidden by the min. The production default config is used
as-is (fused Pallas kernel AUTO on TPU).

Run:  python examples/soak_tpu.py --seconds 120
Output: one JSON line {fps_median, fps_p10, fps_min, fps_max, dispatches,...}

Methodology notes (CLAUDE.md): completion is forced by a scalar host
readback per dispatch; inputs are perturbed per dispatch via the previous
digest so no execution cache can short-circuit; each dispatch scans
--frames digest-chained frames so the ~50-130 ms RPC floor is amortized.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--frames", type=int, default=60, help="frames per dispatch")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--internal-scale", type=int, default=2)
    args = ap.parse_args()

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import (
        PerceptionConfig,
        perception_step,
    )

    H, W = 720, 1280
    rng = np.random.default_rng(7)
    canvas = rng.random((H, W + 160, 3)).astype(np.float32)
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    left = np.clip(canvas[:, 80 : 80 + W] * tint + 0.05, 0, 1)
    right = np.clip(np.roll(canvas, 24, axis=1)[:, 80 : 80 + W] * tint + 0.05, 0, 1)
    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)
    config = PerceptionConfig(
        engine="patchmatch", max_disp=128, internal_scale=args.internal_scale
    )

    B, N = args.batch, args.frames
    if B > 1:
        left = np.stack([left] * B)
        right = np.stack([right] * B)

    @jax.jit
    def stream(l, r):
        def frame(carry, i):
            out_fn = (
                (lambda a, b: perception_step(a, b, rig, config))
                if B == 1
                else jax.vmap(lambda a, b: perception_step(a, b, rig, config))
            )
            out = out_fn(l + carry * 1e-12 + i.astype(jnp.float32) * 1e-7, r)
            sl = out.enhanced_left[::64, ::64] if B == 1 else out.enhanced_left[:, ::64, ::64]
            digest = jnp.sum(out.disparity) * 1e-6 + jnp.sum(sl)
            return digest, digest

        final, _ = jax.lax.scan(
            frame, jnp.asarray(0.0, jnp.float32), jnp.arange(N)
        )
        return final

    l = jnp.asarray(left)
    r = jnp.asarray(right)
    t0 = time.perf_counter()
    digest = float(stream(l, r))  # compile + warm
    compile_s = time.perf_counter() - t0

    fps_samples = []
    t_start = time.perf_counter()
    k = 0
    while time.perf_counter() - t_start < args.seconds:
        t0 = time.perf_counter()
        digest = float(stream(l + np.float32(digest * 1e-9 + (k + 1) * 1e-7), r))
        dt = time.perf_counter() - t0
        fps_samples.append(N * B / dt)
        k += 1

    fps = np.asarray(fps_samples)
    print(
        json.dumps(
            {
                "metric": "sustained_perception_fps",
                "seconds": round(time.perf_counter() - t_start, 1),
                "dispatches": int(fps.size),
                "frames_total": int(fps.size * N * B),
                "batch": B,
                "internal_scale": args.internal_scale,
                "fps_median": round(float(np.median(fps)), 2),
                "fps_p10": round(float(np.percentile(fps, 10)), 2),
                "fps_min": round(float(fps.min()), 2),
                "fps_max": round(float(fps.max()), 2),
                "compile_or_cache_load_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
