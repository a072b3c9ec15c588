#!/usr/bin/env python
"""End-to-end perception_step with the fused-loop Pallas PatchMatch kernel
vs the XLA path, on the real TPU (bench.py streaming methodology).

Also checks the fused kernel under vmap (the multi-camera batch axis maps
to a pallas grid dimension) at B=2/B=4.

Usage: python examples/bench_fused_perception.py [--frames 60] [--batches 1,2,4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--internal-scale", type=int, default=2,
                    help="2 = production point; 4 = farm mode")
    ap.add_argument("--modes", default="xla,fused",
                    help="comma list of {xla, fused, build}: build = fused "
                         "kernel + in-kernel cost-volume build "
                         "(ops/pallas/volume_build.py)")
    args = ap.parse_args()

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import PerceptionConfig, perception_step

    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    left = canvas[:, 100 : 100 + W]
    right = canvas[:, 108 : 108 + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    l = jnp.asarray(np.clip(left[..., None] * tint + 0.05, 0, 1))
    r = jnp.asarray(np.clip(right[..., None] * tint + 0.05, 0, 1))

    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)

    N = args.frames
    for B in [int(b) for b in args.batches.split(",")]:
        for mode in args.modes.split(","):
            fused = mode in ("fused", "build")
            cfg = PerceptionConfig(
                engine="patchmatch", max_disp=128,
                internal_scale=args.internal_scale,
                use_pallas_fused=fused,
                use_pallas_build=(mode == "build"),
            )

            if B == 1:
                def one(c, a, b, cfg=cfg):
                    out = perception_step(a + c, b, rig, cfg)
                    return (
                        jnp.sum(out.disparity) * 1e-6
                        + jnp.sum(out.enhanced_left[::64, ::64])
                    )
                la, ra = l, r
            else:
                def one(c, a, b, cfg=cfg):
                    out = jax.vmap(lambda x, y: perception_step(x, y, rig, cfg))(
                        a + c, b
                    )
                    return (
                        jnp.sum(out.disparity) * 1e-6
                        + jnp.sum(out.enhanced_left[:, ::64, ::64])
                    )
                la = jnp.stack([l] * B)
                ra = jnp.stack([r] * B)

            @jax.jit
            def stream(a, b, one=one):
                def body(carry, i):
                    return one(carry * 1e-12 + i.astype(jnp.float32) * 1e-7, a, b), ()

                final, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(N // B))
                return final

            try:
                t0 = time.perf_counter()
                float(stream(la, ra))
                compile_s = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001 — report and continue the sweep
                print(f"  B={B} mode={mode:5s}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            best = np.inf
            for rep in range(args.repeats):
                t0 = time.perf_counter()
                float(stream(la + np.float32((rep + 1) * 1e-7), ra))
                best = min(best, time.perf_counter() - t0)
            steps = N // B
            total_fps = steps * B / best
            print(
                f"  B={B} mode={mode:5s}: {best / steps * 1e3:7.2f} ms/step "
                f"{total_fps:7.1f} total fps ({total_fps / B:6.1f}/cam)  "
                f"compile {compile_s:.0f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
