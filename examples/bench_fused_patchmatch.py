#!/usr/bin/env python
"""Measure the whole-frame fused Pallas PatchMatch kernel vs the XLA path on
the real TPU at the production operating point (360, 640, 64) bf16.

Streams N frames through each variant inside one jitted lax.scan (the
bench.py methodology: scalar host readback, per-frame input perturbation via
a digest chain, min-of-repeats on the shared rig).

Usage: python examples/bench_fused_patchmatch.py [--frames 30] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--parity-only", action="store_true")
    args = ap.parse_args()

    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W = 360, 640
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 64)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    l = jnp.asarray(canvas[:, 32 : 32 + W])
    r = jnp.asarray(canvas[:, 24 : 24 + W])

    base = dict(
        max_disp=64, chunks=16, iters=3,
        right_wta=True, volume_bf16=True, subpixel=True, scan_unroll=0,
    )
    p_xla = PatchMatchParams(**base)
    p_fused = PatchMatchParams(use_pallas_fused=True, **base)

    # Parity on the real chip first.
    a = np.asarray(patchmatch_disparity(l, r, p_xla).left_raw)
    b = np.asarray(patchmatch_disparity(l, r, p_fused).left_raw)
    eq = float((a == b).mean())
    max_diff = float(np.abs(a - b).max())
    print(f"parity: equal_frac={eq:.6f} max|diff|={max_diff:.5f} "
          f"valid={float((a > 0).mean()):.3f}")
    if args.parity_only:
        return

    def make_stream(p):
        @jax.jit
        def stream(li, ri):
            def frame(carry, i):
                perturb = carry * 1e-12 + i.astype(jnp.float32) * 1e-7
                out = patchmatch_disparity(li + perturb, ri, p)
                digest = jnp.sum(out.left_raw) * 1e-6
                return digest, None

            final, _ = jax.lax.scan(
                frame, jnp.asarray(0.0, jnp.float32), jnp.arange(args.frames)
            )
            return final

        return stream

    results = {}
    for name, p in (("xla", p_xla), ("fused", p_fused)):
        fn = make_stream(p)
        t0 = time.perf_counter()
        float(fn(l, r))  # compile + warm
        compile_s = time.perf_counter() - t0
        best = np.inf
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            float(fn(l + np.float32((rep + 1) * 1e-7), r))
            best = min(best, time.perf_counter() - t0)
        results[name] = dict(
            ms_per_frame=round(best / args.frames * 1e3, 3),
            fps=round(args.frames / best, 1),
            compile_s=round(compile_s, 1),
        )
        print(name, results[name])

    print(json.dumps({
        "parity_equal_frac": eq,
        "xla_ms_per_frame": results["xla"]["ms_per_frame"],
        "fused_ms_per_frame": results["fused"]["ms_per_frame"],
        "speedup": round(results["xla"]["ms_per_frame"] / results["fused"]["ms_per_frame"], 3),
    }))


if __name__ == "__main__":
    main()
