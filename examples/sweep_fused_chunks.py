#!/usr/bin/env python
"""Sweep the fused Pallas kernel's strip geometry (chunks) on the real TPU.

Motivation: for the XLA path, chunks=16 measured best (more strips cut the
sequential step count per pass but widen every slab — docs/PERFORMANCE.md
negative results). The FUSED kernel's economics differ: the carry chain of
~(3 iters x 4 passes x chunk length) propagation steps is its measured
critical path, strips ride the vector-lane axis, and volume tiles stay
VMEM-resident — so more strips might shorten the chain without the XLA
path's bandwidth penalty. This measures it instead of assuming.

Each chunks value is parity-checked against the SAME-chunks XLA path (the
fused kernel promises bit-identity per geometry; different geometries
legitimately differ in output), then streamed N digest-chained frames per
jit (bench.py methodology), min-of-repeats.

Usage: python examples/sweep_fused_chunks.py [--chunks 8,16,32] [--frames 30]
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
    ap.add_argument("--chunks", default="8,16,32")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W = 360, 640
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 64)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    l = jnp.asarray(canvas[:, 32 : 32 + W])
    r = jnp.asarray(canvas[:, 24 : 24 + W])

    def params(chunks: int, fused: bool) -> PatchMatchParams:
        return PatchMatchParams(
            max_disp=64, chunks=chunks, iters=3,
            right_wta=True, volume_bf16=True, subpixel=True, scan_unroll=0,
            use_pallas_fused=fused,
        )

    def stream_fn(p):
        @jax.jit
        def stream(li, ri):
            def frame(carry, i):
                perturb = carry * 1e-12 + i.astype(jnp.float32) * 1e-7
                out = patchmatch_disparity(li + perturb, ri, p)
                return jnp.sum(out.left_raw) * 1e-6, None

            final, _ = jax.lax.scan(
                frame, jnp.asarray(0.0, jnp.float32), jnp.arange(args.frames)
            )
            return final

        return stream

    out = {}
    for c in [int(v) for v in args.chunks.split(",")]:
        # Parity: fused vs XLA at the SAME geometry.
        a = np.asarray(patchmatch_disparity(l, r, params(c, False)).left_raw)
        b = np.asarray(patchmatch_disparity(l, r, params(c, True)).left_raw)
        eq = float((a == b).mean())
        row = {"parity_equal_frac": eq, "valid": round(float((a > 0).mean()), 3)}
        for name, fused in (("xla", False), ("fused", True)):
            fn = stream_fn(params(c, fused))
            t0 = time.perf_counter()
            float(fn(l, r))
            compile_s = time.perf_counter() - t0
            best = np.inf
            for rep in range(args.repeats):
                t0 = time.perf_counter()
                float(fn(l + np.float32((rep + 1) * 1e-7), r))
                best = min(best, time.perf_counter() - t0)
            row[f"{name}_ms_per_frame"] = round(best / args.frames * 1e3, 3)
            row[f"{name}_compile_s"] = round(compile_s, 1)
        row["fused_speedup_vs_xla"] = round(
            row["xla_ms_per_frame"] / row["fused_ms_per_frame"], 3
        )
        out[f"chunks={c}"] = row
        print(json.dumps({f"chunks={c}": row}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
