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
    ap.add_argument("--variants", default="",
                    help="comma list of fused,fused_loop (xla always runs)")
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
    variants = {
        "xla": p_xla,
        "fused": PatchMatchParams(
            use_pallas_fused=True, fused_inner_loop=False, **base
        ),
        "fused_loop": PatchMatchParams(
            use_pallas_fused=True, fused_inner_loop=True, **base
        ),
    }
    if args.variants:
        sel = ["xla"] + [v.strip() for v in args.variants.split(",") if v.strip() != "xla"]
        variants = {k: variants[k] for k in sel}

    # Parity on the real chip first.
    a = np.asarray(patchmatch_disparity(l, r, p_xla).left_raw)
    for name, p in variants.items():
        if name == "xla":
            continue
        t0 = time.perf_counter()
        b = np.asarray(patchmatch_disparity(l, r, p).left_raw)
        eq = float((a == b).mean())
        max_diff = float(np.abs(a - b).max())
        print(f"parity[{name}]: equal_frac={eq:.6f} max|diff|={max_diff:.5f} "
              f"valid={float((a > 0).mean()):.3f} "
              f"(compile+run {time.perf_counter() - t0:.0f}s)", flush=True)
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
    for name, p in variants.items():
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

    out = {"parity_equal_frac": eq}
    for name, res in results.items():
        out[f"{name}_ms_per_frame"] = res["ms_per_frame"]
        out[f"{name}_compile_s"] = res["compile_s"]
        if name != "xla":
            out[f"{name}_speedup_vs_xla"] = round(
                results["xla"]["ms_per_frame"] / res["ms_per_frame"], 3
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
