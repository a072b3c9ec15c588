"""A/B the per-point window extraction strategies on the real chip.

The lk-mode ablation (docs/PERFORMANCE.md) concluded the fleet tracking cost
is dominated by work common to all LK iteration modes: the per-point
template/slack-window extraction. This measures the two candidate
implementations in isolation, at the fleet shape (K points x levels x
directions), using the bench.py scan methodology (N chained extractions in
one jit; slope between N and 3N cancels the RPC floor).

  dslice : jax.vmap(lax.dynamic_slice)  — lowers to a gather on TPU
  onehot : row one-hot einsum (MXU) + per-point column one-hot batched dot

Both produce bit-identical windows (0/1 f32 weights select exactly).

Usage: python examples/profile_window_gather.py [--K 200] [--B 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=200)
    ap.add_argument("--B", type=int, default=1, help="camera batch (fleet shape)")
    ap.add_argument("--H", type=int, default=368)
    ap.add_argument("--W", type=int, default=648)
    ap.add_argument("--ws", type=int, default=28)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    K, B, H, W, ws = args.K, args.B, args.H, args.W, args.ws

    def extract_dslice(img, y0, x0):
        # (K,) origins -> (K, ws, ws) windows, the current _dslice pattern.
        def one(y, x):
            return jax.lax.dynamic_slice(img, (y, x), (ws, ws))

        return jax.vmap(one)(y0, x0)

    def extract_onehot(img, y0, x0):
        # Rows via one MXU einsum, columns via a per-point batched dot.
        ia = jnp.arange(ws, dtype=jnp.int32)
        rows = y0[:, None] + ia[None, :]          # (K, ws)
        cols = x0[:, None] + ia[None, :]          # (K, ws)
        ih = jnp.arange(img.shape[0], dtype=jnp.int32)
        iw = jnp.arange(img.shape[1], dtype=jnp.int32)
        R = (rows[..., None] == ih).astype(img.dtype)   # (K, ws, H)
        C = (cols[..., None] == iw).astype(img.dtype)   # (K, ws, W)
        strip = jnp.einsum("kah,hw->kaw", R, img)       # MXU
        return jnp.einsum("kaw,kbw->kab", strip, C)     # batched dot

    def extract_rowslice(img, y0, x0):
        # Row strip via dynamic_slice (y-offset only; rows are lane-aligned
        # contiguous), then columns via the per-point one-hot batched dot.
        ia = jnp.arange(ws, dtype=jnp.int32)
        iw = jnp.arange(img.shape[1], dtype=jnp.int32)
        cols = x0[:, None] + ia[None, :]
        C = (cols[..., None] == iw).astype(img.dtype)   # (K, ws, W)

        def strip_one(y):
            return jax.lax.dynamic_slice(img, (y, 0), (ws, img.shape[1]))

        strip = jax.vmap(strip_one)(y0)                 # (K, ws, W)
        return jnp.einsum("kaw,kbw->kab", strip, C)

    def chain(extract):
        def step(carry, t):
            img, acc = carry
            # Perturb origins per step so nothing is loop-invariant.
            y0 = ((jnp.arange(K) * 37 + t * 13) % (H - ws)).astype(jnp.int32)
            x0 = ((jnp.arange(K) * 61 + t * 7) % (W - ws)).astype(jnp.int32)
            if B > 1:
                win = jax.vmap(lambda im: extract(im, y0, x0))(img)
            else:
                win = extract(img, y0, x0)
            s = jnp.sum(win)
            # Data dependency: feed the digest back into the image.
            img = img + s * 1e-12
            return (img, acc + s), None

        def run(img, n):
            (img, acc), _ = jax.lax.scan(
                step, (img, jnp.float32(0)), jnp.arange(n)
            )
            return acc + jnp.sum(img) * 0

        return run

    shape = (B, H, W) if B > 1 else (H, W)
    rng = np.random.default_rng(0)

    for name, ex in (
        ("dslice", extract_dslice),
        ("onehot", extract_onehot),
        ("rowslice", extract_rowslice),
    ):
        run = chain(ex)
        jit1 = jax.jit(run, static_argnums=1)
        times = {}
        for n in (args.steps, 3 * args.steps):
            best = float("inf")
            for rep in range(3):
                img = jnp.asarray(rng.random(shape, dtype=np.float32))
                float(jit1(img, n))  # warm / compile
                img = jnp.asarray(rng.random(shape, dtype=np.float32))
                t0 = time.perf_counter()
                float(jit1(img, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        slope_ms = (times[3 * args.steps] - times[args.steps]) / (2 * args.steps) * 1e3
        per_pt_us = slope_ms * 1e3 / (K * max(B, 1))
        print(
            f"{name}: {slope_ms:.3f} ms/extraction-step (K={K}, B={B}, "
            f"{ws}x{ws} from {H}x{W}) = {per_pt_us:.2f} us/window"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
