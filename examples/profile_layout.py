#!/usr/bin/env python
"""Micro-bench: channels-minor (H, W, 3) vs planar (3, H, W) RGB layout.

Hypothesis (round 3): every full-res RGB op in the enhance path reads a
(720, 1280, 3) array whose minormost dim (3) is padded to the 128-lane
vector register — a ~42x HBM-bandwidth blowup that explains why
elementwise stages measure ~30x off speed-of-light in
examples/profile_b4_enhance.py. If planar wins big, re-lay the imaging
pipeline CHW internally.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B, N = 720, 1280, 4, 40


def time_stream(fn, args, n_repeats=3):
    @jax.jit
    def stream(*a):
        def body(carry, i):
            return fn(carry * 1e-12 + i.astype(jnp.float32) * 1e-7, *a), ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(N))
        return final

    float(stream(*args))
    best = np.inf
    for rep in range(n_repeats):
        pa = [args[0] + np.float32((rep + 1) * 1e-7)] + list(args[1:])
        t0 = time.perf_counter()
        float(stream(*pa))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


def main():
    rng = np.random.default_rng(0)
    hwc = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
    chw = jnp.asarray(np.moveaxis(np.asarray(hwc), -1, 1).copy())
    gray = jnp.asarray(rng.random((B, H, W), dtype=np.float32))
    w3 = jnp.float32([0.299, 0.587, 0.114])

    def gray_hwc(c, x):
        g = (x + c) @ w3
        return jnp.sum(g[:, ::64, ::64])

    def gray_chw(c, x):
        g = jnp.einsum("bchw,c->bhw", x + c, w3)
        return jnp.sum(g[:, ::64, ::64])

    def copy_gray(c, x):
        y = x * 1.0001 + c
        return jnp.sum(y[:, ::64, ::64])

    def exp_hwc(c, x):
        # enhance-like elementwise: per-channel scale + exp
        y = (x + c) * jnp.exp(-0.1 * x)
        return jnp.sum(y[:, ::64, ::64, :])

    def exp_chw(c, x):
        y = (x + c) * jnp.exp(-0.1 * x)
        return jnp.sum(y[:, :, ::64, ::64])

    for name, fn, a in [
        ("gray_hwc   (B,H,W,3)", gray_hwc, hwc),
        ("gray_chw   (B,3,H,W)", gray_chw, chw),
        ("copy_gray  (B,H,W)  ", copy_gray, gray),
        ("exp_hwc    (B,H,W,3)", exp_hwc, hwc),
        ("exp_chw    (B,3,H,W)", exp_chw, chw),
    ]:
        ms = time_stream(fn, (a,))
        print(f"  {name}  {ms:7.3f} ms/step ({ms / B:6.3f} ms/frame)")


if __name__ == "__main__":
    main()
