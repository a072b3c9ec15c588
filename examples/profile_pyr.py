#!/usr/bin/env python
"""Micro-bench pyr_down formulations at (720, 1280), B=4.

The floor-cancelled B=4 profile (profile_b4_enhance.py --slope) shows
gray+pyr costs ~0.96 ms/frame — ~25x off pure-bandwidth speed-of-light
for a 5-tap blur + 2x decimation. Hypothesis: the stride-2 slice on the
lane (W) axis forces an expensive relayout. Candidates:

  shifts   — current: separable shifted adds, then [::2, ::2]
  mm_both  — banded decimation matmuls both axes (MXU, Precision.HIGHEST)
  mm_lane  — matmul on W only; shifts + [::2] slice on H
  conv     — lax.conv_general_dilated, stride 2, 5x1 and 1x5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from profile_b4_enhance import time_stream

H, W, B = 720, 1280, 4

_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


@functools.lru_cache(maxsize=8)
def _dec_matrix(n: int) -> np.ndarray:
    m = -(-n // 2)
    D = np.zeros((m, n), np.float32)
    for i in range(m):
        for k in range(5):
            j = 2 * i + k - 2
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * n - 2 - j
            D[i, j] += _K[k]
    return D


def pyr_shifts(x):
    from ocean_perception_tpu.ops.image import pyr_down

    return pyr_down(x)


def pyr_mm_both(x):
    Dv = jnp.asarray(_dec_matrix(x.shape[0]))
    Dh = jnp.asarray(_dec_matrix(x.shape[1]))
    hi = jax.lax.Precision.HIGHEST
    return jnp.dot(jnp.dot(Dv, x, precision=hi), Dh.T, precision=hi)


def pyr_mm_lane(x):
    from ocean_perception_tpu.ops.image import _pad_reflect101

    Dh = jnp.asarray(_dec_matrix(x.shape[1]))
    hi = jax.lax.Precision.HIGHEST
    p = _pad_reflect101(x, 2, 0)
    acc = sum(w * p[i : i + x.shape[0], :] for i, w in enumerate(_K))
    return jnp.dot(acc[::2, :], Dh.T, precision=hi)


def pyr_conv(x):
    k2 = jnp.asarray(np.outer(_K, _K))[None, None]
    from ocean_perception_tpu.ops.image import _pad_reflect101

    p = _pad_reflect101(x, 2, 2)[None, None]
    out = jax.lax.conv_general_dilated(p, k2, (2, 2), "VALID")
    return out[0, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.random((B, H, W), dtype=np.float32))

    variants = {
        "shifts": pyr_shifts,
        "mm_both": pyr_mm_both,
        "mm_lane": pyr_mm_lane,
        "conv": pyr_conv,
    }
    ref = None
    print(f"B={B} ({H},{W})->half, slope-timed, ms per step (all {B} images):")
    for name, f in variants.items():
        out = jax.jit(jax.vmap(f))(g)
        if ref is None:
            ref = np.asarray(out)
        else:
            d = float(np.max(np.abs(np.asarray(out) - ref)))
            print(f"  [{name}] max|diff vs shifts| = {d:.3e}")

        def stage(c, x, f=f):
            y = jax.vmap(f)(x + c)
            return jnp.sum(y[:, ::32, ::32])

        ms = time_stream(stage, (g,), args.frames, slope=True)
        print(f"  {name:10s} {ms:8.3f} ms/step  ({ms / B:6.3f} ms/image)")


if __name__ == "__main__":
    main()
