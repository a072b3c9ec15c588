#!/usr/bin/env python
"""Reconcile the B=1 stage profile: full perception step vs its stereo
subset, measured back-to-back in one process with the bench.py streaming
methodology (60-frame digest-chained scan, min-of-3, no slope).

Question: profile_b4_enhance --slope measured gray+pyr+patchmatch at
4.9 ms/frame while full_step (a superset) measured 3.36 — physically
impossible unless one number is rig-contention noise or the digests
drive different DCE. This script times, same-process:

  full_step      perception_step digest (strided enhanced + full disparity)
  stereo_full    pyr+patchmatch, digest = sum over ALL disparity pixels
  stereo_strided pyr+patchmatch, digest = sum over [::32, ::32]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280
N = 60


def main():
    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import PerceptionConfig, perception_step
    from ocean_perception_tpu.ops.image import pyr_down, to_grayscale
    from ocean_perception_tpu.stereo.api import StereoEngine, estimate_disparity
    from ocean_perception_tpu.stereo.patchmatch import PatchMatchParams

    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    left = canvas[:, 100 : 100 + W]
    right = canvas[:, 108 : 108 + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    l = jnp.asarray(np.clip(left[..., None] * tint + 0.05, 0, 1))
    r = jnp.asarray(np.clip(right[..., None] * tint + 0.05, 0, 1))

    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)
    config = PerceptionConfig(engine="patchmatch", max_disp=128, internal_scale=2)
    pm = PatchMatchParams(max_disp=64, chunks=16, right_wta=True, volume_bf16=True)

    def full_step(c, a, b):
        out = perception_step(a + c, b, rig, config)
        return jnp.sum(out.disparity) * 1e-6 + jnp.sum(out.enhanced_left[::64, ::64])

    def stereo(c, a, b, strided):
        ga = pyr_down(to_grayscale(a + c))
        gb = pyr_down(to_grayscale(b))
        res = estimate_disparity(ga, gb, engine=StereoEngine.PATCHMATCH, patchmatch_params=pm)
        d = res.left[::32, ::32] if strided else res.left
        return jnp.sum(d) * 1e-6

    variants = {
        "full_step": full_step,
        "stereo_full": lambda c, a, b: stereo(c, a, b, False),
        "stereo_strided": lambda c, a, b: stereo(c, a, b, True),
    }
    for name, fn in variants.items():
        @jax.jit
        def stream(a, b, fn=fn):
            def body(carry, i):
                d = fn(carry * 1e-12 + i.astype(jnp.float32) * 1e-7, a, b)
                return d, ()

            final, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(N))
            return final

        t0 = time.perf_counter()
        float(stream(l, r))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for rep in range(4):
            t0 = time.perf_counter()
            float(stream(l + np.float32((rep + 1) * 1e-7), r))
            best = min(best, time.perf_counter() - t0)
        print(
            f"  {name:16s} {best / N * 1e3:7.3f} ms/frame  "
            f"({N / best:6.1f} fps)  compile {compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
