#!/usr/bin/env python
"""Stage-level on-chip profile of the B=4 multi-camera perception step.

Round-3 question (docs/PERFORMANCE.md): past B=2 the chip saturates at
~160-190 total fps on "full-res image-domain work" — but WHICH work?
This ablation times each enhance/image stage at B=4, 720p, with the same
streaming methodology as bench.py (digest-chained lax.scan inside one
dispatch, scalar readback, min-of-N repeats, perturbed inputs).

Usage: python examples/profile_b4_enhance.py [--stages a,b,c] [--frames 40]
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


def make_inputs(B):
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    left = canvas[:, 100 : 100 + W]
    right = canvas[:, 108 : 108 + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    l = np.clip(left[..., None] * tint + 0.05, 0, 1)
    r = np.clip(right[..., None] * tint + 0.05, 0, 1)
    z = 2.0 + 3.0 * rng.random((H, W)).astype(np.float32)
    return (
        jnp.stack([jnp.asarray(l)] * B),
        jnp.stack([jnp.asarray(r)] * B),
        jnp.stack([jnp.asarray(z)] * B),
    )


def _time_once(fn, args, n_frames, n_repeats=3):
    @jax.jit
    def stream(*a):
        def body(carry, i):
            d = fn(carry * 1e-12 + i.astype(jnp.float32) * 1e-7, *a)
            return d, ()

        final, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_frames))
        return final

    float(stream(*args))  # compile + warm
    best = np.inf
    for rep in range(n_repeats):
        pa = [args[0] + np.float32((rep + 1) * 1e-7)] + list(args[1:])
        t0 = time.perf_counter()
        float(stream(*pa))
        best = min(best, time.perf_counter() - t0)
    return best


def time_stream(fn, args, n_frames, n_repeats=3, slope=False):
    """fn(carry, *args) -> digest scalar; scanned n_frames times.

    slope=True cancels the per-dispatch RPC floor (which can exceed the
    entire cost of a small stage's scan) by timing at n and 3n steps and
    taking (t_3n - t_n) / 2n — the floor is identical in both dispatches.
    """
    if not slope:
        return _time_once(fn, args, n_frames, n_repeats) / n_frames * 1e3
    t1 = _time_once(fn, args, n_frames, n_repeats)
    t3 = _time_once(fn, args, 3 * n_frames, n_repeats)
    return max(t3 - t1, 0.0) / (2 * n_frames) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--slope", action="store_true",
                    help="floor-cancelling two-length timing (see time_stream)")
    args = ap.parse_args()

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.imaging.backscatter import (
        estimate_backscatter,
        find_dark_mask,
        remove_backscatter,
        sample_masked_pixels,
    )
    from ocean_perception_tpu.imaging.enhance import EnhanceParams, enhance_underwater
    from ocean_perception_tpu.imaging.illuminant import estimate_illuminant_range_guided
    from ocean_perception_tpu.models.perception import PerceptionConfig, perception_step
    from ocean_perception_tpu.ops.image import compute_intensity, pyr_down, resize, to_grayscale

    B = args.batch
    l, r, z = make_inputs(B)
    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)
    config = PerceptionConfig(engine="patchmatch", max_disp=128, internal_scale=2)

    def v(f):
        # vmap composed with the fully-unrolled propagation scans trips the
        # XLA TPU fusion-emitter pad_low SIGABRT even at B=1 on this
        # toolchain (docs/PERFORMANCE.md) — at B=1, run unbatched and
        # re-add the axis instead.
        if B == 1:
            def g(*a):
                out = f(*[x[0] for x in a])
                return jax.tree.map(lambda x: x[None], out)

            return g
        return jax.vmap(f)

    stages = {}

    def full_step(c, l, r, z):
        out = v(lambda a, b: perception_step(a, b, rig, config))(l + c, r)
        return jnp.sum(out.disparity) * 1e-6 + jnp.sum(out.enhanced_left[:, ::64, ::64])

    stages["full_step"] = (full_step, (l, r, z))

    def enhance_full(c, l, r, z):
        out, info = v(lambda a, zz: enhance_underwater(a, zz))(l + c, z)
        return jnp.sum(out[:, ::64, ::64]) + jnp.sum(info.beta_D)

    stages["enhance_full"] = (enhance_full, (l, r, z))

    def gray_pyr(c, l, r, z):
        def one(a, b):
            ga, gb = to_grayscale(a), to_grayscale(b)
            return pyr_down(ga), pyr_down(gb)

        pa, pb = v(one)(l + c, r)
        return jnp.sum(pa[:, ::32, ::32]) + jnp.sum(pb[:, ::32, ::32])

    stages["gray_pyr"] = (gray_pyr, (l, r, z))

    def dark_mask_only(c, l, r, z):
        def one(a, zz):
            inten = compute_intensity(a)
            return jnp.sum(find_dark_mask(inten, zz).astype(jnp.float32))

        return jnp.sum(v(one)(l + c, z))

    stages["dark_mask"] = (dark_mask_only, (l, r, z))

    def topk_sample(c, l, r, z):
        def one(a, zz):
            inten = compute_intensity(a)
            dark = find_dark_mask(inten, zz)
            rgb, zs, valid = sample_masked_pixels(a, zz, dark, 256)
            return jnp.sum(rgb) + jnp.sum(zs) + jnp.sum(valid)

        return jnp.sum(v(one)(l + c, z))

    stages["dark+topk"] = (topk_sample, (l, r, z))

    def backscatter_fit(c, l, r, z):
        def one(a, zz):
            inten = compute_intensity(a)
            dark = find_dark_mask(inten, zz)
            fit = estimate_backscatter(a, zz, dark)
            return jnp.sum(fit.B) + fit.error

        return jnp.sum(v(one)(l + c, z))

    stages["dark+topk+lm"] = (backscatter_fit, (l, r, z))

    def illum_stage(c, l, r, z):
        def one(a, zz):
            il = estimate_illuminant_range_guided(a, zz, 852, 0.01, 8)
            return jnp.sum(il[:, ::64, ::64])

        return jnp.sum(v(one)(l + c, z))

    stages["illuminant"] = (illum_stage, (l, r, z))

    def elementwise(c, l, r, z):
        def one(a, zz):
            D = remove_backscatter(a, zz, jnp.float32([0.1, 0.2, 0.3]), jnp.float32([0.5, 0.6, 0.7]))
            out = D * jnp.exp(jnp.minimum(zz, 8.0))[..., None]
            return jnp.sum(out[:, ::64, ::64])

        return jnp.sum(v(one)(l + c, z))

    stages["elementwise_fullres"] = (elementwise, (l, r, z))

    def stereo_only(c, l, r, z):
        from ocean_perception_tpu.stereo.api import StereoEngine, estimate_disparity
        from ocean_perception_tpu.stereo.patchmatch import PatchMatchParams

        pm = PatchMatchParams(max_disp=64, chunks=16, right_wta=True, volume_bf16=True)

        def one(a, b):
            ga = pyr_down(to_grayscale(a))
            gb = pyr_down(to_grayscale(b))
            res = estimate_disparity(ga, gb, engine=StereoEngine.PATCHMATCH, patchmatch_params=pm)
            return jnp.sum(res.left[::32, ::32])

        return jnp.sum(v(one)(l + c, r))

    stages["gray+pyr+patchmatch"] = (stereo_only, (l, r, z))

    def upsample(c, l, r, z):
        def one(a, zz):
            small = pyr_down(to_grayscale(a))
            big = resize(small, (H, W), method="nearest")
            return jnp.sum(big[::64, ::64])

        return jnp.sum(v(one)(l + c, z))

    stages["gray+pyr+upsample"] = (upsample, (l, r, z))

    sel = [s.strip() for s in args.stages.split(",") if s.strip()] or list(stages)
    mode = "slope (floor-cancelled)" if args.slope else "min-of-3"
    print(f"B={B}, {args.frames} scan steps, {mode}, ms per step (all {B} cameras):")
    for name in sel:
        fn, a = stages[name]
        ms = time_stream(fn, a, args.frames, slope=args.slope)
        print(f"  {name:24s} {ms:8.3f} ms/step  ({ms / B:6.3f} ms/frame)")


if __name__ == "__main__":
    main()
