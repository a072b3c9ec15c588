"""Probe Mosaic primitives for the fused LK prep kernel (round 5).

The spill-free tracking kernel needs per-point (S, S) window extraction at
dynamic origins from a VMEM- or HBM-resident pyramid level, plus a
(Kp, S*S) -> (S*S, Kp) layout flip into the lane-major form the VPU stages
want. Mosaic's support/cost for the candidate primitives is undocumented on
this toolchain — this probe compiles and times each in isolation on the
real chip (slope method: N vs 3N kernel-internal repeats cancels dispatch):

  vds   : per-point vector read  img[pl.ds(y0,S), pl.ds(x0,S)] -> wins[k]
  dma   : per-point async copy   img.at[ds,ds] -> wins.at[k]   (VMEM src)
  dmah  : same but src ref left in ANY (compiler may keep it in HBM)
  dmar  : ring src (R, H, W) in ANY with per-point dynamic slot index
  tpose : (Kp, S*S) -> (S*S, Kp) via jnp.swapaxes inside the kernel
  tdot  : same flip via dot_general against an identity (MXU fallback)

Each variant runs K extractions per inner rep inside ONE kernel; origins
are read from an input so nothing folds. Parity vs numpy slicing is checked
on the first call.

Usage: python examples/probe_mosaic_extract.py [--variants vds,dma] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="vds,dma,dmah,dmar,tpose,tdot")
    ap.add_argument("--K", type=int, default=256)
    ap.add_argument("--S", type=int, default=32)
    ap.add_argument("--H", type=int, default=744)
    ap.add_argument("--W", type=int, default=1304)
    ap.add_argument("--R", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8, help="base inner repeat count")
    ap.add_argument("--cpu", action="store_true", help="interpret-mode sanity run")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = args.cpu
    K, S, H, W, R = args.K, args.S, args.H, args.W, args.R
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    ring = jnp.asarray(rng.random((R, H, W)).astype(np.float32))
    y0 = jnp.asarray(rng.integers(0, H - S, K).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, W - S, K).astype(np.int32))
    src = jnp.asarray(rng.integers(0, R, K).astype(np.int32))

    def expected(im, use_src=False):
        out = np.zeros((K, S, S), np.float32)
        imn = np.asarray(im)
        for k in range(K):
            base = imn[int(src[k])] if use_src else imn
            out[k] = base[int(y0[k]) : int(y0[k]) + S, int(x0[k]) : int(x0[k]) + S]
        return out

    # -- extraction kernels ---------------------------------------------------

    def vds_kernel(org_ref, img_ref, out_ref, *, reps):
        def rep(i, acc):
            def body(k, _):
                yy = org_ref[0, k]
                xx = org_ref[1, k] + i - i  # depend on rep index; stays == x0
                out_ref[k] = img_ref[pl.ds(yy, S), pl.ds(xx, S)]
                return 0

            return jax.lax.fori_loop(0, K, body, 0)

        jax.lax.fori_loop(0, reps, rep, 0)

    def dma_kernel(org_ref, img_ref, out_ref, sem, *, reps, n_sem):
        def rep(i, acc):
            def start(k, _):
                pltpu.make_async_copy(
                    img_ref.at[pl.ds(org_ref[0, k], S), pl.ds(org_ref[1, k] + i - i, S)],
                    out_ref.at[k],
                    sem.at[k % n_sem],
                ).start()
                return 0

            def wait(k, _):
                pltpu.make_async_copy(
                    img_ref.at[pl.ds(org_ref[0, k], S), pl.ds(org_ref[1, k], S)],
                    out_ref.at[k],
                    sem.at[k % n_sem],
                ).wait()
                return 0

            # n_sem copies in flight: start a window ahead, wait behind.
            def body(k, _):
                @pl.when(k < K)
                def _():
                    start(k, 0)

                @pl.when(k >= n_sem)
                def _():
                    wait(k - n_sem, 0)

                return 0

            jax.lax.fori_loop(0, K + n_sem, body, 0)
            return 0

        jax.lax.fori_loop(0, reps, rep, 0)

    def dmar_kernel(org_ref, src_ref, img_ref, out_ref, sem, *, reps, n_sem):
        def rep(i, acc):
            def body(k, _):
                @pl.when(k < K)
                def _():
                    kk = k
                    pltpu.make_async_copy(
                        img_ref.at[
                            src_ref[0, kk],
                            pl.ds(org_ref[0, kk], S),
                            pl.ds(org_ref[1, kk] + i - i, S),
                        ],
                        out_ref.at[kk],
                        sem.at[kk % n_sem],
                    ).start()

                @pl.when(k >= n_sem)
                def _():
                    kk = k - n_sem
                    pltpu.make_async_copy(
                        img_ref.at[
                            src_ref[0, kk],
                            pl.ds(org_ref[0, kk], S),
                            pl.ds(org_ref[1, kk], S),
                        ],
                        out_ref.at[kk],
                        sem.at[kk % n_sem],
                    ).wait()

                return 0

            jax.lax.fori_loop(0, K + n_sem, body, 0)
            return 0

        jax.lax.fori_loop(0, reps, rep, 0)

    # -- transpose kernels ----------------------------------------------------

    M = S * S

    def tpose_kernel(in_ref, out_ref, *, reps):
        def rep(i, acc):
            out_ref[:] = jnp.swapaxes(in_ref[:] + i * 0.0, 0, 1)
            return 0

        jax.lax.fori_loop(0, reps, rep, 0)

    def tdot_kernel(in_ref, eye_ref, out_ref, *, reps):
        def rep(i, acc):
            # out[m, k] = sum_r in[r, m] * eye[r, k]
            out_ref[:] = jax.lax.dot_general(
                in_ref[:] + i * 0.0,
                eye_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, reps, rep, 0)

    org = jnp.stack([y0, x0])  # (2, K) i32
    srcm = src[None, :]  # (1, K)

    def build(variant, reps):
        n_sem = 8
        if variant == "vds":
            return pl.pallas_call(
                functools.partial(vds_kernel, reps=reps),
                out_shape=jax.ShapeDtypeStruct((K, S, S), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )
        if variant in ("dma", "dmah"):
            space = pltpu.VMEM if variant == "dma" else pltpu.ANY
            return pl.pallas_call(
                functools.partial(dma_kernel, reps=reps, n_sem=n_sem),
                out_shape=jax.ShapeDtypeStruct((K, S, S), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=space),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((n_sem,))],
                interpret=interpret,
            )
        if variant == "dmar":
            return pl.pallas_call(
                functools.partial(dmar_kernel, reps=reps, n_sem=n_sem),
                out_shape=jax.ShapeDtypeStruct((K, S, S), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((n_sem,))],
                interpret=interpret,
            )
        if variant == "tpose":
            return pl.pallas_call(
                functools.partial(tpose_kernel, reps=reps),
                out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )
        if variant == "tdot":
            return pl.pallas_call(
                functools.partial(tdot_kernel, reps=reps),
                out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )
        raise ValueError(variant)

    pm = jnp.asarray(rng.random((K, M)).astype(np.float32))
    eye = jnp.eye(K, dtype=jnp.float32)

    for variant in args.variants.split(","):
        times = {}
        err = None
        try:
            for reps in (args.reps, 3 * args.reps):
                fn = build(variant, reps)
                if variant == "vds":
                    call = jax.jit(lambda o, im, f=fn: f(o, im))
                    arg = (org, img)
                elif variant in ("dma", "dmah"):
                    call = jax.jit(lambda o, im, f=fn: f(o, im))
                    arg = (org, img)
                elif variant == "dmar":
                    call = jax.jit(lambda o, s, im, f=fn: f(o, s, im))
                    arg = (org, srcm, ring)
                else:
                    call = jax.jit(lambda x, f=fn, v=variant: f(x) if v == "tpose" else f(x, eye))
                    arg = (pm,)
                out = np.asarray(jax.block_until_ready(call(*arg)))
                # parity
                if reps == args.reps:
                    if variant in ("vds", "dma", "dmah"):
                        ok = np.array_equal(out, expected(img))
                    elif variant == "dmar":
                        ok = np.array_equal(out, expected(ring, use_src=True))
                    else:
                        ok = np.array_equal(out, np.asarray(pm).T)
                    if not ok:
                        raise RuntimeError("PARITY MISMATCH")
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(jax.block_until_ready(call(*arg)))
                    best = min(best, time.perf_counter() - t0)
                times[reps] = best
            slope_us = (times[3 * args.reps] - times[args.reps]) / (2 * args.reps) * 1e6
            if variant in ("vds", "dma", "dmah", "dmar"):
                print(f"{variant:6s}: {slope_us:9.1f} us/rep = {slope_us / K * 1e3:7.1f} ns/window (K={K}, S={S})")
            else:
                print(f"{variant:6s}: {slope_us:9.1f} us/flip ({K}x{M})")
        except Exception as e:  # compile failures are findings, not crashes
            msg = str(e).split("\n")[0][:200]
            print(f"{variant:6s}: FAILED — {type(e).__name__}: {msg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
