#!/usr/bin/env python
"""One-command multi-chip benchmark: camera-sharded fleet over jax.devices().

The day real multi-chip hardware appears, this produces the first cross-chip
fps number with zero new code (VERDICT r4 #7): it builds a 1-D device mesh
over whatever `jax.devices()` offers (degenerating to today's single chip),
shards the camera axis, and streams the SAME two production points the
single-chip benches measure:

  dense : multi_camera_step           (enhance + PatchMatch per camera)
  fleet : multi_camera_frontend_step  (full frontend incl. tracking +
          landmark graph — digests consume labels/sizes so nothing DCEs)

Methodology = bench.py: N digest-chained frames inside one jitted scan,
perturbed inputs, min-of-repeats. Camera count = cams_per_device x devices,
so the printed fps/camera is directly comparable across device counts —
the fleet path is embarrassingly camera-parallel (zero collectives in the
forward path; docs/SCALING.md records the predicted ICI scaling), so
total fps should scale ~linearly with devices.

On the CPU 8-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) the absolute numbers are meaningless — use --validate,
which runs tiny shapes and asserts only that the program compiles, executes,
and keeps every output leaf sharded over the camera axis
(tests/test_multichip_bench.py runs exactly that).

Usage:
  python examples/bench_multichip.py                    # real devices
  python examples/bench_multichip.py --validate         # CPU-mesh check
  python examples/bench_multichip.py --points dense --cams-per-device 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="dense,fleet")
    ap.add_argument("--cams-per-device", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--internal-scale", type=int, default=2)
    ap.add_argument("--mesher-scale", type=int, default=1)
    ap.add_argument("--validate", action="store_true",
                    help="tiny shapes; assert compile+run+sharding only "
                         "(for the virtual CPU mesh)")
    args = ap.parse_args()

    if args.validate:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from ocean_perception_tpu.utils.platform import enable_compile_cache

        enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
    from ocean_perception_tpu.models.perception import PerceptionConfig
    from ocean_perception_tpu.ops.image import pyr_down, to_grayscale
    from ocean_perception_tpu.parallel.sharded_pipeline import (
        _b8_safe,
        create_fleet_frontend_state,
        multi_camera_frontend_step,
        multi_camera_step,
    )

    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("cam",))
    cam_shard = NamedSharding(mesh, P("cam"))
    B = n_dev * args.cams_per_device

    if args.validate:
        H, W, max_disp = 96, 128, 16
        cfg = PerceptionConfig(engine="wta", max_disp=max_disp, internal_scale=1,
                               run_enhance=False)
        from ocean_perception_tpu.tracking import (
            DetectorParams, LKParams, StripeMatcherParams,
        )
        from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

        mp = ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                capacity=16,
                detector=DetectorParams(max_features=16, min_distance=6, border=4),
                lk=LKParams(max_level=1),
                matcher=StripeMatcherParams(max_disp=16, templ_cols=9, templ_rows=7),
            )
        )
        args.frames, args.repeats = 2, 1
    else:
        H, W, max_disp = 720, 1280, 128
        cfg = PerceptionConfig(max_disp=max_disp, internal_scale=args.internal_scale)
        mp = ObjectMesherDeviceParams()

    cam = PinholeCamera.create(W * 0.5, W * 0.5, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.2)
    ms = args.mesher_scale

    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 64)).astype(np.float32)
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    left1 = np.clip(canvas[:, :W, None] * tint + 0.05, 0, 1)
    right1 = np.clip(canvas[:, 8 : 8 + W, None] * tint + 0.05, 0, 1)
    bl = jax.device_put(
        jnp.broadcast_to(jnp.asarray(left1)[None], (B,) + left1.shape), cam_shard
    )
    br = jax.device_put(
        jnp.broadcast_to(jnp.asarray(right1)[None], (B,) + right1.shape), cam_shard
    )

    results = {"n_devices": n_dev, "cams_total": B,
               "cams_per_device": args.cams_per_device}

    def timeit(fn, *a):
        out = jax.block_until_ready(fn(*a))
        best = float("inf")
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return out, best

    if "dense" in args.points:
        fcfg = _b8_safe(cfg, B)

        @jax.jit
        def dense_stream(l, r):
            def frame(dig, i):
                out, _stats = multi_camera_step(
                    l + dig * 1e-12 + i * 1e-7, r, rig, fcfg, mesh
                )
                return jnp.sum(out.disparity) * 1e-9, None

            dig, _ = jax.lax.scan(frame, jnp.float32(0), jnp.arange(args.frames, dtype=jnp.float32))
            return dig

        _, best = timeit(dense_stream, bl, br)
        fps = args.frames * B / best
        results["dense"] = {
            "ms_per_step": best / args.frames * 1e3,
            "fps_total": fps, "fps_per_camera": fps / B,
        }
        print(f"dense  B={B} on {n_dev} device(s): "
              f"{best / args.frames * 1e3:.2f} ms/step, {fps:.1f} fps total, "
              f"{fps / B:.1f} fps/camera")

    if "fleet" in args.points:
        fcfg = _b8_safe(cfg, B)
        states0, graphs0 = create_fleet_frontend_state(
            B, mp, image_shape=(H // ms, W // ms)
        )
        states0 = jax.device_put(states0, cam_shard)
        graphs0 = jax.device_put(graphs0, cam_shard)
        pg0 = jax.vmap(to_grayscale)(bl)
        for _ in range(ms.bit_length() - 1):
            pg0 = jax.vmap(pyr_down)(pg0)
        pg0 = jax.device_put(pg0, cam_shard)

        @jax.jit
        def fleet_stream(s, g, p, l, r):
            def frame(carry, i):
                s, g, p, dig = carry
                out, cur = multi_camera_frontend_step(
                    s, g, p + dig * 1e-12 + i * 1e-7, l, r, rig, fcfg, mp,
                    mesh, mesher_scale=ms,
                )
                dig = (
                    jnp.sum(out.mesher.disparities) * 1e-6
                    + jnp.sum(out.mesher.labels.astype(jnp.float32)) * 1e-7
                    + jnp.sum(out.mesher.sizes.astype(jnp.float32)) * 1e-7
                    + jnp.sum(out.perception.disparity) * 1e-9
                )
                return (out.tracker_state, out.graph, cur, dig), None

            (_, _, _, dig), _ = jax.lax.scan(
                frame, (s, g, p, jnp.float32(0)),
                jnp.arange(args.frames, dtype=jnp.float32),
            )
            return dig

        _, best = timeit(fleet_stream, states0, graphs0, pg0, bl, br)
        fps = args.frames * B / best
        results["fleet"] = {
            "ms_per_step": best / args.frames * 1e3,
            "fps_total": fps, "fps_per_camera": fps / B,
        }
        print(f"fleet  B={B} on {n_dev} device(s): "
              f"{best / args.frames * 1e3:.2f} ms/fleet-step, {fps:.1f} fps total, "
              f"{fps / B:.1f} fps/camera")

        if args.validate:
            # Assert the camera axis actually stayed sharded end to end.
            out, _ = jax.jit(
                lambda s, g, p, l, r: multi_camera_frontend_step(
                    s, g, p, l, r, rig, fcfg, mp, mesh, mesher_scale=ms
                )
            )(states0, graphs0, pg0, bl, br)
            shp = out.mesher.disparities.sharding
            assert len(shp.device_set) == n_dev, (
                f"camera axis collapsed to {len(shp.device_set)} device(s)"
            )
            print(f"validate OK: outputs sharded over {n_dev} devices")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
