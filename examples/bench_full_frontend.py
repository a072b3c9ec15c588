"""Bench the FULL frontend (enhance + PatchMatch + tracking + landmark
graph) streaming on the real chip — the object-mesher pipeline per camera.

The round-2 number (16.85 ms/frame = 59.4 fps at 720p) predates the round-3
wins (lattice dark-pixel sampler, matmul pyr_down, integral box_filter,
fused Pallas PatchMatch default): this re-measures the same graph, plus the
farm-node fleet variant (B cameras through multi_camera_frontend_step,
exactly the compute the ocean-farm-perception node dispatches).

bench.py methodology: N digest-chained frames inside one jitted scan
(amortizes the rig's ~50-130 ms RPC floor), perturbed inputs per repeat,
min-of-N_REPEATS on the shared rig. Tracker state / landmark graph / k-ago
pyramid ring all thread through the scan carry, so the measured step is the
real streaming step, not a stateless replay.

Usage:
  python examples/bench_full_frontend.py            # single camera, 720p
  python examples/bench_full_frontend.py --fleet 4  # 4-camera farm variant
  python examples/bench_full_frontend.py --smoke    # tiny CPU sanity run
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fleet", type=int, default=0, help="camera count for the fleet variant")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--internal-scale", type=int, default=2)
    ap.add_argument("--smoke", action="store_true", help="tiny shapes on CPU")
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.mesher.object_mesher import ObjectMesherDeviceParams
    from ocean_perception_tpu.models.perception import PerceptionConfig, full_frontend_step
    from ocean_perception_tpu.ops.image import to_grayscale

    if args.smoke:
        H, W, max_disp = 120, 160, 16
        cfg = PerceptionConfig(engine="wta", max_disp=max_disp, internal_scale=1,
                               run_enhance=False)
        mp = ObjectMesherDeviceParams()
        args.frames = 4
    else:
        H, W, max_disp = 720, 1280, 128
        cfg = PerceptionConfig(max_disp=max_disp, internal_scale=args.internal_scale)
        mp = ObjectMesherDeviceParams()  # defaults: K=200, k-ago ring 3

    cam = PinholeCamera.create(W * 0.5, W * 0.5, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.2)

    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 64)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    left = jnp.asarray(np.clip(canvas[:, :W, None] * tint + 0.05, 0, 1))
    right = jnp.asarray(np.clip(canvas[:, 8 : 8 + W, None] * tint + 0.05, 0, 1))

    N = args.frames

    if args.fleet:
        from ocean_perception_tpu.parallel.mesh import make_mesh
        from ocean_perception_tpu.parallel.sharded_pipeline import (
            create_fleet_frontend_state,
            multi_camera_frontend_step,
        )

        B = args.fleet
        mesh = make_mesh(1 if len(jax.devices()) % B else None)
        states, graphs = create_fleet_frontend_state(B, mp, image_shape=(H, W))
        bl = jnp.broadcast_to(left[None], (B,) + left.shape)
        br = jnp.broadcast_to(right[None], (B,) + right.shape)
        pg = jax.vmap(to_grayscale)(bl)

        # The cached fleet step is itself jitted; chain frames on the host
        # but force completion only once per repeat (state threads on-device).
        def run(tag: float):
            s, g, p = states, graphs, pg
            digest = jnp.asarray(tag, jnp.float32)
            for i in range(N):
                out, cur = multi_camera_frontend_step(
                    s, g, p + digest * 1e-12, bl, br, rig, cfg, mp, mesh
                )
                s, g, p = out.tracker_state, out.graph, cur
                digest = jnp.sum(out.mesher.disparities) * 1e-6
            return float(digest)

        run(0.0)  # compile + warm
        best = np.inf
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            run(float(rep + 1))
            best = min(best, time.perf_counter() - t0)
        total_fps = N * B / best
        print(
            f"fleet B={B} {H}x{W} scale={cfg.internal_scale}: "
            f"{best / N * 1e3:.2f} ms/fleet-step, {total_fps:.1f} fps total, "
            f"{total_fps / B:.1f} fps/camera (min of {args.repeats})"
        )
        return 0

    from ocean_perception_tpu.mesher.landmark_graph import LandmarkGraph
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerState

    state0 = StereoTrackerState.create(mp.tracker, image_shape=(H, W))
    graph0 = LandmarkGraph.create(mp.tracker.capacity)
    prev0 = to_grayscale(left)

    @jax.jit
    def stream(l, r, state, graph, prev):
        def frame(carry, i):
            s, g, p, digest = carry
            perturb = digest * 1e-12 + i.astype(jnp.float32) * 1e-7
            (out, cur) = full_frontend_step(s, g, p, l + perturb, r, rig, cfg, mp)
            digest = (
                jnp.sum(out.perception.disparity) * 1e-6
                + jnp.sum(out.mesher.disparities) * 1e-6
            )
            return (out.tracker_state, out.graph, cur, digest), digest

        (_, _, _, final), _ = jax.lax.scan(
            frame, (state, graph, prev, jnp.asarray(0.0, jnp.float32)), jnp.arange(N)
        )
        return final

    float(stream(left, right, state0, graph0, prev0))  # compile + warm
    best = np.inf
    for rep in range(args.repeats):
        t0 = time.perf_counter()
        float(stream(left + np.float32((rep + 1) * 1e-7), right, state0, graph0, prev0))
        best = min(best, time.perf_counter() - t0)
    ms = best / N * 1e3
    print(
        f"full_frontend_step {H}x{W} scale={cfg.internal_scale} K={mp.tracker.capacity}: "
        f"{ms:.2f} ms/frame, {1e3 / ms:.1f} fps (min of {args.repeats}, {N} frames/dispatch)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
