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
    ap.add_argument(
        "--stage", default="full", choices=["full", "mesher", "perception"],
        help="fleet ablation: mesher = tracking+graph only (no dense pass), "
             "perception = dense pass only (no tracking)",
    )
    ap.add_argument("--mesher-scale", type=int, default=1,
                    help="tracking/mesher at 1/s resolution (reference "
                         "mesher_input_height parity)")
    ap.add_argument("--lk-mode", default="default",
                    choices=["default", "matmul", "corr", "pallas",
                             "corr-slices", "pallas-slices", "fused"],
                    help="LK iteration mode ablation (default = LKParams "
                         "defaults: matmul resample — the composed-graph "
                         "winner; see PERFORMANCE.md lk-mode ablation)")
    ap.add_argument("--lk-windows", default="auto",
                    choices=["auto", "batched", "dslice"],
                    help="per-point window extraction: batched one-hot MXU "
                         "contractions vs vmapped dynamic_slice gathers "
                         "(auto = batched on real TPU)")
    ap.add_argument("--capacity", type=int, default=None,
                    help="tracker slot capacity (default: reference K=200)")
    ap.add_argument("--edge-gate", default="onehot", choices=["onehot", "gather"],
                    help="mesher edge foreground gate implementation "
                         "(gather = the pre-round-5 K^2*S advanced-index path)")
    ap.add_argument("--bwd-levels", type=int, default=0,
                    help="truncated backward verification pass: run only the "
                         "N finest levels init'd at the round-trip target "
                         "(0 = all levels, reference semantics)")
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
        from ocean_perception_tpu.tracking import (
            DetectorParams, LKParams, StripeMatcherParams,
        )
        from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

        H, W, max_disp = 120, 160, 16
        cfg = PerceptionConfig(engine="wta", max_disp=max_disp, internal_scale=1,
                               run_enhance=False)
        mp = ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                capacity=32,
                detector=DetectorParams(max_features=32, min_distance=6, border=4),
                lk=LKParams(max_level=1),
                matcher=StripeMatcherParams(
                    max_disp=16, templ_cols=9, templ_rows=7, max_matching_cost=0.5
                ),
            )
        )
        args.frames = 4
    else:
        H, W, max_disp = 720, 1280, 128
        cfg = PerceptionConfig(max_disp=max_disp, internal_scale=args.internal_scale)
        tracker_kw = {}
        if args.lk_mode != "default" or args.lk_windows != "auto" or args.bwd_levels:
            from ocean_perception_tpu.tracking import LKParams

            lk_kw = {}
            if args.lk_mode == "fused":
                lk_kw = dict(fused_lk=True)
            elif args.lk_mode != "default":
                lk_kw = dict(
                    corr_iters=args.lk_mode.startswith(("corr", "pallas")),
                    pallas_iters=args.lk_mode.startswith("pallas"),
                    corr_impl="slices" if args.lk_mode.endswith("-slices") else "einsum",
                )
            if args.lk_windows != "auto":
                lk_kw["batched_windows"] = args.lk_windows == "batched"
            if args.bwd_levels:
                lk_kw["bwd_levels"] = args.bwd_levels
            tracker_kw["lk"] = LKParams(**lk_kw)
        mp_kw = {}
        if args.edge_gate != "onehot":
            mp_kw["edge_gate_impl"] = args.edge_gate
        if args.capacity or tracker_kw:
            from ocean_perception_tpu.tracking import DetectorParams
            from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

            K = args.capacity or 200
            mp = ObjectMesherDeviceParams(
                tracker=StereoTrackerParams(
                    capacity=K, detector=DetectorParams(max_features=K), **tracker_kw
                ),
                **mp_kw,
            )
        else:
            mp = ObjectMesherDeviceParams(**mp_kw)  # defaults: K=200, k-ago ring 3

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
        from ocean_perception_tpu.parallel.sharded_pipeline import (
            _b8_safe,
            create_fleet_frontend_state,
        )

        from ocean_perception_tpu.ops.image import pyr_down

        B = args.fleet
        ms = args.mesher_scale
        fcfg = _b8_safe(cfg, B)
        states0, graphs0 = create_fleet_frontend_state(
            B, mp, image_shape=(H // ms, W // ms)
        )
        bl = jnp.broadcast_to(left[None], (B,) + left.shape)
        br = jnp.broadcast_to(right[None], (B,) + right.shape)
        pg0 = jax.vmap(to_grayscale)(bl)
        for _ in range(ms.bit_length() - 1):
            pg0 = jax.vmap(pyr_down)(pg0)

        # N fleet steps inside ONE jitted scan (per-step host dispatches on
        # this rig measure the ~50-130 ms RPC floor, not the compute). Same
        # vmapped graph the node/mesh entry point runs; on >1 device wrap
        # with the sharded multi_camera_frontend_step instead.
        from typing import NamedTuple

        from ocean_perception_tpu.mesher.object_mesher import mesher_device_step
        from ocean_perception_tpu.models.perception import perception_step

        class _FFO(NamedTuple):  # stage-ablation stand-in for FullFrontendOutput
            perception: object
            mesher: object
            tracker_state: object
            graph: object

        fxb = jnp.asarray(float(rig.fx) * float(rig.baseline) / ms, jnp.float32)

        def one_camera(s1, g1, p1, l1, r1):
            if args.stage == "mesher":
                gl, gr = to_grayscale(l1), to_grayscale(r1)
                for _ in range(ms.bit_length() - 1):
                    gl, gr = pyr_down(gl), pyr_down(gr)
                ns, ng, mo = mesher_device_step(s1, g1, p1, gl, gr, fxb, mp)
                return _FFO(None, mo, ns, ng), gl
            if args.stage == "perception":
                out = perception_step(l1, r1, rig, fcfg)
                return _FFO(out, None, s1, g1), p1
            return full_frontend_step(
                s1, g1, p1, l1, r1, rig, fcfg, mp, mesher_scale=ms
            )

        @jax.jit
        def stream(states, graphs, pg, tag):
            def frame(carry, i):
                s, g, p, digest = carry
                out, cur = jax.vmap(one_camera)(
                    s, g, p + (digest * 1e-12 + i.astype(jnp.float32) * 1e-7), bl, br
                )
                # The digest must consume EVERY stage's output or XLA
                # dead-code-eliminates the unconsumed subgraph (measured:
                # a mesher-only digest makes the full pipeline time equal
                # the mesher-only ablation — the dense pass was DCE'd).
                # Labels + sizes MUST be consumed too: they are the only
                # outputs depending on the fg gate + landmark graph + CC,
                # and a disparities-only digest let XLA DCE that whole
                # subgraph — the r3/r4 "full" fleet numbers silently
                # excluded it (~40 ms/step at the gather-gate defaults;
                # docs/PERFORMANCE.md round 5).
                def mesher_digest(mo):
                    return (
                        jnp.sum(mo.disparities) * 1e-6
                        + jnp.sum(mo.labels.astype(jnp.float32)) * 1e-7
                        + jnp.sum(mo.sizes.astype(jnp.float32)) * 1e-7
                    )

                if args.stage == "perception":
                    digest = jnp.sum(out.perception.disparity) * 1e-9
                elif args.stage == "mesher":
                    digest = mesher_digest(out.mesher)
                else:
                    digest = (
                        mesher_digest(out.mesher)
                        + jnp.sum(out.perception.disparity) * 1e-9
                        + jnp.sum(out.perception.enhanced_left[:, ::64, ::64]) * 1e-9
                    )
                return (out.tracker_state, out.graph, cur, digest), digest

            (_, _, _, final), _ = jax.lax.scan(
                frame, (states, graphs, pg, tag), jnp.arange(N)
            )
            return final

        float(stream(states0, graphs0, pg0, jnp.asarray(0.0, jnp.float32)))
        best = np.inf
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            float(stream(states0, graphs0, pg0, jnp.asarray(float(rep + 1), jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        total_fps = N * B / best
        print(
            f"fleet B={B} {H}x{W} scale={fcfg.internal_scale} ms={ms} "
            f"stage={args.stage}: "
            f"{best / N * 1e3:.2f} ms/fleet-step, {total_fps:.1f} fps total, "
            f"{total_fps / B:.1f} fps/camera (min of {args.repeats})"
        )
        return 0

    from ocean_perception_tpu.mesher.landmark_graph import LandmarkGraph
    from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerState

    from ocean_perception_tpu.ops.image import pyr_down

    ms = args.mesher_scale
    state0 = StereoTrackerState.create(mp.tracker, image_shape=(H // ms, W // ms))
    graph0 = LandmarkGraph.create(mp.tracker.capacity)
    prev0 = to_grayscale(left)
    for _ in range(ms.bit_length() - 1):
        prev0 = pyr_down(prev0)

    @jax.jit
    def stream(l, r, state, graph, prev):
        def frame(carry, i):
            s, g, p, digest = carry
            perturb = digest * 1e-12 + i.astype(jnp.float32) * 1e-7
            (out, cur) = full_frontend_step(
                s, g, p, l + perturb, r, rig, cfg, mp, mesher_scale=ms
            )
            # Consume every stage (unconsumed outputs get DCE'd — see the
            # fleet variant's comment; labels/sizes carry the graph+gate).
            digest = (
                jnp.sum(out.perception.disparity) * 1e-6
                + jnp.sum(out.mesher.disparities) * 1e-6
                + jnp.sum(out.mesher.labels.astype(jnp.float32)) * 1e-7
                + jnp.sum(out.mesher.sizes.astype(jnp.float32)) * 1e-7
                + jnp.sum(out.perception.enhanced_left[::64, ::64]) * 1e-9
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
    ms_frame = best / N * 1e3
    print(
        f"full_frontend_step {H}x{W} scale={cfg.internal_scale} ms={ms} "
        f"K={mp.tracker.capacity}: "
        f"{ms_frame:.2f} ms/frame, {1e3 / ms_frame:.1f} fps "
        f"(min of {args.repeats}, {N} frames/dispatch)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
