"""Decompose the fleet frontend's TRACKING half stage by stage on the chip.

The fleet ablation (docs/PERFORMANCE.md round-3 session 2) found the B=4
step is tracking-bound: the mesher path (tracking + landmark graph) costs
~3x the dense pass. This measures WHERE inside that path the time goes, at
the real fleet shape (B cameras, 720p grays, K=200, k-ago ring):

  mesher : full mesher_device_step       (track + fg gate + graph)
  track  : track_and_triangulate only    (LK + detect + stripe + table)
  lk     : bidirectional ring LK only
  lkfwd  : forward-only ring LK
  detect : detect_features only          (GFTT+ANMS, runs EVERY frame)
  stripe : match_rectified only

Derived: gate+graph = mesher - track; LK backward = lk - lkfwd;
table/bookkeeping = track - lk - detect - stripe.

Methodology = bench.py: N digest-chained frames inside one jitted scan,
slope between N and 3N cancels the RPC floor and the scan-invariant setup;
min-of-repeats on the shared rig.

Usage: python examples/profile_fleet_tracking.py [--B 4] [--stages lk,track]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--H", type=int, default=720)
    ap.add_argument("--W", type=int, default=1280)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", default="mesher,track,lk,lkfwd,detect,stripe")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lk-windows", default="auto", choices=["auto", "batched", "dslice"])
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocean_perception_tpu.mesher.object_mesher import (
        ObjectMesherDeviceParams,
        mesher_device_step,
    )
    from ocean_perception_tpu.ops.image import image_pyramid
    from ocean_perception_tpu.parallel.sharded_pipeline import create_fleet_frontend_state
    from ocean_perception_tpu.tracking.detector import detect_features
    from ocean_perception_tpu.tracking.lk import track_points_ring
    from ocean_perception_tpu.tracking.stereo_tracker import track_and_triangulate
    from ocean_perception_tpu.tracking.stripe_match import match_rectified

    B, H, W = args.B, args.H, args.W
    mp = ObjectMesherDeviceParams()
    if args.lk_windows != "auto":
        from ocean_perception_tpu.tracking import LKParams
        from ocean_perception_tpu.tracking.stereo_tracker import StereoTrackerParams

        mp = ObjectMesherDeviceParams(
            tracker=StereoTrackerParams(
                lk=LKParams(batched_windows=args.lk_windows == "batched")
            )
        )
    tp = mp.tracker
    fxb = jnp.asarray(0.5 * W * 0.2, jnp.float32)  # fx*baseline as in the bench rig

    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 16)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    gl0 = jnp.broadcast_to(jnp.asarray(canvas[:, :W])[None], (B, H, W))
    gr0 = jnp.broadcast_to(jnp.asarray(canvas[:, 8 : 8 + W])[None], (B, H, W))

    states0, graphs0 = create_fleet_frontend_state(B, mp, image_shape=(H, W))

    # Warm the tracker state with a few REAL steps so the table has live
    # landmarks and the ring holds genuine pyramids (occupancy realism; the
    # masked lanes compute either way, but keyframe cadence does not).
    @jax.jit
    def warm(s, g, p):
        def fr(c, i):
            s, g, p = c
            (s, g, mo) = jax.vmap(
                lambda s1, g1, p1, l1, r1: mesher_device_step(s1, g1, p1, l1, r1, fxb, mp)
            )(s, g, p + i * 1e-6, gl0, gr0)
            return (s, g, gl0 + i * 1e-6), None

        (s, g, p), _ = jax.lax.scan(fr, (s, g, p), jnp.arange(3, dtype=jnp.float32))
        return s, g, p

    states0, graphs0, prev0 = warm(states0, graphs0, gl0)

    def stage_mesher(s, g, p, gl, gr):
        s, g, mo = mesher_device_step(s, g, p, gl, gr, fxb, mp)
        return s, g, jnp.sum(mo.disparities) * 1e-6 + jnp.sum(mo.labels) * 1e-9

    def stage_track(s, g, p, gl, gr):
        s, out = track_and_triangulate(s, p, gl, gr, fxb, tp)
        return s, g, jnp.sum(out.observations.pixels) * 1e-9

    def _lk(s, gl, p):
        cur_pyr = tuple(image_pyramid(gl, p.max_level + 1))
        flow = track_points_ring(
            s.ring, cur_pyr, s.table.pixels, s.table.alive, s.table.missed, p
        )
        ring = tuple(
            jnp.concatenate([c[None], lvl[:-1]], axis=0)
            for c, lvl in zip(cur_pyr, s.ring)
        )
        return s.replace(ring=ring), jnp.sum(flow.points) * 1e-9

    def stage_lk(s, g, p, gl, gr):
        s, d = _lk(s, gl, tp.lk)
        return s, g, d

    def stage_lkfwd(s, g, p, gl, gr):
        s, d = _lk(s, gl, tp.lk.replace(bidirectional=False))
        return s, g, d

    def stage_detect(s, g, p, gl, gr):
        det = detect_features(gl, tp.detector, s.table.pixels, s.table.alive)
        return s, g, jnp.sum(det.points) * 1e-9

    def stage_stripe(s, g, p, gl, gr):
        m = match_rectified(gl, gr, s.table.pixels, s.table.alive, tp.matcher)
        return s, g, jnp.sum(m.disparity) * 1e-9

    stages = {
        "mesher": stage_mesher,
        "track": stage_track,
        "lk": stage_lk,
        "lkfwd": stage_lkfwd,
        "detect": stage_detect,
        "stripe": stage_stripe,
    }

    results = {}
    for name in args.stages.split(","):
        fn = stages[name]

        def stream(s, g, p, n, _fn=fn):
            def frame(carry, i):
                s, g, p, dig = carry
                gl = gl0 + dig * 1e-12 + i * 1e-7
                gr = gr0 + dig * 1e-12 + i * 1e-7
                s, g, d = jax.vmap(lambda s1, g1, p1, l1, r1: _fn(s1, g1, p1, l1, r1))(
                    s, g, p, gl, gr
                )
                return (s, g, gl, dig + jnp.sum(d)), None

            (_, _, _, dig), _ = jax.lax.scan(
                frame, (s, g, p, jnp.float32(0)), jnp.arange(n, dtype=jnp.float32)
            )
            return dig

        jfn = jax.jit(stream, static_argnums=3)
        times = {}
        for n in (args.steps, 3 * args.steps):
            float(jfn(states0, graphs0, prev0, n))  # compile
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(jfn(states0, graphs0, prev0, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        slope = (times[3 * args.steps] - times[args.steps]) / (2 * args.steps) * 1e3
        results[name] = slope
        print(f"{name:8s}: {slope:7.2f} ms/fleet-step (B={B}, {H}x{W}, K={tp.capacity})")

    if {"mesher", "track"} <= results.keys():
        print(f"derived gate+graph      : {results['mesher'] - results['track']:7.2f} ms")
    if {"lk", "lkfwd"} <= results.keys():
        print(f"derived LK backward pass: {results['lk'] - results['lkfwd']:7.2f} ms")
    if {"track", "lk", "detect", "stripe"} <= results.keys():
        rest = results["track"] - results["lk"] - results["detect"] - results["stripe"]
        print(f"derived table/bookkeep  : {rest:7.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
