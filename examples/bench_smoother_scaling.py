#!/usr/bin/env python
"""Fixed-lag smoother solve latency vs window size on the real TPU.

The reference runs GTSAM's IncrementalFixedLagSmoother with a 10 s lag at
~1 Hz (vio/README.md:15). Our batch-GN `solve_window` measured 54 ms at
window=8 (docs/PERFORMANCE.md) — this sweeps window size to show how much
lag the 1 Hz budget actually buys on-chip (f32, full factor set: IMU
preintegration + VO betweens + depth + anchor prior).

Timing per the repo methodology: jit once per window size, force completion
with a scalar readback, perturb inputs per repeat, min-of-N on the shared
rig. Usage: python examples/bench_smoother_scaling.py [--windows 8,16,32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", default="8,16,32")
    ap.add_argument("--iterations", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--max-landmarks", type=int, default=0,
                    help="landmark projection columns (r4 production "
                         "default: 16) — populates synthetic tracks")
    args = ap.parse_args()

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocean_perception_tpu.vio.smoother import (
        SmootherConfig,
        preintegrate_window,
        solve_window,
    )
    from test_smoother import GRAVITY, G_UNIT, build_window, simulate

    out = {}
    for M in [int(v) for v in args.windows.split(",")]:
        config = SmootherConfig(
            window=M, iterations=args.iterations,
            max_landmarks=args.max_landmarks,
            cam_fx=200.0, cam_fy=200.0, cam_cx=80.0, cam_cy=60.0,
        )
        states, imu_windows = simulate(M_used=M)
        win = build_window(states, imu_windows, config, state_noise=0.05)
        if args.max_landmarks > 0:
            # Synthetic landmark tracks: true 3D points ahead of the rig,
            # projected into every keypose (identity body_T_cam), ~1/3 mono.
            rng = np.random.default_rng(9)
            L = args.max_landmarks
            pts = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], size=(L, 3))
            uv = np.zeros((M, L, 2), np.float32)
            disp = np.zeros((M, L), np.float32)
            vmask = np.zeros((M, L), bool)
            for k, (Rk, pk, _) in enumerate(states):
                cam = (np.asarray(Rk).T @ (pts - pk).T).T
                ok = cam[:, 2] > 0.5
                z = np.maximum(cam[:, 2], 0.5)
                uv[k, :, 0] = 200.0 * cam[:, 0] / z + 80.0
                uv[k, :, 1] = 200.0 * cam[:, 1] / z + 60.0
                disp[k] = np.where(np.arange(L) % 3 != 0,
                                   200.0 * config.cam_baseline / z, 0.0)
                vmask[k] = ok
            win = win._replace(
                lmk_uv=jnp.asarray(uv), lmk_disp=jnp.asarray(disp),
                lmk_valid=jnp.asarray(vmask),
            )

        @jax.jit
        def solve(w):
            pims = preintegrate_window(w)
            w2, result = solve_window(
                w, pims, jnp.asarray(GRAVITY, w.p.dtype),
                jnp.asarray(G_UNIT, w.p.dtype), config,
                jnp.asarray(M - 1, jnp.int32),
            )
            # Scalar first (the forced host readback), solved positions
            # second (recovery check — avoids a second compiled program).
            return jnp.sum(w2.p) + jnp.sum(result.cov_slot1), w2.p

        t0 = time.perf_counter()
        _, p_solved = solve(win)
        float(_)
        compile_s = time.perf_counter() - t0
        best = np.inf
        for rep in range(args.repeats):
            wr = win._replace(p=win.p + np.float32((rep + 1) * 1e-6))
            t0 = time.perf_counter()
            s, _p = solve(wr)
            float(s)
            best = min(best, time.perf_counter() - t0)
        # Recovery sanity: the solved slot positions match the simulation.
        p_solved = np.asarray(p_solved)
        errs = [float(np.linalg.norm(p_solved[k] - states[k][1]))
                for k in range(M)]
        out[f"window={M}"] = {
            "solve_ms": round(best * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "hz_budget_x": round(1.0 / best, 1),
            "recovery_max_err_m": round(max(errs), 4),
            "lag_s_at_0.5s_keyposes": M * 0.5,
        }
        print(json.dumps({f"window={M}": out[f"window={M}"]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
