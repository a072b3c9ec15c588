#!/usr/bin/env python
"""VIO robustness stress matrix: scenario x severity, each cell a scored mission.

The estimator's failure paths (mode machine, VO timeout, rewind/replay,
range gating, mag aiding, external-fix factors — reference
state_estimator.cpp:336-397 + fixed_lag_smoother.cpp:413-428) were covered
by scattered per-scenario tests with ad-hoc thresholds. This harness sweeps
ONE mission battery over every failure axis and emits an ATE/RPE table —
the estimator-side analog of the stereo oracle matrix — so a regression in
any recovery path moves a number.

Scenarios (severity knobs):
  baseline      clean mission
  vo_dropout    stereo frames replaced by sensor noise for D seconds
  chaos         measurement stream drop/dup/reorder at rate p (seeded)
  range_outlier beacon ranges at 5 Hz with outlier fraction p
  mag_bias      VO dropout + magnetometer aiding with heading bias B deg
  fix_outage    external pose fixes at 2 Hz, silenced for G seconds
  yaw           aggressive heading profile, amplitude A deg (sin, 4 s period)

Every cell plays the same synthetic EuRoC mission (tests/synthetic_vio.py,
bounded-sin translation; the yaw rows regenerate with the heading profile)
through a fresh StateEstimator via the dataset callback fabric — the same
path vio_dataset_player drives — and scores the smoother trajectory with
vio/evaluation.py (ATE, unaligned; RPE@0.5 s).

Usage:
  python examples/mission_matrix.py                  # full matrix -> stdout + JSON
  python examples/mission_matrix.py --cells baseline,vo_dropout:1.2
  python examples/mission_matrix.py --frames 32 --out /tmp/matrix.json

tests/test_mission_matrix.py asserts bounds per cell on a reduced battery
(slow tier).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side mission replay
jax.config.update("jax_enable_x64", True)

import numpy as np

# (scenario, severity) -> severity list; severity semantics per scenario.
MATRIX = {
    "baseline": [0.0],
    "vo_dropout": [0.4, 0.8, 1.6],      # seconds of blinded camera
    "chaos": [0.03, 0.08, 0.15],        # drop/dup/reorder probability each
    "range_outlier": [0.0, 0.2, 0.5],   # outlier fraction of 5 Hz ranges
    "gyro_bias": [0.01, 0.02, 0.05],    # rad/s heading-rate bias, unaided
    "mag_bias": [0.0, 5.0, 15.0],       # mag heading bias deg, aiding a
                                        # 0.02 rad/s gyro-bias drift
    "fix_outage": [0.0, 1.0, 2.0],      # seconds of fix silence mid-mission
    "yaw": [10.0, 25.0, 45.0],          # heading amplitude deg
}

BEACON = np.array([2.0, 3.0, -1.0])


def run_cell(scenario: str, severity: float, frames: int, seed: int = 0) -> dict:
    """Play one mission with the scenario's fault injection; return scores."""
    from examples.vio_mission_demo import build_estimator
    from ocean_perception_tpu.core.measurements import (
        MagMeasurement,
        PoseMeasurement,
        RangeMeasurement,
    )
    from ocean_perception_tpu.datasets.euroc import EurocDataset
    from ocean_perception_tpu.vio.evaluation import evaluate_trajectory
    from tests.synthetic_vio import H, W, write_synthetic_euroc

    rng = np.random.default_rng(seed)
    root = tempfile.mkdtemp(prefix=f"mm_{scenario}_")
    yaw = severity if scenario == "yaw" else 0.0
    write_synthetic_euroc(root, n_frames=frames, motion="sin", yaw_amp_deg=yaw)
    ds = EurocDataset(root)

    est, _rig = build_estimator()
    if scenario == "mag_bias":
        # The default mag_local_field (0,0,1) is heading-blind (yaw-
        # invariant); heading aiding needs a horizontal component, and the
        # synthetic field must match the configured world field.
        import dataclasses as _dc

        from ocean_perception_tpu.vio.state_estimator import StateEstimator

        params = _dc.replace(
            est.params,
            smoother=est.params.smoother.replace(mag_local_field=(1.0, 0.0, 0.0)),
        )
        est = StateEstimator(params, _rig)
    t_lo = 0.1 + 0.1 * frames * 0.4          # fault window [40%, 40%+sev]
    mission_end = 0.1 * frames

    def in_window(ts_ns: int, dur_s: float) -> bool:
        t = ts_ns * 1e-9
        return t_lo <= t < t_lo + dur_s

    # -- per-scenario measurement-boundary fault injectors -------------------
    stereo_cb = est.receive_stereo
    if scenario == "vo_dropout":
        def stereo_cb(m, _dur=severity):
            if in_window(m.timestamp, _dur):
                m = type(m)(
                    m.timestamp, m.camera_id,
                    rng.random((H, W)).astype(np.float32),
                    rng.random((H, W)).astype(np.float32),
                )
            est.receive_stereo(m)

    imu_cb = est.receive_imu
    if scenario in ("gyro_bias", "mag_bias"):
        # Constant heading-rate bias: the drift magnetometer aiding exists
        # to bound. The unaided drift is the gyro_bias row; the mag_bias
        # rows add 4 Hz mag with severity degrees of heading bias.
        gb = severity if scenario == "gyro_bias" else 0.02

        def imu_cb(m, _gb=gb):
            m = type(m)(
                m.timestamp,
                np.asarray(m.angular_velocity) + np.array([0.0, 0.0, _gb]),
                m.linear_acceleration,
            )
            est.receive_imu(m)

    callbacks = {
        "stereo": stereo_cb,
        "imu": imu_cb,
        "depth": est.receive_depth,
        "range": est.receive_range,
    }
    held: list = []
    if scenario == "chaos":
        # Seeded drop/dup/holdback at the delivery boundary — exactly
        # ChaosBus semantics (fabric/chaos.py: one uniform draw splits
        # drop -> dup -> holdback; held messages re-inject after
        # hold_count=3 subsequent deliveries — bounded reordering).
        p = severity

        def chaotic(kind):
            inner = callbacks[kind]

            def cb(m):
                u = rng.random()
                if u < p:                       # drop
                    return
                if u < 2 * p:                   # duplicate
                    inner(m)
                    inner(m)
                elif u < 3 * p:                 # holdback (reorder)
                    held.append([kind, m, 3])
                    return
                else:
                    inner(m)
                for h in list(held):
                    h[2] -= 1
                    if h[2] <= 0:
                        held.remove(h)
                        callbacks_raw[h[0]](h[1])

            return cb

        callbacks_raw = dict(callbacks)
        callbacks = {k: chaotic(k) for k in callbacks}

    ds.register_stereo_callback(callbacks["stereo"])
    ds.register_imu_callback(callbacks["imu"])
    ds.register_depth_callback(callbacks["depth"])
    ds.register_range_callback(callbacks["range"])

    # -- groundtruth-driven synthetic aiding sensors -------------------------
    state = {"last_range": -(1 << 62), "last_mag": -(1 << 62), "last_fix": -(1 << 62)}

    def on_gt(gt):
        t = gt.timestamp
        Tm = np.asarray(gt.world_T_body, np.float64)
        if scenario == "range_outlier" and t - state["last_range"] >= int(0.2e9):
            state["last_range"] = t
            r = float(np.linalg.norm(Tm[:3, 3] - BEACON)) + rng.normal(0, 0.05)
            if rng.random() < severity:
                r = rng.uniform(0.5, 30.0)
            callbacks["range"](RangeMeasurement(t, r, BEACON))
        if scenario == "mag_bias" and t - state["last_mag"] >= int(0.25e9):
            state["last_mag"] = t
            b = np.deg2rad(severity)
            c, s = np.cos(b), np.sin(b)
            Rb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            field = Rb @ Tm[:3, :3].T @ np.array([1.0, 0.0, 0.0])
            est.receive_mag(MagMeasurement(t, field))
        if scenario == "fix_outage" and t - state["last_fix"] >= int(0.5e9):
            if not in_window(t, severity):
                state["last_fix"] = t
                Tf = Tm.copy()
                Tf[:3, 3] += rng.normal(0, 0.01, 3)
                est.receive_pose(PoseMeasurement(t, Tf, np.eye(6) * 1e-4))

    ds.register_groundtruth_callback(on_gt)

    if ds.pose_data:
        est.initialize(ds.pose_data[0].timestamp, ds.pose_data[0].world_T_body)

    traj = []

    def on_solve(_):
        s = est.smoother_state()
        if s is not None and (not traj or s.timestamp != traj[-1][0]):
            traj.append((s.timestamp, np.asarray(s.world_T_body, np.float64)))

    est.smoother_callbacks.append(on_solve)
    ds.play_all()
    # Flush any chaos-held measurements (they arrived, very late).
    for h in held:
        callbacks_raw[h[0]](h[1])

    if len(traj) < 3:
        return {"scenario": scenario, "severity": severity, "error": "too few poses",
                "n_poses": len(traj)}
    est_ts = np.array([t for t, _ in traj], np.int64)
    est_poses = np.stack([T for _, T in traj])
    rep = evaluate_trajectory(
        est_ts, est_poses, ds.pose_data, align="none", rpe_deltas_s=[0.5]
    )
    out = {
        "scenario": scenario,
        "severity": severity,
        "n_poses": len(traj),
        "ate_rmse_m": rep["ate_rmse_m"],
        "ate_max_m": rep["ate_max_m"],
        "mission_end_s": mission_end,
    }
    if rep["rpe"]:
        k = next(iter(rep["rpe"]))
        out["rpe_trans_rmse_m"] = rep["rpe"][k]["trans_rmse_m"]
        out["rpe_rot_rmse_deg"] = rep["rpe"][k]["rot_rmse_deg"]
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--cells", default=None,
                    help="comma list of scenario[:severity] to run (default all)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="seeds per cell; the reported row is the MEDIAN-ATE "
                         "seed (single-draw fault schedules are noisy)")
    ap.add_argument("--out", default=None, help="JSON output path")
    args = ap.parse_args()

    cells = []
    if args.cells:
        for spec in args.cells.split(","):
            if ":" in spec:
                s, v = spec.split(":")
                cells.append((s, float(v)))
            else:
                cells.extend((spec, v) for v in MATRIX[spec])
    else:
        cells = [(s, v) for s, vs in MATRIX.items() for v in vs]

    rows = []
    for scenario, severity in cells:
        runs = [run_cell(scenario, severity, args.frames, seed=s)
                for s in range(args.seeds)]
        scored = [r for r in runs if "error" not in r]
        if scored:
            scored.sort(key=lambda r: r["ate_rmse_m"])
            r = scored[len(scored) // 2]
            r["seeds"] = len(scored)
            r["ate_rmse_m_worst"] = scored[-1]["ate_rmse_m"]
        else:
            r = runs[0]
        rows.append(r)
        if "error" in r:
            print(f"{scenario:14s} sev={severity:<5g} ERROR: {r['error']}")
        else:
            print(
                f"{scenario:14s} sev={severity:<5g} "
                f"ATE {r['ate_rmse_m']*100:6.2f} cm (max {r['ate_max_m']*100:6.2f}) "
                f"RPE {r.get('rpe_trans_rmse_m', float('nan'))*100:6.2f} cm "
                f"/ {r.get('rpe_rot_rmse_deg', float('nan')):5.2f} deg "
                f"({r['n_poses']} poses)"
            )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
