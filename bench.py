#!/usr/bin/env python
"""Headline benchmark: enhance + PatchMatch depth at 1280x720, frames/sec/chip.

Target (BASELINE.json): >= 60 fps/chip on TPU at the reference operating
point (/2 internal downsample, max_disp 128 full-scale).

Measurement notes (axon remote TPU):
- `jax.block_until_ready` is unreliable on this platform and identical
  repeated dispatches can hit execution caches, so completion is forced by a
  scalar host readback and every frame's input is unique.
- Each host->device dispatch pays a ~50 ms RPC floor on this rig (a trivial
  jitted sum costs that much), which would swamp any kernel measurement.
  Production perception is a streaming pipeline, so the headline metric is
  STREAMING THROUGHPUT: N frames run as a sequential `lax.scan` *inside one
  jitted call* (each frame's input depends on the previous frame's digest,
  so nothing can be elided or parallelized), timed end-to-end including the
  final readback. The JSON also reports the single-call latency and the
  measured RPC floor for transparency.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60, ...}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280
BASELINE_FPS = 60.0
N_FRAMES = 60   # amortizes the rig's ~50-130 ms per-dispatch RPC to ~2 ms/frame
N_REPEATS = 3   # shared rig: take the best (least-contended) repeat
ENGINE = "patchmatch" if "--sgm" not in sys.argv else "sgm"


TRUE_DISP = 8.0  # uniform scene disparity in the synthetic bench scene


def make_inputs():
    """Synthetic 720p underwater stereo scene with a known disparity layout."""
    rng = np.random.default_rng(0)
    canvas = rng.random((H, W + 200)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    canvas = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, canvas)
    canvas = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, canvas)
    left = canvas[:, 100 : 100 + W]
    # right(y, x - d) == left(y, x) with d = TRUE_DISP.
    right = canvas[:, 100 + int(TRUE_DISP) : 100 + int(TRUE_DISP) + W]
    tint = np.array([0.35, 0.75, 0.9], np.float32)
    left_rgb = np.clip(left[..., None] * tint + 0.05, 0, 1)
    right_rgb = np.clip(right[..., None] * tint + 0.05, 0, 1)
    return jnp.asarray(left_rgb), jnp.asarray(right_rgb)


# Oracle-parity matrix: every bundled real stereo fixture. Large pairs run
# the production operating point (/2 downsample, D=64 = 128 full-scale, 3
# iters); the tiny fsl2/fsl3 crops and reef run full-res with a
# proportionate max_disp.
#
# `constrained` marks pairs where the scene actually pins the algorithm's
# output. farmsim_01 and reef1 are measured-AMBIGUOUS: the CUDA-semantics
# oracle diverges from ITSELF by ~1.15 px median under a different noise
# draw there (vs 0.31 on fsl1), an independent SGBM referee puts
# farmsim_01's true median disparity at ~7 px while PatchMatch (ours AND
# the oracle) lands at 35/56 on its textureless water, and the reference's
# own tests keep farmsim_01 commented out (patchmatch_gpu_test.cpp:49-56).
# The <1 px contract is gated on the constrained pairs; the ambiguous pairs
# are still reported (docs/PERFORMANCE.md round-3 notes).
ORACLE_PAIRS = [
    # (left, right, downscale, max_disp, chunks, constrained)
    ("images/fsl1.png", "images/fsr1.png", 2, 64, 16, True),
    ("farmsim_01_left.png", "farmsim_01_right.png", 2, 64, 16, False),
    ("caddy_32_left.jpg", "caddy_32_right.jpg", 2, 64, 16, True),
    ("images/fsl2.png", "images/fsr2.png", 1, 32, 4, True),
    ("images/fsl3.png", "images/fsr3.png", 1, 32, 4, True),
    ("images/reef1_left.png", "images/reef1_right.png", 1, 32, 8, False),
    # KITTI-style outdoor pair (the reference's sgbm_test.cpp fixture):
    # well textured, fully constrained. 0.254 px measured.
    ("images/vkl.jpg", "images/vkr.jpg", 2, 64, 16, True),
]


def oracle_parity_one(lname: str, rname: str, scale: int, max_disp: int, chunks: int):
    """Median |TPU disparity - numpy CUDA-semantics oracle| on one bundled
    real fixture pair. Returns px."""
    import os

    import cv2

    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity
    from ocean_perception_tpu.stereo import oracle
    from ocean_perception_tpu.stereo.cost import cost_volume
    from ocean_perception_tpu.stereo.patchmatch import (
        gradient_magnitude,
        sparse_wta_seed,
        unit_noise,
    )

    ref_dir = os.environ.get("OCEAN_REFERENCE_DIR", "/root/reference")
    lp = os.path.join(ref_dir, "test/resources", lname)
    rp = os.path.join(ref_dir, "test/resources", rname)
    if not os.path.isfile(lp):
        raise FileNotFoundError(lp)
    l = cv2.imread(lp, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    r = cv2.imread(rp, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    if scale > 1:
        l = cv2.resize(l, (l.shape[1] // scale, l.shape[0] // scale))
        r = cv2.resize(r, (r.shape[1] // scale, r.shape[0] // scale))

    p = PatchMatchParams(
        max_disp=max_disp, chunks=chunks, iters=3,
        right_wta=True, volume_bf16=True, subpixel=True, scan_unroll=0,
    )
    gl = gradient_magnitude(jnp.asarray(l))
    gr = gradient_magnitude(jnp.asarray(r))
    C = cost_volume(jnp.asarray(l), jnp.asarray(r), max_disp, p.alpha, gl, gr, dtype=jnp.bfloat16)
    seed = np.asarray(sparse_wta_seed(C, p), np.float32)
    noise = np.asarray(unit_noise(l.shape, p.noise_seed))

    fn = jax.jit(lambda a, b, s: patchmatch_disparity(a, b, p, seed_left=s).left_raw)
    ours = np.asarray(fn(jnp.asarray(l), jnp.asarray(r), jnp.asarray(seed)))
    ref = oracle.patchmatch_oracle(
        l, r, seed, iters=3, alpha=p.alpha, improve_factor=p.improve_factor, noise=noise
    )
    both = (ours > 0) & (ref > 0)
    if both.mean() <= 0.1:
        raise RuntimeError(f"oracle overlap too small: {both.mean():.3f}")
    return float(np.median(np.abs(ours - ref)[both]))


def oracle_parity_matrix():
    """Run the full fixture matrix; returns (per-pair dict, worst px over the
    constrained pairs, fsl1 px)."""
    per_pair = {}
    worst_constrained = None
    for lname, rname, scale, max_disp, chunks, constrained in ORACLE_PAIRS:
        base = lname.split("/")[-1].split("_left")[0].split(".")[0]
        key = f"{base}@/{scale},D={max_disp}"
        try:
            v = round(oracle_parity_one(lname, rname, scale, max_disp, chunks), 3)
        except Exception as e:  # noqa: BLE001 — report partial coverage
            print(f"oracle pair {lname} skipped: {e}", file=sys.stderr)
            v = None
        per_pair[key] = v
        if constrained and v is not None:
            worst_constrained = v if worst_constrained is None else max(worst_constrained, v)
    fsl1 = per_pair.get("fsl1@/2,D=64")
    return per_pair, worst_constrained, fsl1


LAST_GOOD_PATH = "docs/bench_last_good.json"


def wait_for_backend(max_wait_s: float | None = None) -> bool:
    """The axon TPU tunnel occasionally drops; a bare jax.devices() — or a
    first dispatch, even when devices() lists the chip — then HANGS (not
    errors). Probe an actual tiny dispatch in a bounded subprocess and
    retry, so a transient outage delays the bench.

    Budget (env BENCH_MAX_WAIT_S) defaults to 240 s so it always fits
    inside the driver's harness timeout — round 3's 1800 s default
    outlived the driver and produced NO record at all (BENCH_r03 rc=124).
    Returns False (instead of exiting) when the budget runs out so the
    caller can still emit structured JSON with the last-known-good
    results marked stale.

    The probe subprocess inherits the persistent compile-cache dir
    (JAX_COMPILATION_CACHE_DIR) so a healthy-but-slow rig's 1-5 min
    first compile is paid at most once across retries — without it every
    probe recompiles from scratch and a slow compile is
    indistinguishable from a dead tunnel (ADVICE r3)."""
    import os
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_MAX_WAIT_S", "240"))
    # No package import here: the probe must work from any cwd. JAX reads
    # JAX_COMPILATION_CACHE_DIR from the environment natively.
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jax.jit(lambda a: (a*a).sum())(jnp.ones((8, 8)))))")
    env = dict(os.environ)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    t0 = time.time()
    while True:
        budget_left = max_wait_s - (time.time() - t0)
        if budget_left <= 0:
            print("error: TPU backend unreachable (tiny dispatch probe timed "
                  "out repeatedly). Emitting last-known-good results marked "
                  "stale. Set BENCH_MAX_WAIT_S to wait longer.",
                  file=sys.stderr)
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                # Clamp to budget_left so the final probe can never overrun
                # the configured budget (driver margin may be tight).
                timeout=max(min(180.0, budget_left), min(30.0, budget_left)),
                capture_output=True, env=env,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print("TPU backend unreachable; retrying in 20 s...", file=sys.stderr)
        time.sleep(min(20, max(max_wait_s - (time.time() - t0), 0.1)))


def emit_stale_record() -> None:
    """Backend unreachable: ALWAYS print one parseable JSON line so the
    driver captures a structured record instead of nothing (VERDICT r3
    weak #1). Uses the last successful run's results, explicitly flagged."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    record = None
    source = None
    for cand in (LAST_GOOD_PATH, "docs/bench_fused_default_r3.json"):
        p = os.path.join(here, cand)
        if os.path.isfile(p):
            try:
                with open(p) as f:
                    record = json.load(f)
                source = cand
                break
            except Exception:
                continue
    if record is None:
        record = {"metric": f"enhance+{ENGINE}_depth_720p_fps_per_chip",
                  "value": None, "unit": "frames/sec", "vs_baseline": None}
    record["backend_unreachable"] = True
    record["stale"] = True
    record["stale_source"] = source
    record["note"] = ("TPU tunnel down at bench time; numbers are the last "
                      "successful capture, not this run's")
    print(json.dumps(record))


def save_last_good(record: dict) -> None:
    import os

    try:
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)), LAST_GOOD_PATH)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(record, f)
    except OSError as e:  # read-only checkout: the stdout record still stands
        print(f"warning: could not save last-good bench record: {e}", file=sys.stderr)


def main() -> None:
    if not wait_for_backend():
        emit_stale_record()
        return

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()  # skip re-paying 1-5 min remote compiles across runs

    from ocean_perception_tpu.core.cameras import PinholeCamera, StereoCamera
    from ocean_perception_tpu.models.perception import (
        PerceptionConfig,
        perception_step,
    )

    left, right = make_inputs()
    cam = PinholeCamera.create(700.0, 700.0, W / 2, H / 2, H, W)
    rig = StereoCamera.create(cam, cam, baseline=0.12)
    config = PerceptionConfig(engine=ENGINE, max_disp=128, internal_scale=2)

    # RPC floor for reference.
    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1.000001

    float(trivial(left))
    t0 = time.perf_counter()
    for i in range(5):
        float(trivial(left + np.float32(i) * 1e-7))
    rpc_floor_ms = (time.perf_counter() - t0) / 5 * 1e3

    # Single-call latency (1 frame per dispatch, readback forced).
    @jax.jit
    def one_frame(l, r):
        out = perception_step(l, r, rig, config)
        return jnp.sum(out.disparity) + jnp.sum(out.enhanced_left[::16, ::16])

    float(one_frame(left, right))
    t0 = time.perf_counter()
    for i in range(5):
        float(one_frame(left + np.float32(i) * 1e-7, right))
    latency_ms = (time.perf_counter() - t0) / 5 * 1e3

    # Streaming throughput: N sequential frames inside one dispatch, each
    # frame's input perturbed by the previous digest (hard data dependency).
    @jax.jit
    def stream(l, r):
        def frame(carry, i):
            perturb = (carry * 1e-12 + i.astype(jnp.float32) * 1e-7)
            out = perception_step(l + perturb, r, rig, config)
            digest = jnp.sum(out.disparity) * 1e-6 + jnp.sum(out.enhanced_left[::64, ::64])
            return digest, digest

        final, _ = jax.lax.scan(frame, jnp.asarray(0.0, jnp.float32), jnp.arange(N_FRAMES))
        return final

    float(stream(left, right))  # compile + warm
    best = np.inf
    for rep in range(N_REPEATS):
        t0 = time.perf_counter()
        float(stream(left + np.float32((rep + 1) * 1e-7), right))
        best = min(best, time.perf_counter() - t0)
    fps_single = N_FRAMES / best

    # Batched / multi-camera streaming: B vmapped frames per device step —
    # the single-chip stand-in for the north star's multi-camera sensor
    # package (across chips the cam axis shards via multi_camera_step).
    # Still fully sequential across steps via the digest chain. B=8 trips
    # an XLA TPU fusion-emitter crash (pad_low=-4 internal check) on this
    # toolchain unless scan_unroll=1 (docs/PERFORMANCE.md).
    def measure_batched(B, cfg):
        bl = jnp.stack([left] * B)
        br = jnp.stack([right] * B)

        @jax.jit
        def stream_b(l, r):
            def frame(carry, i):
                out = jax.vmap(lambda a, b: perception_step(a, b, rig, cfg))(
                    l + carry * 1e-12 + i.astype(jnp.float32) * 1e-7, r
                )
                digest = jnp.sum(out.disparity) * 1e-6 + jnp.sum(
                    out.enhanced_left[:, ::64, ::64]
                )
                return digest, digest

            final, _ = jax.lax.scan(
                frame, jnp.asarray(0.0, jnp.float32), jnp.arange(N_FRAMES // B)
            )
            return final

        float(stream_b(bl, br))
        best_b = np.inf
        for rep in range(N_REPEATS):
            t0 = time.perf_counter()
            float(stream_b(bl + np.float32((rep + 1) * 1e-7), br))
            best_b = min(best_b, time.perf_counter() - t0)
        return (N_FRAMES // B) * B / best_b  # total frames/sec across the package

    fps_batched = measure_batched(2, config)
    fps_cam4_total = measure_batched(4, config)
    fps_per_camera_x4 = fps_cam4_total / 4

    # Farm mode: the aquaculture-inspection operating point (internal_scale=4
    # — PatchMatch on a /4 plane, enhance still full-res). A different
    # quality point than the BASELINE contract, so it is reported separately
    # and never feeds the headline `value`.
    farm_config = PerceptionConfig(engine=ENGINE, max_disp=128, internal_scale=4)
    fps_farm4_total = measure_batched(4, farm_config)

    fps = max(fps_single, fps_batched, fps_cam4_total)

    # Accuracy half of the BASELINE metric: median |disparity error| on the
    # known-truth scene over valid (non-masked) pixels.
    @jax.jit
    def disp_err(l, r):
        out = perception_step(l, r, rig, config)
        d = out.disparity
        valid = d > 0
        err = jnp.abs(d - TRUE_DISP)
        err_sorted = jnp.sort(jnp.where(valid, err, jnp.inf).reshape(-1))
        n_valid = jnp.sum(valid)
        median = err_sorted[jnp.maximum(n_valid // 2, 1)]
        return median, n_valid / d.size

    med_err, valid_frac = disp_err(left, right)
    med_err, valid_frac = float(med_err), float(valid_frac)

    # BASELINE row 2 as written: median |disparity - CUDA-reference-oracle|
    # on the bundled REAL fixtures ("bundled test datasets") at the
    # production operating point (patchmatch_gpu_test.cpp:63-93) with the
    # shipped config (bf16 volume + right_wta + subpixel + full unroll).
    # THIS is the accuracy headline; the synthetic-scene median below it is
    # the easiest possible input for a propagation algorithm and is reported
    # only for continuity.
    oracle_pairs = oracle_worst = oracle_fsl1 = None
    if ENGINE == "patchmatch":
        try:
            oracle_pairs, oracle_worst, oracle_fsl1 = oracle_parity_matrix()
        except Exception as e:  # fixture mount or host-CPU issue: report null
            print(f"oracle parity matrix skipped: {e}", file=sys.stderr)

    record = {
                "metric": f"enhance+{ENGINE}_depth_720p_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "streaming_frames": N_FRAMES,
                "fps_single_stream": round(fps_single, 2),
                "fps_batched_x2": round(fps_batched, 2),
                "fps_multicam_x4_total": round(fps_cam4_total, 2),
                "fps_per_camera_x4": round(fps_per_camera_x4, 2),
                "fps_farm_mode_x4_total": round(fps_farm4_total, 2),
                "fps_per_camera_farm_x4": round(fps_farm4_total / 4, 2),
                "single_dispatch_latency_ms": round(latency_ms, 1),
                "rpc_floor_ms": round(rpc_floor_ms, 1),
                "median_abs_diff_vs_oracle_px": oracle_fsl1,
                # Worst over the CONSTRAINED pairs (fsl1-3, caddy); the
                # measured-ambiguous farmsim_01/reef1 appear in
                # oracle_pairs_px (see ORACLE_PAIRS note).
                "oracle_diff_px_worst": oracle_worst,
                "oracle_pairs_px": oracle_pairs,
                "synthetic_scene_median_error_px": round(med_err, 3),
                "valid_disparity_fraction": round(valid_frac, 3),
            }
    save_last_good(record)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
