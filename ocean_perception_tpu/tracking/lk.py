"""Pyramidal Lucas-Kanade optical flow, vmapped over keypoints.

Reference parity: ft/FeatureTracker (feature_tracker.cpp:19-95) wraps
cv::calcOpticalFlowPyrLK — window 21, 4 pyramid levels, <=30 iterations,
eps 0.01, plus an optional bidirectional forward/backward consistency check
with a pixel tolerance (klt_fwd_bwd_tol).

TPU design: per keypoint and per level, a search *window* around the current
guess is extracted once with a dynamic slice; every LK iteration then
resamples the shifted patch from that in-register window via the separable
bilinear matmuls in ops.interp (MXU-friendly, no per-iteration gathers).
The spatial-gradient normal matrix G comes from the template patch and is
inverted once per level. Iterations run under lax.fori_loop with convergence
masking; points whose flow leaves the search window are flagged invalid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.image import image_pyramid
from ..ops.interp import sample_patches_bilinear


@struct.dataclass
class LKParams:
    window: int = struct.field(pytree_node=False, default=21)
    max_level: int = struct.field(pytree_node=False, default=3)  # 4 levels: 0..3
    max_iters: int = struct.field(pytree_node=False, default=30)
    eps: float = struct.field(pytree_node=False, default=0.01)
    # cv2 uses 1e-4 on 0..255-scale images; our images are [0, 1] so the
    # equivalent gate is ~1e-4/255^2.
    min_eig_threshold: float = struct.field(pytree_node=False, default=1.5e-9)
    bidirectional: bool = struct.field(pytree_node=False, default=True)
    fwd_bwd_tol: float = struct.field(pytree_node=False, default=2.0)
    # Large-displacement initialization: exhaustive block match at the
    # coarsest level seeds the LK guess (captures motions far beyond the
    # iterative walk's reach on extreme-baseline pairs).
    coarse_init: bool = struct.field(pytree_node=False, default=False)
    coarse_search: int = struct.field(pytree_node=False, default=12)
    coarse_patch: int = struct.field(pytree_node=False, default=9)
    # Unroll factor for the per-level iteration loop (0 = FULL unroll).
    # Measured on TPU: full unroll is SLOWER (61 vs 55 ms for K=200) — the
    # per-iteration gathers dominate, not loop overhead. Kept for sweeps.
    iter_unroll: int = struct.field(pytree_node=False, default=1)
    # search_slack > 0: extract ONE (window + 2*slack)^2 search window per
    # level and resample within it every iteration (two small matmuls), so
    # each level costs 1 gather per point instead of max_iters gathers — the
    # dominant LK cost on TPU. Points whose walk leaves the slack region
    # freeze at the boundary (coarse-to-fine residuals are ~1-2 px per level,
    # so slack 4 is generous; 0 = unbounded per-iteration re-extraction).
    search_slack: int = struct.field(pytree_node=False, default=4)
    # Correlation-surface iterations (requires search_slack > 0): the LK
    # update only needs the two scalars sum(diff*gx), sum(diff*gy), and the
    # resampled patch is bilinear in its offset within the slack window — so
    # each scalar is EXACTLY a bilinear lookup of a precomputed correlation
    # surface S_g(a, b) = <window[a:a+win, b:b+win], g> over the (2s+3)^2
    # integer offsets. Per level: one MXU correlation precompute; per
    # iteration: two (A,)-tent-weight contractions (~100 flops) instead of
    # two (win, ws)-matmul patch resamples (~70k flops). Mathematically
    # identical up to f32 reassociation; the sequential walk (the measured
    # per-point bottleneck of the fleet step) stops paying O(win^2) per step.
    # Measured STANDALONE (v5e, 720p, K=200, bidirectional, slope method):
    # 7.86 -> 5.15 ms/frame; per-point slope 35.0 -> 23.7 us/pt. BUT inside
    # the composed frontend graph the win INVERTS — the x-unfold surface
    # precompute materializes (ws, A, win) intermediates per point that the
    # bigger graph can't fuse away (B=1 full frontend 9.83 -> 11.15 ms;
    # B=4 fleet 42.95 -> 63.40 ms; docs/PERFORMANCE.md "lk-mode ablation").
    # Default OFF in production; ON wins only for standalone tracking.
    corr_iters: bool = struct.field(pytree_node=False, default=False)
    # How the correlation surfaces are built: "einsum" (x-unfold matmul on
    # the MXU; 2.8x redundant MACs) or "slices" (direct per-offset window
    # products on the VPU; minimal MACs). Same values either way (f32
    # association aside).
    corr_impl: str = struct.field(pytree_node=False, default="einsum")
    # Run each level's iteration walk as ONE Pallas kernel launch
    # (ops/pallas/lk_iterate.py): surfaces for all K points VMEM-resident,
    # K on the lane axis, fixed masked fori_loop (== the early-exit while,
    # see exit_unroll note). True FORCES the corr-surface prep (the kernel
    # consumes the surfaces); None = AUTO, which picks it only when
    # corr_iters is already on AND the backend is real TPU. Standalone
    # tracker win (4.29 vs 5.24 ms at K=200), but the corr prep it rides on
    # loses inside the composed frontend (see corr_iters note) — so with the
    # production matmul default, AUTO stays off. search_slack > 0 required.
    pallas_iters: bool | None = struct.field(pytree_node=False, default=None)
    # Batched per-point window extraction (ops/windows.py): per level, ALL
    # K template windows and ALL K slack windows come out of TWO one-hot
    # MXU contractions each instead of K vmapped dynamic_slices (TPU lowers
    # those to gathers — measured as the dominant, mode-independent cost of
    # the fleet tracking step; docs/PERFORMANCE.md "lk-mode ablation").
    # Requires the level-major walk (same restructure as the Pallas path);
    # BIT-IDENTICAL to the sliced path — every extracted element is
    # 1*value + sum-of-0s (locked by test_lk_batched_windows_bit_identical).
    # None = AUTO (on for real TPU); only engages for the production matmul
    # mode (search_slack > 0, corr/pallas off).
    batched_windows: bool | None = struct.field(pytree_node=False, default=None)
    # FUSED level kernels (round 5, ops/pallas/lk_prep.py + lk_iterate.py):
    # per level-direction, ONE Pallas prep launch DMAs every point's
    # template + slack window straight out of the HBM pyramid into VMEM,
    # recenters/differentiates the template, and builds the correlation
    # surfaces with K on the lane axis — then the lane-major walk kernel
    # consumes them with zero XLA relayouts. The per-point intermediates
    # that spill to HBM in the composed fleet graph (the proven blocker of
    # every prior isolation win — PERFORMANCE.md lk-mode ablation) cannot
    # exist by construction. Math = the documented corr-surface equivalent
    # of the production matmul walk (parity test vs the XLA corr path).
    # None = AUTO = on for real TPU when search_slack > 0: the composed
    # B=4 fleet A/B measured 34.66 -> 24.28 ms/fleet-step and the single
    # camera full frontend 9.90 -> 6.57 ms; tracking accuracy vs known
    # motion is slightly BETTER than the XLA path on hardware (its
    # default-precision MXU prep truncates to bf16; the kernel prep is f32
    # VPU arithmetic). False forces the XLA paths (PERFORMANCE.md round 5).
    fused_lk: bool | None = struct.field(pytree_node=False, default=None)
    # Truncated backward (verification) pass: run only the N FINEST pyramid
    # levels of the bidirectional re-track, initialized at the ORIGINAL
    # point (the known round-trip target) instead of a zero-motion guess.
    # The backward pass exists only to verify local consistency — a correct
    # forward track re-converges onto its origin from the origin itself, so
    # the coarse levels (whose job is covering large unknown motion) are
    # redundant work on the per-point critical path. A WRONG forward track
    # carries a different feature's template, which the fine-level walk
    # rejects (diverges or fails the tol). Two hardenings make the cheap
    # gate safe: the walk inits at target + fwd_bwd_tol per axis (a walk
    # that never moves FAILS the tol instead of trivially passing it — see
    # _bwd_init) and a ZNCC appearance check (bwd_zncc_min) rejects
    # total-mismatch templates the short walk can't. Measured on the
    # synthetic translation scene the combination strictly DOMINATES the
    # full backward: it recovers the full gate's coarse-level false rejects
    # (+8 correct accepts of 120) and its only dropped full-accept is a
    # wrong track the ZNCC gate catches. 0 (= all levels, zero-motion init,
    # exact reference semantics) stays the default;
    # test_lk_bwd_levels_gating_equivalence locks the trade.
    bwd_levels: int = struct.field(pytree_node=False, default=0)
    # Appearance gate for the truncated backward mode: minimum ZNCC between
    # the template patch at each point's origin and the patch at its tracked
    # position. The 2-level init-at-offset walk wanders less than the full
    # 4-level one, so pure round-trip geometry rejects less of the
    # total-mismatch case (unrelated/occluded content) — ZNCC rejects it
    # directly (noise-vs-texture correlates ~0, true matches ~0.9+, and
    # ZNCC is invariant to the affine lighting drift underwater scenes
    # actually have). Costs ~one LK iteration per point. Applied when
    # bwd_levels truncates, or in ANY bidirectional mode via zncc_gate.
    bwd_zncc_min: float = struct.field(pytree_node=False, default=0.5)
    # Apply the ZNCC appearance gate on top of the FULL backward check too
    # (independent of bwd_levels): the round-trip geometry alone admits
    # occasional wrong tracks whose backward walk happens to return (the
    # synthetic-scene test catches a 7.5 px one); the appearance check
    # rejects them directly. Off by default (exact reference semantics).
    zncc_gate: bool = struct.field(pytree_node=False, default=False)
    # Early exit: run the per-level iterations as a while_loop that stops
    # once EVERY point has converged (vmap batches the loop with an any-lane
    # condition). Bit-identical to the fixed fori_loop — converged points
    # are already frozen by masking; the loop just stops paying for them.
    # LK is a ~240-deep sequential chain of tiny ops (4 levels x 2
    # directions x 30 iters), so trip count IS the latency. Measured on TPU:
    # 12.4 -> 10.2 ms for bidirectional K=200 @ 376x672; never slower than
    # the fixed loop (bounded by the same max_iters).
    early_exit: bool = struct.field(pytree_node=False, default=True)
    # Bodies per early-exit while_loop trip. The body freezes converged/hit
    # points by masking, so running it k times per trip is BIT-IDENTICAL as
    # long as max_iters % k == 0 (checked; falls back to 1 otherwise) — the
    # loop just checks the all-done condition every k-th step, trading at
    # most k-1 masked no-op steps for k-fold fewer cond evaluations (each a
    # cross-lane any-reduce) on the sequential critical path. Measured on
    # v5e: NEUTRAL (5.33/5.33/5.20/5.29 ms for u1/u2/u3/u5 at K=200) — the
    # per-iteration op latency dominates, not the cond. Kept at 1.
    exit_unroll: int = struct.field(pytree_node=False, default=1)


class FlowResult(NamedTuple):
    points: jnp.ndarray  # (K, 2) tracked positions in the new image
    status: jnp.ndarray  # (K,) bool — tracked successfully


def _dslice(img: jnp.ndarray, src, y0, x0, h: int, w: int) -> jnp.ndarray:
    """Dynamic (h, w) window from a 2-D image or, when ``img`` is a 3-D ring
    of images, from ring entry ``src`` (k-ago re-tracking: each point's
    template may come from a different past frame)."""
    if img.ndim == 2:
        return jax.lax.dynamic_slice(img, (y0, x0), (h, w))
    return jax.lax.dynamic_slice(
        img, (jnp.asarray(src, jnp.int32), y0, x0), (1, h, w)
    )[0]


def _coarse_block_match(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    points: jnp.ndarray,   # (K, 2) at this level's scale
    search: int,
    patch: int,
) -> jnp.ndarray:
    """Exhaustive SSD block match around each point at one pyramid level.

    Returns (K, 2) matched positions. A (2s+1)^2 search of a p x p template —
    per keypoint a (p+2s)^2 window is sliced and all offsets evaluated via
    static shifts (vmapped; no data-dependent shapes).
    """
    H, W = prev_img.shape
    r = patch // 2
    win = patch + 2 * search
    pad = search + r + 1
    prev_pad = jnp.pad(prev_img, pad, mode="edge")
    next_pad = jnp.pad(next_img, pad, mode="edge")

    offs = jnp.arange(-search, search + 1)

    def one(pt):
        x0 = jnp.round(pt[0]).astype(jnp.int32) + pad
        y0 = jnp.round(pt[1]).astype(jnp.int32) + pad
        templ = jax.lax.dynamic_slice(prev_pad, (y0 - r, x0 - r), (patch, patch))
        window = jax.lax.dynamic_slice(
            next_pad, (y0 - r - search, x0 - r - search), (win, win)
        )
        # SSD at every offset via static slices (unrolled (2s+1)^2 at trace
        # time — s is small; each term is a p x p elementwise op).
        costs = []
        for dy in range(2 * search + 1):
            row = []
            for dx in range(2 * search + 1):
                diff = window[dy : dy + patch, dx : dx + patch] - templ
                row.append(jnp.sum(diff * diff))
            costs.append(jnp.stack(row))
        cost = jnp.stack(costs)  # (2s+1, 2s+1)
        best = jnp.argmin(cost.reshape(-1))
        by = best // (2 * search + 1) - search
        bx = best % (2 * search + 1) - search
        return pt + jnp.stack([bx, by]).astype(pt.dtype)

    return jax.vmap(one)(points)


def _template_origin(pt_prev, win: int, pad: int, H: int, W: int):
    """Integer origin of the (win+3)^2 template window (win+2 for
    central-difference gradients, +1 slack for the floor)."""
    r = win // 2
    t0y = jnp.clip(jnp.floor(pt_prev[1]) + pad - r - 1, 0, H + 2 * pad - (win + 3)).astype(jnp.int32)
    t0x = jnp.clip(jnp.floor(pt_prev[0]) + pad - r - 1, 0, W + 2 * pad - (win + 3)).astype(jnp.int32)
    return t0y, t0x


def _template_from_window(twin, pt_prev, t0y, t0x, p: LKParams, win: int, pad: int):
    """Template precompute given the already-extracted (win+3)^2 window:
    subpixel-centered template patch, central-difference gradients, the
    inverted 2x2 normal matrix, and the min-eig quality gate."""
    # Bilinear-center the template on the true subpixel location.
    fy = pt_prev[1] + pad - t0y.astype(twin.dtype)
    fx = pt_prev[0] + pad - t0x.astype(twin.dtype)
    template = sample_patches_bilinear(twin, fy, fx, win + 2, win + 2)
    tpatch = template[1:-1, 1:-1]
    # Scharr-free central-difference gradients (cv::calcOpticalFlowPyrLK uses
    # a similar local derivative).
    gx = 0.5 * (template[1:-1, 2:] - template[1:-1, :-2])
    gy = 0.5 * (template[2:, 1:-1] - template[:-2, 1:-1])

    # Normal matrix G (2x2), inverted once.
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    min_eig = 0.5 * ((gxx + gyy) - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy**2)) / (win * win)
    ok_g = (det > 1e-12) & (min_eig > p.min_eig_threshold)
    inv = jnp.array([[gyy, -gxy], [-gxy, gxx]]) / jnp.where(det > 1e-12, det, 1.0)
    return tpatch, gx, gy, inv, ok_g


def _template_side(prev_img, src_prev, pt_prev, p: LKParams, win: int, pad: int, H: int, W: int):
    """Template-side per-point precompute at one level (sliced variant):
    window via dynamic_slice, then `_template_from_window`."""
    t0y, t0x = _template_origin(pt_prev, win, pad, H, W)
    twin = _dslice(prev_img, src_prev, t0y, t0x, win + 3, win + 3)
    return _template_from_window(twin, pt_prev, t0y, t0x, p, win, pad)


def _matmul_body(swin, tpatch, gx, gy, inv, sy0, sx0, p: LKParams, win: int, ws: int, pad: int):
    """Per-iteration body of the matmul-resample slack walk (the production
    default): resample the shifted patch from the in-register slack window
    via the separable bilinear matmuls, then one Gauss-Newton step."""
    r = win // 2

    def body(_, carry):
        pos, converged, hit = carry
        cy = pos[1] + pad - sy0.astype(pos.dtype)
        cx = pos[0] + pad - sx0.astype(pos.dtype)
        # Leaving the slack region = level failure (the unbounded walk
        # would have diverged out of the image; a frozen-at-boundary
        # guess must NOT be accepted — finer levels can only correct
        # within their own slack and never recover from it).
        in_win = (
            (cy >= r + 1) & (cy <= ws - r - 2) & (cx >= r + 1) & (cx <= ws - r - 2)
        )
        hit = hit | ~in_win
        patch = sample_patches_bilinear(swin, cy, cx, win, win)
        diff = patch - tpatch
        b = jnp.array([jnp.sum(diff * gx), jnp.sum(diff * gy)])
        delta = -(inv @ b)
        stop = converged | hit
        new_pos = jnp.where(stop, pos, pos + delta)
        converged = stop | (jnp.sum(delta * delta) < p.eps * p.eps)
        return (new_pos, converged, hit)

    return body


def _run_slack_walk(body, guess, p: LKParams):
    """Drive a slack-walk body (pos, converged, hit carry) under the
    configured loop regime: early-exit while (with exit_unroll) or fixed
    fori_loop. Returns (pos, hit)."""
    unroll = True if p.iter_unroll <= 0 else p.iter_unroll
    xu = p.exit_unroll if p.exit_unroll > 1 and p.max_iters % p.exit_unroll == 0 else 1
    if p.early_exit:
        def w_cond(c):
            i, pos, converged, hit = c
            return (i < p.max_iters) & ~(converged | hit)

        def w_body(c):
            i, pos, converged, hit = c
            for _ in range(xu):
                pos, converged, hit = body(i, (pos, converged, hit))
            return (i + xu, pos, converged, hit)

        _, pos, _, hit = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.asarray(0), guess, jnp.asarray(False), jnp.asarray(False)),
        )
    else:
        pos, _, hit = jax.lax.fori_loop(
            0, p.max_iters, body,
            (guess, jnp.asarray(False), jnp.asarray(False)), unroll=unroll,
        )
    return pos, hit


def _corr_surfaces(swin, tpatch, gx, gy, win: int, impl: str):
    """Correlation surfaces S_g(a, b) = <swin[a:a+win, b:b+win], g> for
    g in {gx, gy} plus the constant template dot products. The LK residual
    scalars are exact bilinear lookups of these surfaces (see LKParams
    .corr_iters)."""
    ws = swin.shape[-1]
    A = ws - win + 1
    g2 = jnp.stack([gx, gy])  # (2, win, win)
    if impl == "einsum":
        # x-unfold matmul (MXU): computes partial sums for all
        # (row, template-row) pairs then takes the a = row - y
        # diagonal — 2.8x more MACs than needed but one big dot.
        cols = jnp.stack(
            [jax.lax.slice_in_dim(swin, b, b + win, axis=1) for b in range(A)],
            axis=1,
        )  # (ws, A, win): cols[c, b, x] = swin[c, b + x]
        m = jnp.einsum("cbx,gyx->gcby", cols, g2)  # (2, ws, A, win)
        corr = sum(m[:, y : y + A, :, y] for y in range(win))  # (2, A, A)
    else:
        # Direct form (VPU): one masked window product per integer
        # offset — exactly the A*A*win*win MACs the surface needs,
        # all elementwise (vectorized over K by the caller's vmap).
        corr = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.sum(swin[a : a + win, b : b + win] * g2, axis=(-2, -1))
                        for b in range(A)
                    ],
                    axis=-1,
                )
                for a in range(A)
            ],
            axis=-2,
        )  # (2, A, A)
    tg = jnp.stack([jnp.sum(tpatch * gx), jnp.sum(tpatch * gy)])
    return corr, tg


def _lk_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pt_prev: jnp.ndarray,   # (2,) location in prev at this level
    guess: jnp.ndarray,     # (2,) current flow-target estimate in next
    p: LKParams,
    win: int | None = None,
    pad: int = 0,
    src_prev=0,
    src_next=0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK for one keypoint. Returns (new_guess, ok).

    ``prev_img``/``next_img`` must be replicate-padded by ``pad`` pixels on
    every side (cv2 pads its pyramid the same way); coordinates are in the
    UNPADDED frame, offset internally. This keeps border keypoints trackable
    without off-center window clamps. Either image may be a 3-D ring of
    frames, selected per point by ``src_prev``/``src_next`` (k-ago
    re-tracking, stereo_tracker.cpp:33-88 parity).
    """
    win = p.window if win is None else win
    r = win // 2

    H, W = prev_img.shape[-2] - 2 * pad, prev_img.shape[-1] - 2 * pad
    tpatch, gx, gy, inv, ok_g = _template_side(
        prev_img, src_prev, pt_prev, p, win, pad, H, W
    )

    if p.search_slack > 0:
        # One slack window per level: iterations resample inside it with the
        # separable matmuls — 1 gather/level/point instead of max_iters.
        s = p.search_slack
        ws = win + 2 * (s + 1)
        sy0 = jnp.clip(jnp.floor(guess[1]) + pad - r - s - 1, 0, H + 2 * pad - ws).astype(jnp.int32)
        sx0 = jnp.clip(jnp.floor(guess[0]) + pad - r - s - 1, 0, W + 2 * pad - ws).astype(jnp.int32)
        swin = _dslice(next_img, src_next, sy0, sx0, ws, ws)

        if p.corr_iters:
            # S_g(a, b) = sum_{y,x} swin[a+y, b+x] * g[y, x] for every integer
            # patch top-left (a, b); A = ws - win + 1 = 2*slack + 3. Built as
            # an x-unfold matmul (MXU) + diagonal y-reduction. in_win keeps
            # the live walk at a in [1, A-2], so the two bilinear taps never
            # leave the surface and the lookup is exact (see _axis_weights:
            # its border clamp is likewise never active for in-window points).
            A = ws - win + 1
            corr, tg = _corr_surfaces(swin, tpatch, gx, gy, win, p.corr_impl)
            ia = jnp.arange(A, dtype=swin.dtype)

            def body(_, carry):
                pos, converged, hit = carry
                cy = pos[1] + pad - sy0.astype(pos.dtype)
                cx = pos[0] + pad - sx0.astype(pos.dtype)
                in_win = (
                    (cy >= r + 1) & (cy <= ws - r - 2) & (cx >= r + 1) & (cx <= ws - r - 2)
                )
                hit = hit | ~in_win
                # Tent weights = exact bilinear weights of offset (cy-r, cx-r).
                wy = jnp.maximum(0.0, 1.0 - jnp.abs((cy - r) - ia))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs((cx - r) - ia))
                b = (corr @ wx) @ wy - tg  # (2,): [sum(diff*gx), sum(diff*gy)]
                delta = -(inv @ b)
                stop = converged | hit
                new_pos = jnp.where(stop, pos, pos + delta)
                converged = stop | (jnp.sum(delta * delta) < p.eps * p.eps)
                return (new_pos, converged, hit)

        else:
            body = _matmul_body(swin, tpatch, gx, gy, inv, sy0, sx0, p, win, ws, pad)

    else:
        # Each iteration re-extracts a (win+2)^2 window centered on the
        # current estimate, so the walk is unbounded like cv2's —
        # iterations, not window slack, limit motion.
        ws = win + 2

        def body(_, carry):
            pos, converged = carry
            y0 = jnp.clip(jnp.floor(pos[1]) + pad - r - 1, 0, H + 2 * pad - ws).astype(jnp.int32)
            x0 = jnp.clip(jnp.floor(pos[0]) + pad - r - 1, 0, W + 2 * pad - ws).astype(jnp.int32)
            swin = _dslice(next_img, src_next, y0, x0, ws, ws)
            cy = pos[1] + pad - y0.astype(pos.dtype)
            cx = pos[0] + pad - x0.astype(pos.dtype)
            patch = sample_patches_bilinear(swin, cy, cx, win, win)
            diff = patch - tpatch
            b = jnp.array([jnp.sum(diff * gx), jnp.sum(diff * gy)])
            delta = -(inv @ b)
            new_pos = jnp.where(converged, pos, pos + delta)
            converged = converged | (jnp.sum(delta * delta) < p.eps * p.eps)
            return (new_pos, converged)

    if p.search_slack > 0:
        # while_loop with an all-done exit (or fixed fori): the body is
        # idempotent for converged points (masked updates), so the batched
        # loop (vmap runs it while ANY lane is live) is bit-identical.
        pos, hit = _run_slack_walk(body, guess, p)
    else:
        unroll = True if p.iter_unroll <= 0 else p.iter_unroll
        xu = p.exit_unroll if p.exit_unroll > 1 and p.max_iters % p.exit_unroll == 0 else 1
        if p.early_exit:
            def w_cond(c):
                i, pos, converged = c
                return (i < p.max_iters) & ~converged

            def w_body(c):
                i, pos, converged = c
                for _ in range(xu):
                    pos, converged = body(i, (pos, converged))
                return (i + xu, pos, converged)

            _, pos, _ = jax.lax.while_loop(
                w_cond, w_body, (jnp.asarray(0), guess, jnp.asarray(False))
            )
        else:
            pos, _ = jax.lax.fori_loop(
                0, p.max_iters, body, (guess, jnp.asarray(False)), unroll=unroll
            )
        hit = jnp.asarray(False)

    in_img = (pos[0] >= 0) & (pos[0] <= W - 1) & (pos[1] >= 0) & (pos[1] <= H - 1)
    finite = jnp.all(jnp.isfinite(pos))
    return pos, ok_g & in_img & finite & ~hit


def _pad_level(im: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Replicate-pad the spatial dims of a level (2-D) or ring level (3-D)."""
    if im.ndim == 2:
        return jnp.pad(im, pad, mode="edge")
    return jnp.pad(im, ((0, 0), (pad, pad), (pad, pad)), mode="edge")


def pyramidal_lk(
    prev_pyr,
    next_pyr,
    points: jnp.ndarray,   # (K, 2)
    p: LKParams,
    initial_flow: jnp.ndarray | None = None,
    src_prev: jnp.ndarray | None = None,   # (K,) ring index when prev_pyr is a ring
    src_next: jnp.ndarray | None = None,   # (K,) ring index when next_pyr is a ring
) -> FlowResult:
    """Coarse-to-fine LK over prebuilt pyramids, vmapped over K points.

    Either pyramid may be a RING: levels shaped (Rk, Hl, Wl) with a per-point
    source index — each landmark's template (or search image) then comes from
    its own past frame (k-ago re-tracking)."""
    levels = len(prev_pyr)
    scale0 = 2.0 ** (levels - 1)

    # Every level is replicate-padded (cv2-style) so border keypoints and
    # tiny coarse levels stay usable with the full window. Levels smaller
    # than a 7px window are skipped (static check on traced shapes).
    pad = p.window // 2 + 2
    prev_pad = [_pad_level(im, pad) for im in prev_pyr]
    next_pad = [_pad_level(im, pad) for im in next_pyr]

    def level_window(lvl: int):
        avail = min(min(prev_pyr[lvl].shape[-2:]), min(next_pyr[lvl].shape[-2:]))
        win = min(p.window, avail)
        win -= (win + 1) % 2  # odd
        return win if win >= 7 else None

    K = points.shape[0]
    zeros_k = jnp.zeros(K, jnp.int32)
    sp = zeros_k if src_prev is None else jnp.asarray(src_prev, jnp.int32)
    sn = zeros_k if src_next is None else jnp.asarray(src_next, jnp.int32)

    init0 = points if initial_flow is None else initial_flow
    use_fused = p.fused_lk
    if use_fused is None:
        # AUTO: on for real TPU — the composed-fleet A/B measured the fused
        # kernels cutting the B=4 full-quality fleet step 34.66 -> 24.28 ms
        # and the single-camera full frontend 9.90 -> 6.57 ms, with
        # hardware-validated accuracy (median 0.0083 px vs truth, slightly
        # better than the XLA path; PERFORMANCE.md round 5). Off elsewhere
        # (interpret mode at production shapes is unusable).
        use_fused = jax.default_backend() == "tpu"
    if use_fused and p.search_slack > 0:
        return _pyramidal_lk_fused(
            prev_pad, next_pad, points, init0, sp, sn, p, level_window,
            levels, pad, interpret=jax.default_backend() != "tpu",
        )

    use_pallas = p.pallas_iters
    if use_pallas is None:  # auto: only atop an explicit corr_iters, on real TPU
        use_pallas = p.corr_iters and jax.default_backend() == "tpu"
    if use_pallas and p.search_slack > 0:
        return _pyramidal_lk_level_major(
            prev_pad, next_pad, points, init0, sp, sn, p, level_window,
            levels, pad, interpret=jax.default_backend() != "tpu",
        )

    use_batched = p.batched_windows
    if use_batched is None:  # auto: the gather cost only bites on real TPU
        use_batched = jax.default_backend() == "tpu"
    if use_batched and p.search_slack > 0 and not p.corr_iters:
        return _pyramidal_lk_batched(
            prev_pad, next_pad, points, init0, sp, sn, p, level_window,
            levels, pad,
        )

    def one_point(pt, init, s_p, s_n):
        guess = init / scale0
        ok = jnp.asarray(False)
        for lvl in range(levels - 1, -1, -1):
            win = level_window(lvl)
            if win is not None:
                s = 2.0**lvl
                pt_l = pt / s
                new_guess, ok_l = _lk_level(
                    prev_pad[lvl], next_pad[lvl], pt_l, guess, p, win=win, pad=pad,
                    src_prev=s_p, src_next=s_n,
                )
                guess = jnp.where(ok_l, new_guess, guess)
                if lvl == 0:
                    # OpenCV semantics: status comes from the finest level;
                    # coarse-level failures only skip the guess refinement.
                    ok = ok_l
            if lvl > 0:
                guess = guess * 2.0
        return guess, ok

    pts, status = jax.vmap(one_point)(points, init0, sp, sn)
    return FlowResult(points=pts, status=status)


def _pyramidal_lk_level_major(
    prev_pad, next_pad, points, init, sp, sn, p: LKParams, level_window,
    levels: int, pad: int, interpret: bool,
) -> FlowResult:
    """Level-major variant of the coarse-to-fine walk: per level, a vmapped
    XLA prep (template + slack gather + correlation surfaces) feeds ONE
    Pallas launch that runs the whole iteration loop for all K points
    (ops/pallas/lk_iterate.py). Same math as the vmapped corr-mode loop;
    parity locked by test_lk_pallas_iterate_matches_xla."""
    from ..ops.pallas.lk_iterate import lk_iterate_pallas

    scale0 = 2.0 ** (levels - 1)
    s = p.search_slack
    guess = init / scale0
    ok = jnp.zeros(points.shape[0], bool)
    for lvl in range(levels - 1, -1, -1):
        win = level_window(lvl)
        if win is not None:
            r = win // 2
            ws = win + 2 * (s + 1)
            sc = 2.0 ** lvl
            pts_l = points / sc
            H = prev_pad[lvl].shape[-2] - 2 * pad
            W = prev_pad[lvl].shape[-1] - 2 * pad

            def prep(pt, g, s_p, s_n,
                     _prev=prev_pad[lvl], _next=next_pad[lvl],
                     _win=win, _ws=ws, _r=r, _H=H, _W=W):
                tpatch, gx, gy, inv, ok_g = _template_side(
                    _prev, s_p, pt, p, _win, pad, _H, _W
                )
                sy0 = jnp.clip(
                    jnp.floor(g[1]) + pad - _r - s - 1, 0, _H + 2 * pad - _ws
                ).astype(jnp.int32)
                sx0 = jnp.clip(
                    jnp.floor(g[0]) + pad - _r - s - 1, 0, _W + 2 * pad - _ws
                ).astype(jnp.int32)
                swin = _dslice(_next, s_n, sy0, sx0, _ws, _ws)
                corr, tg = _corr_surfaces(swin, tpatch, gx, gy, _win, p.corr_impl)
                return corr, tg, inv, ok_g, sy0, sx0

            corr, tg, inv, ok_g, sy0, sx0 = jax.vmap(prep)(pts_l, guess, sp, sn)
            pos, hit = lk_iterate_pallas(
                corr, tg, inv, sy0, sx0, guess,
                r=r, ws=ws, pad=pad, max_iters=p.max_iters, eps=float(p.eps),
                interpret=interpret,
            )
            in_img = (
                (pos[:, 0] >= 0) & (pos[:, 0] <= W - 1)
                & (pos[:, 1] >= 0) & (pos[:, 1] <= H - 1)
            )
            ok_l = ok_g & in_img & jnp.all(jnp.isfinite(pos), axis=-1) & ~hit
            guess = jnp.where(ok_l[:, None], pos, guess)
            if lvl == 0:
                # OpenCV semantics: status comes from the finest level.
                ok = ok_l
        if lvl > 0:
            guess = guess * 2.0
    return FlowResult(points=guess, status=ok)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _fused_level_fn(win, slack, pad, min_eig, max_iters, eps, interpret):
    """One level-direction of the fused-kernel walk: prep kernel -> walk
    kernel, lane-major end to end. sequential_vmap makes an outer
    camera-axis vmap (the farm fleet) lower to a lax.map of per-camera
    launches — each camera has its own images, so lanes cannot be shared."""
    from ..ops.pallas.lk_iterate import lk_iterate_lane_major
    from ..ops.pallas.lk_prep import lk_prep_pallas

    r = win // 2
    ws = win + 2 * (slack + 1)

    @jax.custom_batching.sequential_vmap
    def level(tmpl, srch, pts, guess, sp, sn):
        corr, scal, okg, _, _ = lk_prep_pallas(
            tmpl, srch, pts, guess, sp, sn,
            win=win, slack=slack, pad=pad, min_eig_threshold=min_eig,
            interpret=interpret,
        )
        K = pts.shape[0]
        Kp = corr.shape[-1]
        pos0 = jnp.pad(
            jnp.transpose(guess.astype(jnp.float32)), ((0, 0), (0, Kp - K))
        )
        pos_t, hit_f = lk_iterate_lane_major(
            corr, scal, pos0, r=r, ws=ws, pad=pad, max_iters=max_iters,
            eps=eps, interpret=interpret,
        )
        return jnp.transpose(pos_t)[:K], hit_f[0, :K] > 0.5, okg

    return level


def _pyramidal_lk_fused(
    prev_pad, next_pad, points, init, sp, sn, p: LKParams, level_window,
    levels: int, pad: int, interpret: bool,
) -> FlowResult:
    """Coarse-to-fine walk where each level-direction runs as the fused
    Pallas pair (ops/pallas/lk_prep.py docstring has the design): per-point
    windows DMA'd from the HBM pyramid, all prep + surfaces + the iteration
    walk VMEM-resident with K on lanes. Only (K,)-sized positions/flags flow
    between levels. Parity with the XLA corr path is tolerance-locked by
    tests/test_tracking.py::test_lk_fused_matches_xla."""
    scale0 = 2.0 ** (levels - 1)
    guess = init / scale0
    ok = jnp.zeros(points.shape[0], bool)
    for lvl in range(levels - 1, -1, -1):
        win = level_window(lvl)
        if win is not None:
            sc = 2.0 ** lvl
            pts_l = points / sc
            H = prev_pad[lvl].shape[-2] - 2 * pad
            W = prev_pad[lvl].shape[-1] - 2 * pad
            tmpl = prev_pad[lvl] if prev_pad[lvl].ndim == 3 else prev_pad[lvl][None]
            srch = next_pad[lvl] if next_pad[lvl].ndim == 3 else next_pad[lvl][None]
            fn = _fused_level_fn(
                win, p.search_slack, pad, float(p.min_eig_threshold),
                p.max_iters, float(p.eps), interpret,
            )
            pos, hit, ok_g = fn(tmpl, srch, pts_l, guess, sp, sn)
            in_img = (
                (pos[:, 0] >= 0) & (pos[:, 0] <= W - 1)
                & (pos[:, 1] >= 0) & (pos[:, 1] <= H - 1)
            )
            ok_l = ok_g & in_img & jnp.all(jnp.isfinite(pos), axis=-1) & ~hit
            guess = jnp.where(ok_l[:, None], pos, guess)
            if lvl == 0:
                # OpenCV semantics: status comes from the finest level.
                ok = ok_l
        if lvl > 0:
            guess = guess * 2.0
    return FlowResult(points=guess, status=ok)


def _pyramidal_lk_batched(
    prev_pad, next_pad, points, init, sp, sn, p: LKParams, level_window,
    levels: int, pad: int,
) -> FlowResult:
    """Level-major coarse-to-fine walk with BATCHED window extraction: per
    level, all K template windows and all K slack windows come out of one-hot
    MXU contractions (ops/windows.py) instead of K vmapped dynamic_slices;
    the per-point template precompute and the matmul-resample iteration walk
    are the same functions the sliced path runs, so results are
    bit-identical (test_lk_batched_windows_bit_identical)."""
    from ..ops.windows import extract_windows

    scale0 = 2.0 ** (levels - 1)
    s = p.search_slack
    guess = init / scale0
    ok = jnp.zeros(points.shape[0], bool)
    for lvl in range(levels - 1, -1, -1):
        win = level_window(lvl)
        if win is not None:
            r = win // 2
            ws = win + 2 * (s + 1)
            sc = 2.0 ** lvl
            pts_l = points / sc
            H = prev_pad[lvl].shape[-2] - 2 * pad
            W = prev_pad[lvl].shape[-1] - 2 * pad

            t0y, t0x = jax.vmap(
                lambda pt, _w=win, _H=H, _W=W: _template_origin(pt, _w, pad, _H, _W)
            )(pts_l)
            twin = extract_windows(
                prev_pad[lvl], t0y, t0x, win + 3,
                src=sp if prev_pad[lvl].ndim == 3 else None,
            )
            tpatch, gx, gy, inv, ok_g = jax.vmap(
                lambda tw, pt, ty, tx, _w=win: _template_from_window(
                    tw, pt, ty, tx, p, _w, pad
                )
            )(twin, pts_l, t0y, t0x)

            sy0 = jnp.clip(
                jnp.floor(guess[:, 1]) + pad - r - s - 1, 0, H + 2 * pad - ws
            ).astype(jnp.int32)
            sx0 = jnp.clip(
                jnp.floor(guess[:, 0]) + pad - r - s - 1, 0, W + 2 * pad - ws
            ).astype(jnp.int32)
            swin = extract_windows(
                next_pad[lvl], sy0, sx0, ws,
                src=sn if next_pad[lvl].ndim == 3 else None,
            )

            def walk(sw, tp, gxk, gyk, invk, syk, sxk, g, _w=win, _ws=ws):
                body = _matmul_body(sw, tp, gxk, gyk, invk, syk, sxk, p, _w, _ws, pad)
                return _run_slack_walk(body, g, p)

            pos, hit = jax.vmap(walk)(swin, tpatch, gx, gy, inv, sy0, sx0, guess)
            in_img = (
                (pos[:, 0] >= 0) & (pos[:, 0] <= W - 1)
                & (pos[:, 1] >= 0) & (pos[:, 1] <= H - 1)
            )
            ok_l = ok_g & in_img & jnp.all(jnp.isfinite(pos), axis=-1) & ~hit
            guess = jnp.where(ok_l[:, None], pos, guess)
            if lvl == 0:
                # OpenCV semantics: status comes from the finest level.
                ok = ok_l
        if lvl > 0:
            guess = guess * 2.0
    return FlowResult(points=guess, status=ok)


def track_points(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    points: jnp.ndarray,
    valid: jnp.ndarray,
    p: LKParams = LKParams(),
) -> FlowResult:
    """Full tracker: pyramids + forward LK + optional backward check.

    Parity: FeatureTracker::Track (feature_tracker.cpp:49-95) — the
    bidirectional check re-tracks the result back to the previous frame and
    rejects points whose round trip misses by more than fwd_bwd_tol.
    """
    levels = p.max_level + 1
    prev_pyr = image_pyramid(prev_img, levels)
    next_pyr = image_pyramid(next_img, levels)

    initial_flow = None
    if p.coarse_init:
        scale = 2.0 ** (levels - 1)
        coarse = _coarse_block_match(
            prev_pyr[-1], next_pyr[-1], points / scale, p.coarse_search, p.coarse_patch
        )
        initial_flow = coarse * scale

    fwd = pyramidal_lk(prev_pyr, next_pyr, points, p, initial_flow=initial_flow)
    status = fwd.status & valid
    if p.bidirectional:
        nb = _bwd_level_count(p, levels)
        bwd = pyramidal_lk(
            next_pyr[:nb], prev_pyr[:nb], fwd.points, p,
            initial_flow=_bwd_init(points, p) if nb < levels else None,
        )
        dist2 = jnp.sum((bwd.points - points) ** 2, axis=-1)
        status = status & bwd.status & (dist2 <= p.fwd_bwd_tol**2)
        if nb < levels or p.zncc_gate:
            status = status & _appearance_gate(
                prev_pyr[0], next_pyr[0], points, fwd.points, p
            )
    return FlowResult(points=fwd.points, status=status)


def _bwd_level_count(p: LKParams, levels: int) -> int:
    """Pyramid depth of the backward verification pass (see LKParams
    .bwd_levels; 0 or >= the forward depth = full reference semantics)."""
    return levels if p.bwd_levels <= 0 else min(levels, p.bwd_levels)


def _appearance_gate(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pts_prev: jnp.ndarray,
    pts_next: jnp.ndarray,
    p: LKParams,
    src_prev: jnp.ndarray | None = None,
    src_next: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(K,) bool: ZNCC(template at pts_prev, patch at pts_next) >=
    bwd_zncc_min. Subpixel patches via the same window-slice + bilinear
    recentering the LK template path uses. Either image may be a ring with
    per-point source indices."""
    win = p.window
    pad = win // 2 + 2
    H, W = prev_img.shape[-2], prev_img.shape[-1]
    A = _pad_level(prev_img, pad)
    B = _pad_level(next_img, pad)
    K = pts_prev.shape[0]
    zk = jnp.zeros(K, jnp.int32)
    sa = zk if src_prev is None else jnp.asarray(src_prev, jnp.int32)
    sb = zk if src_next is None else jnp.asarray(src_next, jnp.int32)

    def patch(img, src, pt):
        t0y, t0x = _template_origin(pt, win, pad, H, W)
        w = _dslice(img, src, t0y, t0x, win + 3, win + 3)
        fy = pt[1] + pad - t0y.astype(w.dtype)
        fx = pt[0] + pad - t0x.astype(w.dtype)
        full = sample_patches_bilinear(w, fy, fx, win + 2, win + 2)
        return full[1:-1, 1:-1]

    def one(pa, pb, ia, ib):
        ta = patch(A, ia, pa)
        tb = patch(B, ib, pb)
        za = ta - jnp.mean(ta)
        zb = tb - jnp.mean(tb)
        denom = jnp.sqrt(jnp.sum(za * za) * jnp.sum(zb * zb))
        return jnp.sum(za * zb) / jnp.maximum(denom, 1e-12)

    zncc = jax.vmap(one)(pts_prev, pts_next, sa, sb)
    return zncc >= p.bwd_zncc_min


def _bwd_init(points: jnp.ndarray, p: LKParams) -> jnp.ndarray:
    """Backward-walk init for the truncated pass: the round-trip target
    OFFSET by fwd_bwd_tol per axis. Initializing exactly AT the target is
    self-fulfilling — a walk that never moves (zero gradient on a mismatched
    template, e.g. tracking into an unrelated image) would sit at distance 0
    and pass the gate. From the offset, staying put lands at tol*sqrt(2) >
    tol and FAILS, so acceptance requires the template to actively pull the
    walk back onto the target — while a true correspondence re-converges the
    ~3 px trivially (well inside the finest-level LK basin for window 21).
    Locked by the unrelated-image case of
    test_lk_bwd_levels_gating_equivalence.

    COUPLING GUARD (ADVICE r3): in slack-window mode the walk freezes at
    the +/- search_slack boundary, so the init offset must stay basin-safe:
    it is clamped to search_slack - 1 per axis. The >tol diagonal property
    (offset * sqrt(2) > tol) must survive the clamp, otherwise a frozen
    walk could land INSIDE the gate — that combination (fwd_bwd_tol >=
    (search_slack - 1) * sqrt(2)) is rejected at trace time rather than
    silently accepting garbage or rejecting every correct track."""
    off = float(p.fwd_bwd_tol)
    if p.search_slack > 0:
        off = min(off, float(p.search_slack - 1))
        if off * 1.4142 <= p.fwd_bwd_tol:
            raise ValueError(
                f"bwd_levels requires fwd_bwd_tol ({p.fwd_bwd_tol}) comfortably "
                f"inside search_slack ({p.search_slack}): the clamped init "
                f"offset {off} px no longer satisfies offset*sqrt(2) > tol, so "
                "the frozen-walk rejection property is lost. Raise search_slack "
                "or lower fwd_bwd_tol."
            )
    return points + jnp.asarray(off, points.dtype)


def track_points_ring(
    ring_pyr,                # tuple of (Rk, Hl, Wl) level arrays, slot 0 = newest past frame
    next_pyr,                # tuple of (Hl, Wl) level arrays (current frame)
    points: jnp.ndarray,     # (K, 2) last-seen pixel of each landmark
    valid: jnp.ndarray,      # (K,)
    src_idx: jnp.ndarray,    # (K,) ring slot of each landmark's last-seen frame
    p: LKParams = LKParams(),
) -> FlowResult:
    """k-ago re-tracking (reference stereo_tracker.cpp:33-88): each landmark
    is tracked from the frame it was LAST SEEN in (its true template) into
    the current frame. The bidirectional check tracks back into the same
    source frame. One LK pass total — the ring only changes which image each
    point's template window is sliced from."""
    src_idx = jnp.clip(jnp.asarray(src_idx, jnp.int32), 0, ring_pyr[0].shape[0] - 1)

    initial_flow = None
    if p.coarse_init:
        levels = len(next_pyr)
        scale = 2.0 ** (levels - 1)
        coarse = _coarse_block_match_ring(
            ring_pyr[-1], next_pyr[-1], points / scale, src_idx,
            p.coarse_search, p.coarse_patch,
        )
        initial_flow = coarse * scale

    fwd = pyramidal_lk(
        ring_pyr, next_pyr, points, p, initial_flow=initial_flow, src_prev=src_idx
    )
    status = fwd.status & valid
    if p.bidirectional:
        levels = len(next_pyr)
        nb = _bwd_level_count(p, levels)
        bwd = pyramidal_lk(
            next_pyr[:nb], ring_pyr[:nb], fwd.points, p, src_next=src_idx,
            initial_flow=_bwd_init(points, p) if nb < levels else None,
        )
        dist2 = jnp.sum((bwd.points - points) ** 2, axis=-1)
        status = status & bwd.status & (dist2 <= p.fwd_bwd_tol**2)
        if nb < levels or p.zncc_gate:
            status = status & _appearance_gate(
                ring_pyr[0], next_pyr[0], points, fwd.points, p,
                src_prev=src_idx,
            )
    return FlowResult(points=fwd.points, status=status)


def _coarse_block_match_ring(
    prev_ring: jnp.ndarray,   # (Rk, H, W) coarsest ring level
    next_img: jnp.ndarray,
    points: jnp.ndarray,
    src_idx: jnp.ndarray,
    search: int,
    patch: int,
) -> jnp.ndarray:
    """Ring variant of the coarse block-match init: the template comes from
    each point's own source frame."""
    r = patch // 2
    win = patch + 2 * search
    pad = search + r + 1
    prev_pad = jnp.pad(prev_ring, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    next_pad = jnp.pad(next_img, pad, mode="edge")

    def one(pt, src):
        x0 = jnp.round(pt[0]).astype(jnp.int32) + pad
        y0 = jnp.round(pt[1]).astype(jnp.int32) + pad
        templ = _dslice(prev_pad, src, y0 - r, x0 - r, patch, patch)
        window = jax.lax.dynamic_slice(
            next_pad, (y0 - r - search, x0 - r - search), (win, win)
        )
        costs = []
        for dy in range(2 * search + 1):
            row = []
            for dx in range(2 * search + 1):
                diff = window[dy : dy + patch, dx : dx + patch] - templ
                row.append(jnp.sum(diff * diff))
            costs.append(jnp.stack(row))
        cost = jnp.stack(costs)
        best = jnp.argmin(cost.reshape(-1))
        by = best // (2 * search + 1) - search
        bx = best % (2 * search + 1) - search
        return pt + jnp.stack([bx, by]).astype(pt.dtype)

    return jax.vmap(one)(points, src_idx)
