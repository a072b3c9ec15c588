"""Fused per-level LK prep as one Pallas TPU kernel: the spill-free tracker.

Round-4 verdict: the full-quality B=4 fleet step is tracking-bound, and
three composed A/Bs (lk-mode ablation, batched-windows, bwd_levels —
docs/PERFORMANCE.md) agree the blocker is per-point window/surface
intermediates spilling to HBM inside the big graph. This kernel makes the
spill impossible by construction — the same move that made fused PatchMatch
win in round 3 (ops/pallas/fused_patchmatch.py):

  per pyramid level and direction, ONE launch
    - DMAs each point's template (24x24) and slack (32x32) windows straight
      out of the HBM-resident (ring) pyramid level into VMEM scratch
      (pipelined, n_sem copies in flight; no XLA gathers, no one-hot
      operands, no HBM intermediates),
    - recenters the template on its subpixel origin with separable tent
      weights (exactly `ops.interp.sample_patches_bilinear`'s two-tap
      bilinear weights, see the equivalence note in `_tents`),
    - central-difference gradients + the inverted 2x2 normal matrix + the
      min-eig gate,
    - builds the correlation surfaces S_g(a,b) = <swin[a:a+w, b:b+w], g>
      whose bilinear lookups ARE the LK iteration scalars
      (tracking/lk.py LKParams.corr_iters derivation),
  with every per-point intermediate living in VMEM, K on the lane axis.

Output layout matches ops/pallas/lk_iterate.py's kernel inputs verbatim
(corr (2, A, A, Kp), scal (8, Kp), pos (2, Kp)), so the iteration-walk
kernel consumes it with ZERO XLA relayouts between the two launches; only
(K,)-sized positions/flags flow through HBM per level.

Reference parity: ft/FeatureTracker semantics (feature_tracker.cpp:19-95,
cv::calcOpticalFlowPyrLK window/levels/iters/eps) — the math is the
documented corr-surface equivalent of the production matmul-resample walk.

Mosaic notes:
- Window scratch is point-major (Kp, S, S) (the only layout a single
  rectangular DMA per window can write); the lane-major flip runs as S
  small 2-D transposes (a (Kp, S) -> (S, Kp) swap per window row).
- Booleans stay f32 0/1 (replicated-i1 trap); scalar per-point indices
  ride SMEM; fractional offsets ride (1, Kp) VMEM rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tents(pos, size):
    """(rows, size, Kp) two-tap bilinear weights for clipped positions.

    For pos already clipped to [0, size-1], the tent max(0, 1-|pos-a|) over
    integer a equals ops.interp._axis_weights' floor/tap construction
    bit-for-bit: pos-floor(pos) is exact (Sterbenz), both are multiples of
    one ulp of pos, and the boundary/both-taps-coincide cases collapse to a
    single weight-1 tap either way.
    """
    a = jax.lax.broadcasted_iota(jnp.float32, pos.shape[:1] + (size,) + pos.shape[2:], 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - a))


def _lk_prep_kernel(
    # SMEM scalar tables
    t0_ref,     # (2, K) i32: t0y, t0x template-window origins (pre-clipped)
    s0_ref,     # (2, K) i32: sy0, sx0 slack-window origins (pre-clipped)
    src_ref,    # (2, K) i32: template ring slot, search ring slot
    # ANY (HBM-resident) images
    tmpl_ref,   # (Rt, Hp, Wp) padded template-side pyramid level (ring)
    srch_ref,   # (Rs, Hp, Wp) padded search-side pyramid level (ring)
    # VMEM f32 rows
    frac_ref,   # (4, Kp): fy, fx (template subpixel), sy0f, sx0f
    # outputs (VMEM)
    corr_ref,   # (2, A, A, Kp)
    scal_ref,   # (8, Kp): tgx tgy inv00 inv01 inv10 inv11 sy0f sx0f
    okg_ref,    # (1, Kp) f32 0/1 template-quality gate
    # scratch
    tmpl3,      # (Kp, ST, ST) point-major template windows
    srch3,      # (Kp, SW, SW) point-major slack windows
    swin_sc,    # (SW, SW, Kp) lane-major slack windows (ref: the surface
                # build reads dynamic row blocks — Mosaic supports dynamic
                # slices on REFS, not on values)
    gx_sc,      # (win, win, Kp)
    gy_sc,      # (win, win, Kp)
    sem,        # DMA semaphores (2, n_sem)
    *,
    K: int,
    Kp: int,
    win: int,
    A: int,
    ST: int,
    SW: int,
    min_eig_threshold: float,
    n_sem: int,
):
    # ---- 1. pipelined per-point window DMAs (template + slack) -------------
    def t_copy(k, slot):
        return pltpu.make_async_copy(
            tmpl_ref.at[src_ref[0, k], pl.ds(t0_ref[0, k], ST), pl.ds(t0_ref[1, k], ST)],
            tmpl3.at[k],
            sem.at[0, slot],
        )

    def s_copy(k, slot):
        return pltpu.make_async_copy(
            srch_ref.at[src_ref[1, k], pl.ds(s0_ref[0, k], SW), pl.ds(s0_ref[1, k], SW)],
            srch3.at[k],
            sem.at[1, slot],
        )

    def dma_body(k, _):
        @pl.when(k < K)
        def _():
            t_copy(k, k % n_sem).start()
            s_copy(k, k % n_sem).start()

        @pl.when(k >= n_sem)
        def _():
            t_copy(k - n_sem, (k - n_sem) % n_sem).wait()
            s_copy(k - n_sem, (k - n_sem) % n_sem).wait()

        return 0

    jax.lax.fori_loop(0, K + n_sem, dma_body, 0)

    # ---- 2. lane-major flip: (Kp, S, S) -> (S, S, Kp) ----------------------
    def flip(pm3, S):
        rows = [jnp.swapaxes(pm3[:, a, :], 0, 1) for a in range(S)]  # (S, Kp) each
        return jnp.stack(rows, axis=0)  # (S, S, Kp)

    twin = flip(tmpl3, ST)   # (ST, ST, Kp)
    swin = flip(srch3, SW)   # (SW, SW, Kp)

    fy = frac_ref[0:1, :]    # (1, Kp)
    fx = frac_ref[1:2, :]

    # ---- 3. subpixel template recentering (win+2 square) -------------------
    P = win + 2
    # posY[i, k] = clip(fy + i - P//2, 0, ST-1); same construction as
    # ops.interp._axis_weights (P//2 == r+1).
    ii = jax.lax.broadcasted_iota(jnp.float32, (P, 1, Kp), 0)
    posy = jnp.clip(fy[None] + ii - (P // 2), 0.0, ST - 1.0)   # (P, 1, Kp)
    posx = jnp.clip(fx[None] + ii - (P // 2), 0.0, ST - 1.0)
    wy = _tents(posy, ST)    # (P, ST, Kp)
    wx = _tents(posx, ST)

    # y-contraction then x (matches sample_patches_bilinear's association:
    # (W_y @ window) @ W_x^T).
    t1 = jnp.zeros((P, ST, Kp), jnp.float32)
    for a2 in range(ST):
        t1 = t1 + wy[:, a2:a2 + 1, :] * twin[a2][None, :, :]
    t2 = jnp.zeros((P, P, Kp), jnp.float32)
    for b2 in range(ST):
        t2 = t2 + t1[:, b2:b2 + 1, :] * jnp.swapaxes(wx[:, b2:b2 + 1, :], 0, 1)

    tpatch = t2[1:P - 1, 1:P - 1, :]                     # (win, win, Kp)
    gx = 0.5 * (t2[1:P - 1, 2:, :] - t2[1:P - 1, :P - 2, :])
    gy = 0.5 * (t2[2:, 1:P - 1, :] - t2[:P - 2, 1:P - 1, :])

    # ---- 4. normal matrix, inverse, min-eig gate ---------------------------
    def rsum(v):  # (win, win, Kp) -> (1, Kp)
        return jnp.sum(v, axis=(0, 1))[None, :]

    gxx = rsum(gx * gx)
    gxy = rsum(gx * gy)
    gyy = rsum(gy * gy)
    det = gxx * gyy - gxy * gxy
    min_eig = 0.5 * ((gxx + gyy) - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)) / (win * win)
    okf = ((det > 1e-12) & (min_eig > min_eig_threshold)).astype(jnp.float32)
    dsafe = jnp.where(det > 1e-12, det, 1.0)
    inv00 = gyy / dsafe
    inv01 = -gxy / dsafe
    inv10 = inv01
    inv11 = gxx / dsafe

    # ---- 5. correlation surfaces + template dot products -------------------
    swin_sc[...] = swin
    gx_sc[...] = gx
    gy_sc[...] = gy

    def surf(g_ref):
        def row(y, acc):
            # acc[a, b, :] += sum_x g[y, x, :] * swin[y+a, x+b, :]
            blk = swin_sc[pl.ds(y, A)]            # (A, SW, Kp)
            grow = g_ref[pl.ds(y, 1)][0]          # (win, Kp)
            for x in range(win):
                acc = acc + grow[x][None, None, :] * blk[:, x:x + A, :]
            return acc

        return jax.lax.fori_loop(0, win, row, jnp.zeros((A, A, Kp), jnp.float32))

    corr_ref[0] = surf(gx_sc)
    corr_ref[1] = surf(gy_sc)

    scal_ref[0:1, :] = rsum(tpatch * gx)
    scal_ref[1:2, :] = rsum(tpatch * gy)
    scal_ref[2:3, :] = inv00
    scal_ref[3:4, :] = inv01
    scal_ref[4:5, :] = inv10
    scal_ref[5:6, :] = inv11
    scal_ref[6:7, :] = frac_ref[2:3, :]
    scal_ref[7:8, :] = frac_ref[3:4, :]
    okg_ref[0:1, :] = okf


@functools.partial(
    jax.jit,
    static_argnames=("win", "slack", "pad", "min_eig_threshold", "interpret"),
)
def lk_prep_pallas(
    tmpl: jnp.ndarray,    # (Rt, Hp, Wp) padded template-side level (ring ok)
    srch: jnp.ndarray,    # (Rs, Hp, Wp) padded search-side level (ring ok)
    pts: jnp.ndarray,     # (K, 2) level-scale [x, y] template anchors
    guess: jnp.ndarray,   # (K, 2) current search guesses
    src_t: jnp.ndarray,   # (K,) i32 template ring slot
    src_s: jnp.ndarray,   # (K,) i32 search ring slot
    *,
    win: int,
    slack: int,
    pad: int,
    min_eig_threshold: float,
    interpret: bool = False,
):
    """One level-direction's LK prep for all K points in one kernel launch.

    Returns (corr (2, A, A, Kp), scal (8, Kp), okg (K,) bool, sy0 (K,) i32,
    sx0 (K,) i32) ready for ops.pallas.lk_iterate's lane-major entry.
    Origins replicate tracking/lk.py `_template_origin` / the slack-window
    clip exactly (non-finite points sanitized to origin 0; their gate comes
    back False via the caller's finite check).
    """
    K = pts.shape[0]
    Kp = _round_up(max(K, 128), 128)
    r = win // 2
    ST = win + 3                         # 24 for win=21
    ws = win + 2 * (slack + 1)           # slack window (31)
    SW = ws
    A = ws - win + 1                     # 11
    Hp, Wp = tmpl.shape[-2], tmpl.shape[-1]

    f32 = jnp.float32
    ptx = jnp.nan_to_num(pts[:, 0].astype(f32), nan=0.0, posinf=0.0, neginf=0.0)
    pty = jnp.nan_to_num(pts[:, 1].astype(f32), nan=0.0, posinf=0.0, neginf=0.0)
    gxx_ = jnp.nan_to_num(guess[:, 0].astype(f32), nan=0.0, posinf=0.0, neginf=0.0)
    gyy_ = jnp.nan_to_num(guess[:, 1].astype(f32), nan=0.0, posinf=0.0, neginf=0.0)

    # Exactly tracking/lk.py `_template_origin` / the slack-window clip —
    # identical origins keep the walk's tent lookups bit-aligned with the
    # XLA corr path.
    t0y = jnp.clip(jnp.floor(pty) + pad - r - 1, 0, Hp - ST).astype(jnp.int32)
    t0x = jnp.clip(jnp.floor(ptx) + pad - r - 1, 0, Wp - ST).astype(jnp.int32)
    fy = pty + pad - t0y.astype(f32)
    fx = ptx + pad - t0x.astype(f32)

    sy0 = jnp.clip(jnp.floor(gyy_) + pad - r - slack - 1, 0, Hp - SW).astype(jnp.int32)
    sx0 = jnp.clip(jnp.floor(gxx_) + pad - r - slack - 1, 0, Wp - SW).astype(jnp.int32)

    def pad_k(x, fill=0):
        return jnp.pad(x, (0, Kp - K), constant_values=fill)

    t0 = jnp.stack([pad_k(t0y), pad_k(t0x)])          # (2, Kp) i32 (SMEM)
    s0 = jnp.stack([pad_k(sy0), pad_k(sx0)])
    src = jnp.stack(
        [
            pad_k(jnp.clip(jnp.asarray(src_t, jnp.int32), 0, tmpl.shape[0] - 1)),
            pad_k(jnp.clip(jnp.asarray(src_s, jnp.int32), 0, srch.shape[0] - 1)),
        ]
    )
    frac = jnp.stack(
        [pad_k(fy), pad_k(fx), pad_k(sy0.astype(f32)), pad_k(sx0.astype(f32))]
    )  # (4, Kp)

    n_sem = 8
    kernel = functools.partial(
        _lk_prep_kernel,
        K=K, Kp=Kp, win=win, A=A, ST=ST, SW=SW,
        min_eig_threshold=float(min_eig_threshold), n_sem=n_sem,
    )
    corr, scal, okg = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, A, Kp), f32),
            jax.ShapeDtypeStruct((8, Kp), f32),
            jax.ShapeDtypeStruct((1, Kp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Kp, ST, ST), f32),
            pltpu.VMEM((Kp, SW, SW), f32),
            pltpu.VMEM((SW, SW, Kp), f32),
            pltpu.VMEM((win, win, Kp), f32),
            pltpu.VMEM((win, win, Kp), f32),
            pltpu.SemaphoreType.DMA((2, n_sem)),
        ],
        interpret=interpret,
    )(t0, s0, src, tmpl, srch, frac)
    return corr, scal, okg[0, :K] > 0.5, sy0, sx0
