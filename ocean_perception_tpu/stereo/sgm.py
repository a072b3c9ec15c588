"""Semi-global matching aggregation over the shared cost volume.

Reference parity: src/vehicle/stereo_matching/stereo_matching.cpp wraps
cv::StereoSGBM; this is the TPU-native equivalent, operating on the same
X-stencil cost as PatchMatch so all engines are directly comparable.

The SGM recurrence along a path direction r:
    L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                               L_r(p-r, d±1) + P1,
                               min_d' L_r(p-r, d') + P2 ) - min_d' L_r(p-r, d')

TPU mapping: each directional pass is a `lax.scan` over rows (or columns)
whose carry is the previous full (W, D) slab — every pixel on the scan front
and every disparity advance in lockstep; the d±1 terms are static rolls along
D. This is exactly the structure the MXU/VPU wants: no gathers, no
data-dependent shapes. 4 directions (down/up/left/right) are aggregated; the
horizontal passes run on the transposed volume so both scan row-major.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .cost import cost_volume, right_cost_volume_from_left, subpixel_refine


@struct.dataclass
class SgmParams:
    max_disp: int = struct.field(pytree_node=False, default=128)
    alpha: float = struct.field(pytree_node=False, default=0.9)
    p1: float = struct.field(pytree_node=False, default=0.06)
    p2: float = struct.field(pytree_node=False, default=0.5)
    subpixel: bool = struct.field(pytree_node=False, default=True)
    uniqueness: float = struct.field(pytree_node=False, default=0.95)
    lr_threshold: float = struct.field(pytree_node=False, default=1.5)
    # Strip-parallel scans: split each directional pass into `chunks` strips
    # with `halo` warm-up rows (same decomposition as the PatchMatch CUDA
    # grid). Paths are truncated at strip borders minus the halo — the
    # standard tiled-SGM approximation; 1 = exact full-image paths.
    chunks: int = struct.field(pytree_node=False, default=8)
    halo: int = struct.field(pytree_node=False, default=8)
    # Zero out pixels whose aggregated d=0 cost is nearly as good as the best
    # (the PatchMatch MaskBackground analog); None disables.
    background_improve: float | None = struct.field(pytree_node=False, default=None)
    # lax.scan unroll for the directional passes (0 = full unroll). Same
    # rationale as PatchMatchParams.scan_unroll: per-step while-loop overhead
    # dominates short strip scans; semantics are unchanged.
    scan_unroll: int = struct.field(pytree_node=False, default=1)


def _sgm_step(prev, c_row, p1, p2, big):
    """One SGM recurrence step: prev (..., M, D) -> out (..., M, D)."""
    prev_min = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([jnp.full_like(prev[..., :1], big), prev[..., :-1]], axis=-1)
    down = jnp.concatenate([prev[..., 1:], jnp.full_like(prev[..., :1], big)], axis=-1)
    best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, down) + p1), prev_min + p2)
    return c_row + best - prev_min


def _directional_pass(C_sweep: jnp.ndarray, p1: float, p2: float,
                      chunks: int = 1, halo: int = 0,
                      scan_unroll: int = 1) -> jnp.ndarray:
    """Aggregate along axis 0 of (N, M, D), forward direction.

    chunks > 1: the N axis splits into strips processed in lockstep (scan
    length N/chunks + halo instead of N); each strip warms up over `halo`
    predecessor rows so truncation effects stay near strip seams.
    """
    N, M, D = C_sweep.shape
    big = jnp.asarray(1e9, C_sweep.dtype)
    unroll = True if scan_unroll <= 0 else scan_unroll

    # Largest divisor of N that is <= chunks.
    c = min(chunks, N)
    while N % c != 0:
        c -= 1
    if c <= 1:
        def step(prev, c_row):
            out = _sgm_step(prev, c_row, p1, p2, big)
            return out, out

        init = C_sweep[0]
        _, rest = jax.lax.scan(step, init, C_sweep[1:], unroll=unroll)
        return jnp.concatenate([init[None], rest], axis=0)

    n = N // c
    w = n + halo
    s = jnp.arange(c)[:, None]
    j = jnp.arange(w)[None, :]
    pos = jnp.clip(s * n - halo + j, 0, N - 1)      # (c, w) absolute rows
    Cc = jnp.transpose(C_sweep[pos], (1, 0, 2, 3))   # (w, c, M, D)

    def step(prev, c_row):
        out = _sgm_step(prev, c_row, p1, p2, big)
        return out, out

    init = Cc[0]
    _, outs = jax.lax.scan(step, init, Cc[1:], unroll=unroll)  # (w-1, c, M, D)
    outs = jnp.concatenate([init[None], outs], axis=0)
    interior = jnp.transpose(outs, (1, 0, 2, 3))[:, halo:]   # (c, n, M, D)
    return interior.reshape(N, M, D)


def sgm_aggregate(C: jnp.ndarray, params: SgmParams) -> jnp.ndarray:
    """Sum of 4 directional passes. C: (H, W, D) → S: (H, W, D).

    D stays on the lane axis throughout; the only transpose swaps the two
    spatial (major) axes for the horizontal scans — no re-tiling relayouts."""
    p1, p2 = params.p1, params.p2
    ck, hl, un = params.chunks, params.halo, params.scan_unroll
    down = _directional_pass(C, p1, p2, ck, hl, un)
    up = _directional_pass(C[::-1], p1, p2, ck, hl, un)[::-1]
    Ch = jnp.transpose(C, (1, 0, 2))  # (W, H, D): horizontal scans
    right = _directional_pass(Ch, p1, p2, ck, hl, un)
    left = _directional_pass(Ch[::-1], p1, p2, ck, hl, un)[::-1]
    return down + up + jnp.transpose(right, (1, 0, 2)) + jnp.transpose(left, (1, 0, 2))


class SgmResult(NamedTuple):
    left: jnp.ndarray
    right: jnp.ndarray
    left_raw: jnp.ndarray


def _wta_with_masks(S: jnp.ndarray, params: SgmParams) -> jnp.ndarray:
    disp = jnp.argmin(S, axis=-1).astype(jnp.int32)
    if params.background_improve is not None:
        best = jnp.min(S, axis=-1)
        keep = best < params.background_improve * S[..., 0]
        disp = jnp.where(keep, disp, 0)
    return disp


def _lr_check(disp_l: jnp.ndarray, disp_r: jnp.ndarray, thresh: float, max_disp: int) -> jnp.ndarray:
    from .cost import sample_at_disparity

    d_int = jnp.clip(jnp.round(disp_l), 0, max_disp - 1).astype(jnp.int32)
    dr = sample_at_disparity(disp_r, d_int, max_disp)
    ok = jnp.abs(dr - disp_l) <= thresh
    return jnp.where(ok, disp_l, 0.0)


def sgm_disparity(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    params: SgmParams = SgmParams(),
) -> SgmResult:
    """Full SGM pipeline: cost → 4-path aggregation → WTA → subpixel → LR check.

    The right disparity comes from the derived right cost volume (cost-volume
    reuse) aggregated the same way — no flipped second pipeline.
    """
    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    C_l = cost_volume(iml, imr, params.max_disp, params.alpha)
    C_r = right_cost_volume_from_left(C_l)

    # Both sides aggregate in lockstep (wider slabs beat 2x the scan steps).
    S_lr = jax.vmap(lambda C: sgm_aggregate(C, params))(jnp.stack([C_l, C_r]))
    S_l, S_r = S_lr[0], S_lr[1]

    d_l = _wta_with_masks(S_l, params)
    d_r = _wta_with_masks(S_r, params)

    if params.subpixel:
        disp_l = subpixel_refine(S_l, d_l)
        disp_r = subpixel_refine(S_r, d_r)
    else:
        disp_l = d_l.astype(jnp.float32)
        disp_r = d_r.astype(jnp.float32)

    left = _lr_check(disp_l, disp_r, params.lr_threshold, params.max_disp)
    return SgmResult(left=left, right=disp_r, left_raw=disp_l)
