"""PatchMatch stereo with faithful reference semantics, TPU-parallel.

Reference parity: patchmatch_gpu.cu (SURVEY.md §A.2) — iteration schedule
{AddForegroundNoise(32/2^iter) → PropagateRow(+1) → PropagateCol(+1) →
PropagateRow(-1) → PropagateCol(-1)} × iters, then MaskBackground
(cost(d) < 0.8·cost(0)), right disparity, MaskOcclusions (0.7/1.4 L/R ratio).

TPU-first reformulation (not a translation):
- The CUDA kernel gives each thread a row/col *chunk* (16 strips, ±5 px halo)
  and scans sequentially with per-pixel scalar bilinear costs. Here the
  matching cost lives in an integer-disparity cost volume (cost.py) computed
  with lane-parallel shifts, and each propagation pass is a `lax.scan` whose
  carry is the full (chunks, other_axis) front — i.e. ALL strips and ALL
  rows/cols advance in lockstep, one scan step per in-strip position. Cost
  lookups at per-pixel disparities are one-hot contractions over D (VPU),
  never gathers.
- Disparities are quantized to integers at cost evaluation (the reference
  evaluates float disparities with bilinear subpixel; its output precision is
  nevertheless ~integer because seeds are integer template matches). A final
  parabola subpixel refinement (cost.py) recovers sub-pixel output.

Strip semantics match the CUDA grid: chunk size = W/chunks, bounds ±halo,
scans clamped to [patch_radius, dim - patch_radius - 1].
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.image import dilate, gradient_magnitude
from .cost import cost_of_disparity, cost_volume, right_cost_volume_from_left, subpixel_refine


@struct.dataclass
class PatchMatchParams:
    max_disp: int = struct.field(pytree_node=False, default=128)
    iters: int = struct.field(pytree_node=False, default=3)
    alpha: float = struct.field(pytree_node=False, default=0.9)
    improve_factor: float = struct.field(pytree_node=False, default=0.8)
    chunks: int = struct.field(pytree_node=False, default=16)
    halo: int = struct.field(pytree_node=False, default=5)
    patch_radius: int = struct.field(pytree_node=False, default=1)
    noise_seed: int = struct.field(pytree_node=False, default=123)
    noise_scale0: float = struct.field(pytree_node=False, default=32.0)
    subpixel: bool = struct.field(pytree_node=False, default=True)
    occlusion_lo: float = struct.field(pytree_node=False, default=0.7)
    occlusion_hi: float = struct.field(pytree_node=False, default=1.4)
    init_dilate_factor: int = struct.field(pytree_node=False, default=4)


def unit_noise(shape, seed: int) -> jnp.ndarray:
    """Fixed uniform [-1, 1) noise image (reference allocates one with
    cv::RNG(123) and reuses it every frame, patchmatch_gpu.cu:339-344)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def add_foreground_noise(disp: jnp.ndarray, noise: jnp.ndarray, scale) -> jnp.ndarray:
    """Perturb only nonzero (foreground) pixels; clamp at 0 (cu:298-304)."""
    mask = (disp > 0).astype(disp.dtype)
    return jnp.maximum((disp + noise * scale) * mask, 0.0)


def _lookup_cost(C_cols: jnp.ndarray, disp: jnp.ndarray, coord, patch_radius: int) -> jnp.ndarray:
    """Cost at clamped disparity d_eff = min(d, coord - patch_radius).

    C_cols: (..., D) cost rows for the current scan position;
    disp: (...) float disparities; coord: scalar or (...) position along the
    epipolar axis. One-hot contraction over D.
    """
    D = C_cols.shape[-1]
    d_eff = jnp.minimum(disp, coord - patch_radius)
    idx = jnp.clip(jnp.round(d_eff), 0, D - 1).astype(jnp.int32)
    ids = jnp.arange(D, dtype=jnp.int32)
    onehot = (idx[..., None] == ids).astype(C_cols.dtype)
    return jnp.sum(C_cols * onehot, axis=-1)


def _effective_chunks(n: int, chunks: int) -> int:
    """Largest divisor of n that is <= chunks (strips must tile the axis)."""
    c = min(chunks, n)
    while n % c != 0:
        c -= 1
    return c


def _chunk_columns(W: int, chunks: int, halo: int, pr: int):
    """Strip layout along one axis: clipped absolute positions per
    (chunk, in-chunk index), per-position validity (CUDA loop bounds
    [max(lo, pr), min(hi, W-pr-1)) ), chunk size, and scan length."""
    chunks = _effective_chunks(W, chunks)
    chunk = W // chunks
    w = chunk + 2 * halo
    c = jnp.arange(chunks)[:, None]
    j = jnp.arange(w)[None, :]
    cols = c * chunk - halo + j
    lo = jnp.maximum(c * chunk - halo, pr)
    hi = jnp.minimum((c + 1) * chunk + halo, W - pr - 1)
    valid = (cols >= lo) & (cols < hi)
    return jnp.clip(cols, 0, W - 1), valid, chunk, w


def _propagate_x(C: jnp.ndarray, disp: jnp.ndarray, direction: int, p: PatchMatchParams) -> jnp.ndarray:
    """One PropagateRow pass (scan along x), all strips and rows in lockstep.

    C: (D, H, W) volume; disp: (H, W) float. Returns updated disp.
    """
    D, H, W = C.shape
    pr = p.patch_radius
    cols_clipped, valid_pos, chunk, w = _chunk_columns(W, p.chunks, p.halo, pr)

    # Scan xs with LEADING scan axis (lax.scan slices axis 0 per step — the
    # layout the TPU DMA wants): (w, chunks, H, D) volume, (w, chunks, H) disp.
    C_hw_d = jnp.transpose(C, (2, 1, 0))           # (W, H, D)
    Cc = jnp.transpose(C_hw_d[cols_clipped], (1, 0, 2, 3))       # (w, chunks, H, D)
    dispc = jnp.transpose(jnp.transpose(disp, (1, 0))[cols_clipped], (1, 0, 2))  # (w, chunks, H)

    # Row validity (skip rows without stencil padding).
    row_ok = (jnp.arange(H) >= pr) & (jnp.arange(H) <= H - pr - 1)

    x_of_step = jnp.transpose(cols_clipped, (1, 0)).astype(disp.dtype)  # (w, chunks)
    valid_t = jnp.transpose(valid_pos, (1, 0))                           # (w, chunks)

    if direction < 0:
        Cc, dispc = Cc[::-1], dispc[::-1]
        x_of_step, valid_t = x_of_step[::-1], valid_t[::-1]

    # Initial carry: disp at the predecessor of the first scan position.
    first_col = cols_clipped[:, 0 if direction > 0 else -1]
    pred_col = jnp.clip(first_col - direction, 0, W - 1)
    carry0 = jnp.transpose(disp, (1, 0))[pred_col]  # (chunks, H)

    def step(carry, xs):
        Cj, cur, x_row, ok_row = xs
        x = x_row[:, None]
        cost_cur = _lookup_cost(Cj, cur, x, pr)
        cost_cand = _lookup_cost(Cj, carry, x, pr)
        better = (cost_cand < cost_cur) & ok_row[:, None] & row_ok[None, :]
        new = jnp.where(better, jnp.minimum(carry, x - pr), cur)
        return new, new

    _, outs = jax.lax.scan(step, carry0, (Cc, dispc, x_of_step, valid_t))  # (w, chunks, H)
    # Undo scan order.
    outs = outs if direction > 0 else outs[::-1]
    # Keep each strip's interior (the owning chunk wins overlapped columns).
    interior = jnp.transpose(outs, (1, 0, 2))[:, p.halo : p.halo + chunk]  # (chunks, chunk, H)
    return jnp.transpose(interior.reshape(W, H), (1, 0))


def _propagate_y(C: jnp.ndarray, disp: jnp.ndarray, direction: int, p: PatchMatchParams) -> jnp.ndarray:
    """One PropagateCol pass: scan along y by transposing the spatial axes.

    The disparity axis stays the x-shift axis; only the scan runs over rows.
    The x - patch_radius clamp applies to the *column* coordinate, so the
    lookup uses each pixel's own x, not the scan coordinate.
    """
    D, H, W = C.shape
    pr = p.patch_radius
    rows_clipped, valid_pos, chunk, w = _chunk_columns(H, p.chunks, p.halo, pr)

    C_h_wd = jnp.transpose(C, (1, 2, 0))            # (H, W, D)
    Cc = jnp.transpose(C_h_wd[rows_clipped], (1, 0, 2, 3))  # (w, chunks, W, D)
    dispc = jnp.transpose(disp[rows_clipped], (1, 0, 2))     # (w, chunks, W)

    col_ok = (jnp.arange(W) >= pr) & (jnp.arange(W) <= W - pr - 1)
    x_coord = jnp.arange(W, dtype=disp.dtype)[None, :]  # (1, W)
    valid_t = jnp.transpose(valid_pos, (1, 0))           # (w, chunks)

    if direction < 0:
        Cc, dispc, valid_t = Cc[::-1], dispc[::-1], valid_t[::-1]

    first_row = rows_clipped[:, 0 if direction > 0 else -1]
    pred_row = jnp.clip(first_row - direction, 0, H - 1)
    carry0 = disp[pred_row]                          # (chunks, W)

    def step(carry, xs):
        Cj, cur, ok_row = xs
        cost_cur = _lookup_cost(Cj, cur, x_coord, pr)
        cost_cand = _lookup_cost(Cj, carry, x_coord, pr)
        better = (cost_cand < cost_cur) & ok_row[:, None] & col_ok[None, :]
        new = jnp.where(better, jnp.minimum(carry, x_coord - pr), cur)
        return new, new

    _, outs = jax.lax.scan(step, carry0, (Cc, dispc, valid_t))  # (w, chunks, W)
    outs = outs if direction > 0 else outs[::-1]
    interior = jnp.transpose(outs, (1, 0, 2))[:, p.halo : p.halo + chunk]  # (chunks, chunk, W)
    return interior.reshape(H, W)


def mask_background(C: jnp.ndarray, disp: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """Zero disparity unless it improves cost by improve_factor vs d=0
    (patchmatch_gpu.cu MaskBackground)."""
    H, W = disp.shape
    pr = p.patch_radius
    x = jnp.arange(W, dtype=disp.dtype)[None, :]
    cost0 = C[0]
    cost_d = _lookup_cost(jnp.transpose(C, (1, 2, 0)), disp, x, pr)
    keep = cost_d < p.improve_factor * cost0
    yy = jnp.arange(H)[:, None]
    interior = (yy >= pr) & (yy <= H - pr - 1) & (x >= pr) & (x <= W - pr - 1)
    return jnp.where(keep & interior, disp, 0.0)


def mask_occlusions(displ: jnp.ndarray, dispr: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """L/R consistency: zero where dr(x-dl) outside [0.7, 1.4]·dl (cu:273-295)."""
    H, W = displ.shape
    x = jnp.arange(W, dtype=displ.dtype)[None, :]
    xr = jnp.clip(jnp.round(jnp.maximum(x - displ, 0.0)), 0, W - 1).astype(jnp.int32)
    dr = jnp.take_along_axis(dispr, xr, axis=1)
    bad = (dr > p.occlusion_hi * displ) | (dr < p.occlusion_lo * displ)
    return jnp.where(bad, 0.0, displ)


def sparse_wta_seed(C: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """Built-in seeder: confident WTA pixels splatted and max-dilated.

    Replaces the reference's GFTT + stripe-template-match sparse init
    (patchmatch_gpu.cu SparseInit, cu:414-442): keep the WTA disparity only
    where it beats cost(0) decisively, then square max-dilate with the same
    element size (2·(2^dilate_factor + 1) + 1).
    """
    D = C.shape[0]
    wta = jnp.argmin(C, axis=0).astype(jnp.float32)
    best = jnp.min(C, axis=0)
    confident = best < p.improve_factor * C[0]
    seeds = jnp.where(confident, wta, 0.0)
    dilate_size = 2 ** p.init_dilate_factor + 1
    return dilate(seeds, 2 * dilate_size + 1)


class PatchMatchResult(NamedTuple):
    left: jnp.ndarray
    right: jnp.ndarray
    left_raw: jnp.ndarray   # before occlusion masking


def _match_one_side(C: jnp.ndarray, seed: jnp.ndarray, noise: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    disp = seed
    for it in range(p.iters):
        disp = add_foreground_noise(disp, noise, p.noise_scale0 / 2.0**it)
        disp = _propagate_x(C, disp, +1, p)
        disp = _propagate_y(C, disp, +1, p)
        disp = _propagate_x(C, disp, -1, p)
        disp = _propagate_y(C, disp, -1, p)
    return mask_background(C, disp, p)


def patchmatch_disparity(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    params: PatchMatchParams = PatchMatchParams(),
    seed_left: Optional[jnp.ndarray] = None,
    seed_right: Optional[jnp.ndarray] = None,
) -> PatchMatchResult:
    """Full PatchMatch pipeline: L and R disparities + masks. Jit-safe."""
    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    gl = gradient_magnitude(iml)
    gr = gradient_magnitude(imr)

    C_l = cost_volume(iml, imr, params.max_disp, params.alpha, gl, gr)
    C_r = right_cost_volume_from_left(C_l)

    noise = unit_noise(iml.shape, params.noise_seed)
    if seed_left is None:
        seed_left = sparse_wta_seed(C_l, params)
    if seed_right is None:
        seed_right = sparse_wta_seed(C_r, params)

    disp_l = _match_one_side(C_l, seed_left, noise, params)
    disp_r = _match_one_side(C_r, seed_right, noise, params)

    if params.subpixel:
        int_l = jnp.clip(jnp.round(disp_l), 0, params.max_disp - 1).astype(jnp.int32)
        disp_l = jnp.where(disp_l > 0, subpixel_refine(C_l, int_l), 0.0)
        int_r = jnp.clip(jnp.round(disp_r), 0, params.max_disp - 1).astype(jnp.int32)
        disp_r = jnp.where(disp_r > 0, subpixel_refine(C_r, int_r), 0.0)

    left_masked = mask_occlusions(disp_l, disp_r, params)
    return PatchMatchResult(left=left_masked, right=disp_r, left_raw=disp_l)
