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
    # Strip count for the column (scan-along-y) passes; None = `chunks`.
    # parallel/stereo_sharded.py maps one y-strip per device, so its
    # single-device equivalent is chunks_y = mesh size.
    chunks_y: int | None = struct.field(pytree_node=False, default=None)
    halo: int = struct.field(pytree_node=False, default=5)
    patch_radius: int = struct.field(pytree_node=False, default=1)
    noise_seed: int = struct.field(pytree_node=False, default=123)
    noise_scale0: float = struct.field(pytree_node=False, default=32.0)
    subpixel: bool = struct.field(pytree_node=False, default=True)
    occlusion_lo: float = struct.field(pytree_node=False, default=0.7)
    occlusion_hi: float = struct.field(pytree_node=False, default=1.4)
    init_dilate_factor: int = struct.field(pytree_node=False, default=4)
    # Speed knob: the right map only feeds the occlusion ratio-check; WTA on
    # the derived right volume is a cheap stand-in for the reference's full
    # flipped second pipeline. False = full PatchMatch both sides (parity).
    right_wta: bool = struct.field(pytree_node=False, default=False)
    # Matching cost: "l1g" = reference X-stencil L1+gradient; "zncc" =
    # 1 - ZNCC over zncc_patch (the CPU PatchMatch's test functor).
    cost: str = struct.field(pytree_node=False, default="l1g")
    zncc_patch: int = struct.field(pytree_node=False, default=5)
    # Route the l1g cost volume through the fused Pallas kernel when it fits.
    use_pallas_cost: bool = struct.field(pytree_node=False, default=False)
    # Route the propagation passes through the fused Pallas scan kernel
    # (carry resident in VMEM scratch, volume slabs DMA-streamed; reverse
    # passes via index_map instead of materialized flips). Bit-identical to
    # the XLA scan; interpret-mode off TPU.
    use_pallas_propagate: bool = struct.field(pytree_node=False, default=False)
    # Route the ENTIRE per-side match (noise + all 12 directional passes +
    # cost-map refresh + MaskBackground) through ONE whole-frame Pallas
    # kernel: both strip-layout volume copies stay VMEM-resident, the front
    # never leaves VMEM, layout changes are exact MXU permutation matmuls
    # (ops/pallas/fused_patchmatch.py). Bit-identical to the XLA path.
    # Requires the VMEM budget check (fused_supported) and right_wta=True;
    # silently falls back to the XLA path otherwise.
    use_pallas_fused: bool = struct.field(pytree_node=False, default=False)
    # Fused-kernel interior steps as a hardware fori_loop instead of full
    # static unrolling: bit-identical, ~8x smaller Mosaic program (the ~9 min
    # whole-frame compile shrinks accordingly). See
    # ops/pallas/fused_patchmatch.py run_pass_loop.
    fused_inner_loop: bool = struct.field(pytree_node=False, default=True)
    # Build the cost volume INSIDE a Pallas kernel straight from the images
    # (ops/pallas/volume_build.py): both strip layouts come out directly,
    # C and all ~0.88 GB/frame of XLA build intermediates never touch HBM
    # (r4 roofline's named byte wall). Bit-identical for bf16 volumes.
    # Engages only alongside the fused kernel in right_wta + l1g mode;
    # None = AUTO (follow use_pallas_fused's resolution).
    use_pallas_build: bool | None = struct.field(pytree_node=False, default=None)
    # Store the volume in bfloat16 (halves its HBM traffic; ~0.4% relative
    # cost error can flip near-tie argmin picks — off for exact parity).
    volume_bf16: bool = struct.field(pytree_node=False, default=False)
    # lax.scan unroll for the propagation passes. Each scan step is tiny
    # (a (chunks, N, D) slab), so while-loop per-step overhead is the
    # latency floor. 0 = FULL unroll (straight-line fused passes; measured
    # +29% pipeline fps on TPU — partial unroll actually regresses, so use
    # 1 or 0). Never changes the sequential semantics (bit-identical).
    scan_unroll: int = struct.field(pytree_node=False, default=1)


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


class _StripLayout(NamedTuple):
    """Precomputed per-orientation strip views (built once, used by all
    passes/iterations — the gathers dominate HBM traffic otherwise)."""

    Cc: jnp.ndarray        # (w, chunks, N, D) overlapped volume slices
    pos_clipped: jnp.ndarray  # (chunks, w) absolute scan positions
    valid: jnp.ndarray     # (w, chunks) CUDA loop-bound validity
    x_of: jnp.ndarray      # (w, chunks, 1) or (1, N): epipolar x per element
    lane_ok: jnp.ndarray   # (N,) validity of the non-scan axis
    chunk: int
    w: int


def _layout_rows(C: jnp.ndarray, p: PatchMatchParams) -> _StripLayout:
    """Row-pass layout: scan along x; slab per step = (chunks, H, D).

    C is (H, W, D) — only the two spatial axes swap (D stays minor: no
    re-tiling relayout)."""
    H, W, D = C.shape
    pr = p.patch_radius
    cols_clipped, valid_pos, chunk, w = _chunk_columns(W, p.chunks, p.halo, pr)
    C_whd = jnp.transpose(C, (1, 0, 2))  # (W, H, D)
    Cc = jnp.transpose(C_whd[cols_clipped], (1, 0, 2, 3))  # (w, chunks, H, D)
    x_of = jnp.transpose(cols_clipped, (1, 0)).astype(jnp.float32)[:, :, None]  # (w, chunks, 1)
    lane_ok = (jnp.arange(H) >= pr) & (jnp.arange(H) <= H - pr - 1)
    return _StripLayout(Cc, cols_clipped, jnp.transpose(valid_pos, (1, 0)), x_of, lane_ok, chunk, w)


def _layout_cols(C: jnp.ndarray, p: PatchMatchParams) -> _StripLayout:
    """Col-pass layout: scan along y; slab per step = (chunks, W, D).

    C is already (H, W, D): direct strip slicing, zero transposes."""
    H, W, D = C.shape
    pr = p.patch_radius
    chunks_y = p.chunks if p.chunks_y is None else p.chunks_y
    rows_clipped, valid_pos, chunk, w = _chunk_columns(H, chunks_y, p.halo, pr)
    Cc = jnp.transpose(C[rows_clipped], (1, 0, 2, 3))  # (w, chunks, W, D)
    x_of = jnp.arange(W, dtype=jnp.float32)[None, :]  # broadcast (1, W)
    lane_ok = (jnp.arange(W) >= pr) & (jnp.arange(W) <= W - pr - 1)
    return _StripLayout(Cc, rows_clipped, jnp.transpose(valid_pos, (1, 0)), x_of, lane_ok, chunk, w)


def _propagate_carry0(layout: _StripLayout, disp, direction, axis, W, H):
    """(chunks, N) initial front: predecessor of each strip's first position."""
    first = layout.pos_clipped[:, 0 if direction > 0 else -1]
    pred = jnp.clip(first - direction, 0, (W if axis == 1 else H) - 1)
    if axis == 1:
        return jnp.transpose(disp, (1, 0))[pred]
    return disp[pred]


def _propagate(
    layout: _StripLayout,
    disp: jnp.ndarray,       # (H, W)
    cost_map: jnp.ndarray,   # (H, W) cost at the current disparities
    direction: int,
    axis: int,               # 1 = scan along x (rows pass), 0 = along y
    p: PatchMatchParams,
):
    """One directional pass. Carries (front disp, front cost); per step only
    the *candidate* cost needs a one-hot lookup — the current pixel's cost
    comes from the maintained cost map. Returns updated (disp, cost_map)."""
    H, W = disp.shape
    pr = p.patch_radius

    if axis == 1:  # values indexed [pos, lane] = [x, y]
        vals_d = jnp.transpose(disp, (1, 0))[layout.pos_clipped]   # (chunks, w, H)
        vals_c = jnp.transpose(cost_map, (1, 0))[layout.pos_clipped]
    else:          # [pos, lane] = [y, x]
        vals_d = disp[layout.pos_clipped]                           # (chunks, w, W)
        vals_c = cost_map[layout.pos_clipped]
    vals_d = jnp.transpose(vals_d, (1, 0, 2))  # (w, chunks, N)
    vals_c = jnp.transpose(vals_c, (1, 0, 2))

    if p.use_pallas_propagate:
        from ..ops.pallas.propagate import pallas_propagate_pass

        interpret = jax.default_backend() not in ("tpu",)
        dim = W if axis == 1 else H
        chunks_n = layout.Cc.shape[1]
        out_d, out_c = pallas_propagate_pass(
            layout.Cc, vals_d, vals_c,
            carry_d0=_propagate_carry0(layout, disp, direction, axis, W, H),
            direction=direction, axis=axis, dim=dim,
            chunk=layout.chunk, halo=p.halo, patch_radius=pr,
            interpret=interpret,
        )
        halo, chunk = p.halo, layout.chunk
        out_d = jnp.transpose(out_d, (1, 0, 2))[:, halo : halo + chunk]
        out_c = jnp.transpose(out_c, (1, 0, 2))[:, halo : halo + chunk]
        if axis == 1:
            n = out_d.shape[0] * chunk  # = W
            new_disp = jnp.transpose(out_d.reshape(n, H), (1, 0))
            new_cost = jnp.transpose(out_c.reshape(n, H), (1, 0))
        else:
            n = out_d.shape[0] * chunk  # = H
            new_disp = out_d.reshape(n, W)
            new_cost = out_c.reshape(n, W)
        return new_disp, new_cost

    Cc, valid, x_of = layout.Cc, layout.valid, layout.x_of
    if direction < 0:
        Cc, vals_d, vals_c, valid = Cc[::-1], vals_d[::-1], vals_c[::-1], valid[::-1]
        x_of = x_of[::-1] if x_of.shape[0] == layout.w else x_of

    carry_d0 = _propagate_carry0(layout, disp, direction, axis, W, H)

    lane_ok = layout.lane_ok[None, :]

    def step(carry_d, xs):
        if x_of.shape[0] == layout.w:
            Cj, cur_d, cur_c, ok_row, x = xs
        else:
            Cj, cur_d, cur_c, ok_row = xs
            x = x_of
        cost_cand = _lookup_cost(Cj, carry_d, x, pr)
        better = (cost_cand < cur_c) & ok_row[:, None] & lane_ok
        new_d = jnp.where(better, jnp.minimum(carry_d, x - pr), cur_d)
        new_c = jnp.where(better, cost_cand, cur_c)
        return new_d, (new_d, new_c)

    if x_of.shape[0] == layout.w:
        xs = (Cc, vals_d, vals_c, valid, x_of)
    else:
        xs = (Cc, vals_d, vals_c, valid)
    unroll = True if p.scan_unroll <= 0 else p.scan_unroll
    _, (out_d, out_c) = jax.lax.scan(step, carry_d0, xs, unroll=unroll)

    if direction < 0:
        out_d, out_c = out_d[::-1], out_c[::-1]
    halo, chunk = p.halo, layout.chunk
    out_d = jnp.transpose(out_d, (1, 0, 2))[:, halo : halo + chunk]
    out_c = jnp.transpose(out_c, (1, 0, 2))[:, halo : halo + chunk]
    if axis == 1:
        n = out_d.shape[0] * chunk  # = W
        new_disp = jnp.transpose(out_d.reshape(n, H), (1, 0))
        new_cost = jnp.transpose(out_c.reshape(n, H), (1, 0))
    else:
        n = out_d.shape[0] * chunk  # = H
        new_disp = out_d.reshape(n, W)
        new_cost = out_c.reshape(n, W)
    return new_disp, new_cost


def mask_background(
    C: jnp.ndarray,
    disp: jnp.ndarray,
    p: PatchMatchParams,
    row_ids: jnp.ndarray | None = None,
    n_rows: int | None = None,
) -> jnp.ndarray:
    """Zero disparity unless it improves cost by improve_factor vs d=0
    (patchmatch_gpu.cu MaskBackground).

    ``row_ids``/``n_rows`` override the row coordinates when ``disp`` is a
    strip of a taller image (parallel/stereo_sharded.py) so the interior mask
    applies at the GLOBAL border, not each strip's."""
    H, W = disp.shape
    pr = p.patch_radius
    x = jnp.arange(W, dtype=disp.dtype)[None, :]
    cost0 = C[..., 0]
    cost_d = _lookup_cost(C, disp, x, pr)
    # Threshold pinned to f32 EXPLICITLY: for bf16 volumes the product
    # 0.8*cost0 is otherwise backend-dependent (XLA keeps bf16 products in
    # excess f32 precision when allowed; Mosaic has no bf16 compare at all).
    # Pinning makes the keep decision identical across CPU/TPU/Pallas —
    # the fused kernel computes the same f32 expression.
    keep = cost_d.astype(jnp.float32) < p.improve_factor * cost0.astype(jnp.float32)
    yy = (jnp.arange(H) if row_ids is None else row_ids)[:, None]
    Hg = H if n_rows is None else n_rows
    interior = (yy >= pr) & (yy <= Hg - pr - 1) & (x >= pr) & (x <= W - pr - 1)
    return jnp.where(keep & interior, disp, 0.0)


def mask_occlusions(displ: jnp.ndarray, dispr: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """L/R consistency: zero where dr(x-dl) outside [0.7, 1.4]·dl (cu:273-295).

    The right-map lookup at x - dl uses the gather-free shift basis
    (cost.sample_at_disparity) — TPU gathers over (H, W) are slow."""
    from .cost import sample_at_disparity

    d_int = jnp.clip(jnp.round(displ), 0, p.max_disp - 1).astype(jnp.int32)
    dr = sample_at_disparity(dispr, d_int, p.max_disp)
    bad = (dr > p.occlusion_hi * displ) | (dr < p.occlusion_lo * displ)
    return jnp.where(bad, 0.0, displ)


def right_wta_from_left(C: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """WTA right disparity map straight from the LEFT volume — never
    materializes C_R.

    C_R(y, x, d) = C_L(y, x+d, d), so the right WTA is a running min over D
    shifted planes (strict `<` keeps the first minimal d, matching argmin's
    tie-breaking on the materialized volume bit-for-bit). Saves a full
    (H, W, D) write + re-read vs right_cost_volume_from_left + argmin/min."""
    H, W, D = C.shape
    col = jnp.arange(W)[None, :]
    c0 = C[..., 0]
    best = c0
    bestd = jnp.zeros((H, W), jnp.float32)
    for d in range(1, D):
        Cd = C[..., d]
        sh = jnp.roll(Cd, -d, axis=1)
        sh = jnp.where(col >= W - d, Cd[:, -1:], sh)
        better = sh < best
        best = jnp.where(better, sh, best)
        bestd = jnp.where(better, jnp.float32(d), bestd)
    return jnp.where(best < p.improve_factor * c0, bestd, 0.0)


def sparse_wta_seed(C: jnp.ndarray, p: PatchMatchParams) -> jnp.ndarray:
    """Built-in seeder: confident WTA pixels splatted and max-dilated.

    Replaces the reference's GFTT + stripe-template-match sparse init
    (patchmatch_gpu.cu SparseInit, cu:414-442): keep the WTA disparity only
    where it beats cost(0) decisively, then square max-dilate with the same
    element size (2·(2^dilate_factor + 1) + 1).
    """
    D = C.shape[-1]
    wta = jnp.argmin(C, axis=-1).astype(jnp.float32)
    best = jnp.min(C, axis=-1)
    confident = best < p.improve_factor * C[..., 0]
    seeds = jnp.where(confident, wta, 0.0)
    dilate_size = 2 ** p.init_dilate_factor + 1
    return dilate(seeds, 2 * dilate_size + 1)


class PatchMatchResult(NamedTuple):
    left: jnp.ndarray
    right: jnp.ndarray
    left_raw: jnp.ndarray   # before occlusion masking


def _full_cost_map(C: jnp.ndarray, disp: jnp.ndarray, pr: int) -> jnp.ndarray:
    """(H, W) cost of each pixel's current (clamped) disparity — one
    vectorized volume sweep, maintained incrementally by the passes."""
    H, W, D = C.shape
    x = jnp.arange(W, dtype=disp.dtype)[None, :]
    d_eff = jnp.minimum(disp, x - pr)
    idx = jnp.clip(jnp.round(d_eff), 0, D - 1).astype(jnp.int32)
    ids = jnp.arange(D, dtype=jnp.int32)
    onehot = (idx[..., None] == ids).astype(C.dtype)
    return jnp.sum(C * onehot, axis=-1)


def _build_available(iml: jnp.ndarray, p: PatchMatchParams) -> bool:
    """In-kernel volume build feasibility: same geometry/VMEM plan as the
    fused kernel it feeds (both strip layouts VMEM-resident)."""
    from ..ops.pallas.fused_patchmatch import fused_supported

    if p.iters < 1:
        return False
    H, W = iml.shape
    if H % 8 or W % 8:  # group-of-8 aligned block addressing
        return False
    return fused_supported(
        H, W, p.max_disp, p.chunks, p.chunks_y, p.halo, p.patch_radius,
        bf16=p.volume_bf16,
    )


def _fused_available(C: jnp.ndarray, p: PatchMatchParams) -> bool:
    from ..ops.pallas.fused_patchmatch import fused_supported

    if p.iters < 1:
        # The fused kernel's MaskBackground stage reads the front scratch
        # written by the iteration loop; with iters=0 that scratch would be
        # uninitialized VMEM. The XLA path masks the raw seed instead.
        return False
    H, W, D = C.shape
    return fused_supported(
        H, W, D, p.chunks, p.chunks_y, p.halo, p.patch_radius,
        bf16=(C.dtype == jnp.bfloat16),
    )


def _match_one_side(C: jnp.ndarray, seed: jnp.ndarray, noise: jnp.ndarray,
                    p: PatchMatchParams, prebuilt=None) -> jnp.ndarray:
    if p.use_pallas_fused and _fused_available(C, p):
        interpret = jax.default_backend() not in ("tpu",)
        if prebuilt is not None:
            from ..ops.pallas.fused_patchmatch import (
                pallas_patchmatch_fused_prebuilt,
            )

            H, W, D = C.shape
            return pallas_patchmatch_fused_prebuilt(
                prebuilt[0], prebuilt[1], seed, noise,
                H=H, W=W, D=D,
                chunks=p.chunks, chunks_y=p.chunks_y, halo=p.halo,
                pr=p.patch_radius, iters=p.iters,
                noise_scale0=p.noise_scale0, improve=p.improve_factor,
                interpret=interpret, inner_loop=p.fused_inner_loop,
            )
        from ..ops.pallas.fused_patchmatch import pallas_patchmatch_fused

        return pallas_patchmatch_fused(
            C, seed, noise,
            chunks=p.chunks, chunks_y=p.chunks_y, halo=p.halo,
            pr=p.patch_radius, iters=p.iters,
            noise_scale0=p.noise_scale0, improve=p.improve_factor,
            interpret=interpret, inner_loop=p.fused_inner_loop,
        )
    rows = _layout_rows(C, p)
    cols = _layout_cols(C, p)
    disp = seed
    for it in range(p.iters):
        disp = add_foreground_noise(disp, noise, p.noise_scale0 / 2.0**it)
        cost = _full_cost_map(C, disp, p.patch_radius)
        disp, cost = _propagate(rows, disp, cost, +1, 1, p)
        disp, cost = _propagate(cols, disp, cost, +1, 0, p)
        disp, cost = _propagate(rows, disp, cost, -1, 1, p)
        disp, cost = _propagate(cols, disp, cost, -1, 0, p)
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

    prebuilt = None
    if params.cost == "zncc":
        from .cost import cost_volume_zncc

        C_l = cost_volume_zncc(iml, imr, params.max_disp, params.zncc_patch)
    elif params.use_pallas_cost:
        C_l = cost_volume(iml, imr, params.max_disp, params.alpha, use_pallas=True)
    else:
        gl = gradient_magnitude(iml)
        gr = gradient_magnitude(imr)
        vdtype = jnp.bfloat16 if params.volume_bf16 else jnp.float32
        use_build = params.use_pallas_build
        if use_build is None:
            # AUTO: off until the real-TPU A/B lands (the build kernel is
            # interpret-verified bit-identical; Mosaic compile + measured
            # win pending — PERFORMANCE.md round 5). True forces it.
            use_build = False
        if use_build and params.right_wta and _build_available(iml, params):
            from ..ops.pallas.fused_patchmatch import fused_geometry
            from ..ops.pallas.volume_build import pallas_build_volumes

            interpret = jax.default_backend() not in ("tpu",)
            V_row, V_col = pallas_build_volumes(
                iml, imr, gl, gr, D=params.max_disp, alpha=params.alpha,
                chunks=params.chunks, chunks_y=params.chunks_y,
                halo=params.halo, pr=params.patch_radius,
                bf16=params.volume_bf16, interpret=interpret,
            )
            prebuilt = (V_row, V_col)
            # Canonical C for the seed/right-WTA/subpixel consumers — ONE
            # relayout replaces the whole XLA build (bit-identical for bf16
            # volumes; test_volume_build_bit_identical).
            H_, W_ = iml.shape
            C_l = jnp.transpose(V_col, (1, 0, 3, 2)).reshape(
                H_, W_, params.max_disp
            )
        else:
            C_l = cost_volume(
                iml, imr, params.max_disp, params.alpha, gl, gr, dtype=vdtype
            )

    noise = unit_noise(iml.shape, params.noise_seed)
    if seed_left is None:
        seed_left = sparse_wta_seed(C_l, params)

    if params.right_wta:
        # C_R is never materialized on this path: the WTA right map comes
        # from a running min over shifted C_L planes, and the right-side
        # subpixel refine is skipped (the map only feeds the occlusion
        # ratio check).
        disp_l = _match_one_side(C_l, seed_left, noise, params, prebuilt=prebuilt)
        disp_r = right_wta_from_left(C_l, params)
    else:
        C_r = right_cost_volume_from_left(C_l)
        if seed_right is None:
            seed_right = sparse_wta_seed(C_r, params)
        # Both sides propagate in lockstep (vmap doubles slab width per scan
        # step instead of doubling the latency-bound sequential step count).
        disp_lr = jax.vmap(lambda C, s: _match_one_side(C, s, noise, params))(
            jnp.stack([C_l, C_r]), jnp.stack([seed_left, seed_right])
        )
        disp_l, disp_r = disp_lr[0], disp_lr[1]

    if params.subpixel:
        int_l = jnp.clip(jnp.round(disp_l), 0, params.max_disp - 1).astype(jnp.int32)
        disp_l = jnp.where(disp_l > 0, subpixel_refine(C_l, int_l), 0.0)
        # In right_wta mode the right map only feeds the 0.7-1.4 occlusion
        # ratio check — integer precision suffices, and skipping the refine
        # saves three full one-hot contractions over C_r (pure HBM traffic).
        if not params.right_wta:
            int_r = jnp.clip(jnp.round(disp_r), 0, params.max_disp - 1).astype(jnp.int32)
            disp_r = jnp.where(disp_r > 0, subpixel_refine(C_r, int_r), 0.0)

    left_masked = mask_occlusions(disp_l, disp_r, params)
    return PatchMatchResult(left=left_masked, right=disp_r, left_raw=disp_l)
