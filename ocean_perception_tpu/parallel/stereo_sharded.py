"""Multi-chip PatchMatch: one frame's rows strip-sharded across a device mesh.

The reference scales by putting whole cameras on whole GPUs; this module adds
the TPU-native other axis — ONE camera's dense stereo solved cooperatively by
N chips over ICI. The decomposition reuses the strip-truncation semantics the
single-chip engine already has (stereo/patchmatch.py `_chunk_columns`, itself
the analog of the CUDA 16-chunk ±halo grid, patchmatch_gpu.cu): each device
owns H/N contiguous rows and acts as ONE y-strip.

Communication (all nearest-neighbor `ppermute`, rides ICI):
  - once per frame: image halo rows (R_img each way) so the cost volume,
    seeds, and warm-ups are computed locally;
  - before each column pass (2 per iteration): `halo+1` boundary rows of the
    (disparity, cost) maps — a few KB.
Row passes, masks, subpixel, and the WTA right map are row-local: zero
communication. Per-device compute is 1/N of the frame plus O(halo) overlap,
so scaling is near-linear until strips get thin.

Parity: output is designed to EQUAL (bitwise, in f32) the single-device
engine with ``chunks_y = N`` — locked by tests/test_parallel.py on an
8-virtual-device CPU mesh — except possibly the outermost image row at the
top/bottom global border, where the cost stencil's edge-padding is
reconstructed via a small spliced re-computation (`_edge_fix`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..stereo.cost import cost_volume, subpixel_refine
from ..stereo.patchmatch import (
    PatchMatchParams,
    PatchMatchResult,
    _full_cost_map,
    _layout_rows,
    _lookup_cost,
    _propagate,
    add_foreground_noise,
    mask_background,
    mask_occlusions,
    right_wta_from_left,
    sparse_wta_seed,
    unit_noise,
)


def _seed_reach(p: PatchMatchParams) -> int:
    """Row reach of the seed dilation (sparse_wta_seed's square element)."""
    return 2 ** p.init_dilate_factor + 1


def _exchange_rows(x: jnp.ndarray, k: int, idx, n: int, axis: str):
    """Fetch k ghost rows from each neighbor along the mesh axis.

    Returns (top, bottom): the k rows directly above/below this device's
    block. At the global border the rows replicate the edge row — exactly the
    `jnp.clip` position semantics of `_chunk_columns`.
    """
    if n == 1:
        top = jnp.broadcast_to(x[0:1], (k,) + x.shape[1:])
        bot = jnp.broadcast_to(x[-1:], (k,) + x.shape[1:])
        return top, bot
    # My bottom rows become the NEXT device's top ghost, and vice versa.
    top = jax.lax.ppermute(x[-k:], axis, [(i, i + 1) for i in range(n - 1)])
    bot = jax.lax.ppermute(x[:k], axis, [(i, i - 1) for i in range(1, n)])
    rep_top = jnp.broadcast_to(x[0:1], top.shape)
    rep_bot = jnp.broadcast_to(x[-1:], bot.shape)
    top = jnp.where(idx == 0, rep_top, top)
    bot = jnp.where(idx == n - 1, rep_bot, bot)
    return top, bot


def _reflect_ghosts(x: jnp.ndarray, k: int, idx, n: int, axis: str):
    """Ghost IMAGE rows with reflect-101 semantics at the global border.

    Interior devices receive true neighbor rows. Border devices mirror their
    own rows (row -j := row j), which reproduces the global reflect-101
    padding of the Sobel gradients; |gradient| is reflect-even, so every
    derived cost row except the outermost one matches the global computation
    exactly (see `_edge_fix` for that one).
    """
    top, bot = _exchange_rows(x, k, idx, n, axis)
    mir_top = x[1 : k + 1][::-1]
    mir_bot = x[-k - 1 : -1][::-1]
    top = jnp.where(idx == 0, mir_top, top)
    bot = jnp.where(idx == n - 1, mir_bot, bot)
    return top, bot


def _edge_fix(C_ext, gl_ext, gr_ext, global_rows, H, R_img, p, vdtype):
    """Splice exact global-border cost rows into the extended volume.

    The stencil in `cost_volume` edge-pads at the global top/bottom, while
    the reflect ghosts above reproduce reflect-101 — these differ only at the
    outermost image row. Recompute a 4-row volume whose block border IS the
    global border (so its own padding is globally correct) and splice row 0
    (resp. H-1) in. All devices run this uniformly; the splice mask is empty
    except on the border devices.
    """
    K = 4
    C_top = cost_volume(
        gl_ext[R_img : R_img + K], gr_ext[R_img : R_img + K], p.max_disp, p.alpha, dtype=vdtype
    )
    C_bot = cost_volume(
        gl_ext[-R_img - K : -R_img], gr_ext[-R_img - K : -R_img], p.max_disp, p.alpha, dtype=vdtype
    )
    is_first = (global_rows == 0)[:, None, None]
    is_last = (global_rows == H - 1)[:, None, None]
    C_ext = jnp.where(is_first, C_top[0][None], C_ext)
    C_ext = jnp.where(is_last, C_bot[-1][None], C_ext)
    return C_ext


def _col_pass(C_scan, d_scan, c_scan, valid, lane_ok, carry0, p: PatchMatchParams):
    """One column-direction pass over this device's strip (scan-ordered
    inputs). Mirrors `_propagate`'s step exactly, with the device as the one
    strip. Returns (disp, cost) at the scan positions."""
    W = d_scan.shape[-1]
    x = jnp.arange(W, dtype=d_scan.dtype)
    pr = p.patch_radius
    unroll = True if p.scan_unroll <= 0 else p.scan_unroll

    def step(carry_d, xs):
        Cj, cur_d, cur_c, ok = xs
        cost_cand = _lookup_cost(Cj, carry_d, x, pr)
        better = (cost_cand < cur_c) & ok & lane_ok
        new_d = jnp.where(better, jnp.minimum(carry_d, x - pr), cur_d)
        new_c = jnp.where(better, cost_cand, cur_c)
        return new_d, (new_d, new_c)

    _, (out_d, out_c) = jax.lax.scan(
        step, carry0, (C_scan, d_scan, c_scan, valid), unroll=unroll
    )
    return out_d, out_c


def _local_patchmatch(
    gl_blk: jnp.ndarray,   # (chunk, W) this device's gray rows
    gr_blk: jnp.ndarray,
    p: PatchMatchParams,
    n: int,
    H: int,
    axis: str,
) -> PatchMatchResult:
    chunk, W = gl_blk.shape
    pr = p.patch_radius
    idx = jax.lax.axis_index(axis)
    row0 = idx * chunk                      # first global row of this block
    vdtype = jnp.bfloat16 if p.volume_bf16 else jnp.float32

    R_C = max(p.halo, _seed_reach(p))       # cost rows needed beyond the strip
    R_img = R_C + 2                          # + gradient (1) + stencil (1) reach
    # _reflect_ghosts mirrors rows x[1:k+1] — a border strip therefore needs
    # R_img + 1 rows, not R_img (off by one would raise a cryptic broadcast
    # error from jnp.where instead of this message).
    if chunk < max(R_img + 1, p.halo + 1):
        raise ValueError(
            f"strip of {chunk} rows too thin for halo exchange "
            f"(needs >= {max(R_img + 1, p.halo + 1)}); use fewer devices or taller images"
        )

    # --- one-time image halo exchange + local cost volumes -----------------
    topi, boti = _reflect_ghosts(gl_blk, R_img, idx, n, axis)
    topr, botr = _reflect_ghosts(gr_blk, R_img, idx, n, axis)
    gl_ext = jnp.concatenate([topi, gl_blk, boti])
    gr_ext = jnp.concatenate([topr, gr_blk, botr])
    # Rows [2:-2] of the block volume are exact for global rows
    # [row0 - R_C, row0 + chunk + R_C) (pad contamination sliced off).
    C_ext = cost_volume(gl_ext, gr_ext, p.max_disp, p.alpha, dtype=vdtype)[2:-2]
    ext_rows = row0 - R_C + jnp.arange(chunk + 2 * R_C)
    C_ext = _edge_fix(C_ext, gl_ext, gr_ext, ext_rows, H, R_img, p, vdtype)
    C = C_ext[R_C : R_C + chunk]             # this device's own cost rows

    # --- seed + fixed noise (global formulas, sliced locally) --------------
    seed = sparse_wta_seed(C_ext, p)[R_C : R_C + chunk]
    noise_full = unit_noise((H, W), p.noise_seed)
    noise = jax.lax.dynamic_slice(
        noise_full, (row0, jnp.zeros_like(row0)), (chunk, W)
    )

    # Row-pass machinery is strictly row-local: reuse the single-device strip
    # layout on the block, with the lane (row) validity taken from GLOBAL row
    # indices so border semantics match the unsharded engine.
    rows_layout = _layout_rows(C, p)
    g_rows = row0 + jnp.arange(chunk)
    rows_layout = rows_layout._replace(lane_ok=(g_rows >= pr) & (g_rows <= H - pr - 1))

    # Column-pass geometry: this device = one strip of `_chunk_columns`
    # (chunk rows ± halo warm-up), positions clipped at the global border.
    halo = p.halo
    w = chunk + 2 * halo
    j = jnp.arange(w)
    pos = jnp.clip(row0 - halo + j, 0, H - 1)              # (w,) global rows
    lo = jnp.maximum(row0 - halo, pr)
    hi = jnp.minimum(row0 + chunk + halo, H - pr - 1)
    raw = row0 - halo + j
    valid_rows = (raw >= lo) & (raw < hi)                  # (w,)
    lane_ok_cols = (jnp.arange(W) >= pr) & (jnp.arange(W) <= W - pr - 1)
    C_scan = C_ext[pos - (row0 - R_C)]                      # (w, W, D)

    def gather_maps(disp, cost):
        """(disp, cost) at the scan positions + the warm-up predecessor rows,
        rebuilt from a fresh halo exchange."""
        k = halo + 1
        td, bd = _exchange_rows(disp, k, idx, n, axis)
        tc, bc = _exchange_rows(cost, k, idx, n, axis)
        disp_ext = jnp.concatenate([td, disp, bd])          # rows [row0-k, ..+k)
        cost_ext = jnp.concatenate([tc, cost, bc])
        loc = pos - (row0 - k)
        pred_dn = jnp.clip(jnp.maximum(row0 - halo, 0) - 1, 0, H - 1) - (row0 - k)
        pred_up = jnp.clip(jnp.minimum(row0 + chunk + halo, H) , 0, H - 1) - (row0 - k)
        return disp_ext[loc], cost_ext[loc], disp_ext[pred_dn], disp_ext[pred_up]

    disp = seed
    for it in range(p.iters):
        disp = add_foreground_noise(disp, noise, p.noise_scale0 / 2.0**it)
        cost = _full_cost_map(C, disp, pr)
        # rows +
        disp, cost = _propagate(rows_layout, disp, cost, +1, 1, p)
        # cols + (downward): exchange fresh boundary rows, scan top→bottom
        d_scan, c_scan, pred_d_dn, pred_d_up = gather_maps(disp, cost)
        out_d, out_c = _col_pass(C_scan, d_scan, c_scan, valid_rows, lane_ok_cols, pred_d_dn, p)
        disp, cost = out_d[halo : halo + chunk], out_c[halo : halo + chunk]
        # rows -
        disp, cost = _propagate(rows_layout, disp, cost, -1, 1, p)
        # cols - (upward): reversed scan order
        d_scan, c_scan, pred_d_dn, pred_d_up = gather_maps(disp, cost)
        out_d, out_c = _col_pass(
            C_scan[::-1], d_scan[::-1], c_scan[::-1], valid_rows[::-1],
            lane_ok_cols, pred_d_up, p,
        )
        out_d, out_c = out_d[::-1], out_c[::-1]
        disp, cost = out_d[halo : halo + chunk], out_c[halo : halo + chunk]

    disp_l = mask_background(C, disp, p, row_ids=g_rows, n_rows=H)

    # Right map (running-min WTA straight from C, no C_R materialization) +
    # occlusion check — all row-local.
    disp_r = right_wta_from_left(C, p)

    if p.subpixel:
        int_l = jnp.clip(jnp.round(disp_l), 0, p.max_disp - 1).astype(jnp.int32)
        disp_l = jnp.where(disp_l > 0, subpixel_refine(C, int_l), 0.0)

    left_masked = mask_occlusions(disp_l, disp_r, p)
    return PatchMatchResult(left=left_masked, right=disp_r, left_raw=disp_l)


def sharded_patchmatch(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    mesh: Mesh,
    params: PatchMatchParams = PatchMatchParams(right_wta=True),
    axis: str = "strip",
) -> PatchMatchResult:
    """Dense PatchMatch disparity for ONE stereo pair across a device mesh.

    Rows are sharded over ``mesh[axis]``; see the module docstring for the
    communication pattern. Requires ``params.right_wta`` (the production
    operating point — the full two-sided engine stays single-device).

    Single-device equivalent: ``patchmatch_disparity(...,
    params.replace(chunks_y=mesh.shape[axis]))``.
    """
    if not params.right_wta:
        raise ValueError("sharded_patchmatch supports the right_wta operating point")
    H, W = gray_l.shape
    n = mesh.shape[axis]
    if H % n != 0:
        raise ValueError(f"H={H} must divide evenly over {n} devices")

    fn = jax.shard_map(
        partial(_local_patchmatch, p=params, n=n, H=H, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=PatchMatchResult(P(axis, None), P(axis, None), P(axis, None)),
    )
    return fn(jnp.asarray(gray_l, jnp.float32), jnp.asarray(gray_r, jnp.float32))
