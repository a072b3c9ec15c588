"""Whole-frame fused PatchMatch as ONE Pallas TPU kernel.

The round-2 per-pass kernel lost to XLA because ~500 tiny grid steps were
pipeline-latency-bound and the (w, chunks, N, D) volume re-streamed from HBM
on every one of the 12 passes (docs/PERFORMANCE.md "XLA WINS"). This kernel
is the design those notes kept naming: one pallas_call per FRAME —

- BOTH strip-layout volume copies live in VMEM for the whole kernel
  (bf16 production point (360, 640, 64): ~39 + ~30 MB incl. lane padding),
  so HBM streams the volume ONCE per frame instead of once per pass;
- the (disp, cost) front lives in VMEM scratch across noise + R+ C+ R- C-
  of all iterations — zero HBM round-trips between passes;
- every scan step is STATICALLY UNROLLED (single kernel invocation): no
  per-grid-step pipeline latency, no dynamic indexing, no materialized
  reverse copies (a backward pass just walks the unrolled steps backwards);
- the front's row-layout <-> col-layout changes between passes are EXACT
  permutation matmuls on the MXU (each row of the constant operand has one
  1.0; a sum with a single nonzero term is exact in any order, so the
  transport is bit-preserving);
- the iteration-start cost-map refresh and the final MaskBackground sweep
  (patchmatch_gpu.cu:233-270) are folded in.

MEASURED ON HARDWARE (v5e, production point (360, 640, 64) bf16, same-run
min-of-3): **4.18 ms/frame vs 5.01 ms/frame for the fully-unrolled XLA
path — 1.20x — with bit-identical output (equal_frac 1.0)**. The round-2
"XLA WINS" verdict is overturned by this shape. One-time Mosaic compile is
~9 min, so the kernel stays opt-in (docs/PERFORMANCE.md round-3 notes,
incl. the two silent-wrongness hardware bugs: compiled sublane-iota
mis-layout -> stream all iotas as inputs; default-precision MXU bf16
operand truncation -> Precision.HIGHEST on the permutation matmuls).

Bit-parity with stereo.patchmatch._match_one_side (and hence with the CUDA
semantics oracle) is structural, not approximate: every cost lookup is a
one-hot contraction whose sum has exactly ONE nonzero term — float summation
order is irrelevant — and all compares/clamps reproduce the XLA step
(tests/test_pallas.py::test_pallas_fused_bit_identical).

Layouts (i = in-chunk position, c = chunk):
  V_row[i, c, d, h] = C[h, c*chunk_x + i, d]   (chunk_x, chunks_x, D, H)
  V_col[i, c, d, w] = C[c*chunk_y + i, w, d]   (chunk_y, chunks_y, D, W)
  D_row[i, c, h]    = disp[h, c*chunk_x + i]
  D_col[i, c, w]    = disp[c*chunk_y + i, w]

Within a pass, scan position index j in [0, chunk + 2*halo) maps to
rel = j - halo; plane index i = rel mod chunk with a chunk-axis roll for
rel outside [0, chunk) (the CUDA +-5 px strip overlap,
patchmatch_gpu.cu:138-156). Halo reads on the TRAILING side of the
traversal touch planes already overwritten this pass, so they read a
pass-start snapshot (the XLA scan gathers all of its inputs up front —
these semantics are preserved exactly, including the clamped edge rows).

Mosaic notes: every boolean is a compare of two FULL-shape arrays (the
round-2 "replicated i1" mis-layout workaround); rolls are jnp.roll with
static shifts (slice+concat — also interpret-mode safe).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side layout + constant builders
# ---------------------------------------------------------------------------


class _FusedGeom(NamedTuple):
    H: int
    W: int
    D: int
    chunks_x: int
    chunk_x: int
    chunks_y: int
    chunk_y: int
    halo: int
    pr: int


def _derive_block(D: int) -> int:
    """Planes per accumulated store block in the in-kernel row derivation.
    2 is the measured register-pressure sweet spot: DB=8 spilled 92 MB of
    vector registers at the production point (the allocator keeps the
    accumulation chain live)."""
    return 2 if D % 2 == 0 else 1


def _effective_chunks(n: int, chunks: int) -> int:
    c = min(chunks, n)
    while n % c != 0:
        c -= 1
    return c


def fused_geometry(H: int, W: int, D: int, chunks: int, chunks_y, halo: int, pr: int):
    cx = _effective_chunks(W, chunks)
    cy = _effective_chunks(H, chunks if chunks_y is None else chunks_y)
    return _FusedGeom(H, W, D, cx, W // cx, cy, H // cy, halo, pr)


def fused_supported(H: int, W: int, D: int, chunks: int, chunks_y, halo: int,
                    pr: int, bf16: bool, budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """Both volume layouts (+ fronts/constants) must fit the VMEM budget, and
    the strip geometry must leave room for the halo roll arithmetic."""
    g = fused_geometry(H, W, D, chunks, chunks_y, halo, pr)
    if g.chunk_x <= halo + 1 or g.chunk_y <= halo + 1:
        return False
    esize = 2 if bf16 else 4

    def pad(n, m):
        return ((n + m - 1) // m) * m

    lane_h = pad(H, 128)
    lane_w = pad(W, 128)
    v_row = g.chunk_x * g.chunks_x * D * lane_h * esize
    v_col = g.chunk_y * g.chunks_y * D * lane_w * esize
    fronts = 2 * (W * lane_h + H * lane_w) * (4 + esize)
    perms = 2 * (W * lane_w + H * lane_h) * 4
    return v_row + v_col + fronts + perms < budget_bytes


def _perm_constants(g: _FusedGeom):
    """The four 0/1 matrices driving the exact MXU layout conversions."""
    W, H = g.W, g.H
    # row->col step 1: U = dot_general(A, PxT, contract axis0/axis0) -> (H, W)
    #   A (W, H) flat of row layout, row r = i*chunks_x + c <-> x = c*chunk_x+i.
    PxT = np.zeros((W, W), np.float32)
    for x in range(W):
        r = (x % g.chunk_x) * g.chunks_x + (x // g.chunk_x)
        PxT[r, x] = 1.0
    # row->col step 2: X_col2d = Py @ U, row s = i2*chunks_y + c2.
    Py = np.zeros((H, H), np.float32)
    for s in range(H):
        i2, c2 = s // g.chunks_y, s % g.chunks_y
        Py[s, c2 * g.chunk_y + i2] = 1.0
    # col->row step 1: U2 = dot_general(A2, QhT, axis0/axis0) -> (W, H).
    QhT = np.zeros((H, H), np.float32)
    for h in range(H):
        s = (h % g.chunk_y) * g.chunks_y + (h // g.chunk_y)
        QhT[s, h] = 1.0
    # col->row step 2: X_row2d = Pw @ U2, row r = i*chunks_x + c.
    Pw = np.zeros((W, W), np.float32)
    for r in range(W):
        Pw[r, (r % g.chunks_x) * g.chunk_x + (r // g.chunks_x)] = 1.0
    return PxT, Py, QhT, Pw


def _penalty(dim: int, n_lanes: int, chunks: int, chunk: int, halo: int, pr: int):
    """(w, chunks, N) additive +inf penalty: CUDA loop bounds x interior lane
    band (identical to stereo.patchmatch._chunk_columns validity)."""
    w = chunk + 2 * halo
    jjs = np.arange(w)[:, None]
    cs = np.arange(chunks)[None, :]
    unclipped = cs * chunk - halo + jjs
    lo = np.maximum(cs * chunk - halo, pr)
    hi = np.minimum((cs + 1) * chunk + halo, dim - pr - 1)
    ok_pos = (unclipped >= lo) & (unclipped < hi)
    lane = np.arange(n_lanes)
    ok_lane = (lane >= pr) & (lane <= n_lanes - pr - 1)
    ok = ok_pos[:, :, None] & ok_lane[None, None, :]
    return np.where(ok, 0.0, np.inf).astype(np.float32)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _onehot_cost(Vp, idx, ids):
    """sum_d Vp[c,d,n] * [idx[c,n] == d] — exactly one nonzero term per
    (c, n), so the reduction is EXACT regardless of order/dtype.

    `ids` is a STREAMED input, not an in-kernel iota: compiled Mosaic
    silently mis-lays-out sublane-axis iotas (replicated along lanes) —
    the round-2 "replicated i1" bug class; interpret mode hides it."""
    idx3 = idx[:, None, :] + jnp.zeros_like(ids)   # full-shape both sides
    onehot = (idx3 == ids).astype(Vp.dtype)
    return jnp.sum(Vp * onehot, axis=1)


def _roll_fix(plane, shift, edge, first01, last01):
    """Chunk-axis roll with the clipped-edge substitution.

    plane: (chunks, N) or (chunks, D, N); edge: (N,) or (D, N) — the stored
    value at the clamped absolute position; first01/last01: f32 0/1 chunk
    masks (STREAMED inputs, full-shape — no replicated-i1 layouts). Edge
    broadcasts are materialized through +zeros so no replicated operand
    reaches the select."""
    rank3 = plane.ndim == 3
    m01 = first01 if shift == -1 else last01
    rolled = jnp.roll(plane, 1 if shift == -1 else -1, axis=0)
    if rank3:
        cond = (m01[:, None, :] + jnp.zeros_like(rolled, dtype=m01.dtype)) > 0.5
        edge_full = edge[None, :, :].astype(rolled.dtype) + jnp.zeros_like(rolled)
        return jnp.where(cond, edge_full, rolled)
    cond = (m01 + jnp.zeros_like(rolled, dtype=m01.dtype)) > 0.5
    edge_full = edge[None, :].astype(rolled.dtype) + jnp.zeros_like(rolled)
    return jnp.where(cond, edge_full, rolled)


def _kernel(
    # inputs (iotas/masks/coords are STREAMED — compiled Mosaic mis-lays-out
    # in-kernel sublane-axis iotas; interpret mode hides it)
    *refs,
    g: _FusedGeom, iters: int, noise_scale0: float, improve: float,
    inner_loop: bool = False, derive_row: bool = False,
):
    if derive_row:
        # V_row is SCRATCH (last), derived in-kernel from V_col below — the
        # XLA-side (H,W,D)->(W,D,H) re-tiling transpose and its 30 MB HBM
        # write+read are gone (r4; docs/PERFORMANCE.md roofline section).
        (V_col, seed_row, noise_row, pen_row, pen_col, interior_col,
         PxT, Py, QhT, Pw,
         ids_row_ref, ids_col_ref, c_row_ref, x_col_ref,
         first_row_ref, last_row_ref, first_col_ref, last_col_ref,
         eyeb_ref,
         out_col,
         D_row, C_row, D_col, C_col, halo_d, halo_c, V_row) = refs
    else:
        (V_row, V_col, seed_row, noise_row, pen_row, pen_col, interior_col,
         PxT, Py, QhT, Pw,
         ids_row_ref, ids_col_ref, c_row_ref, x_col_ref,
         first_row_ref, last_row_ref, first_col_ref, last_col_ref,
         out_col,
         D_row, C_row, D_col, C_col, halo_d, halo_c) = refs
    f32 = jnp.float32
    cdtype = V_col.dtype
    ids_row = ids_row_ref[...]
    ids_col = ids_col_ref[...]
    c_row = c_row_ref[...]
    x_col = x_col_ref[...]
    first_row01 = first_row_ref[...]
    last_row01 = last_row_ref[...]
    first_col01 = first_col_ref[...]
    last_col01 = last_col_ref[...]

    # -- one directional pass, fully unrolled --------------------------------
    def run_pass(orientation: str, direction: int):
        if orientation == "row":
            Vr, Dr, Cr, pen = V_row, D_row, C_row, pen_row
            chunks, chunk, N, dim = g.chunks_x, g.chunk_x, g.H, g.W
            ids, first01, last01 = ids_row, first_row01, last_row01
        else:
            Vr, Dr, Cr, pen = V_col, D_col, C_col, pen_col
            chunks, chunk, N, dim = g.chunks_y, g.chunk_y, g.W, g.H
            ids, first01, last01 = ids_col, first_col01, last_col01
        w = chunk + 2 * g.halo
        fwd = direction > 0
        halo_n = g.halo

        # Pass-start snapshot: the trailing-side halo reads (and their edge
        # clamps) see planes that will be overwritten before those reads
        # happen. XLA gathers every input up front; snapshot = same thing.
        snap_lo = 0 if fwd else chunk - halo_n
        halo_d[0:halo_n, 0:chunks, 0:N] = Dr[snap_lo : snap_lo + halo_n]
        halo_c[0:halo_n, 0:chunks, 0:N] = Cr[snap_lo : snap_lo + halo_n]
        # Edge rows for the trailing-side clamp (fwd: abs dim-1; bwd: abs 0).
        if fwd:
            snap_edge_d = Dr[chunk - 1][chunks - 1]
            snap_edge_c = Cr[chunk - 1][chunks - 1]
        else:
            snap_edge_d = Dr[0][0]
            snap_edge_c = Cr[0][0]

        # carry0: stored disp at the predecessor of the first scan position
        # (pass-start values; all reads below happen before any write).
        if fwd:
            carry = _roll_fix(Dr[chunk - halo_n - 1], -1, Dr[0][0], first01, last01)
        else:
            carry = _roll_fix(
                Dr[halo_n], +1, Dr[chunk - 1][chunks - 1], first01, last01
            )

        for t in range(w):
            j = t if fwd else w - 1 - t
            rel = j - g.halo
            shift = -1 if rel < 0 else (1 if rel >= chunk else 0)
            i = rel % chunk

            if shift == 0:
                Vp = Vr[i]
                cur_d = Dr[i]
                cur_c = Cr[i]
            else:
                trailing = shift == (1 if fwd else -1)
                Vp = _roll_fix(
                    Vr[i], shift,
                    Vr[0][0] if shift == -1 else Vr[chunk - 1][chunks - 1],
                    first01, last01,
                )
                if trailing:
                    il = i - snap_lo
                    cur_d = _roll_fix(
                        halo_d[il, 0:chunks, 0:N], shift, snap_edge_d,
                        first01, last01,
                    )
                    cur_c = _roll_fix(
                        halo_c[il, 0:chunks, 0:N], shift, snap_edge_c,
                        first01, last01,
                    )
                else:
                    edge_d = Dr[0][0] if shift == -1 else Dr[chunk - 1][chunks - 1]
                    edge_c = Cr[0][0] if shift == -1 else Cr[chunk - 1][chunks - 1]
                    cur_d = _roll_fix(Dr[i], shift, edge_d, first01, last01)
                    cur_c = _roll_fix(Cr[i], shift, edge_c, first01, last01)

            if orientation == "row":
                x = jnp.clip(c_row * float(chunk) + float(rel), 0.0, float(dim - 1))
            else:
                x = x_col
            d_eff = jnp.minimum(carry, x - float(g.pr))
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            cost_cand = _onehot_cost(Vp, idx, ids)
            cand_f = cost_cand.astype(f32) + pen[j]
            better = cand_f < cur_c.astype(f32)
            new_d = jnp.where(better, jnp.minimum(carry, x - float(g.pr)), cur_d)
            new_c = jnp.where(better, cost_cand.astype(cur_c.dtype), cur_c)
            if shift == 0:
                Dr[i] = new_d
                Cr[i] = new_c
            carry = new_d

    # -- one directional pass, interior as a hardware fori_loop ---------------
    # Bit-identical restructuring of run_pass built on two observations:
    #   1. trailing-halo steps never store — they only update a carry that
    #      dies at pass end, so they (and the snapshot scratch that exists
    #      only to feed them) are dead code;
    #   2. the `chunk` interior steps all take the shift==0 branch — no
    #      rolls, no edge substitution — so one dynamic-indexed body can
    #      replace `chunk` unrolled copies. Only the 'halo' leading steps
    #      keep static unrolling (they need _roll_fix's static shifts).
    # This shrinks the Mosaic program ~8x (the ~9 min whole-frame compile
    # was proportional to the ~550 unrolled step bodies).
    def run_pass_loop(orientation: str, direction: int):
        if orientation == "row":
            Vr, Dr, Cr, pen = V_row, D_row, C_row, pen_row
            chunks, chunk, N, dim = g.chunks_x, g.chunk_x, g.H, g.W
            ids, first01, last01 = ids_row, first_row01, last_row01
        else:
            Vr, Dr, Cr, pen = V_col, D_col, C_col, pen_col
            chunks, chunk, N, dim = g.chunks_y, g.chunk_y, g.W, g.H
            ids, first01, last01 = ids_col, first_col01, last_col01
        w = chunk + 2 * g.halo
        fwd = direction > 0
        halo_n = g.halo
        pr_f = float(g.pr)
        chunk_f = float(chunk)

        if fwd:
            carry = _roll_fix(Dr[chunk - halo_n - 1], -1, Dr[0][0], first01, last01)
        else:
            carry = _roll_fix(
                Dr[halo_n], +1, Dr[chunk - 1][chunks - 1], first01, last01
            )

        # Leading halo steps (static): read pass-start planes via rolls,
        # update the carry, never store — exactly run_pass's shift!=0,
        # non-trailing branch.
        for t in range(halo_n):
            j = t if fwd else w - 1 - t
            rel = j - g.halo
            shift = -1 if rel < 0 else 1
            i = rel % chunk
            Vp = _roll_fix(
                Vr[i], shift,
                Vr[0][0] if shift == -1 else Vr[chunk - 1][chunks - 1],
                first01, last01,
            )
            edge_d = Dr[0][0] if shift == -1 else Dr[chunk - 1][chunks - 1]
            edge_c = Cr[0][0] if shift == -1 else Cr[chunk - 1][chunks - 1]
            cur_d = _roll_fix(Dr[i], shift, edge_d, first01, last01)
            cur_c = _roll_fix(Cr[i], shift, edge_c, first01, last01)
            if orientation == "row":
                x = jnp.clip(c_row * chunk_f + float(rel), 0.0, float(dim - 1))
            else:
                x = x_col
            d_eff = jnp.minimum(carry, x - pr_f)
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            cost_cand = _onehot_cost(Vp, idx, ids)
            cand_f = cost_cand.astype(f32) + pen[j]
            better = cand_f < cur_c.astype(f32)
            carry = jnp.where(better, d_eff, cur_d)

        # Interior steps: i walks [0, chunk) in traversal order; the scan
        # position is j = i + halo, so rel == i and the clip in x is a
        # no-op (kept for exact structural parity with run_pass).
        def interior(k, carry):
            i = k if fwd else chunk - 1 - k
            Vp = Vr[pl.ds(i, 1)][0]
            cur_d = Dr[pl.ds(i, 1)][0]
            cur_c = Cr[pl.ds(i, 1)][0]
            pen_j = pen[pl.ds(i + halo_n, 1)][0]
            if orientation == "row":
                x = jnp.clip(
                    c_row * chunk_f + i.astype(f32), 0.0, float(dim - 1)
                )
            else:
                x = x_col
            d_eff = jnp.minimum(carry, x - pr_f)
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            cost_cand = _onehot_cost(Vp, idx, ids)
            cand_f = cost_cand.astype(f32) + pen_j
            better = cand_f < cur_c.astype(f32)
            new_d = jnp.where(better, d_eff, cur_d)
            new_c = jnp.where(better, cost_cand.astype(cur_c.dtype), cur_c)
            Dr[pl.ds(i, 1)] = new_d[None]
            Cr[pl.ds(i, 1)] = new_c[None]
            return new_d

        jax.lax.fori_loop(0, chunk, interior, carry)

    # -- layout conversions (exact permutation matmuls on the MXU) ------------
    # precision=HIGHEST is LOAD-BEARING for exactness: the default f32 MXU
    # path truncates inputs to bf16 (measured 2^-9 error on hardware), which
    # corrupts every transported disparity/cost. With hi+lo operand
    # splitting, a product against an exact-1.0 permutation weight
    # reconstructs the full f32 value (a_hi*1 + a_lo*1), so the transport is
    # bit-exact again.
    PREC = jax.lax.Precision.HIGHEST

    def row_to_col(src_ref, dst_ref, dtype):
        A2 = src_ref[...].astype(f32).reshape(g.W, g.H)
        U = jax.lax.dot_general(A2, PxT[...], (((0,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=PREC)
        X = jax.lax.dot_general(Py[...], U, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=PREC)
        dst_ref[...] = X.reshape(g.chunk_y, g.chunks_y, g.W).astype(dtype)

    def col_to_row(src_ref, dst_ref, dtype):
        A2 = src_ref[...].astype(f32).reshape(g.H, g.W)
        U = jax.lax.dot_general(A2, QhT[...], (((0,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=PREC)
        X = jax.lax.dot_general(Pw[...], U, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32, precision=PREC)
        dst_ref[...] = X.reshape(g.chunk_x, g.chunks_x, g.H).astype(dtype)

    # -- cost map refresh in row layout (XLA _full_cost_map) ------------------
    def refresh_cost_row():
        for i in range(g.chunk_x):
            Vp = V_row[i]
            x = c_row * float(g.chunk_x) + float(i)
            d_eff = jnp.minimum(D_row[i], x - float(g.pr))
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            C_row[i] = _onehot_cost(Vp, idx, ids_row).astype(cdtype)

    def refresh_cost_row_loop():
        def body(i, _):
            Vp = V_row[pl.ds(i, 1)][0]
            x = c_row * float(g.chunk_x) + i.astype(f32)
            cur_d = D_row[pl.ds(i, 1)][0]
            d_eff = jnp.minimum(cur_d, x - float(g.pr))
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            C_row[pl.ds(i, 1)] = _onehot_cost(Vp, idx, ids_row).astype(cdtype)[None]
            return 0

        jax.lax.fori_loop(0, g.chunk_x, body, 0)

    do_pass = run_pass_loop if inner_loop else run_pass
    do_refresh = refresh_cost_row_loop if inner_loop else refresh_cost_row

    # -- in-kernel volume layout derivation (derive_row mode) -----------------
    # V_row[i, c, d, h] per plane d is the SAME permutation transform the
    # front transport (col_to_row) applies to a (H, W) map — one MXU
    # permutation matmul pair per d. Exactness WITHOUT the hi/lo trick for
    # bf16 volumes: operands are bf16 costs x exact-0/1 permutation weights,
    # every output sum has exactly ONE nonzero term, and every intermediate
    # is bf16-representable, so DEFAULT MXU precision (which truncates f32
    # operands to bf16) loses nothing. f32 volumes (non-production) keep
    # PREC=HIGHEST.
    if derive_row:
        if cdtype == jnp.bfloat16:
            Qv = QhT[...].astype(jnp.bfloat16)
            Pv = Pw[...].astype(jnp.bfloat16)
            vprec = None
        else:
            Qv = QhT[...]
            Pv = Pw[...]
            vprec = jax.lax.Precision.HIGHEST
        # Mosaic store constraints force a block design: a (cx, ccx, H)
        # plane cannot store at a middle-axis slot V_row[:, :, d, :] (the
        # implied unit-sublane reshape is an unsupported shape cast), and a
        # whole-volume transpose spills >100 MB of registers. Instead,
        # DB-plane blocks are accumulated in registers via broadcast_in_dim
        # (no unit-dim reshapes) x streamed one-hot plane masks (eyeb_ref —
        # in-kernel sublane iotas are the known mis-layout class), then
        # stored with exactly matching shapes.
        DB = _derive_block(g.D)
        eyeb = eyeb_ref[...]
        for d0 in range(0, g.D, DB):
            acc = jnp.zeros((g.chunk_x, g.chunks_x, DB, g.H), f32)
            for j in range(DB):
                d = d0 + j
                A3 = V_col[:, :, pl.ds(d, 1), :]
                A2 = jnp.sum(A3, axis=2).reshape(g.H, g.W)  # unit-axis squeeze
                U = jax.lax.dot_general(A2, Qv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32, precision=vprec)
                X = jax.lax.dot_general(Pv, U, (((1,), (0,)), ((), ())),
                                        preferred_element_type=f32, precision=vprec)
                X3 = X.reshape(g.chunk_x, g.chunks_x, g.H)
                Xb = jax.lax.broadcast_in_dim(
                    X3, (g.chunk_x, g.chunks_x, DB, g.H), (0, 1, 3))
                Mb = jax.lax.broadcast_in_dim(
                    eyeb[j], (g.chunk_x, g.chunks_x, DB, g.H), (2, 3))
                acc = acc + Xb * Mb
            V_row[:, :, pl.ds(d0, DB), :] = acc.astype(cdtype)

    # ------------------------------------------------------------------------
    D_row[...] = seed_row[...]
    for it in range(iters):
        scale = noise_scale0 / (2.0**it)
        # AddForegroundNoise (cu:298-304): nonzero pixels only, clamp at 0.
        d = D_row[...]
        D_row[...] = jnp.maximum(
            (d + noise_row[...] * scale) * jnp.sign(d), 0.0
        )
        do_refresh()
        do_pass("row", +1)
        row_to_col(D_row, D_col, f32)
        row_to_col(C_row, C_col, cdtype)
        do_pass("col", +1)
        col_to_row(D_col, D_row, f32)
        col_to_row(C_col, C_row, cdtype)
        do_pass("row", -1)
        row_to_col(D_row, D_col, f32)
        row_to_col(C_row, C_col, cdtype)
        do_pass("col", -1)
        if it + 1 < iters:
            col_to_row(D_col, D_row, f32)
            col_to_row(C_col, C_row, cdtype)

    # -- MaskBackground in col layout (cu:233-270) ----------------------------
    # Threshold computed in f32, exactly as the (pinned) XLA mask_background
    # does: a bf16 product would be backend-dependent (XLA keeps bf16
    # products in excess f32 precision; Mosaic has no bf16 compare at all).
    half = 0.5
    if inner_loop:
        def mask_body(i, _):
            disp = D_col[pl.ds(i, 1)][0]
            d_eff = jnp.minimum(disp, x_col - float(g.pr))
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            Vp = V_col[pl.ds(i, 1)][0]
            cost_d = _onehot_cost(Vp, idx, ids_col).astype(f32)
            cost0 = Vp[:, 0, :].astype(f32)
            inter = interior_col[pl.ds(i, 1)][0]
            keep = (cost_d < improve * cost0) & (
                inter > (jnp.zeros_like(inter) + half)
            )
            out_col[pl.ds(i, 1)] = jnp.where(keep, disp, 0.0)[None]
            return 0

        jax.lax.fori_loop(0, g.chunk_y, mask_body, 0)
    else:
        for i in range(g.chunk_y):
            disp = D_col[i]
            d_eff = jnp.minimum(disp, x_col - float(g.pr))
            idx = jnp.clip(jnp.round(d_eff), 0, g.D - 1).astype(jnp.int32)
            cost_d = _onehot_cost(V_col[i], idx, ids_col).astype(f32)
            cost0 = V_col[i][:, 0, :].astype(f32)
            inter = interior_col[i]
            keep = (cost_d < improve * cost0) & (inter > (jnp.zeros_like(inter) + half))
            out_col[i] = jnp.where(keep, disp, 0.0)


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("chunks", "chunks_y", "halo", "pr", "iters", "noise_scale0",
                     "improve", "interpret", "inner_loop", "derive_row"),
)
def pallas_patchmatch_fused(
    C: jnp.ndarray,      # (H, W, D) cost volume (f32 or bf16)
    seed: jnp.ndarray,   # (H, W) initial disparity
    noise: jnp.ndarray,  # (H, W) fixed unit noise
    chunks: int,
    chunks_y,
    halo: int,
    pr: int,
    iters: int,
    noise_scale0: float,
    improve: float,
    interpret: bool = False,
    inner_loop: bool = False,
    derive_row: bool = False,
) -> jnp.ndarray:
    """Returns the MaskBackground'd left disparity — drop-in replacement for
    stereo.patchmatch._match_one_side, bit-identical.

    derive_row=True: the kernel receives only the col-layout volume and
    derives the row layout in VMEM via per-plane MXU permutation matmuls —
    the XLA-side (H,W,D)->(W,D,H) re-tiling transpose (~0.25 ms/frame) plus
    30 MB of HBM write+read would disappear. Bit-identical in interpret
    mode (locked by test) but NOT COMPILABLE at the production point on the
    current Mosaic toolchain — three designs, three walls (r4,
    docs/PERFORMANCE.md): per-plane middle-axis stores hit an unsupported
    unit-sublane shape cast; a d-leading temp + whole-volume transpose
    spills 105 MB of vector registers; DB-blocked broadcast+mask
    accumulation spills 92 MB at DB=8 and gets the compile helper
    OOM-killed at DB=2. Default stays False (two-input layout prep) until
    the toolchain moves; the flag and the interpret-verified implementation
    are kept for that day.

    Batching: an outer jax.vmap (multi-camera batch, or the non-right_wta
    L/R lockstep) maps this to a SEQUENTIAL lax.map over the batch rather
    than a pallas grid dimension. The kernel holds both strip-layout volume
    copies (~59 MB at the production point) as whole-array VMEM blocks; a
    vmap-derived grid dimension makes Pallas double-buffer those inputs for
    pipelining — 150.5 MB scoped > the 128 MB v5e VMEM (measured B=2
    RESOURCE_EXHAUSTED, docs/PERFORMANCE.md round-3). Sequential batching
    keeps per-step VMEM at the single-frame budget at any B.
    """
    impl = functools.partial(
        _fused_single, chunks=chunks, chunks_y=chunks_y, halo=halo, pr=pr,
        iters=iters, noise_scale0=noise_scale0, improve=improve,
        interpret=interpret, inner_loop=inner_loop, derive_row=derive_row,
    )
    return jax.custom_batching.sequential_vmap(impl)(C, seed, noise)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "D", "chunks", "chunks_y", "halo", "pr", "iters",
                     "noise_scale0", "improve", "interpret", "inner_loop"),
)
def pallas_patchmatch_fused_prebuilt(
    V_row: jnp.ndarray,  # (chunk_x, chunks_x, D, H) strip layout
    V_col: jnp.ndarray,  # (chunk_y, chunks_y, D, W)
    seed: jnp.ndarray,
    noise: jnp.ndarray,
    H: int, W: int, D: int,
    chunks: int, chunks_y, halo: int, pr: int, iters: int,
    noise_scale0: float, improve: float,
    interpret: bool = False,
    inner_loop: bool = True,
) -> jnp.ndarray:
    """Fused PatchMatch over PREBUILT strip-layout volumes (the in-kernel
    cost-volume build, ops/pallas/volume_build.py) — identical kernel, the
    XLA layout transposes skipped entirely."""
    impl = functools.partial(
        _fused_single_prebuilt, H=H, W=W, D=D,
        chunks=chunks, chunks_y=chunks_y, halo=halo, pr=pr,
        iters=iters, noise_scale0=noise_scale0, improve=improve,
        interpret=interpret, inner_loop=inner_loop,
    )
    return jax.custom_batching.sequential_vmap(impl)(V_row, V_col, seed, noise)


def _fused_single_prebuilt(V_row, V_col, seed, noise, *, H, W, D, **kw):
    return _fused_single(
        jnp.zeros((H, W, D), V_col.dtype), seed, noise,
        derive_row=False, V_row_pre=V_row, V_col_pre=V_col, **kw,
    )


def _fused_single(
    C: jnp.ndarray,
    seed: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    chunks: int,
    chunks_y,
    halo: int,
    pr: int,
    iters: int,
    noise_scale0: float,
    improve: float,
    interpret: bool,
    inner_loop: bool,
    derive_row: bool,
    V_row_pre=None,
    V_col_pre=None,
) -> jnp.ndarray:
    H, W, D = C.shape
    g = fused_geometry(H, W, D, chunks, chunks_y, halo, pr)
    assert g.chunk_x > halo + 1 and g.chunk_y > halo + 1, (
        "fused kernel needs chunk > halo + 1"
    )

    # Layout builders (XLA side, once per call; the kernel reads each input
    # from HBM exactly once). In derive_row mode only the COL layout is
    # built here — the row layout is derived inside the kernel on the MXU.
    # Prebuilt mode (ops/pallas/volume_build.py) skips both.
    if V_col_pre is not None:
        V_col, V_row = V_col_pre, V_row_pre
    else:
        V_col = jnp.transpose(C, (0, 2, 1)).reshape(g.chunks_y, g.chunk_y, D, W)
        V_col = jnp.transpose(V_col, (1, 0, 2, 3))
        if not derive_row:
            V_row = jnp.transpose(C, (1, 2, 0)).reshape(g.chunks_x, g.chunk_x, D, H)
            V_row = jnp.transpose(V_row, (1, 0, 2, 3))

    def to_row(x):
        r = jnp.transpose(x, (1, 0)).reshape(g.chunks_x, g.chunk_x, H)
        return jnp.transpose(r, (1, 0, 2)).astype(jnp.float32)

    seed_row = to_row(seed)
    noise_row = to_row(noise)

    pen_row = jnp.asarray(_penalty(W, H, g.chunks_x, g.chunk_x, halo, pr))
    pen_col = jnp.asarray(_penalty(H, W, g.chunks_y, g.chunk_y, halo, pr))
    PxT, Py, QhT, Pw = (jnp.asarray(m) for m in _perm_constants(g))

    # Streamed iota/mask/coordinate constants (see _kernel docstring).
    ids_row = jnp.asarray(
        np.broadcast_to(np.arange(D, dtype=np.int32)[None, :, None], (g.chunks_x, D, H)).copy()
    )
    ids_col = jnp.asarray(
        np.broadcast_to(np.arange(D, dtype=np.int32)[None, :, None], (g.chunks_y, D, W)).copy()
    )
    c_row = jnp.asarray(
        np.broadcast_to(np.arange(g.chunks_x, dtype=np.float32)[:, None], (g.chunks_x, H)).copy()
    )
    x_col = jnp.asarray(
        np.broadcast_to(np.arange(W, dtype=np.float32)[None, :], (g.chunks_y, W)).copy()
    )

    def chunk01(chunks, N, target):
        m = np.zeros((chunks, N), np.float32)
        m[target] = 1.0
        return jnp.asarray(m)

    first_row01 = chunk01(g.chunks_x, H, 0)
    last_row01 = chunk01(g.chunks_x, H, g.chunks_x - 1)
    first_col01 = chunk01(g.chunks_y, W, 0)
    last_col01 = chunk01(g.chunks_y, W, g.chunks_y - 1)

    yy = np.repeat(np.arange(H)[:, None], W, 1)
    xx = np.repeat(np.arange(W)[None, :], H, 0)
    interior = ((yy >= pr) & (yy <= H - pr - 1) & (xx >= pr) & (xx <= W - pr - 1))
    interior_col = jnp.asarray(
        interior.astype(np.float32).reshape(g.chunks_y, g.chunk_y, W).transpose(1, 0, 2)
    )

    cdtype = C.dtype
    kernel = functools.partial(
        _kernel, g=g, iters=iters, noise_scale0=noise_scale0, improve=improve,
        inner_loop=inner_loop, derive_row=derive_row,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    scratch = [
        pltpu.VMEM((g.chunk_x, g.chunks_x, H), jnp.float32),   # D_row
        pltpu.VMEM((g.chunk_x, g.chunks_x, H), cdtype),        # C_row
        pltpu.VMEM((g.chunk_y, g.chunks_y, W), jnp.float32),   # D_col
        pltpu.VMEM((g.chunk_y, g.chunks_y, W), cdtype),        # C_col
        pltpu.VMEM((halo, max(g.chunks_x, g.chunks_y), max(H, W)), jnp.float32),
        pltpu.VMEM((halo, max(g.chunks_x, g.chunks_y), max(H, W)), cdtype),
    ]
    inputs = [
        seed_row, noise_row, pen_row, pen_col, interior_col,
        PxT, Py, QhT, Pw,
        ids_row, ids_col, c_row, x_col,
        first_row01, last_row01, first_col01, last_col01,
    ]
    if derive_row:
        # Row-layout volume becomes VMEM scratch (same bytes, no HBM trip).
        scratch.append(pltpu.VMEM((g.chunk_x, g.chunks_x, D, H), cdtype))
        DB = _derive_block(D)
        eyeb = jnp.asarray(
            np.broadcast_to(
                np.eye(DB, dtype=np.float32)[:, :, None], (DB, DB, H)
            ).copy()
        )
        inputs = [V_col] + inputs + [eyeb]
    else:
        inputs = [V_row, V_col] + inputs
    out_col = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(len(inputs))],
        out_specs=vspec(),
        out_shape=jax.ShapeDtypeStruct((g.chunk_y, g.chunks_y, W), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    # col layout -> canonical (H, W).
    return jnp.transpose(out_col, (1, 0, 2)).reshape(H, W)
