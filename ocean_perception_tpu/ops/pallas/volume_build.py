"""Cost-volume BUILD as one Pallas TPU kernel: images in, strip layouts out.

The round-4 roofline names the build as the next byte wall: the XLA
per-plane build counts 0.877 GB/frame of f32 intermediates (64 x shifted
images, |diffs|, stencil pads) plus the (H,W,D)->strip-layout transposes,
for a volume whose useful bytes are ~30 MB (PERFORMANCE.md "stage
attribution"). This kernel computes the X-stencil cost
(stereo/cost.cost_volume: e = alpha*|L - R(x-d)| + (1-alpha)*|G - Gr(x-d)|,
5-tap X stencil, edge clamps) directly into BOTH strip layouts the fused
PatchMatch kernel consumes — every intermediate lives in VMEM, HBM sees
only the 8 image planes in (~8 MB) and the two layout volumes out.

Why this dodges round 4's derive_row Mosaic walls (PERFORMANCE.md:986-1000):
those designs needed per-PLANE stores into middle-axis slots
`V[:, :, d, :]` (unit-sublane shape casts) or whole-volume transposes
(100 MB register spills). Here the natural production order IS the layout:
one (D, W) tile per image row for V_col, one (D, H) tile per image column
for V_row, each stored whole at dynamic LEADING indices — full-tile stores,
no relayouts.

Per-tile construction:
- V_col row y: R(y, x-d) for all (d, x) is a shear of one image row —
  composed from log2(D) static lane-rolls masked by streamed d-bit masks,
  then the x<d edge clamp (reference GetSubpixel clamp) substitutes
  column 0.
- V_row column x: R^T(x-d, h) for d in [0, D) is a CONTIGUOUS sublane
  block of the column-REVERSED transposed image (streamed pre-reversed and
  bottom-padded with D-1 copies of R^T[0], so the x<d clamp is baked into
  the padding) — one dynamic-offset block read, zero in-kernel reversals.
- The 5-tap X stencil accumulates over a 3-tile ring in the exact STENCIL
  order of stereo/cost._stencil_sum (edge-replicated taps), so the f32 sum
  order — and hence the bf16 cast — is reproduced able-for-able.

Bit-parity with cost_volume + the wrapper's layout transposes is locked by
tests/test_pallas.py::test_volume_build_bit_identical (interpret mode; the
fused-kernel test pattern).

Reference: patchmatch_gpu.cu:346-352 — the upload/convert/gradient staging
this replaces wholesale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_patchmatch import fused_geometry


def _build_kernel(
    # streamed constants first (Mosaic in-kernel iotas mis-lay-out)
    dbit_ref,     # (NB, D, WDP) f32 0/1: bit b of sublane-d index
    colmap_ref,   # (D, W) f32: lane index x
    lanemap_h_ref,  # (D, H) f32: lane index h (row orientation)
    # images (all row-padded by the wrapper: 8 replicate rows on top, 16
    # below, so every aligned group block stays in-array; row 0 of the
    # ORIGINAL image sits at padded row 8)
    L_ref, G_ref,                          # (H + 24, W) f32
    R_ref, Gr_ref,                         # (H + 24, WDP) f32 left-padded
    LT_ref, GT_ref,                        # (W + 24, H) f32
    RTr_ref, GrTr_ref,                     # (W + D + 7, H) f32 reversed
    # outputs
    V_row_ref,    # (chunk_x, chunks_x, D, H) cdtype
    V_col_ref,    # (chunk_y, chunks_y, D, W) cdtype
    *,
    H: int, W: int, D: int,
    chunk_x: int, chunk_y: int,
    alpha: float,
    n_bits: int,
):
    f32 = jnp.float32
    cdtype = V_col_ref.dtype
    dbits = dbit_ref[...]
    colmap = colmap_ref[...]
    lanemap_h = lanemap_h_ref[...]
    WDP = W + D + (-(W + D)) % 128
    halfW = jnp.zeros((D, WDP), f32) + 0.5

    G10 = 10  # e-tiles per group: rows 8g-1 .. 8g+8
    # Sheared images arrive LEFT-padded to lane width WDP (a multiple of
    # 128): the x<d clamp is baked into replicate padding, and every shear
    # op is STRICTLY 2-D with explicit broadcast_to from a unit-sublane
    # slice — the only broadcast/roll/select combination that compiles on
    # this Mosaic (middle-axis 3-D broadcasts + rolls emit invalid
    # layouts; implicit broadcast-by-addition trips an internal check).

    def shear_one(row1):  # (1, WDP) -> (D, W): out[d, w] = row[w - d]
        t = jnp.broadcast_to(row1, (D, WDP))
        for b in range(n_bits):
            rolled = jnp.roll(t, 1 << b, axis=1)
            t = jnp.where(dbits[b] > halfW, rolled, t)
        return t[:, WDP - W:]

    half = jnp.float32(0.5)

    # ---- col orientation: one (D, W) tile per image row --------------------
    # Rows are processed in groups of 8: dynamic slicing of tiled memrefs
    # demands provably 8-aligned sublane starts, so each group reads ONE
    # aligned 24-row block (rows 8g-8 .. 8g+15 of the original image via
    # the wrapper's 8-top/16-bottom replicate padding) and addresses rows
    # inside it with STATIC offsets. The replicate padding also delivers
    # the stencil's edge-clamp semantics exactly: e(-1) == e(0) and
    # e(H) == e(H-1) because e(y) depends only on image row y.
    def e_col_one(Lr1, Gr1, Rr1, Grr1):
        # (1, W)/(1, WDP) rows -> (D, W) e-tile, all 2-D.
        Lb = jnp.broadcast_to(Lr1, (D, W))
        Gb = jnp.broadcast_to(Gr1, (D, W))
        return (
            alpha * jnp.abs(Lb - shear_one(Rr1))
            + (1.0 - alpha) * jnp.abs(Gb - shear_one(Grr1))
        )

    def lane_shift(e, dx, edge_idx):
        # value at lane w+dx with edge replicate (pad mode="edge" parity):
        # w+dx < 0 (i.e. w < -dx) or w+dx > W-1 reads the edge column.
        rolled = jnp.roll(e, -dx, axis=1)
        edge = e[:, edge_idx:edge_idx + 1] + jnp.zeros_like(e)
        lim = jnp.float32(-dx if dx < 0 else W - 1 - dx)
        cond = (colmap < lim) if dx < 0 else (colmap > lim)
        return jnp.where(cond + jnp.zeros_like(e) > half, edge, rolled)

    def stencil_w(em1, e0, ep1):
        # STENCIL order: (-1,-1), (-1,1), (0,0)=e0 first, (1,-1), (1,1) —
        # matching _stencil_sum's acc = e + taps-in-order.
        acc = e0
        acc = acc + lane_shift(em1, -1, 0)
        acc = acc + lane_shift(em1, +1, W - 1)
        acc = acc + lane_shift(ep1, -1, 0)
        acc = acc + lane_shift(ep1, +1, W - 1)
        return acc

    def store_col(y, acc):
        c = y // chunk_y
        i = y - c * chunk_y
        V_col_ref[pl.ds(i, 1), pl.ds(c, 1)] = acc.astype(cdtype)[None, None]

    def col_group(g, _):
        base = pl.multiple_of(g * 8, 8)
        Lb24 = L_ref[pl.ds(base, 24), :]
        Gb24 = G_ref[pl.ds(base, 24), :]
        Rb24 = R_ref[pl.ds(base, 24), :]
        Grb24 = Gr_ref[pl.ds(base, 24), :]
        # block offsets 7..16 = original rows 8g-1 .. 8g+8
        e10 = [
            e_col_one(
                Lb24[j:j + 1, :], Gb24[j:j + 1, :],
                Rb24[j:j + 1, :], Grb24[j:j + 1, :],
            )
            for j in range(7, 17)
        ]
        for j in range(8):
            store_col(g * 8 + j, stencil_w(e10[j], e10[j + 1], e10[j + 2]))
        return 0

    jax.lax.fori_loop(0, H // 8, col_group, 0)

    # ---- row orientation: one (D, H) tile per image column -----------------
    # Same group-of-8 structure. Per group g (columns 8g..8g+7): one
    # aligned 24-row block of LT/GT (the wrapper's 8-top/16-bottom pad) and
    # one aligned 80-row block of the reversed transposes covering every
    # (x - d) window of the group incl. the x-1/x+8 stencil neighbors; all
    # within-block addressing is static. The reversed layout's tail padding
    # (rows >= W-1 all equal R^T[0]) makes e(-1) == e(0) exactly; the LAST
    # group's x = W neighbor is the one case whose window would start at a
    # negative row — handled by the unrolled final group (e_8 := e_7, the
    # exact edge-replicate semantics).
    def e_row_one(LTr1, GTr1, Rblk, Gblk):
        # (1, H) rows + (D, H) reversed blocks -> (D, H) e-tile, all 2-D.
        Lb = jnp.broadcast_to(LTr1, (D, H))
        Gb = jnp.broadcast_to(GTr1, (D, H))
        return alpha * jnp.abs(Lb - Rblk) + (1.0 - alpha) * jnp.abs(Gb - Gblk)

    def lane_shift_h(e, dy, edge_idx):
        rolled = jnp.roll(e, -dy, axis=1)
        edge = e[:, edge_idx:edge_idx + 1] + jnp.zeros_like(e)
        lim = jnp.float32(-dy if dy < 0 else H - 1 - dy)
        cond = (lanemap_h < lim) if dy < 0 else (lanemap_h > lim)
        return jnp.where(cond + jnp.zeros_like(e) > half, edge, rolled)

    def stencil_h(em1, e0, ep1):
        # Taps (dy, dx): dx selects the neighbor column tile, dy the lane
        # shift — same STENCIL order as above.
        acc = e0
        acc = acc + lane_shift_h(em1, -1, 0)        # (-1, -1)
        acc = acc + lane_shift_h(ep1, -1, 0)        # (-1, +1)
        acc = acc + lane_shift_h(em1, +1, H - 1)    # (+1, -1)
        acc = acc + lane_shift_h(ep1, +1, H - 1)    # (+1, +1)
        return acc

    def store_row(x, acc):
        c = x // chunk_x
        i = x - c * chunk_x
        V_row_ref[pl.ds(i, 1), pl.ds(c, 1)] = acc.astype(cdtype)[None, None]

    def row_group_tiles(g, n_tiles, off0):
        base = pl.multiple_of(g * 8, 8)
        LT24 = LT_ref[pl.ds(base, 24), :]
        GT24 = GT_ref[pl.ds(base, 24), :]
        # Reversed-transpose block covering rows W-1-(8g+j)+[0, D) for the
        # group's tiles; aligned start (interior: W-16-8g, off0=15; last
        # group: 0, off0=7 — W and 8g are multiples of 8 either way).
        rbase = pl.multiple_of((W - (off0 + 1)) - g * 8, 8)
        RTb = RTr_ref[pl.ds(rbase, off0 + 1 + D), :]
        GrTb = GrTr_ref[pl.ds(rbase, off0 + 1 + D), :]
        es = []
        for j in range(-1, n_tiles - 1):
            off = off0 - j  # (W-1-(8g+j)) - rbase
            es.append(
                e_row_one(
                    LT24[j + 8:j + 9, :], GT24[j + 8:j + 9, :],
                    RTb[off:off + D, :], GrTb[off:off + D, :],
                )
            )
        return es

    def row_group(g, _):
        es = row_group_tiles(g, 10, 15)  # columns 8g-1 .. 8g+8
        for j in range(8):
            store_row(g * 8 + j, stencil_h(es[j], es[j + 1], es[j + 2]))
        return 0

    jax.lax.fori_loop(0, W // 8 - 1, row_group, 0)
    # Final group unrolled (static g): its block starts at row 0, and the
    # x = W stencil neighbor clamps to e(W-1) (edge replicate).
    gl_ = W // 8 - 1
    es_last = row_group_tiles(gl_, 9, 7)  # columns 8g-1 .. 8g+7
    es_last.append(es_last[-1])           # e(W) := e(W-1)
    for j in range(8):
        store_row(gl_ * 8 + j, stencil_h(es_last[j], es_last[j + 1], es_last[j + 2]))


@functools.partial(
    jax.jit,
    static_argnames=("D", "alpha", "chunks", "chunks_y", "halo", "pr",
                     "bf16", "interpret"),
)
def pallas_build_volumes(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    gl: jnp.ndarray,
    gr: jnp.ndarray,
    *,
    D: int,
    alpha: float,
    chunks: int,
    chunks_y,
    halo: int,
    pr: int,
    bf16: bool,
    interpret: bool = False,
):
    """Returns (V_row, V_col) — the exact strip layouts
    ops/pallas/fused_patchmatch's wrapper builds from `cost_volume`'s C,
    without C or any build intermediate ever touching HBM."""
    H, W = iml.shape
    g = fused_geometry(H, W, D, chunks, chunks_y, halo, pr)
    cdtype = jnp.bfloat16 if bf16 else jnp.float32
    f32 = jnp.float32

    if H % 8 or W % 8:
        raise ValueError(
            f"pallas_build_volumes needs H, W multiples of 8 (got {H}x{W}) "
            "— group-of-8 aligned block addressing"
        )
    iml = iml.astype(f32)
    imr = imr.astype(f32)
    gl = gl.astype(f32)
    gr = gr.astype(f32)

    def row_pad(a):  # 8 replicate rows on top, 16 below (aligned blocks)
        return jnp.concatenate(
            [jnp.broadcast_to(a[0:1], (8,) + a.shape[1:]), a,
             jnp.broadcast_to(a[-1:], (16,) + a.shape[1:])], axis=0
        )

    WDP = W + D + (-(W + D)) % 128

    def left_pad(a):  # replicate columns: bakes the x<d clamp into data,
        # padded to a 128-multiple lane width (layout-legal shears)
        return jnp.concatenate(
            [jnp.broadcast_to(a[:, 0:1], (a.shape[0], WDP - W)), a], axis=1
        )

    L_p, G_p = row_pad(iml), row_pad(gl)
    R_p, Gr_p = row_pad(left_pad(imr)), row_pad(left_pad(gr))
    LT = row_pad(jnp.transpose(iml))
    GT = row_pad(jnp.transpose(gl))

    def rev_pad(imT):
        # (W, H) -> (W + D + 7, H): row r = imT[W-1-r]; rows >= W-1 all
        # equal imT[0] (the x<d / x>=W clamp content), incl. 8 slack rows
        # for the aligned 16+D block reads.
        rev = imT[::-1]
        return jnp.concatenate(
            [rev, jnp.broadcast_to(imT[0:1], (D + 7, H))], axis=0
        )

    RTr = rev_pad(jnp.transpose(imr))
    GrTr = rev_pad(jnp.transpose(gr))

    n_bits = max(1, int(np.ceil(np.log2(max(D, 2)))))
    dd = np.arange(D, dtype=np.int64)
    WDP_ = W + D + (-(W + D)) % 128
    dbit = np.stack(
        [np.broadcast_to((((dd >> b) & 1)[:, None]).astype(np.float32), (D, WDP_))
         for b in range(n_bits)]
    )
    colmap = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :], (D, W)).copy()
    lanemap_h = np.broadcast_to(np.arange(H, dtype=np.float32)[None, :], (D, H)).copy()

    kernel = functools.partial(
        _build_kernel, H=H, W=W, D=D, chunk_x=g.chunk_x, chunk_y=g.chunk_y,
        alpha=float(alpha), n_bits=n_bits,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    V_row, V_col = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(11)],
        out_specs=[vspec(), vspec()],
        out_shape=[
            jax.ShapeDtypeStruct((g.chunk_x, g.chunks_x, D, H), cdtype),
            jax.ShapeDtypeStruct((g.chunk_y, g.chunks_y, D, W), cdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(dbit), jnp.asarray(colmap), jnp.asarray(lanemap_h),
        L_p, G_p, R_p, Gr_p, LT, GT, RTr, GrTr,
    )
    return V_row, V_col
