"""Fused matching-cost volume as a Pallas TPU kernel.

Computes the reference X-stencil cost (patchmatch_gpu.cu L1GradientCost3x3 at
integer disparities) for all D planes with the two source images pinned in
VMEM — Sobel gradients are computed in-kernel (static shifts), halving input
buffers and HBM input traffic vs shipping precomputed gradient images. The
grid tiles the ROW axis; each program emits an (ROWS_PER_STEP, W, D) block
with the disparity axis complete on the lanes — the (H, W, D)
disparity-minor layout the propagation/SGM scans consume, written once
(minimum possible HBM traffic). The D shifts of the left-padded right image
are unrolled at trace time, and the images are edge-padded on the host, so
every read is a static in-bounds VMEM slice.

Falls back to interpret mode off-TPU (tests run on CPU); callers should gate
on `pallas_supported` for the VMEM plan.

MOSAIC WORKAROUND (jax 0.9.0): the per-plane ``out_ref[:, :, d] = acc``
store trips an internal Mosaic error when ``acc`` carries an OFFSET vector
layout from the strided stencil slices (tpu.reshape (8,640)->(8,640,1),
in_layout vpad {2,66}). Round-tripping ``acc`` through a VMEM scratch
normalizes the layout to {0,0}, after which the 2D->3D store reshape
compiles and runs on hardware (verified; parity + timing in
tests/test_pallas.py and PERFORMANCE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STENCIL_OFFSETS = ((-1, -1), (-1, 1), (1, -1), (1, 1))  # + center
ROWS_PER_STEP = 8
PAD = 2  # gradient halo (1) + stencil halo (1)


def pallas_supported(H: int, W: int, D: int, vmem_budget: int = 13 << 20) -> bool:
    """Whether the fused kernel's VMEM plan fits (2x input double buffers +
    2x output block at lane padding)."""
    lane = lambda n: ((n + 127) // 128) * 128
    in_bytes = 2 * 2 * (H + 2 * PAD) * lane(W + D + 2 * PAD) * 4
    out_bytes = 2 * ROWS_PER_STEP * W * lane(D) * 4
    return in_bytes + out_bytes <= vmem_budget and H % ROWS_PER_STEP == 0


def _sobel(slab: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude on an interior region of a padded slab.

    Input (R+2k, C+2): output (R+2k-2, C) — consumes the 1-px halo.
    """
    Rr, Cc = slab.shape
    sx = slab[:, 2:] - slab[:, :-2]                      # d/dx smoothless
    sy = slab[2:, :] - slab[:-2, :]
    # Full separable Sobel: smooth [1,2,1] in the orthogonal direction.
    gx = sx[:-2, :] + 2.0 * sx[1:-1, :] + sx[2:, :]
    gy = sy[:, :-2] + 2.0 * sy[:, 1:-1] + sy[:, 2:]
    return jnp.sqrt(gx * gx + gy * gy)


def _cost_kernel(l_ref, r_ref, out_ref, scratch, *, D: int, W: int, alpha: float):
    # Refs are edge-padded by PAD rows and (D+PAD, PAD) columns; block i's
    # image rows live at padded rows y0+PAD .. y0+PAD+R-1.
    i = pl.program_id(0)
    y0 = i * ROWS_PER_STEP
    R = ROWS_PER_STEP
    rows = R + 2 * PAD
    l_slab = l_ref[pl.ds(y0, rows), :]
    r_slab = r_ref[pl.ds(y0, rows), :]
    gl_slab = _sobel(l_slab)   # (R+2, C-2): gradient over stencil-halo region
    gr_slab = _sobel(r_slab)

    # Column bookkeeping: in the padded image, x = 0 sits at column D+PAD.
    # e spans x in [-1, W] (stencil halo) = padded cols D+PAD-1 .. D+PAD+W.
    # After _sobel consumed one column of halo, gradient col 0 == image col 1.
    base = D + PAD - 1
    l_c = l_slab[PAD - 1 : PAD - 1 + R + 2, base : base + W + 2]
    gl_c = gl_slab[:, base - 1 : base - 1 + W + 2]
    for d in range(D):
        r_c = r_slab[PAD - 1 : PAD - 1 + R + 2, base - d : base - d + W + 2]
        gr_c = gr_slab[:, base - 1 - d : base - 1 - d + W + 2]
        e = alpha * jnp.abs(l_c - r_c) + (1.0 - alpha) * jnp.abs(gl_c - gr_c)
        acc = e[1 : 1 + R, 1 : 1 + W]
        for dy, dx in STENCIL_OFFSETS:
            acc = acc + e[1 + dy : 1 + dy + R, 1 + dx : 1 + dx + W]
        # Store per plane: keeping all D planes live for a final stack blows
        # the register allocator (observed 132 MB of spill slots). The
        # scratch round-trip strips acc's offset layout (from the strided
        # stencil slices) — storing it directly trips a Mosaic reshape bug.
        scratch[:, :] = acc
        out_ref[:, :, d] = scratch[:, :]


@functools.partial(jax.jit, static_argnames=("max_disp", "alpha", "interpret"))
def pallas_cost_volume(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    max_disp: int,
    alpha: float = 0.9,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, D) cost volume; parity with stereo.cost.cost_volume
    (borders: x < D and the last column differ only in edge-clamp flavor —
    outside the reference's propagation bounds either way)."""
    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    H, W = iml.shape
    D = max_disp
    # Horizontal: D disparity columns + PAD halo left, PAD halo right;
    # vertical: PAD halo each side. Edge mode == border clamping.
    def prep(im):
        return jnp.pad(im, ((PAD, PAD), (D + PAD, PAD)), mode="edge")

    kernel = functools.partial(_cost_kernel, D=D, W=W, alpha=alpha)
    n_blocks = H // ROWS_PER_STEP
    Hp, Wp = H + 2 * PAD, W + D + 2 * PAD
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(
            (ROWS_PER_STEP, W, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS_PER_STEP, W), jnp.float32)],
        interpret=interpret,
    )(prep(iml), prep(imr))
