"""Fused matching-cost volume as a Pallas TPU kernel.

Computes the reference X-stencil cost (patchmatch_gpu.cu L1GradientCost3x3 at
integer disparities) for all D planes with the four source images pinned in
VMEM: each grid step d slices the left-padded right image at a dynamic lane
offset (one unaligned VMEM read replaces the XLA version's per-plane
roll+select), fuses the |I|/|grad| terms and the 5-tap stencil in registers,
and writes one (H, W) plane. HBM traffic is exactly one volume write — the
minimum possible — versus the jnp path's materialized intermediate planes.

VMEM budget: 4 images of (H, W+D) f32. At the reference operating point
(640x360 internal, D=64) that is ~4.1 MB — comfortably inside the ~16 MB
budget; full 720p/D=128 inputs exceed VMEM and fall back to the jnp path.

Falls back to interpret mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..image import gradient_magnitude

STENCIL_OFFSETS = ((-1, -1), (-1, 1), (1, -1), (1, 1))  # + center


def pallas_supported(H: int, W: int, D: int, vmem_budget: int = 12 << 20) -> bool:
    """Whether the fused kernel's VMEM plan fits."""
    bytes_needed = 4 * H * (W + D) * 4 + 2 * H * W * 4
    return bytes_needed <= vmem_budget


def _cost_kernel(l_ref, rpad_ref, gl_ref, grpad_ref, out_ref, *, D: int, W: int, alpha: float):
    d = pl.program_id(0)
    start = D - d
    r = rpad_ref[:, pl.ds(start, W)]
    gr = grpad_ref[:, pl.ds(start, W)]
    e = alpha * jnp.abs(l_ref[:] - r) + (1.0 - alpha) * jnp.abs(gl_ref[:] - gr)
    # 5-tap X stencil with edge-clamped shifts.
    H = e.shape[0]
    padded = jnp.pad(e, ((1, 1), (1, 1)), mode="edge")
    acc = e
    for dy, dx in STENCIL_OFFSETS:
        acc = acc + jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (H, W))
    out_ref[:, :, 0] = acc


@functools.partial(jax.jit, static_argnames=("max_disp", "alpha", "interpret"))
def pallas_cost_volume(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    max_disp: int,
    alpha: float = 0.9,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, D) cost volume; parity with stereo.cost.cost_volume."""
    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    H, W = iml.shape
    D = max_disp
    gl = gradient_magnitude(iml)
    gr = gradient_magnitude(imr)
    # Left-pad the right image by D with its edge column so that
    # rpad[:, D-d : D-d+W] == R(y, x-d) clamped at the border.
    rpad = jnp.pad(imr, ((0, 0), (D, 0)), mode="edge")
    grpad = jnp.pad(gr, ((0, 0), (D, 0)), mode="edge")

    kernel = functools.partial(_cost_kernel, D=D, W=W, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((H, W), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W + D), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W + D), lambda d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, 1), lambda d: (0, 0, d), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, D), jnp.float32),
        interpret=interpret,
    )(iml, rpad, gl, grpad)
