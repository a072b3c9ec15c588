"""Fused PatchMatch propagation pass as a Pallas TPU kernel.

Replaces the XLA `lax.scan` in stereo.patchmatch._propagate: one directional
pass scans the ~w strip positions; each step adopts the predecessor's
disparity where its cost (a one-hot contraction over the D planes of that
position's volume columns) improves on the stored cost
(patchmatch_gpu.cu:116-230 semantics — identical to the XLA path).

TPU mapping:
- grid = the w scan positions. TPU grid steps run SEQUENTIALLY on a core, so
  the propagation front (the previous position's disparity) lives in a VMEM
  scratch that persists across steps — the carry never round-trips HBM.
- per step the pipeline DMAs one (chunks, N, D) volume slab into VMEM
  (double-buffered automatically); the compare/select runs on the VPU.
- direction -1 is the same kernel with a reversed positional index_map — no
  flipped copy of the volume slices (the XLA path materializes Cc[::-1]).
- the scan position comes from iota + program_id with static strip geometry;
  the CUDA loop-bound validity x interior lane mask is streamed as a small
  precomputed f32 +inf penalty (Mosaic mis-lays-out replicated boolean
  iota-compares — "invalid relayout ... i1" — so the kernel keeps exactly
  one boolean: the final full-shape f32 cost compare).

Parity: bit-identical to stereo.patchmatch._propagate's scan step (same
one-hot lookup, same clamp, same masks; bf16 costs compared after an exact
f32 upcast — the VPU has no bf16 vector compare), tested in
tests/test_pallas.py.

MEASURED ON HARDWARE (docs/PERFORMANCE.md): 16.6 ms/frame vs 4.1 for the
fully-unrolled XLA path at the production point — ~500 tiny grid steps per
frame are pipeline-latency-bound. Kept opt-in (`use_pallas_propagate`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prop_kernel(
    Cc_ref,       # (1, chunks, N, D) this position's volume columns
    vals_d_ref,   # (1, chunks, N) stored disparity at this position
    vals_c_ref,   # (1, chunks, N) stored cost at this position
    pen_ref,      # (1, chunks, N) additive validity penalty (0 | +inf)
    carry0_ref,   # (chunks, N) initial front disparity
    out_d_ref,    # (1, chunks, N)
    out_c_ref,    # (1, chunks, N)
    carry_scr,    # VMEM scratch (chunks, N): front disparity, persists
    *,
    w: int,
    D: int,
    chunk: int,
    halo: int,
    patch_radius: int,
    forward: bool,
    axis: int,           # 1 = rows pass (epipolar x == scan position),
                         # 0 = cols pass (epipolar x == lane index)
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        carry_scr[:, :] = carry0_ref[:, :]

    jj = j if forward else w - 1 - j
    carry_d = carry_scr[:, :]                     # (chunks, N)
    Cj = Cc_ref[0]                                # (chunks, N, D)
    cur_d = vals_d_ref[0]
    cur_c = vals_c_ref[0]
    chunks, N = cur_d.shape
    pr = patch_radius

    # Epipolar coordinate of each element (f32 arithmetic only — Mosaic
    # mis-lays-out replicated i1 iota-compares, so every boolean except the
    # final full-shape cost compare is precomputed host-side as the
    # streamed additive penalty pen_ref).
    if axis == 1:
        # tpu.iota must be integer-typed; cast after.
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, N), 0).astype(jnp.float32)
        x = c_ids * float(chunk) - float(halo) + jnp.asarray(jj, jnp.float32)
        x = jnp.clip(x, 0.0, None)  # layout clips scan positions at 0
    else:
        x = jax.lax.broadcasted_iota(jnp.int32, (chunks, N), 1).astype(jnp.float32)

    # Candidate cost at the clamped carried disparity: one-hot over D.
    d_eff = jnp.minimum(carry_d, x - float(pr))
    idx = jnp.clip(jnp.round(d_eff), 0, D - 1).astype(jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, N, D), 2)
    idx3 = idx[:, :, None] + jnp.zeros_like(ids)
    onehot = (idx3 == ids).astype(Cj.dtype)
    cost_cand = jnp.sum(Cj * onehot, axis=-1).astype(cur_c.dtype)
    # Compare in f32 (the VPU has no bf16 vector compare; f32 upcasts of
    # bf16 values preserve ordering exactly, so parity holds) with the +inf
    # penalty rejecting positions outside the CUDA loop bounds / interior
    # lane band.
    cand_f = cost_cand.astype(jnp.float32) + pen_ref[0]
    better = cand_f < cur_c.astype(jnp.float32)   # (chunks, N), non-replicated
    new_d = jnp.where(better, jnp.minimum(carry_d, x - float(pr)), cur_d)
    new_c = jnp.where(better, cost_cand, cur_c)

    out_d_ref[0] = new_d
    out_c_ref[0] = new_c
    carry_scr[:, :] = new_d


@functools.partial(
    jax.jit,
    static_argnames=(
        "direction", "axis", "dim", "chunk", "halo", "patch_radius", "interpret"
    ),
)
def pallas_propagate_pass(
    Cc: jnp.ndarray,        # (w, chunks, N, D) overlapped volume slices
    vals_d: jnp.ndarray,    # (w, chunks, N)
    vals_c: jnp.ndarray,    # (w, chunks, N)
    carry_d0: jnp.ndarray,  # (chunks, N)
    direction: int,
    axis: int,
    dim: int,
    chunk: int,
    halo: int,
    patch_radius: int,
    interpret: bool = False,
):
    """One directional propagation pass over the strip layout. Outputs stay
    in FORWARD position order regardless of direction (the scatter-back
    expects it; direction only reverses the traversal)."""
    w, chunks, N, D = Cc.shape
    fwd = direction > 0
    pos4 = (lambda j: (j, 0, 0, 0)) if fwd else (lambda j: (w - 1 - j, 0, 0, 0))
    pos3 = (lambda j: (j, 0, 0)) if fwd else (lambda j: (w - 1 - j, 0, 0))

    # Validity as an additive +inf penalty (position-indexed like the other
    # streamed inputs): CUDA loop bounds per (position, chunk) x interior
    # lane band (stereo.patchmatch._chunk_columns semantics). Computed by
    # XLA so the kernel contains no replicated-boolean layouts.
    jjs = jnp.arange(w)[:, None]
    cs = jnp.arange(chunks)[None, :]
    unclipped = cs * chunk - halo + jjs
    lo = jnp.maximum(cs * chunk - halo, patch_radius)
    hi = jnp.minimum((cs + 1) * chunk + halo, dim - patch_radius - 1)
    ok_pos = (unclipped >= lo) & (unclipped < hi)                  # (w, chunks)
    lane = jnp.arange(N)
    ok_lane = (lane >= patch_radius) & (lane <= N - patch_radius - 1)
    ok = ok_pos[:, :, None] & ok_lane[None, None, :]
    penalty = jnp.where(ok, 0.0, jnp.inf).astype(jnp.float32)

    kernel = functools.partial(
        _prop_kernel,
        w=w, D=D, chunk=chunk, halo=halo,
        patch_radius=patch_radius, forward=fwd, axis=axis,
    )
    out_d, out_c = pl.pallas_call(
        kernel,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, chunks, N, D), pos4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, N), pos3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, N), pos3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, N), pos3, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks, N), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunks, N), pos3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, N), pos3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, chunks, N), vals_d.dtype),
            jax.ShapeDtypeStruct((w, chunks, N), vals_c.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((chunks, N), vals_d.dtype)],
        # The cols pass (chunks=15, N=640, D=64->128-lane pad) makes XLA's
        # conservative scoped-vmem estimate exceed the 16M default even
        # though the live double-buffered working set is ~6M; raise the cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Cc, vals_d, vals_c, penalty, carry_d0)
    return out_d, out_c
