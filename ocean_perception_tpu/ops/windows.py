"""Batched per-point window extraction as MXU one-hot contractions.

TPU gathers scalarize badly: K vmapped ``lax.dynamic_slice`` calls cost
~0.5-1.5 us/window on v5e (rig-load dependent), and the LK tracker pulls
~3200 windows per camera per frame (template + slack window x 4 levels x 2
directions x K=200) — measured as the dominant, mode-independent cost of the
fleet tracking step (docs/PERFORMANCE.md "lk-mode ablation"). The same
extraction as two 0/1-weight contractions rides the MXU at ~0.23 us/window
and is EXACT: every output element is 1*value + sum-of-0s, so results are
bit-identical to the sliced path (locked by
tests/test_tracking.py::test_lk_batched_windows_bit_identical).

``examples/profile_window_gather.py`` holds the measured A/B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_windows(
    img: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    size: int,
    src: jnp.ndarray | None = None,
    size_x: int | None = None,
) -> jnp.ndarray:
    """Extract K (size, size_x or size) windows at integer origins (y0, x0).

    ``img`` is (H, W), or a (R, H, W) ring with ``src`` (K,) selecting each
    point's source frame (k-ago re-tracking): the ring axis folds into the
    row one-hot, so the selection costs R x the row MACs and no gather.
    Origins must be pre-clipped to [0, H - size] / [0, W - size] (the LK
    callers already clip); values land exactly (0/1 f32 weights at
    Precision.HIGHEST — TPU DEFAULT would truncate the image operand to
    bf16 in the product, same trap as the pyr_down/fused-patchmatch
    selection matmuls).
    """
    hi = jax.lax.Precision.HIGHEST
    size_x = size if size_x is None else size_x
    y0 = jnp.asarray(y0, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)
    ia = jnp.arange(size, dtype=jnp.int32)
    ib = jnp.arange(size_x, dtype=jnp.int32)
    H, W = img.shape[-2], img.shape[-1]

    rows = y0[:, None] + ia[None, :]                       # (K, size)
    if img.ndim == 3:
        if src is None:
            raise ValueError("ring image requires src indices")
        rows = jnp.asarray(src, jnp.int32)[:, None] * H + rows
        flat = img.reshape(img.shape[0] * H, W)
        nrows = img.shape[0] * H
    else:
        flat = img
        nrows = H
    ih = jnp.arange(nrows, dtype=jnp.int32)
    R = (rows[..., None] == ih).astype(img.dtype)          # (K, size, nrows)
    strip = jnp.einsum("kah,hw->kaw", R, flat, precision=hi)   # MXU row select

    cols = x0[:, None] + ib[None, :]                       # (K, size_x)
    iw = jnp.arange(W, dtype=jnp.int32)
    C = (cols[..., None] == iw).astype(img.dtype)          # (K, size_x, W)
    return jnp.einsum("kaw,kbw->kab", strip, C, precision=hi)  # (K, size, size_x)
