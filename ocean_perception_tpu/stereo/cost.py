"""Matching-cost volume over integer disparities — the shared substrate.

Reference parity: the per-pixel cost is exactly patchmatch_gpu.cu
L1GradientCost3x3 (X-shaped 3x3 stencil: 4 corners + center;
alpha·|I_l - I_r| + (1-alpha)·|G_l - G_r|), evaluated at integer disparities.
At integer d the bilinear GetSubpixel degenerates to a plain shift, so the
whole volume is D static rolls + elementwise work + a 5-tap stencil sum —
pure VPU streams, no gathers. This is the TPU-first reformulation that turns
the CUDA kernel's per-thread scalar loops into dense lane-parallel math.

Layout: (H, W, D) float32 — disparity-MINOR. The propagation/SGM scans and
every per-pixel disparity lookup want (…, D) slabs; keeping D on the lane
axis means no major-axis relayouts (a (D,H,W)→(…,D) transpose on TPU is a
full re-tiling copy and dominated the pipeline before this layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.image import gradient_magnitude

STENCIL = ((-1, -1), (-1, 1), (0, 0), (1, -1), (1, 1))


def _shift_right_image(im: jnp.ndarray, d: int) -> jnp.ndarray:
    """R(y, x-d) with border clamp (matches GetSubpixel's edge clamping)."""
    if d == 0:
        return im
    shifted = jnp.roll(im, d, axis=1)
    # Columns x < d would wrap; clamp to column 0 (the reference's
    # fmaxf(x - d, patch_radius) keeps reads in-image).
    edge = im[:, 0:1]
    col = jnp.arange(im.shape[1])[None, :]
    return jnp.where(col < d, edge, shifted)


def _stencil_sum(e: jnp.ndarray) -> jnp.ndarray:
    """5-tap X-stencil sum with edge-clamped shifts (H, W) → (H, W)."""
    H, W = e.shape
    padded = jnp.pad(e, ((1, 1), (1, 1)), mode="edge")
    acc = e  # (0, 0) tap
    for dy, dx in STENCIL:
        if dy == 0 and dx == 0:
            continue
        acc = acc + padded[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
    return acc


def cost_volume(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    max_disp: int,
    alpha: float = 0.9,
    gl: jnp.ndarray | None = None,
    gr: jnp.ndarray | None = None,
    use_pallas: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(H, W, D) cost volume, D = max_disp, reference X-stencil cost.

    ``use_pallas=True`` routes to the fused VMEM-resident Pallas kernel
    (ops/pallas/cost_volume.py) when the images fit its VMEM plan; border
    columns x < d use edge-padding there (vs edge-select here) — identical on
    the interior.
    """
    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    if use_pallas:
        from ..ops.pallas.cost_volume import pallas_cost_volume, pallas_supported

        if pallas_supported(iml.shape[0], iml.shape[1], max_disp):
            import jax

            interpret = jax.default_backend() not in ("tpu",)
            return pallas_cost_volume(iml, imr, max_disp, alpha, interpret=interpret)
    if gl is None:
        gl = gradient_magnitude(iml)
    if gr is None:
        gr = gradient_magnitude(imr)

    def plane(d: int) -> jnp.ndarray:
        rd = _shift_right_image(imr, d)
        gd = _shift_right_image(gr, d)
        e = alpha * jnp.abs(iml - rd) + (1.0 - alpha) * jnp.abs(gl - gd)
        return _stencil_sum(e).astype(dtype)

    # dtype=bfloat16 halves the volume's HBM traffic (the pipeline's largest
    # stream); costs are O(1) magnitudes so ~0.4% relative error only flips
    # already-ambiguous argmin ties.
    return jnp.stack([plane(d) for d in range(max_disp)], axis=-1)


def cost_volume_zncc(
    iml: jnp.ndarray,
    imr: jnp.ndarray,
    max_disp: int,
    patch_size: int = 5,
) -> jnp.ndarray:
    """(H, W, D) volume with cost = 1 - ZNCC over a patch.

    Parity: the reference CPU PatchMatch takes caller-supplied cost functors
    and its tests use ZNCC (patchmatch.cpp:79-99, patchmatch_test.cpp).
    Computed densely with box-filtered means/variances + shifted
    cross-correlations — separable filters and static rolls only.
    """
    from ..ops.image import box_filter

    iml = jnp.asarray(iml, jnp.float32)
    imr = jnp.asarray(imr, jnp.float32)
    r = patch_size // 2
    mu_l = box_filter(iml, r)
    var_l = jnp.maximum(box_filter(iml * iml, r) - mu_l * mu_l, 1e-8)

    def plane(d: int) -> jnp.ndarray:
        rd = _shift_right_image(imr, d)
        mu_r = box_filter(rd, r)
        var_r = jnp.maximum(box_filter(rd * rd, r) - mu_r * mu_r, 1e-8)
        cross = box_filter(iml * rd, r) - mu_l * mu_r
        zncc = cross / jnp.sqrt(var_l * var_r)
        return 1.0 - jnp.clip(zncc, -1.0, 1.0)

    return jnp.stack([plane(d) for d in range(max_disp)], axis=-1)


def right_cost_volume_from_left(C: jnp.ndarray) -> jnp.ndarray:
    """Derive the right-image cost volume: C_R(y, x, d) = C_L(y, x+d, d).

    Standard cost-volume reuse — avoids recomputing matching costs for the
    right disparity map (the reference instead reruns its whole pipeline on
    horizontally flipped images; this is the cheap TPU equivalent).
    """
    D = C.shape[-1]
    W = C.shape[1]
    col = jnp.arange(W)[None, :]

    def plane(d: int) -> jnp.ndarray:
        Cd = C[..., d]
        shifted = jnp.roll(Cd, -d, axis=1)
        if d == 0:
            return shifted
        edge = Cd[:, -1:]
        return jnp.where(col >= W - d, edge, shifted)

    return jnp.stack([plane(d) for d in range(D)], axis=-1)


def cost_of_disparity(C: jnp.ndarray, disp_int: jnp.ndarray) -> jnp.ndarray:
    """Cost at a given integer disparity per pixel: (H, W) lookup into (H, W, D).

    One-hot contraction along D (comparisons + multiply-reduce), not a gather
    — the trick that makes per-pixel disparity-dependent lookups lane-parallel
    on the VPU.
    """
    D = C.shape[-1]
    d_ids = jnp.arange(D, dtype=disp_int.dtype)
    onehot = (disp_int[..., None] == d_ids).astype(C.dtype)
    return jnp.sum(C * onehot, axis=-1)


def sample_at_disparity(values: jnp.ndarray, disp_int: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """values[y, x - d(y,x)] without gathers: D static rolls + one-hot select.

    TPU gathers over (H, W) are an order of magnitude slower than D
    lane-parallel rolls; disparities are bounded by max_disp so the shift
    basis is small. Used by the L/R occlusion checks.
    """
    H, W = values.shape
    out = jnp.zeros_like(values)
    col = jnp.arange(W)[None, :]
    for s in range(max_disp):
        shifted = jnp.roll(values, s, axis=1)
        # Columns x < s would wrap; clamp to column 0's value.
        shifted = jnp.where(col < s, values[:, 0:1], shifted)
        out = out + jnp.where(disp_int == s, shifted, 0.0)
    return out


def subpixel_refine(C: jnp.ndarray, disp_int: jnp.ndarray) -> jnp.ndarray:
    """Parabola fit on (C[d-1], C[d], C[d+1]) → float disparity.

    Quality improvement over the reference (whose output precision is set by
    seed/noise values); pairs with integer-disparity engines.
    """
    D = C.shape[-1]
    # Parabola arithmetic in f32 even for bf16 volumes (the denominator is a
    # small difference of costs).
    c0 = cost_of_disparity(C, jnp.clip(disp_int - 1, 0, D - 1)).astype(jnp.float32)
    c1 = cost_of_disparity(C, disp_int).astype(jnp.float32)
    c2 = cost_of_disparity(C, jnp.clip(disp_int + 1, 0, D - 1)).astype(jnp.float32)
    denom = c0 - 2.0 * c1 + c2
    offset = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    # Only refine interior disparities.
    interior = (disp_int > 0) & (disp_int < D - 1)
    return disp_int.astype(jnp.float32) + jnp.where(interior, offset, 0.0)
