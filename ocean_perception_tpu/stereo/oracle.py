"""Numpy oracle: faithful re-derivation of the CUDA PatchMatch algorithm.

This module re-implements — from the algorithm description, in scalar numpy —
the semantics of the reference patchmatch_gpu.cu (SURVEY.md §A.2) so the TPU
kernels can be tested against known-correct behavior:

- X-shaped 3x3 cost stencil (corners + center), alpha·|I| + (1-alpha)·|G|,
  bilinear subpixel sampling on the right image, clamped at borders.
- Sequential propagation scans over row/col chunks (16 strips, ±5 px halo),
  adopting the predecessor's disparity when cost improves, adopted value
  clipped to min(d, x - patch_radius).
- Iteration schedule: foreground noise scale 32/2^iter from a fixed
  pre-generated uniform noise image, then R+ C+ R- C- passes.
- MaskBackground: keep d only if cost(d) < improve_factor · cost(0).
- MaskOcclusions: zero where dr > 1.4·dl or dr < 0.7·dl, dr sampled at x-dl.

It is deliberately slow (python loops over strips, vectorized inner math) and
is only imported by tests. Not part of the compute path.
"""

from __future__ import annotations

import numpy as np

STENCIL = [(-1, -1), (-1, 1), (0, 0), (1, -1), (1, 1)]


def sobel_magnitude(im: np.ndarray) -> np.ndarray:
    import cv2

    gx = cv2.Sobel(im, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(im, cv2.CV_32F, 0, 1, ksize=3)
    return np.sqrt(gx * gx + gy * gy)


def _subpixel(im: np.ndarray, y: np.ndarray, x: np.ndarray) -> np.ndarray:
    H, W = im.shape
    y = np.clip(y, 0.0, H - 1.0)
    x = np.clip(x, 0.0, W - 1.0)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    ty = y - y0
    tx = x - x0
    c0 = (1 - ty) * im[y0, x0] + ty * im[y1, x0]
    c1 = (1 - ty) * im[y0, x1] + ty * im[y1, x1]
    return (1 - tx) * c0 + tx * c1


def stencil_cost(iml, imr, gl, gr, y, x, xr, alpha):
    """Vectorized over arrays of (y, x, xr). y/x integer arrays, xr float."""
    total = np.zeros(np.broadcast(y, x).shape, np.float32)
    for dy, dx in STENCIL:
        li = iml[np.clip(y + dy, 0, iml.shape[0] - 1), np.clip(x + dx, 0, iml.shape[1] - 1)]
        gi = gl[np.clip(y + dy, 0, iml.shape[0] - 1), np.clip(x + dx, 0, iml.shape[1] - 1)]
        ri = _subpixel(imr, (y + dy).astype(np.float32), xr + dx)
        gri = _subpixel(gr, (y + dy).astype(np.float32), xr + dx)
        total += alpha * np.abs(li - ri) + (1 - alpha) * np.abs(gi - gri)
    return total


def propagate_row(iml, imr, gl, gr, disp, direction, alpha, chunks=16, halo=5, patch_radius=1):
    H, W = iml.shape
    chunk = W // chunks
    ys = np.arange(patch_radius, H - patch_radius)
    for c in range(chunks):
        lo = max(c * chunk - halo, patch_radius)
        hi = min((c + 1) * chunk + halo, W - patch_radius - 1)
        if lo >= W:
            continue
        cols = range(lo, hi) if direction > 0 else range(hi, lo, -1)
        for col in cols:
            x = np.float32(col)
            d0 = disp[ys, col]
            d1 = disp[ys, col - direction]
            c0 = stencil_cost(iml, imr, gl, gr, ys, np.full_like(ys, col), np.maximum(x - d0, patch_radius), alpha)
            c1 = stencil_cost(iml, imr, gl, gr, ys, np.full_like(ys, col), np.maximum(x - d1, patch_radius), alpha)
            better = c1 < c0
            disp[ys[better], col] = np.minimum(d1[better], x - patch_radius)
    return disp


def propagate_col(iml, imr, gl, gr, disp, direction, alpha, chunks=16, halo=5, patch_radius=1):
    H, W = iml.shape
    chunk = H // chunks
    xs = np.arange(patch_radius, W - patch_radius)
    for c in range(chunks):
        lo = max(c * chunk - halo, patch_radius)
        hi = min((c + 1) * chunk + halo, H - patch_radius - 1)
        if lo >= H:
            continue
        rows = range(lo, hi) if direction > 0 else range(hi, lo, -1)
        for row in rows:
            d0 = disp[row, xs]
            d1 = disp[row - direction, xs]
            xf = xs.astype(np.float32)
            c0 = stencil_cost(iml, imr, gl, gr, np.full_like(xs, row), xs, np.maximum(xf - d0, patch_radius), alpha)
            c1 = stencil_cost(iml, imr, gl, gr, np.full_like(xs, row), xs, np.maximum(xf - d1, patch_radius), alpha)
            better = c1 < c0
            disp[row, xs[better]] = np.minimum(d1[better], xf[better] - patch_radius)
    return disp


def add_foreground_noise(disp, unit_noise, scale):
    mask = (disp > 0).astype(np.float32)
    disp = disp + unit_noise * scale
    disp *= mask
    return np.maximum(disp, 0.0)


def mask_background(iml, imr, gl, gr, disp, alpha, improve_factor, patch_radius=1):
    H, W = iml.shape
    yy, xx = np.mgrid[patch_radius : H - patch_radius, patch_radius : W - patch_radius]
    d = disp[yy, xx]
    xf = xx.astype(np.float32)
    c0 = stencil_cost(iml, imr, gl, gr, yy, xx, xf, alpha)
    c1 = stencil_cost(iml, imr, gl, gr, yy, xx, np.maximum(xf - d, patch_radius), alpha)
    keep = c1 < improve_factor * c0
    out = disp.copy()
    region = out[patch_radius : H - patch_radius, patch_radius : W - patch_radius]
    region[~keep] = 0.0
    return out


def mask_occlusions(displ, dispr):
    H, W = displ.shape
    yy, xx = np.mgrid[0:H, 0:W]
    dl = displ[yy, xx]
    xr = np.maximum(xx - dl, 0).astype(np.int64)
    xr = np.minimum(xr, W - 1)
    dr = dispr[yy, xr]
    occluded = (dr > 1.4 * dl) | (dr < 0.7 * dl)
    out = displ.copy()
    out[occluded] = 0.0
    return out


def unit_noise_image(shape, seed=123):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)


def patchmatch_oracle(
    iml: np.ndarray,
    imr: np.ndarray,
    seed_disp: np.ndarray,
    iters: int = 3,
    alpha: float = 0.9,
    improve_factor: float = 0.8,
    noise: np.ndarray | None = None,
) -> np.ndarray:
    """One-direction PatchMatch (the inner Match() of the reference)."""
    iml = iml.astype(np.float32)
    imr = imr.astype(np.float32)
    gl = sobel_magnitude(iml)
    gr = sobel_magnitude(imr)
    disp = seed_disp.astype(np.float32).copy()
    if noise is None:
        noise = unit_noise_image(iml.shape)
    for it in range(iters):
        disp = add_foreground_noise(disp, noise, 32.0 / 2.0**it)
        disp = propagate_row(iml, imr, gl, gr, disp, +1, alpha)
        disp = propagate_col(iml, imr, gl, gr, disp, +1, alpha)
        disp = propagate_row(iml, imr, gl, gr, disp, -1, alpha)
        disp = propagate_col(iml, imr, gl, gr, disp, -1, alpha)
    return mask_background(iml, imr, gl, gr, disp, alpha, improve_factor)
