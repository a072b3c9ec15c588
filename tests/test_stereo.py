"""Stereo engine tests: synthetic ground truth + numpy-oracle parity.

The reference's stereo tests are visual (imshow); here: (1) the cost volume
must equal the oracle's stencil cost at integer disparities, (2) PatchMatch
propagation must agree with the faithful numpy oracle, (3) all engines must
recover a known synthetic disparity field to <1 px median error — the
BASELINE.json acceptance metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.stereo import (
    PatchMatchParams,
    SgmParams,
    cost_volume,
    estimate_disparity,
    patchmatch_disparity,
    sgm_disparity,
)
from ocean_perception_tpu.stereo import oracle
from ocean_perception_tpu.stereo.api import wta_disparity
from ocean_perception_tpu.stereo.patchmatch import (
    add_foreground_noise,
    mask_background,
    mask_occlusions,
    sparse_wta_seed,
    unit_noise,
)

H, W, D = 64, 96, 24


def make_scene(rng, h=H, w=W, d_fg=12.0, d_bg=3.0):
    """Textured background + foreground rectangle, known disparity field.

    Left image pixel (y, x) matches right pixel (y, x - d(y, x)).
    """
    # Build an extended canvas so shifts stay textured.
    canvas = rng.random((h, w + 40)).astype(np.float32)
    import cv2

    canvas = cv2.GaussianBlur(canvas, (5, 5), 1.0) * 0.8 + 0.1
    fg_tex = rng.random((h, w + 40)).astype(np.float32)
    fg_tex = cv2.GaussianBlur(fg_tex, (3, 3), 0.8) * 0.8 + 0.1

    disp = np.full((h, w), d_bg, np.float32)
    y0, y1, x0, x1 = h // 4, 3 * h // 4, w // 3, 2 * w // 3
    disp[y0:y1, x0:x1] = d_fg

    left = canvas[:, 20 : 20 + w].copy()
    left[y0:y1, x0:x1] = fg_tex[:, 20 : 20 + w][y0:y1, x0:x1]

    # Right: each layer shifts left by its disparity so that
    # right(y, x - d) == left(y, x).
    right = np.empty_like(left)
    xs = np.arange(w)
    for y in range(h):
        right[y] = canvas[y, (20 + xs + int(d_bg)) % canvas.shape[1]]
    xr0 = x0 - int(d_fg)
    xr1 = x1 - int(d_fg)
    for y in range(y0, y1):
        right[y, xr0:xr1] = fg_tex[y, 20 + xs[x0:x1]]
    return left, right, disp


@pytest.fixture(scope="module")
def scene():
    return make_scene(np.random.default_rng(3))


def median_error(disp, truth, valid_mask):
    err = np.abs(np.asarray(disp) - truth)[valid_mask]
    return float(np.median(err))


def interior_mask(disp_np, truth, border=4, d_fg=12):
    """Pixels where the engine reported a value, excluding borders and the
    occluded band to the left of the foreground."""
    h, w = truth.shape
    m = np.zeros_like(truth, bool)
    m[border:-border, border:-border] = True
    m &= disp_np > 0
    return m


def test_cost_volume_matches_oracle_cost(scene):
    left, right, truth = scene
    C = np.asarray(cost_volume(jnp.asarray(left), jnp.asarray(right), D, alpha=0.9))
    gl = oracle.sobel_magnitude(left)
    gr = oracle.sobel_magnitude(right)
    ys, xs = np.mgrid[4 : H - 4 : 7, D + 2 : W - 4 : 9]
    for d in [0, 3, 11, 20]:
        ref = oracle.stencil_cost(
            left, right, gl, gr, ys, xs, (xs - d).astype(np.float32), 0.9
        )
        np.testing.assert_allclose(C[ys, xs, d], ref, atol=1e-3)


def test_wta_recovers_disparity(scene):
    left, right, truth = scene
    r = wta_disparity(jnp.asarray(left), jnp.asarray(right), max_disp=D)
    m = interior_mask(np.asarray(r.left), truth)
    assert m.mean() > 0.3
    assert median_error(r.left, truth, m) < 1.0


def test_sgm_recovers_disparity(scene):
    left, right, truth = scene
    r = sgm_disparity(jnp.asarray(left), jnp.asarray(right), SgmParams(max_disp=D))
    m = interior_mask(np.asarray(r.left), truth)
    assert m.mean() > 0.5
    med = median_error(r.left, truth, m)
    assert med < 0.75
    # SGM should give near-total valid coverage on this textured scene.
    frac_accurate = (np.abs(np.asarray(r.left) - truth)[m] < 1.0).mean()
    assert frac_accurate > 0.9


def test_patchmatch_recovers_disparity(scene):
    left, right, truth = scene
    p = PatchMatchParams(max_disp=D, chunks=4, improve_factor=0.95)
    r = patchmatch_disparity(jnp.asarray(left), jnp.asarray(right), p)
    m = interior_mask(np.asarray(r.left), truth)
    assert m.mean() > 0.3
    assert median_error(r.left, truth, m) < 1.0


def test_patchmatch_matches_oracle(scene):
    """The TPU propagation must agree with the faithful numpy re-derivation
    of the CUDA algorithm (same seeds, same fixed noise, same strip layout).
    Quantization (integer cost lookups) bounds the difference."""
    left, right, truth = scene
    p = PatchMatchParams(
        max_disp=D, chunks=4, iters=2, subpixel=False, improve_factor=0.8
    )
    # Shared integer seed: confident WTA splat (computed once, used by both).
    C = cost_volume(jnp.asarray(left), jnp.asarray(right), D, p.alpha)
    seed = np.asarray(sparse_wta_seed(C, p)).astype(np.float32)
    noise = np.asarray(unit_noise((H, W), p.noise_seed))

    ours = np.asarray(
        patchmatch_disparity(
            jnp.asarray(left), jnp.asarray(right), p, seed_left=jnp.asarray(seed)
        ).left_raw
    )
    ref = oracle.patchmatch_oracle(
        left, right, seed, iters=2, alpha=p.alpha, improve_factor=0.8, noise=noise
    )
    both_valid = (ours > 0) & (ref > 0)
    assert both_valid.mean() > 0.2
    med = float(np.median(np.abs(ours - ref)[both_valid]))
    assert med < 1.0
    # Valid/background masks must largely agree.
    agree = ((ours > 0) == (ref > 0)).mean()
    assert agree > 0.8


def test_patchmatch_scan_unroll_identical(scene):
    """scan_unroll only changes loop fusion, never the sequential math —
    results must be bit-identical to unroll=1."""
    left, right, _ = scene
    base = PatchMatchParams(max_disp=D, chunks=4, iters=2)
    r1 = patchmatch_disparity(jnp.asarray(left), jnp.asarray(right), base)
    r5 = patchmatch_disparity(
        jnp.asarray(left), jnp.asarray(right), base.replace(scan_unroll=5)
    )
    np.testing.assert_array_equal(np.asarray(r1.left), np.asarray(r5.left))
    np.testing.assert_array_equal(np.asarray(r1.right), np.asarray(r5.right))
    # 0 = full unroll (the production operating point).
    r0 = patchmatch_disparity(
        jnp.asarray(left), jnp.asarray(right), base.replace(scan_unroll=0)
    )
    np.testing.assert_array_equal(np.asarray(r1.left), np.asarray(r0.left))


def test_right_wta_from_left_matches_materialized(scene):
    """The fused running-min right WTA must equal argmin over the
    materialized right volume, including tie-breaking and edge clamps."""
    from ocean_perception_tpu.stereo.cost import right_cost_volume_from_left
    from ocean_perception_tpu.stereo.patchmatch import right_wta_from_left

    left, right, _ = scene
    p = PatchMatchParams(max_disp=D)
    C = cost_volume(jnp.asarray(left), jnp.asarray(right), D, p.alpha)
    C_r = right_cost_volume_from_left(C)
    wta = jnp.argmin(C_r, axis=-1).astype(jnp.float32)
    ref = jnp.where(jnp.min(C_r, axis=-1) < p.improve_factor * C_r[..., 0], wta, 0.0)
    fused = right_wta_from_left(C, p)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_add_foreground_noise_semantics():
    disp = jnp.asarray(np.array([[0.0, 5.0], [2.0, 0.0]], np.float32))
    noise = jnp.asarray(np.array([[0.5, -0.25], [-10.0, 0.9]], np.float32))
    out = np.asarray(add_foreground_noise(disp, noise, 4.0))
    np.testing.assert_allclose(out, [[0.0, 4.0], [0.0, 0.0]])


def test_mask_occlusions_ratio():
    p = PatchMatchParams(max_disp=16)
    displ = jnp.full((8, 16), 4.0)
    # Right map consistent -> kept.
    kept = np.asarray(mask_occlusions(displ, jnp.full((8, 16), 4.0), p))
    assert (kept == 4.0).all()
    # Right map wildly different -> zeroed.
    zeroed = np.asarray(mask_occlusions(displ, jnp.full((8, 16), 10.0), p))
    assert (zeroed == 0.0).all()


def test_estimate_disparity_api(scene):
    left, right, truth = scene
    for engine in ["wta", "sgm", "patchmatch"]:
        r = estimate_disparity(jnp.asarray(left), jnp.asarray(right), engine=engine, max_disp=D)
        assert r.left.shape == (H, W)
        assert np.isfinite(np.asarray(r.left)).all()


def test_sgm_jit_and_batch(scene):
    left, right, truth = scene
    f = jax.jit(lambda l, r: sgm_disparity(l, r, SgmParams(max_disp=D)).left)
    out1 = f(jnp.asarray(left), jnp.asarray(right))
    out2 = f(jnp.asarray(left), jnp.asarray(right))
    np.testing.assert_allclose(out1, out2)
    batched = jax.vmap(lambda l, r: sgm_disparity(l, r, SgmParams(max_disp=D)).left)(
        jnp.stack([jnp.asarray(left)] * 2), jnp.stack([jnp.asarray(right)] * 2)
    )
    assert batched.shape == (2, H, W)


def test_zncc_cost_engine(scene):
    """ZNCC cost (the CPU PatchMatch's test functor) also recovers disparity."""
    from ocean_perception_tpu.stereo.cost import cost_volume_zncc

    left, right, truth = scene
    C = np.asarray(cost_volume_zncc(jnp.asarray(left), jnp.asarray(right), D, 5))
    assert C.shape == (H, W, D)
    assert C.min() >= -1e-5 and C.max() <= 2.0 + 1e-5
    p = PatchMatchParams(max_disp=D, chunks=4, cost="zncc", improve_factor=0.95)
    r = patchmatch_disparity(jnp.asarray(left), jnp.asarray(right), p)
    m = interior_mask(np.asarray(r.left), truth)
    assert m.mean() > 0.25
    assert median_error(r.left, truth, m) < 1.0
