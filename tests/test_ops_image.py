import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.ops import (
    bilinear_sample,
    box_filter,
    dilate,
    erode,
    gradient_magnitude,
    masked_percentile_threshold,
    morph_gradient,
    pyr_down,
    resize,
    sample_patches_bilinear,
    sobel_x,
    sobel_y,
)
from ocean_perception_tpu.ops.guided_filter import fast_guided_filter
from ocean_perception_tpu.ops.lm import LMConfig, lm_solve


@pytest.fixture()
def image(rng):
    return rng.random((48, 64)).astype(np.float32)


def test_sobel_matches_opencv(image):
    gx = np.asarray(sobel_x(jnp.asarray(image)))
    gy = np.asarray(sobel_y(jnp.asarray(image)))
    gx_cv = cv2.Sobel(image, cv2.CV_32F, 1, 0, ksize=3)
    gy_cv = cv2.Sobel(image, cv2.CV_32F, 0, 1, ksize=3)
    np.testing.assert_allclose(gx, gx_cv, atol=1e-4)
    np.testing.assert_allclose(gy, gy_cv, atol=1e-4)


def test_gradient_magnitude(image):
    g = np.asarray(gradient_magnitude(jnp.asarray(image)))
    gx = cv2.Sobel(image, cv2.CV_32F, 1, 0, 3)
    gy = cv2.Sobel(image, cv2.CV_32F, 0, 1, 3)
    np.testing.assert_allclose(g, np.sqrt(gx**2 + gy**2), atol=1e-4)


def test_box_filter_matches_opencv(image):
    out = np.asarray(box_filter(jnp.asarray(image), radius=2))
    ref = cv2.boxFilter(image, -1, (5, 5), borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_box_filter_cumsum_path_matches_opencv(image):
    """radius > _BOX_SHIFT_MAX_RADIUS takes the integral (cumsum) path; it
    must agree with cv::boxFilter like the shifted-add path does (slightly
    wider band: the cumsum difference loses ~log2(window-span) bits)."""
    for radius, normalize in [(10, True), (21, True), (10, False)]:
        k = 2 * radius + 1
        out = np.asarray(box_filter(jnp.asarray(image), radius=radius, normalize=normalize))
        ref = cv2.boxFilter(
            image, -1, (k, k), normalize=normalize, borderType=cv2.BORDER_REFLECT_101
        )
        np.testing.assert_allclose(out, ref, atol=5e-4 * (1 if normalize else k * k))


def test_box_filter_cumsum_radius_exceeds_image(image):
    """The guided filter runs r_small≈107 on a (90, 160) subsampled plane —
    the pad is wider than the image. The cumsum path must keep supporting
    that (multi-reflection), matching a brute-force numpy window mean."""
    r = image.shape[0] + 5  # 53 > 48 rows
    out = np.asarray(box_filter(jnp.asarray(image), radius=r))
    # numpy oracle: reflect-101 multi-reflection pad + exact window mean
    padded = np.pad(image, r, mode="reflect")
    k = 2 * r + 1
    ref = np.zeros_like(image)
    for i in range(image.shape[0]):
        for j in range(image.shape[1]):
            ref[i, j] = padded[i : i + k, j : j + k].mean()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_morphology_matches_opencv(image):
    k = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    np.testing.assert_allclose(
        np.asarray(dilate(jnp.asarray(image), 5)), cv2.dilate(image, k), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(erode(jnp.asarray(image), 5)), cv2.erode(image, k), atol=1e-6
    )
    ref_grad = cv2.morphologyEx(image, cv2.MORPH_GRADIENT, k)
    np.testing.assert_allclose(np.asarray(morph_gradient(jnp.asarray(image), 5)), ref_grad, atol=1e-6)


def test_pyr_down_close_to_opencv(image):
    ours = np.asarray(pyr_down(jnp.asarray(image)))
    ref = cv2.pyrDown(image)
    assert ours.shape == ref.shape
    # Border handling differs slightly; compare interior.
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-3)


@pytest.mark.parametrize("shape", [(48, 64), (47, 63), (9, 6), (5, 5)])
def test_pyr_down_matches_shift_formulation(rng, shape):
    """The banded-matmul pyr_down must reproduce the shifted-add separable
    conv + [::2, ::2] decimation (the pre-round-3 implementation) at every
    size parity, including multi-reflection tiny images."""
    from ocean_perception_tpu.ops.image import _PYR_K, _sep_conv2d

    x = rng.random(shape).astype(np.float32)
    ref = np.asarray(_sep_conv2d(jnp.asarray(x), _PYR_K, _PYR_K))[::2, ::2]
    out = np.asarray(pyr_down(jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_resize_shapes(image):
    out = resize(jnp.asarray(image), (24, 32))
    assert out.shape == (24, 32)
    out3 = resize(jnp.asarray(np.stack([image] * 3, -1)), (24, 32))
    assert out3.shape == (24, 32, 3)


def test_bilinear_sample_exact_on_grid(image):
    im = jnp.asarray(image)
    ys = jnp.asarray([0.0, 3.0, 47.0])
    xs = jnp.asarray([0.0, 5.0, 63.0])
    np.testing.assert_allclose(
        bilinear_sample(im, ys, xs), image[[0, 3, 47], [0, 5, 63]], atol=1e-6
    )
    # Midpoint is the average of 4 neighbors.
    v = bilinear_sample(im, jnp.asarray(10.5), jnp.asarray(20.5))
    np.testing.assert_allclose(v, image[10:12, 20:22].mean(), atol=1e-6)


def test_sample_patches_matches_gather(image):
    im = jnp.asarray(image[:32, :32])
    cy, cx = jnp.asarray(15.3), jnp.asarray(16.7)
    patch = sample_patches_bilinear(im, cy, cx, 5, 5)
    offs = jnp.arange(5, dtype=jnp.float32) - 2
    yy = cy + offs[:, None]
    xx = cx + offs[None, :]
    expected = bilinear_sample(im, yy, xx)
    np.testing.assert_allclose(patch, expected, atol=1e-5)


def test_masked_percentile_threshold(rng):
    vals = jnp.asarray(rng.random((100, 100)).astype(np.float32))
    mask = jnp.ones((100, 100), dtype=bool)
    thr = float(masked_percentile_threshold(vals, mask, 0.25, iters=12))
    frac = float((np.asarray(vals) < thr).mean())
    assert abs(frac - 0.25) < 0.01
    # Masked version: percentile of upper half only.
    mask2 = vals > 0.5
    thr2 = float(masked_percentile_threshold(vals, mask2, 0.5, iters=12))
    sel = np.asarray(vals)[np.asarray(mask2)]
    assert abs(float((sel < thr2).mean()) - 0.5) < 0.02


def test_guided_filter_edge_preserving(rng):
    # Step edge in guide; noisy target: output should stay sharp at the edge.
    H, W = 64, 64
    guide = np.zeros((H, W), np.float32)
    guide[:, W // 2 :] = 1.0
    target = guide + rng.normal(0, 0.1, (H, W)).astype(np.float32)
    out = np.asarray(
        fast_guided_filter(jnp.asarray(guide), jnp.asarray(target), radius=8, eps=1e-4, subsample=2)
    )
    # Noise suppressed away from the edge.
    assert out[:, : W // 4].std() < target[:, : W // 4].std() * 0.6
    # Edge magnitude preserved.
    assert (out[:, 3 * W // 4 :].mean() - out[:, : W // 4].mean()) > 0.8


def test_lm_solve_exponential_fit(rng):
    # Fit y = p0 * exp(p1 * t) from noisy samples.
    t = jnp.linspace(0.0, 2.0, 64)
    true = jnp.asarray([1.7, -0.8])
    y = true[0] * jnp.exp(true[1] * t)

    def residual_jac(x):
        pred = x[0] * jnp.exp(x[1] * t)
        r = pred - y
        J = jnp.stack([jnp.exp(x[1] * t), x[0] * t * jnp.exp(x[1] * t)], axis=-1)
        return r, J

    res = lm_solve(residual_jac, jnp.asarray([1.0, -0.1]), LMConfig(max_iters=50))
    np.testing.assert_allclose(res.x, true, atol=1e-4)
    assert float(res.error) < 1e-8


def test_lm_solve_with_projection():
    # Constrained fit: solution clamped at boundary.
    y = jnp.asarray([-2.0])

    def residual_jac(x):
        return x - y, jnp.eye(1)

    res = lm_solve(
        residual_jac,
        jnp.asarray([1.0]),
        LMConfig(max_iters=20),
        project=lambda x: jnp.maximum(x, 0.0),
    )
    np.testing.assert_allclose(res.x, [0.0], atol=1e-6)
