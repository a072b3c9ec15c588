"""Imaging LM fits vs the numpy reference-LM oracle (imaging/oracle.py — the
same adjudication methodology the stereo stack uses). Settles the round-2
open question: is the D5 attenuation error ~1-2 the JAX fit's fault or the
2-exponential model's limit? Measured answer (pinned below): the reference's
OWN algorithm lands at ~3.3 on D5 at its shipped 20 iterations (~1.6 even at
200), so its 0.1 success threshold is unattainable on those deep scenes —
and the JAX fit converges BETTER than the reference machinery there."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import requires_reference
from ocean_perception_tpu.imaging import oracle as orc
from ocean_perception_tpu.imaging.formation import BETA_GUESS_1, BETA_GUESS_2

BACKSCATTER_GUESS = np.array(
    [0.132, 0.115, 0.0559, 0.358, 0.695, 1.11, 0.05, 0.05, 0.05, 1.17, 1.23, 0.891]
)


def test_oracle_backscatter_recovers_synthetic_truth():
    """Validates the oracle itself: data generated exactly from the formation
    model must fit to ~zero error."""
    rng = np.random.default_rng(3)
    H, W = 60, 80
    z = rng.uniform(1.0, 8.0, (H, W)).astype(np.float32)
    X_true = np.array(
        [0.14, 0.10, 0.06, 0.4, 0.7, 1.0, 0.06, 0.05, 0.04, 1.1, 1.2, 0.9]
    )
    img = orc._formation_model(z.reshape(-1), X_true).reshape(H, W, 3)
    mask = np.ones((H, W), bool)
    X, err = orc.estimate_backscatter_oracle(
        img, z, mask, num_px=256, iters=30, X0=X_true * 1.4
    )
    assert err < 1e-4


def test_oracle_find_dark_percentile():
    rng = np.random.default_rng(0)
    inten = rng.uniform(0, 1, (200, 300)).astype(np.float32)
    z = np.ones_like(inten)
    thresh, mask = orc.find_dark_fast(inten, z, percentile=0.01)
    frac = mask.mean()
    assert 0.005 < frac < 0.02  # 8-iter binary search: +/-0.4% band
    assert abs(thresh - 0.01) < 0.005


def _load_fixture(name: str, dep: str):
    import cv2

    from ocean_perception_tpu.utils.exr import read_exr
    from ocean_perception_tpu.utils.image_io import load_image, reference_resource

    rgb = load_image(reference_resource(f"test_images_enhance/images/{name}"))
    zz = read_exr(reference_resource(f"test_images_enhance/depth/{dep}"))
    if zz.ndim == 3:
        zz = zz[..., 0]
    size = (rgb.shape[1] // 2, rgb.shape[0] // 2)
    return cv2.resize(rgb, size), cv2.resize(zz.astype(np.float32), size)


def _pipeline_stages(rgb, z):
    """Shared upstream (intensity/dark/backscatter/illuminant) from the JAX
    pipeline, so the oracle-vs-JAX comparison isolates the LM fits."""
    from ocean_perception_tpu.imaging.backscatter import (
        estimate_backscatter,
        find_dark_mask,
        remove_backscatter,
    )
    from ocean_perception_tpu.imaging.illuminant import estimate_illuminant_range_guided
    from ocean_perception_tpu.ops.image import compute_intensity

    inten = compute_intensity(jnp.asarray(rgb))
    dark = find_dark_mask(inten, jnp.asarray(z), 0.01)
    fit = estimate_backscatter(
        jnp.asarray(rgb), jnp.asarray(z), dark, num_px=256, iters=10
    )
    D = remove_backscatter(jnp.asarray(rgb), jnp.asarray(z), fit.B, fit.beta_B)
    radius = rgb.shape[1] // 3
    radius += radius % 2
    il = estimate_illuminant_range_guided(D, jnp.asarray(z), radius, 0.01, 8)
    return np.asarray(inten), fit, il


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize(
    "name,dep",
    [("4856_bluegreen.png", "depth_4856.exr"), ("3374_bluegreen.png", "depth_3374.exr")],
)
def test_backscatter_jax_matches_oracle(name, dep):
    """Both the oracle (reference LM verbatim) and the JAX fit must land far
    under the 0.05 regression band on the real fixtures."""
    from ocean_perception_tpu.imaging.backscatter import estimate_backscatter, find_dark_mask

    rgb, z = _load_fixture(name, dep)
    inten, fit, _ = _pipeline_stages(rgb, z)
    _, mask = orc.find_dark_fast(inten, z)
    _, err_oracle = orc.estimate_backscatter_oracle(
        rgb, z, mask, num_px=256, iters=10, X0=BACKSCATTER_GUESS
    )
    assert err_oracle < 0.01
    assert float(fit.error) < 0.01
    # The JAX fit must be in the oracle's class (both effectively converged).
    assert float(fit.error) < max(10.0 * err_oracle, 0.005)


@requires_reference
@pytest.mark.slow
def test_beta_d3_jax_matches_oracle():
    """D3: both converge well under the reference's 0.1 success threshold
    from the D1-D3 site guess."""
    from ocean_perception_tpu.imaging.attenuation import estimate_beta

    rgb, z = _load_fixture("4856_bluegreen.png", "depth_4856.exr")
    _, _, il = _pipeline_stages(rgb, z)
    _, err_oracle = orc.estimate_beta_oracle(
        z, np.asarray(il), np.asarray(BETA_GUESS_1), 256, 20
    )
    fj = estimate_beta(jnp.asarray(z), il, num_px=256, iters=20, X0=jnp.asarray(BETA_GUESS_1))
    assert err_oracle < 0.1
    assert float(fj.error) < 0.1
    assert float(fj.error) < 3.0 * err_oracle


@requires_reference
@pytest.mark.slow
def test_beta_d5_model_limit_documented():
    """THE round-2 adjudication: on D5 the reference's own LM cannot
    approach its own 0.1 threshold — the 2-exponential model saturates at
    ~1.6-3.3 error on those deep (10 m) scenes — and the JAX fit does at
    least as well as the reference machinery at the same budget. This pins
    the repo's D5 bands (<5.0) as a model limit, not a fit regression."""
    from ocean_perception_tpu.imaging.attenuation import estimate_beta

    rgb, z = _load_fixture("3374_bluegreen.png", "depth_3374.exr")
    _, _, il = _pipeline_stages(rgb, z)
    # Reference budget (enhance_test drives 20 iters) from the D5 site guess.
    _, err20 = orc.estimate_beta_oracle(z, np.asarray(il), np.asarray(BETA_GUESS_2), 256, 20)
    assert err20 > 1.0, "reference LM suddenly hits its threshold — re-evaluate bands"
    # Even a 10x budget doesn't reach 0.1: it's the model, not the optimizer.
    _, err200 = orc.estimate_beta_oracle(z, np.asarray(il), np.asarray(BETA_GUESS_2), 256, 200)
    assert err200 > 0.5
    fj = estimate_beta(jnp.asarray(z), il, num_px=256, iters=20, X0=jnp.asarray(BETA_GUESS_2))
    assert float(fj.error) <= err20 + 1e-3  # JAX fit >= reference machinery


@requires_reference
@pytest.mark.slow
def test_beta_reuse_band_adjudicated():
    """The D3 frame-2 reuse question: the oracle converges to ~0.023 when
    seeded with frame 1's converged fit, so <0.1 is attainable on the
    neutral variant — which is why enhance_underwater multi-starts
    {guess, G1, G2} (a converged previous X alone is a near-stationary
    trap for the LM). Locked at the pipeline level by the tightened
    test_real_fixtures.py::test_enhance_seathru_d3_sequence."""
    rgb1, z1 = _load_fixture("4856_bluegreen.png", "depth_4856.exr")
    rgb2, z2 = _load_fixture("4856_neutral.png", "depth_4856.exr")
    _, _, il1 = _pipeline_stages(rgb1, z1)
    _, _, il2 = _pipeline_stages(rgb2, z2)
    X1, e1 = orc.estimate_beta_oracle(z1, np.asarray(il1), np.asarray(BETA_GUESS_1), 256, 20)
    assert e1 < 0.1
    _, e2 = orc.estimate_beta_oracle(z2, np.asarray(il2), X1, 256, 20)
    assert e2 < 0.1  # the data supports reuse-convergence under the threshold
