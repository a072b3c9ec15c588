"""Regression tests on the reference's real fixture images (skipped when the
reference mount is absent). These pin behavior on real underwater/sim data,
not just synthetics."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference
from ocean_perception_tpu.stereo import PatchMatchParams, SgmParams, patchmatch_disparity, sgm_disparity
from ocean_perception_tpu.stereo import oracle
from ocean_perception_tpu.stereo.cost import cost_volume
from ocean_perception_tpu.stereo.patchmatch import sparse_wta_seed, unit_noise
from ocean_perception_tpu.utils.image_io import load_stereo_pair, reference_resource


@pytest.fixture(scope="module")
def farmsim_pair():
    l, r = load_stereo_pair(
        reference_resource("images/fsl1.png"), reference_resource("images/fsr1.png")
    )
    # Crop + downscale for CPU test speed; keep epipolar geometry (same rows).
    l = cv2.resize(l[:, :], (188, 120))
    r = cv2.resize(r[:, :], (188, 120))
    return l, r


@requires_reference
def test_sgm_on_farmsim(farmsim_pair):
    l, r = farmsim_pair
    res = sgm_disparity(jnp.asarray(l), jnp.asarray(r), SgmParams(max_disp=32, chunks=4))
    d = np.asarray(res.left)
    valid = d > 0
    # The scene has structure at sane disparities; LR check keeps a solid core.
    assert 0.15 < valid.mean() <= 1.0
    assert 0.5 < np.median(d[valid]) < 32


@requires_reference
def test_patchmatch_matches_oracle_on_real_image(farmsim_pair):
    """TPU PatchMatch vs the faithful numpy CUDA re-derivation on REAL data —
    the <1 px median agreement contract (BASELINE.md)."""
    l, r = farmsim_pair
    p = PatchMatchParams(max_disp=32, chunks=4, iters=2, subpixel=False, improve_factor=0.8)
    C = cost_volume(jnp.asarray(l), jnp.asarray(r), 32, p.alpha)
    seed = np.asarray(sparse_wta_seed(C, p), np.float32)
    noise = np.asarray(unit_noise(l.shape, p.noise_seed))

    ours = np.asarray(
        patchmatch_disparity(jnp.asarray(l), jnp.asarray(r), p, seed_left=jnp.asarray(seed)).left_raw
    )
    ref = oracle.patchmatch_oracle(l, r, seed, iters=2, alpha=p.alpha, improve_factor=0.8, noise=noise)
    both = (ours > 0) & (ref > 0)
    assert both.mean() > 0.1
    med = float(np.median(np.abs(ours - ref)[both]))
    assert med < 1.0
    agree = ((ours > 0) == (ref > 0)).mean()
    assert agree > 0.75


@requires_reference
def test_tracker_on_farmsim_pair():
    """Front-end smoke on real data: detect + stereo-match on fsl1/fsr1."""
    from ocean_perception_tpu.tracking import (
        DetectorParams,
        StereoTrackerParams,
        StereoTrackerState,
        StripeMatcherParams,
        LKParams,
        track_and_triangulate,
    )

    l, r = load_stereo_pair(
        reference_resource("images/fsl1.png"), reference_resource("images/fsr1.png")
    )
    params = StereoTrackerParams(
        capacity=200,
        detector=DetectorParams(max_features=200, min_distance=20, border=10),
        lk=LKParams(),
        matcher=StripeMatcherParams(max_disp=128, templ_cols=31, templ_rows=11, max_matching_cost=0.15),
    )
    state = StereoTrackerState.create(params)
    state, out = track_and_triangulate(
        state, jnp.asarray(l), jnp.asarray(l), jnp.asarray(r), jnp.asarray(336.0 * 0.2),
        params, True,
    )
    obs = out.observations
    v = np.asarray(obs.valid)
    d = np.asarray(obs.disparities)[v]
    assert v.sum() > 50                 # plenty of corners on farmsim
    assert (d > 0).sum() > 30           # most get stereo matches
    assert 0.5 < np.median(d[d > 0]) < 64
