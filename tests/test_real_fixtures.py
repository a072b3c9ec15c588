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


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize(
    "lname,rname,scale,max_disp,chunks,band",
    [
        # Production operating point (/2, D=64 = 128 full-scale) on every
        # large bundled pair; tiny fsl2/fsl3 crops and reef full-res with a
        # proportionate max_disp. Mirrors bench.ORACLE_PAIRS. `band` is the
        # per-pair median-agreement bound: <1 px where the scene constrains
        # the output; the measured-AMBIGUOUS pairs (farmsim_01's textureless
        # water, reef1 — see test_ambiguous_pairs_oracle_self_divergence and
        # bench.ORACLE_PAIRS) get a regression canary instead.
        ("images/fsl1.png", "images/fsr1.png", 2, 64, 16, 1.0),
        ("farmsim_01_left.png", "farmsim_01_right.png", 2, 64, 16, 12.0),
        ("caddy_32_left.jpg", "caddy_32_right.jpg", 2, 64, 16, 1.0),
        ("images/fsl2.png", "images/fsr2.png", 1, 32, 4, 1.0),
        ("images/fsl3.png", "images/fsr3.png", 1, 32, 4, 1.0),
        ("images/reef1_left.png", "images/reef1_right.png", 1, 32, 8, 5.0),
        # KITTI-style outdoor pair the reference's SGBM test drives
        # (sgbm_test.cpp): well textured, fully constrained.
        ("images/vkl.jpg", "images/vkr.jpg", 2, 64, 16, 1.0),
    ],
)
def test_patchmatch_production_point_vs_oracle(lname, rname, scale, max_disp, chunks, band):
    """The <1 px contract AT THE PRODUCTION OPERATING POINT (BASELINE.md row
    2): the reference benchmark configuration — /2 input downsample, max_disp
    64 internal (= 128 full-scale), 3 iterations
    (patchmatch_gpu_test.cpp:63-93) — with the SHIPPED config (bf16 volume +
    right_wta + subpixel; scan_unroll=1 is bit-identical to the shipped
    full unroll, verified, and compiles ~10x faster on CPU)."""
    l, r = load_stereo_pair(reference_resource(lname), reference_resource(rname))
    if scale > 1:
        l = cv2.resize(l, (l.shape[1] // scale, l.shape[0] // scale))
        r = cv2.resize(r, (r.shape[1] // scale, r.shape[0] // scale))

    p = PatchMatchParams(
        max_disp=max_disp, chunks=chunks, iters=3,
        right_wta=True, volume_bf16=True, subpixel=True, scan_unroll=1,
    )
    from ocean_perception_tpu.stereo.patchmatch import gradient_magnitude

    gl = gradient_magnitude(jnp.asarray(l))
    gr = gradient_magnitude(jnp.asarray(r))
    C = cost_volume(jnp.asarray(l), jnp.asarray(r), max_disp, p.alpha, gl, gr, dtype=jnp.bfloat16)
    seed = np.asarray(sparse_wta_seed(C, p), np.float32)
    noise = np.asarray(unit_noise(l.shape, p.noise_seed))

    ours = np.asarray(
        patchmatch_disparity(jnp.asarray(l), jnp.asarray(r), p, seed_left=jnp.asarray(seed)).left_raw
    )
    ref = oracle.patchmatch_oracle(
        l, r, seed, iters=3, alpha=p.alpha, improve_factor=p.improve_factor, noise=noise
    )
    both = (ours > 0) & (ref > 0)
    assert both.mean() > 0.3
    med = float(np.median(np.abs(ours - ref)[both]))
    assert med < band, f"median |ours - oracle| = {med:.3f} px at the production point"
    if band <= 1.0:
        agree = ((ours > 0) == (ref > 0)).mean()
        assert agree > 0.85


@requires_reference
@pytest.mark.slow
def test_ambiguous_pairs_oracle_self_divergence():
    """Evidence for the loosened farmsim_01/reef1 bands above: on those
    scenes the CUDA-semantics oracle diverges from ITSELF by ~1+ px median
    when only the noise draw changes (vs ~0.3 px on fsl1), i.e. the scene
    does not pin the algorithm's output — an independent SGBM referee puts
    farmsim_01's true median disparity at ~7 px while both our path and the
    oracle land at 35/56 px on its textureless water. The reference's own
    tests keep farmsim_01 commented out (patchmatch_gpu_test.cpp:49-56)."""
    from ocean_perception_tpu.stereo.patchmatch import gradient_magnitude  # noqa: F401

    l, r = load_stereo_pair(
        reference_resource("farmsim_01_left.png"),
        reference_resource("farmsim_01_right.png"),
    )
    l = cv2.resize(l, (l.shape[1] // 2, l.shape[0] // 2))
    r = cv2.resize(r, (r.shape[1] // 2, r.shape[0] // 2))
    p = PatchMatchParams(max_disp=64, chunks=16, iters=3)
    C = cost_volume(jnp.asarray(l), jnp.asarray(r), 64, p.alpha)
    seed = np.asarray(sparse_wta_seed(C, p), np.float32)
    n1 = np.asarray(unit_noise(l.shape, 123))
    n2 = np.asarray(unit_noise(l.shape, 124))
    r1 = oracle.patchmatch_oracle(l, r, seed, iters=3, alpha=p.alpha, improve_factor=0.8, noise=n1)
    r2 = oracle.patchmatch_oracle(l, r, seed, iters=3, alpha=p.alpha, improve_factor=0.8, noise=n2)
    both = (r1 > 0) & (r2 > 0)
    self_div = float(np.median(np.abs(r1 - r2)[both]))
    assert self_div > 0.5, (
        f"oracle self-divergence {self_div:.3f} px — farmsim_01 no longer "
        "ambiguous? tighten its band in the matrix above"
    )


def _load_enhance_fixture(name: str, dep: str):
    """Image + EXR range at the reference's /2 downsize (enhance_test.cpp:64)."""
    from ocean_perception_tpu.utils.exr import read_exr
    from ocean_perception_tpu.utils.image_io import load_image

    rgb = load_image(reference_resource(f"test_images_enhance/images/{name}"))
    z = read_exr(reference_resource(f"test_images_enhance/depth/{dep}"))
    if z.ndim == 3:
        z = z[..., 0]
    size = (rgb.shape[1] // 2, rgb.shape[0] // 2)
    return cv2.resize(rgb, size), cv2.resize(z.astype(np.float32), size)


@requires_reference
@pytest.mark.slow
def test_enhance_seathru_d3_sequence():
    """Sea-thru D3 fixtures (reference enhance_test.cpp:83-166): both LM fits
    must SUCCEED (error < 0.1, enhance.cpp:54,78) on the real image+EXR-depth
    pair, with sane output stats, and reusing a converged beta_D must keep
    the fit converged."""
    from ocean_perception_tpu.imaging import EnhanceSequence
    from ocean_perception_tpu.imaging.formation import BETA_GUESS_1

    seq = EnhanceSequence(beta_D_guess=jnp.asarray(BETA_GUESS_1))
    for i, name in enumerate(("4856_bluegreen.png", "4856_neutral.png")):
        rgb, z = _load_enhance_fixture(name, "depth_4856.exr")
        out, info = seq(rgb, z)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert bool(info.success_backscatter), float(info.error_backscatter)
        assert float(info.error_backscatter) < 0.05
        # Both frames must SUCCEED (error < 0.1, enhance.cpp:54,78). The
        # round-2 frame-2 slack (0.2) is gone: the numpy reference-LM oracle
        # proved the neutral variant converges to ~0.023 when reseeded
        # (tests/test_imaging_oracle.py::test_beta_reuse_band_adjudicated),
        # and enhance_underwater now multi-starts {guess, G1, G2} so a
        # near-stationary reused X can no longer trap the fit.
        assert bool(info.success_attenuation), (i, float(info.error_attenuation))
        m = float(np.clip(o, 0, 1).mean())
        assert 0.1 < m < 0.8

    # A fresh default guess on the neutral variant converges well under the
    # 0.1 success threshold (the data supports success; the slack above is
    # the cross-variant reuse, which the reference's driver also exhibits).
    from ocean_perception_tpu.imaging.enhance import EnhanceParams, enhance_underwater

    rgb, z = _load_enhance_fixture("4856_neutral.png", "depth_4856.exr")
    _, fresh = enhance_underwater(
        jnp.asarray(rgb), jnp.asarray(z), EnhanceParams(), jnp.asarray(BETA_GUESS_1)
    )
    assert bool(fresh.success_attenuation), float(fresh.error_attenuation)

    # Beta reuse across a sequence: re-running the first frame seeded by its
    # own converged fit must not regress (enhance_test.cpp:117-148 semantics).
    rgb, z = _load_enhance_fixture("4856_bluegreen.png", "depth_4856.exr")
    seq2 = EnhanceSequence(beta_D_guess=jnp.asarray(BETA_GUESS_1))
    _, first = seq2(rgb, z)
    _, second = seq2(rgb, z)  # starts from first's converged beta_D
    assert float(second.error_attenuation) <= float(first.error_attenuation) + 1e-3


@requires_reference
@pytest.mark.slow
def test_enhance_seathru_d5_site_guess_selection():
    """Per-site initial guesses matter (attenuation.hpp:12-29): on the D5
    fixtures the RAW fit from BetaInitialGuess2 converges while
    BetaInitialGuess1 stalls at its (rejected) starting point. At the
    pipeline level enhance_underwater multi-starts {guess, G1, G2}, so ANY
    supplied guess now reaches G2-quality on D5 (and backscatter succeeds
    regardless)."""
    from ocean_perception_tpu.imaging.attenuation import estimate_beta
    from ocean_perception_tpu.imaging.backscatter import (
        estimate_backscatter,
        find_dark_mask,
        remove_backscatter,
    )
    from ocean_perception_tpu.imaging.illuminant import estimate_illuminant_range_guided
    from ocean_perception_tpu.imaging.enhance import EnhanceParams, enhance_underwater
    from ocean_perception_tpu.imaging.formation import BETA_GUESS_1, BETA_GUESS_2
    from ocean_perception_tpu.ops.image import compute_intensity

    rgb, z = _load_enhance_fixture("3374_bluegreen.png", "depth_3374.exr")

    # Raw-fit contract: per-guess basins exist (the reference's manual
    # site-selection problem).
    inten = compute_intensity(jnp.asarray(rgb))
    dark = find_dark_mask(inten, jnp.asarray(z), 0.01)
    bfit = estimate_backscatter(jnp.asarray(rgb), jnp.asarray(z), dark, num_px=256, iters=10)
    D = remove_backscatter(jnp.asarray(rgb), jnp.asarray(z), bfit.B, bfit.beta_B)
    radius = rgb.shape[1] // 3
    radius += radius % 2
    il = estimate_illuminant_range_guided(D, jnp.asarray(z), radius, 0.01, 8)
    e2 = float(estimate_beta(jnp.asarray(z), il, num_px=256, iters=20, X0=jnp.asarray(BETA_GUESS_2)).error)
    e1 = float(estimate_beta(jnp.asarray(z), il, num_px=256, iters=20, X0=jnp.asarray(BETA_GUESS_1)).error)
    assert e2 < 5.0            # converges to a usable fit on deep (10 m) D5 scenes
    assert e2 < e1 / 4.0       # the D5 guess beats the D1-D3 guess decisively

    # Pipeline contract: multi-start rescues the BAD guess.
    out1, info1 = enhance_underwater(
        jnp.asarray(rgb), jnp.asarray(z), EnhanceParams(), jnp.asarray(BETA_GUESS_1)
    )
    assert bool(info1.success_backscatter)
    assert float(info1.error_attenuation) < 5.0
    assert np.isfinite(np.asarray(out1)).all()


@requires_reference
@pytest.mark.slow
def test_enhance_seathru_d5_sequence():
    """Full D5 sequence with BETA_GUESS_2: backscatter always succeeds
    (< 0.05), outputs stay finite (exp clamp) with sane brightness, and the
    attenuation error stays within the measured band for every frame."""
    from ocean_perception_tpu.imaging import EnhanceSequence
    from ocean_perception_tpu.imaging.formation import BETA_GUESS_2

    seq = EnhanceSequence(beta_D_guess=jnp.asarray(BETA_GUESS_2))
    frames = [
        ("3374_bluegreen.png", "depth_3374.exr"),
        ("3374_red.png", "depth_3374.exr"),
        ("3390.png", "depth_3390.exr"),
        ("3047.png", "depth_3047.exr"),
    ]
    for name, dep in frames:
        rgb, z = _load_enhance_fixture(name, dep)
        out, info = seq(rgb, z)
        o = np.asarray(out)
        assert np.isfinite(o).all(), name
        assert float(info.error_backscatter) < 0.05, name
        assert float(info.error_attenuation) < 50.0, name
        m = float(np.clip(o, 0, 1).mean())
        assert 0.2 < m < 0.9, (name, m)


@requires_reference
@pytest.mark.slow
def test_enhance_multi_start_removes_site_selection():
    """With NO beta guess, enhance multi-starts from both reference site
    guesses and keeps the better fit — D5 converges (G1 alone stalls at
    ~80 error) and D3 stays under the success threshold. Removes the
    manual per-site guess the reference requires (attenuation.hpp:12-29)."""
    from ocean_perception_tpu.imaging.enhance import enhance_underwater

    rgb, z = _load_enhance_fixture("3374_bluegreen.png", "depth_3374.exr")
    _, info_d5 = enhance_underwater(jnp.asarray(rgb), jnp.asarray(z))
    assert float(info_d5.error_attenuation) < 5.0  # G2-quality, not G1's ~80

    rgb, z = _load_enhance_fixture("4856_bluegreen.png", "depth_4856.exr")
    _, info_d3 = enhance_underwater(jnp.asarray(rgb), jnp.asarray(z))
    assert bool(info_d3.success_attenuation)
