"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocean_perception_tpu.ops.pallas.cost_volume import (
    pallas_cost_volume,
    pallas_supported,
)
from ocean_perception_tpu.stereo.cost import cost_volume


def test_pallas_cost_volume_matches_jnp(rng):
    H, W, D = 32, 64, 16
    left = jnp.asarray(rng.random((H, W)).astype(np.float32))
    right = jnp.asarray(rng.random((H, W)).astype(np.float32))
    ours = np.asarray(pallas_cost_volume(left, right, D, alpha=0.9, interpret=True))
    ref = np.asarray(cost_volume(left, right, D, alpha=0.9))
    # Interior parity is exact; borders (x < D, the last column, and the two
    # outermost rows each side) differ only in edge-clamp flavor for the
    # Sobel term (reflect101 in the jnp path vs edge padding here) — regions
    # the reference's propagation loops skip (bounds [pr, dim-pr-1)).
    np.testing.assert_allclose(ours[2:-2, D + 1 : -2, :], ref[2:-2, D + 1 : -2, :], atol=1e-5)


def test_pallas_supported_budget():
    assert pallas_supported(360, 640, 64)
    assert not pallas_supported(2160, 3840, 256)


@pytest.mark.slow
def test_pallas_fused_bit_identical(rng):
    """The whole-frame fused kernel (ops/pallas/fused_patchmatch.py) must be
    BIT-IDENTICAL to the XLA _match_one_side across noise + all passes +
    cost refresh + MaskBackground, f32 and bf16 volumes (interpret mode on
    CPU; hardware parity re-checked by examples/bench_fused_patchmatch.py)."""
    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W = 48, 64
    canvas = rng.random((H, W + 16)).astype(np.float32)
    l = jnp.asarray(canvas[:, 8 : 8 + W])
    r = jnp.asarray(canvas[:, 5 : 5 + W])
    for extra in (
        dict(subpixel=False),
        dict(subpixel=True, volume_bf16=True),
    ):
        base = dict(max_disp=16, chunks=4, iters=2, right_wta=True, **extra)
        a = np.asarray(patchmatch_disparity(l, r, PatchMatchParams(**base)).left_raw)
        for inner_loop in (False, True):
            b = np.asarray(
                patchmatch_disparity(
                    l, r,
                    PatchMatchParams(
                        use_pallas_fused=True, fused_inner_loop=inner_loop, **base
                    ),
                ).left_raw
            )
            np.testing.assert_array_equal(a, b, err_msg=f"inner_loop={inner_loop}")
        assert (a > 0).mean() > 0.2


def test_pallas_fused_derive_row_parity(rng):
    """The in-kernel row-layout derivation (derive_row=True: MXU
    permutation-matmul volume transport instead of the XLA transpose) is
    bit-identical to the two-input mode for bf16 AND f32 volumes. Kept
    interpret-only: the current Mosaic toolchain cannot compile it at the
    production point (three walls documented in the kernel docstring)."""
    from ocean_perception_tpu.ops.pallas.fused_patchmatch import (
        pallas_patchmatch_fused,
    )

    H, W, D = 48, 64, 16
    C = jnp.asarray(rng.random((H, W, D)).astype(np.float32))
    seed = jnp.asarray((rng.random((H, W)) * (D - 1)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    kw = dict(chunks=4, chunks_y=None, halo=5, pr=1, iters=2,
              noise_scale0=2.0, improve=0.95, interpret=True)
    for vol in (C.astype(jnp.bfloat16), C):
        old = pallas_patchmatch_fused(vol, seed, noise, derive_row=False, **kw)
        new = pallas_patchmatch_fused(vol, seed, noise, derive_row=True, **kw)
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new),
                                      err_msg=str(vol.dtype))


@pytest.mark.slow
def test_pallas_fused_under_vmap(rng):
    """The fused kernel must also be bit-identical under jax.vmap — the B>1
    production configuration bench_fused_perception.py measures. The batch
    axis lowers to a sequential lax.map (custom_batching.sequential_vmap):
    a vmap-derived pallas grid dimension would double-buffer the
    VMEM-resident volumes past the 128 MB cap (measured RESOURCE_EXHAUSTED,
    docs/PERFORMANCE.md), so single-frame VMEM per step is the contract."""
    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W, B = 48, 64, 2
    canvas = rng.random((B, H, W + 16)).astype(np.float32)
    l = jnp.asarray(canvas[:, :, 8 : 8 + W])
    r = jnp.asarray(canvas[:, :, 5 : 5 + W])
    base = dict(max_disp=16, chunks=4, iters=2, right_wta=True, volume_bf16=True)

    def run(p):
        return jax.vmap(
            lambda a, b: patchmatch_disparity(a, b, p).left_raw
        )(l, r)

    a = np.asarray(run(PatchMatchParams(**base)))
    b = np.asarray(run(PatchMatchParams(use_pallas_fused=True, **base)))
    assert a.shape == (B, H, W)
    np.testing.assert_array_equal(a, b)
    # The two batch entries see different inputs -> different outputs.
    assert not np.array_equal(a[0], a[1])


def test_fused_supported_budget():
    from ocean_perception_tpu.ops.pallas.fused_patchmatch import fused_supported

    # Production point, bf16: both volume layouts fit the VMEM budget.
    assert fused_supported(360, 640, 64, 16, None, 5, 1, bf16=True)
    # f32 at the production point does NOT fit (two ~59-79 MB copies).
    assert not fused_supported(360, 640, 64, 16, None, 5, 1, bf16=False)
    # Strip geometry must leave room for the halo arithmetic.
    assert not fused_supported(48, 48, 16, 8, None, 5, 1, bf16=True)


def test_pallas_propagate_bit_identical(rng):
    """The fused Pallas propagation pass must be BIT-IDENTICAL to the XLA
    scan path (same one-hot lookup, clamps, and masks), f32 and bf16
    volumes, across the full multi-iteration pipeline."""
    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W = 96, 160
    canvas = rng.random((H, W + 32)).astype(np.float32)
    l = jnp.asarray(canvas[:, 16 : 16 + W])
    r = jnp.asarray(canvas[:, 12 : 12 + W])
    for extra in (
        dict(subpixel=False),
        dict(subpixel=True, volume_bf16=True, right_wta=True),
    ):
        base = dict(max_disp=32, chunks=4, iters=2, **extra)
        a = np.asarray(patchmatch_disparity(l, r, PatchMatchParams(**base)).left_raw)
        b = np.asarray(
            patchmatch_disparity(
                l, r, PatchMatchParams(use_pallas_propagate=True, **base)
            ).left_raw
        )
        np.testing.assert_array_equal(a, b)
        assert (a > 0).mean() > 0.3


def test_volume_build_bit_identical(rng):
    """The in-kernel cost-volume build (ops/pallas/volume_build.py) must
    reproduce cost_volume + the fused wrapper's strip-layout transposes:
    BIT-identical for bf16 volumes (the production dtype — bf16 rounding
    absorbs the one-ulp f32 association differences), <=1e-6 for f32; and
    the full patchmatch_disparity with use_pallas_build must be
    bit-identical to the fused path end to end."""
    from ocean_perception_tpu.ops.image import gradient_magnitude
    from ocean_perception_tpu.ops.pallas.fused_patchmatch import fused_geometry
    from ocean_perception_tpu.ops.pallas.volume_build import pallas_build_volumes
    from ocean_perception_tpu.stereo import PatchMatchParams, patchmatch_disparity

    H, W, D = 48, 64, 16
    chunks, chunks_y, halo, pr = 4, 3, 2, 1
    canvas = rng.random((H, W + 8)).astype(np.float32)
    iml = jnp.asarray(canvas[:, 4 : 4 + W])
    imr = jnp.asarray(canvas[:, :W])
    gl, gr = gradient_magnitude(iml), gradient_magnitude(imr)
    g = fused_geometry(H, W, D, chunks, chunks_y, halo, pr)

    for bf16, tol in ((True, 0.0), (False, 1e-6)):
        dt = jnp.bfloat16 if bf16 else jnp.float32
        C = cost_volume(iml, imr, D, 0.9, gl, gr, dtype=dt)
        vc_ref = jnp.transpose(
            jnp.transpose(C, (0, 2, 1)).reshape(g.chunks_y, g.chunk_y, D, W),
            (1, 0, 2, 3),
        )
        vr_ref = jnp.transpose(
            jnp.transpose(C, (1, 2, 0)).reshape(g.chunks_x, g.chunk_x, D, H),
            (1, 0, 2, 3),
        )
        vr, vc = pallas_build_volumes(
            iml, imr, gl, gr, D=D, alpha=0.9, chunks=chunks, chunks_y=chunks_y,
            halo=halo, pr=pr, bf16=bf16, interpret=True,
        )
        er = np.abs(np.asarray(vr, np.float32) - np.asarray(vr_ref, np.float32))
        ec = np.abs(np.asarray(vc, np.float32) - np.asarray(vc_ref, np.float32))
        assert er.max() <= tol and ec.max() <= tol, (bf16, er.max(), ec.max())

    base = dict(max_disp=D, chunks=chunks, chunks_y=chunks_y, halo=halo,
                iters=2, right_wta=True, volume_bf16=True,
                use_pallas_fused=True)
    ra = patchmatch_disparity(iml, imr, PatchMatchParams(**base, use_pallas_build=False))
    rb = patchmatch_disparity(iml, imr, PatchMatchParams(**base, use_pallas_build=True))
    np.testing.assert_array_equal(np.asarray(ra.left), np.asarray(rb.left))
    np.testing.assert_array_equal(np.asarray(ra.right), np.asarray(rb.right))

    # Camera-batched (sequential_vmap) stays per-camera identical.
    f = jax.vmap(lambda a, b: patchmatch_disparity(
        a, b, PatchMatchParams(**base, use_pallas_build=True)).left)
    out = f(jnp.stack([iml, iml]), jnp.stack([imr, imr]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))
