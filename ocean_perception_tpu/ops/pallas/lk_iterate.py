"""Batched LK iteration loop as a single Pallas TPU kernel.

Pairs with tracking.lk's correlation-surface mode (LKParams.corr_iters): per
pyramid level XLA still does the per-point gathers + template prep + the MXU
correlation precompute, but the sequential iteration walk — measured as the
per-point bottleneck of the fleet step even after the corr rewrite (each
iteration is ~15 tiny batched XLA ops inside a vmapped while_loop) — runs
here as ONE kernel launch: all K points' surfaces live in VMEM, and each of
the max_iters steps is a handful of VPU ops on (A, K)-shaped tiles with K on
the lane axis.

Semantics are the corr-mode level loop of tracking/lk.py `_lk_level` with
`early_exit=False` (a fixed masked fori_loop — documented bit-identical to
the early-exit while_loop; here each masked step costs ~100 flops/pt so the
exit is not worth a cross-lane reduce). Parity with the XLA corr path is
locked by tests/test_tracking.py::test_lk_pallas_iterate_matches_xla.

Mosaic notes (same traps as propagate.py): booleans are kept to
non-replicated elementwise compares on (1, K) f32 data; tent weights are
built from a f32 iota with abs/max arithmetic, never an i1 one-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lk_iter_kernel(
    corr_ref,   # (2, A, A, Kp) correlation surfaces [gx, gy]
    scal_ref,   # (8, Kp): tgx tgy inv00 inv01 inv10 inv11 sy0 sx0
    pos0_ref,   # (2, Kp): initial guess [x, y] (unpadded-frame coords)
    pos_ref,    # out (2, Kp)
    hit_ref,    # out (1, Kp) f32 0/1 — walk left the slack window
    *,
    A: int,
    r: int,
    ws: int,
    pad: int,
    max_iters: int,
    eps: float,
):
    corr_x = corr_ref[0]  # (A, A, Kp)
    corr_y = corr_ref[1]
    tgx = scal_ref[0:1, :]
    tgy = scal_ref[1:2, :]
    i00 = scal_ref[2:3, :]
    i01 = scal_ref[3:4, :]
    i10 = scal_ref[4:5, :]
    i11 = scal_ref[5:6, :]
    sy0 = scal_ref[6:7, :]
    sx0 = scal_ref[7:8, :]

    Kp = tgx.shape[-1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (A, Kp), 0).astype(jnp.float32)
    fpad = jnp.float32(pad)
    fr = jnp.float32(r)

    def body(_, carry):
        px, py, conv, hitf = carry  # (1, Kp) f32 each; conv/hitf are 0/1
        cy = py + fpad - sy0
        cx = px + fpad - sx0
        inw = (
            (cy >= r + 1) & (cy <= ws - r - 2) & (cx >= r + 1) & (cx <= ws - r - 2)
        )
        hitf = jnp.maximum(hitf, 1.0 - inw.astype(jnp.float32))
        # Exact bilinear weights of patch top-left (cy - r, cx - r) as tent
        # functions over the surface's integer offsets.
        wy = jnp.maximum(0.0, 1.0 - jnp.abs((cy - fr) - jidx))  # (A, Kp)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs((cx - fr) - jidx))
        # Contract i (x offsets) then j (y offsets) — the same association
        # order as the XLA path's (corr @ wx) @ wy.
        tx = jnp.sum(corr_x * wx[None, :, :], axis=1)  # (A, Kp)
        ty = jnp.sum(corr_y * wx[None, :, :], axis=1)
        bx = jnp.sum(tx * wy, axis=0, keepdims=True) - tgx  # (1, Kp)
        by = jnp.sum(ty * wy, axis=0, keepdims=True) - tgy
        dx = -(i00 * bx + i01 * by)
        dy = -(i10 * bx + i11 * by)
        stop = jnp.maximum(conv, hitf)
        live = 1.0 - stop
        npx = px + dx * live
        npy = py + dy * live
        small = ((dx * dx + dy * dy) < eps * eps).astype(jnp.float32)
        conv = jnp.maximum(stop, small)
        return (npx, npy, conv, hitf)

    zero = jnp.zeros((1, Kp), jnp.float32)
    px, py, _, hitf = jax.lax.fori_loop(
        0, max_iters, body, (pos0_ref[0:1, :], pos0_ref[1:2, :], zero, zero)
    )
    pos_ref[0:1, :] = px
    pos_ref[1:2, :] = py
    hit_ref[0:1, :] = hitf


def lk_iterate_pallas(
    corr: jnp.ndarray,   # (K, 2, A, A) per-point surfaces from _corr_surfaces
    tg: jnp.ndarray,     # (K, 2)
    inv: jnp.ndarray,    # (K, 2, 2)
    sy0: jnp.ndarray,    # (K,) slack-window origins (int32)
    sx0: jnp.ndarray,    # (K,)
    guess: jnp.ndarray,  # (K, 2) [x, y]
    r: int,
    ws: int,
    pad: int,
    max_iters: int,
    eps: float,
    interpret: bool = False,
):
    """Run the per-level LK walk for all K points in one kernel launch.

    Returns (pos (K, 2), hit (K,) bool). Lanes are the point axis (padded to
    a multiple of 128); every per-point scalar rides an (8, Kp) row block.
    The kernel is pointwise over lanes, so an outer camera-axis vmap (the
    farm fleet) FLATTENS into the lane axis via a custom batching rule —
    one launch for B*K points instead of B sequential grid steps.
    """
    fn = _flat_iterate(r, ws, pad, max_iters, eps, interpret)
    return fn(corr, tg, inv, sy0, sx0, guess)


@functools.lru_cache(maxsize=None)
def _flat_iterate(r, ws, pad, max_iters, eps, interpret):
    @jax.custom_batching.custom_vmap
    def run(corr, tg, inv, sy0, sx0, guess):
        return _lk_iterate_impl(
            corr, tg, inv, sy0, sx0, guess,
            r=r, ws=ws, pad=pad, max_iters=max_iters, eps=eps,
            interpret=interpret,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, corr, tg, inv, sy0, sx0, guess):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = [
            bcast(x, b)
            for x, b in zip((corr, tg, inv, sy0, sx0, guess), in_batched)
        ]
        flat = [x.reshape((-1,) + x.shape[2:]) for x in args]
        pos, hit = run(*flat)
        K = args[-1].shape[1]
        return (pos.reshape(axis_size, K, 2), hit.reshape(axis_size, K)), (True, True)

    return run


@functools.partial(
    jax.jit, static_argnames=("r", "ws", "pad", "max_iters", "eps", "interpret")
)
def lk_iterate_lane_major(
    corr,    # (2, A, A, Kp) lane-major surfaces (ops.pallas.lk_prep output)
    scal,    # (8, Kp): tgx tgy inv00 inv01 inv10 inv11 sy0f sx0f
    pos0,    # (2, Kp) initial [x, y]
    *, r: int, ws: int, pad: int, max_iters: int, eps: float,
    interpret: bool = False,
):
    """Lane-major entry: run the walk directly on lk_prep's outputs with
    ZERO relayouts between the two launches. Returns (pos (2, Kp),
    hit (1, Kp) f32 0/1) still lane-major; the caller slices/compares."""
    A = corr.shape[1]
    Kp = corr.shape[-1]
    kernel = functools.partial(
        _lk_iter_kernel, A=A, r=r, ws=ws, pad=pad, max_iters=max_iters, eps=eps
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        ],
        interpret=interpret,
    )(corr, scal, pos0)


@functools.partial(
    jax.jit, static_argnames=("r", "ws", "pad", "max_iters", "eps", "interpret")
)
def _lk_iterate_impl(
    corr, tg, inv, sy0, sx0, guess,
    *, r: int, ws: int, pad: int, max_iters: int, eps: float, interpret: bool,
):
    K, _, A, _ = corr.shape
    Kp = _round_up(max(K, 128), 128)

    def pad_k(x):
        return jnp.pad(x, [(0, Kp - K)] + [(0, 0)] * (x.ndim - 1))

    corr_t = jnp.transpose(pad_k(corr), (1, 2, 3, 0))  # (2, A, A, Kp)
    scal = jnp.stack(
        [
            pad_k(tg[:, 0]),
            pad_k(tg[:, 1]),
            pad_k(inv[:, 0, 0]),
            pad_k(inv[:, 0, 1]),
            pad_k(inv[:, 1, 0]),
            pad_k(inv[:, 1, 1]),
            pad_k(sy0.astype(jnp.float32)),
            pad_k(sx0.astype(jnp.float32)),
        ]
    )  # (8, Kp)
    pos0 = jnp.transpose(pad_k(guess), (1, 0))  # (2, Kp)

    kernel = functools.partial(
        _lk_iter_kernel, A=A, r=r, ws=ws, pad=pad, max_iters=max_iters, eps=eps
    )
    pos_t, hit_f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        ],
        interpret=interpret,
    )(corr_t, scal, pos0)
    pos = jnp.transpose(pos_t, (1, 0))[:K]
    hit = hit_f[0, :K] > 0.5
    return pos, hit
