"""Compile-and-run probe for the fused LK kernels at production shapes.

One level-direction of the fused tracker (lk_prep -> lk_iterate, 720p
level-0 geometry, K=200, 4-slot ring) on the REAL chip — a ~1-3 min
single-kernel iteration loop instead of the ~20 min full-fleet compile,
for chasing Mosaic lowering walls one at a time. Prints parity vs the XLA
corr-path prep computed on the same backend.

Usage: python examples/probe_lk_prep_compile.py [--level 0] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--level", type=int, default=0, help="pyramid level geometry")
    ap.add_argument("--K", type=int, default=200)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocean_perception_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocean_perception_tpu.ops.pallas.lk_iterate import lk_iterate_lane_major
    from ocean_perception_tpu.ops.pallas.lk_prep import lk_prep_pallas
    from ocean_perception_tpu.tracking.lk import (
        LKParams, _corr_surfaces, _dslice, _template_side,
    )

    interpret = jax.default_backend() != "tpu"
    p = LKParams()
    win, slack = p.window, p.search_slack
    pad = win // 2 + 2
    H, W = 720 >> args.level, 1280 >> args.level
    R = 4
    K = args.K
    rng = np.random.default_rng(0)
    ring = jnp.asarray(rng.random((R, H + 2 * pad, W + 2 * pad)).astype(np.float32))
    cur = jnp.asarray(rng.random((1, H + 2 * pad, W + 2 * pad)).astype(np.float32))
    pts = jnp.asarray(
        np.stack([rng.uniform(0, W - 1, K), rng.uniform(0, H - 1, K)], 1).astype(np.float32)
    )
    guess = pts + jnp.asarray(rng.uniform(-2, 2, (K, 2)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, R, K).astype(np.int32))
    zeros = jnp.zeros(K, jnp.int32)

    t0 = time.time()
    corr, scal, okg, sy0, sx0 = jax.block_until_ready(
        lk_prep_pallas(
            ring, cur, pts, guess, src, zeros,
            win=win, slack=slack, pad=pad,
            min_eig_threshold=p.min_eig_threshold, interpret=interpret,
        )
    )
    print(f"prep compile+run: {time.time() - t0:.1f}s  okg={int(np.sum(okg))}/{K}")

    # XLA corr-path prep on the same backend as the oracle.
    r = win // 2
    ws = win + 2 * (slack + 1)

    def prep(pt, g, s):
        tpatch, gx, gy, inv, ok_g = _template_side(ring, s, pt, p, win, pad, H, W)
        sy = jnp.clip(jnp.floor(g[1]) + pad - r - slack - 1, 0, H + 2 * pad - ws).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(g[0]) + pad - r - slack - 1, 0, W + 2 * pad - ws).astype(jnp.int32)
        swin = _dslice(cur, 0, sy, sx, ws, ws)
        c, tg = _corr_surfaces(swin, tpatch, gx, gy, win, "einsum")
        return c, tg, inv, ok_g

    corr_x, tg_x, inv_x, okg_x = jax.block_until_ready(
        jax.jit(jax.vmap(prep))(pts, guess, src)
    )
    cp = np.transpose(np.asarray(corr), (3, 0, 1, 2))[:K]
    dc = np.abs(cp - np.asarray(corr_x))
    rel = dc / (np.abs(np.asarray(corr_x)) + 1e-2)
    print(f"corr parity: max abs {dc.max():.3e}  max rel {rel.max():.3e}  "
          f"okg agree {int(np.sum(np.asarray(okg) == np.asarray(okg_x)))}/{K}")
    per_pt = rel.reshape(K, -1).max(axis=1)
    bad = np.where(per_pt > 1e-3)[0]
    if len(bad):
        r_ = win // 2
        t0y = np.clip(np.floor(np.asarray(pts)[:, 1]) + pad - r_ - 1, 0,
                      ring.shape[1] - (win + 3)).astype(int)
        t0x = np.clip(np.floor(np.asarray(pts)[:, 0]) + pad - r_ - 1, 0,
                      ring.shape[2] - (win + 3)).astype(int)
        print(f"bad points: {len(bad)}/{K}")
        for k in bad[:8]:
            print(f"  k={k} t0=({t0y[k]},{t0x[k]}) off=({t0y[k]%8},{t0x[k]%128}) "
                  f"s0=({int(sy0[k])},{int(sx0[k])}) soff=({int(sy0[k])%8},{int(sx0[k])%128}) "
                  f"src={int(src[k])} rel={per_pt[k]:.3f}")
    # Template-side check: tg/inv come from twin only.
    tgk = np.transpose(np.asarray(scal[0:2]))[:K]
    dtg = np.abs(tgk - np.asarray(tg_x)).max()
    dinv = np.abs(np.stack([np.asarray(scal[2]), np.asarray(scal[3]),
                            np.asarray(scal[4]), np.asarray(scal[5])], -1)[:K]
                  - np.asarray(inv_x).reshape(K, 4)).max()
    print(f"template-side parity: tg {dtg:.3e}  inv {dinv:.3e}")

    t0 = time.time()
    Kp = corr.shape[-1]
    pos0 = jnp.pad(jnp.transpose(guess), ((0, 0), (0, Kp - K)))
    pos, hit = jax.block_until_ready(
        lk_iterate_lane_major(
            corr, scal, pos0, r=r, ws=ws, pad=pad,
            max_iters=p.max_iters, eps=float(p.eps), interpret=interpret,
        )
    )
    print(f"iterate compile+run: {time.time() - t0:.1f}s  "
          f"finite={bool(np.all(np.isfinite(np.asarray(pos)[:, :K])))}  "
          f"hit={int(np.sum(np.asarray(hit)[0, :K] > 0.5))}")

    # Hardware parity of the WALK vs the XLA corr-mode loop on the same
    # surfaces (catches the silent in-kernel sublane-iota mis-layout class).
    def walk_one(c, tgk, invk, syk, sxk, g):
        A = c.shape[-1]
        ia = jnp.arange(A, dtype=jnp.float32)

        def body(_, carry):
            posk, converged, hitk = carry
            cy = posk[1] + pad - syk.astype(posk.dtype)
            cx = posk[0] + pad - sxk.astype(posk.dtype)
            in_win = (cy >= r + 1) & (cy <= ws - r - 2) & (cx >= r + 1) & (cx <= ws - r - 2)
            hitk = hitk | ~in_win
            wy = jnp.maximum(0.0, 1.0 - jnp.abs((cy - r) - ia))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs((cx - r) - ia))
            b = (c @ wx) @ wy - tgk
            delta = -(invk @ b)
            stop = converged | hitk
            new_pos = jnp.where(stop, posk, posk + delta)
            converged = stop | (jnp.sum(delta * delta) < p.eps * p.eps)
            return (new_pos, converged, hitk)

        posk, _, hitk = jax.lax.fori_loop(
            0, p.max_iters, body, (g, jnp.asarray(False), jnp.asarray(False))
        )
        return posk, hitk

    corr_pm = jnp.transpose(corr, (3, 0, 1, 2))[:K]
    tg_pm = jnp.transpose(scal[0:2])[:K]
    inv_pm = jnp.stack(
        [scal[2], scal[3], scal[4], scal[5]], -1
    )[:K].reshape(K, 2, 2)
    pos_x, hit_x = jax.block_until_ready(
        jax.jit(jax.vmap(walk_one))(corr_pm, tg_pm, inv_pm,
                                    scal[6][:K], scal[7][:K], guess)
    )
    pk = np.transpose(np.asarray(pos))[:K]
    dp = np.abs(pk - np.asarray(pos_x))
    agree_hit = int(np.sum((np.asarray(hit)[0, :K] > 0.5) == np.asarray(hit_x)))
    print(f"walk parity vs XLA (same surfaces): max pos diff {dp.max():.3e}  "
          f"hit agree {agree_hit}/{K}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
