"""Integer motion estimation: batched full-search SAD with fused MV cost.

Parity: reference TEncOpenCL.cpp calcMotionVectors:240 + cl/sad.cl
(the fork's GPU module: per-position SAD + compareSAD's
`cost = SAD + (lambda * bits) >> 16` argmin with strict '<' first-min
tie-breaking) and the CPU oracle TEncSearch::xPatternSearch:3835 (row-major
scan order, same cost). Re-designed TPU-first: ALL search positions of a
block are evaluated in one batched launch (scan over rows, vectorized over
columns) instead of the reference's (2R+1)^2 sequential kernel-pair
launches; blocks batch via vmap. The MV-bit cost reproduces the reference's
xGetComponentBits exp-golomb length exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def mv_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Exp-Golomb-style signed length (reference TComRdCost bit counting)."""
    t = jnp.where(v <= 0, ((-v) << 1) + 1, v << 1).astype(jnp.int32)
    return 2 * (31 - jax.lax.clz(t)) + 1


def mv_bits_np(v) -> int:
    t = (-v << 1) + 1 if v <= 0 else v << 1
    return 2 * (int(t).bit_length() - 1) + 1


@functools.partial(jax.jit, static_argnames=("h", "w", "ny", "nx"))
def full_search(blk: jnp.ndarray, area: jnp.ndarray, mv_min_y: jnp.ndarray,
                mv_min_x: jnp.ndarray, pred_qpel_y: jnp.ndarray,
                pred_qpel_x: jnp.ndarray, lam_fp: jnp.ndarray, *,
                h: int, w: int, ny: int, nx: int):
    """Full-search over an (ny x nx) integer-pel window.

    blk:  [h, w] int32 original block
    area: [h + ny - 1, w + nx - 1] int32 reference search area whose (0, 0)
          corresponds to integer MV (mv_min_y, mv_min_x)
    pred_qpel_*: MV predictor in quarter-pel (for the rate term)
    lam_fp: int32 floor(65536 * sqrt(lambda_mode)) (reference setLambda)

    Returns (best_mv_y, best_mv_x) integer-pel, best_cost, best_sad — the
    first minimum in row-major (dy, dx) order, matching the reference scan.
    """
    def row_sads(dy):
        rows = jax.lax.dynamic_slice(area, (dy, 0), (h, w + nx - 1))
        # static x-slices (one per column offset) vectorize cleanly; the
        # dynamic part is only the scan over rows.
        wins = jnp.stack([jax.lax.slice(rows, (0, dx), (h, dx + w))
                          for dx in range(nx)])
        return jnp.sum(jnp.abs(wins - blk[None]), axis=(1, 2))

    sads = jax.lax.map(row_sads, jnp.arange(ny))        # [ny, nx]
    mv_y = mv_min_y + jnp.arange(ny)[:, None]
    mv_x = mv_min_x + jnp.arange(nx)[None, :]
    bits = (mv_bits((mv_y << 2) - pred_qpel_y)
            + mv_bits((mv_x << 2) - pred_qpel_x))
    cost = sads + ((lam_fp * bits) >> 16)
    idx = jnp.argmin(cost.reshape(-1))                  # first min wins
    by, bx = idx // nx, idx % nx
    return (mv_min_y + by, mv_min_x + bx, cost.reshape(-1)[idx],
            sads.reshape(-1)[idx])


@functools.partial(jax.jit, static_argnames=("h", "w", "ny", "nx"))
def full_search_batch(blks: jnp.ndarray, areas: jnp.ndarray,
                      mv_min_y: jnp.ndarray, mv_min_x: jnp.ndarray,
                      pred_qy: jnp.ndarray, pred_qx: jnp.ndarray,
                      lam_fp: jnp.ndarray, *, h: int, w: int, ny: int,
                      nx: int):
    """Batched full_search over N blocks in ONE device launch — the
    TPU-native replacement for the reference's per-CTU sequential GPU
    dispatch (TEncSearch.cpp:3743). blks [N,h,w], areas [N,h+ny-1,w+nx-1],
    per-block window origins/predictors."""
    fn = functools.partial(full_search.__wrapped__, h=h, w=w, ny=ny, nx=nx)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, None))(
        blks, areas, mv_min_y, mv_min_x, pred_qy, pred_qx, lam_fp)


def full_search_np(blk, area, mv_min_y, mv_min_x, pred_qy, pred_qx, lam_fp):
    """Scalar oracle with the reference's exact scan order."""
    h, w = blk.shape
    ny = area.shape[0] - h + 1
    nx = area.shape[1] - w + 1
    best = None
    for dy in range(ny):
        for dx in range(nx):
            sad = int(np.abs(area[dy:dy + h, dx:dx + w].astype(np.int64)
                             - blk.astype(np.int64)).sum())
            bits = (mv_bits_np(((mv_min_y + dy) << 2) - pred_qy)
                    + mv_bits_np(((mv_min_x + dx) << 2) - pred_qx))
            cost = sad + ((lam_fp * bits) >> 16)
            if best is None or cost < best[2]:
                best = (mv_min_y + dy, mv_min_x + dx, cost, sad)
    return best
