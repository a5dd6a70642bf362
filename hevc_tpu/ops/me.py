"""Integer motion estimation: batched full-search SAD with fused MV cost.

Parity: reference TEncOpenCL.cpp calcMotionVectors:240 + cl/sad.cl
(the fork's GPU module: per-position SAD + compareSAD's
`cost = SAD + (lambda * bits) >> 16` argmin with strict '<' first-min
tie-breaking) and the CPU oracle TEncSearch::xPatternSearch:3835 (row-major
scan order, same cost). Re-designed TPU-first: ALL search positions of ALL
blocks of a frame are evaluated in one launch via an im2col patch extraction
(conv_general_dilated_patches) + one vectorized |diff| reduction — replacing
the reference's (2R+1)^2 sequential kernel-pair launches per CTU. The MV-bit
cost reproduces the reference's xGetComponentBits exp-golomb length exactly.
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
def full_search_batch(blks: jnp.ndarray, areas: jnp.ndarray,
                      mv_min_y: jnp.ndarray, mv_min_x: jnp.ndarray,
                      pred_qy: jnp.ndarray, pred_qx: jnp.ndarray,
                      lam_fp: jnp.ndarray, *, h: int, w: int, ny: int,
                      nx: int):
    """Full-search over an (ny x nx) integer-pel window for N blocks.

    blks:  [N, h, w] int32 original blocks
    areas: [N, h + ny - 1, w + nx - 1] int32 search areas; area (0, 0)
           corresponds to integer MV (mv_min_y[i], mv_min_x[i])
    pred_q*: [N] MV predictors in quarter-pel (rate term)
    lam_fp: scalar floor(65536 * sqrt(lambda)) (reference setLambda)

    Returns (mv_y, mv_x, cost, sad), each [N] — first minimum in row-major
    (dy, dx) order, matching the reference scan order tie-break.
    """
    n = blks.shape[0]
    # im2col: [N, h*w, ny, nx] patches of every window position
    patches = jax.lax.conv_general_dilated_patches(
        areas[:, None].astype(jnp.int32), (h, w), (1, 1), "VALID")
    patches = patches.reshape(n, h * w, ny, nx)
    sads = jnp.sum(jnp.abs(patches - blks.reshape(n, h * w, 1, 1)),
                   axis=1)                              # [N, ny, nx]
    mv_y = mv_min_y[:, None, None] + jnp.arange(ny)[None, :, None]
    mv_x = mv_min_x[:, None, None] + jnp.arange(nx)[None, None, :]
    bits = (mv_bits((mv_y << 2) - pred_qy[:, None, None])
            + mv_bits((mv_x << 2) - pred_qx[:, None, None]))
    cost = sads + ((lam_fp * bits) >> 16)
    flat = cost.reshape(n, ny * nx)
    idx = jnp.argmin(flat, axis=1)                      # first min wins
    by, bx = idx // nx, idx % nx
    take = lambda a: jnp.take_along_axis(
        a.reshape(n, ny * nx), idx[:, None], axis=1)[:, 0]
    return (mv_min_y + by, mv_min_x + bx, take(cost), take(sads))


def full_search(blk, area, mv_min_y, mv_min_x, pred_qy, pred_qx, lam_fp, *,
                h, w, ny, nx):
    """Single-block convenience wrapper over full_search_batch."""
    r = full_search_batch(
        jnp.asarray(blk)[None], jnp.asarray(area)[None],
        jnp.full((1,), mv_min_y, jnp.int32),
        jnp.full((1,), mv_min_x, jnp.int32),
        jnp.full((1,), pred_qy, jnp.int32),
        jnp.full((1,), pred_qx, jnp.int32),
        lam_fp, h=h, w=w, ny=ny, nx=nx)
    return r[0][0], r[1][0], r[2][0], r[3][0]


@functools.partial(jax.jit, static_argnames=("h", "w", "ny", "nx"))
def full_search_batch_pallas(blks, areas, mv_min_y, mv_min_x, pred_qy,
                             pred_qx, lam_fp, *, h, w, ny, nx):
    """TPU path: Pallas SAD tables + fused XLA cost/argmin (the compareSAD
    stage of the reference GPU module)."""
    from .sad_pallas import sad_table
    n = blks.shape[0]
    sads = sad_table(blks, areas, h=h, w=w, ny=ny, nx=nx)
    mv_y = mv_min_y[:, None, None] + jnp.arange(ny)[None, :, None]
    mv_x = mv_min_x[:, None, None] + jnp.arange(nx)[None, None, :]
    bits = (mv_bits((mv_y << 2) - pred_qy[:, None, None])
            + mv_bits((mv_x << 2) - pred_qx[:, None, None]))
    cost = sads + ((lam_fp * bits) >> 16)
    flat = cost.reshape(n, ny * nx)
    idx = jnp.argmin(flat, axis=1)
    by, bx = idx // nx, idx % nx
    take = lambda a: jnp.take_along_axis(
        a.reshape(n, ny * nx), idx[:, None], axis=1)[:, 0]
    return (mv_min_y + by, mv_min_x + bx, take(cost), take(sads))


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


def full_search_batch_np(blks, areas, mv_min_y, mv_min_x, pred_qy, pred_qx,
                         lam_fp):
    """Vectorized numpy twin of full_search_batch (host execution path for
    CPU-only runs; the jax version is the TPU path)."""
    n, h, w = blks.shape
    ny = areas.shape[1] - h + 1
    nx = areas.shape[2] - w + 1
    blks64 = blks.astype(np.int32)
    sads = np.empty((n, ny, nx), np.int32)
    for dy in range(ny):
        # windows along x via sliding view: [N, nx, h, w]
        win = np.lib.stride_tricks.sliding_window_view(
            areas[:, dy:dy + h, :], (h, w), axis=(1, 2))[:, 0]
        d = np.abs(win.astype(np.int32) - blks64[:, None])
        sads[:, dy, :] = d.sum(axis=(2, 3))
    yy = mv_min_y[:, None, None] + np.arange(ny)[None, :, None]
    xx = mv_min_x[:, None, None] + np.arange(nx)[None, None, :]

    def bits_arr(v):
        t = np.where(v <= 0, ((-v) << 1) + 1, v << 1).astype(np.int64)
        return 2 * (np.floor(np.log2(t)).astype(np.int32)) + 1

    bits = (bits_arr((yy << 2) - pred_qy[:, None, None])
            + bits_arr((xx << 2) - pred_qx[:, None, None]))
    cost = sads + ((lam_fp * bits) >> 16).astype(np.int32)
    flat = cost.reshape(n, -1)
    idx = np.argmin(flat, axis=1)
    by, bx = idx // nx, idx % nx
    take = lambda a: a.reshape(n, -1)[np.arange(n), idx]
    return mv_min_y + by, mv_min_x + bx, take(cost), take(sads)
