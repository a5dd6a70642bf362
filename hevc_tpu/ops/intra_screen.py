"""Whole-frame batched intra mode prescreen on the device.

Parity: reference TEncSearch::estIntraPredLumaQT (TEncSearch.cpp:2184)
builds a per-PU candidate mode list by Hadamard-SATD over all 35 modes
before the expensive RD loop. Re-designed TPU-first: every aligned block
of one size forms a batch; reference vectors come from ORIGINAL pixels
(blocks are then independent, so the whole frame's 35-mode predict+SATD
runs as ONE fused launch of hevc_tpu.ops.intra.predict_all_modes +
ops.satd.satd_batch — the same original-pixels batching trick the ME
path uses). The native engine consumes the top-k candidate modes per
block to restrict its recon-reference SATD+bits mode decision
(engine.cpp intra_try_list) from 35 to k+MPM trials — both for the
final mode choice (encode_cu_intra) and for the CU split screens
(intra_cu_decide); the split decision itself stays recon-based, since
original-reference costs systematically flatter sub-blocks (their
references sit inside the parent) and over-split.

k follows the reference's g_aucIntraModeNumFast (TComRom.cpp:60): 8
candidates for 8x8, 3 for 16x16/32x32.

All block sizes are computed in ONE jitted program per resolution, with
the static gather tables embedded as constants — per frame the host
uploads one int16 plane and reads back the packed candidate lists in a
single device round trip (the tunnel's round-trip latency, not FLOPs,
bounds this stage at small resolutions).

Out-of-frame reference rows/cols (y=-1 of the top block row, x=-1 of
the left block column) take the mid-level value, approximating the
spec's no-reference substitution (8.4.4.2.2); in-frame positions the
sequential encoder would substitute use the original pixels instead —
acceptable for a screen whose final mode choice is re-ranked against
true recon references in the engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .intra import predict_all_modes
from .satd import satd_batch

K_OF_LOG2 = {2: 8, 3: 8, 4: 3, 5: 3}
_CHUNK = 16384  # blocks per lax.map step (bounds the [B, 35, N, N] buffer)


@functools.lru_cache(maxsize=None)
def _index_maps(n: int, ny: int, nx: int, w: int, h: int):
    """Static gather maps into the padded plane P (shape [h+1, w+1],
    P[y+1, x+1] = orig[y, x]; P[0, :] and P[:, 0] hold mid-level).

    Returns (f_idx [B, 4n+1], blk_idx [B, n*n]) int32 flat indices.
    f layout (ops.intra docstring): f[2n]=corner p[-1][-1],
    f[2n+1+x]=top p[x][-1], f[2n-1-y]=left p[-1][y]."""
    b = ny * nx
    y0 = (np.arange(ny, dtype=np.int64)[:, None] * n)
    x0 = (np.arange(nx, dtype=np.int64)[None, :] * n)
    y0 = np.broadcast_to(y0, (ny, nx)).reshape(b)
    x0 = np.broadcast_to(x0, (ny, nx)).reshape(b)
    stride = w + 1
    f_rows = np.empty((b, 4 * n + 1), np.int64)
    f_cols = np.empty((b, 4 * n + 1), np.int64)
    f_rows[:, 2 * n] = y0
    f_cols[:, 2 * n] = x0
    xs = np.arange(2 * n, dtype=np.int64)
    # top row p[x][-1] = P[y0, x0+1+x] (clamped to the last column)
    f_rows[:, 2 * n + 1:] = y0[:, None]
    f_cols[:, 2 * n + 1:] = np.minimum(x0[:, None] + 1 + xs[None, :], w)
    # left col p[-1][y] = P[y0+1+y, x0] (clamped to the last row)
    f_rows[:, 2 * n - 1::-1] = np.minimum(y0[:, None] + 1 + xs[None, :], h)
    f_cols[:, 2 * n - 1::-1] = x0[:, None]
    f_idx = (f_rows * stride + f_cols).astype(np.int32)
    ij = np.arange(n, dtype=np.int64)
    blk = ((y0[:, None, None] + 1 + ij[None, :, None]) * stride
           + x0[:, None, None] + 1 + ij[None, None, :])
    return f_idx, blk.reshape(b, n * n).astype(np.int32)


def _mode_bits_est(mode: int) -> int:
    """Engine mode_bits with the typical MPM trio {planar, DC, vertical}
    (engine.cpp mode_bits: MPM0 2 bits, MPM1/2 3, else 6)."""
    if mode == 0:
        return 2
    if mode in (1, 26):
        return 3
    return 6


@functools.lru_cache(maxsize=16)
def _screen_fn(w: int, h: int, bit_depth: int, log2s: tuple):
    """One jitted program computing every size's candidates for a
    [h+1, w+1] int16 padded plane; static index tables are embedded as
    program constants (nothing but the plane crosses the link)."""
    plans = []
    for log2 in log2s:
        n = 1 << log2
        ny, nx = h // n, w // n
        if ny == 0 or nx == 0:
            continue
        k = K_OF_LOG2[log2]
        f_idx, blk_idx = _index_maps(n, ny, nx, w, h)
        b = ny * nx
        chunk = min(_CHUNK, b)
        nc = -(-b // chunk)
        if nc * chunk > b:           # pad by repeating the last block
            padn = nc * chunk - b
            f_idx = np.concatenate([f_idx, np.repeat(f_idx[-1:], padn, 0)])
            blk_idx = np.concatenate(
                [blk_idx, np.repeat(blk_idx[-1:], padn, 0)])
        plans.append((log2, n, ny, nx, k, b, chunk, nc,
                      f_idx.reshape(nc, chunk, -1),
                      blk_idx.reshape(nc, chunk, -1)))

    def run(p16, lam_tab):
        p_flat = p16.reshape(-1).astype(jnp.int32)
        outs = []
        for (log2, n, ny, nx, k, b, chunk, nc, f_idx, blk_idx) in plans:
            def step(idxs, n=n, k=k, chunk=chunk):
                fi, bi = idxs
                f = jnp.take(p_flat, fi.reshape(-1)).reshape(
                    chunk, 4 * n + 1)
                ff = jnp.concatenate([
                    f[:, :1],
                    (f[:, :-2] + 2 * f[:, 1:-1] + f[:, 2:] + 2) >> 2,
                    f[:, -1:]], axis=1)
                preds = predict_all_modes(f, ff, size=n,
                                          bit_depth=bit_depth,
                                          is_luma=True)
                blocks = jnp.take(p_flat, bi.reshape(-1)).reshape(
                    chunk, 1, n, n)
                satd = satd_batch(preds, blocks, size=n)
                cost = satd + lam_tab[None, :]
                _, idx = lax.top_k(-cost, k)
                return idx.astype(jnp.uint8)
            if nc == 1:
                cands = step((jnp.asarray(f_idx[0]), jnp.asarray(blk_idx[0])))
            else:
                cands = lax.map(step, (jnp.asarray(f_idx),
                                       jnp.asarray(blk_idx))
                                ).reshape(nc * chunk, k)
            outs.append(cands[:b].reshape(-1))
        # one packed buffer -> one host transfer (the tunnel round trip,
        # not compute, bounds this stage at small resolutions)
        return jnp.concatenate(outs)

    meta = [(p[0], p[2], p[3], p[4]) for p in plans]
    return jax.jit(run), meta


def screen_frame(orig_y: np.ndarray, bit_depth: int, sqrt_lam: float,
                 log2s=(3, 4, 5)):
    """Device intra prescreen for every aligned block of sizes 1<<log2s.

    Returns {log2: (cands uint8 [ny, nx, k], costs=None)} for
    NativeCtuEngine.set_intra_hints. Runs identically on the CPU backend
    (pure XLA)."""
    h, w = orig_y.shape
    mid = 1 << (bit_depth - 1)
    p = np.empty((h + 1, w + 1), np.int16)
    p[1:, 1:] = orig_y
    p[0, :] = mid
    p[:, 0] = mid
    lam_tab = np.array([round(sqrt_lam * _mode_bits_est(m))
                        for m in range(35)], np.int32)
    fn, meta = _screen_fn(w, h, bit_depth, tuple(log2s))
    packed = np.asarray(fn(p, lam_tab))
    out = {}
    off = 0
    for (log2, ny, nx, k) in meta:
        sz = ny * nx * k
        out[log2] = (packed[off:off + sz].reshape(ny, nx, k), None)
        off += sz
    return out
