"""Whole-frame batched intra mode prescreen on the device.

Parity: reference TEncSearch::estIntraPredLumaQT (TEncSearch.cpp:2184)
builds a per-PU candidate mode list by Hadamard-SATD over all 35 modes
before the expensive RD loop. Re-designed TPU-first: every aligned block
of one size forms a batch; reference vectors come from ORIGINAL pixels
(blocks are then independent, so the whole frame's 35-mode predict+SATD
runs as batched launches of hevc_tpu.ops.intra.predict_all_modes +
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

Dispatch shape: the padded plane is uploaded once per frame; each
(size, chunk) runs as its own async jitted dispatch against
device-cached static gather tables, and the host reads every chunk's
packed result back at the end (dispatches overlap; only the final
gather blocks). No lax.map / while-loop chunking — the tunnel backend
compiles plain fan-out programs far more reliably.

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

# k = 0: costs only (the 4x4 grid exists for the engine's TU-split gate;
# 4x4 blocks never take a standalone mode decision — no NxN intra PUs)
K_OF_LOG2 = {2: 0, 3: 8, 4: 3, 5: 3}
_CHUNK = 16384  # blocks per dispatch (bounds the [B, 35, N, N] buffer)


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


@functools.partial(jax.jit, static_argnames=("size", "bit_depth", "k"))
def _screen_chunk(p16, fi, bi, lam_tab, *, size, bit_depth, k):
    """One chunk's top-k candidate modes (uint8 [B, k]) and per-block
    best cost (int32 [B]); k == 0 returns costs only (4x4 blocks feed
    the engine's TU-split gate but never a mode decision). p16: padded
    int16 plane; fi [B, 4n+1] / bi [B, n*n]: flat gather indices."""
    n = size
    b = fi.shape[0]
    p_flat = p16.reshape(-1).astype(jnp.int32)
    f = jnp.take(p_flat, fi.reshape(-1)).reshape(b, 4 * n + 1)
    # [1 2 1]/4 smoothing, ends copied (spec 8.4.4.2.3; strong smoothing
    # is not modelled in the screen)
    ff = jnp.concatenate([
        f[:, :1],
        (f[:, :-2] + 2 * f[:, 1:-1] + f[:, 2:] + 2) >> 2,
        f[:, -1:]], axis=1)
    preds = predict_all_modes(f, ff, size=n, bit_depth=bit_depth,
                              is_luma=True)                  # [B, 35, n, n]
    blocks = jnp.take(p_flat, bi.reshape(-1)).reshape(b, 1, n, n)
    satd = satd_batch(preds, blocks, size=n)                 # [B, 35]
    # int32 throughout (SATD of a 32x32 12-bit block is < 2^27)
    cost = satd + lam_tab[None, :]
    best = jnp.min(cost, axis=1).astype(jnp.int32)
    if k == 0:
        return best
    _, idx = lax.top_k(-cost, k)
    return idx.astype(jnp.uint8), best


@jax.jit
def _concat_flat(arrs):
    return jnp.concatenate([a.reshape(-1) for a in arrs])


@functools.lru_cache(maxsize=16)
def _frame_plan(w: int, h: int, log2s: tuple):
    """Per-resolution dispatch plan: device-resident gather tables for
    every (size, chunk). Uploaded once per process per resolution."""
    plan = []
    for log2 in log2s:
        n = 1 << log2
        ny, nx = h // n, w // n
        if ny == 0 or nx == 0:
            continue
        k = K_OF_LOG2[log2]
        f_idx, blk_idx = _index_maps(n, ny, nx, w, h)
        b = ny * nx
        chunks = []
        for s in range(0, b, _CHUNK):
            e = min(s + _CHUNK, b)
            if e - s < _CHUNK and b > _CHUNK:
                # pad to the chunk shape so every chunk shares one compile
                padn = _CHUNK - (e - s)
                fi = np.concatenate(
                    [f_idx[s:e], np.repeat(f_idx[e - 1:e], padn, 0)])
                bi = np.concatenate(
                    [blk_idx[s:e], np.repeat(blk_idx[e - 1:e], padn, 0)])
            else:
                fi, bi = f_idx[s:e], blk_idx[s:e]
            chunks.append((s, e, jax.device_put(np.ascontiguousarray(fi)),
                           jax.device_put(np.ascontiguousarray(bi))))
        plan.append((log2, n, ny, nx, k, b, chunks))
    return plan


def screen_frame_async(orig_y: np.ndarray, bit_depth: int, sqrt_lam: float,
                       log2s=(2, 3, 4, 5)):
    """Dispatch the prescreen and return a zero-arg resolver.

    The dispatches run asynchronously on the device; only the resolver
    blocks (on the packed readbacks). Callers with a frame of host work
    between dispatch and use (EncoderTop's prefetch path) hide the whole
    device round trip behind it.

    Returns {log2: (cands uint8 [ny, nx, k], costs int64 [ny, nx])};
    costs are the best original-reference SATD+mode-bits per block, the
    engine's TU/CU split-gate signal (engine.cpp code_r gate)."""
    h, w = orig_y.shape
    mid = 1 << (bit_depth - 1)
    # 16-bit samples exceed int16 (the engine's HBD build carries them
    # as int32); the SATD math itself is int32-safe at every depth
    # (|8x8 Hadamard coeff| <= 2^16 * 64, summed over 64 coeffs < 2^31)
    pdt = np.int16 if bit_depth <= 14 else np.int32
    p = np.empty((h + 1, w + 1), pdt)
    p[1:, 1:] = orig_y
    p[0, :] = mid
    p[:, 0] = mid
    p_dev = jax.device_put(p)
    lam_tab = jax.device_put(np.array(
        [round(sqrt_lam * _mode_bits_est(m)) for m in range(35)], np.int32))
    plan = _frame_plan(w, h, tuple(log2s))
    pending = []                       # dispatch everything, block once
    for (log2, n, ny, nx, k, b, chunks) in plan:
        for (s, e, fi, bi) in chunks:
            r = _screen_chunk(p_dev, fi, bi, lam_tab, size=n,
                              bit_depth=bit_depth, k=k)
            idx, cost = (None, r) if k == 0 else r
            pending.append((log2, s, e, idx, cost))
    # two packed device vectors (candidate modes / block costs) -> two
    # host transfers, both started immediately (the tunnel charges a
    # round trip per array read back)
    packed_idx = _concat_flat([i for (_, _, _, i, _) in pending
                               if i is not None])
    packed_cost = _concat_flat([c for (_, _, _, _, c) in pending])
    for a in (packed_idx, packed_cost):
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass

    def resolve():
        flat_i = np.asarray(packed_idx)
        flat_c = np.asarray(packed_cost)
        out = {}
        iviews, cviews = [], []
        offi = offc = 0
        for (l2, s, e, i, c) in pending:
            if i is not None:
                sz = int(np.prod(i.shape))
                iviews.append((l2, s, e, flat_i[offi:offi + sz]
                               .reshape(i.shape)))
                offi += sz
            sz = int(np.prod(c.shape))
            cviews.append((l2, s, e, flat_c[offc:offc + sz]
                           .reshape(c.shape)))
            offc += sz
        for (log2, n, ny, nx, k, b, chunks) in plan:
            cands = np.empty((b, k), np.uint8)
            for (l2, s, e, arr) in iviews:
                if l2 == log2:
                    cands[s:e] = arr[:e - s]
            costs = np.empty(b, np.int64)
            for (l2, s, e, arr) in cviews:
                if l2 == log2:
                    costs[s:e] = arr[:e - s]
            out[log2] = (cands.reshape(ny, nx, k),
                         costs.reshape(ny, nx))
        return out

    return resolve


def screen_frame(orig_y: np.ndarray, bit_depth: int, sqrt_lam: float,
                 log2s=(2, 3, 4, 5)):
    """Device intra prescreen for every aligned block of sizes 1<<log2s.

    Returns {log2: (cands uint8 [ny, nx, k], None)} for
    NativeCtuEngine.set_intra_hints. Runs identically on the CPU backend
    (pure XLA)."""
    return screen_frame_async(orig_y, bit_depth, sqrt_lam, log2s)()
