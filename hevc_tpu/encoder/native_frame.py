"""Native-engine frame encoder: TPU-batched integer ME + C++ CU engine.

Parity: same decision flow as intra_frame.IntraFrameEncoder._encode_cu and
inter_frame.PFrameEncoder._encode_cu_p (reference TEncCu::xCompressCU,
TEncSearch::predInterSearch), but the sequential per-CU work (prediction
from reconstructed neighbours, transforms, fractional refinement) runs in
the native engine (entropy/native/engine.cpp) while the frame-wide integer
motion search stays batched on the device (hevc_tpu/ops/me.py). 4:2:0 only;
the pure-Python encoders remain the reference path (HEVC_TPU_NATIVE_RECON=0)
and the 4:4:4 path.
"""
from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.cabac import (EngineParamsC, NativeCtuEngine, SliceDataEncoder,
                             SliceParamsC)
from ..ops import me
from ..ops.interp import pad_plane

PAD = 80


@functools.partial(jax.jit, static_argnames=("nyx",))
def _cost_argmin(sads, bits, lam_fp, nyx):
    """cost = sad + (lam*bits >> 16); first-minimum argmin per block over
    the (padded) Pallas SAD table."""
    s = sads[:, :nyx, :nyx]
    cost = s + ((lam_fp.astype(jnp.int32) * bits[None]) >> 16)
    return jnp.argmin(cost.reshape(cost.shape[0], -1), axis=1)


def batched_me_grid(orig_y: np.ndarray, ref_padded_y: np.ndarray, size: int,
                    search_range: int, lam_fp: int):
    """Frame-batched integer full search for every aligned size x size block;
    returns (mv_x, mv_y) int32 grids [ny, nx] (device Pallas kernel on TPU,
    vectorized numpy twin on CPU)."""
    h, w = orig_y.shape
    R = search_range
    pos = [(x0, y0)
           for y0 in range(0, h - size + 1, size)
           for x0 in range(0, w - size + 1, size)]
    nx = (w - size) // size + 1 if w >= size else 0
    ny = (h - size) // size + 1 if h >= size else 0
    if not pos:
        return None, None
    # Narrow transfer dtype (uint8 for 8-bit content, int16 for deep bit
    # depths); the kernel widens to int32 on device.
    dt = np.uint8 if orig_y.max(initial=0) < 256 and \
        ref_padded_y.max(initial=0) < 256 else np.int16
    aw = 2 * R + size
    n = len(pos)
    import jax
    if jax.default_backend() == "cpu":
        # vectorized numpy twin (strided gathers, no python slicing)
        blks = orig_y[:ny * size, :nx * size].reshape(
            ny, size, nx, size).transpose(0, 2, 1, 3).reshape(
            ny * nx, size, size).astype(np.int32)
        win = np.lib.stride_tricks.sliding_window_view(
            ref_padded_y, (aw, aw))[PAD - R::size, PAD - R::size]
        areas = win[:ny, :nx].reshape(ny * nx, aw, aw).astype(np.int32)
        zeros = np.zeros(n, np.int32)
        mins = np.full(n, -R, np.int32)
        mv_y, mv_x, _, _ = me.full_search_batch_np(
            blks, areas, mins, mins, zeros, zeros, lam_fp)
        mv_y, mv_x = np.asarray(mv_y), np.asarray(mv_x)
    else:
        # TPU: ship only the two planes; block/window gathers + Pallas SAD
        # run on device, then cost+argmin in a separate small jit (only the
        # winning index per block crosses the tunnel). lambda and the bits
        # table are passed as arrays so no value is baked into a compiled
        # graph — per-QP recompiles through the device tunnel are
        # catastrophically slow.
        from ..ops.sad_pallas import sad_table_from_planes
        nyx = 2 * R + 1
        dyr = np.arange(nyx) - R
        bits = (np.array([me.mv_bits_np(v << 2) for v in dyr])[:, None]
                + np.array([me.mv_bits_np(v << 2) for v in dyr])[None, :])
        sads = sad_table_from_planes(
            np.ascontiguousarray(ref_padded_y.astype(dt)),
            np.ascontiguousarray(orig_y.astype(dt)),
            size=size, r=R, ny=ny, nx=nx, pad=PAD)
        idx = np.asarray(_cost_argmin(sads, bits.astype(np.int32),
                                      np.int32(lam_fp), nyx))[:ny * nx]
        mv_y = idx // nyx - R
        mv_x = idx % nyx - R
    gx = np.zeros((ny, nx), np.int32)
    gy = np.zeros((ny, nx), np.int32)
    for i, (x0, y0) in enumerate(pos):
        gx[y0 // size, x0 // size] = int(mv_x[i])
        gy[y0 // size, x0 // size] = int(mv_y[i])
    return gx, gy


class NativeFrameEncoder:
    def __init__(self, sps, qp: int, senc: SliceDataEncoder,
                 sp: SliceParamsC, *, qp_factor: float = 0.57,
                 is_b: bool = False, ref_planes=None, ref1_planes=None,
                 search_range: int = 24, cu_depth_target: int = 1,
                 me_provider=None):
        """ref_planes / ref1_planes: a single [Y, Cb, Cr] plane list or a
        list of them — one entry per active reference of the list
        (reference TEncSearch::predInterSearch per-refIdx loop,
        TEncSearch.cpp:3027)."""
        assert sps.chroma_format_idc == 1, "native engine is 4:2:0-only"
        self.sps = sps
        self.qp = qp
        self.senc = senc
        self.sp = sp
        self.is_inter = ref_planes is not None
        lam = qp_factor * (2.0 ** ((qp - 12) / 3.0))
        self.sqrt_lam = math.sqrt(lam)
        self.lam_fp = int(65536.0 * self.sqrt_lam)
        self.search_range = search_range
        self.cu_depth_target = cu_depth_target
        self.is_b = is_b

        def norm(refs):
            if refs is None:
                return None
            if len(refs) and isinstance(refs[0], np.ndarray):
                refs = [refs]
            return [[np.ascontiguousarray(pad_plane(p, PAD)) for p in r]
                    for r in refs]

        self.ref = norm(ref_planes)
        self.ref1 = norm(ref1_planes) if ref1_planes is not None else self.ref
        # optional callable(size, range, lam_fp) -> (gx, gy) or None:
        # precomputed (mesh-sharded lookahead) integer-ME grids (ref 0)
        self.me_provider = me_provider

    def encode_frame(self, orig: List[np.ndarray]):
        sps = self.sps
        w = sps.pic_width_in_luma_samples
        h = sps.pic_height_in_luma_samples
        ctu = sps.ctu_size
        orig = [np.ascontiguousarray(p, np.int16) for p in orig]
        recon = [np.zeros((h, w), np.int16),
                 np.zeros((h // 2, w // 2), np.int16),
                 np.zeros((h // 2, w // 2), np.int16)]
        me_x = me_y = me16_x = me16_y = None
        if self.is_inter:
            size = ctu >> self.cu_depth_target
            me_x, me_y = [], []
            for r, ref in enumerate(self.ref):
                pre = (self.me_provider(size, self.search_range, self.lam_fp)
                       if r == 0 and self.me_provider else None)
                gx, gy = pre if pre is not None else batched_me_grid(
                    orig[0], ref[0], size, self.search_range, self.lam_fp)
                me_x.append(gx)
                me_y.append(gy)
            import os
            if os.environ.get("HEVC_TPU_CU16", "0") != "0":
                # deeper inter partitioning: RD-neutral on low-motion
                # content but costs a second device search; opt-in
                me16_x, me16_y = [], []
                for ref in self.ref:
                    gx, gy = batched_me_grid(
                        orig[0], ref[0], 16, min(self.search_range, 16),
                        self.lam_fp)
                    me16_x.append(gx)
                    me16_y.append(gy)
        ep = EngineParamsC(
            pad=PAD, cu_depth_target=self.cu_depth_target,
            strong_smoothing=sps.strong_intra_smoothing_enabled_flag,
            is_b=1 if self.is_b else 0, sqrt_lam=self.sqrt_lam)
        eng = NativeCtuEngine(self.sp, ep, self.senc, orig, recon,
                              self.ref, self.ref1 if self.is_b else self.ref,
                              me_x, me_y, me16_x, me16_y)
        from ..entropy.cabac import (FrameDecisions, engine_encode_frame,
                                     engine_encode_frame_order,
                                     tile_scan_order)
        ctus_w, ctus_h = -(-w // ctu), -(-h // ctu)
        fd = FrameDecisions(ctus_w * ctus_h, ctu, 1)
        if self.sp.tile_cols > 1 or self.sp.tile_rows > 1:
            order = tile_scan_order(w, h, ctu, self.sp.tile_cols,
                                    self.sp.tile_rows)
            engine_encode_frame_order(eng, order, ctus_w, fd)
        else:
            engine_encode_frame(eng, ctus_w, ctus_h, fd)
        return fd, recon
