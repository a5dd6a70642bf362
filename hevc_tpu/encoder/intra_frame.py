"""Intra frame encoder: mode decision + reconstruction + entropy maps.

Parity: reference TEncCu::xCompressCU (recursive RD decision, TEncCu.cpp:357)
and TEncSearch::estIntraPredLumaQT (35-mode prescreen, TEncSearch.cpp:2184),
restructured for this framework: a SATD-based mode decision with MPM-aware
mode bits, exact spec reconstruction (prediction from reconstructed
neighbours, DCT/DST + quant + inverse), and per-CTU decision maps handed to
the native CABAC syntax writer.

The sequential intra dependency chain (prediction needs neighbouring recon)
runs on host numpy; the batched device twin (hevc_tpu.ops.intra) serves
frame-level prescreens. Device offload of the wavefront recon is the next
optimization stage.
"""
from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..core import tables
from ..core.geometry import AvailabilityMap
from ..core.params import SPS
from ..core.refsamples import build_ref_vector
from ..entropy.cabac import CtuDecisions
from ..ops import intra_np
from ..ops.intra import (filter_ref_samples, strong_smoothing_decision,
                         _filter_flag)
from ..ops.quant import dequantize_np, quantize_np
from ..ops.transform import forward_transform_np, inverse_transform_np
from .quadtree import cu_leaves, tu_leaves

H8 = None


def _hadamard8():
    global H8
    if H8 is None:
        h = np.array([[1]])
        while h.shape[0] < 8:
            h = np.block([[h, h], [h, -h]])
        H8 = h
    return H8


H4 = np.array([[1, 1, 1, 1], [1, -1, 1, -1],
               [1, 1, -1, -1], [1, -1, -1, 1]], dtype=np.int64)


def satd_many(diffs: np.ndarray) -> np.ndarray:
    """Hadamard SATD per block for a batch of difference blocks [..., N, N]
    (reference TComRdCost::xCalcHADs8x8, tiled; 4x4 variant for N=4)."""
    n = diffs.shape[-1]
    t = 8 if n >= 8 else 4
    h = _hadamard8().astype(np.int64) if t == 8 else H4
    lead = diffs.shape[:-2]
    d = diffs.astype(np.int64).reshape(lead + (n // t, t, n // t, t))
    d = np.swapaxes(d, -3, -2)                      # [..., n/t, n/t, t, t]
    m = h @ d @ h                                   # broadcasted matmuls
    per = np.abs(m).sum(axis=(-1, -2))
    per = (per + (2 if t == 8 else 1)) >> (2 if t == 8 else 1)
    return per.sum(axis=(-1, -2))


def satd(a: np.ndarray, b: np.ndarray) -> int:
    return int(satd_many((a.astype(np.int64) - b.astype(np.int64))[None])[0])


def mpm_list(mode_map: np.ndarray, x0: int, y0: int, avail: AvailabilityMap,
             ctu_size: int = 64) -> List[int]:
    """Mirror of the native mpm_list (spec 8.4.2)."""
    a = b = 1
    if avail.is_available(x0 - 1, y0, x0, y0):
        a = int(mode_map[y0 >> 2, (x0 - 1) >> 2])
    if avail.is_available(x0, y0 - 1, x0, y0) and (y0 % ctu_size) != 0:
        b = int(mode_map[(y0 - 1) >> 2, x0 >> 2])
    if a == b:
        if a < 2:
            return [0, 1, 26]
        return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
    c = 0 if (a != 0 and b != 0) else (1 if (a != 1 and b != 1) else 26)
    return [a, b, c]


class IntraFrameEncoder:
    def __init__(self, sps: SPS, qp: int, lam=None):
        self.sps = sps
        self.qp = qp
        self.bd = sps.bit_depth_luma
        # sample dtype: int16 through 14-bit internal depth, int32 at 16
        self._pdt = np.int16 if self.bd <= 14 else np.int32
        self.w = sps.pic_width_in_luma_samples
        self.h = sps.pic_height_in_luma_samples
        self.ctu = sps.ctu_size
        self.avail = AvailabilityMap(self.w, self.h, self.ctu)
        # HM I-slice lambda model (TEncSlice::initEncSlice; EncoderTop
        # passes the exact picture lambda incl. the GOP-size scale)
        if lam is None:
            lam = 0.57 * (2.0 ** ((qp - 12) / 3.0))
        self.lam = lam
        self.sqrt_lam = math.sqrt(self.lam)
        self.cu_depth_target = 1  # default 32x32 CUs; refined by planner
        self.cfmt = sps.chroma_format_idc
        self.cs = 0 if self.cfmt == 3 else 1  # chroma coordinate shift

    # ---- per-TB helpers ---------------------------------------------------
    def _refs(self, plane, x0, y0, size, luma_pos=None):
        f = build_ref_vector(plane, x0, y0, size, self.avail, self.bd,
                             luma_pos=luma_pos)
        strong = (self.sps.strong_intra_smoothing_enabled_flag
                  and strong_smoothing_decision(f, size, self.bd))
        ff = filter_ref_samples(f, size, self.bd, strong_smoothing=strong)
        return f, ff

    def _predict(self, f, ff, mode, size, is_luma):
        # the hor/ver/DC boundary filters are disabled for lossless CUs
        # when implicit RDPCM is enabled (reference TComPrediction.cpp:481
        # enableEdgeFilters; mirrored by decoder/recon.py _intra_tb)
        edge = not (getattr(self, "lossless", False)
                    and self.sps.implicit_rdpcm_enabled_flag)
        return intra_np.predict_mode(f, ff, mode, size, self.bd, is_luma,
                                     edge_filters=edge)

    def _mode_bits(self, mode, mpms):
        if mode == mpms[0]:
            return 2
        if mode in mpms[1:]:
            return 3
        return 6

    def _scaling_of(self, size, c_idx):
        """Quant/dequant scaling matrix (explicit list, default, or None
        for flat) — must mirror the decoder's dequant choice exactly."""
        if not self.sps.scaling_list_enabled_flag:
            return None
        sld = self.sps.scaling_list_data
        if sld is not None:
            return sld.matrix(size, c_idx, True)
        return tables.default_scaling_matrix(size, True)

    def _code_tb(self, orig_tb, pred, size, is_luma, is_dst, c_idx=0,
                 mode=None):
        """residual -> (levels, recon_tb). mode: the TB's intra
        prediction mode (implicit RDPCM direction under lossless)."""
        resi = orig_tb.astype(np.int32) - pred.astype(np.int32)
        if getattr(self, "lossless", False):
            # cu_transquant_bypass: residual passes straight through,
            # modified by the RExt lossless tools in the inverse order
            # the decoder applies them (recon._resid: rotation, then
            # RDPCM accumulation)
            lv = resi.copy()
            if (self.sps.implicit_rdpcm_enabled_flag
                    and mode in (10, 26)):
                # implicit residual DPCM along the prediction direction
                # (reference TComTrQuant bypass RDPCM branch)
                if mode == 10:
                    lv[:, 1:] = resi[:, 1:] - resi[:, :-1]
                else:
                    lv[1:, :] = resi[1:, :] - resi[:-1, :]
            if (size == 4
                    and self.sps.transform_skip_rotation_enabled_flag):
                lv = lv[::-1, ::-1]
            return lv, orig_tb.astype(np.int32)
        coeff = forward_transform_np(resi, size, self.bd, is_dst=is_dst)
        qp = self.qp if is_luma else tables.chroma_qp(
            self.qp, self.sps.chroma_format_idc,
            getattr(self, "cqp_off", (0, 0))[max(0, c_idx - 1)])
        sm = self._scaling_of(size, c_idx)
        levels = quantize_np(coeff, size, qp, self.bd, is_intra=True,
                             scaling=sm)
        if not levels.any():
            return levels, np.clip(pred, 0, (1 << self.bd) - 1)
        deq = dequantize_np(levels, size, qp, self.bd, scaling=sm)
        r = inverse_transform_np(deq, size, self.bd, is_dst=is_dst)
        recon = np.clip(pred.astype(np.int32) + r, 0, (1 << self.bd) - 1)
        return levels, recon

    # ---- frame encode -----------------------------------------------------
    def encode_frame(self, orig: List[np.ndarray]):
        """Returns (ctu_decisions_list, recon_planes). Sequential z-order
        walk; recon planes grow as TBs complete (availability-correct)."""
        w, h, ctu = self.w, self.h, self.ctu
        sx, sy = self.sps.chroma_shift_x, self.sps.chroma_shift_y
        # sample dtype: int16 through 14-bit internal depth, int32 at 16
        pdt = self._pdt  # noqa: F841 (kept for local readers)
        recon = [np.zeros((h, w), pdt),
                 np.zeros((h >> sy, w >> sx), pdt),
                 np.zeros((h >> sy, w >> sx), pdt)]
        mode_map = np.full((h + 3 >> 2, (w + 3) >> 2), 1, np.uint8)
        ctus_w = -(-w // ctu)
        ctus_h = -(-h // ctu)
        decisions = []
        for cy in range(ctus_h):
            for cx in range(ctus_w):
                d = CtuDecisions(ctu, chroma_format=self.cfmt)
                d.cu_depth[:] = self.cu_depth_target
                x0c, y0c = cx * ctu, cy * ctu
                for (x0, y0, log2) in cu_leaves(
                        d.cu_depth, x0c, y0c, w, h,
                        ctu_log2=tables.log2(ctu),
                        min_cb_log2=self.sps.log2_min_luma_coding_block_size_minus3 + 3):
                    self._encode_cu(orig, recon, mode_map, d, x0c, y0c,
                                    x0, y0, log2)
                decisions.append(d)
        return decisions, recon

    def _encode_cu(self, orig, recon, mode_map, d, ctu_x0, ctu_y0,
                   x0, y0, log2):
        size = 1 << log2
        bx, by = (x0 - ctu_x0) >> 2, (y0 - ctu_y0) >> 2
        nb = size >> 2

        # ---- luma mode decision (SATD + mode bits over all 35 modes) ----
        f, ff = self._refs(recon[0], x0, y0, size)
        orig_tb = orig[0][y0:y0 + size, x0:x0 + size]
        mpms = mpm_list(mode_map, x0, y0, self.avail, self.ctu)
        preds = np.stack([self._predict(f, ff, m, size, True)
                          for m in range(35)])
        satds = satd_many(orig_tb.astype(np.int64)[None] - preds)
        bits = np.array([self._mode_bits(m, mpms) for m in range(35)])
        costs = satds + (self.sqrt_lam * bits + 0.5).astype(np.int64)
        mode = int(np.argmin(costs))
        best_pred = preds[mode]

        d.luma_mode[by:by + nb, bx:bx + nb] = mode
        d.chroma_mode[by:by + nb, bx:bx + nb] = mode  # DM
        mode_map[y0 >> 2:(y0 + size) >> 2, x0 >> 2:(x0 + size) >> 2] = mode

        # ---- TU walk (TU == CU unless forced) ----
        cu_depth = tables.log2(self.ctu) - log2
        for (tx, ty, tlog2, tdepth, blk) in tu_leaves(
                d.tu_depth, x0, y0, log2, ctu_x0, ctu_y0, intra_split=False,
                max_tu_depth_intra=self.sps.max_transform_hierarchy_depth_intra):
            tsize = 1 << tlog2
            # luma TB: prediction must be redone per TB from recon if TU<CU;
            # with TU==CU reuse best_pred.
            if (tx, ty, tsize) == (x0, y0, size):
                pred = best_pred
                ftb, fftb = f, ff
            else:
                ftb, fftb = self._refs(recon[0], tx, ty, tsize)
                pred = self._predict(ftb, fftb, mode, tsize, True)
            is_dst = tlog2 == 2
            levels, rec = self._code_tb(
                orig[0][ty:ty + tsize, tx:tx + tsize], pred, tsize, True,
                is_dst, mode=mode)
            d.coeff_y[ty - ctu_y0:ty - ctu_y0 + tsize,
                      tx - ctu_x0:tx - ctu_x0 + tsize] = levels.astype(np.int16)
            recon[0][ty:ty + tsize, tx:tx + tsize] = rec.astype(self._pdt)

            # chroma TBs at this TU: half-size in 4:2:0, full-size in
            # 4:4:4 (where smoothing applies to chroma too, spec 8.4.4.2.3,
            # but the luma-only edge/DC boundary filters do not); 4:2:2
            # codes TWO square sub-TBs stacked vertically per luma TB with
            # the Table 8-3 remapped direction (reference TComTU sub-TU
            # iteration, g_chroma422IntraAngleMappingTable)
            if self.cfmt == 0:
                continue  # monochrome: no chroma TBs
            cs = self.cs
            if cs == 1:
                assert tlog2 > 2, "4x4 luma TUs need blk3 chroma handling"
            if self.cfmt == 2:
                csize = tsize >> 1
                cmode = tables.CHROMA_422_ANGLE_MAP[mode]
                for half in range(2):
                    hy = ty + half * csize      # luma == chroma row
                    cxx = tx >> 1
                    for ci, plane in ((1, recon[1]), (2, recon[2])):
                        fc = build_ref_vector(
                            plane, cxx, hy, csize, self.avail,
                            self.sps.bit_depth_chroma,
                            luma_pos=(tx, hy, 2, 1))
                        ffc = filter_ref_samples(
                            fc, csize, self.sps.bit_depth_chroma)
                        predc = intra_np.predict_mode(
                            fc, ffc, cmode, csize,
                            self.sps.bit_depth_chroma,
                            is_luma=False, smooth=False)
                        lv, recc = self._code_tb(
                            orig[ci][hy:hy + csize, cxx:cxx + csize],
                            predc, csize, False, False, c_idx=ci,
                            mode=cmode)
                        tgt = d.coeff_cb if ci == 1 else d.coeff_cr
                        tgt[hy - ctu_y0:hy - ctu_y0 + csize,
                            cxx - (ctu_x0 >> 1):
                            cxx - (ctu_x0 >> 1) + csize] = \
                            lv.astype(np.int16)
                        plane[hy:hy + csize, cxx:cxx + csize] = \
                            recc.astype(self._pdt)
                continue
            csize = tsize >> cs
            cxx, cyy = tx >> cs, ty >> cs
            scale = 1 << cs
            for ci, plane in ((1, recon[1]), (2, recon[2])):
                fc = build_ref_vector(plane, cxx, cyy, csize, self.avail,
                                      self.sps.bit_depth_chroma,
                                      luma_pos=(tx, ty, scale, scale))
                ffc = filter_ref_samples(fc, csize, self.sps.bit_depth_chroma)
                predc = intra_np.predict_mode(
                    fc, ffc, mode, csize, self.sps.bit_depth_chroma,
                    is_luma=False, smooth=(cs == 0))
                lv, recc = self._code_tb(
                    orig[ci][cyy:cyy + csize, cxx:cxx + csize], predc,
                    csize, False, False, c_idx=ci, mode=mode)
                tgt = d.coeff_cb if ci == 1 else d.coeff_cr
                tgt[cyy - (ctu_y0 >> cs):cyy - (ctu_y0 >> cs) + csize,
                    cxx - (ctu_x0 >> cs):cxx - (ctu_x0 >> cs) + csize] = \
                    lv.astype(np.int16)
                plane[cyy:cyy + csize, cxx:cxx + csize] = \
                    recc.astype(self._pdt)
