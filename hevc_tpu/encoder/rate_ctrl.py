"""R-lambda rate control (sequence / GOP / picture hierarchy).

Parity: reference TEncRateCtrl.{h,cpp} —
  TEncRCSeq:  sequence bit budget, frames/bits-left bookkeeping (:77-300)
  TEncRCGOP:  GOP target via the smoothing window (xEstGOPTargetBits,
              g_RCSmoothWindowSize = 40)
  TEncRCPic:  lambda = alpha * bpp^beta (estimatePicLambda :629), QP from
              lambda, model update updateAfterPicture (:1001) with HM's
              alpha/beta delta rule, intra model calculateLambdaIntra
              (:1090) driven by a SATD-like complexity measure.
CTU-level allocation (getLCUTargetBpp/getLCUEstLambda) is lcu_qps below,
redesigned feed-forward for the wavefront engine.
"""
from __future__ import annotations

import math

SMOOTH_WINDOW = 40       # g_RCSmoothWindowSize
ALPHA_DELTA = 0.10       # g_RCAlphaUpdateValue
BETA_DELTA = 0.05        # g_RCBetaUpdateValue


class RateController:
    ALPHA0 = 3.2003
    BETA0 = -1.367
    ALPHA_I = 6.7542     # intra model (reference InitRCModel intra)
    BETA_I = 1.7860

    def __init__(self, target_kbps: float, frame_rate: float, width: int,
                 height: int, total_frames: int = 0, gop_size: int = 4):
        self.pixels = width * height
        self.fps = max(frame_rate, 1)
        self.bits_per_frame = target_kbps * 1000.0 / self.fps
        self.gop_size = max(1, gop_size)
        # sequence level (TEncRCSeq): known-length clips get an exact
        # budget; open-ended streams use a rolling horizon
        self.total_frames = total_frames
        self.frames_left = total_frames if total_frames else 0
        self.bits_left = self.bits_per_frame * total_frames \
            if total_frames else 0.0
        self.alpha = self.ALPHA0
        self.beta = self.BETA0
        self.prev_qp = None
        self.prev_lambda = None
        self._gop_frames_left = 0
        self._gop_bits_left = 0.0

    # -- GOP level (TEncRCGOP::xEstGOPTargetBits) ----------------------
    def _begin_gop(self) -> None:
        n = self.gop_size
        if self.total_frames:
            left = max(self.frames_left, 1)
            n = min(n, left)
            win = min(SMOOTH_WINDOW, left)
            avg = self.bits_per_frame
            cur = (self.bits_left - avg * (left - win)) / win
            target = max(cur, avg * 0.1) * n
        else:
            target = self.bits_per_frame * n
        self._gop_frames_left = n
        self._gop_bits_left = target

    def pic_target_bits(self, is_intra: bool) -> float:
        if self._gop_frames_left <= 0:
            self._begin_gop()
        share = self._gop_bits_left / max(self._gop_frames_left, 1)
        if is_intra:
            # intra pictures take a larger share (reference
            # xCalAvgBits intra ratio; cost paid back over the window)
            share *= 4.0
        return max(share, self.pixels * 0.01)

    # -- picture level -------------------------------------------------
    def pic_qp(self, is_intra: bool, complexity: float = 0.0) -> int:
        target = self.pic_target_bits(is_intra)
        bpp = target / self.pixels
        if is_intra and complexity > 0:
            # reference calculateLambdaIntra (:1090): lambda =
            # (alpha/256) * (MAD^BETA1 / bpp)^beta, BETA1 = 1.2517
            c = complexity / self.pixels
            lam = (self.ALPHA_I / 256.0) * \
                ((c ** 1.2517) / max(bpp, 1e-6)) ** self.BETA_I
        else:
            lam = self.alpha * (bpp ** self.beta)
        if self.prev_lambda is not None:
            lam = min(max(lam, self.prev_lambda * 0.3),
                      self.prev_lambda * 3.0)   # 10*0.1..10 clip, tighter
        lam = min(max(lam, 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        if self.prev_qp is not None and not is_intra:
            qp = min(max(qp, self.prev_qp - 3), self.prev_qp + 3)
        qp = min(max(qp, 0), 51)
        self._last = (lam, bpp, is_intra, target)
        self.prev_qp = qp
        self.prev_lambda = lam
        return qp

    def update(self, actual_bits: int) -> None:
        lam, bpp_t, is_intra, target = self._last
        bpp_real = max(actual_bits / self.pixels, 1e-6)
        # sequence + GOP bookkeeping
        if self.total_frames:
            self.bits_left -= actual_bits
            self.frames_left -= 1
        self._gop_bits_left -= actual_bits
        self._gop_frames_left -= 1
        if is_intra:
            return  # intra model is complexity-driven, not alpha/beta
        # reference updateAfterPicture alpha/beta refresh
        cal = max(self.alpha * (bpp_real ** self.beta), 1e-6)
        ln_err = math.log(lam) - math.log(cal)
        self.alpha += ALPHA_DELTA * ln_err * self.alpha
        self.beta += BETA_DELTA * ln_err * \
            min(max(math.log(bpp_real), -5.0), -0.1)
        self.alpha = min(max(self.alpha, 0.05), 500.0)
        self.beta = min(max(self.beta, -3.0), -0.1)


def intra_complexity(luma) -> float:
    """SATD-like intra complexity (reference TEncRCPic::
    calCostSliceI's 8x8 Hadamard-DC measure, approximated by the mean
    absolute deviation from per-8x8 block means)."""
    import numpy as np
    h, w = luma.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    b = luma[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).astype(np.float64)
    means = b.mean(axis=(1, 3), keepdims=True)
    return float(np.abs(b - means).sum())


def lcu_qps(luma, ref_luma, ctu_size: int, pic_qp: int,
            clip_range: int = 2, wpp: bool = False):
    """CTU-level QP allocation (reference TEncRCPic::getLCUTargetBpp /
    getLCUEstLambda, redesigned feed-forward so the wavefront engine can
    run all CTUs in parallel): the picture's bit budget is spread over
    CTUs proportionally to prediction-error complexity (SATD-like SAD vs
    the reference picture, or variance for intra); lambda per CTU scales
    with the inverse share, QP = pic_qp + 3*log2(w_avg/w_ctu) clipped to
    +-clip_range (the reference clips LCU QP the same way).

    wpp: WPP-aware row allocation (reference TEncRateCtrl.cpp:761-884
    balances the remaining bits across CTU rows under
    WaveFrontSynchro). The wavefront couples each row to its upper
    neighbour, so row budgets are smoothed over a 3-row window before
    per-CTU scaling — rows then carry budgets proportional to their
    neighbourhood's complexity instead of oscillating per row, the
    feed-forward analogue of HM's running per-row balancing."""
    import numpy as np
    h, w = luma.shape
    cw = (w + ctu_size - 1) // ctu_size
    ch = (h + ctu_size - 1) // ctu_size
    wgt = np.zeros((ch, cw))
    for cy in range(ch):
        for cx in range(cw):
            o = luma[cy * ctu_size:(cy + 1) * ctu_size,
                     cx * ctu_size:(cx + 1) * ctu_size].astype(np.float64)
            if ref_luma is not None:
                r = ref_luma[cy * ctu_size:(cy + 1) * ctu_size,
                             cx * ctu_size:(cx + 1) * ctu_size]
                wgt[cy, cx] = np.abs(o - r).mean() + 0.1
            else:
                wgt[cy, cx] = o.var() ** 0.5 + 0.1
    if wpp and ch > 1:
        row_w = wgt.mean(axis=1, keepdims=True)
        sm = row_w.copy()
        sm[1:-1] = (row_w[:-2] + 2.0 * row_w[1:-1] + row_w[2:]) / 4.0
        sm[0] = (2.0 * row_w[0] + row_w[1]) / 3.0
        sm[-1] = (2.0 * row_w[-1] + row_w[-2]) / 3.0
        wgt = wgt * (sm / np.maximum(row_w, 1e-9))
    avg = wgt.mean()
    dqp = np.round(3.0 * np.log2(wgt / avg))
    dqp = np.clip(dqp, -clip_range, clip_range)
    return np.clip(pic_qp + dqp, 0, 51).astype(np.int8)
