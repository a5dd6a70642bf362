"""R-lambda rate control (picture level).

Parity: reference TEncRateCtrl.{h,cpp} — TEncRCSeq sequence-level bit
allocation (:77-300), TEncRCPic::estimatePicLambda (:629) and the
alpha/beta model update updateAfterPicture (:1001), reduced to
picture-level control (the reference's CTU-level loop TEncRCPic::
getLCUTargetBpp/getLCUEstLambda is a later stage).

Model: lambda = alpha * bpp^beta; QP = 4.2005 ln(lambda) + 13.7122.
"""
from __future__ import annotations

import math


class RateController:
    ALPHA0 = 3.2003
    BETA0 = -1.367

    def __init__(self, target_kbps: float, frame_rate: float, width: int,
                 height: int, total_frames: int = 0):
        self.pixels = width * height
        self.bits_per_frame = target_kbps * 1000.0 / frame_rate
        self.alpha = self.ALPHA0
        self.beta = self.BETA0
        self.buffer = 0.0          # accumulated (target - actual)
        self.prev_qp = None

    def pic_target_bits(self, is_intra: bool) -> float:
        # intra pictures get a larger share (reference xCalcAvgBits ratio)
        base = self.bits_per_frame + 0.35 * self.buffer
        if is_intra:
            base *= 4.0
        return max(base, self.pixels * 0.01)

    def pic_qp(self, is_intra: bool) -> int:
        bpp = self.pic_target_bits(is_intra) / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        lam = min(max(lam, 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        if self.prev_qp is not None and not is_intra:
            qp = min(max(qp, self.prev_qp - 3), self.prev_qp + 3)
        qp = min(max(qp, 0), 51)
        self._last = (lam, bpp, is_intra)
        self.prev_qp = qp
        return qp

    def update(self, actual_bits: int) -> None:
        lam, bpp_t, is_intra = self._last
        bpp_real = actual_bits / self.pixels
        self.buffer += self.pic_target_bits(is_intra) - actual_bits
        # model refresh (reference updateAfterPicture)
        ln_err = math.log(lam) - math.log(
            max(self.alpha * (bpp_real ** self.beta), 1e-6))
        self.alpha += 0.10 * ln_err * self.alpha
        self.beta += 0.05 * ln_err * math.log(max(bpp_real, 1e-6))
        self.alpha = min(max(self.alpha, 0.05), 500.0)
        self.beta = min(max(self.beta, -3.0), -0.1)


def lcu_qps(luma, ref_luma, ctu_size: int, pic_qp: int,
            clip_range: int = 2):
    """CTU-level QP allocation (reference TEncRCPic::getLCUTargetBpp /
    getLCUEstLambda, redesigned feed-forward so the wavefront engine can
    run all CTUs in parallel): the picture's bit budget is spread over
    CTUs proportionally to prediction-error complexity (SATD-like SAD vs
    the reference picture, or variance for intra); lambda per CTU scales
    with the inverse share, QP = pic_qp + 3*log2(w_avg/w_ctu) clipped to
    +-clip_range (the reference clips LCU QP the same way)."""
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
    avg = wgt.mean()
    dqp = np.round(3.0 * np.log2(wgt / avg))
    dqp = np.clip(dqp, -clip_range, clip_range)
    return np.clip(pic_qp + dqp, 0, 51).astype(np.int8)
