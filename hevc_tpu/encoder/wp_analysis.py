"""Weighted-prediction analysis (reference WeightPredAnalysis.cpp).

HM derives explicit weights from whole-picture AC/DC statistics of the
ORIGINAL pictures (xCalcACDCParamSlice:67), fits weight = curAC/refAC
and offset = curDC - w*refDC per reference and component with an
iterative denom reduction to satisfy the +-128 range
(xUpdatingWPParameters:199), then keeps a reference's weights only when
the weighted whole-picture SAD beats the unweighted one by more than 1%
(xSelectWP:274, DTHRESH 0.99)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

DTHRESH = 0.99


def calc_acdc(planes: List[np.ndarray]) -> List[Tuple[int, int]]:
    """Per-component (DC, AC) of one original picture (reference
    xCalcACDCParamSlice: DC = rounded mean, AC = sum |p - DC|)."""
    out = []
    for p in planes:
        n = p.size
        s = int(p.astype(np.int64).sum())
        dc = (s + (n >> 1)) // n
        ac = int(np.abs(p.astype(np.int64) - dc).sum())
        out.append((dc, ac))
    return out


def _fit(cur, ref, denom, bit_depth):
    """One (ref, comp) weight/offset fit at the given denom. Returns
    (weight, clipped_offset) or None when the weight leaves the range
    (reference xUpdatingWPParameters)."""
    weights = []
    for comp in range(3):
        cur_dc, cur_ac = cur[comp]
        ref_dc, ref_ac = ref[comp]
        rng = 128
        real_denom = denom + (bit_depth - 8)
        real_off = 1 << (real_denom - 1)
        dw = 1.0 if ref_ac == 0 else min(15.0, max(-16.0, cur_ac / ref_ac))
        w = int(0.5 + dw * (1 << denom))
        off = int((cur_dc << denom) - w * ref_dc + real_off) >> real_denom
        if comp:  # chroma offset range limitation
            pred = rng - ((rng * w) >> denom)
            d_off = min(4 * rng - 1, max(-4 * rng, off - pred))
            off = min(rng - 1, max(-rng, d_off + pred))
        else:
            off = min(rng - 1, max(-rng, off))
        if not (-rng <= (1 << denom) - w < rng):
            return None
        weights.append((w, off))
    return weights


def _sad(org, ref, denom, w, off, bit_depth):
    real_denom = denom + (bit_depth - 8)
    v = ((org.astype(np.int64) << denom)
         - (ref.astype(np.int64) * w + (off << real_denom)))
    return int(np.abs(v).sum()) // org.size


def analyse_wp(cur_acdc, ref_acdcs, orig_planes, ref_recons, bit_depth,
               n_l0: int):
    """Full list-0 analysis. ref_acdcs[i]: the i-th reference's original
    AC/DC stats; ref_recons[i]: its reconstructed planes (xSelectWP
    compares against recon). Returns (log2_denom, tables) with
    tables[i] = [(w, o) x 3 components] or None when that reference
    keeps default weighting."""
    denom = 7 if n_l0 > 3 else 6
    while True:
        fits = [_fit(cur_acdc, ra, denom, bit_depth) for ra in ref_acdcs]
        if all(f is not None for f in fits):
            break
        denom -= 1
    tables: List[Optional[list]] = []
    default_w = 1 << denom
    for i, f in enumerate(fits):
        sad_wp = sad_no = 0
        for comp in range(3):
            w, o = f[comp]
            sad_wp += _sad(orig_planes[comp], ref_recons[i][comp],
                           denom, w, o, bit_depth)
            sad_no += _sad(orig_planes[comp], ref_recons[i][comp],
                           denom, default_w, 0, bit_depth)
        ratio = sad_wp / sad_no if sad_no else 1.0
        tables.append(None if ratio >= DTHRESH else f)
    return denom, tables
