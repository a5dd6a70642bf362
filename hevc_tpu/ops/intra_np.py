"""Scalar numpy intra predictor (spec 8.4.4.2.4-8.4.4.2.6).

Used on the host recon path where per-TU sequential dependencies make tiny
device dispatches wasteful; the batched device twin is hevc_tpu.ops.intra
(mode-decision sweeps). Parity: reference TComPrediction.cpp predIntraAng.
"""
import numpy as np

from ..core import tables


def _filter_flag(mode, size, is_luma):
    if not is_luma or size == 4 or mode == 1:
        return False
    min_dist = min(abs(mode - 26), abs(mode - 10)) if mode != 0 else 10
    return min_dist > tables.INTRA_FILTER_THRESH[tables.log2(size)]


def _f_get(f, n, kind, i):
    """p[i][-1] (kind='top'), p[-1][i] (kind='left'), corner i ignored."""
    if kind == "corner":
        return int(f[2 * n])
    if kind == "top":
        return int(f[2 * n + 1 + i])
    return int(f[2 * n - 1 - i])


def predict_mode(f_unfilt, f_filt, mode, size, bit_depth=8, is_luma=True):
    n = size
    maxval = (1 << bit_depth) - 1
    f = f_filt if _filter_flag(mode, n, is_luma) else f_unfilt
    top = np.array([_f_get(f, n, "top", i) for i in range(2 * n)])
    left = np.array([_f_get(f, n, "left", i) for i in range(2 * n)])
    corner = _f_get(f, n, "corner", 0)
    utop = np.array([_f_get(f_unfilt, n, "top", i) for i in range(2 * n)])
    uleft = np.array([_f_get(f_unfilt, n, "left", i) for i in range(2 * n)])
    ucorner = _f_get(f_unfilt, n, "corner", 0)
    pred = np.zeros((n, n), dtype=np.int64)

    if mode == 0:  # planar
        for y in range(n):
            for x in range(n):
                pred[y, x] = ((n - 1 - x) * left[y] + (x + 1) * top[n]
                              + (n - 1 - y) * top[x] + (y + 1) * left[n]
                              + n) >> (tables.log2(n) + 1)
        return pred

    if mode == 1:  # DC
        dc = (int(utop[:n].sum()) + int(uleft[:n].sum()) + n) >> (
            tables.log2(n) + 1)
        pred[:, :] = dc
        if is_luma and n < 32:
            for x in range(1, n):
                pred[0, x] = (utop[x] + 3 * dc + 2) >> 2
            for y in range(1, n):
                pred[y, 0] = (uleft[y] + 3 * dc + 2) >> 2
            pred[0, 0] = (uleft[0] + 2 * dc + utop[0] + 2) >> 2
        return pred

    angle = tables.intra_angle(mode)
    if mode >= 18:  # vertical family
        ref = {}
        for x in range(0, 2 * n + 1):
            ref[x] = corner if x == 0 else top[x - 1]
        if angle < 0 and ((n * angle) >> 5) < -1:
            inv = tables.intra_inv_angle(mode)
            for x in range(-1, ((n * angle) >> 5) - 1, -1):
                q = (x * inv + 128) >> 8
                ref[x] = corner if q == 0 else left[q - 1]
        for y in range(n):
            ii = ((y + 1) * angle) >> 5
            fa = ((y + 1) * angle) & 31
            for x in range(n):
                if fa:
                    pred[y, x] = ((32 - fa) * ref[x + ii + 1]
                                  + fa * ref[x + ii + 2] + 16) >> 5
                else:
                    pred[y, x] = ref[x + ii + 1]
        if mode == 26 and is_luma and n < 32:
            for y in range(n):
                pred[y, 0] = np.clip(
                    utop[0] + ((uleft[y] - ucorner) >> 1), 0, maxval)
    else:  # horizontal family
        ref = {}
        for x in range(0, 2 * n + 1):
            ref[x] = corner if x == 0 else left[x - 1]
        if angle < 0 and ((n * angle) >> 5) < -1:
            inv = tables.intra_inv_angle(mode)
            for x in range(-1, ((n * angle) >> 5) - 1, -1):
                q = (x * inv + 128) >> 8
                ref[x] = corner if q == 0 else top[q - 1]
        for xx in range(n):
            ii = ((xx + 1) * angle) >> 5
            fa = ((xx + 1) * angle) & 31
            for yy in range(n):
                if fa:
                    v = ((32 - fa) * ref[yy + ii + 1]
                         + fa * ref[yy + ii + 2] + 16) >> 5
                else:
                    v = ref[yy + ii + 1]
                pred[yy, xx] = v
        if mode == 10 and is_luma and n < 32:
            for x in range(n):
                pred[0, x] = np.clip(
                    uleft[0] + ((utop[x] - ucorner) >> 1), 0, maxval)
    return pred
