"""Device intra prescreen (ops/intra_screen.py): candidate lists must
match a per-block numpy oracle built from the same original-pixel
reference rules (mid-value outside the frame, clamped inside)."""
import numpy as np
import pytest

from hevc_tpu.ops import intra_np
from hevc_tpu.ops.intra_screen import (K_OF_LOG2, _mode_bits_est,
                                       screen_frame, screen_frame_async)


def _plane(w, h, seed=7, bit_depth=8):
    rng = np.random.default_rng(seed)
    maxv = (1 << bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w]
    y = (xx * 0.7 + yy * 0.35 + rng.integers(0, maxv // 4, (h, w))
         + (maxv / 4) * np.sin(xx / 9.0))
    return np.clip(y, 0, maxv).astype(np.int16)


def _oracle_modes(y, x0, y0, n, bit_depth, sqrt_lam):
    """All-35-mode cost list for one block, original-pixel references."""
    h, w = y.shape
    mid = 1 << (bit_depth - 1)

    def px(yy, xx):
        if yy < 0 or xx < 0:
            return mid
        return int(y[min(yy, h - 1), min(xx, w - 1)])

    f = np.zeros(4 * n + 1, np.int32)
    f[2 * n] = px(y0 - 1, x0 - 1)
    for i in range(2 * n):
        f[2 * n + 1 + i] = px(y0 - 1, x0 + i)          # top
        f[2 * n - 1 - i] = px(y0 + i, x0 - 1)          # left
    ff = f.copy()
    ff[1:-1] = (f[:-2] + 2 * f[1:-1] + f[2:] + 2) >> 2
    blk = y[y0:y0 + n, x0:x0 + n].astype(np.int64)
    costs = []
    for mode in range(35):
        pred = intra_np.predict_mode(f, ff, mode, n, bit_depth=bit_depth)
        costs.append(_satd(blk - pred)
                     + round(sqrt_lam * _mode_bits_est(mode)))
    return np.array(costs, np.int64)


def _satd(d):
    t = 8 if d.shape[0] >= 8 else 4
    hm = np.array([[1]])
    while hm.shape[0] < t:
        hm = np.block([[hm, hm], [hm, -hm]])
    n = d.shape[0]
    total = 0
    for by in range(0, n, t):
        for bx in range(0, n, t):
            m = hm @ d[by:by + t, bx:bx + t] @ hm
            s = np.abs(m).sum()
            total += (s + 2) >> 2 if t == 8 else (s + 1) >> 1
    return int(total)


@pytest.mark.parametrize("log2", [3, 4, 5])
def test_screen_matches_oracle(log2):
    y = _plane(96, 64)
    sqrt_lam = 11.3
    out = screen_frame(y, 8, sqrt_lam, log2s=(log2,))
    cands, _ = out[log2]
    n = 1 << log2
    ny, nx, k = cands.shape
    assert (ny, nx, k) == (64 // n, 96 // n, K_OF_LOG2[log2])
    for (by, bx) in [(0, 0), (0, nx - 1), (ny - 1, 0), (ny // 2, nx // 2)]:
        costs = _oracle_modes(y, bx * n, by * n, n, 8, sqrt_lam)
        order = np.lexsort((np.arange(35), costs))  # first-minimum ties
        np.testing.assert_array_equal(cands[by, bx], order[:k])


def test_async_equals_sync():
    y = _plane(64, 64, seed=3)
    a = screen_frame(y, 8, 9.0)
    b = screen_frame_async(y, 8, 9.0)()
    assert a.keys() == b.keys()
    for l2 in a:
        np.testing.assert_array_equal(a[l2][0], b[l2][0])


def test_screen_10bit():
    y = _plane(64, 64, seed=5, bit_depth=10)
    sqrt_lam = 20.0
    out = screen_frame(y, 10, sqrt_lam, log2s=(4,))
    cands, _ = out[4]
    costs = _oracle_modes(y, 16, 16, 16, 10, sqrt_lam)
    order = np.lexsort((np.arange(35), costs))
    np.testing.assert_array_equal(cands[1, 1], order[:3])
