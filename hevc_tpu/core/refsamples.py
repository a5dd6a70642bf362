"""Intra reference-sample fetch + substitution (spec 8.4.4.2.2).

Shared by encoder and decoder so both derive bit-identical predictions.
Parity: reference TComPattern.cpp initIntraPatternChType / fillReferenceSamples.

Combined reference vector layout f[0..4N] (see hevc_tpu.ops.intra):
  f[i], i in [0, 2N)  : left column, f[2N-1-y] = p[-1][y], y in [0, 2N)
  f[2N]               : corner p[-1][-1]
  f[2N+1+x]           : top row p[x][-1], x in [0, 2N)
"""
from __future__ import annotations

import numpy as np

from .geometry import AvailabilityMap


def build_ref_vector(plane: np.ndarray, x0: int, y0: int, size: int,
                     avail: AvailabilityMap, bit_depth: int,
                     luma_pos=None) -> np.ndarray:
    """Reference vector for the TU at (x0, y0) of `size` on `plane`.

    `plane` is the working reconstruction at this component's resolution.
    `avail` decides availability in LUMA coordinates: for chroma planes pass
    `luma_pos = (luma_x0, luma_y0, scale_x, scale_y)` so the z-scan
    availability rule is evaluated on luma positions (spec 6.4.1 operates on
    luma locations; chroma availability mirrors the collocated luma block).
    """
    n = size
    nn = 4 * n + 1
    f = np.empty(nn, dtype=np.int32)
    have = np.zeros(nn, dtype=bool)
    h, w = plane.shape

    if luma_pos is None:
        lx0, ly0, sx, sy = x0, y0, 1, 1
    else:
        lx0, ly0, sx, sy = luma_pos

    def sample_avail(cx: int, cy: int) -> bool:
        # (cx, cy) are component-plane coords; availability is checked at the
        # collocated luma position (spec 6.4.1 works in luma units), picture
        # bounds at component resolution. A neighbour one sample left/above
        # the block maps to one luma sample left/above the luma block.
        if cx < 0 or cy < 0 or cx >= w or cy >= h:
            return False
        dx, dy = cx - x0, cy - y0
        lx = lx0 - 1 if dx == -1 else lx0 + dx * sx
        ly = ly0 - 1 if dy == -1 else ly0 + dy * sy
        return avail.is_available(lx, ly, lx0, ly0)

    # left column (includes below-left): f[2N-1-y] = p[-1][y]
    for y in range(2 * n):
        ok = sample_avail(x0 - 1, y0 + y)
        have[2 * n - 1 - y] = ok
        f[2 * n - 1 - y] = plane[y0 + y, x0 - 1] if ok else 0
    # corner
    ok = sample_avail(x0 - 1, y0 - 1)
    have[2 * n] = ok
    f[2 * n] = plane[y0 - 1, x0 - 1] if ok else 0
    # top row (includes above-right): f[2N+1+x] = p[x][-1]
    for x in range(2 * n):
        ok = sample_avail(x0 + x, y0 - 1)
        have[2 * n + 1 + x] = ok
        f[2 * n + 1 + x] = plane[y0 - 1, x0 + x] if ok else 0

    # Substitution (8.4.4.2.2): if nothing available, mid-grey; else fill
    # f[0] from the first available sample scanning upward, then propagate.
    if not have.any():
        f[:] = 1 << (bit_depth - 1)
        return f
    if not have[0]:
        first = int(np.argmax(have))
        f[0] = f[first]
        have[0] = True
    for i in range(1, nn):
        if not have[i]:
            f[i] = f[i - 1]
    return f
