#!/usr/bin/env python
"""Generate deterministic synthetic YUV test clips (moving textured
gradients + edges) used for conformance round-trips and benchmarks.

Usage: python tools/make_test_yuv.py OUT.yuv WIDTH HEIGHT FRAMES [BITDEPTH]
"""
import sys

import numpy as np


def make_frame(w, h, t, bit_depth=8, seed=1234):
    rng = np.random.default_rng(seed)  # static texture, motion via shift
    maxval = (1 << bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w]
    # moving diagonal gradient + sinusoid + static noise texture shifted by t
    tex = rng.integers(0, maxval // 8, size=(h + 64, w + 64))
    dx, dy = (3 * t) % 64, (2 * t) % 64
    y = (xx * 0.3 + yy * 0.2 + t * 4
         + (maxval / 3.0) * np.sin(xx / 17.0 + t * 0.3)
         + tex[dy:dy + h, dx:dx + w])
    # a moving bright square (hard edges exercise intra edges / ME)
    sx, sy = (40 + 5 * t) % max(w - 64, 1), (30 + 3 * t) % max(h - 64, 1)
    y[sy:sy + 48, sx:sx + 48] = maxval * 0.85
    y = np.clip(y, 0, maxval).astype(np.int32)
    u = np.clip((xx + 2 * t) * 0.5 + maxval / 2.0 - 40, 0, maxval)
    v = np.clip((yy - 3 * t) * 0.4 + maxval / 2.0, 0, maxval)
    u = u[::2, ::2].astype(np.int32)
    v = v[::2, ::2].astype(np.int32)
    return y, u, v


def write_clip(path, w, h, frames, bit_depth=8):
    dtype = "<u2" if bit_depth > 8 else "u1"
    with open(path, "wb") as fh:
        for t in range(frames):
            for p in make_frame(w, h, t, bit_depth):
                fh.write(p.astype(dtype).tobytes())


if __name__ == "__main__":
    out, w, h, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    bd = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    write_clip(out, w, h, n, bd)
    print(f"wrote {out}: {w}x{h} x{n} @{bd}bit")
