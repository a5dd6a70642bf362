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


def _value_noise(w, h, cell, rng):
    """Smooth multi-octave value noise (bicubic-ish upsampled lattice):
    the low-pass spatial statistics of natural images, unlike the
    white-noise texture of make_frame."""
    gh, gw = h // cell + 3, w // cell + 3
    g = rng.standard_normal((gh, gw))
    # separable cubic smoothing upsample
    ys = (np.arange(h) / cell)
    xs = (np.arange(w) / cell)
    yi = ys.astype(int)
    xi = xs.astype(int)
    ty = (ys - yi)[:, None]
    tx = (xs - xi)[None, :]
    sy = ty * ty * (3 - 2 * ty)
    sx = tx * tx * (3 - 2 * tx)
    g00 = g[yi][:, xi]
    g01 = g[yi][:, xi + 1]
    g10 = g[yi + 1][:, xi]
    g11 = g[yi + 1][:, xi + 1]
    return (g00 * (1 - sy) * (1 - sx) + g01 * (1 - sy) * sx
            + g10 * sy * (1 - sx) + g11 * sy * sx)


def make_natural_frame(w, h, t, bit_depth=8, seed=77):
    """Deterministic procedurally-textured 'natural-content' frame:
    multi-octave value noise as background terrain plus a foreground
    layer translating at a different velocity (motion parallax) and a
    slow global pan — smooth gradients, soft edges, temporally coherent
    motion. Complements make_frame's synthetic noise+edges content for
    RD gates (natural statistics reward good mode decision / RDOQ the
    way camera content does)."""
    rng = np.random.default_rng(seed)
    maxval = (1 << bit_depth) - 1
    m = 96  # motion margin
    W, H = w + 2 * m, h + 2 * m
    # static world layers, built once per seed (cache on the function)
    key = (W, H, seed)
    cache = make_natural_frame.__dict__.setdefault("_cache", {})
    if key not in cache:
        bg = (_value_noise(W, H, 48, rng) * 0.7
              + _value_noise(W, H, 16, rng) * 0.25
              + _value_noise(W, H, 6, rng) * 0.08)
        fg = (_value_noise(W, H, 24, rng) * 0.8
              + _value_noise(W, H, 8, rng) * 0.2)
        # foreground alpha: soft blobs covering ~35% of the frame
        a = _value_noise(W, H, 40, rng)
        alpha = np.clip((a - 0.15) * 4.0, 0.0, 1.0)
        cu = _value_noise(W, H, 32, rng)
        cv = _value_noise(W, H, 32, rng)
        cache[key] = (bg, fg, alpha, cu, cv)
    bg, fg, alpha, cu, cv = cache[key]
    # layer velocities (quarter-ish pel realism via sub-integer steps
    # rounded per frame): background pans slowly, foreground faster
    bx, by = int(round(1.3 * t)), int(round(0.6 * t))
    fx, fy = int(round(3.4 * t)), int(round(-1.1 * t))
    bwin = bg[m - by:m - by + h, m - bx:m - bx + w]
    fwin = fg[m - fy:m - fy + h, m - fx:m - fx + w]
    awin = alpha[m - fy:m - fy + h, m - fx:m - fx + w]
    yf = bwin * (1 - awin) + fwin * awin
    y = np.clip((yf * 0.28 + 0.5) * maxval, 0, maxval).astype(np.int32)
    u = np.clip((cu[m - by // 2:, m - bx // 2:][:h, :w] * 0.12 + 0.5)
                * maxval, 0, maxval)
    v = np.clip((cv[m - by // 2:, m - bx // 2:][:h, :w] * 0.12 + 0.5)
                * maxval, 0, maxval)
    return (y, u[::2, ::2].astype(np.int32), v[::2, ::2].astype(np.int32))


def write_clip(path, w, h, frames, bit_depth=8, content="synthetic"):
    dtype = "<u2" if bit_depth > 8 else "u1"
    mk = make_natural_frame if content == "natural" else make_frame
    with open(path, "wb") as fh:
        for t in range(frames):
            for p in mk(w, h, t, bit_depth):
                fh.write(p.astype(dtype).tobytes())


if __name__ == "__main__":
    out, w, h, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    bd = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    write_clip(out, w, h, n, bd)
    print(f"wrote {out}: {w}x{h} x{n} @{bd}bit")
