"""Deep-bit-depth (Main10/12) MXU motion search: the hi/lo int8 plane
decomposition (ops/me_mxu.py _ssd_table_deep) must produce the exact
int32 SSD tables, and the full XLA search must match both its numpy twin
and a brute-force SSD+rate oracle. Mirrors the reference's single
depth-agnostic search path (cl/sad.cl; TypeDef.h:244)."""
import numpy as np
import pytest

import jax.numpy as jnp

from hevc_tpu.encoder.native_frame import PAD, batched_me_grid
from hevc_tpu.ops import me_mxu
from hevc_tpu.ops.interp import pad_plane


def _clip(depth, h, w, seed):
    rng = np.random.default_rng(seed)
    maxv = (1 << depth) - 1
    base = rng.integers(0, maxv + 1, size=(h + 8, w + 8)).astype(np.int32)
    ref = base[:h, :w]
    cur = base[3:3 + h, 2:2 + w].copy()
    return cur, ref


@pytest.mark.parametrize("depth", [10, 12, 16])
def test_deep_ssd_table_exact(depth):
    """_ssd_table_deep == direct int64 SSD for every (block, dy, dx)."""
    rng = np.random.default_rng(depth)
    size, r = 8, 3
    ny, nx = 2, 3
    aw = 2 * r + size
    maxv = (1 << depth) - 1
    orig = rng.integers(0, maxv + 1, (ny * size, nx * size)).astype(np.int32)
    roi = rng.integers(0, maxv + 1, ((ny - 1) * size + aw,
                                     (nx - 1) * size + aw)).astype(np.int32)
    got = np.asarray(me_mxu._ssd_table_deep(
        jnp.asarray(roi), jnp.asarray(orig), size=size, r=r, ny=ny, nx=nx,
        depth=depth))
    shift = max(0, depth - 10)
    o = orig >> shift
    rr = roi >> shift
    nyx = 2 * r + 1
    for by in range(ny):
        for bx in range(nx):
            blk = o[by * size:(by + 1) * size,
                    bx * size:(bx + 1) * size].astype(np.int64)
            for dy in range(nyx):
                for dx in range(nyx):
                    win = rr[by * size + dy:by * size + dy + size,
                             bx * size + dx:bx * size + dx + size]
                    exp = ((win.astype(np.int64) - blk) ** 2).sum()
                    assert got[by * nx + bx, dy, dx] == exp, (by, bx, dy, dx)


@pytest.mark.parametrize("depth", [10, 12, 16])
def test_deep_xla_matches_numpy_twin(depth):
    cur, ref = _clip(depth, 96, 128, seed=depth)
    dt = me_mxu.me_dtype(depth)
    refp = pad_plane(ref.astype(dt), PAD)
    size, r, lam = 32, 8, 900_000
    gx, gy = me_mxu.me_grid_ssd(
        np.ascontiguousarray(cur.astype(dt)),
        np.ascontiguousarray(refp.astype(dt)),
        size, r, lam, pad=PAD, depth=depth)
    ex, ey = me_mxu.me_grid_ssd_np(cur, refp, size, r, lam, pad=PAD,
                                   depth=depth)
    np.testing.assert_array_equal(gx, ex)
    np.testing.assert_array_equal(gy, ey)
    # the planted global shift (+3, +2) must be found somewhere
    assert (gy == 3).any() and (gx == 2).any()


def test_batched_me_grid_dispatches_deep():
    """encoder entry point routes 10-bit planes through the deep path and
    still equals the numpy twin (CPU backend)."""
    depth = 10
    cur, ref = _clip(depth, 64, 96, seed=7)
    refp = pad_plane(ref.astype(np.int16), PAD)
    size, r, lam = 32, 6, 500_000
    gx, gy = batched_me_grid(cur.astype(np.int16), refp.astype(np.int16),
                             size, r, lam, depth=depth)
    ex, ey = me_mxu.me_grid_ssd_np(cur, refp, size, r, lam, pad=PAD,
                                   depth=depth)
    np.testing.assert_array_equal(gx, ex)
    np.testing.assert_array_equal(gy, ey)


def test_deep_multi_ref_single_dispatch():
    depth = 10
    size, r, lam = 32, 5, 400_000
    cur, ref0 = _clip(depth, 64, 64, seed=1)
    _, ref1 = _clip(depth, 64, 64, seed=2)
    refs = [jnp.asarray(pad_plane(r_.astype(np.int16), PAD))
            for r_ in (ref0, ref1)]
    outs = me_mxu.me_grids_multi(jnp.asarray(cur.astype(np.int16)), refs,
                                 size, r, lam, pad=PAD, depth=depth)
    assert len(outs) == 2
    for k, (gx, gy) in enumerate(outs):
        ex, ey = me_mxu.me_grid_ssd(
            cur.astype(np.int16), np.asarray(refs[k]), size, r, lam,
            pad=PAD, depth=depth)
        np.testing.assert_array_equal(gx, ex)
        np.testing.assert_array_equal(gy, ey)
