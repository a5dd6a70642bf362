import numpy as np
import pytest

from hevc_tpu.ops import interp, me

RNG = np.random.default_rng(5)


def brute_mc(padded, pad, x, y, w, h, fx, fy, bd, luma):
    """Per-pixel direct implementation of spec 8.5.3.3.3 for cross-check."""
    filters = interp.LUMA_FILTERS if luma else interp.CHROMA_FILTERS
    nt = 8 if luma else 4
    off = nt // 2 - 1
    maxv = (1 << bd) - 1
    s1 = bd - 8
    out = np.zeros((h, w), np.int64)
    fh, fv = filters[fx], filters[fy]
    for yy in range(h):
        for xx in range(w):
            if fx == 0 and fy == 0:
                out[yy, xx] = padded[pad + y + yy, pad + x + xx]
                continue
            if fy == 0:
                acc = sum(int(fh[k]) * int(padded[pad + y + yy,
                                                  pad + x + xx - off + k])
                          for k in range(nt))
                out[yy, xx] = np.clip(((acc >> s1) + 32) >> 6, 0, maxv)
            elif fx == 0:
                acc = sum(int(fv[k]) * int(padded[pad + y + yy - off + k,
                                                  pad + x + xx])
                          for k in range(nt))
                out[yy, xx] = np.clip(((acc >> s1) + 32) >> 6, 0, maxv)
            else:
                tmp = []
                for k in range(nt):
                    acc = sum(int(fh[j]) * int(padded[pad + y + yy - off + k,
                                                      pad + x + xx - off + j])
                              for j in range(nt))
                    tmp.append(acc >> s1)
                acc = sum(int(fv[k]) * tmp[k] for k in range(nt)) >> 6
                out[yy, xx] = np.clip((acc + 32) >> 6, 0, maxv)
    return out


@pytest.mark.parametrize("luma", [True, False])
@pytest.mark.parametrize("frac", [(0, 0), (2, 0), (0, 2), (1, 3), (3, 1)])
def test_mc_matches_brute(luma, frac):
    bd = 8
    plane = RNG.integers(0, 256, size=(48, 56)).astype(np.int16)
    padded = interp.pad_plane(plane, 16)
    fx, fy = frac
    if not luma:
        fx, fy = fx * 2, fy * 2  # chroma phases 0..7
    got = interp.mc_block_np(padded, 16, 5, 7, 8, 8, fx, fy, bd, luma)
    exp = brute_mc(padded, 16, 5, 7, 8, 8, fx, fy, bd, luma)
    assert (got == exp).all()


def test_mc_integer_is_copy():
    plane = RNG.integers(0, 256, size=(32, 32)).astype(np.int16)
    padded = interp.pad_plane(plane, 8)
    got = interp.mc_predict_np(padded, 8, 0, 0, 4, 4, 8, 8)
    assert (got == plane[4:12, 4:12]).all()
    # negative MV into the padding: edge extension
    got = interp.mc_predict_np(padded, 8, -16, -16, 0, 0, 4, 4)
    assert (got == plane[0, 0]).all()


def test_mv_bits_formula():
    for v in [0, 1, -1, 2, -2, 7, -8, 63, -64, 200]:
        assert me.mv_bits_np(v) >= 1
    assert me.mv_bits_np(0) == 1
    assert me.mv_bits_np(1) == 3
    assert me.mv_bits_np(-1) == 3
    import jax.numpy as jnp
    vs = jnp.array([0, 1, -1, 5, -17, 300])
    got = np.asarray(me.mv_bits(vs))
    exp = [me.mv_bits_np(int(v)) for v in [0, 1, -1, 5, -17, 300]]
    assert list(got) == exp


@pytest.mark.parametrize("seed", [0, 1])
def test_full_search_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    h = w = 16
    ny = nx = 9
    blk = rng.integers(0, 256, size=(h, w)).astype(np.int32)
    area = rng.integers(0, 256, size=(h + ny - 1, w + nx - 1)).astype(np.int32)
    # plant an exact match so there are strong minima (and a duplicate for
    # tie-break testing)
    area[3:3 + h, 2:2 + w] = blk
    area[5:5 + h, 6:6 + w] = blk
    lam = 35000
    got = me.full_search(blk, area, -4, -4, 2, -3, lam, h=h, w=w, ny=ny, nx=nx)
    exp = me.full_search_np(blk, area, -4, -4, 2, -3, lam)
    assert (int(got[0]), int(got[1]), int(got[2]), int(got[3])) == exp


def test_full_search_batch_np_matches_oracle():
    rng = np.random.default_rng(9)
    n, h, w, R = 5, 16, 16, 4
    blks = rng.integers(0, 256, size=(n, h, w)).astype(np.int32)
    areas = rng.integers(0, 256, size=(n, h + 2 * R, w + 2 * R)
                         ).astype(np.int32)
    mins = np.full(n, -R, np.int32)
    py = rng.integers(-8, 8, n).astype(np.int32)
    px = rng.integers(-8, 8, n).astype(np.int32)
    got = me.full_search_batch_np(blks, areas, mins, mins, py, px, 40000)
    for i in range(n):
        exp = me.full_search_np(blks[i], areas[i], -R, -R, int(py[i]),
                                int(px[i]), 40000)
        assert (int(got[0][i]), int(got[1][i]), int(got[2][i]),
                int(got[3][i])) == exp


def test_pallas_sad_table_interpret():
    from hevc_tpu.ops.sad_pallas import sad_table
    rng = np.random.default_rng(3)
    n, h, w, R = 2, 8, 8, 2
    blks = rng.integers(0, 256, (n, h, w)).astype(np.int32)
    areas = rng.integers(0, 256, (n, h + 2 * R, w + 2 * R)).astype(np.int32)
    got = np.asarray(sad_table(blks, areas, h=h, w=w, ny=2 * R + 1,
                               nx=2 * R + 1, interpret=True))
    for i in range(n):
        for dy in range(2 * R + 1):
            for dx in range(2 * R + 1):
                exp = np.abs(areas[i, dy:dy + h, dx:dx + w].astype(np.int64)
                             - blks[i]).sum()
                assert got[i, dy, dx] == exp
