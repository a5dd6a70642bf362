"""Round-trip tests for the native CABAC slice-data codec: encode random
(legal) CU/TU decision maps + coefficients, decode, compare everything."""
import numpy as np
import pytest

from hevc_tpu.entropy import cabac


def legal_random_ctu(rng, ctu_x, ctu_y, pic_w, pic_h, ctu=64,
                     max_tu_depth=3, density=0.3):
    d = cabac.CtuDecisions(ctu)
    x0_ctu, y0_ctu = ctu_x * ctu, ctu_y * ctu

    def gen_tu(bx, by, log2, depth, maxd, nxn):
        must = (log2 > 5) or (nxn and depth == 0)
        can = log2 > 2 and depth < maxd
        split = must or (can and rng.random() < 0.4)
        if split:
            h = 1 << (log2 - 3)  # in 4x4 units: half size
            half = 1 << (log2 - 1)
            for i in range(4):
                gen_tu(bx + (i & 1) * half // 4, by + (i >> 1) * half // 4,
                       log2 - 1, depth + 1, maxd, nxn)
        else:
            b = 1 << (log2 - 2)
            d.tu_depth[by:by + b, bx:bx + b] = depth

    def gen_cu(x0, y0, log2, depth):
        size = 1 << log2
        if x0 >= pic_w or y0 >= pic_h:
            return
        boundary = (x0 + size > pic_w) or (y0 + size > pic_h)
        split = boundary or (log2 > 3 and rng.random() < 0.5)
        bx, by = (x0 - x0_ctu) // 4, (y0 - y0_ctu) // 4
        if split and log2 > 3:
            h = size // 2
            d.cu_depth[by:by + size // 4, bx:bx + size // 4] = \
                np.maximum(d.cu_depth[by:by + size // 4, bx:bx + size // 4],
                           depth + 1)
            for i in range(4):
                gen_cu(x0 + (i & 1) * h, y0 + (i >> 1) * h, log2 - 1,
                       depth + 1)
            return
        b = size // 4
        d.cu_depth[by:by + b, bx:bx + b] = depth
        nxn = log2 == 3 and rng.random() < 0.3
        d.nxn_flag[by:by + b, bx:bx + b] = 1 if nxn else 0
        if nxn:
            for i in range(4):
                m = rng.integers(0, 35)
                d.luma_mode[by + (i >> 1), bx + (i & 1)] = m
        else:
            d.luma_mode[by:by + b, bx:bx + b] = rng.integers(0, 35)
        # chroma mode must be one of the 5 candidates for PU0's luma mode
        lm = int(d.luma_mode[by, bx])
        cands = [lm]
        for base in (0, 26, 10, 1):
            cands.append(34 if base == lm else base)
        d.chroma_mode[by:by + b, bx:bx + b] = cands[rng.integers(0, 5)]
        gen_tu(bx, by, log2, 0, max_tu_depth + (1 if nxn else 0), nxn)

    gen_cu(x0_ctu, y0_ctu, 6, 0)
    # random sparse coefficients (int16, incl. large magnitudes)
    for plane in (d.coeff_y, d.coeff_cb, d.coeff_cr):
        mask = rng.random(plane.shape) < density
        mag = rng.choice([1, 1, 2, 3, 5, 17, 200, 3000, 32000],
                         size=plane.shape)
        sign = rng.choice([-1, 1], size=plane.shape)
        plane[:] = np.where(mask, mag * sign, 0).astype(np.int16)
    # zero out-of-picture coefficient regions (never coded)
    win = min(pic_w - x0_ctu, ctu)
    hin = min(pic_h - y0_ctu, ctu)
    d.coeff_y[hin:, :] = 0
    d.coeff_y[:, win:] = 0
    d.coeff_cb[hin // 2:, :] = 0
    d.coeff_cb[:, win // 2:] = 0
    d.coeff_cr[hin // 2:, :] = 0
    d.coeff_cr[:, win // 2:] = 0
    return d


def _effective_maps(dlist, pic_w, pic_h):
    return dlist


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dims", [(128, 64), (80, 48), (64, 64)])
def test_slice_roundtrip(seed, dims):
    pic_w, pic_h = dims
    rng = np.random.default_rng(seed)
    qp = int(rng.integers(10, 45))
    params = cabac.make_slice_params(pic_w, pic_h, qp)
    enc = cabac.SliceDataEncoder(params)
    ctus_w = -(-pic_w // 64)
    ctus_h = -(-pic_h // 64)
    sent = []
    for cy in range(ctus_h):
        for cx in range(ctus_w):
            d = legal_random_ctu(rng, cx, cy, pic_w, pic_h)
            last = (cy == ctus_h - 1) and (cx == ctus_w - 1)
            enc.encode_ctu(cx, cy, d, last)
            sent.append(d)
    data = enc.get_bytes()
    assert len(data) > 8

    dec = cabac.SliceDataDecoder(cabac.make_slice_params(pic_w, pic_h, qp),
                                 data)
    i = 0
    for cy in range(ctus_h):
        for cx in range(ctus_w):
            got, eos = dec.decode_ctu(cx, cy)
            exp = sent[i]
            i += 1
            # compare only the in-picture region of each map
            win = (min(pic_w - cx * 64, 64)) // 4
            hin = (min(pic_h - cy * 64, 64)) // 4
            for name in ("cu_depth", "nxn_flag", "luma_mode", "chroma_mode",
                         "tu_depth"):
                a = getattr(exp, name)[:hin, :win]
                b = getattr(got, name)[:hin, :win]
                assert (a == b).all(), (name, cx, cy, seed,
                                        np.argwhere(a != b)[:4])
            assert (exp.coeff_y == got.coeff_y).all(), ("coeff_y", cx, cy)
            assert (exp.coeff_cb == got.coeff_cb).all()
            assert (exp.coeff_cr == got.coeff_cr).all()
            expect_eos = (cy == ctus_h - 1) and (cx == ctus_w - 1)
            assert eos == (1 if expect_eos else 0)


def test_sparse_and_dense_extremes():
    pic_w = pic_h = 64
    rng = np.random.default_rng(42)
    for density in (0.0, 0.02, 0.95):
        params = cabac.make_slice_params(pic_w, pic_h, 32)
        enc = cabac.SliceDataEncoder(params)
        d = legal_random_ctu(rng, 0, 0, pic_w, pic_h, density=density)
        enc.encode_ctu(0, 0, d, True)
        data = enc.get_bytes()
        dec = cabac.SliceDataDecoder(
            cabac.make_slice_params(pic_w, pic_h, 32), data)
        got, eos = dec.decode_ctu(0, 0)
        assert eos == 1
        assert (d.coeff_y == got.coeff_y).all()
        assert (d.coeff_cb == got.coeff_cb).all()
        assert (d.coeff_cr == got.coeff_cr).all()
