import numpy as np
import pytest

from hevc_tpu.ops import quant, transform


RNG = np.random.default_rng(7)


def _residual(size, bit_depth=8, batch=()):
    lim = (1 << bit_depth) - 1
    return RNG.integers(-lim, lim + 1, size=batch + (size, size)
                        ).astype(np.int32)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("bit_depth", [8, 10])
def test_forward_jax_matches_oracle(size, bit_depth):
    r = _residual(size, bit_depth, batch=(5,))
    got = np.asarray(transform.forward_transform(
        r, size=size, bit_depth=bit_depth))
    for i in range(5):
        exp = transform.forward_transform_np(r[i], size, bit_depth)
        assert (got[i] == exp).all()


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_inverse_jax_matches_oracle(size):
    c = RNG.integers(-32768, 32768, size=(5, size, size)).astype(np.int32)
    got = np.asarray(transform.inverse_transform(c, size=size))
    for i in range(5):
        exp = transform.inverse_transform_np(c[i], size)
        assert (got[i] == exp).all()


def test_dst_jax_matches_oracle():
    r = _residual(4, batch=(7,))
    got = np.asarray(transform.forward_transform(r, size=4, is_dst=True))
    for i in range(7):
        exp = transform.forward_transform_np(r[i], 4, is_dst=True)
        assert (got[i] == exp).all()
    inv = np.asarray(transform.inverse_transform(got, size=4, is_dst=True))
    for i in range(7):
        exp = transform.inverse_transform_np(got[i], 4, is_dst=True)
        assert (inv[i] == exp).all()


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_transform_roundtrip_lossless_without_quant(size):
    # fwd->inv without quantization must reproduce the residual exactly for
    # smooth content (transform is near-orthogonal; scale factors cancel).
    x = np.arange(size)[None, :] + np.arange(size)[:, None]
    r = (x * 3 - size).astype(np.int32)[None]
    c = transform.forward_transform(r, size=size)
    back = np.asarray(transform.inverse_transform(c, size=size))[0]
    assert np.abs(back - r[0]).max() <= 1


@pytest.mark.parametrize("qp", [0, 17, 22, 32, 37, 45, 51])
@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_quant_dequant_matches_oracle(qp, size):
    c = RNG.integers(-32768, 32768, size=(4, size, size)).astype(np.int32)
    lv = np.asarray(quant.quantize(c, size=size, qp=qp))
    lv_np = quant.quantize_np(c, size, qp)
    assert (lv == lv_np).all()
    dq = np.asarray(quant.dequantize(lv, size=size, qp=qp))
    dq_np = quant.dequantize_np(lv, size, qp)
    assert (dq == dq_np).all()


@pytest.mark.parametrize("qp", [4, 26, 39, 51])
@pytest.mark.parametrize("bit_depth", [8, 10])
def test_dequant_matches_normative_formula(qp, bit_depth):
    # The int32-safe folded-shift implementation must equal the literal
    # spec 8.6.3 formula computed in int64.
    size = 8
    lv = RNG.integers(-32768, 32768, size=(size, size)).astype(np.int64)
    log2n = 3
    bd_shift = bit_depth + log2n - 5
    qp_eff = qp + 6 * (bit_depth - 8)  # Qp' incl. QpBdOffset
    ls = int(quant.tables.INV_QUANT_SCALES[qp_eff % 6])
    spec = ((lv * 16 * ls) << (qp_eff // 6)) + (1 << (bd_shift - 1))
    spec = np.clip(spec >> bd_shift, -32768, 32767)
    got = np.asarray(quant.dequantize(lv.astype(np.int32), size=size, qp=qp,
                                      bit_depth=bit_depth))
    assert (got == spec).all()


def test_quant_roundtrip_energy():
    # encode-side sanity: quant->dequant->inverse reconstructs with bounded
    # error scaling with qp.
    size = 16
    r = _residual(size, batch=(1,)) // 8
    c = transform.forward_transform(r, size=size)
    for qp, tol in [(10, 8), (27, 40), (40, 160)]:
        lv = quant.quantize(c, size=size, qp=qp)
        dq = quant.dequantize(lv, size=size, qp=qp)
        back = np.asarray(transform.inverse_transform(dq, size=size))[0]
        err = np.abs(back - r[0]).max()
        assert err <= tol, (qp, err)
