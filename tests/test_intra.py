import numpy as np
import pytest

from hevc_tpu.core.geometry import AvailabilityMap
from hevc_tpu.core.refsamples import build_ref_vector
from hevc_tpu.ops import intra

from intra_oracle import predict_mode

RNG = np.random.default_rng(11)


def _random_refs(size, bit_depth=8, batch=4):
    nn = 4 * size + 1
    f = RNG.integers(0, (1 << bit_depth), size=(batch, nn)).astype(np.int32)
    ff = np.stack([intra.filter_ref_samples(x, size) for x in f])
    return f, ff


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_all_modes_match_oracle(size, is_luma):
    f, ff = _random_refs(size)
    got = np.asarray(intra.predict_all_modes(
        f, ff, size=size, is_luma=is_luma))
    for b in range(f.shape[0]):
        for mode in range(35):
            exp = predict_mode(f[b], ff[b], mode, size, is_luma=is_luma)
            assert (got[b, mode] == exp).all(), (size, mode, is_luma)


def test_10bit_modes():
    size = 8
    f, _ = _random_refs(size, bit_depth=10, batch=2)
    ff = np.stack([intra.filter_ref_samples(x, size) for x in f])
    got = np.asarray(intra.predict_all_modes(
        f, ff, size=size, bit_depth=10, is_luma=True))
    for mode in [0, 1, 10, 26, 2, 19, 33]:
        exp = predict_mode(f[0], ff[0], mode, size, bit_depth=10)
        assert (got[0, mode] == exp).all(), mode


def test_strong_smoothing_path():
    size = 32
    # perfectly bilinear references trigger strong smoothing
    f = np.empty(4 * size + 1, np.int32)
    n2 = 2 * size
    f[n2] = 100
    for i in range(1, 2 * size + 1):
        f[n2 + i] = 100 + i          # linear ramp top
        f[n2 - i] = 100 - i // 2     # linear ramp left
    assert intra.strong_smoothing_decision(f, size)
    sf = intra.filter_ref_samples(f, size, strong_smoothing=True)
    # endpoints preserved
    assert sf[n2] == f[n2] and sf[0] == f[0] and sf[-1] == f[-1]
    # interior is the linear interpolation of the corners
    assert sf[n2 + 32] == (32 * 100 + 32 * f[n2 + 64] + 32) >> 6


def test_ref_vector_substitution_topleft_block():
    # First block of the picture: nothing available -> mid grey.
    plane = RNG.integers(0, 256, size=(64, 64)).astype(np.int16)
    av = AvailabilityMap(64, 64, ctu_size=64)
    f = build_ref_vector(plane, 0, 0, 8, av, 8)
    assert (f == 128).all()


def test_ref_vector_availability_right_edge():
    # Block at top-right of a CTU: above-right samples cross into the NEXT
    # CTU (not yet coded) -> substituted from last available top sample.
    plane = np.arange(128 * 128, dtype=np.int16).reshape(128, 128) % 251
    av = AvailabilityMap(128, 128, ctu_size=64)
    x0, y0, size = 56, 8, 8
    f = build_ref_vector(plane, x0, y0, size, av, 8)
    n2 = 2 * size
    # top row available for x0..x0+7 (inside CTU, above row coded)
    for x in range(size):
        assert f[n2 + 1 + x] == plane[y0 - 1, x0 + x]
    # above-right would be x >= 64 -> same CTU? x0+8=64 crosses CTU boundary
    # with z-order AFTER current block -> unavailable, so propagated:
    assert f[n2 + 1 + size] == f[n2 + size]


def test_ref_vector_below_left_rule():
    # Block at (8,0) within CTU: below-left (x=7, y=8..) belongs to the
    # z-later block -> unavailable; left col y=0..7 available.
    plane = np.arange(64 * 64, dtype=np.int16).reshape(64, 64) % 251
    av = AvailabilityMap(64, 64, ctu_size=64)
    x0, y0, size = 8, 0, 8
    f = build_ref_vector(plane, x0, y0, size, av, 8)
    n2 = 2 * size
    for y in range(size):
        assert f[n2 - 1 - y] == plane[y0 + y, x0 - 1]
    # corner/top unavailable (picture edge) but substitution fills them
    assert f[n2] == f[n2 - 1]
