"""HM-exact integer motion search: the device search must match the
reference TEncSearch::xPatternSearch semantics bit-exactly (first-minimum
tie-break, SAD subsampling, golomb motion cost) — the same GPU-vs-CPU
validation the reference applied to its OpenCL kernels (cl/sad.cl)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.ops.me_exact import (hm_full_search, hm_full_search_np,
                                   search_window)

ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"


def _pad(plane, pad=96):
    return np.pad(plane, pad, mode="edge")


def test_device_search_matches_reference_semantics():
    """Random content, random predictors/lambdas, block sizes 8..64:
    the XLA search == the literal xPatternSearch transliteration,
    including ties (flat regions force equal-SAD candidates where only
    the raster first-minimum rule disambiguates)."""
    rng = np.random.default_rng(11)
    pic_w, pic_h = 192, 128
    for trial in range(12):
        flat = trial % 3 == 0
        if flat:
            refp = np.full((pic_h, pic_w), 128, np.int16)
            cur = refp.copy()
        else:
            refp = rng.integers(0, 256, (pic_h, pic_w)).astype(np.int16)
            dx, dy = rng.integers(-5, 6, 2)
            cur = np.roll(np.roll(refp, dy, 0), dx, 1)
        ref = _pad(refp)
        n = int(rng.choice([8, 16, 32, 64]))
        cx = int(rng.integers(0, (pic_w - n) // 8 + 1)) * 8
        cy = int(rng.integers(0, (pic_h - n) // 8 + 1)) * 8
        mvp = (int(rng.integers(-16, 17)), int(rng.integers(-16, 17)))
        lam = int(rng.integers(1, 300)) * 256
        sr = int(rng.choice([8, 16]))
        blk = cur[cy:cy + n, cx:cx + n]
        got = hm_full_search(blk, ref, cx, cy, mvp, lam, sr, pic_w, pic_h)
        want = hm_full_search_np(blk, ref, cx, cy, mvp, lam, sr,
                                 pic_w, pic_h)
        assert got == want, (trial, got, want)


def test_window_matches_reference_clip():
    """xSetSearchRange centres the window on the clipped predictor and
    clips with the CU-origin margins (TComDataCU::clipMv)."""
    # CU at the picture corner, sr 64: clipMv margins don't bind yet
    lo_x, lo_y, hi_x, hi_y = search_window((0, 0), 64, 0, 0, 192, 128)
    assert (lo_x, lo_y) == (-64, -64)
    assert (hi_x, hi_y) == (64, 64)
    # CU near the right edge: hor_max = (pic + 8 - cu - 1) << 2 binds
    _, _, hi_x, _ = search_window((0, 0), 64, 150, 64, 192, 128)
    assert hi_x == (((192 + 8 - 150 - 1) << 2) >> 2)
    # predictor pushes the window off-centre
    lo_x, _, hi_x, _ = search_window((40, 0), 16, 64, 64, 192, 128)
    assert (lo_x, hi_x) == (10 - 16, 10 + 16)


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
def test_mv_equality_with_reference_encoder(tmp_path):
    """Translation-only content (frame 1 = frame 0 shifted by a whole-pel
    vector): the reference encoder with FullSearch (FastSearch=0) codes
    exactly that vector, and so does our HM-exact device search given
    the same frames — MV equality against the reference's own search,
    not just against a twin (SURVEY §7 hard-parts item)."""
    rng = np.random.default_rng(5)
    w, h, shift = 192, 128, (3, -2)           # full-pel (dx, dy)
    f0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    f1 = np.roll(np.roll(f0, shift[1], 0), shift[0], 1)
    flat = np.full((h // 2, w // 2), 128, np.uint8)
    clip = tmp_path / "in.yuv"
    with open(clip, "wb") as fh:
        for f in (f0, f1):
            fh.write(f.tobytes())
            fh.write(flat.tobytes())
            fh.write(flat.tobytes())
    bs = tmp_path / "o.bin"
    out = subprocess.run(
        [ENC, "-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
         "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", "2",
         "-fr", "30", "-q", "27", "--FastSearch=0", "--FEN=1",
         "--SearchRange=16", "-b", str(bs),
         "-o", str(tmp_path / "r.yuv")], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-1500:]
    # the reference's coded motion field (read back with our decoder)
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop()
    mvs = []
    import hevc_tpu.decoder.recon as drecon
    orig_rc = drecon.CtuReconstructor.recon_ctu

    def spy(self, d, cx, cy, recon, **kw):
        inter = d.pred_mode == 0
        if inter.any():
            for mx, my in zip(d.mv_x[inter].tolist(),
                              d.mv_y[inter].tolist()):
                mvs.append((mx, my))
        return orig_rc(self, d, cx, cy, recon, **kw)

    drecon.CtuReconstructor.recon_ctu = spy
    try:
        for _ in dec.decode_stream(bs.read_bytes()):
            pass
    finally:
        drecon.CtuReconstructor.recon_ctu = orig_rc
    assert mvs, "no inter blocks decoded"
    vals, counts = np.unique(np.array(mvs), axis=0, return_counts=True)
    hm_mv = tuple(int(v) for v in vals[np.argmax(counts)])
    # f1[y, x] = f0[y + dy, x - dx] for roll(roll(f0, dy, 0), dx, 1)
    # with dy = shift[1] (negative = content moves up), so the coded
    # motion vector is (-dx, -dy) in full-pel
    assert hm_mv == (-shift[0] * 4, -shift[1] * 4), \
        f"reference did not code the translation: {hm_mv}"
    # our HM-exact device search on the same frames, at blocks clear of
    # the np.roll wrap-around rows/columns
    ref = _pad(f0.astype(np.int16))
    for (cx, cy, n) in [(64, 32, 64), (32, 32, 32), (96, 48, 16)]:
        blk = f1[cy:cy + n, cx:cx + n].astype(np.int16)
        mvx, mvy, sad = hm_full_search(blk, ref, cx, cy, (0, 0),
                                       100 * 256, 16, w, h)
        assert (mvx * 4, mvy * 4) == hm_mv
        assert sad == 0
