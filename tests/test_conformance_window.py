"""Conformance window (spec 7.4.3.2.1; reference TAppEncCfg
"ConformanceMode"/"ConfWin*", TVideoIOYuv pad/crop): non-CU-aligned
sources are edge-padded to the coded size with the window signalled in
the SPS, and both decoders crop the window at output."""
import os
import subprocess
import sys

import numpy as np
import pytest

ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
ORACLE = "/tmp/hm_oracle/bin/TAppDecoderStatic"
CFG = "/tmp/hm_oracle/cfg"

W, H = 130, 66          # not multiples of 8 -> auto-pad to 136x72


def _write_odd_clip(path, w, h, n):
    """Crop a CU-aligned synthetic frame down to odd dimensions."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(path, "wb") as fh:
        for t in range(n):
            y, cb, cr = make_frame(144, 80, t)
            y = np.asarray(y, np.uint8)[:h, :w]
            cb = np.asarray(cb, np.uint8)[:h // 2, :w // 2]
            cr = np.asarray(cr, np.uint8)[:h // 2, :w // 2]
            for p in (y, cb, cr):
                fh.write(p.tobytes())


def test_conformance_mode1_encode(tmp_path):
    """Our encoder pads a 130x66 source (ConformanceMode 1), the HM
    decoder reproduces every hash and writes a CROPPED 130x66 recon
    byte-identical to ours."""
    if not os.path.exists(ORACLE):
        pytest.skip("HM oracle decoder not built")
    clip = tmp_path / "odd.yuv"
    _write_odd_clip(clip, W, H, 3)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(W), "-hgt", str(H), "-f", "3",
          "-q", "32", "--ConformanceMode=1", "-b", str(bs), "-o", str(rec)])
    assert rec.stat().st_size == W * H * 3 // 2 * 3  # cropped output
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == 3, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()


def test_conformance_mode1_decode_hm_stream(tmp_path):
    """An HM --ConformanceMode=1 stream of a 130x66 source decodes in our
    decoder byte-identically to the HM decoder's cropped output."""
    if not (os.path.exists(ENC) and os.path.exists(ORACLE)):
        pytest.skip("HM oracle not built")
    clip = tmp_path / "odd.yuv"
    _write_odd_clip(clip, W, H, 3)
    bs, rec = tmp_path / "o.bin", tmp_path / "r.yuv"
    out = subprocess.run(
        [ENC, "-c", f"{CFG}/encoder_intra_main.cfg", "-i", str(clip),
         "-wdt", str(W), "-hgt", str(H), "-f", "3", "-fr", "30", "-q", "32",
         "--ConformanceMode=1", "-b", str(bs), "-o", str(rec)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout[-1200:] + out.stderr[-400:]
    from hevc_tpu.decoder.top import DecoderTop
    got = b"".join(
        np.ascontiguousarray(p.astype(np.uint8)).tobytes()
        for pic in DecoderTop().decode_stream(bs.read_bytes()) for p in pic)
    assert got == rec.read_bytes()
    assert len(got) == W * H * 3 // 2 * 3


def test_explicit_window_mode3(tmp_path):
    """ConformanceMode 3 signals the user window; output crops it."""
    clip = tmp_path / "in.yuv"
    _write_odd_clip(clip, 128, 64, 2)
    bs, rec = tmp_path / "o.bin", tmp_path / "r.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", "128", "-hgt", "64", "-f", "2",
          "-q", "32", "--ConformanceMode=3", "--ConfWinLeft=2",
          "--ConfWinRight=1", "--ConfWinTop=1", "--ConfWinBottom=2",
          "-b", str(bs), "-o", str(rec)])
    cw = 128 - 2 * (2 + 1)
    chh = 64 - 2 * (1 + 2)
    assert rec.stat().st_size == cw * chh * 3 // 2 * 2
    from hevc_tpu.decoder.top import DecoderTop
    got = b"".join(
        np.ascontiguousarray(p.astype(np.uint8)).tobytes()
        for pic in DecoderTop().decode_stream(bs.read_bytes()) for p in pic)
    assert got == rec.read_bytes()
