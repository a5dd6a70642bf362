"""Rate control (reference TEncRateCtrl R-lambda model): achieved
bitrate must track TargetBitrate, and streams stay conformant."""
import os
import subprocess
import sys

import numpy as np
import pytest

ORACLE = "/tmp/hm_oracle/bin/TAppDecoderStatic"


def _frames(n, w, h):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    return [[np.asarray(p, np.int16) for p in make_frame(w, h, t)]
            for t in range(n)]


@pytest.mark.parametrize("kbps", [400, 900])
def test_rate_control_tracks_target(kbps):
    from hevc_tpu.encoder.top import EncoderTop
    from hevc_tpu.io.cfg import EncoderConfig
    w, h, n = 256, 128, 16
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=-1,
                        frames_to_encode=n, rate_control=1,
                        target_bitrate=kbps, frame_rate=30)
    enc = EncoderTop(cfg)
    data = b"".join(enc.encode_frame(f) for f in _frames(n, w, h))
    actual_kbps = len(data) * 8 * 30 / n / 1000
    assert 0.75 * kbps < actual_kbps < 1.30 * kbps, actual_kbps
    # per-frame QPs adapt (not constant)
    qps = [s["qp"] for s in enc.stats]
    assert len(set(qps)) > 1


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="HM oracle decoder not built")
def test_rate_control_stream_conformant(tmp_path):
    from hevc_tpu.encoder.top import EncoderTop
    from hevc_tpu.io.cfg import EncoderConfig
    w, h, n = 128, 80, 6
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=-1,
                        frames_to_encode=n, rate_control=1,
                        target_bitrate=500, frame_rate=30)
    enc = EncoderTop(cfg)
    data = b"".join(enc.encode_frame(f) for f in _frames(n, w, h))
    bs = tmp_path / "o.bin"
    bs.write_bytes(data)
    out = subprocess.run([ORACLE, "-b", str(bs), "-o",
                          str(tmp_path / "d.yuv")],
                         capture_output=True, text=True)
    assert out.returncode == 0
    assert out.stdout.count("(OK)") == n


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="HM oracle decoder not built")
def test_wpp_ctu_rate_control_hits_target(tmp_path):
    """WPP-aware CTU-level rate control (reference TEncRateCtrl.cpp:
    761-884 per-row allocation under WaveFrontSynchro): with WPP +
    LCULevelRateControl the achieved rate must hit the target within
    +-5% over the steady window and the stream stays conformant."""
    from hevc_tpu.encoder.top import EncoderTop
    from hevc_tpu.io.cfg import EncoderConfig
    w, h, n, kbps = 256, 192, 20, 800
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=-1,
                        frames_to_encode=n, rate_control=1,
                        lcu_rate_control=1,
                        target_bitrate=kbps, frame_rate=30, wpp=1)
    enc = EncoderTop(cfg)
    chunks = [enc.encode_frame(f) for f in _frames(n, w, h)]
    # whole-sequence accuracy: the sequence budget pays the IDR burst
    # back across the remaining frames (reference TEncRCSeq bit
    # bookkeeping), so the target is judged on the total
    total_kbps = sum(len(c) for c in chunks) * 8 * 30 / n / 1000
    assert 0.95 * kbps < total_kbps < 1.05 * kbps, total_kbps
    bs = tmp_path / "o.bin"
    bs.write_bytes(b"".join(chunks))
    out = subprocess.run([ORACLE, "-b", str(bs), "-o",
                          str(tmp_path / "d.yuv")],
                         capture_output=True, text=True)
    assert out.returncode == 0
    assert out.stdout.count("(OK)") == n
