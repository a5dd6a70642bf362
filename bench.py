#!/usr/bin/env python
"""Benchmark: intra encode fps at 416x240 (BASELINE.json config 1 shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: the reference HM-16.4 encoder (built via
tools/build_reference_oracle.sh) measured on this machine encoding the same
synthetic 416x240 8-frame clip with cfg/encoder_intra_main.cfg:
3.689 s -> 2.17 fps single-thread (see BASELINE.md "measured" section).
If the oracle binary is present, the baseline is re-measured live instead.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

HM_ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
HM_BASELINE_FPS = 2.17  # measured: 8 frames / 3.689 s (this host class)
W, H, FRAMES, QP = 416, 240, 8, 32


def measure_ours(clip, tmp):
    from hevc_tpu.cli.encode import main
    t0 = time.time()
    main(["-i", clip, "-wdt", str(W), "-hgt", str(H), "-f", str(FRAMES),
          "-q", str(QP), "-b", os.path.join(tmp, "o.bin")])
    return FRAMES / (time.time() - t0)


def measure_hm(clip, tmp):
    if not os.path.exists(HM_ENC):
        return HM_BASELINE_FPS
    t0 = time.time()
    subprocess.run(
        [HM_ENC, "-c", "/tmp/hm_oracle/cfg/encoder_intra_main.cfg",
         "-i", clip, "-wdt", str(W), "-hgt", str(H), "-f", str(FRAMES),
         "-fr", "30", "-b", os.path.join(tmp, "hm.bin"),
         "-o", os.path.join(tmp, "hmrec.yuv")],
        capture_output=True, check=True)
    return FRAMES / (time.time() - t0)


def main():
    from make_test_yuv import write_clip
    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, W, H, FRAMES)
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fps = measure_ours(clip, tmp)
            base = measure_hm(clip, tmp)
        print(json.dumps({
            "metric": "intra_encode_fps_416x240",
            "value": round(fps, 4),
            "unit": "frames/sec",
            "vs_baseline": round(fps / base, 4),
        }))


if __name__ == "__main__":
    main()
