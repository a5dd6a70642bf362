#!/usr/bin/env python
"""Benchmark: 1080p lowdelay-P encode fps (BASELINE.json north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: the reference HM-16.4 encoder (built via
tools/build_reference_oracle.sh) measured on this machine encoding a
synthetic 1920x1080 clip with cfg/encoder_lowdelay_P_main.cfg:
0.044 fps single-thread (BASELINE.md "measured" section). If the oracle
binary is present the baseline is re-measured live on a short run.

The steady-state rate excludes the first two frames (one-time device
kernel compilation / persistent-cache population for the Pallas motion
search is not a per-frame cost).
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
HM_BASELINE_FPS = 0.044  # measured: 8 frames / 181.88 s (this host class)
W, H, FRAMES, QP = 1920, 1080, 7, 32
WARMUP = 2   # frames excluded from the steady-state measurement
CFG = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"


def measure_ours(clip):
    from hevc_tpu.encoder.top import EncoderTop
    from hevc_tpu.io.cfg import parse_cli
    from hevc_tpu.io.yuv import YuvReader
    cfg = parse_cli(["-c", CFG, "-i", clip, "-wdt", str(W), "-hgt", str(H),
                     "-f", str(FRAMES), "-q", str(QP), "-b", "/dev/null"])
    rd = YuvReader(clip, W, H)
    enc = EncoderTop(cfg)
    t_start = None
    done = 0
    for i in range(FRAMES):
        planes = rd.read()
        if i == WARMUP:
            t_start = time.time()
        enc.encode_frame(planes)
        if i >= WARMUP:
            done += 1
    return done / (time.time() - t_start)


def measure_hm(clip, tmp):
    """Steady-state HM fps from its own per-POC [ET x] log entries (same
    warmup exclusion as measure_ours)."""
    if not os.path.exists(HM_ENC):
        return HM_BASELINE_FPS
    import re
    frames = 4
    out = subprocess.run(
        [HM_ENC, "-c", CFG, "-i", clip, "-wdt", str(W), "-hgt", str(H),
         "-f", str(frames), "-fr", "30", "-q", str(QP),
         "-b", os.path.join(tmp, "hm.bin")],
        capture_output=True, check=True, text=True)
    ets = [float(m) for m in re.findall(r"\[ET\s+([0-9.]+)\s*\]",
                                        out.stdout)]
    steady = ets[WARMUP:] if len(ets) > WARMUP else ets
    if not steady or sum(steady) == 0:
        return HM_BASELINE_FPS
    return len(steady) / sum(steady)


def main():
    from make_test_yuv import write_clip
    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, W, H, FRAMES)
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fps = measure_ours(clip)
            base = measure_hm(clip, tmp)
        print(json.dumps({
            "metric": "lowdelayP_encode_fps_1080p",
            "value": round(fps, 4),
            "unit": "frames/sec",
            "vs_baseline": round(fps / base, 4),
        }))


if __name__ == "__main__":
    main()
