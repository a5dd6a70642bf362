#!/usr/bin/env python
"""RD comparison harness: our encoder vs the HM reference encoder at equal
QP on a synthetic clip. Prints per-encoder bits + PSNR and the bit ratio —
the honest companion to bench.py's speed ratio (a speedup bought with
bitrate is soft; see BASELINE.md).

Usage: python tools/rd_compare.py [--cfg lowdelay_P] [--frames 8]
       [--qp 32] [--w 416] [--hgt 240]
"""
import argparse
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

HM_ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"


def psnr_from_yuv(orig, recon, w, h, frames):
    import numpy as np
    fsz = w * h * 3 // 2
    o = np.fromfile(orig, np.uint8, fsz * frames).astype(np.float64)
    r = np.fromfile(recon, np.uint8, fsz * frames).astype(np.float64)
    n = min(len(o), len(r))
    mse = ((o[:n] - r[:n]) ** 2).mean()
    return 99.99 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def run_ours(cfg_path, clip, w, h, frames, qp, tmp):
    from hevc_tpu.cli.encode import main
    bs = os.path.join(tmp, "ours.bin")
    rec = os.path.join(tmp, "ours_rec.yuv")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["-c", cfg_path, "-i", clip, "-wdt", str(w), "-hgt", str(h),
              "-f", str(frames), "-q", str(qp), "-b", bs, "-o", rec])
    return os.path.getsize(bs) * 8, psnr_from_yuv(clip, rec, w, h, frames)


def run_hm(cfg_path, clip, w, h, frames, qp, tmp):
    bs = os.path.join(tmp, "hm.bin")
    rec = os.path.join(tmp, "hm_rec.yuv")
    out = subprocess.run(
        [HM_ENC, "-c", cfg_path, "-i", clip, "-wdt", str(w), "-hgt", str(h),
         "-f", str(frames), "-fr", "30", "-q", str(qp), "-b", bs, "-o", rec],
        capture_output=True, text=True, check=True)
    return os.path.getsize(bs) * 8, psnr_from_yuv(clip, rec, w, h, frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="lowdelay_P",
                    choices=["intra", "lowdelay", "lowdelay_P",
                             "randomaccess"])
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--wdt", type=int, default=416)
    ap.add_argument("--hgt", type=int, default=240)
    args = ap.parse_args()
    cfg_path = f"/root/reference/cfg/encoder_{args.cfg}_main.cfg"
    from make_test_yuv import write_clip
    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, args.wdt, args.hgt, args.frames)
        ob, op = run_ours(cfg_path, clip, args.wdt, args.hgt, args.frames,
                          args.qp, tmp)
        if not os.path.exists(HM_ENC):
            print(f"ours: {ob} bits  {op:.3f} dB   (HM oracle not built)")
            return
        hb, hp = run_hm(cfg_path, clip, args.wdt, args.hgt, args.frames,
                        args.qp, tmp)
        print(f"cfg={args.cfg} qp={args.qp} {args.wdt}x{args.hgt}"
              f" f={args.frames}")
        print(f"  ours: {ob:9d} bits  {op:.3f} dB")
        print(f"  HM:   {hb:9d} bits  {hp:.3f} dB")
        print(f"  bit ratio ours/HM: {ob / hb:.3f}   "
              f"dPSNR: {op - hp:+.3f} dB")


if __name__ == "__main__":
    main()
