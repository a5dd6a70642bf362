"""RD-quality gate: at the HM reference encoder's own PSNR operating
point, our bitrate must stay within 1.10x HM's (VERDICT round-1 target).
Our equal-QP point sits at slightly lower PSNR/bits than HM's, so the
gate interpolates our bits at HM's PSNR between two QP anchors (the
standard piecewise log-bits-vs-PSNR interpolation BD-rate uses).
Reference: TEncGOP::xCalculateAddPSNR bits/PSNR reporting."""
import math
import os
import sys
import tempfile

import pytest

HM_ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(HM_ENC), reason="HM oracle encoder not built")


def bd_rate(curve_a, curve_b):
    """Bjøntegaard delta-rate of curve_a vs curve_b (fractional bit
    delta at equal PSNR, negative = a cheaper). Curves are [(bits,
    psnr)] lists; log-bits is fitted as a polynomial in PSNR and the
    difference integrated over the overlapping PSNR range — the
    standard BD-rate construction (VCEG-M33)."""
    import numpy as np
    pa = np.array([p for _, p in curve_a])
    ra = np.log(np.array([float(b) for b, _ in curve_a]))
    pb = np.array([p for _, p in curve_b])
    rb = np.log(np.array([float(b) for b, _ in curve_b]))
    deg = min(3, len(pa) - 1)
    fa = np.polyfit(pa, ra, deg)
    fb = np.polyfit(pb, rb, deg)
    lo = max(pa.min(), pb.min())
    hi = min(pa.max(), pb.max())
    assert hi > lo, (pa, pb)
    ia = np.polyint(fa)
    ib = np.polyint(fb)
    avg = (np.polyval(ia, hi) - np.polyval(ia, lo)
           - np.polyval(ib, hi) + np.polyval(ib, lo)) / (hi - lo)
    return math.exp(avg) - 1.0


# Measured BD-rates vs HM (this repo, round 5, QP 27/32/37, 320x192x9):
#   synthetic  LDB +5.4%   LDP -2.1%   (RA's synthetic fit is unstable:
#              the noise clip saturates PSNR between QP32/37 and the
#              polynomial fit explodes — RA gates on natural content)
#   natural    RA +40.7%   LDB +25.1%  LDP +24.2%
# Round-5 trajectory on natural content: RA +63.9 -> +40.7,
# LDB +45.0 -> +25.1, LDP +47.8 -> +24.2 (exact-RD CU-split trials).
# The remaining natural-content inter gap vs HM's exhaustive per-PU RD
# is the top known gap (PARITY.md); gates hold the measured level with
# ~20% relative headroom so regressions trip while progress tightens
# them.
@pytest.mark.parametrize("cfg,content,max_bd", [
    ("encoder_lowdelay_main.cfg", "synthetic", 0.10),
    ("encoder_lowdelay_P_main.cfg", "synthetic", 0.05),
    ("encoder_randomaccess_main.cfg", "natural", 0.50),
    ("encoder_lowdelay_main.cfg", "natural", 0.32),
    ("encoder_lowdelay_P_main.cfg", "natural", 0.32),
])
def test_bd_rate_vs_hm(cfg, content, max_bd):
    from make_test_yuv import write_clip
    from rd_compare import run_hm, run_ours
    w, h, frames = 320, 192, 9
    qps = [27, 32, 37]
    cfg_path = f"/root/reference/cfg/{cfg}"
    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, w, h, frames, content=content)
        ours = [run_ours(cfg_path, clip, w, h, frames, qp, tmp)
                for qp in qps]
        hm = [run_hm(cfg_path, clip, w, h, frames, qp, tmp)
              for qp in qps]
    bd = bd_rate(ours, hm)
    assert bd <= max_bd, (
        f"{cfg}/{content}: BD-rate vs HM {100 * bd:+.1f}% over QP{qps} "
        f"(ours {ours}, HM {hm})")


@pytest.mark.parametrize("cfg,max_ratio", [
    ("encoder_intra_main.cfg", 1.08),
    ("encoder_lowdelay_P_main.cfg", 1.10),
])
def test_bits_within_margin_of_hm(cfg, max_ratio):
    from rd_compare import run_hm, run_ours
    from make_test_yuv import write_clip
    w, h, frames, qp = 416, 240, 5, 32
    cfg_path = f"/root/reference/cfg/{cfg}"
    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, w, h, frames)
        hm_bits, hm_psnr = run_hm(cfg_path, clip, w, h, frames, qp, tmp)
        # bracket HM's PSNR with two of our QP points, then interpolate
        # log(bits) linearly in PSNR at hm_psnr
        lo_b, lo_p = run_ours(cfg_path, clip, w, h, frames, qp, tmp)
        hi_qp = qp
        hi_b, hi_p = lo_b, lo_p
        while hi_p < hm_psnr and hi_qp > qp - 8:
            hi_qp -= 2
            hi_b, hi_p = run_ours(cfg_path, clip, w, h, frames, hi_qp, tmp)
    if hi_p == lo_p:
        ours_at_hm = lo_b
    else:
        t = (hm_psnr - lo_p) / (hi_p - lo_p)
        ours_at_hm = math.exp(
            (1 - t) * math.log(lo_b) + t * math.log(hi_b))
    ratio = ours_at_hm / hm_bits
    assert hi_p >= hm_psnr - 0.05, (hi_p, hm_psnr)  # bracket reached
    assert ratio <= max_ratio, (
        f"{cfg}: {ours_at_hm:.0f} bits at HM's {hm_psnr:.2f} dB vs HM "
        f"{hm_bits} = {ratio:.3f}x (ours qp{qp}: {lo_b}b/{lo_p:.2f}dB, "
        f"qp{hi_qp}: {hi_b}b/{hi_p:.2f}dB)")
