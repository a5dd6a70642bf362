"""VUI signalling (annex E.2.1; reference TAppEncCfg's VUI option block,
TEncCavlc::codeVUI / TDecCAVLC::parseVUI): the encoder's cfg-driven VUI
groups round-trip through our own SPS parser, and an HM-oracle decode of
a VUI-carrying stream still reproduces every picture hash."""
import os
import subprocess
import sys

import numpy as np
import pytest

ORACLE = "/tmp/hm_oracle/bin/TAppDecoderStatic"

VUI_ARGS = [
    "--VuiParametersPresent=1",
    "--AspectRatioInfoPresent=1", "--AspectRatioIdc=255",
    "--SarWidth=4", "--SarHeight=3",
    "--OverscanInfoPresent=1", "--OverscanAppropriate=1",
    "--VideoSignalTypePresent=1", "--VideoFormat=1", "--VideoFullRange=1",
    "--ColourDescriptionPresent=1", "--ColourPrimaries=1",
    "--TransferCharacteristics=1", "--MatrixCoefficients=1",
    "--ChromaLocInfoPresent=1", "--ChromaSampleLocTypeTopField=1",
    "--ChromaSampleLocTypeBottomField=1",
    "--NeutralChromaIndication=1",
    "--DefaultDisplayWindowFlag=1", "--DefDispWinLeftOffset=2",
    "--DefDispWinRightOffset=4", "--DefDispWinTopOffset=1",
    "--DefDispWinBottomOffset=3",
    "--PocProportionalToTimingFlag=1", "--NumTicksPocDiffOneMinus1=0",
    "--BitstreamRestriction=1", "--TilesFixedStructure=1",
    "--MotionVectorsOverPicBoundaries=1", "--MaxBytesPerPicDenom=2",
    "--MaxBitsPerMinCuDenom=1", "--Log2MaxMvLengthHorizontal=10",
    "--Log2MaxMvLengthVertical=10",
]


def _encode(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip
    clip = tmp_path / "in.yuv"
    write_clip(str(clip), 64, 64, 2)
    bs, rec = tmp_path / "o.bin", tmp_path / "r.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", "64", "-hgt", "64", "-f", "2",
          "-q", "32", "-b", str(bs), "-o", str(rec)] + VUI_ARGS)
    return bs, rec


def test_vui_fields_roundtrip(tmp_path):
    bs, _rec = _encode(tmp_path)
    from hevc_tpu.decoder.headers import parse_sps
    from hevc_tpu.entropy.nal import nal_to_rbsp, split_annexb
    sps = None
    for nal in split_annexb(bs.read_bytes()):
        ntype, _tid, rbsp = nal_to_rbsp(nal)
        if ntype == 33:
            sps = parse_sps(rbsp)
    assert sps is not None and sps.vui_parameters_present_flag
    v = sps.vui_ext
    assert v is not None
    assert v.aspect_ratio_idc == 255 and (v.sar_width, v.sar_height) == (4, 3)
    assert v.overscan_info_present_flag and v.overscan_appropriate_flag
    assert v.video_signal_type_present_flag and v.video_format == 1
    assert v.video_full_range_flag and v.colour_description_present_flag
    assert (v.colour_primaries, v.transfer_characteristics,
            v.matrix_coeffs) == (1, 1, 1)
    assert v.chroma_loc_info_present_flag
    assert (v.chroma_sample_loc_type_top_field,
            v.chroma_sample_loc_type_bottom_field) == (1, 1)
    assert v.neutral_chroma_indication_flag
    assert v.default_display_window_flag
    assert (v.def_disp_win_left_offset, v.def_disp_win_right_offset,
            v.def_disp_win_top_offset, v.def_disp_win_bottom_offset) \
        == (2, 4, 1, 3)
    assert v.poc_proportional_to_timing_flag
    assert v.bitstream_restriction_flag and v.tiles_fixed_structure_flag
    assert v.motion_vectors_over_pic_boundaries_flag
    assert (v.log2_max_mv_length_horizontal,
            v.log2_max_mv_length_vertical) == (10, 10)


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="HM oracle decoder not built")
def test_vui_stream_hm_conformant(tmp_path):
    bs, rec = _encode(tmp_path)
    dec = tmp_path / "d.yuv"
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == 2, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
