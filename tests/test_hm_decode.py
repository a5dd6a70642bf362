"""Conformance in the decode direction: the REFERENCE encoder produces
streams, our decoder must reconstruct them byte-identically to the
reference's own recon output (reference TDecTop parity). Exercises tools
our encoder does not emit: multi-ref lists, cabac_init table switching,
AMP at 64x64, inline/inter-predicted RPS, multi-slice pictures, WPP entry
points, CRC/checksum hash SEIs. Skips when the HM oracle is absent."""
import os
import subprocess
import sys

import numpy as np
import pytest

ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
CFG = "/tmp/hm_oracle/cfg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ENC), reason="HM oracle encoder not built")


def _mk_clip(path, w, h, n):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip
    write_clip(str(path), w, h, n)


def _hm_encode(tmp, cfg, extra, w=128, h=80, frames=5, qp=32):
    clip = tmp / "in.yuv"
    if not clip.exists():
        _mk_clip(clip, w, h, frames)
    bs = tmp / "o.bin"
    rec = tmp / "r.yuv"
    cmd = [ENC, "-c", f"{CFG}/{cfg}", "-i", str(clip), "-wdt", str(w),
           "-hgt", str(h), "-f", str(frames), "-fr", "30", "-q", str(qp),
           "-b", str(bs), "-o", str(rec)] + extra
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-500:]
    return bs.read_bytes(), rec.read_bytes()


def _decode_ours(data, bit_depth=8):
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop()
    out = b""
    for pic in dec.decode_stream(data):
        if bit_depth > 8:
            out += b"".join(np.ascontiguousarray(p.astype("<u2")).tobytes()
                            for p in pic)
        else:
            out += b"".join(
                np.ascontiguousarray(p.astype(np.uint8)).tobytes()
                for p in pic)
    return out, dec


@pytest.mark.parametrize("cfg,extra,bd", [
    ("encoder_intra_main.cfg", [], 8),
    ("encoder_lowdelay_P_main.cfg", [], 8),
    ("encoder_lowdelay_main.cfg", [], 8),
    ("encoder_randomaccess_main.cfg", ["-f", "9"], 8),
    ("encoder_randomaccess_main10.cfg", ["--InputBitDepth=8", "-f", "9"],
     10),
])
def test_hm_stream_decodes_byte_identical(tmp_path, cfg, extra, bd):
    frames = 9 if "-f" in extra else 5
    data, hm_rec = _hm_encode(tmp_path, cfg, extra, frames=frames)
    ours, _ = _decode_ours(data, bd)
    assert ours == hm_rec


@pytest.mark.parametrize("extra,label", [
    (["--WaveFrontSynchro=1"], "wpp"),
    (["--SliceMode=1", "--SliceArgument=2"], "multislice"),
    (["--SEIDecodedPictureHash=2"], "crc"),
    (["--SEIDecodedPictureHash=3"], "checksum"),
    (["--Log2ParallelMergeLevel=4"], "parmrg"),
])
def test_hm_tool_variants(tmp_path, extra, label):
    data, hm_rec = _hm_encode(tmp_path, "encoder_lowdelay_P_main.cfg",
                              extra)
    ours, dec = _decode_ours(data)
    assert ours == hm_rec
    if label in ("crc", "checksum"):
        assert dec.hash_status and all(s == "OK" for s in dec.hash_status)


def _scene_change_clip(path, w, h, frames, cut=2):
    """Clip with an abrupt scene change at `cut` so the P slices after
    it code intra CUs next to inter CUs — the case constrained intra
    prediction actually constrains."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(path, "wb") as fh:
        for t in range(frames):
            src = t if t < cut else t + 37  # unrelated content after cut
            for p in make_frame(w, h, src):
                fh.write(np.asarray(p, np.uint8).tobytes())


def test_hm_cip_stream_decodes_byte_identical(tmp_path):
    """Constrained intra prediction (PPS constrained_intra_pred_flag,
    spec 8.4.4.2.2; reference TComPattern::fillReferenceSamples
    constrained branch + TAppEncCfg "ConstrainedIntraPred"): an HM
    --ConstrainedIntraPred=1 stream with intra CUs inside P slices must
    reconstruct byte-identically — inter-coded neighbour samples are
    substituted, not referenced."""
    clip = tmp_path / "scene.yuv"
    _scene_change_clip(clip, 128, 80, 6)
    bs, rec = tmp_path / "o.bin", tmp_path / "r.yuv"
    out = subprocess.run(
        [ENC, "-c", f"{CFG}/encoder_lowdelay_P_main.cfg", "-i", str(clip),
         "-wdt", "128", "-hgt", "80", "-f", "6", "-fr", "30", "-q", "34",
         "--ConstrainedIntraPred=1", "-b", str(bs), "-o", str(rec)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout[-1000:]
    data = bs.read_bytes()
    ours, _ = _decode_ours(data)
    assert ours == rec.read_bytes()
    # the stream must really carry the flag
    from hevc_tpu.decoder.headers import parse_pps
    from hevc_tpu.entropy.nal import nal_to_rbsp, split_annexb
    cip = 0
    for nal in split_annexb(data):
        ntype, _tid, rbsp = nal_to_rbsp(nal)
        if ntype == 34:  # PPS
            cip = parse_pps(rbsp).constrained_intra_pred_flag
    assert cip == 1


def test_hm_weighted_bipred_stream_decodes(tmp_path):
    """Explicit weighted bi-prediction (pps weighted_bipred_flag,
    spec 8.5.3.3.4.3; reference TComWeightPrediction::addWeightBi and
    WeightPredAnalysis over both lists). A fading clip makes HM's WP
    analysis signal real per-ref luma+chroma weights in B slices; our
    decoder must apply the weighted bi (and weighted uni-in-B) sample
    prediction byte-identically."""
    clip = tmp_path / "fade.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(6):
            for p in make_frame(128, 96, 0):
                q = (np.asarray(p, np.int32) * (10 - t) // 10)
                fh.write(q.astype(np.uint8).tobytes())
    bs, rec = tmp_path / "o.bin", tmp_path / "r.yuv"
    out = subprocess.run(
        [ENC, "-c", f"{CFG}/encoder_lowdelay_main.cfg", "-i", str(clip),
         "-wdt", "128", "-hgt", "96", "-f", "6", "-fr", "30", "-q", "30",
         "--WeightedPredB=1", "-b", str(bs), "-o", str(rec)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout[-1000:]
    data = bs.read_bytes()
    ours, _ = _decode_ours(data)
    assert ours == rec.read_bytes()
    # the stream must really carry explicit weights (not defaults only)
    from hevc_tpu.decoder.headers import (parse_pps, parse_slice_header,
                                          parse_sps)
    from hevc_tpu.entropy.nal import split_annexb
    sps = pps = None
    explicit = 0
    for nal in split_annexb(data):
        nal_type = (nal[0] >> 1) & 0x3F
        raw = nal[2:]
        rbsp = bytearray()
        i = 0
        while i < len(raw):
            if (i + 2 < len(raw) and raw[i] == 0 and raw[i + 1] == 0
                    and raw[i + 2] == 3):
                rbsp += raw[i:i + 2]
                i += 3
            else:
                rbsp.append(raw[i])
                i += 1
        rbsp = bytes(rbsp)
        if nal_type == 33:
            sps = parse_sps(rbsp)
        elif nal_type == 34:
            pps = parse_pps(rbsp)
        elif nal_type < 32:
            sh, _off = parse_slice_header(rbsp, nal_type, sps, pps)
            for lx_tab in (getattr(sh, "wp_tables", None) or []):
                for lw, cw in lx_tab:
                    explicit += (lw is not None) + (cw is not None)
    assert pps.weighted_bipred_flag == 1
    assert explicit > 0, "WP analysis signalled no explicit weights"


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("extra,label", [
    (["--SliceSegmentMode=1", "--SliceSegmentArgument=17"], "ctus"),
    (["--SliceSegmentMode=2", "--SliceSegmentArgument=900"], "bytes"),
    (["--SliceMode=1", "--SliceArgument=30",
      "--SliceSegmentMode=1", "--SliceSegmentArgument=10"],
     "slices-plus-segments"),
    (["--WaveFrontSynchro=1", "--SliceSegmentMode=1",
      "--SliceSegmentArgument=10"], "wpp"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceSegmentMode=3",
      "--SliceSegmentArgument=1"], "tiles"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceMode=3", "--SliceArgument=1"],
     "slicemode3"),
])
def test_hm_dependent_slice_segments_decode(tmp_path, extra, label):
    """Dependent slice segments (spec 7.3.6.1 short header; CABAC
    contexts, neighbour maps and dQP chain continue across segments of
    one slice) and SliceMode 3 / SliceSegmentMode 3 (slices or segments
    made of whole tiles, raster slice_segment_address converted to tile
    scan) must decode byte-identically (reference TDecSlice
    copySliceInfo, TComPicSym CtuRsToTsAddrMap)."""
    w, h, frames = 640, 360, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs = tmp_path / "o.bin"
    out = subprocess.run(
        [ENC, "-c", "/root/reference/cfg/encoder_lowdelay_main.cfg",
         "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
         str(frames), "-fr", "30", "-q", "30",
         "--SEIDecodedPictureHash=1", *extra,
         "-b", str(bs), "-o", str(tmp_path / "hmrec.yuv")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-1500:]
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")]) == 0
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("extra,label", [
    (["--CUTransquantBypassFlagForce=1"], "lossless"),
    (["--CUTransquantBypassFlagForce=0"], "mixed"),
])
def test_hm_lossless_stream_decodes(tmp_path, extra, label):
    """cu_transquant_bypass (lossless CUs, spec 8.6.4.1): the coded
    levels ARE the residual, transform_skip_flag/sign hiding are
    suppressed, and the in-loop filters leave bypass samples untouched
    (spec 8.7.2.5.4 / 8.7.3). Byte-identical to the HM decoder."""
    data, hm_rec = _hm_encode(
        tmp_path, "encoder_lowdelay_main.cfg",
        ["--TransquantBypassEnableFlag=1", "--SEIDecodedPictureHash=1",
         *extra])
    ours, dec = _decode_ours(data)
    assert ours == hm_rec
    assert all(s == "OK" for s in dec.hash_status)


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
def test_hm_lossless_rext_tools_decode(tmp_path):
    """Lossless + the full RExt tool set (implicit/explicit RDPCM with
    the sample-adaptive-prediction edge-filter disable, residual
    rotation, single sig ctx, persistent Rice) at 10-bit must decode
    byte-identically (reference TComPrediction.cpp:481
    enableEdgeFilters, TComTrQuant::invRdpcmNxN bypass path)."""
    data, hm_rec = _hm_encode(
        tmp_path, "encoder_lowdelay_main_rext.cfg",
        ["--TransquantBypassEnableFlag=1", "--CUTransquantBypassFlagForce=1",
         "--SEIDecodedPictureHash=1", "--TransformSkip=1",
         "--ResidualRotation=1", "--ImplicitResidualDPCM=1",
         "--ExplicitResidualDPCM=1", "--SingleSignificanceMapContext=1",
         "--GolombRiceParameterAdaptation=1", "--InternalBitDepth=10"])
    ours, dec = _decode_ours(data, bit_depth=10)
    assert ours == hm_rec
    assert all(s == "OK" for s in dec.hash_status)


def _write_hm_scaling_file(path, seed=3):
    """HM-format scaling list file with non-default values (reference
    TComScalingList::outputScalingLists layout)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    names = ([(f"{p}4X4_{c}", 4) for p in ("INTRA", "INTER")
              for c in ("LUMA", "CHROMAU", "CHROMAV")]
             + [(f"{p}{s}X{s}_{c}", 8) for s in (8, 16)
                for p in ("INTRA", "INTER")
                for c in ("LUMA", "CHROMAU", "CHROMAV")]
             + [("INTRA32X32_LUMA", 8), ("INTER32X32_LUMA", 8)])
    with open(path, "w") as f:
        for nm, n in names:
            vals = np.clip(16 + rng.integers(-6, 20, n * n), 1, 255)
            f.write(nm + " =\n  ")
            for y in range(n):
                row = ", ".join("%3d" % v
                                for v in vals[y * n:(y + 1) * n]) + ", "
                f.write(row + ("\n  " if y + 1 < n else "\n"))
            if "16X16" in nm or "32X32" in nm:
                f.write(nm + "_DC = \n  %3d\n"
                        % int(np.clip(16 + rng.integers(-4, 10), 1, 255)))
            f.write("\n")


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("cfg", ["encoder_intra_main.cfg",
                                 "encoder_lowdelay_main.cfg"])
def test_hm_explicit_scaling_list_stream_decodes(tmp_path, cfg):
    """Explicit (file-read) scaling lists: HM ScalingList=2 streams with
    non-default matrices (DPCM-coded scaling_list_data in the SPS, spec
    7.3.4) must decode byte-identically (reference
    TComScalingList::xParseScalingList / TDecCavlc::parseScalingList)."""
    slist = tmp_path / "slist.txt"
    _write_hm_scaling_file(slist)
    data, hm_rec = _hm_encode(
        tmp_path, cfg,
        ["--ScalingList=2", f"--ScalingListFile={slist}",
         "--SEIDecodedPictureHash=1"])
    bs = tmp_path / "o.bin"
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")]) == 0
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("extra,label", [
    (["--CbQpOffset=2", "--CrQpOffset=-2"], "chroma-qp-offsets"),
    (["--MaxCuDQPDepth=2"], "dqp-depth2"),
    (["--AdaptiveQP=1", "--MaxCuDQPDepth=2"], "aqp-depth2"),
    (["--AdaptiveQP=1", "--MaxCuDQPDepth=3", "--CbQpOffset=2"],
     "aqp-depth3-offs"),
    (["--AdaptiveQP=1", "--MaxCuDQPDepth=2", "--WaveFrontSynchro=1"],
     "aqp-wpp"),
])
def test_hm_dqp_and_chroma_offset_streams_decode(tmp_path, extra, label):
    """Sub-CTU quantization groups (diff_cu_qp_delta_depth 1..3, spec
    8.6.1 qPY_PRED from left/above QG neighbours; reference
    TComDataCU::getRefQP/getLastCodedQP) and pps cb/cr chroma QP offsets
    must decode byte-identically — AdaptiveQP produces real nonzero
    per-QG deltas. HM's encoder segfaults at teardown with AdaptiveQP
    after writing the complete stream, so the oracle decoder's success
    gates the input instead of the encoder's exit code."""
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, 416, 240, 5)
    bs = tmp_path / "o.bin"
    subprocess.run(
        [ENC, "-c", "/root/reference/cfg/encoder_lowdelay_main.cfg",
         "-i", str(clip), "-wdt", "416", "-hgt", "240", "-f", "5",
         "-fr", "30", "-q", "30", *extra,
         "-b", str(bs), "-o", str(tmp_path / "hmrec.yuv")],
        capture_output=True, text=True)
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0, "HM oracle could not decode its own stream"
    from hevc_tpu.cli.decode import main as dec_main
    dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")])
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("rext_cfg", [
    "encoder_intra_main_rext.cfg",
    "encoder_intra_high_throughput_rext.cfg",
    "encoder_lowdelay_main_rext.cfg",
    "encoder_randomaccess_main_rext.cfg",
])
def test_hm_rext_full_tools_stream_decodes(tmp_path, rext_cfg):
    """HM range-extension streams with ALL the cfg's RExt coding tools
    ON — cross-component prediction, residual rotation, implicit +
    explicit RDPCM, persistent Golomb-Rice adaptation, and (high
    throughput) CABAC bypass alignment with the single significance-map
    context — must decode byte-identically to the HM decoder
    (reference TDecSbac RExt paths / TComTrQuant::invRdpcmNxN /
    crossComponentPrediction)."""
    import numpy as np
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in444.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            y, u, v = make_frame(w, h, t)
            fh.write(np.asarray(y, np.uint8).tobytes())
            for p in (u, v):
                full = np.repeat(np.repeat(np.asarray(p, np.uint8), 2, 0),
                                 2, 1)[:h, :w]
                fh.write(full.tobytes())
    bs = tmp_path / "o.bin"
    out = subprocess.run(
        [ENC, "-c", f"/root/reference/cfg/{rext_cfg}",
         "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
         str(frames), "-fr", "30", "-q", "32", "--InputChromaFormat=444",
         "--ChromaFormatIDC=444",
         "-b", str(bs), "-o", str(tmp_path / "hmrec.yuv")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-1500:]
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0
    from hevc_tpu.cli.decode import main as dec_main
    dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")])
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("cfg,extra,label", [
    ("encoder_intra_main_rext.cfg", [], "intra"),
    ("encoder_lowdelay_main_rext.cfg", [], "ldb"),
    ("encoder_randomaccess_main_rext.cfg", [], "ra"),
    ("encoder_intra_main_rext.cfg",
     ["--InternalBitDepth=10", "--Profile=main-RExt"], "10bit"),
    ("encoder_lowdelay_main_rext.cfg",
     ["--TransformSkip=1", "--ImplicitResidualDPCM=1",
      "--ExplicitResidualDPCM=1", "--ResidualRotation=1",
      "--GolombRiceParameterAdaptation=1", "--Profile=main-RExt"],
     "tools"),
    ("encoder_intra_main_rext.cfg",
     ["--PCMEnabledFlag=1", "--PCMLog2MinSize=3", "--PCMLog2MaxSize=5",
      "-q", "51"], "pcm"),
])
def test_hm_422_stream_decodes(tmp_path, cfg, extra, label):
    """HM 4:2:2 streams decode byte-identically: two square chroma
    sub-TBs per luma TB with per-half cbf (spec 7.3.8.8), Table 8-3
    chroma intra angle remapping, eighth-pel horizontal / quarter-pel
    vertical chroma MC (spec 8.5.3.3.3.2), per-direction deblock grid,
    and Min(qPi,51) chroma QP (reference TComChromaFormat.h:80,144,
    TComTU 4:2:2 sub-TU iteration, g_chroma422IntraAngleMappingTable)."""
    import numpy as np
    w, h, frames = 128, 80, 5
    clip = tmp_path / "in422.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            y, u, v = make_frame(w, h, t)
            fh.write(np.asarray(y, np.uint8).tobytes())
            for p in (u, v):
                full = np.repeat(np.asarray(p, np.uint8), 2, 0)[:h, :w // 2]
                fh.write(full.tobytes())
    bs = tmp_path / "o.bin"
    out = subprocess.run(
        [ENC, "-c", f"/root/reference/cfg/{cfg}",
         "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
         str(frames), "-fr", "30", "-q", "32", "--InputChromaFormat=422",
         "--ChromaFormatIDC=422", "--SEIDecodedPictureHash=1",
         *extra, "-b", str(bs), "-o", str(tmp_path / "hmrec.yuv")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-1500:]
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0
    from hevc_tpu.cli.decode import main as dec_main
    dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")])
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()


@pytest.mark.skipif(not os.path.exists(ENC),
                    reason="HM oracle encoder not built")
def test_hm_444_inter_stream_decodes(tmp_path):
    """HM-encoded Main 4:4:4 LOW-DELAY stream (RExt coding tools off):
    our decoder output must match the HM decoder byte-for-byte —
    4:4:4 inter MC uses quarter-pel chroma MVs with doubled filter
    phases (spec 8.5.3.3.3.2 SubWidthC scaling)."""
    import numpy as np
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in444.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            y, u, v = make_frame(w, h, t)
            fh.write(np.asarray(y, np.uint8).tobytes())
            for p in (u, v):
                full = np.repeat(np.repeat(np.asarray(p, np.uint8), 2, 0),
                                 2, 1)[:h, :w]
                fh.write(full.tobytes())
    bs = tmp_path / "o.bin"
    out = subprocess.run(
        [ENC, "-c", "/root/reference/cfg/encoder_lowdelay_main_rext.cfg",
         "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
         str(frames), "-fr", "30", "-q", "32", "--InputChromaFormat=444",
         "--ChromaFormatIDC=444", "--CrossComponentPrediction=0",
         "--ImplicitResidualDPCM=0", "--ExplicitResidualDPCM=0",
         "--ResidualRotation=0", "--GolombRiceParameterAdaptation=0",
         "--AlignCABACBeforeBypass=0", "--SingleSignificanceMapContext=0",
         "--HighPrecisionPredictionWeighting=0",
         "-b", str(bs), "-o", str(tmp_path / "hmrec.yuv")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-1500:]
    ref = subprocess.run(
        ["/tmp/hm_oracle/bin/TAppDecoderStatic", "-b", str(bs), "-o",
         str(tmp_path / "hmdec.yuv")], capture_output=True, text=True)
    assert ref.returncode == 0
    from hevc_tpu.cli.decode import main as dec_main
    dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")])
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hmdec.yuv").read_bytes()
