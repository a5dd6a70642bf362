"""End-to-end conformance: encode synthetic clips, decode with the
reference HM decoder (oracle), require per-picture hash 'OK' and
byte-identical reconstruction. Skips when the oracle binary is absent
(build it with tools/build_reference_oracle.sh)."""
import os
import subprocess
import sys

import numpy as np
import pytest

ORACLE = "/tmp/hm_oracle/bin/TAppDecoderStatic"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="HM oracle decoder not built")


def _mk_clip(path, w, h, n, seed=7):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_test_yuv import write_clip
    write_clip(str(path), w, h, n)


@pytest.mark.parametrize("dims,frames,qp", [
    ((64, 64), 1, 32),
    ((128, 80), 2, 27),
    ((416, 240), 2, 37),
])
def test_intra_conformance(tmp_path, dims, frames, qp):
    w, h = dims
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs = tmp_path / "out.bin"
    rec = tmp_path / "rec.yuv"
    dec = tmp_path / "dec.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", str(qp), "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    ok_count = out.stdout.count("(OK)")
    assert ok_count == frames, out.stdout[-2000:]
    assert rec.read_bytes() == dec.read_bytes()


@pytest.mark.parametrize("intra_period,frames", [(-1, 4), (3, 6)])
def test_lowdelay_p_conformance(tmp_path, intra_period, frames):
    w, h = 128, 80
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", f"--IntraPeriod={intra_period}", "-b", str(bs),
          "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    if intra_period == -1:
        assert out.stdout.count("P-SLICE") == frames - 1


@pytest.mark.parametrize("extra,label", [
    (["--ConstrainedIntraPred=1"], "cip"),
    (["--Log2ParallelMergeLevel=4"], "parmrg"),
])
def test_cip_parmrg_encode_conformance(tmp_path, extra, label):
    """Encode-side constrained intra prediction (spec 8.4.4.2.2 —
    reference TComPattern fillReferenceSamples constrained branch,
    TAppEncCfg "ConstrainedIntraPred") and parallel merge estimation
    regions (spec 6.4.2 — TAppEncCfg "Log2ParallelMergeLevel"): a
    scene-change clip forces intra CUs into P slices; the unmodified HM
    decoder must reproduce every picture hash, so the encoder's
    reference-sample substitution / merge-region derivation must match
    its own signalled PPS flags."""
    w, h, frames = 128, 80, 6
    clip = tmp_path / "scene.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            src = t if t < 2 else t + 37
            for p in make_frame(w, h, src):
                fh.write(np.asarray(p, np.uint8).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h),
          "-f", str(frames), "-q", "34", "--IntraPeriod=-1", "-b", str(bs),
          "-o", str(rec)] + extra)
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    # our own decoder agrees too
    from hevc_tpu.decoder.top import DecoderTop
    got = b"".join(
        np.ascontiguousarray(p.astype(np.uint8)).tobytes()
        for pic in DecoderTop().decode_stream(bs.read_bytes()) for p in pic)
    assert got == rec.read_bytes()


def test_multiref_lowdelay_p_conformance(tmp_path):
    """Four active references per the reference LDP CTC cfg (GOP rows
    -1 -5 -9 -13 etc., NumRefIdxActive 4 — TEncSearch per-refIdx loop):
    the stream must carry ref_idx > 0 PUs and stay byte-conformant."""
    w, h, frames = 128, 80, 8
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    # our decoder agrees
    from hevc_tpu.decoder.top import DecoderTop
    recons = list(DecoderTop().decode_stream(bs.read_bytes()))
    assert len(recons) == frames


def test_own_decoder_matches_reference_decoder(tmp_path):
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs = tmp_path / "o.bin"
    from hevc_tpu.cli.encode import main as enc_main
    enc_main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "32", "--IntraPeriod=-1", "-b", str(bs),
              "-o", str(tmp_path / "r.yuv")])
    # our decoder
    from hevc_tpu.cli.decode import main as dec_main
    rc = dec_main(["-b", str(bs), "-o", str(tmp_path / "ours.yuv")])
    assert rc == 0  # all hashes OK
    # reference decoder
    out = subprocess.run([ORACLE, "-b", str(bs), "-o",
                          str(tmp_path / "hm.yuv")], capture_output=True)
    assert out.returncode == 0
    assert (tmp_path / "ours.yuv").read_bytes() == \
        (tmp_path / "hm.yuv").read_bytes()


def test_lowdelay_b_conformance(tmp_path):
    w, h, frames = 128, 80, 5
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_lowdelay_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert out.stdout.count("B-SLICE") == frames - 1
    assert rec.read_bytes() == dec.read_bytes()


def test_main10_conformance(tmp_path):
    w, h, frames = 128, 80, 3
    clip = tmp_path / "in10.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_test_yuv import write_clip
    write_clip(str(clip), w, h, frames, 10)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", "--IntraPeriod=-1", "--InternalBitDepth=10",
          "--InputBitDepth=10", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()


def test_sao_conformance(tmp_path):
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", "--IntraPeriod=-1", "--SAO=1", "-b", str(bs),
          "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "o2.yuv")]) == 0
    assert (tmp_path / "o2.yuv").read_bytes() == dec.read_bytes()


def test_randomaccess_conformance(tmp_path):
    """Hierarchical-B GOP from the reference randomaccess cfg: frame
    reordering, per-entry inline RPS, past+future reference lists,
    output bumping (reference encoder_randomaccess_main.cfg GOP table,
    TEncGOP.cpp:1045). Also decodes with our own decoder and requires a
    byte-identical match to the HM oracle output."""
    w, h, frames = 128, 80, 6   # IDR + one GOP-of-4 + one tail frame
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_randomaccess_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "30", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    # B slices must actually be present (hierarchical levels)
    assert "B-SLICE" in out.stdout
    # own decoder: multi-POC DPB + output bumping
    from hevc_tpu.decoder.top import DecoderTop
    dt = DecoderTop()
    got = b"".join(
        b"".join(np.clip(p, 0, 255).astype(np.uint8).tobytes()
                 for p in planes)
        for planes in dt.decode_stream(bs.read_bytes()))
    assert got == dec.read_bytes()
    assert dt.hash_status == ["OK"] * frames


def _mk_clip_444(path, w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    with open(path, "wb") as f:
        for i in range(n):
            y = ((np.sin(xx / 7 + i) + np.cos(yy / 5)) * 50 + 128
                 + rng.integers(-20, 20, (h, w))).clip(0, 255)
            u = ((np.sin(xx / 11) * 60) + 128
                 + rng.integers(-15, 15, (h, w))).clip(0, 255)
            v = ((np.cos(yy / 9) * 60) + 128
                 + rng.integers(-15, 15, (h, w))).clip(0, 255)
            for p in (y, u, v):
                f.write(p.astype(np.uint8).tobytes())


@pytest.mark.parametrize("extra", [[], ["--InternalBitDepth=8"]])
def test_rext_444_conformance(tmp_path, extra):
    """RExt 4:4:4 intra under the reference high-throughput cfg (10-bit
    internal by default; 8-bit Main 4:4:4 variant): full-size chroma TBs,
    per-part chroma modes, 4:4:4 deblock/SAO, RExt PTL signalling
    (reference cfg/encoder_intra_high_throughput_rext.cfg,
    TEncCfg profile plumbing TAppEncCfg.cpp)."""
    w, h, frames = 176, 144, 2
    clip = tmp_path / "in444.yuv"
    _mk_clip_444(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_intra_high_throughput_rext.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "34", "--InputChromaFormat=444"] + extra
         + ["-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    # own decoder handles 4:4:4 too
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def _mk_clip_422(path, w, h, n, bd=8, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cxx = xx[:, :w // 2]
    cyy = yy[:, :w // 2]
    dt = np.uint8 if bd == 8 else np.uint16
    sc = 1 << (bd - 8)
    with open(path, "wb") as f:
        for i in range(n):
            y = ((np.sin(xx / 7 + i) + np.cos(yy / 5)) * 50 + 128
                 + rng.integers(-20, 20, (h, w))).clip(0, 255)
            u = ((np.sin(cxx / 11) * 60) + 128
                 + rng.integers(-15, 15, (h, w // 2))).clip(0, 255)
            v = ((np.cos(cyy / 9) * 60) + 128
                 + rng.integers(-15, 15, (h, w // 2))).clip(0, 255)
            for p in (y, u, v):
                f.write((p.astype(np.int64) * sc).astype(dt).tobytes())


def test_lossy_explicit_rdpcm_encode(tmp_path):
    """Lossy explicit residual DPCM: with TransformSkip +
    ExplicitResidualDPCM the native engine trials quantized sequential
    DPCM in both directions on inter 4x4 transform-skip TBs against
    plain TS (reference TComTrQuant::applyForwardRDPCM,
    TComTrQuant.cpp:1749, and rdpcmNxN). The coded stream must carry
    nonzero explicit_rdpcm flags AND decode bit-exact on the HM decoder
    and our own. Content: chroma residual is a sharp step per row,
    identical across rows — vertical DPCM codes it in one row of
    diffs, which neither the DCT nor plain TS can match."""
    w, h, frames = 176, 144, 3
    rng = np.random.default_rng(7)
    ybase = np.repeat(np.repeat(
        rng.integers(30, 225, (h // 4, w // 4)), 4, 0), 4, 1)
    cw2, ch2 = w // 2, h // 2
    strip = np.zeros(cw2, np.int32)
    edges = np.sort(rng.integers(0, cw2, 20))
    val, prev = 0, 0
    for e in edges:
        strip[prev:e] = val
        val = int(rng.integers(-45, 45))
        prev = e
    clip = tmp_path / "in.yuv"
    with open(clip, "wb") as f:
        for fi in range(frames):
            yfr = ybase.astype(np.int32).copy()
            if fi:
                # scattered fresh-noise 8x8 blocks force 8x8 CUs, whose
                # chroma TBs are the 4x4 transform-skip candidates
                for by in range(0, h, 8):
                    for bx in range(0, w, 8):
                        if (bx // 8 + by // 8 + fi) % 2 == 0:
                            yfr[by:by + 8, bx:bx + 8] += \
                                rng.integers(-35, 35, (8, 8))
            f.write(np.clip(yfr, 0, 255).astype(np.uint8).tobytes())
            cfr = np.clip(128 + (strip[None, :] if fi else 0), 0,
                          255).astype(np.uint8)
            cfr = np.broadcast_to(cfr, (ch2, cw2))
            f.write(cfr.tobytes())
            f.write(cfr.tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "27", "--IntraPeriod=-1", "--TransformSkip=1",
          "--MaxCUSize=16", "--ExplicitResidualDPCM=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.decoder.top import DecoderTop
    dtop = DecoderTop()
    planes = [p for fr in dtop.decode_stream(bs.read_bytes()) for p in fr]
    assert b"".join(p.astype(np.uint8).tobytes()
                    for p in planes) == dec.read_bytes()
    # the tool must actually be exercised, not just signalled off
    assert dtop.rdpcm_tb_count > 0


def test_rext_422_inter_conformance(tmp_path):
    """4:2:2 INTER encode (LDP, previous-frame references): non-square
    chroma MC (eighth-pel horizontal / quarter-pel vertical), two-sub-TB
    chroma residuals on inter CUs, 4:2:2 root-cbf coverage. HM decoder
    hash OK + byte-identical; our decoder agrees."""
    w, h, frames = 64, 64, 3
    clip = tmp_path / "in422.yuv"
    _mk_clip_422(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1",
          "--InputChromaFormat=422", "--ChromaFormatIDC=422",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert out.stdout.count("P-SLICE") == frames - 1
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


@pytest.mark.parametrize("qp,extra", [
    (32, []),
    (45, []),
    (27, ["--InputBitDepth=10", "--InternalBitDepth=10"]),
])
def test_rext_422_conformance(tmp_path, qp, extra):
    """4:2:2 intra encode under the reference main_rext cfg: two square
    chroma sub-TBs per luma TB with per-half cbf (spec 7.3.8.8), Table
    8-3 chroma angle remapping, full-height half-width planes through
    deblock/SAO, 4:2:2 RExt PTL constraint flags (reference
    cfg/encoder_intra_main_rext.cfg, TComChromaFormat.h:80). The HM
    decoder must verify every picture hash and produce byte-identical
    reconstruction; our decoder must agree."""
    w, h, frames = 176, 144, 2
    bd = 10 if extra else 8
    clip = tmp_path / "in422.yuv"
    _mk_clip_422(clip, w, h, frames, bd)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_intra_main_rext.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", str(qp), "--InputChromaFormat=422", "--ChromaFormatIDC=422"]
         + extra + ["-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


@pytest.mark.parametrize("extra,label", [
    (["--SliceSegmentMode=1", "--SliceSegmentArgument=9"], "seg-ctus"),
    (["--SliceSegmentMode=2", "--SliceSegmentArgument=800"], "seg-bytes"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceMode=3", "--SliceArgument=1"],
     "tiles-per-slice"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceMode=3", "--SliceArgument=2"],
     "two-tiles-per-slice"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceSegmentMode=3",
      "--SliceSegmentArgument=1"], "seg-tiles"),
    (["--UniformSpacingIdc=1", "--NumTileColumnsMinus1=1",
      "--NumTileRowsMinus1=1", "--SliceSegmentMode=3",
      "--SliceSegmentArgument=2"], "seg-two-tiles"),
])
def test_dependent_segments_and_slicemode3_encode(tmp_path, extra, label):
    """Dependent slice segments (SliceSegmentMode 1/2: CABAC contexts
    continue across segments, short dependent headers, native
    segment_cut engine restart) and SliceMode 3 (slices of whole tiles,
    in-slice tile entry points) produce conformant streams: HM decoder
    hash OK + byte-identical recon; our decoder agrees (reference
    TAppEncCfg.cpp:852, TypeDef.h:581)."""
    w, h = (640, 360) if "Tile" in " ".join(extra) else (416, 240)
    frames = 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--IntraPeriod=-1", *extra,
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


HBD_ORACLE = "/tmp/hm_oracle_hbd/bin/TAppDecoderStatic"


@pytest.mark.skipif(not os.path.exists(HBD_ORACLE),
                    reason="high-bit-depth HM oracle not built "
                           "(tools/build_hbd_oracle.sh)")
@pytest.mark.parametrize("cfg,label", [
    ("encoder_intra_main_rext.cfg", "intra"),
    ("encoder_lowdelay_main_rext.cfg", "ldb"),
    ("encoder_randomaccess_main_rext.cfg", "ra"),
])
def test_14bit_conformance(tmp_path, cfg, label):
    """14-bit internal depth (reference high-bit-depth build target,
    TypeDef.h:244 RExt__HIGH_BIT_DEPTH_SUPPORT): the MC interpolation
    headroom floors at 2 (TComInterpolationFilter max(2, 14-bitDepth) —
    16-bit intermediates), bi averaging shifts by headroom+1. Verified
    against an HM oracle built with high-bit-depth support: hash OK and
    byte-identical recon; our decoder also reads HM's own 14-bit
    streams."""
    w, h, frames = 128, 80, 3
    clip = tmp_path / "in14.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            for p in make_frame(w, h, t):
                fh.write((np.asarray(p, np.uint16) << 6).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", f"/root/reference/cfg/{cfg}", "-i", str(clip),
          "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr", "30",
          "-q", "32", "--InputBitDepth=14", "--InternalBitDepth=14",
          "--Profile=main-RExt", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([HBD_ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()
    # and general 14-bit HM streams decode byte-identically
    hm_enc = "/tmp/hm_oracle_hbd/bin/TAppEncoderStatic"
    hmbs = tmp_path / "hm.bin"
    subprocess.run(
        [hm_enc, "-c", f"/root/reference/cfg/{cfg}", "-i", str(clip),
         "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr", "30",
         "-q", "32", "--InputBitDepth=14", "--InternalBitDepth=14",
         "--SEIDecodedPictureHash=1", "-b", str(hmbs),
         "-o", str(tmp_path / "hr.yuv")], capture_output=True)
    hmd = tmp_path / "hmd.yuv"
    assert subprocess.run([HBD_ORACLE, "-b", str(hmbs), "-o", str(hmd)],
                          capture_output=True).returncode == 0
    own2 = tmp_path / "own2.yuv"
    assert dmain(["-b", str(hmbs), "-o", str(own2)]) == 0
    assert own2.read_bytes() == hmd.read_bytes()


@pytest.mark.skipif(not os.path.exists(HBD_ORACLE),
                    reason="high-bit-depth HM oracle not built "
                           "(tools/build_hbd_oracle.sh)")
@pytest.mark.parametrize("cfg,label", [
    ("encoder_intra_main_rext.cfg", "intra"),
    ("encoder_lowdelay_main_rext.cfg", "ldb"),
    ("encoder_randomaccess_main_rext.cfg", "ra"),
    ("encoder_intra_main_rext.cfg", "intra422"),
])
def test_16bit_conformance(tmp_path, cfg, label):
    """16-bit internal depth: samples live in the int32 pel path
    (libhevc_entropy_hbd.so, -DHEVC_PEL32 — the analog of the reference
    high-bit-depth build's `typedef Int Pel`, TypeDef.h:698). Content
    deliberately exceeds 2^15 so any residual int16 treatment of samples
    wraps, and the inverse-transform output keeps values beyond +-32767
    (the reference's second-stage clip is Pel-type protection, quote
    \"Clipping here is not in the standard\", TComTrQuant.cpp:966).
    Verified: HM oracle hash OK + byte-identical recon; our decoder
    agrees and reads HM's own 16-bit streams byte-identically."""
    w, h, frames = 128, 80, 3
    fmt422 = label.endswith("422")
    clip = tmp_path / "in16.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            y, u, v = (np.asarray(p) for p in make_frame(w, h, t))
            if fmt422:  # chroma subsampled horizontally only
                u = np.repeat(u, 2, axis=0)[:h, :]
                v = np.repeat(v, 2, axis=0)[:h, :]
            for p in (y, u, v):
                fh.write((p.astype(np.uint16) << 8).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", f"/root/reference/cfg/{cfg}", "-i", str(clip),
          "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr", "30",
          "-q", "32", "--InputBitDepth=16", "--InternalBitDepth=16"]
         + (["--InputChromaFormat=422"] if fmt422 else [])
         + ["--Profile=main-RExt", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([HBD_ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()
    # general 16-bit HM streams decode byte-identically
    hm_enc = "/tmp/hm_oracle_hbd/bin/TAppEncoderStatic"
    hmbs = tmp_path / "hm.bin"
    subprocess.run(
        [hm_enc, "-c", f"/root/reference/cfg/{cfg}", "-i", str(clip),
         "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr", "30",
         "-q", "32", "--InputBitDepth=16", "--InternalBitDepth=16"]
        + (["--InputChromaFormat=422"] if fmt422 else [])
        + ["--SEIDecodedPictureHash=1", "-b", str(hmbs),
           "-o", str(tmp_path / "hr.yuv")], capture_output=True)
    hmd = tmp_path / "hmd.yuv"
    assert subprocess.run([HBD_ORACLE, "-b", str(hmbs), "-o", str(hmd)],
                          capture_output=True).returncode == 0
    own2 = tmp_path / "own2.yuv"
    assert dmain(["-b", str(hmbs), "-o", str(own2)]) == 0
    assert own2.read_bytes() == hmd.read_bytes()


@pytest.mark.parametrize("extra,frames", [
    (["--IntraPeriod=1"], 2),
    (["--IntraPeriod=-1", "-q", "37"], 4),
])
def test_high_throughput_rext_encode(tmp_path, extra, frames):
    """Encode-side high-throughput RExt tool set (reference
    cfg/encoder_intra_high_throughput_rext.cfg): residual rotation of
    intra 4x4 TS TBs, single significance-map context for TS, persistent
    Golomb-Rice adaptation mirrored writer<->parser, and CABAC bypass
    alignment (range snap to 256 before escape-CG bypass runs). The SPS
    signals the sps_range_extension flags and the HM decoder verifies
    hash + byte-identical recon; our decoder agrees."""
    w, h = 416, 240
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--TransformSkip=1",
          "--ResidualRotation=1", "--SingleSignificanceMapContext=1",
          "--GolombRiceParameterAdaptation=1", "--AlignCABACBeforeBypass=1",
          *extra, "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    from hevc_tpu.decoder import headers as dh
    for u in split_annexb(bs.read_bytes()):
        t, _tid, r = nal_to_rbsp(bytes(u))
        if t == 33:
            sps = dh.parse_sps(bytes(r))
            assert sps.transform_skip_rotation_enabled_flag
            assert sps.transform_skip_context_enabled_flag
            assert sps.persistent_rice_adaptation_enabled_flag
            assert sps.cabac_bypass_alignment_enabled_flag
            break


def test_syntax_element_bit_statistics(tmp_path):
    """Per-syntax-element bit accounting (reference TComCodingStatistics
    / RExt__DECODER_DEBUG_BIT_STATISTICS): every arithmetic-decoder bit
    is attributed to a syntax-element category; the total must sit
    within the VCL payload size and the decode stays byte-identical."""
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs = tmp_path / "o.bin"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--IntraPeriod=-1",
          "-b", str(bs), "-o", str(tmp_path / "r.yuv")])
    from hevc_tpu.decoder.top import DecoderTop
    from hevc_tpu.entropy.cabac import SYNTAX_STAT_NAMES
    dec = DecoderTop(collect_stats=True)
    frames_out = list(dec.decode_stream(bs.read_bytes()))
    assert len(frames_out) == frames
    assert all(s == "OK" for s in dec.hash_status)
    stats = {n: int(b) for n, b in zip(SYNTAX_STAT_NAMES,
                                       dec.syntax_bits)}
    total = sum(stats.values())
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    vcl_bits = sum(len(r) * 8 for u in split_annexb(bs.read_bytes())
                   for (t, _tid, r) in [nal_to_rbsp(bytes(u))] if t <= 21)
    assert 0 < total <= vcl_bits
    assert total >= vcl_bits * 0.8          # headers are the remainder
    # the load-bearing categories must be populated
    for name in ("coeff_level", "sig_coeff_map", "last_sig_coeff_pos",
                 "merge_flag", "mvd", "transform_tree"):
        assert stats[name] > 0, name


def test_weighted_prediction_analysis_conformance(tmp_path):
    """Full WeightPredAnalysis (reference WeightPredAnalysis.cpp:
    whole-picture AC/DC fits per reference and component, denom
    iteration, DTHRESH SAD gate): on fading content the P slices must
    signal luma AND chroma weights for list-0 ref 0 (multi-ref lists
    stay active, further refs keep default weighting) and the stream
    must be HM-conformant."""
    w, h, frames = 128, 80, 5
    clip = tmp_path / "fade.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            g = 1.0 - 0.15 * t
            for p in make_frame(w, h, 0):
                arr = np.clip(np.asarray(p, np.float64) * g, 0, 255)
                fh.write(arr.astype(np.uint8).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-fr", "30", "-q", "32", "--WeightedPredP=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    # the coded tables carry luma + chroma weights on ref 0
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    from hevc_tpu.decoder import headers as dh
    sps = pps = None
    wp_slices = 0
    for unit in split_annexb(bs.read_bytes()):
        t, _tid, rbsp = nal_to_rbsp(bytes(unit))
        if t == 33:
            sps = dh.parse_sps(bytes(rbsp))
        elif t == 34:
            pps = dh.parse_pps(bytes(rbsp))
        elif t <= 21:
            sh, _off = dh.parse_slice_header(bytes(rbsp), t, sps, pps)
            if int(sh.slice_type) != 2 and sh.wp_tables[0]:
                lw, cw = sh.wp_tables[0][0]
                if lw is not None and cw is not None:
                    wp_slices += 1
                    assert lw[0] < (1 << sh.wp_log2_denom)  # fade: w < 1
    assert wp_slices >= 3, "weights did not fire on fading content"


def test_weighted_prediction_per_ref_conformance(tmp_path):
    """Per-reference explicit weight sets (reference WeightPredAnalysis
    fits each list-0 reference separately; TEncCavlc
    xCodePredWeightTable signals one set per ref): on a continuous fade
    each reference's temporal distance needs a different gain, so late
    P slices must carry DISTINCT luma weights across their active refs,
    and the stream must be HM-conformant."""
    w, h, frames = 128, 80, 8
    clip = tmp_path / "fade.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            g = 1.0 - 0.09 * t
            for p in make_frame(w, h, 0):
                arr = np.clip(np.asarray(p, np.float64) * g, 0, 255)
                fh.write(arr.astype(np.uint8).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-fr", "30", "-q", "32", "--WeightedPredP=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    from hevc_tpu.decoder import headers as dh
    sps = pps = None
    multi_ref_wp = 0
    for unit in split_annexb(bs.read_bytes()):
        t, _tid, rbsp = nal_to_rbsp(bytes(unit))
        if t == 33:
            sps = dh.parse_sps(bytes(rbsp))
        elif t == 34:
            pps = dh.parse_pps(bytes(rbsp))
        elif t <= 21:
            sh, _off = dh.parse_slice_header(bytes(rbsp), t, sps, pps)
            if int(sh.slice_type) == 2 or not sh.wp_tables[0]:
                continue
            lws = [lw for (lw, _cw) in sh.wp_tables[0] if lw is not None]
            if len(lws) >= 2 and len({lw[0] for lw in lws}) >= 2:
                multi_ref_wp += 1
    assert multi_ref_wp >= 2, \
        "per-ref weight sets did not diverge on a continuous fade"


def test_weighted_bipred_conformance(tmp_path):
    """Explicit weighted BI-prediction (PPS weighted_bipred_flag;
    reference WeightPredAnalysis both-list fits + TComWeightPrediction::
    addWeightBi): on a continuous fade a random-access B slice's list-0
    (past, brighter) and list-1 (future, darker) references need
    opposite-sign gains, so both lists must carry explicit weight sets
    and the weighted bi combine must reconstruct HM-identically."""
    w, h, frames = 128, 80, 9
    clip = tmp_path / "fade.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(clip, "wb") as fh:
        for t in range(frames):
            g = 1.0 - 0.08 * t
            for p in make_frame(w, h, 0):
                arr = np.clip(np.asarray(p, np.float64) * g, 0, 255)
                fh.write(arr.astype(np.uint8).tobytes())
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_randomaccess_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-fr", "30", "-q", "32", "--WeightedPredB=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    # at least one B slice must signal explicit weights on BOTH lists
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    from hevc_tpu.decoder import headers as dh
    sps = pps = None
    both_lists = 0
    for unit in split_annexb(bs.read_bytes()):
        t, _tid, rbsp = nal_to_rbsp(bytes(unit))
        if t == 33:
            sps = dh.parse_sps(bytes(rbsp))
        elif t == 34:
            pps = dh.parse_pps(bytes(rbsp))
        elif t <= 21:
            sh, _off = dh.parse_slice_header(bytes(rbsp), t, sps, pps)
            if int(sh.slice_type) != 0 or not sh.wp_tables:
                continue
            has = [any(lw is not None or cw is not None
                       for (lw, cw) in tab) for tab in sh.wp_tables]
            if len(has) == 2 and has[0] and has[1]:
                both_lists += 1
    assert both_lists >= 1, \
        "no B slice signalled explicit weights on both lists"


def test_decoding_unit_hrd(tmp_path):
    """Decoding-unit (sub-picture) HRD: SliceMode splits the AU into DUs,
    the SPS VUI signals sub_pic_hrd_params (tick divisor 100, 8-bit DU
    removal delays — reference TComSPS::setHrdParameters sub-pic branch,
    TEncTop.cpp:686 useSubCpbParams), pic_timing carries per-DU NAL
    counts and removal delays, and one decoding_unit_info SEI precedes
    each DU (reference TEncGOP xCreatePictureTimingSEI + xUpdateDuData +
    xWriteDuSEIMessages). The HM decoder must still verify every hash
    with byte-identical recon (it parses the sub-pic HRD syntax in the
    SPS), and our decoder must treat mid-AU prefix SEIs as part of the
    current access unit."""
    w, h, frames = 416, 240, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--SliceMode=1", "--SliceArgument=7",
          "--SEIBufferingPeriod=1", "--SEIPictureTiming=1",
          "--SEIDecodingUnitInfo=1", "--TargetBitrate=1000",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()
    # one DU info SEI per slice DU, pic timing in every AU
    from hevc_tpu.entropy.nal import nal_to_rbsp, split_annexb
    from hevc_tpu.entropy.sei import SEI_NAMES, parse_sei_messages
    counts = {}
    for unit in split_annexb(bs.read_bytes()):
        t, _tid, rbsp = nal_to_rbsp(bytes(unit))
        if t in (39, 40):
            for (pt, _b) in parse_sei_messages(bytes(rbsp)):
                nm = SEI_NAMES.get(pt, pt)
                counts[nm] = counts.get(nm, 0) + 1
    ctus_per_pic = -(-w // 64) * -(-h // 64)
    slices_per_pic = -(-ctus_per_pic // 7)
    assert counts.get("decoding_unit_info") == frames * slices_per_pic
    assert counts.get("pic_timing") == frames


def test_extended_sei_payloads(tmp_path):
    """The extended SEI surface (tone mapping, frame packing, segmented
    rect frame packing, display orientation, mastering display colour
    volume, knee function, chroma resampling hint, temporal level-0
    index, region refresh, time code — reference TAppEncCfg.cpp:948-1060
    and SEIwrite.cpp payload writers) emits well-formed messages: the
    stream stays HM-decodable with hash OK and every requested payload
    type appears. (512 wide: two tile columns need the spec A.1 minimum
    tile width of 256 luma samples each for the MCTS message.)"""
    w, h, frames = 512, 80, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1",
          "--SEIToneMappingInfo=1", "--SEIFramePacking=1",
          "--SEIFramePackingType=3", "--SEIDisplayOrientation=90",
          "--SEIMasteringDisplayColourVolume=1", "--SEIKneeFunctionInfo=1",
          "--SEIChromaSamplingFilterHint=1", "--SEITemporalLevel0Index=1",
          "--SEITimeCodeEnabled=1", "--SEITimeCodeNumClockTs=1",
          "--SEISegmentedRectFramePacking=1",
          "--SEIGradualDecodingRefreshInfo=1",
          "--SEITempMotionConstrainedTileSets=1",
          "--NumTileColumnsMinus1=1", "--TileUniformSpacing=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
    from hevc_tpu.entropy.sei import parse_sei_messages, SEI_NAMES
    types = set()
    for unit in split_annexb(bs.read_bytes()):
        t, _tid, rbsp = nal_to_rbsp(bytes(unit))
        if t in (39, 40):
            for (pt, _b) in parse_sei_messages(bytes(rbsp)):
                types.add(SEI_NAMES.get(pt, pt))
    expected = {"tone_mapping_info", "frame_packing_arrangement",
                "display_orientation", "mastering_display_colour_volume",
                "knee_function_info", "chroma_resampling_filter_hint",
                "temporal_sub_layer_zero_index", "time_code",
                "segmented_rect_frame_packing_arrangement",
                "region_refresh_info", "decoded_picture_hash",
                "temporal_motion_constrained_tile_sets"}
    assert expected <= types, types


def test_explicit_scaling_list_encode_conformance(tmp_path):
    """ScalingList=2 with an HM-format ScalingListFile: the SPS carries
    DPCM-coded scaling_list_data and quant/dequant use the custom
    matrices (reference TComScalingList xParseScalingList +
    TComTrQuant::xSetScalingListEnc). The HM decoder must verify every
    hash and match the recon byte for byte."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_hm_decode import _write_hm_scaling_file
    w, h, frames = 176, 144, 2
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    slist = tmp_path / "slist.txt"
    _write_hm_scaling_file(slist)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f", str(frames),
          "-q", "32", "--ScalingList=2", f"--ScalingListFile={slist}",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_decoder_analyser_stats(tmp_path):
    """Analyser build of the decoder CLI (-stats): per-picture CU mode
    shares and coefficient counts (reference repo's Analyser NetBeans
    configuration of TAppDecoder)."""
    w, h, frames = 128, 80, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs = tmp_path / "o.bin"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--IntraPeriod=-1", "-b", str(bs)])
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop(collect_stats=True)
    n = sum(1 for _ in dec.decode_stream(bs.read_bytes()))
    assert n == frames
    assert len(dec.stats) == frames
    assert dec.stats[0]["type"] == "I"
    assert dec.stats[1]["type"] == "P"
    assert dec.stats[1]["inter4"] > 0
    # histogram counts map cells (CTU-padded grid)
    assert sum(dec.stats[0]["depth_hist"]) >= (w // 4) * (h // 4)


def test_wpp_conformance(tmp_path):
    """Wavefront parallel processing (entropy_coding_sync): per-CTU-row
    CABAC substreams with context inheritance from the row above and
    slice-header entry points (reference TEncSlice.cpp:744-759 WPP
    context save/restore; spec 7.3.8.1 / 9.3.1). Verified against the HM
    decoder and our own decoder."""
    w, h, frames = 192, 128, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--IntraPeriod=-1",
          "--WaveFrontSynchro=1", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_weighted_prediction_conformance(tmp_path):
    """Explicit weighted prediction on a fade (reference
    WeightPredAnalysis.cpp xSelectWP + TComWeightPrediction): DC-ratio
    weight/offset estimation, pred_weight_table signalling and weighted
    MC; must cut the bitrate on a fade and stay conformant."""
    w, h, frames = 192, 128, 5
    clip = tmp_path / "fade.yuv"
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((np.sin(xx / 9) + np.cos(yy / 7)) * 40 + 120)
    with open(clip, "wb") as f:
        for i in range(frames):
            y = np.clip(base * (1.0 - 0.12 * i)
                        + rng.integers(-6, 6, (h, w)), 0, 255)
            u = np.full((h // 2, w // 2), 128, np.uint8)
            v = np.full((h // 2, w // 2), 120, np.uint8)
            f.write(y.astype(np.uint8).tobytes() + u.tobytes() + v.tobytes())
    from hevc_tpu.cli.encode import main
    sizes = {}
    for wp in (0, 1):
        bs = tmp_path / f"o{wp}.bin"
        rec = tmp_path / f"r{wp}.yuv"
        dec = tmp_path / f"d{wp}.yuv"
        main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "32", "--IntraPeriod=-1",
              f"--WeightedPredP={wp}", "-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames
        assert rec.read_bytes() == dec.read_bytes()
        sizes[wp] = bs.stat().st_size
    assert sizes[1] < sizes[0] * 0.8, sizes
    # own decoder handles the weighted stream
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(tmp_path / "o1.bin"), "-o", str(own)]) == 0
    assert own.read_bytes() == (tmp_path / "d1.yuv").read_bytes()


def test_tmvp_conformance(tmp_path):
    """Temporal MV prediction (spec 8.5.3.2.8/9): collocated-picture
    motion field, temporal merge + AMVP candidates with POC-distance
    scaling (reference TComDataCU::getInterMergeCandidates temporal part,
    TComMotionInfo compression). Gated to low-delay P (TMVPMode=1)."""
    w, h, frames = 192, 128, 5
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--TMVPMode=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_tiles_conformance(tmp_path):
    """Uniform tile grid (spec 6.5.1): tile-scan CTU order, per-tile CABAC
    reset with entry points, tile-bounded prediction/SAO-merge
    (reference TComPicSym tiles + TEncSlice substreams). Tile columns
    must be >= 256 luma samples wide (spec A.1), hence the 832-wide clip."""
    w, h, frames = 832, 480, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--NumTileColumnsMinus1=1",
          "--NumTileRowsMinus1=1", "--TileUniformSpacing=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_rect_partitions_conformance(tmp_path):
    """2NxN / Nx2N rectangular inter PUs: part_mode syntax, per-PU
    merge/AMVP with the spec 6.4.2 same-CB availability rule (earlier PU
    available despite the raw z-scan order) and 8.5.3.2.3 second-PU
    exclusions, PU deblocking edges (reference TEncCu inter partition
    trials / TComDataCU getInterMergeCandidates)."""
    w, h, frames = 832, 480, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dmain
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()
    # the stream must actually contain rectangular partitions
    from hevc_tpu.decoder.top import DecoderTop
    dt = DecoderTop(collect_stats=False)
    import hevc_tpu.decoder.recon as drecon
    seen = set()
    orig_rc = drecon.CtuReconstructor.recon_ctu
    def spy(self, d, cx, cy, recon, **kw):
        seen.update(np.unique(d.nxn_flag[d.pred_mode == 0]).tolist())
        return orig_rc(self, d, cx, cy, recon, **kw)
    drecon.CtuReconstructor.recon_ctu = spy
    try:
        for _ in dt.decode_stream(bs.read_bytes()):
            pass
    finally:
        drecon.CtuReconstructor.recon_ctu = orig_rc
    assert seen & {2, 3}, f"no rectangular PUs coded: {seen}"


def test_scaling_lists_conformance(tmp_path):
    """Default quantization matrices (spec 7.4.5 Table 7-5/7-6, 8.6.3
    dequant with m[x][y]): SPS scaling_list_enabled_flag=1 with no
    explicit data = normative default matrices, 8x8 upsampled to 16/32
    with DC=16 (reference TComTrQuant setDefaultScalingList /
    processScalingListDec, TComRom g_quantIntraDefault8x8). Covers
    intra and inter slices so both default matrix families are hit."""
    w, h, frames = 192, 128, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    for cfg, qp in (("encoder_intra_main.cfg", 27),
                    ("encoder_lowdelay_P_main.cfg", 32)):
        bs, rec, dec = (tmp_path / f"{qp}.bin", tmp_path / f"{qp}r.yuv",
                        tmp_path / f"{qp}d.yuv")
        main(["-c", f"/root/reference/cfg/{cfg}",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", str(qp), "--ScalingList=1",
              "-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / f"{qp}own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def test_transform_skip_conformance(tmp_path):
    """4x4 transform skip (spec 7.3.8.11 transform_skip_flag, 8.6.4.2
    r = d << 7): PPS transform_skip_enabled_flag, per-TB encoder trial
    against the DCT/DST path, TS inverse in both decoders (reference
    TComTrQuant::xTransformSkip / xITransformSkip,
    TEncSbac::codeTransformSkipFlags). Run at a QP where the intra CU8
    RQT split produces 4x4 luma TBs so the flag genuinely toggles."""
    w, h, frames = 416, 240, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    for cfg in ("encoder_intra_main.cfg", "encoder_lowdelay_P_main.cfg"):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-c", f"/root/reference/cfg/{cfg}",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "27", "--TransformSkip=1",
              "-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def test_adaptive_qp_conformance(tmp_path):
    """cu_qp_delta at CTU granularity (spec 7.3.8.10 cu_qp_delta_abs/sign,
    8.6.1 qPY_PRED chain, 8.7.2.5 per-edge QP deblocking) driven by the
    variance preanalysis (--AdaptiveQP=1; reference TEncPreanalyzer +
    TEncSbac::codeDeltaQP, TDecCu::xFinishDecodeCU group-QP semantics).
    Covers intra + lowdelay-P + WPP so the qPY_PREV resets are hit."""
    w, h, frames = 192, 128, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    for cfg, extra in (("encoder_intra_main.cfg", []),
                       ("encoder_lowdelay_P_main.cfg", []),
                       ("encoder_lowdelay_P_main.cfg",
                        ["--WaveFrontSynchro=1"])):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-c", f"/root/reference/cfg/{cfg}",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "30", "--AdaptiveQP=1"] + extra +
             ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def test_sub_ctu_quant_group_encode_conformance(tmp_path):
    """Sub-CTU quantization groups (--MaxCuDQPDepth=1..3, PPS
    diff_cu_qp_delta_depth): the variance preanalysis assigns a target
    QP per QG, the engine quantizes each CU with its group's QP, and the
    slice codec signals cu_qp_delta per QG with the spec 8.6.1 qPY_PRED
    left/above derivation (reference TComPPS::setMaxCuDQPDepth,
    TEncCu per-QG setQP, TEncSbac::codeDeltaQP). Covers intra, inter and
    WPP (qPY_PREV row resets), and asserts real intra-CTU QP variation
    via the decoded per-4x4 QP maps."""
    import numpy as np
    w, h, frames = 192, 128, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    import hevc_tpu.entropy.cabac as cab
    for depth, cfg, extra in (
            (1, "encoder_intra_main.cfg", []),
            (2, "encoder_lowdelay_P_main.cfg", []),
            (2, "encoder_lowdelay_P_main.cfg", ["--WaveFrontSynchro=1"]),
            (3, "encoder_lowdelay_P_main.cfg", [])):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-c", f"/root/reference/cfg/{cfg}",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "34", "--AdaptiveQP=1",
              f"--MaxCuDQPDepth={depth}"] + extra +
             ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()
        # the test must not be vacuous: at least one CTU carries more
        # than one QP inside it (true sub-CTU quantization groups)
        tiles = []
        orig = cab.fetch_ctu_qp4
        cab.fetch_ctu_qp4 = lambda s, c: (
            lambda t: (tiles.append(t.copy()) if t is not None else None,
                       t)[1])(orig(s, c))
        try:
            from hevc_tpu.decoder.top import DecoderTop
            for _ in DecoderTop().decode_stream(bs.read_bytes()):
                pass
        finally:
            cab.fetch_ctu_qp4 = orig
        assert any(len(np.unique(t)) > 1 for t in tiles), \
            f"no intra-CTU QP variation at depth {depth}"


def test_lcu_rate_control_conformance(tmp_path):
    """CTU-level rate control (--LCULevelRateControl=1): per-CTU QP from
    the complexity-weighted bit allocation (reference TEncRCPic::
    getLCUTargetBpp/getLCUEstLambda, feed-forward so the wavefront
    engine parallelizes), signalled via cu_qp_delta."""
    w, h, frames = 192, 128, 6
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--RateControl=1", "--TargetBitrate=256",
          "--LCULevelRateControl=1", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_field_coding_conformance(tmp_path):
    """Interlaced field coding (--FieldCoding=1): each frame is coded as
    two half-height field pictures; VUI field_seq/frame_field_info +
    timing (annex E.2.1), pic_timing SEI pic_struct 1/2 per field
    (spec D.2.3; reference TEncGOP field path, TAppDecTop reinterleave).
    The reference decoder weaves fields back into frames on output, so
    the recon comparison also proves HM honours our VUI/SEI signalling.
    Both TopFieldFirst orders are covered."""
    w, h, frames = 192, 128, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    for tff in (1, 0):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "32", "--FieldCoding=1",
              f"--TopFieldFirst={tff}", "-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames * 2, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def test_pcm_conformance(tmp_path):
    """I_PCM coding units (--PCMEnabledFlag=1, spec 7.3.8.7 pcm_sample +
    9.3.1 CABAC suspend/resume around raw sample codes; reference
    TEncSbac::codeIPCMInfo / TDecSbac::parseIPCMInfo). Noise content at
    low QP makes the raw-sample trial win, so the flag genuinely fires;
    the AdaptiveQP combo exercises PCM's no-cbf rule in the qPY chain."""
    import numpy as np
    w, h, frames = 192, 128, 2
    clip = tmp_path / "in.yuv"
    rng = np.random.default_rng(9)
    with open(clip, "wb") as fp:
        for _ in range(frames):
            fp.write(rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes())
            fp.write(rng.integers(0, 256, (h // 2, w // 2),
                                  dtype=np.uint8).tobytes())
            fp.write(rng.integers(0, 256, (h // 2, w // 2),
                                  dtype=np.uint8).tobytes())
    from hevc_tpu.cli.encode import main
    from hevc_tpu.cli.decode import main as dmain
    for extra in ([], ["--AdaptiveQP=1"]):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "10", "--PCMEnabledFlag=1"] + extra +
             ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def _mono_clip(path, w, h, n):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import make_frame
    with open(path, "wb") as fh:
        for t in range(n):
            fh.write(np.asarray(make_frame(w, h, t)[0],
                                np.uint8).tobytes())


def test_monochrome_encode_conformance(tmp_path):
    """4:0:0 (monochrome) encode: ChromaArrayType 0 drops every chroma
    syntax element (no intra_chroma_pred_mode, no cbf_cb/cr, no chroma
    residual/SAO/PCM samples — spec 7.3.6.1/7.3.8.5-8.8; reference
    TComChromaFormat MONOCHROME profiles). Intra and low-delay P
    streams must verify in the HM decoder with byte-identical luma."""
    w, h = 128, 64
    clip = tmp_path / "m.yuv"
    _mono_clip(clip, w, h, 4)
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    for args, frames in (
            (["-q", "32"], 3),
            (["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
              "-fr", "30", "-q", "32", "--Profile=main-RExt"], 4)):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h),
              "-f", str(frames), "--InputChromaFormat=400"]
             + args + ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        assert rec.stat().st_size == w * h * frames  # luma-only output
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


@pytest.mark.parametrize("mmc", [2, 3])
def test_max_num_merge_cand_conformance(tmp_path, mmc):
    """MaxNumMergeCand below 5 (slice five_minus_max_num_merge_cand;
    spec 8.5.3.2.1 truncates the merge list at MaxNumMergeCand, so the
    spatial step alone can overshoot): P and B merge/skip decisions must
    stay within the shortened list and decode HM-identically."""
    w, h, frames = 192, 96, 5
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-c", "/root/reference/cfg/encoder_randomaccess_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-fr", "30", "-q", "32",
          f"--MaxNumMergeCand={mmc}", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()


def test_lossless_encode_conformance(tmp_path):
    """Force-all lossless coding (TransquantBypassEnableFlag +
    CUTransquantBypassFlagForce; spec 8.6.4.1 bypass branch): every CU
    codes cu_transquant_bypass_flag=1, residuals pass straight through
    as coefficients, no transform_skip_flag/SBH, loop filters leave
    bypass samples. The recon must equal the SOURCE byte-exactly and
    the HM decoder must agree."""
    w, h, frames = 192, 96, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    for extra in (["-q", "32"],
                  ["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
                   "-fr", "30", "-q", "32"]):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        # flags AFTER -c: the CTC cfg files explicitly zero them and
        # layering is later-wins (program_options_lite semantics)
        main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames)] + extra
             + ["--TransquantBypassEnableFlag=1",
                "--CUTransquantBypassFlagForce=1",
                "-b", str(bs), "-o", str(rec)])
        assert rec.read_bytes() == clip.read_bytes()  # truly lossless
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()


def test_ccp_encode_conformance(tmp_path):
    """Cross-component prediction ENCODE (4:4:4 intra, spec 8.6.6 /
    7.3.8.12): each chroma TB may predict its residual from the TU's
    reconstructed luma residual with a least-squares alpha quantized to
    {0,+-1,+-2,+-4,+-8} (reference TEncSearch::
    xCalcCrossComponentPredictionAlpha, TComTrQuant::
    crossComponentPrediction). On luma-correlated chroma the tool must
    cut the payload, and both decoders must agree byte-exactly."""
    w, h, frames = 192, 96, 3
    clip = tmp_path / "in.yuv"
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:h, 0:w]
    with open(clip, "wb") as f:
        for i in range(frames):
            y = ((np.sin(xx / 7 + i) + np.cos(yy / 5)) * 50 + 128
                 + rng.integers(-20, 20, (h, w))).clip(0, 255)
            u = (y * 0.7 + rng.integers(-10, 10, (h, w)) + 30).clip(0, 255)
            v = (255 - y * 0.6 + rng.integers(-10, 10, (h, w))).clip(0, 255)
            for p in (y, u, v):
                f.write(p.astype(np.uint8).tobytes())
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    sizes = {}
    for tag, extra in (("off", ["--CrossComponentPrediction=0"]),
                       ("on", [])):
        bs, rec, dec = (tmp_path / f"{tag}.bin", tmp_path / f"{tag}.r.yuv",
                        tmp_path / f"{tag}.d.yuv")
        main(["-c",
              "/root/reference/cfg/encoder_intra_high_throughput_rext.cfg",
              "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "30", "--InputChromaFormat=444",
              "--InternalBitDepth=8"] + extra
             + ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()
        sizes[tag] = bs.stat().st_size
    assert sizes["on"] < sizes["off"], sizes


def test_lossless_rdpcm_rotation_encode_conformance(tmp_path):
    """Lossless encode with the RExt tools the main_rext CTC cfgs turn
    on: implicit residual DPCM (intra horizontal/vertical TBs transmit
    the along-direction difference of the passthrough residual, and the
    intra edge/DC boundary filters are disabled for lossless CUs —
    reference TComTrQuant bypass RDPCM branch, TComPrediction.cpp:481)
    and 180-degree rotation of 4x4 bypass TBs. The tools must reduce
    the payload (non-vacuity) and both decoders must agree."""
    w, h, frames = 192, 96, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    cfg = "/root/reference/cfg/encoder_intra_main_rext.cfg"
    sizes = {}
    for tag, extra in (
            ("plain", ["--ImplicitResidualDPCM=0", "--ResidualRotation=0",
                       "--ExplicitResidualDPCM=0"]),
            ("tools", [])):
        bs, rec, dec = (tmp_path / f"{tag}.bin", tmp_path / f"{tag}.r.yuv",
                        tmp_path / f"{tag}.d.yuv")
        # flags AFTER -c (later-wins layering); the cfg itself enables
        # ImplicitResidualDPCM/ResidualRotation for the "tools" run
        main(["-c", cfg, "-i", str(clip), "-wdt", str(w), "-hgt", str(h),
              "-f", str(frames), "-q", "27",
              "--TransquantBypassEnableFlag=1",
              "--CUTransquantBypassFlagForce=1"] + extra
             + ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()
        sizes[tag] = bs.stat().st_size
    assert sizes["tools"] < sizes["plain"], sizes


def test_lossless_explicit_rdpcm_encode_conformance(tmp_path):
    """Explicit (inter) residual DPCM under lossless: each inter bypass
    TB picks {off, horizontal, vertical} by level magnitude and the
    slice writer signals explicit_rdpcm_flag/dir (reference TEncSearch
    RDPCM trial, TDecSbac parseExplicitRdpcmMode). Must shrink the
    payload and decode identically in HM and our decoder."""
    w, h, frames = 192, 96, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    cfg = "/root/reference/cfg/encoder_lowdelay_main_rext.cfg"
    sizes = {}
    for tag, extra in (("off", ["--ExplicitResidualDPCM=0"]),
                       ("on", [])):
        bs, rec, dec = (tmp_path / f"{tag}.bin", tmp_path / f"{tag}.r.yuv",
                        tmp_path / f"{tag}.d.yuv")
        main(["-c", cfg, "-i", str(clip), "-wdt", str(w), "-hgt", str(h),
              "-f", str(frames), "-q", "27",
              "--TransquantBypassEnableFlag=1",
              "--CUTransquantBypassFlagForce=1"] + extra
             + ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
        assert rec.read_bytes() == dec.read_bytes()
        own = tmp_path / "own.yuv"
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0
        assert own.read_bytes() == dec.read_bytes()
        sizes[tag] = bs.stat().st_size
    assert sizes["on"] < sizes["off"], sizes


def test_chroma_qp_offsets_conformance(tmp_path):
    """pps_cb/cr_qp_offset (spec 8.6.1 qPiCb/qPiCr): per-component
    chroma QP (quant, RDOQ lambda split, chroma SSE weights) and the
    deblocking edge QP must all honour the PPS offsets — across intra,
    low-delay-P (native engine) and the 4:4:4 Python path."""
    w, h, frames = 192, 96, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    for extra in (["-q", "32", "--CbQpOffset=2", "--CrQpOffset=-2"],
                  ["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
                   "-fr", "30", "-q", "32", "--CbQpOffset=1",
                   "--CrQpOffset=3"]):
        bs, rec, dec = (tmp_path / "o.bin", tmp_path / "r.yuv",
                        tmp_path / "d.yuv")
        main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames)] + extra + ["-b", str(bs), "-o", str(rec)])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames
        assert rec.read_bytes() == dec.read_bytes()


def test_monochrome_hm_decode(tmp_path):
    """General HM 4:0:0 streams (intra, low-delay B, random access)
    decode byte-identically with per-picture hash OK."""
    hm_enc = "/tmp/hm_oracle/bin/TAppEncoderStatic"
    if not os.path.exists(hm_enc):
        pytest.skip("HM oracle encoder not built")
    w, h, frames = 128, 64, 6
    clip = tmp_path / "m.yuv"
    _mono_clip(clip, w, h, frames)
    from hevc_tpu.cli.decode import main as dmain
    for cfg in ("encoder_intra_main_rext.cfg",
                "encoder_lowdelay_main_rext.cfg",
                "encoder_randomaccess_main_rext.cfg"):
        bs = tmp_path / "hm.bin"
        subprocess.run(
            [hm_enc, "-c", f"/root/reference/cfg/{cfg}", "-i", str(clip),
             "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-fr",
             "30", "-q", "32", "--InputChromaFormat=400",
             "--ChromaFormatIDC=400", "--SEIDecodedPictureHash=1",
             "-b", str(bs), "-o", str(tmp_path / "hr.yuv")],
            capture_output=True, check=True)
        dec, own = tmp_path / "d.yuv", tmp_path / "own.yuv"
        out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                             capture_output=True, text=True)
        assert out.stdout.count("(OK)") == frames, (cfg, out.stdout[-800:])
        assert dmain(["-b", str(bs), "-o", str(own)]) == 0, cfg
        assert own.read_bytes() == dec.read_bytes(), cfg


def test_pcm_16bit_conformance(tmp_path):
    """I_PCM at InternalBitDepth 16 (high-bit-depth build): raw 16-bit
    samples wrap in the int16 coefficient maps that carry them, so both
    the pcm_sample writer and the decoder's recon must mask to the
    sample width. 16-bit noise at low QP makes the PCM trial win."""
    if not os.path.exists(HBD_ORACLE):
        pytest.skip("HBD oracle not built")
    import numpy as np
    w, h, frames = 128, 64, 2
    clip = tmp_path / "in.yuv"
    rng = np.random.default_rng(11)
    with open(clip, "wb") as fp:
        for _ in range(frames):
            # full-range 16-bit noise, most samples above 2^15
            for shape in ((h, w), (h // 2, w // 2), (h // 2, w // 2)):
                fp.write(rng.integers(0, 1 << 16, shape,
                                      dtype=np.uint16).tobytes())
    from hevc_tpu.cli.decode import main as dmain
    from hevc_tpu.cli.encode import main
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "12", "--PCMEnabledFlag=1",
          "--InputBitDepth=16", "--InternalBitDepth=16",
          "--Profile=main-RExt", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([HBD_ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames, out.stdout[-1500:]
    assert rec.read_bytes() == dec.read_bytes()
    own = tmp_path / "own.yuv"
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_multislice_conformance(tmp_path):
    """SliceMode 1 (fixed CTUs per slice, reference TEncSlice slice
    modes): multi-slice pictures with mid-row boundaries must decode
    byte-identically in the HM reference decoder and in ours."""
    w, h, frames = 256, 128, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1", "--SliceMode=1",
          "--SliceArgument=3", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()


def test_multislice_bytes_conformance(tmp_path):
    """SliceMode 2 (byte budget per slice, reference
    TEncSlice::compressSlice slice-byte-limit termination): slices are
    cut where the coded payload crosses the budget; the stream must
    decode byte-identically in the HM reference decoder and produce
    more than one slice per picture."""
    w, h, frames = 256, 128, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1", "--SliceMode=2",
          "--SliceArgument=150", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    # each frame far exceeds one 150-byte slice
    from hevc_tpu.entropy.nal import split_annexb
    n_slices = sum(1 for n in split_annexb(bs.read_bytes())
                   if (n[0] >> 1) & 0x3F in (0, 1, 19, 20))
    assert n_slices > frames, n_slices
    own = tmp_path / "own.yuv"
    from hevc_tpu.cli.decode import main as dmain
    assert dmain(["-b", str(bs), "-o", str(own)]) == 0
    assert own.read_bytes() == dec.read_bytes()


def test_crc_checksum_hash_sei(tmp_path):
    """SEIDecodedPictureHash 2 (CRC) / 3 (checksum): the HM decoder must
    verify the hashes (reference TComPicYuvMD5 crc/checksum)."""
    w, h, frames = 128, 80, 2
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    for ht in (2, 3):
        bs = tmp_path / f"o{ht}.bin"
        main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "32", f"--SEIDecodedPictureHash={ht}",
              "-b", str(bs), "-o", str(tmp_path / "r.yuv")])
        out = subprocess.run([ORACLE, "-b", str(bs), "-o",
                              str(tmp_path / "d.yuv")],
                             capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-2000:]
        assert out.stdout.count("(OK)") == frames, out.stdout[-800:]


def test_rext444_native_engine_conformance(tmp_path):
    """4:4:4 intra (config 5 family) through the NATIVE engine (the
    Python path remains the fallback for inter 4:4:4): byte-identical
    in the HM decoder and ours, with SAO enabled."""
    w, h, frames = 256, 128, 3
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
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-c",
          "/root/reference/cfg/encoder_intra_high_throughput_rext.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "29", "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "o2.yuv")]) == 0
    assert (tmp_path / "o2.yuv").read_bytes() == dec.read_bytes()


def test_main12_conformance(tmp_path):
    """12-bit internal depth (reference RExt__HIGH_BIT_DEPTH paths,
    TypeDef.h:244): intra + inter, RExt PTL signalling."""
    w, h, frames = 128, 80, 3
    clip = tmp_path / "in12.yuv"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip
    write_clip(str(clip), w, h, frames, 12)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "30", "--IntraPeriod=-1",
          "--InternalBitDepth=12", "--InputBitDepth=12",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()


def test_hrd_buffering_period_conformance(tmp_path):
    """HRD parameters in the SPS VUI + buffering_period SEI at IRAPs +
    pic_timing with CPB/DPB delays (annex E.2.2 / D.2.2-D.2.3;
    reference SEIEncoder::initSEIBufferingPeriod, TEncTop HRD setup):
    HM and our decoder must both parse and verify the stream."""
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1",
          "--SEIBufferingPeriod=1", "--SEIPictureTiming=1",
          "-b", str(bs), "-o", str(rec)])
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "o2.yuv")]) == 0
    assert (tmp_path / "o2.yuv").read_bytes() == dec.read_bytes()


def test_scalable_nesting_sei_conformance(tmp_path):
    """--SEIScalableNesting=1: the HRD bookkeeping SEIs (buffering
    period at IRAPs, pic timing per AU) are additionally wrapped in a
    scalable-nesting SEI for the temporal sub-bitstream (spec D.2.23;
    reference TEncGOP::xCreateScalableNestingSEI + SEIEncoder::
    initSEIScalableNesting layer-0 form). Both decoders must still
    verify the stream and the nesting payload (type 133) must appear."""
    w, h, frames = 128, 80, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    bs, rec, dec = tmp_path / "o.bin", tmp_path / "r.yuv", tmp_path / "d.yuv"
    from hevc_tpu.cli.encode import main
    main(["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--IntraPeriod=-1",
          "--SEIBufferingPeriod=1", "--SEIPictureTiming=1",
          "--SEIScalableNesting=1", "-b", str(bs), "-o", str(rec)])
    from hevc_tpu.entropy.nal import split_annexb
    types = [nalu[2] for nalu in split_annexb(bs.read_bytes())
             if (nalu[0] >> 1) & 0x3F == 39]
    assert 133 in types, types
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    from hevc_tpu.cli.decode import main as dec_main
    assert dec_main(["-b", str(bs), "-o", str(tmp_path / "o2.yuv")]) == 0
    assert (tmp_path / "o2.yuv").read_bytes() == dec.read_bytes()


@pytest.mark.parametrize("flags,label", [
    (["--RDOQ=0", "--RDOQTS=0"], "rdoq_off"),
    (["--SignHideFlag=0"], "sbh_off"),
])
def test_quant_tool_flags_conformance(tmp_path, flags, label):
    """RDOQ=0 / RDOQTS=0 / SignHideFlag=0 reach the engine (reference
    TAppEncCfg.cpp:814-815,884 defaults true): the streams they produce
    must differ from the defaults-on stream AND stay HM-conformant.
    SignHideFlag=0 must clear the PPS sign_data_hiding flag."""
    w, h, frames = 128, 80, 3
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    base, bs = tmp_path / "base.bin", tmp_path / "o.bin"
    rec, dec = tmp_path / "r.yuv", tmp_path / "d.yuv"
    common = ["-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
              str(frames), "-q", "30", "--IntraPeriod=-1", "-o", "/dev/null"]
    main(common + ["-b", str(base)])
    common[-1:] = [str(rec)]
    main(common + ["-o", str(rec), "-b", str(bs)] + flags)
    assert bs.read_bytes() != base.read_bytes(), \
        f"{label} produced the defaults-on stream (flag not plumbed)"
    out = subprocess.run([ORACLE, "-b", str(bs), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.count("(OK)") == frames
    assert rec.read_bytes() == dec.read_bytes()
    if label == "sbh_off":
        from hevc_tpu.decoder.headers import parse_pps
        from hevc_tpu.entropy.nal import split_annexb, nal_to_rbsp
        for nal in split_annexb(bs.read_bytes()):
            nal_type, _tid, rbsp = nal_to_rbsp(nal)
            if nal_type == 34:  # PPS_NUT
                assert parse_pps(rbsp).sign_data_hiding_enabled_flag == 0
                break
        else:
            pytest.fail("no PPS in stream")


def test_field_gop_structure_matches_hm(tmp_path):
    """Per-field GOP adaptation (reference TEncGOP field path /
    TAppEncCfg m_isField): HM applies the frame GOP ladder PER FIELD —
    height halved, frame count doubled, the complementary field added
    to the reference list (TAppEncCfg.cpp:1822 numRefs=2), with NO GOP
    entry remapping. Our field coding must produce the same per-field
    (slice type, QP) ladder the frame GOP prescribes. (HM-16.4's own
    binary asserts out (rc -6) on this very config after emitting the
    first fields, so the ladder here is cross-checked against the cfg's
    GOP entries rather than a full HM run; the fields it did emit
    before aborting carry exactly this ladder.)"""
    w, h, frames = 192, 128, 4
    clip = tmp_path / "in.yuv"
    _mk_clip(clip, w, h, frames)
    from hevc_tpu.cli.encode import main
    from hevc_tpu.decoder.top import DecoderTop
    from hevc_tpu.io.cfg import parse_cli
    bs = tmp_path / "o.bin"
    main(["-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
          "-i", str(clip), "-wdt", str(w), "-hgt", str(h), "-f",
          str(frames), "-q", "32", "--FieldCoding=1", "-b", str(bs)])
    dec = DecoderTop(collect_stats=True)
    list(dec.decode_stream(bs.read_bytes()))
    got = [(s["poc"], s["type"][0], s["qp"]) for s in dec.stats]
    cfg = parse_cli(["-c",
                     "/root/reference/cfg/encoder_lowdelay_P_main.cfg",
                     "-i", str(clip), "-wdt", str(w), "-hgt", str(h),
                     "-f", str(frames), "-q", "32", "--FieldCoding=1"])
    entries = cfg.gop_entries
    want = [(0, "I", 32)]
    for i in range(1, 2 * frames):   # fields, GOP ladder per field
        e = entries[(i - 1) % len(entries)]
        want.append((i, "P", 32 + e.qp_offset))
    assert got == want, (got, want)
