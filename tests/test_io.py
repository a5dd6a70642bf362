import numpy as np

from hevc_tpu.core.types import ChromaFormat
from hevc_tpu.io import cfg as cfglib
from hevc_tpu.io.yuv import YuvReader, YuvWriter, frame_bytes


def _synth_frame(w, h, seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, size=(h, w), dtype=np.int64)
    u = rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.int64)
    v = rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.int64)
    return [p.astype(np.int16) for p in (y, u, v)]


def test_yuv_roundtrip_8bit(tmp_path):
    w, h = 64, 48
    path = str(tmp_path / "t.yuv")
    frames = [_synth_frame(w, h, s) for s in range(3)]
    wr = YuvWriter(path)
    for f in frames:
        wr.write(f)
    wr.close()
    rd = YuvReader(path, w, h)
    assert rd.num_frames == 3
    for f in frames:
        got = rd.read()
        for a, b in zip(f, got):
            assert (a == b).all()
    assert rd.read() is None


def test_yuv_bitdepth_scaling(tmp_path):
    w, h = 16, 16
    path = str(tmp_path / "t8.yuv")
    f = _synth_frame(w, h, 0)
    YuvWriter(path).write(f)
    rd = YuvReader(path, w, h, file_bit_depth=8, internal_bit_depth=10)
    got = rd.read()
    assert (got[0] == (f[0].astype(np.int32) << 2)).all()


def test_yuv_10bit_container(tmp_path):
    w, h = 16, 16
    path = str(tmp_path / "t10.yuv")
    rng = np.random.default_rng(1)
    planes = [rng.integers(0, 1024, size=s, dtype=np.int64).astype(np.int16)
              for s in [(h, w), (h // 2, w // 2), (h // 2, w // 2)]]
    wr = YuvWriter(path, file_bit_depth=10, internal_bit_depth=10)
    wr.write(planes)
    wr.close()
    assert frame_bytes(w, h, ChromaFormat.C420, 10) == (w * h * 3 // 2) * 2
    rd = YuvReader(path, w, h, file_bit_depth=10, internal_bit_depth=10)
    got = rd.read()
    for a, b in zip(planes, got):
        assert (a == b).all()


def test_parse_reference_intra_cfg():
    c = cfglib.parse_cfg_file("/root/reference/cfg/encoder_intra_main.cfg")
    assert c.ctu_size == 64
    assert c.intra_period == 1
    assert c.gop_size == 1
    assert c.qp == 32
    assert c.sao == 1
    assert c.tu_log2_max == 5


def test_parse_reference_lowdelay_cfg_gop_table():
    c = cfglib.parse_cfg_file("/root/reference/cfg/encoder_lowdelay_P_main.cfg")
    assert c.gop_size == 4
    assert len(c.gop_entries) == 4
    e1 = c.gop_entries[0]
    assert e1.slice_type == "P"
    assert e1.poc == 1
    assert e1.qp_offset == 3
    assert abs(e1.qp_factor - 0.4624) < 1e-9
    assert e1.reference_pics == [-1, -5, -9, -13]
    e2 = c.gop_entries[1]
    assert e2.inter_rps_prediction == 1
    assert e2.ref_idcs == [1, 1, 1, 0, 1]


def test_parse_opencl_key_maps_to_tpu():
    c = cfglib.parse_cfg_file(
        "/root/reference/cfg/per-sequence/Kimono-CL.cfg")
    assert c.use_tpu == 1
    assert c.width == 1920 and c.height == 1080


def test_cli_layering(tmp_path):
    p = tmp_path / "a.cfg"
    p.write_text("QP : 30\nSourceWidth: 832\n")
    c = cfglib.parse_cli(["-c", str(p), "--QP=27", "-f", "8"])
    assert c.qp == 27
    assert c.width == 832
    assert c.frames_to_encode == 8


def test_annexb_bytecount_selftest():
    from hevc_tpu.cli.annexb_bytecount import selftest
    assert selftest()


def test_convert_bitdepth(tmp_path):
    import numpy as np
    from hevc_tpu.cli.convert_bitdepth import main
    w, h = 32, 16
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    src = tmp_path / "a.yuv"
    with open(src, "wb") as f:
        f.write(y.tobytes() + u.tobytes() + v.tobytes())
    dst = tmp_path / "b.yuv"
    assert main([str(src), str(dst), str(w), str(h), "8", "10"]) == 0
    out = np.fromfile(dst, dtype="<u2")
    assert (out[:w * h].reshape(h, w) == y.astype(np.uint16) * 4).all()
