"""Reference-GPU-mode reproduction: partition table + MV/cost tables.

The reference fork validated its OpenCL kernels by comparing GPU-mode
MV tables against the CPU search; this suite plays the same role for
the reproduction mode (SURVEY.md §7 "documented third point"):

 * the flat partition layout matches cl/sad.cl's tempSad offsets at
   hand-checked anchor indices (both AMP and non-AMP kernels);
 * part_index() (the computed TComDataCU::getIndexBlock replacement,
   TComDataCU.cpp:3379) inverts the table;
 * the XLA device twin's (mv, sad) tables equal the scalar
   HM-OpenCL-semantics model bit-for-bit;
 * a brute-force oracle confirms the scalar model's cost/tie-break
   semantics (absolute-MV golomb rate, y-then-x first minimum,
   cl/sad.cl compareSAD :370-408).
"""
import numpy as np
import pytest

from hevc_tpu.ops import me_gpu_mode as gm


def test_partition_counts():
    assert len(gm.ctu_partitions(True)) == 593   # TypeDef.h:266
    assert len(gm.ctu_partitions(False)) == 425  # TypeDef.h:264


ANCHORS_AMP = {
    0: (0, 0, 8, 4), 128: (0, 0, 4, 8),
    256: (0, 0, 16, 4), 272: (0, 12, 16, 4),
    288: (0, 0, 16, 12), 304: (0, 4, 16, 12),
    320: (0, 0, 4, 16), 336: (12, 0, 4, 16),
    352: (0, 0, 12, 16), 368: (4, 0, 12, 16),
    384: (0, 0, 8, 8), 448: (0, 0, 16, 8), 480: (0, 0, 8, 16),
    512: (0, 0, 32, 8), 516: (0, 24, 32, 8),
    520: (0, 0, 32, 24), 524: (0, 8, 32, 24),
    528: (0, 0, 8, 32), 532: (24, 0, 8, 32),
    536: (0, 0, 24, 32), 540: (8, 0, 24, 32),
    544: (0, 0, 16, 16), 560: (0, 0, 32, 16), 568: (0, 0, 16, 32),
    576: (0, 0, 64, 16), 577: (0, 48, 64, 16),
    578: (0, 0, 64, 48), 579: (0, 16, 64, 48),
    580: (0, 0, 16, 64), 581: (48, 0, 16, 64),
    582: (0, 0, 48, 64), 583: (16, 0, 48, 64),
    584: (0, 0, 32, 32), 588: (0, 0, 64, 32), 590: (0, 0, 32, 64),
    592: (0, 0, 64, 64),
}


def test_partition_layout_anchor_offsets():
    parts = gm.ctu_partitions(True)
    for idx, geom in ANCHORS_AMP.items():
        assert parts[idx] == geom, (idx, parts[idx], geom)


def test_part_index_inverts_table():
    for amp in (True, False):
        parts = gm.ctu_partitions(amp)
        for i, (x, y, w, h) in enumerate(parts):
            assert gm.part_index(x, y, w, h, amp) == i
    with pytest.raises(KeyError):
        gm.part_index(1, 0, 8, 4)     # unaligned geometry not in table


def test_reduction_matrix_covers_cells():
    red = gm.reduction_matrix(True)
    parts = gm.ctu_partitions(True)
    areas = red.sum(axis=1) * gm.BLOCK * gm.BLOCK
    for i, (x, y, w, h) in enumerate(parts):
        assert areas[i] == w * h


def _mk(seed, w=192, h=128, pad=80):
    rng = np.random.default_rng(seed)
    orig = rng.integers(0, 256, (h, w), np.int64)
    ref = rng.integers(0, 256, (h, w), np.int64)
    # plant a coherent shifted copy so argmins are non-degenerate
    ref[8:72, 72:136] = orig[4:68, 68:132]
    refp = np.pad(ref, pad, mode="edge")
    return orig, refp


def test_scalar_model_vs_bruteforce_oracle():
    """Independent brute force of the cost/tie-break semantics for a
    few partitions, against the vectorized scalar model."""
    orig, refp = _mk(1)
    sr, lam = 6, 123456
    ctu_x, ctu_y = 64, 64
    ctu = orig[ctu_y:ctu_y + 64, ctu_x:ctu_x + 64]
    mvp = (6, -3)
    mvx, mvy, sad = gm.gpu_mode_tables_np(
        ctu, refp, ctu_x, ctu_y, orig.shape[1], orig.shape[0], mvp, sr,
        lam)
    ltx, lty = gm.window_lt(mvp, sr, ctu_x, ctu_y, orig.shape[1],
                            orig.shape[0])
    pad = (refp.shape[1] - orig.shape[1]) // 2
    parts = gm.ctu_partitions(True)
    for pi in (0, 199, 462, 544, 585, 592):
        x, y, w, h = parts[pi]
        blk = ctu[y:y + h, x:x + w]
        best = None
        for dy in range(2 * sr + 1):
            for dx in range(2 * sr + 1):
                py0 = pad + ctu_y + y + lty + dy
                px0 = pad + ctu_x + x + ltx + dx
                s = int(np.abs(blk - refp[py0:py0 + h, px0:px0 + w])
                        .sum())
                bits = (gm.component_bits((ltx + dx) << 2)
                        + gm.component_bits((lty + dy) << 2))
                c = s + (lam * bits) // 65536
                if best is None or c < best[0]:
                    best = (c, ltx + dx, lty + dy, s)
        assert (mvx[pi], mvy[pi], sad[pi]) == best[1:], pi


def test_device_twin_matches_scalar_model():
    orig, refp = _mk(2)
    sr, lam = 5, 400000
    for ctu_x, ctu_y, mvp in ((0, 0, (0, 0)), (128, 64, (-9, 14))):
        ctu = orig[ctu_y:ctu_y + 64, ctu_x:ctu_x + 64]
        a = gm.gpu_mode_tables_np(ctu, refp, ctu_x, ctu_y,
                                  orig.shape[1], orig.shape[0], mvp, sr,
                                  lam)
        b = gm.gpu_mode_tables(ctu, refp, ctu_x, ctu_y, orig.shape[1],
                               orig.shape[0], mvp, sr, lam)
        for u, v in zip(a, b):
            np.testing.assert_array_equal(u, v)


def test_engine_tables_match_scalar_model():
    """The C++ engine's per-CTU GPUModeME tables (engine.cpp
    gpu_mode_compute, read back via hevc_engine_gpu_tables) equal the
    Python scalar model bit-for-bit on a single-CTU picture (no
    spatial/temporal AMVP neighbours -> predictor (0, 0) on both
    sides)."""
    import ctypes
    import math

    from hevc_tpu.entropy.cabac import (EngineParamsC, NativeCtuEngine,
                                        SliceDataEncoder, SliceParamsC,
                                        get_lib)

    rng = np.random.default_rng(7)
    W = H = 64
    PAD = 80
    sr = 8
    orig = [np.ascontiguousarray(rng.integers(0, 256, (H, W)), np.int16),
            np.ascontiguousarray(rng.integers(0, 256, (H // 2, W // 2)),
                                 np.int16),
            np.ascontiguousarray(rng.integers(0, 256, (H // 2, W // 2)),
                                 np.int16)]
    ref_y = rng.integers(0, 256, (H, W)).astype(np.int16)
    ref_y[8:40, 12:44] = orig[0][4:36, 8:40]  # coherent motion
    ref = [np.ascontiguousarray(np.pad(ref_y, PAD, mode="edge")),
           np.ascontiguousarray(np.pad(
               rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16),
               PAD, mode="edge")),
           np.ascontiguousarray(np.pad(
               rng.integers(0, 256, (H // 2, W // 2)).astype(np.int16),
               PAD, mode="edge"))]
    recon = [np.zeros_like(orig[0]), np.zeros_like(orig[1]),
             np.zeros_like(orig[2])]

    sp = SliceParamsC()
    sp.pic_w, sp.pic_h, sp.ctu_size = W, H, 64
    sp.qp, sp.slice_type = 32, 1
    sp.max_tu_depth_intra = sp.max_tu_depth_inter = 1
    sp.chroma_format = 1
    sp.min_cb_log2, sp.max_cb_log2 = 3, 6
    sp.min_tb_log2, sp.max_tb_log2 = 2, 5
    sp.max_merge_cand = 5
    sp.num_ref_l0, sp.num_ref_l1 = 1, 0
    sp.bit_depth = 8
    sp.cur_poc = 1
    sp.ref_poc_l0[0] = 0
    sp.gpu_mode_me, sp.gpu_sr = 1, sr
    ep = EngineParamsC()
    ep.pad, ep.cu_depth_target = PAD, 1
    lam = 0.57 * 2.0 ** ((32 - 12) / 3.0)
    ep.sqrt_lam = math.sqrt(lam)
    senc = SliceDataEncoder(sp)
    senc.begin_slice()
    eng = NativeCtuEngine(sp, ep, senc, orig, recon, ref0=[ref])
    eng.encode_ctu(0, 0)

    lib = get_lib()
    mvx = np.zeros(593, np.int16)
    mvy = np.zeros(593, np.int16)
    sad = np.zeros(593, np.uint32)
    lib.hevc_engine_gpu_tables(
        0, 0, mvx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        mvy.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        sad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))

    lam_fp = int(65536.0 * ep.sqrt_lam)
    emx, emy, esad = gm.gpu_mode_tables_np(
        np.asarray(orig[0], np.int64), np.asarray(ref[0], np.int64),
        0, 0, W, H, (0, 0), sr, lam_fp)
    np.testing.assert_array_equal(mvx.astype(np.int32), emx)
    np.testing.assert_array_equal(mvy.astype(np.int32), emy)
    np.testing.assert_array_equal(sad.astype(np.int64), esad)


def test_gpu_mode_encode_decodes_conformant():
    """End-to-end: GPUModeME=1 encode of a small clip decodes through
    our conformance decoder with matching recon hashes (and through the
    HM oracle in tests/test_hm_decode.py's harness when present)."""
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_test_yuv import write_clip

    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, 192, 128, 3)
        out = os.path.join(tmp, "out.bin")
        rec = os.path.join(tmp, "rec.yuv")
        from hevc_tpu.cli.encode import main as enc_main
        enc_main(["-i", clip, "-wdt", "192", "-hgt", "128", "-f", "3",
                  "-q", "34", "-b", out, "--SearchRange=8",
                  "--GPUModeME=1", "-fr", "30"])
        from hevc_tpu.cli.decode import main as dec_main
        rc = dec_main(["-b", out, "-o", rec])
        assert rc == 0
        # decoded output equals the encoder's recon exactly (hash SEI
        # verified inside the decoder; nonzero exit on mismatch)
        assert os.path.getsize(rec) > 0


def test_window_anchor_clips_at_picture_edge():
    """Edge CTU: the LT corner comes from the clipped predictor window
    (TEncSearch.cpp:3814) and the scan still covers (2sr+1)^2."""
    orig, refp = _mk(3)
    sr = 4
    mvx, mvy, sad = gm.gpu_mode_tables_np(
        orig[:64, :64], refp, 0, 0, orig.shape[1], orig.shape[0],
        (-400, -400), sr, 0)
    ltx, lty = gm.window_lt((-400, -400), sr, 0, 0, orig.shape[1],
                            orig.shape[0])
    # clipMv floor: ((-64 - 8 + 1) << 2) >> 2 = -71 (TComDataCU::clipMv)
    assert ltx == -71 and lty == -71
    assert mvx.min() >= ltx and mvx.max() <= ltx + 2 * sr
    assert mvy.min() >= lty and mvy.max() <= lty + 2 * sr
