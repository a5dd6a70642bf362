"""ctypes binding to the native entropy library (libhevc_entropy.so).

Parity: the native layer replaces the reference's TEncSbac/TEncBinCABAC and
TDecSbac/TDecBinCABAC stacks; this module is the Python-facing API used by
the encoder/decoder orchestrators. The library is rebuilt automatically when
sources are newer (single-machine dev flow; wheels would prebuild it).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhevc_entropy.so")
_lib = None


class SliceParamsC(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in (
        "pic_w", "pic_h", "ctu_size", "qp", "slice_type",
        "max_tu_depth_intra", "max_tu_depth_inter", "chroma_format",
        "sign_hiding", "transform_skip_enabled", "min_cb_log2",
        "max_cb_log2", "min_tb_log2", "max_tb_log2", "max_merge_cand",
        "num_ref_l0", "num_ref_l1", "mvd_l1_zero")] + [
        ("ref_poc_l0", ctypes.c_int32 * 16),
        ("ref_poc_l1", ctypes.c_int32 * 16)] + [
        (n, ctypes.c_int32) for n in ("sao_luma", "sao_chroma", "bit_depth")]


def _build() -> None:
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    srcs = [os.path.join(_NATIVE_DIR, f) for f in os.listdir(_NATIVE_DIR)
            if f.endswith((".cpp", ".h"))]
    if (not os.path.exists(_LIB_PATH)
            or any(os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                   for s in srcs)):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hevc_enc_create.restype = ctypes.c_void_p
    lib.hevc_enc_create.argtypes = [ctypes.POINTER(SliceParamsC)]
    lib.hevc_enc_destroy.argtypes = [ctypes.c_void_p]
    lib.hevc_enc_begin_slice.argtypes = [ctypes.c_void_p]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.hevc_enc_ctu.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        u8p, u8p, u8p, u8p, u8p, i16p, i16p, i16p,
        u8p, u8p, u8p, u8p, u8p, i8p, i16p, i16p, i16p, i16p,
        u8p, i8p, i16p, i16p, i16p, i16p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int]
    lib.hevc_enc_publish_cu.argtypes = [
        ctypes.c_void_p] + [ctypes.c_int] * 11
    lib.hevc_enc_merge_cands.restype = ctypes.c_int
    lib.hevc_enc_merge_cands.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i16p, i8p]
    lib.hevc_enc_amvp.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, i16p]
    lib.hevc_enc_get.restype = ctypes.c_long
    lib.hevc_enc_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_long]
    lib.hevc_dec_create.restype = ctypes.c_void_p
    lib.hevc_dec_create.argtypes = [ctypes.POINTER(SliceParamsC),
                                    ctypes.c_char_p, ctypes.c_long]
    lib.hevc_dec_destroy.argtypes = [ctypes.c_void_p]
    lib.hevc_dec_ctu.restype = ctypes.c_int
    lib.hevc_dec_ctu.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        u8p, u8p, u8p, u8p, u8p, i16p, i16p, i16p,
        u8p, u8p, u8p, u8p, u8p, i8p, i16p, i16p, i16p, i16p,
        u8p, i8p, i16p, i16p, i16p, i16p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    _lib = lib
    return lib


def make_slice_params(pic_w: int, pic_h: int, qp: int, slice_type: int = 2,
                      ctu_size: int = 64, max_tu_depth_intra: int = 3,
                      max_tu_depth_inter: int = 3, chroma_format: int = 1,
                      sign_hiding: int = 0, transform_skip: int = 0,
                      min_cb_log2: int = 3, max_tb_log2: int = 5,
                      max_merge_cand: int = 5, num_ref_l0: int = 1,
                      num_ref_l1: int = 0, mvd_l1_zero: int = 0,
                      ref_poc_l0=(), ref_poc_l1=(), sao_luma: int = 0,
                      sao_chroma: int = 0, bit_depth: int = 8,
                      cur_poc: int = 0) -> SliceParamsC:
    sp = SliceParamsC(
        pic_w, pic_h, ctu_size, qp, slice_type, max_tu_depth_intra,
        max_tu_depth_inter, chroma_format, sign_hiding, transform_skip,
        min_cb_log2, (ctu_size.bit_length() - 1), 2, max_tb_log2,
        max_merge_cand, num_ref_l0, num_ref_l1, mvd_l1_zero)
    for i, pocv in enumerate(ref_poc_l0):
        sp.ref_poc_l0[i] = pocv
    for i, pocv in enumerate(ref_poc_l1):
        sp.ref_poc_l1[i] = pocv
    sp.sao_luma = sao_luma
    sp.sao_chroma = sao_chroma
    sp.bit_depth = bit_depth
    sp.cur_poc = cur_poc
    return sp


class CtuDecisions:
    """Per-CTU decision maps handed to the native syntax writer."""

    def __init__(self, ctu_size: int = 64, chroma_format: int = 1):
        n4 = ctu_size // 4
        cw = ctu_size if chroma_format == 3 else ctu_size // 2
        self.cu_depth = np.zeros((n4, n4), np.uint8)
        self.nxn_flag = np.zeros((n4, n4), np.uint8)
        self.luma_mode = np.full((n4, n4), 1, np.uint8)
        self.chroma_mode = np.full((n4, n4), 1, np.uint8)
        self.tu_depth = np.zeros((n4, n4), np.uint8)
        self.coeff_y = np.zeros((ctu_size, ctu_size), np.int16)
        self.coeff_cb = np.zeros((cw, cw), np.int16)
        self.coeff_cr = np.zeros((cw, cw), np.int16)
        self.pred_mode = np.ones((n4, n4), np.uint8)   # 1 = intra
        self.skip_flag = np.zeros((n4, n4), np.uint8)
        self.merge_flag = np.zeros((n4, n4), np.uint8)
        self.merge_idx = np.zeros((n4, n4), np.uint8)
        self.mvp_flag = np.zeros((n4, n4), np.uint8)
        self.ref_idx = np.full((n4, n4), -1, np.int8)
        self.mvd_x = np.zeros((n4, n4), np.int16)
        self.mvd_y = np.zeros((n4, n4), np.int16)
        self.mv_x = np.zeros((n4, n4), np.int16)
        self.mv_y = np.zeros((n4, n4), np.int16)
        self.mvp_flag1 = np.zeros((n4, n4), np.uint8)
        self.ref_idx1 = np.full((n4, n4), -1, np.int8)
        self.mvd_x1 = np.zeros((n4, n4), np.int16)
        self.mvd_y1 = np.zeros((n4, n4), np.int16)
        self.mv_x1 = np.zeros((n4, n4), np.int16)
        self.mv_y1 = np.zeros((n4, n4), np.int16)
        self.sao = np.zeros(20, np.int32)


class SliceDataEncoder:
    def __init__(self, params: SliceParamsC):
        self._lib = get_lib()
        self._h = self._lib.hevc_enc_create(ctypes.byref(params))

    def begin_slice(self) -> None:
        self._lib.hevc_enc_begin_slice(self._h)

    def encode_ctu(self, ctu_x: int, ctu_y: int, d: CtuDecisions,
                   end_of_slice: bool) -> None:
        self._lib.hevc_enc_ctu(
            self._h, ctu_x, ctu_y,
            np.ascontiguousarray(d.cu_depth), np.ascontiguousarray(d.nxn_flag),
            np.ascontiguousarray(d.luma_mode),
            np.ascontiguousarray(d.chroma_mode),
            np.ascontiguousarray(d.tu_depth),
            np.ascontiguousarray(d.coeff_y),
            np.ascontiguousarray(d.coeff_cb),
            np.ascontiguousarray(d.coeff_cr),
            np.ascontiguousarray(d.pred_mode),
            np.ascontiguousarray(d.skip_flag),
            np.ascontiguousarray(d.merge_flag),
            np.ascontiguousarray(d.merge_idx),
            np.ascontiguousarray(d.mvp_flag),
            np.ascontiguousarray(d.ref_idx),
            np.ascontiguousarray(d.mvd_x),
            np.ascontiguousarray(d.mvd_y),
            np.ascontiguousarray(d.mv_x),
            np.ascontiguousarray(d.mv_y),
            np.ascontiguousarray(d.mvp_flag1),
            np.ascontiguousarray(d.ref_idx1),
            np.ascontiguousarray(d.mvd_x1),
            np.ascontiguousarray(d.mvd_y1),
            np.ascontiguousarray(d.mv_x1),
            np.ascontiguousarray(d.mv_y1),
            np.ascontiguousarray(d.sao),
            1 if end_of_slice else 0)

    def publish_cu(self, x0, y0, log2, is_intra, skip=0, mv=(0, 0),
                   ref_idx=0, mv1=(0, 0), ref_idx1=-1):
        self._lib.hevc_enc_publish_cu(self._h, x0, y0, log2,
                                      1 if is_intra else 0, skip,
                                      int(mv[0]), int(mv[1]), ref_idx,
                                      int(mv1[0]), int(mv1[1]), ref_idx1)

    def merge_cands(self, x0, y0, size):
        """Returns [((l0mv, l0ref), (l1mv, l1ref)), ...] — a list entry is
        None-equivalent when its ref is -1."""
        mv = np.zeros(20, np.int16)
        ref = np.zeros(10, np.int8)
        n = self._lib.hevc_enc_merge_cands(self._h, x0, y0, size, mv, ref)
        out = []
        for i in range(n):
            out.append((((int(mv[4 * i]), int(mv[4 * i + 1])),
                         int(ref[2 * i])),
                        ((int(mv[4 * i + 2]), int(mv[4 * i + 3])),
                         int(ref[2 * i + 1]))))
        return out

    def amvp_cands(self, x0, y0, size, list_idx=0, ref=0):
        mv = np.zeros(4, np.int16)
        self._lib.hevc_enc_amvp(self._h, x0, y0, size, list_idx, ref, mv)
        return [(int(mv[0]), int(mv[1])), (int(mv[2]), int(mv[3]))]

    def get_bytes(self) -> bytes:
        n = self._lib.hevc_enc_get(self._h, None, 0)
        buf = ctypes.create_string_buffer(n)
        self._lib.hevc_enc_get(self._h, buf, n)
        return buf.raw

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hevc_enc_destroy(self._h)
            self._h = None


class SliceDataDecoder:
    def __init__(self, params: SliceParamsC, data: bytes):
        self._lib = get_lib()
        self._data = data  # keep alive
        self._h = self._lib.hevc_dec_create(ctypes.byref(params), data,
                                            len(data))
        self._ctu = params.ctu_size
        self._cfmt = params.chroma_format

    def decode_ctu(self, ctu_x: int, ctu_y: int) -> tuple:
        d = CtuDecisions(self._ctu, chroma_format=self._cfmt)
        eos = self._lib.hevc_dec_ctu(
            self._h, ctu_x, ctu_y, d.cu_depth, d.nxn_flag, d.luma_mode,
            d.chroma_mode, d.tu_depth, d.coeff_y, d.coeff_cb, d.coeff_cr,
            d.pred_mode, d.skip_flag, d.merge_flag, d.merge_idx, d.mvp_flag,
            d.ref_idx, d.mvd_x, d.mvd_y, d.mv_x, d.mv_y,
            d.mvp_flag1, d.ref_idx1, d.mvd_x1, d.mvd_y1, d.mv_x1, d.mv_y1,
            d.sao)
        return d, eos

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hevc_dec_destroy(self._h)
            self._h = None
