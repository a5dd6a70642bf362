"""SEI messages — decoded picture hash (spec D.2.19/D.3.19).

Parity: reference SEIwrite.cpp + TComPicYuvMD5.cpp:185 (per-component MD5
over raster samples, low byte first for >8-bit).
"""
from __future__ import annotations

import hashlib
from typing import List

import numpy as np

from .bitwriter import BitWriter

DECODED_PICTURE_HASH = 132
ACTIVE_PARAMETER_SETS = 129
RECOVERY_POINT = 6
USER_DATA_UNREGISTERED = 5


def picture_md5(planes: List[np.ndarray], bit_depth: int = 8) -> List[bytes]:
    digests = []
    for p in planes:
        m = hashlib.md5()
        if bit_depth <= 8:
            m.update(np.ascontiguousarray(p.astype(np.uint8)).tobytes())
        else:
            m.update(np.ascontiguousarray(p.astype("<u2")).tobytes())
        digests.append(m.digest())
    return digests


def _crc_table():
    # reduction table for the reference's CRC variant (data bits shifted
    # into the LOW end, poly applied on the old msb only)
    tab = []
    for v in range(256):
        c = (v << 8) & 0xFFFF
        for _ in range(8):
            msb = (c >> 15) & 1
            c = ((c << 1) & 0xFFFF) ^ (msb * 0x1021)
        tab.append(c)
    return tab


_CRC_TAB = _crc_table()


def picture_crc(planes: List[np.ndarray], bit_depth: int = 8
                ) -> List[bytes]:
    """Per-plane CRC (hash_type 1; reference TComPicYuvMD5.cpp
    compCRC:89 — init 0xffff, poly 0x1021, sample bits shifted into the
    LOW end of the register (not the crc_hqx convention), low byte of
    each sample first, 16 zero bits flushed at the end)."""
    tab = _CRC_TAB
    out = []
    for p in planes:
        if bit_depth <= 8:
            data = np.ascontiguousarray(p.astype(np.uint8)).tobytes()
        else:
            data = np.ascontiguousarray(p.astype("<u2")).tobytes()
        crc = 0xFFFF
        for b in data:
            crc = tab[crc >> 8] ^ (((crc & 0xFF) << 8) | b)
        for _ in range(2):  # flush 16 zero bits
            crc = tab[crc >> 8] ^ ((crc & 0xFF) << 8)
        out.append(bytes([(crc >> 8) & 0xFF, crc & 0xFF]))
    return out


def picture_checksum(planes: List[np.ndarray], bit_depth: int = 8
                     ) -> List[bytes]:
    """Per-plane xor-mask checksum (hash_type 2; reference
    TComPicYuvMD5.cpp compChecksum:141)."""
    out = []
    for p in planes:
        h, w = p.shape
        xs = np.arange(w, dtype=np.uint32)
        ys = np.arange(h, dtype=np.uint32)[:, None]
        mask = ((xs & 0xFF) ^ (ys & 0xFF) ^ (xs >> 8) ^ (ys >> 8)) \
            .astype(np.uint32)
        pv = p.astype(np.uint32)
        s = int(((pv & 0xFF) ^ mask).sum(dtype=np.uint64))
        if bit_depth > 8:
            s += int(((pv >> 8) ^ mask).sum(dtype=np.uint64))
        s &= 0xFFFFFFFF
        out.append(bytes([(s >> 24) & 0xFF, (s >> 16) & 0xFF,
                          (s >> 8) & 0xFF, s & 0xFF]))
    return out


def picture_hash(planes, bit_depth: int, hash_type: int) -> List[bytes]:
    if hash_type == 0:
        return picture_md5(planes, bit_depth)
    if hash_type == 1:
        return picture_crc(planes, bit_depth)
    if hash_type == 2:
        return picture_checksum(planes, bit_depth)
    raise ValueError(f"unknown decoded_picture_hash type {hash_type}")


def write_picture_hash_sei(digests: List[bytes],
                           hash_type: int = 0) -> bytes:
    """decoded_picture_hash SEI RBSP (hash_type 0 MD5 / 1 CRC /
    2 checksum)."""
    bw = BitWriter()
    per = {0: 16, 1: 2, 2: 4}[hash_type]
    payload_size = 1 + per * len(digests)
    bw.u(DECODED_PICTURE_HASH, 8)   # last_payload_type_byte
    bw.u(payload_size, 8)           # last_payload_size_byte
    bw.u(hash_type, 8)
    for d in digests:
        for b in d:
            bw.u(b, 8)
    bw.byte_align()
    return bw.bytes()


def _payload_align(p: BitWriter) -> None:
    """SEI payload alignment: bit_equal_to_one + zeros, only when the
    payload is not already byte-aligned (spec 7.3.5)."""
    if p._nbits:
        p.u(1, 1)
        p.align_zero()


def _sei_rbsp(ptype: int, payload_bits: BitWriter) -> bytes:
    """Wrap a payload in the SEI message framing (spec 7.3.5): type/size
    bytes, payload, payload alignment, rbsp trailing."""
    body = payload_bits.bytes()
    bw = BitWriter()
    t = ptype
    while t >= 255:
        bw.u(255, 8)
        t -= 255
    bw.u(t, 8)
    n = len(body)
    while n >= 255:
        bw.u(255, 8)
        n -= 255
    bw.u(n, 8)
    for b in body:
        bw.u(b, 8)
    bw.byte_align()                 # rbsp_trailing_bits (stop bit + zeros)
    return bw.bytes()


def write_active_parameter_sets_sei(vps_id: int = 0,
                                    sps_id: int = 0) -> bytes:
    """active_parameter_sets SEI (spec D.2.21 / reference
    SEIEncoder::initSEIActiveParameterSets)."""
    p = BitWriter()
    p.u(vps_id, 4)                   # active_video_parameter_set_id
    p.flag(1)                        # self_contained_cvs_flag
    p.flag(0)                        # no_parameter_set_update_flag
    p.ue(0)                          # num_sps_ids_minus1
    p.ue(sps_id)                     # active_seq_parameter_set_id[0]
    _payload_align(p)
    return _sei_rbsp(ACTIVE_PARAMETER_SETS, p)


def write_recovery_point_sei(recovery_poc_cnt: int = 0,
                             exact_match: int = 1) -> bytes:
    """recovery_point SEI (spec D.2.8)."""
    p = BitWriter()
    p.se(recovery_poc_cnt)
    p.flag(exact_match)
    p.flag(0)                        # broken_link_flag
    _payload_align(p)
    return _sei_rbsp(RECOVERY_POINT, p)


def write_user_data_sei(payload: bytes,
                        uuid: bytes = b"hevc-tpu-frmwrk!") -> bytes:
    """user_data_unregistered SEI (spec D.2.7)."""
    assert len(uuid) == 16
    p = BitWriter()
    for b in uuid + payload:
        p.u(b, 8)
    return _sei_rbsp(USER_DATA_UNREGISTERED, p)


def parse_sei_messages(rbsp: bytes):
    """Iterate (payload_type, payload_bytes) in one SEI NAL RBSP."""
    out = []
    i = 0
    while i + 1 < len(rbsp):
        t = 0
        while i < len(rbsp) and rbsp[i] == 255:
            t += 255
            i += 1
        if i >= len(rbsp):
            break
        t += rbsp[i]
        i += 1
        n = 0
        while i < len(rbsp) and rbsp[i] == 255:
            n += 255
            i += 1
        if i >= len(rbsp):
            break
        n += rbsp[i]
        i += 1
        out.append((t, rbsp[i:i + n]))
        i += n
        if i >= len(rbsp) or (len(rbsp) - i) <= 1:
            break
    return out


PIC_TIMING = 1


def write_pic_timing_sei(pic_struct: int, source_scan_type: int = 0,
                         duplicate_flag: int = 0, hrd=None,
                         cpb_removal_delay: int = 0,
                         dpb_output_delay: int = 0,
                         frame_field_info: bool = True) -> bytes:
    """pic_timing SEI (spec D.2.3; reference
    SEIEncoder::initSEIPictureTiming): frame-field info and, when HRD
    parameters are active, the CPB removal / DPB output delays.
    `cpb_removal_delay` is the AU count since the buffering period; the
    au_cpb_removal_delay_minus1 field carries max(1, delay) - 1 clamped
    to the signalled length (reference SEIwrite.cpp:308 writes delay-1
    with delay = max(1, totalCoded - lastBP), TEncGOP.cpp:542)."""
    p = BitWriter()
    if frame_field_info:
        p.u(pic_struct, 4)
        p.u(source_scan_type, 2)
        p.flag(duplicate_flag)
    if hrd is not None:
        n = hrd.au_cpb_removal_delay_length_minus1 + 1
        p.u(min(max(1, cpb_removal_delay) - 1, (1 << n) - 1), n)
        p.u(dpb_output_delay, hrd.dpb_output_delay_length_minus1 + 1)
    _payload_align(p)
    return _sei_rbsp(PIC_TIMING, p)


BUFFERING_PERIOD = 0


def write_buffering_period_sei(hrd, initial_cpb_removal_delay: int,
                               initial_cpb_removal_offset: int = 0,
                               sps_id: int = 0) -> bytes:
    """buffering_period SEI (spec D.2.2; reference
    SEIEncoder::initSEIBufferingPeriod): NAL HRD, one CPB."""
    p = BitWriter()
    p.ue(sps_id)                     # bp_seq_parameter_set_id
    p.flag(0)                        # irap_cpb_params_present_flag
    p.flag(0)                        # concatenation_flag
    n = hrd.au_cpb_removal_delay_length_minus1 + 1
    p.u(0, n)                        # au_cpb_removal_delay_delta_minus1
    m = hrd.initial_cpb_removal_delay_length_minus1 + 1
    p.u(initial_cpb_removal_delay, m)
    p.u(initial_cpb_removal_offset, m)
    _payload_align(p)
    return _sei_rbsp(BUFFERING_PERIOD, p)
