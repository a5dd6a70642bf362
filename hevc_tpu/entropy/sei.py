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


def write_picture_hash_sei(digests: List[bytes]) -> bytes:
    """decoded_picture_hash SEI RBSP (hash_type 0 = MD5)."""
    bw = BitWriter()
    payload_size = 1 + 16 * len(digests)
    bw.u(DECODED_PICTURE_HASH, 8)   # last_payload_type_byte
    bw.u(payload_size, 8)           # last_payload_size_byte
    bw.u(0, 8)                      # hash_type = MD5
    for d in digests:
        for b in d:
            bw.u(b, 8)
    bw.byte_align()
    return bw.bytes()
