"""Planar YUV file reader/writer.

Parity: reference TLibVideoIO/TVideoIOYuv.{h,cpp} (read :680, write :767,
skipFrames :186) — supports 8/10/12/16-bit container samples, bit-depth
scaling between file and internal depth (MSB extension), frame skipping, and
4:0:0/4:2:0/4:2:2/4:4:4 sub-sampling. Implemented with numpy memory-mapped
reads instead of the reference's per-row fread loops.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..core.types import ChromaFormat, chroma_shift_x, chroma_shift_y


def plane_shapes(width: int, height: int, fmt: ChromaFormat
                 ) -> List[Tuple[int, int]]:
    if fmt == ChromaFormat.C400:
        return [(height, width)]
    cw = width >> chroma_shift_x(fmt)
    ch = height >> chroma_shift_y(fmt)
    return [(height, width), (ch, cw), (ch, cw)]


def frame_bytes(width: int, height: int, fmt: ChromaFormat,
                file_bit_depth: int) -> int:
    per_sample = 2 if file_bit_depth > 8 else 1
    return sum(h * w for h, w in plane_shapes(width, height, fmt)) * per_sample


def _scale_planes(planes: List[np.ndarray], delta: int,
                  out_depth: int = 14) -> List[np.ndarray]:
    """Shift file bit depth to internal bit depth (TVideoIOYuv::scalePlane).
    out_depth picks the sample dtype: int16 through 14-bit, int32 for
    16-bit video (high-bit-depth build; reference TypeDef.h:698)."""
    dt = np.int16 if out_depth <= 14 else np.int32
    if delta == 0:
        return [p.astype(dt) for p in planes]
    if delta > 0:
        return [(p.astype(np.int32) << delta).astype(dt) for p in planes]
    rnd = 1 << (-delta - 1)
    return [((p.astype(np.int32) + rnd) >> -delta).astype(dt)
            for p in planes]


class YuvReader:
    """Sequential frame reader over a raw planar YUV file."""

    def __init__(self, path: str, width: int, height: int,
                 fmt: ChromaFormat = ChromaFormat.C420,
                 file_bit_depth: int = 8, internal_bit_depth: int = 8):
        self.path = path
        self.width = width
        self.height = height
        self.fmt = fmt
        self.file_bit_depth = file_bit_depth
        self.internal_bit_depth = internal_bit_depth
        self._fh = open(path, "rb")
        self._frame_bytes = frame_bytes(width, height, fmt, file_bit_depth)
        self.num_frames = os.path.getsize(path) // self._frame_bytes

    def skip(self, n: int) -> None:
        self._fh.seek(n * self._frame_bytes, os.SEEK_CUR)

    def read(self) -> Optional[List[np.ndarray]]:
        """Read one frame as a list of int16 planes at internal bit depth."""
        raw = self._fh.read(self._frame_bytes)
        if len(raw) < self._frame_bytes:
            return None
        dtype = np.dtype("<u2") if self.file_bit_depth > 8 else np.uint8
        data = np.frombuffer(raw, dtype=dtype)
        planes = []
        off = 0
        for h, w in plane_shapes(self.width, self.height, self.fmt):
            planes.append(data[off:off + h * w].reshape(h, w))
            off += h * w
        return _scale_planes(planes,
                             self.internal_bit_depth - self.file_bit_depth,
                             self.internal_bit_depth)

    def close(self) -> None:
        self._fh.close()


class YuvWriter:
    def __init__(self, path: str, file_bit_depth: int = 8,
                 internal_bit_depth: int = 8):
        self.path = path
        self.file_bit_depth = file_bit_depth
        self.internal_bit_depth = internal_bit_depth
        self._fh = open(path, "wb")

    def write(self, planes: List[np.ndarray]) -> None:
        delta = self.file_bit_depth - self.internal_bit_depth
        out = _scale_planes(planes, delta, self.file_bit_depth)
        maxval = (1 << self.file_bit_depth) - 1
        for p in out:
            p = np.clip(p, 0, maxval)
            if self.file_bit_depth > 8:
                self._fh.write(p.astype("<u2").tobytes())
            else:
                self._fh.write(p.astype(np.uint8).tobytes())

    def close(self) -> None:
        self._fh.close()
