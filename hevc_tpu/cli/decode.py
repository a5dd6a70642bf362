"""Decoder CLI. Parity: reference TAppDecoder (decmain.cpp, TAppDecTop).

Usage: python -m hevc_tpu.cli.decode -b in.bin -o out.yuv
"""
from __future__ import annotations

import sys
import time

from ..decoder.top import DecoderTop
from ..io.yuv import YuvWriter


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    bs, out = None, None
    i = 0
    while i < len(argv):
        if argv[i] == "-b":
            bs = argv[i + 1]; i += 2
        elif argv[i] == "-o":
            out = argv[i + 1]; i += 2
        else:
            raise ValueError(f"unknown arg {argv[i]}")
    assert bs, "-b bitstream required"
    dec = DecoderTop()
    wr = None
    t0 = time.time()
    n = 0
    for frame in dec.decode_stream(open(bs, "rb").read()):
        status = dec.hash_status[n] if n < len(dec.hash_status) else "-"
        print(f"POC {n:4d} decoded [hash {status}]")
        if out and wr is None:
            bd = dec.sps.bit_depth_luma
            wr = YuvWriter(out, file_bit_depth=bd, internal_bit_depth=bd)
        if wr:
            wr.write(frame)
        n += 1
    dt = time.time() - t0
    bad = sum(1 for s in dec.hash_status if s != "OK")
    print(f"decoded {n} frames in {dt:.2f}s; hash failures: {bad}")
    if wr:
        wr.close()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
