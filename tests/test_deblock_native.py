"""Native (deblock.cpp) vs numpy (ops/deblock.py) deblocking parity.

The native filter is an exact twin of the verified numpy implementation
(reference TComLoopFilter); since the deblocked picture feeds the hash
SEI and all future references, encoding the same clip with each backend
must produce byte-identical bitstreams.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENCODE_SNIPPET = r"""
import os, sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + "/tools")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["HEVC_TPU_NATIVE_DEBLOCK"] = os.environ.get("DBK", "1")
from make_test_yuv import write_clip
clip = "/tmp/dbknat_clip.yuv"
if not os.path.exists(clip):
    write_clip(clip, 256, 128, 5)
from hevc_tpu.encoder.top import EncoderTop
from hevc_tpu.io.cfg import parse_cli
from hevc_tpu.io.yuv import YuvReader
cfg = parse_cli([{cfgargs}, "-i", clip, "-wdt", "256", "-hgt", "128",
                 "-f", "5", "-q", "30", "-b", "/dev/null"])
rd = YuvReader(clip, 256, 128, file_bit_depth=8, internal_bit_depth=8)
enc = EncoderTop(cfg)
out = b""
while True:
    p = rd.read()
    if p is None:
        break
    out += enc.encode_frame(p)
out += enc.flush()
sys.stdout.buffer.write(out)
"""


def _encode(cfg_args, native):
    env = dict(os.environ, DBK="1" if native else "0")
    src = ENCODE_SNIPPET.format(repo=REPO, cfgargs=cfg_args)
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       env=env, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    return r.stdout


@pytest.mark.parametrize("cfg_args", [
    '"-c", "/root/reference/cfg/encoder_intra_main.cfg"',
    '"-c", "/root/reference/cfg/encoder_lowdelay_P_main.cfg"',
    '"-c", "/root/reference/cfg/encoder_lowdelay_main.cfg"',
])
def test_native_deblock_stream_identical(cfg_args):
    a = _encode(cfg_args, native=True)
    b = _encode(cfg_args, native=False)
    assert len(a) > 1000
    assert a == b
