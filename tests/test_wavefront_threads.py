"""Threaded wavefront engine stress: the lag-2 wavefront drive in
api.cpp (hevc_engine_frame) must produce byte-identical streams for every
thread count — the engine is the conformance-critical path and its
parallelism must be unobservable. Mirrors the dependency structure the
reference exploits for WPP (TEncSlice.cpp:744).

Each encode runs in a subprocess because HEVC_TPU_THREADS is read by the
native layer per frame call but the engine thread pool interacts with
global state we want cold per run.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import numpy as np
rng = np.random.default_rng(11)
w, h, n = 192, 128, 4
base = rng.integers(0, 255, size=(h + 8, w + 8)).astype(np.int16)
frames = []
for t in range(n):
    y = base[t:t + h, 2 * t:2 * t + w].copy()
    frames.append([y, (y[::2, ::2] // 2 + 40).astype(np.int16),
                   (y[1::2, ::2] // 2 + 60).astype(np.int16)])
from hevc_tpu.io.cfg import EncoderConfig
from hevc_tpu.encoder.top import EncoderTop
cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=-1,
                    frames_to_encode=n)
enc = EncoderTop(cfg)
out = b"".join(enc.encode_frame(f) for f in frames) + enc.flush()
sys.stdout.buffer.write(out)
"""


def _encode(nthreads: int) -> bytes:
    env = dict(os.environ)
    env["HEVC_TPU_THREADS"] = str(nthreads)
    env["JAX_PLATFORMS"] = "cpu"
    env["HEVC_TPU_PLATFORM"] = "cpu"
    out = subprocess.run([sys.executable, "-c", _WORKER], cwd=REPO,
                         env=env, capture_output=True, check=True)
    assert len(out.stdout) > 1000, out.stderr[-2000:]
    return out.stdout


def test_thread_count_sweep_byte_identical():
    """All WAVEFRONT thread counts must agree byte-for-byte: the stream
    may depend only on the estimation mode (sequential single-thread mode
    tracks exact CABAC context states through a shadow coder for its RD
    estimates — engine.cpp encode_ctu est_enc_ replay — which the lag-2
    wavefront deliberately forgoes), never on scheduling. A race between
    rows would surface as divergence here."""
    ref = _encode(2)
    for nthreads in (3, 5, 8):
        assert _encode(nthreads) == ref, f"nthreads={nthreads} diverged"


@pytest.mark.parametrize("iteration", range(3))
def test_threaded_repeatability(iteration):
    """Same thread count, repeated runs: scheduling nondeterminism must
    not leak into the stream (a race would surface as flakiness here)."""
    assert _encode(8) == _encode(8)


def test_wavefront_under_tsan():
    """ThreadSanitizer run of the threaded engine (`make tsan` build,
    LD_PRELOAD'd runtime). Any data race in the lag-2 wavefront aborts
    the subprocess (halt_on_error)."""
    native = os.path.join(REPO, "hevc_tpu", "entropy", "native")
    tsan_rt = subprocess.run(["g++", "-print-file-name=libtsan.so"],
                             capture_output=True, text=True).stdout.strip()
    if not os.path.isabs(tsan_rt):
        pytest.skip("libtsan runtime not available")
    subprocess.run(["make", "-s", "tsan"], cwd=native, check=True)
    env = dict(os.environ)
    env["HEVC_TPU_THREADS"] = "8"
    env["JAX_PLATFORMS"] = "cpu"
    env["HEVC_TPU_PLATFORM"] = "cpu"
    env["HEVC_TPU_LIB"] = os.path.join(native, "libhevc_entropy_tsan.so")
    env["HEVC_TPU_INTRA_SCREEN"] = "0"  # keep XLA's own pool out of shot
    env["LD_PRELOAD"] = tsan_rt
    # Python/XLA themselves are uninstrumented: suppress everything not
    # rooted in the engine's own threads, halt on engine races only.
    env["TSAN_OPTIONS"] = ("halt_on_error=1 report_bugs=1 "
                           "exitcode=66 suppressions="
                           + os.path.join(native, "tsan.supp"))
    out = subprocess.run([sys.executable, "-c", _WORKER], cwd=REPO,
                         env=env, capture_output=True)
    assert out.returncode == 0, (out.returncode,
                                 out.stderr[-3000:].decode("utf8",
                                                           "replace"))
    assert len(out.stdout) > 1000
