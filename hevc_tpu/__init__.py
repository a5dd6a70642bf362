"""hevc_tpu — a TPU-native HEVC (H.265) encoder/decoder framework.

A from-scratch rebuild of the capabilities of MCV-Univalle/HM-OpenCL (HM-16.4
plus an OpenCL motion-estimation offload), re-designed TPU-first:

* All O(pixels)/O(search-positions) math — SAD/SATD motion search, intra
  prediction, DCT/DST transforms, quantization, interpolation filters,
  deblocking, SAO — runs as batched JAX/XLA/Pallas kernels on TPU.
* Bit-serial, sequential logic — CABAC arithmetic coding, syntax writing,
  NAL assembly — runs host-side in native C++ (hevc_tpu/entropy/native).
* Multi-chip scaling shards frames / CTU wavefronts over a
  ``jax.sharding.Mesh`` (see hevc_tpu.parallel).

Package map (reference parity noted per module):
  core/     — types, spec constant tables, parameter sets, CU/TU geometry
  ops/      — device kernels (transform, quant, intra, interp, SAD, SATD, ...)
  entropy/  — bit writers, NAL/Annex-B, headers, SEI, native CABAC
  encoder/  — GOP/slice/CTU orchestration, mode decision, rate control
  decoder/  — conformance decoder (entropy parse + device recon)
  io/       — YUV file IO, HM-compatible cfg/CLI parsing
  parallel/ — mesh construction and sharded batch encode
  utils/    — picture hashes, timing, misc
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the batched search/transform graphs are
# compile-heavy; cache them across processes (first run pays, rest reuse).
import os as _os

import jax as _jax

# Explicit platform pin (the axon PJRT plugin can override the JAX_PLATFORMS
# environment variable; the config API always wins). Set HEVC_TPU_PLATFORM to
# "cpu" or "tpu"/"axon" to pin; unset keeps jax's default.
_plat = _os.environ.get("HEVC_TPU_PLATFORM") or _os.environ.get(
    "JAX_PLATFORMS")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# The cache lives INSIDE the repo (checked in) so a fresh container's
# first benchmark run still hits warm compiles — the multi-minute 1080p
# device compiles otherwise recur whenever $HOME is wiped. Falls back to
# ~/.cache when the package is installed somewhere read-only.
_repo_cache = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".jax_cache")
_cache_dir = _os.environ.get("HEVC_TPU_CACHE_DIR", _repo_cache)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    if not _os.access(_cache_dir, _os.W_OK):
        raise OSError("read-only")
except OSError:
    _cache_dir = _os.path.expanduser("~/.cache/hevc_tpu_jax")
    _os.makedirs(_cache_dir, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
# Strip traceback source locations from lowerings: they differ with the
# Python call stack, which made persistent-cache keys unstable across
# processes (every CLI run then re-paid the multi-minute device compile).
_jax.config.update("jax_include_full_tracebacks_in_locations", False)
_jax.config.update("jax_traceback_in_locations_limit", 0)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
