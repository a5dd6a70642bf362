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

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/hevc_tpu_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
