"""Quantization / dequantization as batched elementwise device ops.

Parity: reference TComTrQuant.cpp xQuant:1126 (forward, HM's rounding-offset
scheme: 171/256 intra, 85/256 inter) and xDeQuant:1314 (normative spec 8.6.3
scaling with flat 16 scaling matrix). Batched over any leading axes; int32.

  transformShift = 15 - bitDepth - log2N
  forward: level = sign * ((|c| * quantScale[qp%6] + offset) >> qBits),
           qBits = 14 + qp//6 + transformShift
  dequant: c = clip16(((level * invQuantScale[qp%6] * 16) << (qp//6)
                       + (1 << (bdShift-1))) >> bdShift),
           bdShift = bitDepth + log2N - 5    [spec 8.6.3 with m=16]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables

ENTROPY_CODING_MIN = -32768
ENTROPY_CODING_MAX = 32767


@functools.partial(jax.jit,
                   static_argnames=("size", "qp", "bit_depth", "is_intra"))
def quantize(coeffs: jnp.ndarray, *, size: int, qp: int, bit_depth: int = 8,
             is_intra: bool = True) -> jnp.ndarray:
    qp = qp + 6 * (bit_depth - 8)   # Qp' incl. QpBdOffset (spec 8.6.1)
    log2n = tables.log2(size)
    transform_shift = 15 - bit_depth - log2n
    qbits = 14 + qp // 6 + transform_shift
    scale = int(tables.QUANT_SCALES[qp % 6])
    offset = (171 if is_intra else 85) << (qbits - 9)
    # |c| <= 32767 and scale <= 26214, so |c|*scale + offset < 2^31: int32-safe
    # (TPU-native lanes; no int64 anywhere on device).
    c = coeffs.astype(jnp.int32)
    level = (jnp.abs(c) * scale + offset) >> qbits
    level = jnp.clip(level, 0, ENTROPY_CODING_MAX)
    return jnp.where(c < 0, -level, level).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("size", "qp", "bit_depth"))
def dequantize(levels: jnp.ndarray, *, size: int, qp: int,
               bit_depth: int = 8) -> jnp.ndarray:
    qp = qp + 6 * (bit_depth - 8)   # Qp' incl. QpBdOffset (spec 8.6.1)
    log2n = tables.log2(size)
    bd_shift = bit_depth + log2n - 5
    scale = int(tables.INV_QUANT_SCALES[qp % 6])
    # Fold the spec's `(level*16*scale) << (qp//6)` into the barrel shift so
    # products stay < 2^22 (int32-safe, like the reference's per/rem split).
    rshift = bd_shift - 4 - qp // 6
    c = levels.astype(jnp.int32) * scale
    if rshift > 0:
        c = (c + (1 << (rshift - 1))) >> rshift
    else:
        c = c << -rshift
    return jnp.clip(c, ENTROPY_CODING_MIN, ENTROPY_CODING_MAX).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Numpy oracles
# ---------------------------------------------------------------------------

def quantize_np(coeffs: np.ndarray, size: int, qp: int, bit_depth: int = 8,
                is_intra: bool = True, scaling=None) -> np.ndarray:
    """scaling: per-coefficient scaling matrix (spec 8.6.3 m[x][y]); the
    forward quant scale folds it as (quantScale << 4) / m, matching the
    reference TComTrQuant::xSetScalingListEnc quantCoef derivation."""
    qp = qp + 6 * (bit_depth - 8)   # Qp' incl. QpBdOffset (spec 8.6.1)
    log2n = tables.log2(size)
    transform_shift = 15 - bit_depth - log2n
    qbits = 14 + qp // 6 + transform_shift
    scale = int(tables.QUANT_SCALES[qp % 6])
    if scaling is not None:
        scale = (scale << 4) // scaling.astype(np.int64)
    offset = (171 if is_intra else 85) << (qbits - 9)
    c = coeffs.astype(np.int64)
    level = (np.abs(c) * scale + offset) >> qbits
    level = np.clip(level, 0, ENTROPY_CODING_MAX)
    return np.where(c < 0, -level, level).astype(np.int32)


def dequantize_np(levels: np.ndarray, size: int, qp: int,
                  bit_depth: int = 8, scaling=None) -> np.ndarray:
    qp = qp + 6 * (bit_depth - 8)   # Qp' incl. QpBdOffset (spec 8.6.1)
    log2n = tables.log2(size)
    bd_shift = bit_depth + log2n - 5
    ls = int(tables.INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    m = 16 if scaling is None else scaling.astype(np.int64)
    c = (levels.astype(np.int64) * m * ls
         + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(c, ENTROPY_CODING_MIN, ENTROPY_CODING_MAX).astype(np.int32)
