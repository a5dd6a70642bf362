"""Forward/inverse core transforms as batched integer matmuls.

Parity: reference TComTrQuant.cpp partialButterfly{4,8,16,32}(+Inverse)
:388-859 and fastForwardDst/fastInverseDst :414-474. The reference computes
each size with hand-unrolled butterfly loops per column; on TPU the same
normative result is two dense matrix multiplies per stage (the butterflies
are just a factorization of these matmuls), batched over an arbitrary
leading axis so a whole frame's TUs of one size go through the MXU in one
launch. All arithmetic is int32 (bit-exact; no float drift).

Shifts per spec 8.6.4:
  forward: stage1 >> (log2N + bitDepth - 9), stage2 >> (log2N + 6)
  inverse: stage1 >> 7 (clip to 16-bit), stage2 >> (20 - bitDepth)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import tables

MAX_TR_DYNAMIC_RANGE = 15  # reference TypeDef.h maxTrDynamicRange (non-RExt)


def _matrix(size: int, is_dst: bool) -> np.ndarray:
    if is_dst:
        assert size == 4
        return tables.DST4
    return tables.dct_matrix(size)


def _rshift_round(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


@functools.partial(jax.jit, static_argnames=("size", "bit_depth", "is_dst"))
def forward_transform(residual: jnp.ndarray, *, size: int, bit_depth: int = 8,
                      is_dst: bool = False) -> jnp.ndarray:
    """residual: int32 [..., size, size] -> coefficients int32 [..., size, size]."""
    t = jnp.asarray(_matrix(size, is_dst), dtype=jnp.int32)
    log2n = tables.log2(size)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    r = residual.astype(jnp.int32)
    # Stage 1 (horizontal, matching the reference's row-first order):
    # tmp[j, k] = sum_n r[j, n] * T[k, n]
    tmp = jax.lax.dot_general(
        r, t, (((r.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    tmp = _rshift_round(tmp, shift1)
    # Stage 2 (vertical): out[k, l] = sum_j T[k, j] * tmp[j, l]
    out = jax.lax.dot_general(
        t, tmp, (((1,), (tmp.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = jnp.moveaxis(out, 0, -2)
    return _rshift_round(out, shift2)


@functools.partial(jax.jit, static_argnames=("size", "bit_depth", "is_dst"))
def inverse_transform(coeffs: jnp.ndarray, *, size: int, bit_depth: int = 8,
                      is_dst: bool = False) -> jnp.ndarray:
    """coeffs: int32 [..., size, size] -> residual int32 [..., size, size]."""
    t = jnp.asarray(_matrix(size, is_dst), dtype=jnp.int32)
    shift1 = 7
    shift2 = 20 - bit_depth
    c = coeffs.astype(jnp.int32)
    # Stage 1: tmp[n, j] = sum_k T[k, n] * c[k, j]  (T^T on the left)
    tmp = jax.lax.dot_general(
        t, c, (((0,), (c.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    tmp = jnp.moveaxis(tmp, 0, -2)
    tmp = _rshift_round(tmp, shift1)
    tmp = jnp.clip(tmp, -32768, 32767)  # normative 16-bit intermediate clip
    # Stage 2: out[n, m] = sum_l tmp[n, l] * T[l, m]
    out = jax.lax.dot_general(
        tmp, t, (((tmp.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = _rshift_round(out, shift2)
    if bit_depth > 14:
        # high-bit-depth: the reference's second-stage clip is Pel-type
        # protection, not normative (TComTrQuant.cpp:966 "Clipping here
        # is not in the standard") — Pel is Int in the HBD build
        return out
    return jnp.clip(out, -32768, 32767)


# ---------------------------------------------------------------------------
# Numpy oracles (independent scalar path used by unit tests)
# ---------------------------------------------------------------------------

def forward_transform_np(residual: np.ndarray, size: int, bit_depth: int = 8,
                         is_dst: bool = False) -> np.ndarray:
    t = _matrix(size, is_dst).astype(np.int64)
    log2n = tables.log2(size)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    tmp = (residual.astype(np.int64) @ t.T + (1 << (shift1 - 1))) >> shift1
    out = (t @ tmp + (1 << (shift2 - 1))) >> shift2
    return out.astype(np.int32)


def inverse_transform_np(coeffs: np.ndarray, size: int, bit_depth: int = 8,
                         is_dst: bool = False) -> np.ndarray:
    t = _matrix(size, is_dst).astype(np.int64)
    shift2 = 20 - bit_depth
    tmp = (t.T @ coeffs.astype(np.int64) + 64) >> 7
    tmp = np.clip(tmp, -32768, 32767)
    out = (tmp @ t + (1 << (shift2 - 1))) >> shift2
    if bit_depth > 14:
        return out.astype(np.int32)  # HBD: Pel-protection clip is a no-op
    return np.clip(out, -32768, 32767).astype(np.int32)


def inverse_ts_np(deq: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Transform-skip inverse (spec 8.6.4.2 r = d << 7 followed by the
    8.6.5 bdShift = 20 - BitDepth rounding; reference
    TComTrQuant::xITransformSkip)."""
    bd_shift = 20 - bit_depth
    rnd = 1 << (bd_shift - 1)
    return ((deq.astype(np.int64) << 7) + rnd) >> bd_shift
