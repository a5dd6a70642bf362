"""Batched Hadamard SATD on device.

Parity: reference TComRdCost xCalcHADs4x4/8x8 (TComRdCost.cpp:1321+) — the
encoder's fractional-ME refinement and intra prescreen metric. A batch of
NxN difference blocks is transformed with H8 (or H4) on both sides via MXU
matmuls; cost = (sum|T|er + 2) >> 2 per 8x8 (.. +1 >> 1 per 4x4), summed
over the tiling of larger blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


@functools.partial(jax.jit, static_argnames=("size",))
def satd_batch(a: jnp.ndarray, b: jnp.ndarray, *, size: int) -> jnp.ndarray:
    """a, b: int32 [..., size, size] -> SATD per block [...] (int32).
    Uses 8x8 Hadamard tiling for size >= 8, 4x4 for size 4."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    t = 8 if size >= 8 else 4
    h = jnp.asarray(_hadamard(t))
    n = size
    lead = d.shape[:-2]
    d = d.reshape(lead + (n // t, t, n // t, t))
    d = jnp.moveaxis(d, -3, -2)  # [..., n/t, n/t, t, t]
    m = jnp.einsum("ij,...jk,kl->...il", h, d, h,
                   preferred_element_type=jnp.int32)
    per_tile = jnp.sum(jnp.abs(m), axis=(-1, -2))
    per_tile = (per_tile + (2 if t == 8 else 1)) >> (2 if t == 8 else 1)
    return jnp.sum(per_tile, axis=(-1, -2)).astype(jnp.int32)
