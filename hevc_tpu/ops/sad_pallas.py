"""Pallas TPU kernel: batched full-search SAD tables.

Parity: reference cl/sad.cl + TEncOpenCL.cpp calcMotionVectors:240 — the
fork's GPU module enqueues (2R+1)^2 sequential kernel pairs per CTU per
reference. Here ONE pallas launch computes the whole [N, ny, nx] SAD table:
grid = (N,); each program DMAs its block's search area into VMEM and sweeps
all (dy, dx) offsets with VPU |diff| reductions (row-vectorized over dx).
The fused lambda*mv-bits argmin (compareSAD's job) runs as cheap XLA ops on
the table output. Output tile padded to (8, 128) lane alignment.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


def _sad_kernel(blk_ref, area_ref, out_ref, scratch, sem, *, h, w, ny, nx,
                nxp):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(area_ref.at[i], scratch, sem)
    dma.start()
    dma.wait()
    blk = blk_ref[0]
    # 8 dy offsets per iteration: the dynamic row slice start stays a
    # provable multiple of 8 (Mosaic sublane alignment), and each inner
    # accumulation is a lane-wide (h, nx) reduce — one SAD row per vector
    # op instead of one scalar per (dy, dx).
    h8 = _round_up(h + 8, 8)

    zero = jnp.int32(0)

    def row8(t, _):
        rows = scratch[pl.ds(t * 8, h8), :]
        sads = [[None] * nxp for _ in range(8)]
        for k in range(8):
            sub = rows[k:k + h, :]
            for dx in range(nxp):
                sads[k][dx] = (jnp.sum(jnp.abs(sub[:, dx:dx + w] - blk))
                               if dx < nx else zero)
        # scalar->vector stacks stay within one 128-lane tile per chunk
        for j in range(nxp // 128):
            chunk = jnp.stack([jnp.stack(sads[k][j * 128:(j + 1) * 128])
                               for k in range(8)])
            out_ref[0, pl.ds(t * 8, 8), j * 128:(j + 1) * 128] = chunk
        return 0

    jax.lax.fori_loop(0, (ny + 7) // 8, row8, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "ny", "nx",
                                             "interpret"))
def sad_table(blks: jnp.ndarray, areas: jnp.ndarray, *, h: int, w: int,
              ny: int, nx: int, interpret: bool = False) -> jnp.ndarray:
    """blks [N,h,w] int32, areas [N,h+ny-1,w+nx-1] int32 -> SAD [N,ny,nx]."""
    n = blks.shape[0]
    nyp = _round_up(ny, 8)
    nxp = _round_up(nx, 128)
    aw = _round_up(w + nx - 1, 128)   # lane-aligned area width for the DMA
    # rows for the last 8-dy iteration: (nyp - 8) + (h + 8 rounded up)
    ah = nyp - 8 + _round_up(h + 8, 8)
    areas = jnp.pad(areas.astype(jnp.int32),
                    ((0, 0), (0, ah - (h + ny - 1)), (0, aw - (w + nx - 1))))
    # NOTE: a functools.partial here would embed its repr (with a
    # process-specific object address) in the serialized Mosaic payload,
    # making the persistent-compilation-cache key unstable across
    # processes (each CLI run then pays the multi-minute tunnel compile).
    def kernel(blk_ref, area_ref, out_ref, scratch, sem):
        _sad_kernel(blk_ref, area_ref, out_ref, scratch, sem, h=h, w=w,
                    ny=ny, nx=nx, nxp=nxp)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nyp, nxp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nyp, nxp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((ah, aw), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(blks.astype(jnp.int32), areas)
    return out[:, :ny, :nx]


@functools.partial(jax.jit, static_argnames=("size", "r", "ny", "nx", "pad"))
def sad_table_from_planes(ref_padded: jnp.ndarray, orig: jnp.ndarray, *,
                          size: int, r: int, ny: int, nx: int,
                          pad: int) -> jnp.ndarray:
    """Full-search SAD tables with the block/window gathers ON DEVICE.

    Only the two planes cross the host link (the per-block search windows
    overlap 60%+ and re-shipping them dominated the ME cost through the
    device tunnel). ref_padded [H+2p, W+2p], orig [H, W] (any int dtype);
    returns SAD [ny*nx, 2r+1, 2r+1] int32 for the aligned size x size
    block grid.
    """
    from jax import lax
    aw = 2 * r + size
    blks = (orig[:ny * size, :nx * size].astype(jnp.int32)
            .reshape(ny, size, nx, size).transpose(0, 2, 1, 3)
            .reshape(ny * nx, size, size))
    # windows starting at (pad - r + i*size, pad - r + j*size)
    roi = ref_padded[pad - r:, pad - r:].astype(jnp.int32)
    need_h = (ny - 1) * size + aw
    need_w = (nx - 1) * size + aw
    roi = roi[:need_h, :need_w]
    patches = lax.conv_general_dilated_patches(
        roi[None, None], (aw, aw), (size, size), "VALID")
    # [1, aw*aw, ny, nx] -> [ny*nx, aw, aw]
    areas = (patches[0].reshape(aw, aw, ny, nx)
             .transpose(2, 3, 0, 1).reshape(ny * nx, aw, aw))
    n = ny * nx
    bucket = max(128, 1 << (n - 1).bit_length())
    if n < bucket:
        blks = jnp.pad(blks, ((0, bucket - n), (0, 0), (0, 0)))
        areas = jnp.pad(areas, ((0, bucket - n), (0, 0), (0, 0)))
    return sad_table(blks, areas, h=size, w=size, ny=2 * r + 1, nx=2 * r + 1)


@functools.partial(jax.jit, static_argnames=("size", "r", "ny", "nx", "pad"))
def me_from_planes(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                   bits: jnp.ndarray, lam_fp: jnp.ndarray, *, size: int,
                   r: int, ny: int, nx: int, pad: int) -> jnp.ndarray:
    """Full search fused end-to-end on device: window gather + Pallas SAD +
    lambda-rate cost + first-minimum argmin. Only the two planes go up and
    one index per block comes back. bits [2r+1, 2r+1] int32 and lam_fp are
    runtime arrays so their values never enter the compiled graph."""
    nyx = 2 * r + 1
    sads = sad_table_from_planes(ref_padded, orig, size=size, r=r, ny=ny,
                                 nx=nx, pad=pad)
    cost = sads[:, :nyx, :nyx] + ((lam_fp.astype(jnp.int32) * bits) >> 16)
    return jnp.argmin(cost.reshape(cost.shape[0], -1), axis=1)
