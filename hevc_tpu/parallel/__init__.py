"""Multi-chip scaling: mesh construction + sharded encoder device work.

Parity: the reference's only cross-device transport is the OpenCL
command queue of its GPU ME module (TEncOpenCL.cpp:240-362 — one CTU in
flight, blocking staging). The TPU-native equivalent scales the same
hot loop two ways over a ``jax.sharding.Mesh``:

* **frame axis** — integer motion estimation is computed against the
  *source* (original) previous picture, so every inter frame's whole-frame
  search is independent and batches along a leading frame axis that
  shards cleanly across chips (lookahead ME; the per-CU fractional
  refinement and final motion compensation still use reconstructed
  references inside the conformant host engine).
* **block axis** — within one frame, the per-block SAD tables are
  independent; a sharding constraint on the gathered block batch splits
  one large frame's search across chips.

All device math here is pure XLA (gather + scan + reductions) so the same
program compiles on a CPU mesh (tests, driver dry runs) and on TPU; the
single-chip product path additionally has the Pallas kernel
(hevc_tpu/ops/sad_pallas.py) for peak throughput.
"""
from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import me as me_ops
from ..ops.interp import pad_plane

PAD = 80  # must match encoder.native_frame.PAD


# ----------------------------------------------------------------------
# Mesh construction
# ----------------------------------------------------------------------
def make_mesh(n_devices: int, axis_name: str = "frame") -> Mesh:
    """An n-device 1-D mesh. If the process has fewer real devices than
    requested (this box tunnels to a single TPU chip), pin the CPU
    platform with n virtual devices — which must happen before the JAX
    backend initialises, hence the config-API calls here."""
    import os

    if not _backends_initialized():
        try:
            ndev = _probe_device_count()
        except Exception:
            ndev = 0
        if ndev < n_devices:
            os.environ["HEVC_TPU_PLATFORM"] = "cpu"
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n_devices)
    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devs)} "
            f"(platform {devs[0].platform}); construct the mesh before "
            "any other JAX backend use so the CPU fallback can engage")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def _backends_initialized() -> bool:
    from jax._src import xla_bridge
    return bool(xla_bridge._backends)


def _probe_device_count() -> int:
    """Device count the current platform setting would give, without
    initialising backends when the answer is knowable from config."""
    import os
    plat = (os.environ.get("HEVC_TPU_PLATFORM")
            or os.environ.get("JAX_PLATFORMS") or "")
    if plat.startswith("cpu"):
        return jax.config.jax_num_cpu_devices or 1
    # axon tunnel exposes one chip; anything else: assume single device
    return 1


# ----------------------------------------------------------------------
# Sharded frame-batched integer motion search
# ----------------------------------------------------------------------
def _frame_me_idx(orig, refp, bits, lam_fp, *, size, r, ny, nx, pad):
    """One frame's full-search argmin indices, pure XLA.

    Same math as ops.me.full_search_batch_np (zero MV predictor, cost =
    SAD + (lam*bits >> 16), first-minimum in row-major (dy, dx) order).
    The dy axis runs as a lax.scan so peak memory stays at one row of
    im2col patches instead of the full (2R+1)^2 table.
    """
    aw = 2 * r + size
    nyx = 2 * r + 1
    n = ny * nx
    blks = (orig[:ny * size, :nx * size].astype(jnp.int32)
            .reshape(ny, size, nx, size).transpose(0, 2, 1, 3)
            .reshape(n, size * size))
    roi = refp[pad - r:pad - r + (ny - 1) * size + aw,
               pad - r:pad - r + (nx - 1) * size + aw].astype(jnp.int32)
    patches = lax.conv_general_dilated_patches(
        roi[None, None], (aw, aw), (size, size), "VALID")
    areas = (patches[0].reshape(aw, aw, ny, nx)
             .transpose(2, 3, 0, 1).reshape(n, aw, aw))

    def row(dy, _):
        slab = lax.dynamic_slice_in_dim(areas, dy, size, axis=1)
        win = lax.conv_general_dilated_patches(
            slab[:, None], (size, size), (1, 1), "VALID")  # [N,size*size,1,nyx]
        sad = jnp.sum(jnp.abs(win[:, :, 0, :] - blks[:, :, None]), axis=1)
        return dy + 1, sad

    _, sads = lax.scan(row, 0, None, length=nyx)       # [nyx, N, nyx]
    sads = sads.transpose(1, 0, 2)                     # [N, dy, dx]
    cost = sads + ((lam_fp.astype(jnp.int32) * bits)[None] >> 16)
    return jnp.argmin(cost.reshape(n, -1), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("size", "r", "ny", "nx", "pad"))
def _me_frames(origs, refps, bits, lam_fp, *, size, r, ny, nx, pad):
    def one(orig, refp):
        return _frame_me_idx(orig, refp, bits, lam_fp, size=size, r=r,
                             ny=ny, nx=nx, pad=pad)
    return jax.vmap(one)(origs, refps)


def _mv_bits_table(r: int) -> np.ndarray:
    dyr = np.arange(2 * r + 1) - r
    b = np.array([me_ops.mv_bits_np(int(v) << 2) for v in dyr], np.int32)
    return b[:, None] + b[None, :]


def me_grids_frames(origs: np.ndarray, refs_padded: np.ndarray, *,
                    size: int, search_range: int, lam_fp: int,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = "frame"):
    """Integer full-search MV grids for a batch of frames, sharded over
    `mesh` along the frame axis when given.

    origs [F, H, W] ints; refs_padded [F, H+2*PAD, W+2*PAD].
    Returns (gx, gy) int32 arrays [F, ny, nx] — identical values to
    encoder.native_frame.batched_me_grid run per frame.
    """
    f, h, w = origs.shape
    r = search_range
    ny = (h - size) // size + 1 if h >= size else 0
    nx = (w - size) // size + 1 if w >= size else 0
    if ny == 0 or nx == 0:
        return (np.zeros((f, 0, 0), np.int32),) * 2
    bits = _mv_bits_table(r)
    nyx = 2 * r + 1
    fpad = f
    origs = np.ascontiguousarray(origs, np.int16)
    refs_padded = np.ascontiguousarray(refs_padded, np.int16)
    if mesh is not None:
        ndev = mesh.devices.size
        fpad = -(-f // ndev) * ndev
        if fpad != f:
            reps = fpad - f
            origs = np.concatenate([origs, origs[-1:].repeat(reps, 0)])
            refs_padded = np.concatenate(
                [refs_padded, refs_padded[-1:].repeat(reps, 0)])
        sh3 = NamedSharding(mesh, P(axis_name, None, None))
        origs = jax.device_put(origs, sh3)
        refs_padded = jax.device_put(refs_padded, sh3)
    idx = np.asarray(_me_frames(origs, refs_padded,
                                jnp.asarray(bits), jnp.int32(lam_fp),
                                size=size, r=r, ny=ny, nx=nx, pad=PAD))
    idx = idx[:f]
    gy = (idx // nyx - r).astype(np.int32).reshape(f, ny, nx)
    gx = (idx % nyx - r).astype(np.int32).reshape(f, ny, nx)
    return gx, gy


@functools.partial(jax.jit,
                   static_argnames=("size", "r", "ny", "nx", "pad",
                                    "axis_name"))
def _me_one_frame_spatial(orig, refp, bits, lam_fp, *, size, r, ny, nx,
                          pad, axis_name):
    """Single large frame with the block axis sharded across the mesh:
    the gathered [N, aw, aw] search areas get a sharding constraint so
    XLA scatters the SAD scan over devices (spatial parallelism)."""
    aw = 2 * r + size
    nyx = 2 * r + 1
    n = ny * nx
    blks = (orig[:ny * size, :nx * size].astype(jnp.int32)
            .reshape(ny, size, nx, size).transpose(0, 2, 1, 3)
            .reshape(n, size * size))
    roi = refp[pad - r:pad - r + (ny - 1) * size + aw,
               pad - r:pad - r + (nx - 1) * size + aw].astype(jnp.int32)
    patches = lax.conv_general_dilated_patches(
        roi[None, None], (aw, aw), (size, size), "VALID")
    areas = (patches[0].reshape(aw, aw, ny, nx)
             .transpose(2, 3, 0, 1).reshape(n, aw, aw))
    areas = lax.with_sharding_constraint(areas, P(axis_name, None, None))
    blks = lax.with_sharding_constraint(blks, P(axis_name, None))

    def row(dy, _):
        slab = lax.dynamic_slice_in_dim(areas, dy, size, axis=1)
        win = lax.conv_general_dilated_patches(
            slab[:, None], (size, size), (1, 1), "VALID")
        sad = jnp.sum(jnp.abs(win[:, :, 0, :] - blks[:, :, None]), axis=1)
        return dy + 1, sad

    _, sads = lax.scan(row, 0, None, length=nyx)
    sads = sads.transpose(1, 0, 2)
    cost = sads + ((lam_fp.astype(jnp.int32) * bits)[None] >> 16)
    return jnp.argmin(cost.reshape(n, -1), axis=1)


def me_grid_spatial(orig: np.ndarray, ref_padded: np.ndarray, *, size: int,
                    search_range: int, lam_fp: int, mesh: Mesh,
                    axis_name: str = "frame"):
    """One frame's MV grid with blocks sharded over the mesh. The block
    count is padded to a multiple of the mesh size."""
    h, w = orig.shape
    r = search_range
    ny = (h - size) // size + 1
    nx = (w - size) // size + 1
    nyx = 2 * r + 1
    bits = _mv_bits_table(r)
    with mesh:
        idx = np.asarray(_me_one_frame_spatial(
            jnp.asarray(np.ascontiguousarray(orig, np.int16)),
            jnp.asarray(np.ascontiguousarray(ref_padded, np.int16)),
            jnp.asarray(bits), jnp.int32(lam_fp),
            size=size, r=r, ny=ny, nx=nx, pad=PAD, axis_name=axis_name))
    gy = (idx // nyx - r).astype(np.int32).reshape(ny, nx)
    gx = (idx % nyx - r).astype(np.int32).reshape(ny, nx)
    return gx, gy


# ----------------------------------------------------------------------
# Mesh-parallel clip encode (low-delay): lookahead ME over the frame axis
# ----------------------------------------------------------------------
def encode_clip(cfg, frames: List[List[np.ndarray]],
                mesh: Optional[Mesh] = None) -> Tuple[bytes, list]:
    """Encode a clip with the whole clip's integer motion search batched
    into one sharded device launch (frame-data-parallel), then the
    conformant host engine consuming the precomputed MV grids.

    Integer ME runs against the *original* previous frame (lookahead
    semantics) so all frames are independent on the device; fractional
    refinement and prediction inside the engine still use reconstructed
    references, keeping the bitstream conformant. Low-delay (streaming)
    GOP shapes only.

    Returns (annexb_bytes, per-frame stats list).
    """
    from ..encoder.top import EncoderTop

    enc = EncoderTop(cfg)
    if enc.reordered:
        raise ValueError("mesh encode supports low-delay GOPs only")
    size = enc.sps.ctu_size >> 1
    r = min(cfg.search_range, 24)
    lam = 0.4624 * (2.0 ** ((cfg.qp - 12) / 3.0))
    lam_fp = int(65536.0 * math.sqrt(lam))
    ip = cfg.intra_period
    inter = [t for t in range(len(frames))
             if not (t == 0 or (ip > 0 and t % max(ip, 1) == 0))]
    grids = {}
    if inter:
        origs = np.stack([frames[t][0] for t in inter])
        refs = np.stack([pad_plane(np.asarray(frames[t - 1][0], np.int16),
                                   PAD) for t in inter])
        gx, gy = me_grids_frames(origs, refs, size=size, search_range=r,
                                 lam_fp=lam_fp, mesh=mesh)
        for i, t in enumerate(inter):
            grids[t] = (gx[i], gy[i])

    enc.me_provider = lambda poc, *_a: grids.get(poc)
    out = b"".join(enc.encode_frame(f) for f in frames)
    out += enc.flush()
    return out, enc.stats
