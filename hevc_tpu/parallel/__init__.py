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
@functools.partial(jax.jit,
                   static_argnames=("size", "r", "ny", "nx", "pad"))
def _me_frames(origs, refps, bits, lam_q8, *, size, r, ny, nx, pad):
    """Per-frame two-pass MXU SSD argmin, vmapped over the frame axis
    (ops/me_mxu.py — identical decisions to the single-frame path)."""
    from ..ops import me_mxu

    def one(orig, refp):
        return me_mxu.me_idx_frame(orig, refp, bits, lam_q8, size=size,
                                   r=r, ny=ny, nx=nx, pad=pad)
    return jax.vmap(one)(origs, refps)


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
    from ..ops import me_mxu
    f, h, w = origs.shape
    r = search_range
    ny = (h - size) // size + 1 if h >= size else 0
    nx = (w - size) // size + 1 if w >= size else 0
    if ny == 0 or nx == 0:
        return (np.zeros((f, 0, 0), np.int32),) * 2
    bits = me_mxu.bits0_table(r)
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
    idx = np.asarray(_me_frames(
        origs, refs_padded, jnp.asarray(bits),
        jnp.int32(me_mxu.lam_q8_of(lam_fp)),
        size=size, r=r, ny=ny, nx=nx, pad=PAD))
    idx = idx[:f]
    gy = (idx // nyx - r).astype(np.int32).reshape(f, ny, nx)
    gx = (idx % nyx - r).astype(np.int32).reshape(f, ny, nx)
    return gx, gy


@functools.partial(jax.jit,
                   static_argnames=("size", "r", "ny", "nx", "pad",
                                    "axis_name"))
def _me_one_frame_spatial(orig, refp, bits, lam_q8, *, size, r, ny, nx,
                          pad, axis_name):
    """Single large frame with the block axis sharded across the mesh:
    the per-block tensors of the MXU SSD search get sharding constraints
    so XLA scatters the work over devices (spatial parallelism)."""
    from ..ops import me_mxu

    def shard(t):
        spec = P(*([axis_name] + [None] * (t.ndim - 1)))
        return lax.with_sharding_constraint(t, spec)

    return me_mxu.me_idx_frame(orig, refp, bits, lam_q8, size=size, r=r,
                               ny=ny, nx=nx, pad=pad, shard=shard)


def me_grid_spatial(orig: np.ndarray, ref_padded: np.ndarray, *, size: int,
                    search_range: int, lam_fp: int, mesh: Mesh,
                    axis_name: str = "frame"):
    """One frame's MV grid with blocks sharded over the mesh. The block
    count is padded to a multiple of the mesh size."""
    from ..ops import me_mxu
    h, w = orig.shape
    r = search_range
    ny = (h - size) // size + 1
    nx = (w - size) // size + 1
    nyx = 2 * r + 1
    bits = me_mxu.bits0_table(r)
    with mesh:
        idx = np.asarray(_me_one_frame_spatial(
            jnp.asarray(np.ascontiguousarray(orig, np.int16)),
            jnp.asarray(np.ascontiguousarray(ref_padded, np.int16)),
            jnp.asarray(bits), jnp.int32(me_mxu.lam_q8_of(lam_fp)),
            size=size, r=r, ny=ny, nx=nx, pad=PAD, axis_name=axis_name))
    gy = (idx // nyx - r).astype(np.int32).reshape(ny, nx)
    gx = (idx % nyx - r).astype(np.int32).reshape(ny, nx)
    return gx, gy


# ----------------------------------------------------------------------
# Mesh-parallel clip encode
# ----------------------------------------------------------------------
def encode_clip(cfg, frames: List[List[np.ndarray]],
                mesh: Optional[Mesh] = None,
                lookahead: bool = False) -> Tuple[bytes, list]:
    """Encode a clip over a device mesh.

    Default mode is the PRODUCT path: ``EncoderTop(cfg, mesh=mesh)``.
    Every device motion-search dispatch runs the identical XLA program
    as single-chip with its per-block tensors sharded across the mesh
    (sharding constraints in ops/me_mxu.py), searching RECONSTRUCTED
    references at the full cfg SearchRange with every GOP shape —
    low-delay and random-access — supported. The emitted stream is
    byte-identical to the unsharded encoder's.

    ``lookahead=True`` instead batches the whole clip's integer ME into
    one frame-axis-sharded launch against the *original* previous
    picture (streaming lookahead semantics: all frames independent on
    the device; fractional refinement and prediction still use recon
    refs, so the stream stays conformant — but differs from the
    unsharded product stream). Low-delay GOPs only.

    Returns (annexb_bytes, per-frame stats list).
    """
    from ..encoder.top import EncoderTop

    if not lookahead:
        enc = EncoderTop(cfg, mesh=mesh)
        out = b"".join(enc.encode_frame(f) for f in frames)
        out += enc.flush()
        return out, enc.stats

    enc = EncoderTop(cfg)
    if enc.reordered:
        raise ValueError("lookahead mesh encode supports low-delay GOPs "
                         "only; use the default (product-path) mode for "
                         "random access")
    size = enc.sps.ctu_size >> 1
    r = cfg.search_range
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
