"""Mesh-sharded encoder paths (hevc_tpu.parallel): the frame-batched /
block-sharded integer ME must match the per-frame device search exactly,
and a clip encoded via the mesh path must round-trip through the decoder
with every picture hash OK. Runs on the virtual 8-device CPU mesh set up
by conftest.py (the driver's multi-chip dry run exercises the same code)."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from hevc_tpu import parallel
from hevc_tpu.encoder.native_frame import PAD, batched_me_grid
from hevc_tpu.io.cfg import EncoderConfig
from hevc_tpu.ops.interp import pad_plane


def _frames(n, w, h, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h + 16, w + 16)).astype(np.int16)
    out = []
    for t in range(n):
        y = base[t:t + h, 2 * t:2 * t + w].copy()
        u = (y[::2, ::2] // 2 + 32).astype(np.int16)
        v = (y[1::2, ::2] // 2 + 48).astype(np.int16)
        out.append([y, u, v])
    return out


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("frame",))


def test_me_grids_frames_matches_per_frame():
    frames = _frames(5, 96, 64)
    size, r, lam = 32, 8, 7_000
    origs = np.stack([f[0] for f in frames[1:]])
    refs = np.stack([pad_plane(f[0], PAD) for f in frames[:-1]])
    gx, gy = parallel.me_grids_frames(origs, refs, size=size,
                                      search_range=r, lam_fp=lam)
    gxm, gym = parallel.me_grids_frames(origs, refs, size=size,
                                        search_range=r, lam_fp=lam,
                                        mesh=_mesh())
    for i in range(len(frames) - 1):
        ex, ey = batched_me_grid(origs[i], refs[i], size, r, lam)
        np.testing.assert_array_equal(gx[i], ex)
        np.testing.assert_array_equal(gy[i], ey)
        np.testing.assert_array_equal(gxm[i], ex)
        np.testing.assert_array_equal(gym[i], ey)


def test_me_grid_spatial_matches():
    frames = _frames(2, 128, 96)
    size, r, lam = 32, 8, 12_000
    ref = pad_plane(frames[0][0], PAD)
    ex, ey = batched_me_grid(frames[1][0], ref, size, r, lam)
    gx, gy = parallel.me_grid_spatial(frames[1][0], ref, size=size,
                                      search_range=r, lam_fp=lam,
                                      mesh=_mesh())
    np.testing.assert_array_equal(gx, ex)
    np.testing.assert_array_equal(gy, ey)


def test_mesh_encode_roundtrip():
    w, h, n = 128, 80, 5
    frames = _frames(n, w, h)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=-1,
                        frames_to_encode=n)
    data, stats = parallel.encode_clip(cfg, frames, mesh=_mesh())
    assert len(stats) == n
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop()
    pics = list(dec.decode_stream(data))
    assert len(pics) == n
    assert dec.hash_status == ["OK"] * n


def test_mesh_encode_same_stream_as_unsharded():
    w, h, n = 96, 64, 4
    frames = _frames(n, w, h, seed=11)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=-1,
                        frames_to_encode=n)
    a, _ = parallel.encode_clip(cfg, frames, mesh=_mesh())
    b, _ = parallel.encode_clip(cfg, frames, mesh=None)
    assert a == b


def test_mesh_encode_random_access_full_range_same_stream():
    """The mesh path is the product path (VERDICT r2 item 6): a
    reordered hierarchical-B GOP (reference encoder_randomaccess cfg) at
    the full cfg SearchRange 64, searching reconstructed references,
    must produce the byte-identical stream sharded and unsharded."""
    from hevc_tpu.io.cfg import parse_cfg_file
    w, h, n = 96, 64, 9
    frames = _frames(n, w, h, seed=5)
    cfg = parse_cfg_file("/root/reference/cfg/encoder_randomaccess_main.cfg")
    cfg.width, cfg.height = w, h
    cfg.frames_to_encode = n
    cfg.qp = 32
    assert cfg.search_range == 64  # the cfg's own range is honoured
    a, stats = parallel.encode_clip(cfg, frames, mesh=_mesh())
    b, _ = parallel.encode_clip(cfg, frames, mesh=None)
    assert a == b
    assert len(stats) == n
    from hevc_tpu.decoder.top import DecoderTop
    dec = DecoderTop()
    assert len(list(dec.decode_stream(a))) == n
    assert dec.hash_status == ["OK"] * n
