"""Device fractional-refine + half-screen tables (ops/me_mxu).

The engine's half->quarter 9+8-point SATD refinement (engine.cpp
cost_of; reference TEncSearch::xPatternSearchFracDIF :4294) and the 3x3
half-pel split-screen minimum (quad_screen_satd) are precomputed on the
device in the same dispatch as the integer search. These tests pin the
contract:

 * the device tables equal an independent host replay built from the
   verified numpy twins (interp.mc_predict_np + intra_frame.satd) —
   same interpolation, same SATD normalization, same strict-< orders;
 * an encode consuming the tables emits a byte-identical stream to one
   running the host refine loops (HEVC_TPU_ME_REFINE=0).
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

PAD = 80


def _host_refine(orig, refp, mvx, mvy, bx, by, size, depth=8):
    """Replay of engine.cpp cost_of's two-stage refinement + the 3x3
    half minimum, from the numpy twins."""
    from hevc_tpu.encoder.intra_frame import satd
    from hevc_tpu.ops.interp import mc_predict_np

    ob = orig[by:by + size, bx:bx + size]

    def cost(qx, qy):
        p = mc_predict_np(refp, PAD, qx, qy, bx, by, size, size, depth,
                          True)
        return satd(ob, p)

    rmx, rmy = mvx * 4, mvy * 4
    best = cost(rmx, rmy)
    for step in (2, 1):
        cx0, cy0 = rmx, rmy
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                c = cost(cx0 + dx, cy0 + dy)
                if c < best:
                    best, rmx, rmy = c, cx0 + dx, cy0 + dy
    half_min = min(cost(mvx * 4 + dx, mvy * 4 + dy)
                   for dy in (-2, 0, 2) for dx in (-2, 0, 2))
    return rmx - mvx * 4, rmy - mvy * 4, half_min


def test_refine_tables_match_host_replay():
    import jax.numpy as jnp

    from hevc_tpu.ops import me_mxu
    rng = np.random.default_rng(9)
    h, w = 96, 128
    orig = rng.integers(0, 256, (h, w)).astype(np.int16)
    ref = rng.integers(0, 256, (h, w)).astype(np.int16)
    # correlated content so refinement is non-trivial
    ref[4:84, 6:118] = np.clip(
        orig[2:82, 3:115].astype(np.int32)
        + rng.integers(-6, 7, (80, 112)), 0, 255).astype(np.int16)
    refp = np.pad(ref, PAD, mode="edge")
    r, r2 = 8, 8
    size, size2 = 32, 16
    ny, nx = h // size, w // size
    ny2, nx2 = h // size2, w // size2
    packed = np.asarray(me_mxu._me_idx_multi2_jit(
        jnp.asarray(orig), jnp.asarray(refp[None]),
        me_mxu._bits0_dev(r), me_mxu._bits0_dev(r2), jnp.int32(1),
        size=size, size2=size2, r=r, r2=r2, ny=ny, nx=nx, ny2=ny2,
        nx2=nx2, pad=PAD, depth=8, axis_name=None, refine=True))[0]
    n1, n2 = ny * nx, ny2 * nx2
    i1, i2 = packed[:n1], packed[n1:n1 + n2]
    o = n1 + n2
    off1 = packed[o:o + n1]
    half1 = packed[o + n1:o + 2 * n1]
    off2 = packed[o + 2 * n1:o + 2 * n1 + n2]
    half2 = packed[o + 2 * n1 + n2:]
    nyx, nyx2 = 2 * r + 1, 2 * r2 + 1
    for (idx, offs, halfs, sz, gnx, rr, gyx) in (
            (i1, off1, half1, size, nx, r, nyx),
            (i2, off2, half2, size2, nx2, r2, nyx2)):
        for b in range(len(idx)):
            mvy = idx[b] // gyx - rr
            mvx = idx[b] % gyx - rr
            bx, by = (b % gnx) * sz, (b // gnx) * sz
            edx, edy, ehalf = _host_refine(orig, refp, mvx, mvy, bx, by,
                                           sz)
            assert offs[b] == (edy + 3) * 7 + (edx + 3), (
                sz, b, offs[b], edx, edy)
            assert halfs[b] == ehalf, (sz, b, halfs[b], ehalf)


def test_refine_encode_bitstream_identical():
    """The table-driven refine must reproduce the host loops' decisions
    exactly: same stream bytes with tables on and off (prefetch pipeline
    forced onto the CPU backend; post-SAO references on both sides so
    the integer grids are common)."""
    import tempfile

    from make_test_yuv import write_clip

    with tempfile.TemporaryDirectory() as tmp:
        clip = os.path.join(tmp, "in.yuv")
        write_clip(clip, 192, 128, 5)
        outs = {}
        for tag, rf in (("on", "1"), ("off", "0")):
            bs = os.path.join(tmp, f"{tag}.bin")
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       HEVC_TPU_ME_PREFETCH_CPU="1",
                       HEVC_TPU_ME_PREFILTER_REF="0",
                       HEVC_TPU_ME_REFINE=rf)
            out = subprocess.run(
                [sys.executable, "-m", "hevc_tpu.cli.encode", "-i", clip,
                 "-wdt", "192", "-hgt", "128", "-f", "5", "-q", "32",
                 "--IntraPeriod=-1", "--SearchRange=16", "-b", bs],
                capture_output=True, text=True, env=env,
                cwd=os.path.join(os.path.dirname(__file__), ".."))
            assert out.returncode == 0, out.stderr[-2000:]
            outs[tag] = open(bs, "rb").read()
        assert outs["on"] == outs["off"]
        assert len(outs["on"]) > 0
