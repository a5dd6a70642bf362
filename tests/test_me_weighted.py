"""Weighted distortion in the integer motion search.

Reference TComRdCostWeightPrediction (weighted SAD/SSE/HAD): when the
slice signals explicit weighted prediction, HM's motion search measures
distortion against the WEIGHTED reference. Here the device/numpy integer
full search applies the per-ref (w, o, denom) transform to the reference
plane before the SSD sweep (ops/me_mxu.wp_apply /
encoder/native_frame.wp_apply_np), so a fade's DC shift no longer
contaminates every candidate's cost. The fractional refine and all
engine SATD screens already predict through mc_uni (WP applied), so the
integer grid was the one unweighted stage.
"""
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

ORACLE = "/tmp/hm_oracle/bin/TAppDecoderStatic"


def test_wp_apply_twins_match():
    from hevc_tpu.encoder.native_frame import wp_apply_np
    from hevc_tpu.ops import me_mxu
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    for wpv in ((45, 12, 6), (64, 0, 6), (3, -10, 1), (1, 5, 0)):
        a = wp_apply_np(plane, wpv, 8)
        b = np.asarray(me_mxu.wp_apply(
            jnp.asarray(plane), jnp.asarray(np.array(wpv, np.int32)), 8))
        np.testing.assert_array_equal(a, b)


def test_weighted_search_finds_motion_under_fade():
    """On a fading pan, the unweighted SSD search collapses to noise
    (every candidate carries the DC offset); the weighted search
    recovers the true displacement."""
    from hevc_tpu.encoder.native_frame import PAD, batched_me_grid
    rng = np.random.default_rng(5)
    h, w = 96, 160
    base = np.repeat(np.repeat(rng.integers(60, 180, (h // 4 + 8,
                                                      w // 4 + 8)), 4, 0),
                     4, 1).astype(np.float64)
    ref = base[8:8 + h, 8:8 + w]
    # next frame: the content of ref displaced by MV (-5, -3) (cur(y, x)
    # = ref(y - 3, x - 5)), faded by 0.6 gain and a -50 offset — a
    # strong luma shift that drags the unweighted SSD toward flat-field
    # matches
    shifted = base[8 - 3:8 - 3 + h, 8 - 5:8 - 5 + w]
    cur = np.clip(shifted * 0.6 - 50, 0, 255)
    refp = np.pad(ref.astype(np.int16), PAD, mode="edge")
    curp = cur.astype(np.int16)
    # analysed weights: w = round(0.6 * 64) at denom 6, offset -50
    wpv = (38, -50, 6)
    gx_w, gy_w = batched_me_grid(curp, refp, 32, 8, 1000, depth=8,
                                 wpv=wpv)
    gx_u, gy_u = batched_me_grid(curp, refp, 32, 8, 1000, depth=8)
    hits_w = int(((gx_w == -5) & (gy_w == -3)).sum())
    hits_u = int(((gx_u == -5) & (gy_u == -3)).sum())
    assert hits_w >= hits_u, (hits_w, hits_u)
    assert hits_w >= gx_w.size * 0.8, (hits_w, gx_w.size)


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="HM oracle decoder not built")
def test_weighted_search_improves_fade_rd_and_conforms(tmp_path):
    """End-to-end on a fade clip: weighted integer search (default)
    must cost no more bits than the unweighted search at equal QP (and
    typically fewer), and the stream still decodes bit-exact on HM."""
    rng = np.random.default_rng(11)
    w, h, frames = 192, 128, 4
    base = np.repeat(np.repeat(
        rng.integers(40, 215, (h // 4 + 16, w // 4 + 16)), 4, 0),
        4, 1).astype(np.float64)
    clip = tmp_path / "fade.yuv"
    with open(clip, "wb") as f:
        for t in range(frames):
            g = 1.0 - 0.18 * t
            win = base[8 + 2 * t:8 + 2 * t + h, 8 + 3 * t:8 + 3 * t + w]
            f.write(np.clip(win * g, 0, 255).astype(np.uint8).tobytes())
            c = np.full((h // 2, w // 2), 128, np.uint8)
            f.write(c.tobytes())
            f.write(c.tobytes())

    def enc(tag, env):
        bs = tmp_path / f"{tag}.bin"
        rec = tmp_path / f"{tag}.yuv"
        e = dict(os.environ, JAX_PLATFORMS="cpu", **env)
        out = subprocess.run(
            [sys.executable, "-m", "hevc_tpu.cli.encode", "-i", str(clip),
             "-wdt", str(w), "-hgt", str(h), "-f", str(frames), "-q",
             "30", "--IntraPeriod=-1", "--WeightedPredP=1",
             "--SearchRange=12", "-b", str(bs), "-o", str(rec)],
            capture_output=True, text=True, env=e,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert out.returncode == 0, out.stderr[-2000:]
        return bs, rec

    bs_w, rec_w = enc("wp", {})
    bs_u, _ = enc("nowp", {"HEVC_TPU_ME_WP": "0"})
    assert bs_w.stat().st_size <= bs_u.stat().st_size, (
        bs_w.stat().st_size, bs_u.stat().st_size)
    dec = tmp_path / "dec.yuv"
    out = subprocess.run([ORACLE, "-b", str(bs_w), "-o", str(dec)],
                         capture_output=True, text=True)
    assert out.returncode == 0
    assert out.stdout.count("(OK)") == frames, out.stdout[-1200:]
    assert rec_w.read_bytes() == dec.read_bytes()
