#!/usr/bin/env python
"""Benchmark: the five BASELINE.json configs + per-stage time split.

Prints ONE JSON line (the north-star metric: 1080p lowdelay-P encode fps
vs the HM-16.4 single-thread anchor) on stdout — *immediately after the
headline config is measured*, before the rest of the suite, so a driver
timeout can never leave the round without a parsable number. The full
per-config table — fps, HM anchor fps, bitrate, PSNR, and the
device/host stage split — is flushed to BENCH_ALL.json incrementally.

Baseline provenance (three anchor tiers, most→least trusted):
  live      — HM-16.4 oracle re-measured in this run (only when the
              global wall budget allows; sanity-gated to within 2x of
              the recorded host-class value)
  cached    — HM_ANCHORS.json, live measurements from an earlier run on
              this host class (checked in; dims must match)
  recorded  — constants from BASELINE.md for this host class
The published ratio (vs_baseline) is the CONSERVATIVE one: our fps
divided by the FASTEST accepted anchor. Per-tier ratios are reported
alongside in BENCH_ALL.json.

The whole suite runs under a global wall budget
(HEVC_TPU_BENCH_BUDGET, default 540 s): once spent, remaining configs
are skipped (recorded as such) rather than timing out the driver.

Steady-state excludes warmup frames (one-time device kernel compilation
/ persistent-cache population is not a per-frame cost).
"""
import contextlib
import io
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

HM_ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
CFGDIR = "/root/reference/cfg"

T0 = time.time()
BUDGET = float(os.environ.get("HEVC_TPU_BENCH_BUDGET", "540"))


def remaining() -> float:
    return BUDGET - (time.time() - T0)


# name, cfg, W, H, frames, QP, bit depth, our warmup, HM frames, HM warmup
# warmup must cover every reference-count shape the GOP structure will
# reach (nref grows 1->4 over the first LDP frames; each pad group is a
# distinct XLA compile) so one-time compiles stay out of the steady rate.
# The HM anchor uses the SAME steady-state definition (its per-POC [ET]
# entries past the first GOP / IDR burst) — never a 2-sample ratio
# (reference TEncGOP.cpp:2124 [ET] semantics; HM buffers a GOP and its
# per-POC times spike at burst boundaries, so warmup spans >= IDR + one
# full GOP for the GOP-structured configs).
CONFIGS = [
    ("intra_main", "encoder_intra_main.cfg", 416, 240, 8, 32, 8, 1, 8, 1),
    ("lowdelay_P_main", "encoder_lowdelay_P_main.cfg", 832, 480, 10, 32, 8,
     5, 8, 4),
    # randomaccess compresses in GOP-of-8 bursts: warmup 9 = IDR + the
    # whole first GOP (where every hierarchy shape compiles); the
    # measured 8 inputs are exactly the second GOP — on both sides
    ("randomaccess_main", "encoder_randomaccess_main.cfg", 832, 480, 17, 32,
     8, 9, 17, 9),
    ("randomaccess_main10", "encoder_randomaccess_main10.cfg", 832, 480, 17,
     32, 10, 9, 17, 9),
    ("intra_high_throughput_rext", "encoder_intra_high_throughput_rext.cfg",
     416, 240, 6, 32, 8, 1, 6, 1),
]
# expected wall cost of each config on this host class (warm compiles +
# program loads through the device tunnel dominate) — a config only
# STARTS if that much budget is left, since a started config cannot be
# interrupted (the round-3 driver artifact timed out exactly this way)
# re-measured round 5 on the warm checked-in cache (whole suite 356 s):
# per-config wall incl. program loads; main10's old 220 s estimate was
# skipping it even when the suite had 250 s to spare
CONFIG_COST_S = {"intra_main": 45, "lowdelay_P_main": 60,
                 "randomaccess_main": 80, "randomaccess_main10": 120,
                 "intra_high_throughput_rext": 60}
# recorded HM anchors (fps) for this host class when the oracle is absent
# randomaccess anchors measured live round 5 (17-frame 832x480 run, CPU
# seconds from HM's per-POC [ET] lines): HM's hierarchical-B search runs
# ~115 s/frame on this 1-core host class — the earlier 0.10 guess was
# 10x optimistic and is corrected to the measurement (main10 scaled by
# the same factor pending its own live run)
HM_FALLBACK = {"intra_main": 2.17, "lowdelay_P_main": 0.141,
               "randomaccess_main": 0.00968,
               # main10's cached anchor (0.0497, an earlier round's
               # measurement) is inconsistent with the RA-main
               # measurement; the FASTER value is kept as recorded so
               # the published ratio stays conservative
               "randomaccess_main10": 0.04,
               "intra_high_throughput_rext": 1.5,
               "headline_1080p_ldp": 0.044,
               "headline_416x240_ldp": 0.56}

W, H, FRAMES, QP = 1920, 1080, 10, 32
WARMUP = 5


def load_cached_anchors():
    path = os.path.join(REPO, "HM_ANCHORS.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


CACHED = load_cached_anchors()


def measure_ours(cfg_path, clip, w, h, frames, qp, warmup):
    from hevc_tpu.encoder.top import EncoderTop
    from hevc_tpu.io.cfg import parse_cli
    from hevc_tpu.io.yuv import YuvReader
    from hevc_tpu.utils.timing import timers
    cfg = parse_cli(["-c", cfg_path, "-i", clip, "-wdt", str(w),
                     "-hgt", str(h), "-f", str(frames), "-q", str(qp),
                     "-b", "/dev/null"])
    rd = YuvReader(clip, w, h, file_bit_depth=cfg.input_bit_depth,
                   internal_bit_depth=cfg.internal_bit_depth)
    warmup = max(0, min(warmup, frames - 1))  # >= 1 measured frame
    enc = EncoderTop(cfg)
    # pre-load every ME program variant (one per padded ref count) so
    # the one-time device program-load stalls cannot land inside the
    # steady-state measurement window
    enc.warm_device_programs()
    t_start = None
    done = 0
    # lookahead pipeline (same as the CLI): upcoming frames' device work
    # (intra prescreen / integer ME) dispatches ahead and computes under
    # host work. All-intra frames are fully independent on the device,
    # so a deeper queue keeps the device pipeline saturated; inter stays
    # at one frame (ME needs the previous frame's final references).
    from collections import deque
    deep = cfg.intra_period == 1  # all-intra: device-independent frames
    look = 3 if deep else 1
    buf = deque()
    nread = 0

    def pull():
        nonlocal nread
        if nread < frames:
            p = rd.read()
            nread += 1
            if p is not None:
                if deep:
                    enc.prefetch_frame(p)
                buf.append(p)

    for _ in range(1 + look):
        pull()
    for i in range(frames):
        if not buf:
            break
        if i == warmup:
            timers.reset()
            timers.enabled = True
            t_start = time.time()
            from hevc_tpu.entropy.cabac import engine_frame_stats
            efs0 = engine_frame_stats()
        planes = buf.popleft()
        pull()
        if not deep and buf:
            # inter: the ME prefetch plans exactly ONE submission ahead
            # (it must pair the next frame's planes with the next frame's
            # reference plan), so prefetch the immediate next frame only
            enc.prefetch_frame(buf[0])
        enc.encode_frame(planes)
        if t_start is not None:
            done += 1
    enc.flush()
    elapsed = time.time() - t_start if t_start else 1e9
    timers.enabled = False
    bits = sum(s["bits"] for s in enc.stats)
    psnr = sum(s["psnr"][0] for s in enc.stats) / max(1, len(enc.stats))
    stages = timers.summary()
    if t_start is not None:
        # engine wall vs process-CPU over the measured window: wall >>
        # cpu flags scheduler starvation / wavefront coordination rather
        # than real compute (see cabac.engine_frame_stats)
        from hevc_tpu.entropy.cabac import engine_frame_stats
        efs1 = engine_frame_stats()
        stages["engine_cpu"] = round(
            efs1["engine_cpu_s"] - efs0["engine_cpu_s"], 4)
    return {"fps": round(done / max(elapsed, 1e-9), 4),
            "frames_measured": done,
            "total_bits": bits, "mean_y_psnr": round(psnr, 3),
            "stage_seconds": stages}


def measure_hm(cfg_path, clip, w, h, frames, qp, bd, warmup=1,
               timeout=None):
    """HM steady-state fps in WALL-CLOCK terms.

    HM's [ET] per-POC entries and its Total Time are clock() CPU seconds
    (reference TEncGOP.cpp:2124, encmain.cpp:98-101) while measure_ours
    reports wall-clock fps — on a throttled/contended host CPU seconds
    run faster than wall seconds, which would flatter the HM anchor.
    The steady-state rate is therefore derived from the CPU samples
    (they alone carry per-frame resolution for warmup exclusion) and
    scaled by the run's measured cpu/wall factor so both sides of the
    vs_hm ratio are wall-clock."""
    if not os.path.exists(HM_ENC):
        return None
    if timeout is None:
        timeout = float(os.environ.get("HEVC_TPU_HM_TIMEOUT", "1800"))
    if timeout <= 0:
        return None
    with tempfile.TemporaryDirectory() as tmp:
        args = [HM_ENC, "-c", cfg_path, "-i", clip, "-wdt", str(w),
                "-hgt", str(h), "-f", str(frames), "-fr", "30",
                "-q", str(qp), "-b", os.path.join(tmp, "hm.bin")]
        t0 = time.time()
        try:
            # bounded: a pathologically slow anchor (loaded host, heavy
            # RA hierarchy) falls back to the cached/recorded constant
            # instead of stalling the whole suite
            out = subprocess.run(args, capture_output=True, text=True,
                                 timeout=timeout)
        except subprocess.TimeoutExpired:
            return None
        wall = time.time() - t0
        if out.returncode != 0:
            return None
        ets = [float(m) for m in re.findall(r"\[ET\s+([0-9.]+)\s*\]",
                                            out.stdout)]
        tot = re.search(r"Total Time:\s+([0-9.]+)\s+sec", out.stdout)
    # uniform-slowdown wall normalization: cpu_total/wall <= 1 on a
    # throttled host, ~1 on an idle one
    cpu_total = float(tot.group(1)) if tot else sum(ets)
    wall_factor = min(1.0, cpu_total / wall) if wall > 0 and cpu_total > 0 \
        else 1.0
    steady = ets[warmup:] if len(ets) > warmup else ets
    # HM prints [ET] in whole seconds: for fast configs (<~2 s/frame) the
    # samples quantize to 0/1 and a per-frame mean is meaningless (8 intra
    # frames at 0.46 s print as seven 0s and one 1 -> a bogus "7.0 fps").
    # Use the encoder's own Total Time when the per-frame samples are too
    # coarse to trust (steady mean under 5 s/frame).
    if steady and sum(steady) >= 5.0 * len(steady):
        return wall_factor * len(steady) / sum(steady)
    if tot and float(tot.group(1)) > 0:
        return wall_factor * len(ets) / float(tot.group(1))
    if not steady or sum(steady) == 0:
        return None
    return wall_factor * len(steady) / sum(steady)


def hm_anchor(name, cfg_path, clip, w, h, frames, qp, bd, warmup,
              dims, allow_live=True):
    """Anchor fps + provenance + per-tier table.

    Tiers: live (this run, budget permitting), cached (HM_ANCHORS.json
    from an earlier run on this host class, dims-matched), recorded
    (BASELINE.md constant). A live sample deviating >2x from the
    recorded host-class value means the measurement did not reach
    steady state (or the host was loaded) — it is rejected rather than
    published. The returned anchor is the CONSERVATIVE (fastest) of the
    accepted tiers, so vs_baseline can only be understated."""
    rec = HM_FALLBACK.get(name)
    tiers = {}
    if rec:
        tiers["recorded"] = rec
    ca = CACHED.get(name)
    if isinstance(ca, dict) and ca.get("dims") == dims and ca.get("fps"):
        cached = float(ca["fps"])
        if rec is None or (rec / 2.0 <= cached <= rec * 2.0):
            tiers["cached"] = cached
    live = None
    if allow_live:
        # leave headroom for the rest of the suite: never let one HM run
        # eat more than half the remaining budget
        t_cap = min(remaining() * 0.5,
                    float(os.environ.get("HEVC_TPU_HM_TIMEOUT", "1800")))
        if t_cap > 10:
            live = measure_hm(cfg_path, clip, w, h, frames, qp, bd,
                              warmup, timeout=t_cap)
    if live is not None:
        if rec and not (rec / 2.0 <= live <= rec * 2.0):
            tiers["live_rejected"] = round(live, 5)
        else:
            tiers["live"] = live
    if not tiers:
        return None, "none", {}
    # conservative: fastest accepted anchor
    usable = {k: v for k, v in tiers.items() if k != "live_rejected"}
    prov = max(usable, key=usable.get)
    return usable[prov], prov, tiers


def _device_alive(timeout_s: float = 120.0) -> bool:
    """Probe the accelerator with a trivial op under a watchdog — a dead
    device tunnel hangs forever inside libtpu, so probe in a subprocess
    we can kill."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.ones((8, 8)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _attach_anchor(r, name, cfg_path, clip, w, h, frames, qp, bd, warmup,
                   allow_live):
    dims = f"{w}x{h}x{frames}@qp{qp}"
    base, prov, tiers = hm_anchor(name, cfg_path, clip, w, h, frames, qp,
                                  bd, warmup, dims, allow_live=allow_live)
    if base:
        r["hm_fps"] = round(base, 4)
        r["hm_anchor"] = prov
        r["vs_hm"] = round(r["fps"] / base, 2)
        for tier, fps in tiers.items():
            if tier != "live_rejected" and fps:
                r[f"vs_hm_{tier}"] = round(r["fps"] / fps, 2)
            else:
                r["hm_live_rejected_fps"] = fps
    return r


def _flush(results):
    with open(os.path.join(REPO, "BENCH_ALL.json"), "w") as fh:
        json.dump(results, fh, indent=1)


def main():
    from make_test_yuv import write_clip
    global W, H, FRAMES, WARMUP
    results = {"budget_s": BUDGET}
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and not _device_alive():
        # device tunnel dead: record the fact and measure on CPU with a
        # reduced headline so the benchmark still completes
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["HEVC_TPU_PLATFORM"] = "cpu"
        results["device_unavailable"] = True
        W, H, FRAMES, WARMUP = 416, 240, 4, 1
    with tempfile.TemporaryDirectory() as tmp:
        # ---- north-star FIRST: 1080p lowdelay-P ----
        # The one-line stdout artifact is printed as soon as this config
        # lands so a driver kill mid-suite still leaves the number.
        # (on device fallback W/H were reduced above: anchor against HM
        # at the SAME dims so the ratio always compares like with like)
        hl_anchor_name = ("headline_1080p_ldp" if (W, H) == (1920, 1080)
                          else "headline_416x240_ldp")
        clip = os.path.join(tmp, "hl.yuv")
        write_clip(clip, W, H, FRAMES)
        cfg_path = os.path.join(CFGDIR, "encoder_lowdelay_P_main.cfg")
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                r = measure_ours(cfg_path, clip, W, H, FRAMES, QP, WARMUP)
                # never live-measure the 1080p anchor inline (it alone is
                # ~10+ min of HM time): cached/recorded tiers only
                _attach_anchor(r, hl_anchor_name, cfg_path, clip, W, H, 8,
                               QP, 8, 4, allow_live=False)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}", "fps": 0.0,
                 "hm_fps": HM_FALLBACK[hl_anchor_name]}
        r["dims"] = f"{W}x{H}x{FRAMES}@qp{QP}"
        if results.get("device_unavailable"):
            r["device_unavailable"] = True
        results["headline_1080p_ldp"] = r
        _flush(results)
        line = {
            "metric": "lowdelayP_encode_fps_1080p",
            "value": r.get("fps", 0.0),
            "unit": "frames/sec",
            "vs_baseline": round(r.get("fps", 0.0) /
                                 r.get("hm_fps",
                                       HM_FALLBACK[hl_anchor_name]), 4),
        }
        if r.get("device_unavailable"):
            # CPU-fallback run at reduced dims: say so in the one-line
            # JSON so the number can never be read as a 1080p TPU result
            line["device_unavailable"] = True
            line["dims"] = r["dims"]
        print(json.dumps(line), flush=True)

        # ---- the five BASELINE.json configs (budget-gated) ----
        for (name, cfgf, w, h, frames, qp, bd, warm, hm_frames,
             hm_warm) in CONFIGS:
            if results.get("device_unavailable"):
                # CPU fallback: the frame-batched device search runs
                # seconds-per-frame on the host numpy twins — the suite
                # cannot finish in budget, and the numbers would not be
                # TPU numbers anyway. The reduced headline above is the
                # whole fallback artifact.
                results[name] = {"skipped": "device_unavailable"}
                _flush(results)
                continue
            if remaining() < CONFIG_COST_S.get(name, 120):
                results[name] = {"skipped": "budget"}
                _flush(results)
                continue
            clip = os.path.join(tmp, f"{name}.yuv")
            write_clip(clip, w, h, frames, bd)
            cfg_path = os.path.join(CFGDIR, cfgf)
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf):
                    r = measure_ours(cfg_path, clip, w, h, frames, qp, warm)
                    # live HM only while the wall budget allows it; the
                    # cached tier (HM_ANCHORS.json) is the usual source
                    allow_live = (remaining() > 120 and
                                  f"{name}" not in CACHED)
                    _attach_anchor(r, name, cfg_path, clip, w, h,
                                   hm_frames, qp, bd, hm_warm, allow_live)
                r["dims"] = f"{w}x{h}x{frames}@qp{qp}"
                results[name] = r
            except Exception as e:  # record, don't abort the suite
                results[name] = {"error": f"{type(e).__name__}: {e}"}
            _flush(results)

    results["wall_s"] = round(time.time() - T0, 1)
    _flush(results)
    print(json.dumps(results, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
