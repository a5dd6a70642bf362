#!/usr/bin/env python
"""Measure live HM-16.4 anchors for every bench config and write
HM_ANCHORS.json (checked in, reused by bench.py).

The reference publishes no numbers (BASELINE.md), so anchors are
established empirically: run the unmodified HM encoder (built by
tools/build_reference_oracle.sh) on the exact clips/dims/QP bench.py
uses, derive steady-state wall-clock fps with the same warmup policy
(reference TEncGOP.cpp:2124 [ET] per-POC timing), and record them keyed
by (config, dims) plus a host fingerprint so a different host class is
detectable.

Usage: python tools/measure_hm_anchors.py [--only NAME]
"""
import json
import os
import platform
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def host_fingerprint():
    model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for ln in fh:
                if ln.startswith("model name"):
                    model = ln.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpu": model, "nproc": os.cpu_count(),
            "machine": platform.machine()}


def main():
    import bench
    from make_test_yuv import write_clip
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    path = os.path.join(REPO, "HM_ANCHORS.json")
    anchors = {}
    if os.path.exists(path):
        with open(path) as fh:
            anchors = json.load(fh)
    anchors.setdefault("host", host_fingerprint())
    rows = [(name, cfgf, w, h, hm_frames, qp, bd, hm_warm)
            for (name, cfgf, w, h, _f, qp, bd, _w2, hm_frames, hm_warm)
            in bench.CONFIGS]
    rows.append(("headline_1080p_ldp", "encoder_lowdelay_P_main.cfg",
                 1920, 1080, 8, 32, 8, 4))
    with tempfile.TemporaryDirectory() as tmp:
        for name, cfgf, w, h, frames, qp, bd, warm in rows:
            if only and name != only:
                continue
            clip = os.path.join(tmp, f"{name}.yuv")
            write_clip(clip, w, h, frames, bd)
            cfg_path = os.path.join(bench.CFGDIR, cfgf)
            print(f"measuring {name} ({w}x{h}x{frames}@qp{qp}) ...",
                  flush=True)
            fps = bench.measure_hm(cfg_path, clip, w, h, frames, qp, bd,
                                   warmup=warm)
            if fps is None:
                print(f"  {name}: HM run failed/timed out, skipped")
                continue
            anchors[name] = {"fps": round(fps, 5),
                             "dims": f"{w}x{h}x{frames}@qp{qp}"}
            print(f"  {name}: {fps:.5f} fps", flush=True)
            with open(path, "w") as fh:
                json.dump(anchors, fh, indent=1)
    print(json.dumps(anchors, indent=1))


if __name__ == "__main__":
    main()
