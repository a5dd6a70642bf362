"""Per-stage wall-clock timers for the encoder pipeline.

Parity: the reference's only profiling is a clock() around the slice
encode printed as `[ET ..]` (TEncGOP.cpp:1052,2124). Here every pipeline
stage (device ME, native engine, entropy coding, loop filters) reports
separately so the device/host split is visible (bench.py records it).

Timers are disabled by default (zero overhead beyond one branch); the
benchmark enables them.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timers:
    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self.enabled = False

    @contextlib.contextmanager
    def section(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()

    def summary(self) -> dict:
        return {k: round(v, 4) for k, v in sorted(self.total.items())}


timers = Timers()
