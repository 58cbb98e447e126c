"""Per-phase wall-clock accumulators.

Reference: get_time() deltas accumulated per phase all over the engines
(e.g. sample_time/transfer_feature_time/training_time,
toolkits/GCN_SAMPLE_PD_CACHE.hpp:120-147) and printed at end of run().
Same idea, as a reusable helper; `jax.block_until_ready` is the caller's
responsibility when timing device work.
"""

from __future__ import annotations

import collections
import threading
import time
from contextlib import contextmanager
from typing import Dict


class Timer:
    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def reset(self) -> float:
        now = time.perf_counter()
        dt, self.t0 = now - self.t0, now
        return dt


class PhaseTimer:
    """Accumulate named phase durations: `with pt.phase("sample"): ...`."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        # phases run on sampler worker threads too (parallel/dp.py)
        self._lock = threading.Lock()

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        with self._lock:
            self.totals[name] += seconds
            self.counts[name] += 1

    def summary(self) -> str:
        items = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return " | ".join(f"{k}={v:.4f}s(n={self.counts[k]})" for k, v in items)
