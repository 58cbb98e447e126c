"""Profiling & observability.

Reference (SURVEY.md §5): manual get_time() accumulators per phase, cpu.sh /
gpu.sh utilization sampling, cache-hit counters (Cuda_Stream::total_*),
printed at end of run().  TPU equivalents here:
  - PhaseTimer (utils/timing.py) for host-side phase accumulation,
  - `trace()` → jax.profiler traces viewable in TensorBoard/XProf,
  - Counters — named monotonic counters (cache hits, sampled edges,
    transferred bytes) with a one-line summary,
  - `device_memory_stats()` — HBM usage probe (reference print_cuda_use /
    get_gpu_idle_mem_pipe, GCN_SAMPLE_PD_CACHE.hpp:1117).
"""

from __future__ import annotations

import collections
import contextlib
from typing import Dict, Iterator, Optional

import jax

from .logging import get_logger

log = get_logger("sgnn.prof")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sgnn_trace") -> Iterator[None]:
    """jax.profiler trace around a code region (open in xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


class Counters:
    """Named monotonic counters (reference Cuda_Stream::total_* parity)."""

    def __init__(self) -> None:
        self._c: Dict[str, int] = collections.defaultdict(int)

    def add(self, name: str, value: int = 1) -> None:
        self._c[name] += int(value)

    def get(self, name: str) -> int:
        return self._c[name]

    def ratio(self, num: str, den: str) -> float:
        d = self._c[den]
        return self._c[num] / d if d else 0.0

    def summary(self) -> str:
        return " | ".join(f"{k}={v}" for k, v in sorted(self._c.items()))


def device_memory_stats(device=None) -> Optional[dict]:
    """Per-device memory stats (bytes_in_use / bytes_limit) when available."""
    dev = device or jax.devices()[0]
    try:
        return dev.memory_stats()
    except Exception:
        return None


def log_memory(prefix: str = "") -> None:
    stats = device_memory_stats()
    if stats:
        used = stats.get("bytes_in_use", 0) / (1 << 30)
        limit = stats.get("bytes_limit", 0) / (1 << 30)
        log.info("%sHBM: %.2f / %.2f GiB in use", prefix, used, limit)
