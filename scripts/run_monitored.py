#!/usr/bin/env python3
"""Monitored run: sample host CPU / RSS around a training command and
summarize windowed utilization — the TPU-native analog of the reference's
external utilization tooling (cpu.sh `top` loop + gpu.sh `nvidia-smi` loop
with ms timestamps, get_rate.py windowed means into rate_result.txt,
orchestrated by nto_run.sh).

Usage:
    python scripts/run_monitored.py --out-dir log/cora_gcn \\
        -- python -m sgnn_tpu configs/gcn_cora_sample.cfg

Artifacts in --out-dir (reference names kept where they map 1:1):
    cpu_two.csv      ts_ms,host_cpu_pct,proc_cpu_pct,proc_rss_mb  (0.5 s grid)
    output.log       the command's combined stdout+stderr
    rate_result.txt  windowed means over the command's lifetime + log tail

Design differences from the reference, by intent:
  - One self-contained sampler (reads /proc directly) instead of
    shell-wrapped `top`/`nvidia-smi` — no per-sample process spawn, and the
    sample grid stays honest under load.
  - No device-utilization column: there is no nvidia-smi analog for this
    TPU runtime, and the chip is single-client — a second process cannot
    attach to probe it.  HBM numbers come from the training process itself
    (utils/profiling.device_memory_stats, logged by the trainers), which is
    the accurate source anyway.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading
import time

_CLK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100
_PAGE = os.sysconf("SC_PAGE_SIZE") if hasattr(os, "sysconf") else 4096


def _host_cpu_ticks() -> tuple[int, int]:
    """(busy, total) jiffies across all cpus, from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    total = sum(vals)
    return total - idle, total


def _proc_ticks_rss(pid: int) -> tuple[int, int]:
    """(utime+stime jiffies, rss bytes) for pid (+ its tree is NOT walked:
    the training CLI is single-process; subprocess engines report their own
    numbers)."""
    with open(f"/proc/{pid}/stat") as f:
        # field 2 (comm) may contain spaces/parens — split after the last ')'
        rest = f.read().rsplit(")", 1)[1].split()
    utime, stime = int(rest[11]), int(rest[12])  # fields 14/15, 0-indexed
    rss_pages = int(rest[21])                    # field 24
    return utime + stime, rss_pages * _PAGE


class UtilizationSampler(threading.Thread):
    """0.5 s sampler writing `ts_ms,host_cpu_pct,proc_cpu_pct,proc_rss_mb`
    rows (the reference cpu.sh emitted `name,cpu%,ts_ms` from top at the
    same period)."""

    def __init__(self, pid: int, csv_path: str, interval_s: float = 0.5):
        super().__init__(daemon=True)
        self.pid, self.csv_path, self.interval = pid, csv_path, interval_s
        self.rows: list[tuple[int, float, float, float]] = []
        # NB: not `_stop` — threading.Thread owns that name internally
        self._halt = threading.Event()

    def run(self) -> None:
        busy0, tot0 = _host_cpu_ticks()
        try:
            p0, _ = _proc_ticks_rss(self.pid)
        except OSError:
            p0 = 0
        t0 = time.time()
        with open(self.csv_path, "w") as f:
            while not self._halt.wait(self.interval):
                try:
                    busy1, tot1 = _host_cpu_ticks()
                    p1, rss = _proc_ticks_rss(self.pid)
                except OSError:  # process exited between samples
                    break
                dt = max(time.time() - t0, 1e-6)
                dtot = max(tot1 - tot0, 1)
                # true 0-100 host utilization (busy fraction of ALL cpus);
                # proc_cpu_pct stays Irix-style (100% = one full core, can
                # exceed 100 on a multithreaded process) like top's default
                host = 100.0 * (busy1 - busy0) / dtot
                proc = 100.0 * (p1 - p0) / _CLK / dt
                row = (int(time.time() * 1000), host, proc, rss / 2**20)
                self.rows.append(row)
                f.write(f"{row[0]},{row[1]:.1f},{row[2]:.1f},{row[3]:.1f}\n")
                f.flush()
                busy0, tot0, p0, t0 = busy1, tot1, p1, time.time()

    def stop(self) -> None:
        self._halt.set()


def summarize(rows, start_ms: int, end_ms: int) -> dict:
    """Windowed means over [start_ms - 500, end_ms + 500] — the same ±500 ms
    widening get_rate.py applies before averaging."""
    sel = [r for r in rows if start_ms - 500 <= r[0] <= end_ms + 500]
    if not sel:
        # commands shorter than one sample interval: keep the report shape
        # stable so summarize_runs.py consumers always see the keys
        return {"samples": 0, "host_cpu_pct_mean": 0.0,
                "proc_cpu_pct_mean": 0.0, "proc_rss_mb_mean": 0.0,
                "proc_rss_mb_peak": 0.0}
    n = len(sel)
    return {
        "samples": n,
        "host_cpu_pct_mean": sum(r[1] for r in sel) / n,
        "proc_cpu_pct_mean": sum(r[2] for r in sel) / n,
        "proc_rss_mb_mean": sum(r[3] for r in sel) / n,
        "proc_rss_mb_peak": max(r[3] for r in sel),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="log/run")
    ap.add_argument("--interval", type=float, default=0.5)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run (prefix with --)")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: run_monitored.py [opts] -- cmd ...)")
    os.makedirs(args.out_dir, exist_ok=True)
    out_log = os.path.join(args.out_dir, "output.log")

    start_ms = int(time.time() * 1000)
    with open(out_log, "w") as lf:
        child = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
        sampler = UtilizationSampler(
            child.pid, os.path.join(args.out_dir, "cpu_two.csv"),
            args.interval)
        sampler.start()
        rc = child.wait()
        sampler.stop()
        sampler.join(timeout=5)
    end_ms = int(time.time() * 1000)

    stats = summarize(sampler.rows, start_ms, end_ms)
    rate_path = os.path.join(args.out_dir, "rate_result.txt")
    with open(rate_path, "w") as f:
        f.write(f"command: {' '.join(cmd)}\nexit: {rc}\n"
                f"window_ms: {start_ms}..{end_ms} "
                f"({(end_ms - start_ms) / 1000:.1f}s)\n")
        for k, v in stats.items():
            f.write(f"{k}: {v:.1f}\n" if isinstance(v, float) else
                    f"{k}: {v}\n")
        f.write("\n--- output.log tail ---\n")
        import collections

        with open(out_log) as lg:  # O(20)-memory tail; logs can be huge
            f.writelines(collections.deque(lg, maxlen=20))
    with open(rate_path) as f:
        sys.stdout.write(f.read())
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
