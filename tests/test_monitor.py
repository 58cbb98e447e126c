"""Utilization-monitor parity (reference cpu.sh/gpu.sh + get_rate.py +
nto_run.sh: background samplers with ms timestamps, windowed means into
rate_result.txt)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SCRIPT = os.path.join(REPO, "scripts", "run_monitored.py")

BURN = ("import time\n"
        "t0 = time.time()\n"
        "while time.time() - t0 < 1.6: sum(i*i for i in range(2000))\n"
        "print('burn done')\n")


def test_run_monitored_samples_and_summarizes(tmp_path):
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--out-dir", str(out), "--interval", "0.2",
         "--", sys.executable, "-c", BURN],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr

    # cpu_two.csv: ts_ms,host%,proc%,rss_mb rows on the sample grid
    rows = [ln.split(",") for ln in
            (out / "cpu_two.csv").read_text().strip().splitlines()]
    assert len(rows) >= 3, rows
    ncpu = os.cpu_count() or 1
    for ts, host, proc, rss in rows:
        assert int(ts) > 1_700_000_000_000          # ms epoch timestamp
        # host is a TRUE percentage (busy fraction of all cpus); proc stays
        # Irix-style (100% = one core) like top's default
        assert 0.0 <= float(host) <= 100.0 + 1
        assert 0.0 <= float(proc) <= 100.0 * ncpu + 1
        assert float(rss) > 1.0                      # a live python RSS

    # rate_result.txt: windowed means + the output.log tail
    rate = (out / "rate_result.txt").read_text()
    assert "proc_cpu_pct_mean" in rate and "burn done" in rate
    # the busy loop should register real CPU on the child
    proc_mean = float(
        [ln for ln in rate.splitlines()
         if ln.startswith("proc_cpu_pct_mean")][0].split(":")[1])
    assert proc_mean > 20.0, rate
    assert (out / "output.log").read_text().strip().endswith("burn done")


def test_run_monitored_propagates_exit_code(tmp_path):
    r = subprocess.run(
        [sys.executable, SCRIPT, "--out-dir", str(tmp_path / "f"), "--",
         sys.executable, "-c", "import sys; sys.exit(3)"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 3
