"""Collect `--report-out` run JSONs into one CSV.

The reference drives runs through nto_run.sh and then scrapes epoch times
back out of text logs with get_log_run_time.py / get_rate.py; here every
run can emit a structured report (`python -m sgnn_tpu cfg --report-out
r.json`) and this script tabulates any number of them:

    python scripts/summarize_runs.py runs/*.json [-o epoch_time.csv]
"""
import argparse
import csv
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("reports", nargs="+", help="run-report JSON files")
    ap.add_argument("-o", "--out", default=None,
                    help="CSV path (default: stdout)")
    args = ap.parse_args(argv)

    rows = []
    for path in args.reports:
        with open(path) as f:
            r = json.load(f)
        rows.append({
            "report": path,
            "algorithm": r.get("algorithm", ""),
            "config": r.get("config", ""),
            "epochs": len(r.get("epoch_times", [])),
            "avg_epoch_time_s": round(r.get("avg_epoch_time", 0.0), 6),
            "final_train_acc": round(r["train_acc"][-1], 6)
            if r.get("train_acc") else "",
            "final_val_acc": round(r["val_acc"][-1], 6)
            if r.get("val_acc") else "",
            "final_test_acc": round(r["test_acc"][-1], 6)
            if r.get("test_acc") else "",
            "final_loss": round(r["losses"][-1], 6)
            if r.get("losses") else "",
            "edges_per_epoch": r["edges_per_epoch"][-1]
            if r.get("edges_per_epoch") else "",
        })

    out = open(args.out, "w", newline="") if args.out else sys.stdout
    try:
        w = csv.DictWriter(out, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    finally:
        if args.out:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
