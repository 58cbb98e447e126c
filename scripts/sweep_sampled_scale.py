"""Sampled-path scale sweep (VERDICT r3 #4): device-sampled SAGE 25-10
throughput at 1x/2x/4x graph scale, optionally with REORDER renumbering.

r2 measured 11.5 -> 9.5 -> 8.1M edges/s over the sweep (throughput decay
attributed to gather-table growth past cache reach); r3's degree-aware
pads were only benched at scale 1.  This reruns the sweep on the current
code and measures the reorder lever at each scale.

Run: python scripts/sweep_sampled_scale.py [--scales 1 2 4] [--reorder degree]
"""
import sys; sys.path.insert(0, ".")
import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/sgnn_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from bench import bench_reddit_sage, log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=float, nargs="+", default=[1, 2, 4])
    ap.add_argument("--reorder", default="", help="also run with this order")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()
    out = {}
    for s in args.scales:
        row = {}
        for ro in [""] + ([args.reorder] if args.reorder else []):
            r = bench_reddit_sage(s, args.epochs, 10000, dtype="bfloat16",
                                  src_pad_factor=1.2, reorder=ro)
            key = ro or "baseline"
            row[key] = {"edges_per_sec": round(r["edges_per_sec"], 1),
                        "epoch_time_s": round(r["epoch_time"], 3),
                        "train_acc": round(r["final_train_acc"], 4),
                        "roofline": r.get("roofline", {})}
            log(f"[sweep] scale {s} {key}: "
                f"{r['edges_per_sec']/1e6:.2f}M edges/s")
        out[str(s)] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
