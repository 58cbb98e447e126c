"""Measure GAT resident serving passes at bench scale (PERF.md table).

Round-2 baseline on the same protocol: GAT 1-head 1.67 s, 4-head 4.65 s,
GCN 0.34-0.38 s.  Round-3 target (VERDICT #6): 1-head <= 2x GCN.

Usage: python scripts/measure_gat_serving.py [--scale 1.0] [--heads 1 4]
"""
from __future__ import annotations

import argparse
import gc
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--heads", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--gcn", action="store_true",
                    help="also measure the GCN reference pass")
    args = ap.parse_args()

    import jax

    from bench import _reddit_like_cached
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.train.inference import InferenceServer

    ds = _reddit_like_cached(args.scale)
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    print(f"V={adj.num_vertices} E={adj.num_edges}", flush=True)

    def measure(family, heads):
        params = init_model(jax.random.PRNGKey(0), family, [602, 128, 41])
        if family == "gat":
            # nonzero attention vectors: exercise real (non-uniform) scores
            attn = tuple(
                0.1 * jax.random.normal(jax.random.PRNGKey(i + 3), a.shape)
                for i, a in enumerate(params.attn))
            params = params._replace(attn=attn)
        srv = InferenceServer(params, family, adj, ds.features,
                              mean_style="fullbatch", heads=heads)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(srv.logprobs(as_numpy=False)[0, 0])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times[1:]))
        print(f"{family} heads={heads}: passes "
              f"{[round(t, 3) for t in times]} median-warm {med:.3f}s",
              flush=True)
        del srv
        gc.collect()
        return med

    if args.gcn:
        measure("gcn", 1)
    for h in args.heads:
        measure("gat", h)


if __name__ == "__main__":
    main()
