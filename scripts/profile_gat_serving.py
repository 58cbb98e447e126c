"""Per-op profile of the single-head GAT serving layer at bench scale.

Times each [E]-sized op of the whole-graph GAT forward separately
(scan-amortized inside one jit program — one-shot dispatch on this
platform has 40-70 ms noise, docs/PERF.md) to locate the 1.68 s vs
GCN-0.38 s serving gap, plus candidate sorted-segment reformulations
(cumsum / segmented associative_scan over host-known CSC boundaries).

Usage: python scripts/profile_gat_serving.py [--scale 1.0] [--iters 8]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _reddit_like_cached
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.ops.segment import (
        SpmmPlanner, segment_softmax_coo, spmm_coo_fwd_sorted,
    )
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.train.inference import _padded_serving_coo

    ds = _reddit_like_cached(args.scale)
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    v = adj.num_vertices
    srcp, dstp, wp = _padded_serving_coo(adj, WeightKind.NONE, "plain")
    e = srcp.size
    print(f"V={v} E_pad={e}", flush=True)

    # host-side segment boundaries of the sorted dst (padding tail joins
    # segment v-1; its weights are 0 so sums are unaffected)
    counts = np.bincount(dstp, minlength=v)
    indptr = np.zeros(v + 1, np.int32)
    np.cumsum(counts, out=indptr[1:])
    starts = indptr[:-1].astype(np.int32)
    ends = indptr[1:].astype(np.int32)
    seg_start_flag = np.zeros(e, np.float32)
    seg_start_flag[starts[counts > 0]] = 1.0

    key = jax.random.PRNGKey(0)
    dev = {
        "src": jnp.asarray(srcp),
        "dst": jnp.asarray(dstp),
        "w": jnp.asarray(wp.astype(np.float32)),
        "tv": jax.random.normal(key, (v,), jnp.float32),
        "te": jax.random.normal(key, (e,), jnp.float32),
        "x": jax.random.normal(key, (v, 128), jnp.float32),
        "starts": jnp.asarray(starts),
        "ends": jnp.asarray(ends),
        "flag": jnp.asarray(seg_start_flag),
    }
    valid = dev["w"] != 0
    planner = SpmmPlanner(dstp, srcp, num_src=v, num_dst=v,
                          e_real=adj.num_edges)
    plan128 = planner.plan(128, 1)

    K = args.iters

    def timeit(name, fn, arrays):
        @jax.jit
        def run(*a):
            def body(c, _):
                return fn(c, *a), None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        tc = time.perf_counter()
        float(run(*arrays))  # compile + warm
        tcomp = time.perf_counter() - tc
        t0 = time.perf_counter()
        float(run(*arrays))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:34s} {dt * 1e3:9.2f} ms/iter   "
              f"(compile+first {tcomp:.1f}s)", flush=True)
        return dt

    eps = jnp.float32(1e-30)

    def dep(c, t):  # make input depend on carry so XLA can't hoist
        return t + c * eps

    # --- baselines ---
    timeit("sum[E] (baseline)", lambda c, te: jnp.sum(dep(c, te)) * eps + c,
           (dev["te"],))
    timeit("exp[E]", lambda c, te: jnp.sum(jnp.exp(dep(c, te))) * eps + c,
           (dev["te"],))

    # --- scalar gathers ---
    timeit("gather tv[src] (random)",
           lambda c, tv, s: jnp.sum(dep(c, tv)[s]) * eps + c,
           (dev["tv"], dev["src"]))
    timeit("gather tv[dst] (sorted)",
           lambda c, tv, d: jnp.sum(dep(c, tv)[d]) * eps + c,
           (dev["tv"], dev["dst"]))

    # --- segment reductions (scatter-based) ---
    timeit("segment_max sorted [E]->[V]",
           lambda c, te, d: jnp.sum(jax.ops.segment_max(
               dep(c, te), d, num_segments=v,
               indices_are_sorted=True)) * eps + c,
           (dev["te"], dev["dst"]))
    timeit("segment_sum sorted [E]->[V]",
           lambda c, te, d: jnp.sum(jax.ops.segment_sum(
               dep(c, te), d, num_segments=v,
               indices_are_sorted=True)) * eps + c,
           (dev["te"], dev["dst"]))

    # --- full softmax as shipped ---
    timeit("segment_softmax_coo (full)",
           lambda c, te, d, vl: jnp.sum(segment_softmax_coo(
               dep(c, te), d, vl, v, indices_are_sorted=True)) * eps + c,
           (dev["te"], dev["dst"], valid))

    # --- candidate reformulations ---
    def segsum_cumsum(c, te, st, en):
        cs = jnp.cumsum(dep(c, te))
        csz = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        z = csz[en] - csz[st]
        return jnp.sum(z) * eps + c

    timeit("segsum via cumsum+boundary", segsum_cumsum,
           (dev["te"], dev["starts"], dev["ends"]))

    def segmax_scan(c, te, fl, en):
        tv = dep(c, te)
        neg = jnp.finfo(tv.dtype).min

        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa + fb - fa * fb, jnp.where(fb > 0, vb,
                                                jnp.maximum(va, vb))

        _, m = lax.associative_scan(comb, (fl, tv))
        mz = jnp.concatenate([jnp.full((1,), neg, m.dtype), m])
        return jnp.sum(mz[en]) * eps + c

    timeit("segmax via assoc_scan+boundary", segmax_scan,
           (dev["te"], dev["flag"], dev["ends"]))

    # --- GCN reference costs ---
    timeit("row gather x[src] F=128",
           lambda c, x, s: jnp.sum(dep(c, x)[s]) * eps + c,
           (dev["x"], dev["src"]))
    timeit("spmm_fwd_sorted F=128 (plan)",
           lambda c, x, s, d, w: jnp.sum(spmm_coo_fwd_sorted(
               dep(c, x), s, d, w, v, plan128)) * eps + c,
           (dev["x"], dev["src"], dev["dst"], dev["w"]))

    # --- one full GAT serving layer as shipped (128 -> 128, 1 head) ---
    a_s = jax.random.normal(key, (128,), jnp.float32)
    a_d = jax.random.normal(key, (128,), jnp.float32)

    def gat_layer(c, x, s, d, vl, asv, adv):
        ht = dep(c, x)
        score = jax.nn.leaky_relu((ht @ asv)[s] + (ht @ adv)[d], 0.2)
        att = segment_softmax_coo(score, d, vl, v, indices_are_sorted=True)
        h = spmm_coo_fwd_sorted(ht, s, d, att, v, plan128)
        return jnp.sum(h) * eps + c

    timeit("GAT layer F=128 (as shipped)", gat_layer,
           (dev["x"], dev["src"], dev["dst"], valid, a_s, a_d))


if __name__ == "__main__":
    main()
