"""Round-2 GAT serving profile: candidate fast softmax formulation.

Follow-up to profile_gat_serving.py (assoc_scan segmented max never
finished compiling at E=11.9M — dropped).  Candidate formulation for the
sorted whole-graph GAT layer:

- per-dst broadcast of a [V] vector via scatter-ADD of telescoping deltas
  at host-known segment starts + cumsum (empty segments telescope
  correctly; any roundoff is per-segment CONSTANT, which softmax
  shift-invariance cancels exactly)
- exp without the per-segment max pass: scores clipped to +/-60 —
  overflow impossible (exp(60)=1.1e26, 11.9M-edge f32 sums stay < 1e33),
  underflow impossible (exp(-60)=8.8e-27 >> f32 min normal), exact
  equality with max-shifted softmax whenever |score| < 60 (softmax is
  shift-invariant; beyond 60 attention is one-hot-saturated anyway)
- normalizer z via cumsum + boundary diff (12.7 ms measured vs 111 ms
  segment_sum); the divide moves OFF the edge axis: h = spmm(x, u) / z
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
    ap.add_argument("--iters", type=int, default=4)
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

    counts = np.bincount(dstp, minlength=v)
    indptr = np.zeros(v + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    starts = indptr[:-1].astype(np.int32)  # [V] first-edge position
    ends = indptr[1:].astype(np.int32)     # [V] one-past-last position

    key = jax.random.PRNGKey(0)
    dev = {
        "src": jnp.asarray(srcp),
        "dst": jnp.asarray(dstp),
        "w": jnp.asarray(wp.astype(np.float32)),
        "tv": jax.random.normal(key, (v,), jnp.float32),
        "te": jax.random.normal(key, (e,), jnp.float32),
        "x": jax.random.normal(key, (v, 128), jnp.float32) * 0.1,
        "starts": jnp.asarray(starts),
        "ends": jnp.asarray(ends),
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
        float(run(*arrays))
        tcomp = time.perf_counter() - tc
        t0 = time.perf_counter()
        float(run(*arrays))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:36s} {dt * 1e3:9.2f} ms/iter   "
              f"(compile+first {tcomp:.1f}s)", flush=True)
        return dt

    eps = jnp.float32(1e-30)

    def dep(c, t):
        return t + c * eps

    def bcast(vals, st):
        """[V] -> [E] per-dst broadcast: telescoping scatter-add + cumsum."""
        delta = vals - jnp.concatenate(
            [jnp.zeros((1,), vals.dtype), vals[:-1]])
        d = jnp.zeros((e,), vals.dtype).at[st].add(
            delta, indices_are_sorted=True)
        return jnp.cumsum(d)

    timeit("bcast tv -> [E] (delta+cumsum)",
           lambda c, tv, st: jnp.sum(bcast(dep(c, tv), st)) * eps + c,
           (dev["tv"], dev["starts"]))

    def softmax_clip(c, te, st, en, vl):
        s = jnp.clip(dep(c, te), -60.0, 60.0)
        u = jnp.where(vl, jnp.exp(s), 0.0)
        cs = jnp.cumsum(u.astype(jnp.float32))
        csz = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        z = csz[en] - csz[st]
        return jnp.sum(u) * eps + jnp.sum(z) * eps + c

    timeit("clip-softmax stats (u,z)", softmax_clip,
           (dev["te"], dev["starts"], dev["ends"], valid))

    timeit("row gather x[src] F=128",
           lambda c, x, s: jnp.sum(dep(c, x)[s]) * eps + c,
           (dev["x"], dev["src"]))
    timeit("spmm_fwd_sorted F=128 (plan)",
           lambda c, x, s, d, w: jnp.sum(spmm_coo_fwd_sorted(
               dep(c, x), s, d, w, v, plan128)) * eps + c,
           (dev["x"], dev["src"], dev["dst"], dev["w"]))

    a_s = jax.random.normal(key, (128,), jnp.float32) * 0.1
    a_d = jax.random.normal(key, (128,), jnp.float32) * 0.1

    def gat_layer_shipped(c, x, s, d, vl, asv, adv):
        ht = dep(c, x)
        score = jax.nn.leaky_relu((ht @ asv)[s] + (ht @ adv)[d], 0.2)
        att = segment_softmax_coo(score, d, vl, v, indices_are_sorted=True)
        h = spmm_coo_fwd_sorted(ht, s, d, att, v, plan128)
        return jnp.sum(h) * eps + c

    timeit("GAT layer F=128 (as shipped)", gat_layer_shipped,
           (dev["x"], dev["src"], dev["dst"], valid, a_s, a_d))

    def gat_layer_fast(c, x, s, st, en, vl, asv, adv):
        ht = dep(c, x)
        ha_s = ht @ asv
        ha_d = ht @ adv
        score = jax.nn.leaky_relu(ha_s[s] + bcast(ha_d, st), 0.2)
        sc = jnp.clip(score, -60.0, 60.0)
        u = jnp.where(vl, jnp.exp(sc), 0.0)
        cs = jnp.cumsum(u.astype(jnp.float32))
        csz = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        z = (csz[en] - csz[st]).astype(ht.dtype)
        h = spmm_coo_fwd_sorted(ht, s, dev["dst"], u, v, plan128)
        h = h / jnp.maximum(z, jnp.finfo(z.dtype).tiny)[:, None]
        return jnp.sum(h) * eps + c

    timeit("GAT layer F=128 (fast candidate)", gat_layer_fast,
           (dev["x"], dev["src"], dev["starts"], dev["ends"], valid,
            a_s, a_d))

    # numerical agreement of the two layer formulations
    ht = dev["x"]
    score = jax.nn.leaky_relu((ht @ a_s)[dev["src"]]
                              + (ht @ a_d)[dev["dst"]], 0.2)
    att = segment_softmax_coo(score, dev["dst"], valid, v,
                              indices_are_sorted=True)
    h_ref = spmm_coo_fwd_sorted(ht, dev["src"], dev["dst"], att, v, plan128)

    sc2 = jnp.clip(jax.nn.leaky_relu(
        (ht @ a_s)[dev["src"]] + bcast(ht @ a_d, dev["starts"]), 0.2),
        -60.0, 60.0)
    u = jnp.where(valid, jnp.exp(sc2), 0.0)
    csz = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                           jnp.cumsum(u.astype(jnp.float32))])
    z = csz[dev["ends"]] - csz[dev["starts"]]
    h_new = spmm_coo_fwd_sorted(ht, dev["src"], dev["dst"], u, v, plan128)
    h_new = h_new / jnp.maximum(z, jnp.finfo(jnp.float32).tiny)[:, None]
    diff = float(jnp.max(jnp.abs(h_ref - h_new)))
    rel = diff / float(jnp.max(jnp.abs(h_ref)))
    print(f"max |h_ref - h_new| = {diff:.3e}  (rel {rel:.3e})", flush=True)


if __name__ == "__main__":
    main()
