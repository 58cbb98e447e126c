"""Does per-element gather cost grow with table size?  (scale-4 residual)

The r3 scale sweep shows serving cost growing ~3.7x for 2x edges at the
scale-2 → scale-4 step; if the [V, F] row-gather's per-element cost rises
with V (page/TLB effects), window-localized source gathers could help —
if it is flat, the residual lives elsewhere.

Usage: python scripts/profile_gather_scale.py [--scales 1.0 2.0 4.0]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[1.0, 2.0, 4.0])
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _reddit_like_cached
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.train.inference import _padded_serving_coo

    K = args.iters
    eps = jnp.float32(1e-30)

    for scale in args.scales:
        ds = _reddit_like_cached(scale)
        adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
        v = adj.num_vertices
        srcp, dstp, wp = _padded_serving_coo(adj, WeightKind.GCN, "plain")
        e = srcp.size
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (v, 128), jnp.float32)
        tv = jax.random.normal(key, (v,), jnp.float32)
        src = jnp.asarray(srcp)
        dst = jnp.asarray(dstp)
        w = jnp.asarray(wp.astype(np.float32))

        def timeit(name, fn, arrays):
            @jax.jit
            def run(*a):
                def body(c, _):
                    return fn(c, *a), None
                c, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
                return c

            float(run(*arrays))
            t0 = time.perf_counter()
            float(run(*arrays))
            dt = (time.perf_counter() - t0) / K
            print(f"scale {scale}: {name:30s} {dt * 1e3:9.2f} ms "
                  f"({dt / e * 1e9:.2f} ns/edge)", flush=True)

        timeit("scalar gather tv[src]",
               lambda c, t, s: jnp.sum((t + c * eps)[s]) * eps + c,
               (tv, src))

        # chunked row gather: sum each [2M, 128] chunk inside a scan so the
        # [E, 128] output never materializes (a bare x[src] at scale 4 is a
        # 24 GB array — the real SpMM paths are windowed for the same
        # reason); measures gather BANDWIDTH against the full [V, F] table
        chunk = 2 * 1024 * 1024
        n = e // chunk * chunk
        src_c = src[:n].reshape(-1, chunk)

        def row_gather_chunked(c, t, sc):
            t = t + c * eps

            def body(acc, s):
                return acc + jnp.sum(t[s]) * eps, None

            out, _ = lax.scan(body, c, sc)
            return out

        timeit("row gather x[src] F=128 chnk",
               row_gather_chunked, (x, src_c))
        timeit("segment_sum sorted [E]->[V]",
               lambda c, t, d: jnp.sum(jax.ops.segment_sum(
                   (t + c * eps), d, num_segments=v,
                   indices_are_sorted=True)) * eps + c,
               (jax.random.normal(key, (e,), jnp.float32), dst))

        # the composed op the serving pass actually runs, with its plan
        from sgnn_tpu.ops.segment import SpmmPlanner, spmm_coo_fwd_sorted

        planner = SpmmPlanner(dstp, np.sort(srcp), num_src=v, num_dst=v,
                              e_real=adj.num_edges)
        for feat in (128, 41):
            pl = planner.plan(feat, 1)
            xf = jax.random.normal(key, (v, feat), jnp.float32)
            mode = (f"win(chunk={pl.chunk},span={pl.dst_span})"
                    if pl else "direct")
            timeit(f"spmm_fwd_sorted F={feat} {mode}",
                   lambda c, t, s, d, w, pl=pl: jnp.sum(spmm_coo_fwd_sorted(
                       t + c * eps, s, d, w, v, pl)) * eps + c,
                   (xf, src, dst, w))
            del xf
        del x, tv, src, dst, w
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
