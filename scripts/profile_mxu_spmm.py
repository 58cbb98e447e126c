"""On-chip measurement: one-hot MXU SpMM vs the windowed XLA path on the
real bench graph (reddit-like, scale via --scale).

Phase 1 (host only): sweep planner configs, report slot pad ratios —
the kernel's 6.09 ns/SLOT (scripts/profile_onehot_spmm.py cfg 5) beats
the XLA path's 15.4 ns/edge while pad_ratio < ~2.5.
Phase 2 (chip): time the best plan's forward vs spmm_coo_csc at F=128.

Run: python scripts/profile_mxu_spmm.py [--scale 1.0] [--widths ...]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _reddit_like_cached  # noqa: E402
from sgnn_tpu.ops.pallas.mxu_spmm import (  # noqa: E402
    build_mxu_spmm_plan,
)
from sgnn_tpu.ops.segment import SpmmPlanner, spmm_coo_csc  # noqa: E402
from sgnn_tpu.train.fullbatch import build_coo, csr_order  # noqa: E402


def sync(v):
    return float(jnp.sum(v))


def timeit(fn, *args, iters=8):
    eps = jnp.float32(1e-30)

    @jax.jit
    def run(x, *rest):
        def body(c, _):
            o = fn(x + c * eps, *rest)
            return jnp.sum(o.astype(jnp.float32)) * eps + c, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--cfg", type=int, default=-1,
                    help="measure only this config index")
    args = ap.parse_args()

    ds = _reddit_like_cached(args.scale)
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.sampler.blocks import WeightKind
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.GCN)
    v, e = ds.num_vertices, int(adj.num_edges)
    print(f"graph: V={v} E={e}")

    cfgs = [
        dict(s_blk=1024, d_blk=8192, w_win=1280, e_sub=256, e_t=4096),
        dict(s_blk=2048, d_blk=8192, w_win=1280, e_sub=256, e_t=4096),
        dict(s_blk=4096, s_win=1024, d_blk=8192, w_win=1280, e_sub=256,
             e_t=4096),
        dict(s_blk=4096, s_win=1536, d_blk=8192, w_win=1536, e_sub=256,
             e_t=4096),
        dict(s_blk=8192, s_win=1024, d_blk=8192, w_win=1280, e_sub=256,
             e_t=4096),
        dict(s_blk=1024, d_blk=8192, w_win=1280, e_sub=256, e_t=2048),
        dict(s_blk=2048, d_blk=8192, w_win=1280, e_sub=256, e_t=2048),
        dict(s_blk=1024, d_blk=8192, w_win=1024, e_sub=256, e_t=2048),
        dict(s_blk=1024, d_blk=8192, w_win=1280, e_sub=128, e_t=2048),
        dict(s_blk=512, d_blk=8192, w_win=1280, e_sub=256, e_t=2048),
        dict(s_blk=1024, d_blk=8192, w_win=1280, e_sub=256, e_t=1024),
        dict(s_blk=768, d_blk=8192, w_win=1024, e_sub=128, e_t=2048),
        # split-window rungs (runnable since the r5 pl.multiple_of fix):
        # big slabs merge sparse groups, small s_win keeps MXU cost low
        dict(s_blk=4096, s_win=2048, d_blk=8192, w_win=2048, e_sub=256,
             e_t=2048),
        dict(s_blk=8192, s_win=2048, d_blk=8192, w_win=2048, e_sub=256,
             e_t=2048),
        dict(s_blk=8192, s_win=1024, d_blk=8192, w_win=1280, e_sub=256,
             e_t=2048),
    ]
    plans = []
    for i, kw in enumerate(cfgs):
        t0 = time.perf_counter()
        p = build_mxu_spmm_plan(src, dst, w, v, v, max_pad_ratio=4.0, **kw)
        dt = time.perf_counter() - t0
        if p is None:
            print(f"[{i}] {kw}: REFUSED (pad > 4x)")
            plans.append(None)
            continue
        print(f"[{i}] {kw}: n_steps={p.static.n_steps} "
              f"slots={p.slot_count} pad={p.pad_ratio(e):.2f} "
              f"plan_time={dt:.1f}s "
              f"est={(6.09 * p.slot_count / 1e6):.0f}ms")
        plans.append(p)
    if args.plan_only:
        return

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((v, args.feat)), jnp.bfloat16)

    # XLA windowed baseline
    perm, inv = csr_order(src)
    planner = SpmmPlanner(np.asarray(dst), src[np.asarray(perm)],
                          num_src=v, num_dst=v)
    splan = planner.plan(args.feat)
    srcj, dstj, wj = jnp.asarray(src), jnp.asarray(dst), \
        jnp.asarray(w, jnp.bfloat16)
    tx = timeit(
        lambda t: spmm_coo_csc(t, srcj, dstj, wj, perm, inv, v, splan),
        x)
    print(f"XLA windowed: {tx*1e3:.1f} ms ({tx/e*1e9:.2f} ns/edge)")

    ref = None
    from sgnn_tpu.ops.pallas.mxu_spmm import _apply
    for i, p in enumerate(plans):
        if p is None or (args.cfg >= 0 and i != args.cfg):
            continue
        try:
            st = p.static
            fn = jax.jit(lambda t, sr, ds, wb, vis, mt, st=st:
                         _apply(t, sr, ds, wb, vis, mt, st))
            call = (x, *p.operands, p.meta)
            out = fn(*call)
            if ref is None:
                ref = spmm_coo_csc(x.astype(jnp.float32), srcj, dstj,
                                   jnp.asarray(w), perm, inv, v, splan)
            err = float(jnp.max(jnp.abs(out - ref)) /
                        jnp.max(jnp.abs(ref)))
            import time as _t
            t0 = _t.perf_counter()
            for _ in range(8):
                out = fn(*call)
            float(jnp.sum(out))
            tm = (_t.perf_counter() - t0) / 8
            print(f"[{i}] mxu: {tm*1e3:.1f} ms ({tm/e*1e9:.2f} ns/edge, "
                  f"{tm/p.slot_count*1e9:.2f} ns/slot) rel_err={err:.1e} "
                  f"speedup {tx/tm:.2f}x", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"[{i}] mxu FAILED: {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
