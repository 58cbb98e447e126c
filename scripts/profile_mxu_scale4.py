"""Scale-4 MXU geometry shoot-out: real plans + on-chip rates.

Candidates: the r4 ladder rung (s2048) vs the split-window rungs the r5
alignment fix unlocked.  Reports real pad (vs the estimator's lower
bound) and measured ns/edge vs the windowed XLA path at scale 4.
"""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _reddit_like_cached  # noqa: E402
from sgnn_tpu.ops.pallas.mxu_spmm import (  # noqa: E402
    _apply, _estimate_slots, build_mxu_spmm_plan)
from sgnn_tpu.ops.segment import SpmmPlanner, spmm_coo_csc  # noqa: E402
from sgnn_tpu.train.fullbatch import build_coo, csr_order  # noqa: E402


def timeit(fn, *args, iters=6):
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


ds = _reddit_like_cached(4.0)
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.sampler.blocks import WeightKind
adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
src, dst, w = build_coo(adj, WeightKind.GCN)
v, e = ds.num_vertices, int(adj.num_edges)
print(f"graph: V={v} E={e}", flush=True)

CFGS = [
    dict(s_blk=4096, s_win=2048, d_blk=8192, w_win=2048, e_sub=256,
         e_t=2048),
    dict(s_blk=8192, s_win=2048, d_blk=8192, w_win=2048, e_sub=256,
         e_t=2048),
    dict(s_blk=8192, s_win=1024, d_blk=8192, w_win=1280, e_sub=256,
         e_t=2048),
]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((v, 128)), jnp.bfloat16)

# XLA windowed baseline at scale 4 is known from r4 (fullbatch windowed
# epoch 5.87 s over ~6 SpMM-equivalent passes); skip its slow compile and
# anchor speedup against the r4 s2048 rung instead (715 ms/pass est).
tx = 0.715

for i, kw in enumerate(CFGS):
    est_kw = {k: kw[k] for k in ("s_blk", "d_blk", "e_sub", "e_t")}
    est = _estimate_slots(src, dst, v, **est_kw) / e
    t0 = time.perf_counter()
    p = build_mxu_spmm_plan(src, dst, w, v, v, max_pad_ratio=6.0, **kw)
    dt = time.perf_counter() - t0
    if p is None:
        print(f"[{i}] {kw}: REFUSED (est {est:.2f}, plan {dt:.0f}s)",
              flush=True)
        continue
    pad = p.pad_ratio(e)
    print(f"[{i}] {kw}: est {est:.2f} real pad {pad:.2f} "
          f"(plan {dt:.0f}s)", flush=True)
    st = p.static
    fn = jax.jit(lambda t, sr, dd, wb, vis, mt, st=st:
                 _apply(t, sr, dd, wb, vis, mt, st))
    tm = timeit(fn, x, *p.operands, p.meta)
    print(f"[{i}] mxu: {tm*1e3:.1f} ms ({tm/e*1e9:.2f} ns/edge, "
          f"{tm/p.slot_count*1e9:.2f} ns/slot) speedup {tx/tm:.2f}x",
          flush=True)
    del p, fn
