import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from sgnn_tpu.ops.pallas.mxu_spmm import build_mxu_spmm_plan, _apply

rng = np.random.default_rng(0)
V, E = 40000, 200000
src = rng.integers(0, V, E).astype(np.int32)
dst = rng.integers(0, V, E).astype(np.int32)
w = rng.standard_normal(E).astype(np.float32)
x = jnp.asarray(rng.standard_normal((V, 128)), jnp.bfloat16)
plan = build_mxu_spmm_plan(src, dst, w, V, V, s_blk=4096, s_win=1024,
                           d_blk=8192, w_win=1280, e_sub=256, e_t=2048,
                           max_pad_ratio=8.0)
print("steps", plan.static.n_steps, "chunks", plan.static.n_chunks, flush=True)
out = _apply(x, *plan.operands, plan.meta, plan.static)
print("sum", float(jnp.sum(out)), flush=True)
