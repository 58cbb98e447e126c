"""On-chip validation: one-hot kernel on a REAL sampled bottom-hop plan.

Builds plans for the actual device-sampled bottom hop at candidate
geometries, runs the kernel scan-amortized on the chip, and compares
against the slot-wise XLA path at the same shapes.  Also measures H2D
throughput for plan-operand-sized buffers (the host-sampled pipeline
must ship plans per batch).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
import jax.numpy as jnp
from jax import lax

from sgnn_tpu.config import RunConfig
from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.sampler.device import device_sample_batch
from sgnn_tpu.train.device_trainer import DeviceSampleTrainer
from sgnn_tpu.ops.aggregate import gather_aggregate
from sgnn_tpu.ops.pallas.mxu_spmm import build_mxu_spmm_plan, mxu_spmm_fwd
from sgnn_tpu.utils.io import load_npy

_stem = "/root/.cache/sgnn_datasets/reddit_like_s1.0_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy")
     for k in ("num_vertices", "edges", "features", "labels", "masks")}
ds = Dataset(num_vertices=int(z["num_vertices"]), edges=z["edges"],
             features=z["features"], labels=z["labels"], masks=z["masks"],
             name="reddit-like")
cfg = RunConfig(layer_sizes=[602, 128, 41], fanout=[25, 10], batch_size=10000,
                epochs=1, drop_rate=0.5, vertices=ds.num_vertices,
                dtype="bfloat16", src_pad_factor=1.2)
tr = DeviceSampleTrainer(cfg, ds, family="sage", weight_kind=WeightKind.MEAN)
seeds = jnp.asarray(np.random.default_rng(0).choice(
    np.asarray(tr.train_nids), tr.seed_pad).astype(np.int32))
valid = jnp.ones(tr.seed_pad, bool)
batch = device_sample_batch(
    jax.random.PRNGKey(0), seeds, valid, tr.dev_indptr, tr.dev_indices,
    tr.dev_in_deg, tr.dev_out_deg, tr.dev_features, tr.dev_labels,
    tuple(cfg.fanout), tr.src_pads, tr.weight_kind,
    degree_mode=tr.dev_degree_mode, feat_scale=tr._feat_scale,
    compute_dtype=tr.compute_dtype)
blk = batch.blocks[0]
nbr = np.asarray(blk.nbr)
w = np.asarray(blk.weight)
D, K = nbr.shape
S = blk.srcs.shape[0]
live = w != 0
dst = np.repeat(np.arange(D, dtype=np.int64), K).reshape(D, K)[live]
src = nbr[live].astype(np.int64)
wt = w[live].astype(np.float32)
e_real = wt.size
print(f"bot: D={D} K={K} S={S} live={e_real}", flush=True)

rng = np.random.default_rng(0)
x_np = rng.random((S, 128), np.float32).astype(np.float32)
x = jnp.asarray(x_np, jnp.bfloat16)
N = 20


def amortized(fn, init, name, n=N):
    @jax.jit
    def run(c):
        def body(i, c):
            x, acc = c
            out = fn(x + acc.astype(x.dtype))
            return x, jnp.sum(out.astype(jnp.float32)) * 1e-30
        return lax.fori_loop(0, n, body, c)
    jax.block_until_ready(run(init))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init)
        np.asarray(out[1])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*min(ts)/n:.2f} ms/iter", flush=True)


# XLA baseline at the same shapes (fwd only)
nbr_j, w_j = jnp.asarray(nbr), jnp.asarray(w)
amortized(lambda xx: gather_aggregate(xx, nbr_j, w_j),
          (x, jnp.float32(0)), "XLA slot-wise fwd [D,K]")

GEOMS = [
    dict(s_blk=2048, w_win=1280, e_sub=128, e_t=1024),
    dict(s_blk=2048, w_win=1280, e_sub=256, e_t=2048),
    dict(s_blk=8192, s_win=2048, w_win=2048, e_sub=256, e_t=2048),
    dict(s_blk=4096, s_win=2048, w_win=2048, e_sub=256, e_t=2048),
]
for gkw in GEOMS:
    plan = build_mxu_spmm_plan(src, dst, wt, S, D, max_pad_ratio=12.0, **gkw)
    if plan is None:
        print(f"{gkw}: refused", flush=True)
        continue
    pad = plan.pad_ratio(e_real)
    ops = [jax.device_put(o) for o in plan.operands]
    meta = jax.device_put(plan.meta)
    st = plan.static
    amortized(lambda xx: mxu_spmm_fwd(xx, ops[0], ops[1], ops[2], ops[3],
                                      meta, st),
              (x, jnp.float32(0)),
              f"kernel {gkw} pad={pad:.2f}")
    # correctness spot check once per geometry
    ref = np.zeros((D, 128), np.float32)
    np.add.at(ref, dst, x_np[src] * wt[:, None])
    got = np.asarray(mxu_spmm_fwd(x, ops[0], ops[1], ops[2], ops[3],
                                  meta, st), np.float32)
    ref_b = (x_np.astype(np.float32))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"  rel err vs numpy (bf16 x): {err:.3e}", flush=True)

# H2D throughput at plan-operand sizes
for mb in (8, 32):
    buf = np.zeros((mb * 1024 * 1024 // 4,), np.int32)
    jax.block_until_ready(jax.device_put(buf))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        ts.append(time.perf_counter() - t0)
    print(f"H2D {mb} MB: {1000*min(ts):.1f} ms "
          f"({mb/min(ts)/1024:.2f} GB/s)", flush=True)
