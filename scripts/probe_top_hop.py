"""Top-hop aggregation cost anatomy (fwd / bwd / dead-dw DCE check).

The r5 step ablation put the TOP hop's aggregation at 17.5 ms of a 60.7
ms step — 69 ns/slot for 252,800 slots, far off every floor.  This probe
separates: fwd gather, full VJP, VJP with dw skipped (is the dead dw
branch DCE'd when weight has no grad path?), and VJP dx-only through
jax.grad-style pruning.
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
from sgnn_tpu.ops.aggregate import (
    gather_aggregate, _gather_aggregate_fwd_impl)
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
blk = batch.blocks[1]  # TOP hop
nbr, w = blk.nbr, blk.weight
D, K = nbr.shape
S = blk.srcs.shape[0]
print(f"top: D={D} K={K} S={S}", flush=True)
rng = np.random.default_rng(0)
N = 15
F = 41
x0 = jnp.asarray(rng.random((S, F), np.float32), jnp.bfloat16)
g0 = jnp.asarray(rng.random((D, F), np.float32), jnp.bfloat16)


def amortized(fn, name, n=N):
    @jax.jit
    def run(x, g):
        def body(c, _):
            acc, = c
            out = fn(x + acc.astype(x.dtype), g)
            return (jnp.sum(out.astype(jnp.float32)) * 1e-30,), None
        (acc,), _ = lax.scan(body, (jnp.float32(0),), None, length=n)
        return acc
    jax.block_until_ready(run(x0, g0))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(x0, g0)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*min(ts)/n:.2f} ms/iter", flush=True)


amortized(lambda x, g: gather_aggregate(x, nbr, w), "top FWD only")


def vjp_dx(x, g):
    # differentiate ONLY wrt x (dw pruned by JAX if it prunes at all)
    _, pull = jax.vjp(lambda xx: gather_aggregate(xx, nbr, w), x)
    return pull(g)[0]
amortized(vjp_dx, "top VJP dx-only (dw should be dead)")


def vjp_both(x, g):
    _, pull = jax.vjp(lambda xx, ww: gather_aggregate(xx, nbr, ww), x, w)
    dx, dw = pull(g)
    return dx + jnp.sum(dw) * 1e-30
amortized(vjp_both, "top VJP dx+dw (dw live)")


# manual dx-only backward: the K slot scatters alone
def manual_dx(x, g):
    dx = jnp.zeros_like(x)
    for k in range(K):
        dx = dx.at[nbr[:, k]].add(
            (g * w[:, k][:, None]).astype(x.dtype), mode="drop")
    return dx
amortized(manual_dx, "manual dx scatters only")

# fwd impl without custom_vjp wrapper (XLA-differentiated)
amortized(lambda x, g: _gather_aggregate_fwd_impl(x, nbr, w),
          "fwd impl (no custom_vjp)")
