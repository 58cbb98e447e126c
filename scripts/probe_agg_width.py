"""Bottom-hop gather_aggregate cost vs feature width (real indices)."""
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
nbr, w = blk.nbr, blk.weight
D, K = nbr.shape
S = blk.srcs.shape[0]
rng = np.random.default_rng(0)
N = 15


def amortized(fn, x, name, n=N):
    @jax.jit
    def run(x, key):
        def body(c, _):
            xx, acc = c
            out = fn(xx + acc.astype(xx.dtype))
            return (xx, jnp.sum(out.astype(jnp.float32)) * 1e-30), None
        (xx, acc), _ = lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc
    jax.block_until_ready(run(x, jax.random.PRNGKey(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(x, jax.random.PRNGKey(i))
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*min(ts)/n:.2f} ms/iter", flush=True)


for F, dt in ((128, jnp.bfloat16), (602, jnp.bfloat16), (602, jnp.int8),
              (640, jnp.bfloat16)):
    if dt == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (S, F)), jnp.int8)
        fn = lambda xx: gather_aggregate(
            xx.astype(jnp.bfloat16), nbr, w)
        # int8 rows dequantized AFTER gather in the real path; here the
        # cast happens pre-gather under jit — instead gather rows as int8:
        def fn(xx):
            out = jnp.zeros((nbr.shape[0], xx.shape[1]), jnp.bfloat16)
            for k in range(nbr.shape[1]):
                out = out + xx[nbr[:, k]].astype(jnp.bfloat16) * \
                    w[:, k][:, None].astype(jnp.bfloat16)
            return out
        x = x
    else:
        x = jnp.asarray(rng.random((S, F), np.float32), dt)
        fn = lambda xx: gather_aggregate(xx, nbr, w)
    amortized(fn, x, f"bot gather_agg F={F} {dt.__name__}")
