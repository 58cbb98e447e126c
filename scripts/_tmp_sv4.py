"""Bisect device-sampling cost at bench shapes (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
import jax.numpy as jnp
from sgnn_tpu.config import RunConfig
from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.sampler.device import device_sample_batch
from sgnn_tpu.train.device_trainer import DeviceSampleTrainer

from sgnn_tpu.utils.io import load_npy
_stem = "/root/.cache/sgnn_datasets/reddit_like_s4.0_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy")
     for k in ("num_vertices", "edges", "features", "labels", "masks")}
ds = Dataset(num_vertices=int(z["num_vertices"]), edges=z["edges"],
             features=z["features"], labels=z["labels"], masks=z["masks"],
             name="reddit-like")
cfg = RunConfig(layer_sizes=[602,128,41], fanout=[25,10], batch_size=10000,
                epochs=1, drop_rate=0.5, vertices=ds.num_vertices,
                dtype="bfloat16", src_pad_factor=1.2)
tr = DeviceSampleTrainer(cfg, ds, family="sage", weight_kind=WeightKind.MEAN)
seeds = jnp.asarray(np.arange(tr.seed_pad, dtype=np.int32))
valid = jnp.ones(tr.seed_pad, bool)
args = (tr.dev_indptr, tr.dev_indices, tr.dev_in_deg, tr.dev_out_deg,
        tr.dev_features, tr.dev_labels)

def variant(name, fan, pads, wk):
    @jax.jit
    def f(k, seeds, valid, *a):
        b = device_sample_batch(k, seeds, valid, *a, fan, pads, wk,
                                degree_mode="global")
        return (sum(jnp.sum(x.weight) for x in b.blocks)
                + jnp.sum(b.x0[0, 0].astype(jnp.float32)))
    k = jax.random.PRNGKey(0)
    _ = float(f(k, seeds, valid, *args))
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        _ = float(f(jax.random.PRNGKey(i+1), seeds, valid, *args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*np.median(ts):.1f} ms", flush=True)

V = int(tr.dev_indptr.shape[0] - 1)
variant("hop0-only (25, dedup 188k)", (25,), (716800,), WeightKind.MEAN)
variant("both hops (baseline)", (25, 10), (716800, 852992), WeightKind.MEAN)
variant("both hops NONE-weights", (25, 10), (716800, 852992), WeightKind.NONE)
variant("exact pads (no dedup, identity both)", (25, 10), (V, V), WeightKind.MEAN)
