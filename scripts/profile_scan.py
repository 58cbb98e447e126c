"""Noise-resistant step timing: N calls chained in ONE lax.scan program.

Usage: python scripts/profile_scan.py [sample|fwd|step]
One-shot dispatch timings on the tunneled chip swing 40-70 ms for identical
programs; only scan-amortised numbers are trustworthy (docs/PERF.md).
"""
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
from sgnn_tpu.models.gnn import model_forward
from sgnn_tpu.nn.functional import nll_loss_masked

MODE = sys.argv[1] if len(sys.argv) > 1 else "sample"
from sgnn_tpu.utils.io import load_npy
_stem = "/root/.cache/sgnn_datasets/reddit_like_s1.0_seed0"
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
fan, pads, wk = tuple(cfg.fanout), tr.src_pads, tr.weight_kind
N = 50

@jax.jit
def scan_fn(key, params, opt_state, seeds, valid, *a):
    def body(carry, _):
        key, params, opt_state, acc = carry
        key, sk, dk = jax.random.split(key, 3)
        b = device_sample_batch(sk, seeds, valid, *a, fan, pads, wk,
                                degree_mode="global")
        if MODE == "sample":
            acc = acc + sum(jnp.sum(x.weight) for x in b.blocks)
        elif MODE == "fwd":
            logp = model_forward(params, "sage", b, train=False)
            acc = acc + jnp.sum(logp[0])
        else:
            def loss_fn(p):
                logp = model_forward(p, "sage", b, drop_rate=0.5, train=True,
                                     dropout_key=dk)
                return nll_loss_masked(logp, b.labels, b.label_valid)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = tr.optimizer.update(grads, opt_state, params)
            acc = acc + loss
        return (key, params, opt_state, acc), 0
    (key, params, opt_state, acc), _ = jax.lax.scan(
        body, (key, params, opt_state, jnp.zeros((), jnp.float32)),
        None, length=N)
    return acc

_ = float(scan_fn(jax.random.PRNGKey(0), tr.params, tr.opt_state,
                  seeds, valid, *args))
best = 1e9
for i in range(4):
    t0 = time.perf_counter()
    _ = float(scan_fn(jax.random.PRNGKey(i+1), tr.params, tr.opt_state,
                      seeds, valid, *args))
    best = min(best, (time.perf_counter() - t0) / N)
    print(f"run {i}: {1000*(time.perf_counter()-t0)/N:.2f} ms/{MODE}", flush=True)
print(f"BEST {MODE}: {1000*best:.2f} ms", flush=True)
