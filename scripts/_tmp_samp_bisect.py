import sys; sys.path.insert(0, ".")
import os, time
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

scale = sys.argv[1] if len(sys.argv) > 1 else "4.0"
_stem = f"/root/.cache/sgnn_datasets/reddit_like_s{scale}_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy")
     for k in ("num_vertices", "edges", "features", "labels", "masks")}
ds = Dataset(num_vertices=int(z["num_vertices"]), edges=z["edges"],
             features=z["features"], labels=z["labels"], masks=z["masks"],
             name="rl")
cfg = RunConfig(layer_sizes=[602,128,41], fanout=[25,10], batch_size=10000,
                epochs=1, drop_rate=0.5, vertices=ds.num_vertices,
                dtype="bfloat16", src_pad_factor=1.2)
tr = DeviceSampleTrainer(cfg, ds, family="sage", weight_kind=WeightKind.MEAN)
print("pads:", tr.src_pads, flush=True)
seeds = jnp.asarray(np.arange(tr.seed_pad, dtype=np.int32))
valid = jnp.ones(tr.seed_pad, bool)
args = (tr.dev_indptr, tr.dev_indices, tr.dev_in_deg, tr.dev_out_deg,
        tr.dev_features, tr.dev_labels)
fan, pads, wk, dm = tuple(cfg.fanout), tr.src_pads, tr.weight_kind, tr.dev_degree_mode

def mk(gf, pads):
    @jax.jit
    def f(k, seeds, valid, *a):
        b = device_sample_batch(k, seeds, valid, *a, fan, pads, wk,
                                degree_mode=dm, gather_features=gf)
        out = sum(jnp.sum(x.weight) for x in b.blocks)
        if gf:
            out = out + jnp.sum(b.x0[0, 0].astype(jnp.float32))
        return out
    return f

def t(f, name):
    k = jax.random.PRNGKey(0)
    float(f(k, seeds, valid, *args))
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(f(jax.random.PRNGKey(i+1), seeds, valid, *args))
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {1e3*np.median(ts):.1f} ms", flush=True)

t(mk(False, pads), "sample no-gather (real pads)")
t(mk(True, pads), "sample +x0 gather (real pads)")
hop0 = pads[0]
t(mk(False, (hop0, tr.dev_indptr.shape[0]-1)), "sample no-gather (bottom=V)")
t(mk(True, (hop0, tr.dev_indptr.shape[0]-1)), "sample identity-x0 (bottom=V)")
