"""TPU step breakdown at bench shapes: sampling / +forward / full step."""
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

from sgnn_tpu.utils.io import load_npy
_stem = "/root/.cache/sgnn_datasets/reddit_like_s2.0_seed0"
z = {k: load_npy(f"{_stem}.{k}.npy")
     for k in ("num_vertices", "edges", "features", "labels", "masks")}
ds = Dataset(num_vertices=int(z["num_vertices"]), edges=z["edges"],
             features=z["features"], labels=z["labels"], masks=z["masks"],
             name="reddit-like")
cfg = RunConfig(layer_sizes=[602,128,41], fanout=[25,10], batch_size=10000,
                epochs=1, drop_rate=0.5, vertices=ds.num_vertices,
                dtype="bfloat16", src_pad_factor=1.2)
tr = DeviceSampleTrainer(cfg, ds, family="sage", weight_kind=WeightKind.MEAN)
print("src_pads:", tr.src_pads, "degree_mode:", tr.dev_degree_mode, flush=True)
seeds = jnp.asarray(np.arange(tr.seed_pad, dtype=np.int32))
valid = jnp.ones(tr.seed_pad, bool)
args = (tr.dev_indptr, tr.dev_indices, tr.dev_in_deg, tr.dev_out_deg,
        tr.dev_features, tr.dev_labels)
fan, pads, wk, dm = tuple(cfg.fanout), tr.src_pads, tr.weight_kind, tr.dev_degree_mode

@jax.jit
def samp_only(k, seeds, valid, *a):
    b = device_sample_batch(k, seeds, valid, *a, fan, pads, wk, degree_mode=dm)
    return sum(jnp.sum(x.weight) for x in b.blocks) + jnp.sum(b.x0[0,0].astype(jnp.float32))

@jax.jit
def samp_fwd(k, seeds, valid, *a):
    b = device_sample_batch(k, seeds, valid, *a, fan, pads, wk, degree_mode=dm)
    logp = model_forward(tr.params, "sage", b, train=False)
    return jnp.sum(logp)

def timeit(f, name, n=6):
    k = jax.random.PRNGKey(0)
    out = f(k, seeds, valid, *args); _ = float(np.asarray(out.ravel()[0] if hasattr(out,'ravel') else out))
    ts = []
    for i in range(n):
        k = jax.random.PRNGKey(i+1)
        t0 = time.perf_counter()
        out = f(k, seeds, valid, *args)
        _ = np.asarray(out)  # host sync (block_until_ready is a no-op on axon)
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {1000*np.median(ts):.1f} ms (min {1000*min(ts):.1f})", flush=True)

timeit(samp_only, "sample-only")
timeit(samp_fwd, "sample+forward")

@jax.jit
def full_step(k, seeds, valid, *a):
    b = device_sample_batch(k, seeds, valid, *a, fan, pads, wk, degree_mode=dm)
    def loss_fn(p):
        logp = model_forward(p, "sage", b, drop_rate=0.5, train=True,
                             dropout_key=jax.random.PRNGKey(2))
        return nll_loss_masked(logp, b.labels, b.label_valid)
    loss, grads = jax.value_and_grad(loss_fn)(tr.params)
    newp, _ = tr.optimizer.update(grads, tr.opt_state, tr.params)
    return loss + jnp.sum(newp.weights[0][0,:4].astype(jnp.float32))

timeit(full_step, "full step (sample+fwd+bwd+adam)")
