"""Differential step ablation at bench shapes (scan-amortized, real chip).

Measures the fused train step with surgical substitutions to attribute
cost IN CONTEXT (XLA overlap included):
  - full step
  - sampling replaced by a constant precomputed batch
  - bottom-hop aggregation removed (sum over x_src rows instead)
  - top-hop aggregation removed
  - dup-mask removed / weights constant / indices-gather replaced by iota
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
from sgnn_tpu.sampler import device as dev_samp
from sgnn_tpu.train.device_trainer import DeviceSampleTrainer
from sgnn_tpu.models.gnn import model_forward
from sgnn_tpu.nn.functional import nll_loss_masked
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
args = (tr.dev_indptr, tr.dev_indices, tr.dev_in_deg, tr.dev_out_deg,
        tr.dev_features, tr.dev_labels)
fan, pads, wk, dm = tuple(cfg.fanout), tr.src_pads, tr.weight_kind, tr.dev_degree_mode
fs, cd = tr._feat_scale, tr.compute_dtype
params, opt_state, optimizer = tr.params, tr.opt_state, tr.optimizer
N = 15


def amortized(step_fn, name, n=N, extra=None):
    """step_fn(p, o, sk, dk, extra) -> p, o, loss; extra passed as arg."""
    @jax.jit
    def run(params, opt_state, key, extra):
        def body(c, _):
            p, o, k = c
            k, sk, dk = jax.random.split(k, 3)
            p, o, loss = step_fn(p, o, sk, dk, extra)
            return (p, o, k), loss
        (p, o, _), losses = lax.scan(body, (params, opt_state, key),
                                     None, length=n)
        return losses[-1]
    out = jax.block_until_ready(run(params, opt_state,
                                    jax.random.PRNGKey(0), extra))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(params, opt_state, jax.random.PRNGKey(i), extra)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*min(ts)/n:.2f} ms/step", flush=True)
    return 1000 * min(ts) / n


def make_step(sample_fn, fwd_fn):
    def step(p, o, sk, dk, extra):
        batch = sample_fn(sk, extra)
        def loss_fn(pp):
            logp = fwd_fn(pp, batch, dk)
            return nll_loss_masked(logp, batch.labels, batch.label_valid)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p2, o2 = optimizer.update(grads, o, p)
        return p2, o2, loss
    return step


def real_sample(sk, extra):
    sds, vld, *rest = extra
    return dev_samp.device_sample_batch(
        sk, sds, vld, *rest, fan, pads, wk, degree_mode=dm,
        feat_scale=fs, compute_dtype=cd)

SAMPLE_EXTRA = (seeds, valid) + args


def real_fwd(pp, batch, dk):
    return model_forward(pp, "sage", batch, drop_rate=cfg.drop_rate,
                         train=True, dropout_key=dk)


# --- baselines -------------------------------------------------------------
t_full = amortized(make_step(real_sample, real_fwd), "full step", extra=SAMPLE_EXTRA)

# sampling ablation: constant batch (precomputed once, passed as ARG)
const_batch = real_sample(jax.random.PRNGKey(42), SAMPLE_EXTRA)
const_batch = jax.tree_util.tree_map(jax.device_put, const_batch)
t_nosamp = amortized(make_step(lambda sk, b: b, real_fwd),
                     "step w/ CONST batch (no sampling)",
                     extra=const_batch)

# forward ablations on the const batch: drop each hop's aggregation
import sgnn_tpu.models.gnn as gnn_mod
from sgnn_tpu.ops.aggregate import gather_aggregate as real_gagg

def fake_agg_bottom(x, nbr, wgt):
    if nbr.shape[0] == const_batch.blocks[0].nbr.shape[0]:
        # mean over a fixed slice: same output shape, no gather
        return jnp.broadcast_to(x[:1], (nbr.shape[0], x.shape[1])) * wgt[:, :1]
    return real_gagg(x, nbr, wgt)

def fake_agg_top(x, nbr, wgt):
    if nbr.shape[0] == const_batch.blocks[1].nbr.shape[0]:
        return jnp.broadcast_to(x[:1], (nbr.shape[0], x.shape[1])) * wgt[:, :1]
    return real_gagg(x, nbr, wgt)

for nm, fake in (("bottom", fake_agg_bottom), ("top", fake_agg_top)):
    gnn_mod.gather_aggregate = fake
    amortized(make_step(lambda sk, b: b, real_fwd),
              f"const-batch step w/o {nm} aggregation",
              extra=const_batch)
    gnn_mod.gather_aggregate = real_gagg

# sampling decomposition: remove the CSC edge-id gather (indices[start+pos]
# -> synthetic ids from arithmetic, same value range / no memory op)
import sgnn_tpu.sampler.device as _dv
_orig_src = open(_dv.__file__).read()
patched = _orig_src.replace(
    "    nbr_global = jnp.where(\n"
    "        keep, indices[jnp.clip(start[:, None] + pos, 0, indices.shape[0] - 1)], -1\n"
    "    )",
    "    _v = indptr.shape[0] - 1\n"
    "    _e = jnp.maximum(indices.shape[0], 1)\n"
    "    nbr_global = jnp.where(\n"
    "        keep, ((start[:, None] + pos).astype(jnp.int64) * _v // _e).astype(jnp.int32), -1\n"
    "    )",
)
assert patched != _orig_src, "edge-gather pattern not found"
ns = {}
exec(compile(patched, _dv.__file__, "exec"), ns)
no_gather_batch_fn = ns["device_sample_batch"]

def sample_no_gather(sk, extra):
    sds, vld, *rest = extra
    return no_gather_batch_fn(
        sk, sds, vld, *rest, fan, pads, wk, degree_mode=dm,
        feat_scale=fs, compute_dtype=cd)

amortized(make_step(sample_no_gather, real_fwd),
          "step w/ ARITHMETIC nbr ids (no CSC edge gather)",
          extra=SAMPLE_EXTRA)
print("done", flush=True)
