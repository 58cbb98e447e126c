"""Per-op floors with REAL sampled-batch indices (locality matters).

Compares gather/scatter at the bottom hop with actual device-sampler nbr
vs uniform-random nbr, scan-amortized in one dispatch.
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
blocks = batch.blocks  # [0]=bottom, [1]=top
rng = np.random.default_rng(0)
N = 10


def amortized(make_body, init, name, n=N):
    @jax.jit
    def run(carry):
        return lax.fori_loop(0, n, make_body, carry)
    out = jax.block_until_ready(run(init))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {1000*min(ts)/n:.2f} ms/iter", flush=True)


for tag, blk, F in (("bot", blocks[0], 128),):
    nbr = blk.nbr
    w = blk.weight
    D, K = nbr.shape
    S = blk.srcs.shape[0]
    live = int(jnp.sum(w != 0))
    print(f"{tag}: D={D} K={K} S={S} live_edges={live} "
          f"({100.0*live/(D*K):.0f}% of slots)", flush=True)
    x0 = jnp.asarray(rng.random((S, F), np.float32), jnp.bfloat16)
    g0 = jnp.asarray(rng.random((D, F), np.float32), jnp.bfloat16)
    rnbr = jnp.asarray(rng.integers(0, S, (D, K)), jnp.int32)

    for nm, nn in (("real", nbr), ("rand", rnbr)):
        def fwd_body(i, c, nn=nn):
            x, acc = c
            out = gather_aggregate(x + acc, nn, w)
            return x, jnp.sum(out) * 0
        amortized(fwd_body, (x0, jnp.bfloat16(0)), f"{tag} FWD {nm} x{F}")

        def bwd_body(i, c, nn=nn):
            x, acc = c
            _, vjp = jax.vjp(lambda xx: gather_aggregate(xx, nn, w), x + acc)
            dx = vjp(g0)[0]
            return x, jnp.sum(dx) * 0
        amortized(bwd_body, (x0, jnp.bfloat16(0)), f"{tag} BWD {nm} x{F}")
