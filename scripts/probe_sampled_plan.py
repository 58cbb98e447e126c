"""Feasibility: MXU tile-plan pad ratios on a REAL sampled bottom hop.

Pulls one device-sampled batch at bench shapes, converts each hop's dense
-fanout [D,K] block to COO, and runs the whole-graph planner across the
geometry ladder — reporting pad ratio and projected ns/edge vs the
current slot-wise XLA path.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # planning is host-side
import jax, numpy as np
import jax.numpy as jnp

from sgnn_tpu.config import RunConfig
from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.sampler.device import device_sample_batch
from sgnn_tpu.train.device_trainer import DeviceSampleTrainer
from sgnn_tpu.ops.pallas.mxu_spmm import build_mxu_spmm_plan
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

GEOMS = [
    dict(s_blk=1024, w_win=1280, e_sub=256, e_t=2048),   # whole-graph default (3.84 ns/slot)
    dict(s_blk=2048, w_win=1280, e_sub=256, e_t=2048),   # ladder rung 2 (5.64)
    dict(s_blk=2048, w_win=2048, e_sub=256, e_t=2048, d_blk=8192),
    dict(s_blk=4096, s_win=1024, w_win=1280, e_sub=256, e_t=2048),
    dict(s_blk=4096, s_win=2048, w_win=2048, e_sub=256, e_t=2048),
    dict(s_blk=8192, s_win=2048, w_win=2048, e_sub=256, e_t=2048),
    dict(s_blk=2048, w_win=1280, e_sub=128, e_t=1024),
    dict(s_blk=1024, w_win=1280, e_sub=128, e_t=1024),
    dict(s_blk=4096, s_win=1024, w_win=1280, e_sub=128, e_t=1024),
]

# measured ~linear cost in (s_win + w_win): 3.84 ns/slot at 1024+1280
NS_PER_UNIT = 3.84 / (1024 + 1280)

for tag, blk in (("bot", batch.blocks[0]), ("top", batch.blocks[1])):
    nbr = np.asarray(blk.nbr)
    w = np.asarray(blk.weight)
    D, K = nbr.shape
    S = blk.srcs.shape[0]
    live = w != 0
    dst = np.repeat(np.arange(D, dtype=np.int64), K).reshape(D, K)[live]
    src = nbr[live].astype(np.int64)
    wt = w[live]
    e_real = wt.size
    print(f"\n{tag}: D={D} K={K} S={S} live={e_real}", flush=True)
    for gkw in GEOMS:
        gkw = dict(gkw)
        t0 = time.time()
        for name, s, d, ns, nd in (("fwd", src, dst, S, D),
                                   ("bwd", dst, src, D, S)):
            plan = build_mxu_spmm_plan(s, d, wt, ns, nd,
                                       max_pad_ratio=12.0, **gkw)
            if plan is None:
                print(f"  {gkw} {name}: REFUSED (pad>12)", flush=True)
                continue
            pad = plan.pad_ratio(e_real)
            s_win = gkw.get("s_win", gkw["s_blk"])
            ns_slot = NS_PER_UNIT * (s_win + gkw["w_win"])
            print(f"  {gkw} {name}: pad {pad:.2f} "
                  f"-> {ns_slot*pad:.1f} ns/edge "
                  f"({1e-6*ns_slot*pad*e_real:.1f} ms) "
                  f"[plan {time.time()-t0:.1f}s]", flush=True)
