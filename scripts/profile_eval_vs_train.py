"""Split fwd vs bwd cost: fused EVAL epoch (sample+fwd) vs TRAIN epoch."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
from sgnn_tpu.config import RunConfig
from sgnn_tpu.data.dataset import Dataset
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.train.device_trainer import DeviceSampleTrainer

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
train_nids = tr.train_nids
n_steps = -(-len(train_nids) // cfg.batch_size)
# warm up both fused programs
_ = tr.train_epoch()
_ = tr.evaluate(train_nids)
for name, fn in (("train", tr.train_epoch), ("eval", lambda: tr.evaluate(train_nids))):
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f} s/epoch = {1000*best/n_steps:.1f} ms/step "
          f"({n_steps} steps)", flush=True)
