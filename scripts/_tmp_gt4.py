import sys; sys.path.insert(0, ".")
import time
import jax, jax.numpy as jnp
from bench import _reddit_like_cached
from sgnn_tpu.config import RunConfig
from sgnn_tpu.train.fullbatch import FullBatchTrainer
ds = _reddit_like_cached(1.0)
cfg = RunConfig(layer_sizes=[602, 128, 41], epochs=4, learn_rate=0.01,
                drop_rate=0.5, vertices=ds.num_vertices, dtype="bfloat16",
                heads=4)
tr = FullBatchTrainer(cfg, ds, family="gat")
times = []
for _ in range(4):
    t0 = time.perf_counter()
    tr.train_epoch()
    float(jnp.sum(tr.params.weights[0]))
    times.append(time.perf_counter() - t0)
print(f"gat4h train epochs {[round(t,3) for t in times]}", flush=True)
