import sys; sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")
from bench import bench_reddit_sage
r = bench_reddit_sage(4.0, 3, 10000, dtype="bfloat16", src_pad_factor=1.2,
                      feature_dtype="int8")
print("scale4 int8:", r["edges_per_sec"], r["epoch_time"], r["final_train_acc"])
