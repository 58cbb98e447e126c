import sys; sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")
from bench import bench_reddit_sage
for s in (4.0,):
    r = bench_reddit_sage(s, 3, 10000, dtype="bfloat16", src_pad_factor=1.2)
    print(f"scale{s} bf16 identity-snap:", round(r["edges_per_sec"]), r["epoch_time"], flush=True)
