import sys; sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")
from bench import bench_fullbatch
r = bench_fullbatch(4.0, 4)
print("scale4 fullbatch:", r)
