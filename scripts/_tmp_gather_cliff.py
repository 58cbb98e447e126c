import sys; sys.path.insert(0, ".")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
import jax.numpy as jnp

rng = np.random.default_rng(0)
for V, N in [(233088, 126976), (466048, 154752), (932096, 179584),
             (233088, 233088), (466048, 466048), (932096, 852992)]:
    tbl = jnp.asarray(rng.standard_normal((V, 602)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    @jax.jit
    def g(t, i):
        return jnp.sum(t[i].astype(jnp.float32))
    float(g(tbl, idx))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(g(tbl, idx)); ts.append(time.perf_counter()-t0)
    print(f"V={V} N={N}: {1e3*np.median(ts):.1f} ms ({np.median(ts)/N*1e9:.1f} ns/row)", flush=True)
