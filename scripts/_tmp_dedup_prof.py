import sys; sys.path.insert(0, ".")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
import jax.numpy as jnp

def t(f, *a, n=5):
    float(jnp.sum(f(*a)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(jnp.sum(f(*a))); ts.append(time.perf_counter()-t0)
    return 1e3*np.median(ts)

rng = np.random.default_rng(0)
E = 2_500_000
for V, PAD in [(466048, 466048), (932096, 852992)]:
    nbr = jnp.asarray(rng.integers(0, V, E).astype(np.int32))
    keep = jnp.asarray(rng.random(E) < 0.9)
    pres = jnp.zeros(V, jnp.int32).at[nbr].max(1, mode="drop")
    iota = jax.lax.broadcasted_iota(jnp.int32, (V,), 0)

    f1 = jax.jit(lambda nbr, keep: jnp.zeros(V, jnp.int32).at[jnp.where(keep, nbr, 0)].max(keep.astype(jnp.int32), mode="drop"))
    f2 = jax.jit(lambda p: jnp.cumsum(p))
    def f3(p):
        ranks = jnp.cumsum(p)
        lookup = (ranks - 1).astype(jnp.int32)
        slot = jnp.where((p == 1) & (lookup < PAD), lookup, PAD)
        return jnp.zeros(PAD + 1, jnp.int32).at[slot].max(iota)[:PAD]
    f3j = jax.jit(f3)
    f4 = jax.jit(lambda lk, nbr: lk[jnp.maximum(nbr, 0)])
    lk = jnp.asarray(rng.integers(0, PAD, V).astype(np.int32))
    print(f"V={V} PAD={PAD}: presence_scatter {t(f1, nbr, keep):.1f} ms, "
          f"cumsum {t(f2, pres):.1f} ms, ranks+slot_scatter {t(f3j, pres):.1f} ms, "
          f"rank_gather {t(f4, lk, nbr):.1f} ms", flush=True)
