"""Per-op floors at the sampled bench shapes (scale 1, batch 10000).

Scan-amortized (N iterations inside one jitted fori_loop — per-dispatch
tunnel latency on this runtime is ~100 ms and would swamp per-op times).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/sgnn_jax_cache")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/sgnn_jax_cache")
import jax.numpy as jnp
from jax import lax

from sgnn_tpu.ops.aggregate import gather_aggregate

rng = np.random.default_rng(0)
N = 30


def amortized(make_body, init, name, n=N):
    """Times fori_loop(n, body) inside one dispatch; body must keep data dep."""
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
    ms = 1000 * min(ts) / n
    print(f"{name}: {ms:.2f} ms/iter", flush=True)
    return ms


HOPS = [
    dict(name="hop0(top)", D=10112, K=25, S=126976, F=41),
    dict(name="hop1(bot)", D=126976, K=10, S=233088, F=128),
]

for h in HOPS:
    D, K, S, F = h["D"], h["K"], h["S"], h["F"]
    nbr = jnp.asarray(rng.integers(0, S, (D, K)), jnp.int32)
    w = jnp.asarray(rng.random((D, K), np.float32))
    x0 = jnp.asarray(rng.random((S, F), np.float32), jnp.bfloat16)
    g0 = jnp.asarray(rng.random((D, F), np.float32), jnp.bfloat16)
    E = D * K

    def fwd_body(i, c):
        x, acc = c
        out = gather_aggregate(x, (nbr + i) % S, w)
        return x, acc + jnp.sum(out)
    amortized(fwd_body, (x0, jnp.float32(0)), f"{h['name']} FWD gather_agg [{D}x{K}]x{F}")

    def bwd_body(i, c):
        x, acc = c
        nb = (nbr + i) % S
        _, vjp = jax.vjp(lambda xx: gather_aggregate(xx, nb, w), x)
        dx = vjp(g0)[0]
        return x, acc + jnp.sum(dx.astype(jnp.float32))
    amortized(bwd_body, (x0, jnp.float32(0)), f"{h['name']} BWD scatter [{D}x{K}]x{F}")

    keys0 = jnp.asarray(rng.integers(0, 4096, E), jnp.int32)

    def sort_body(i, c):
        k, acc = c
        s = jnp.sort(k + i)
        return k, acc + s[0]
    amortized(sort_body, (keys0, jnp.int32(0)), f"{h['name']} sort [{E}] i32")

    def argsort_body(i, c):
        k, acc = c
        p = jnp.argsort(k + i, stable=True)
        return k, acc + p[0]
    amortized(argsort_body, (keys0, jnp.int32(0)),
              f"{h['name']} argsort-stable [{E}] i32")

    vals = jnp.asarray(rng.integers(0, S, E), jnp.int32)
    perm0 = jnp.asarray(rng.permutation(E), jnp.int32)

    def perm_body(i, c):
        p, acc = c
        a = vals[(p + i) % E]
        b = (vals + 1)[(p + i) % E]
        d = (vals + 2)[(p + i) % E]
        return p, acc + a[0] + b[0] + d[0]
    amortized(perm_body, (perm0, jnp.int32(0)), f"{h['name']} permute 3x[{E}] i32")
