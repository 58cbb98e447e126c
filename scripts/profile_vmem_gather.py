"""Microbenchmark: row-gather rate from a VMEM-resident table (Pallas)
vs XLA's HBM dynamic-gather.

Question being answered (docs/PERF.md "Narrow-width chunked SpMM" +
round-2 Pallas negative result): is the measured ~8-12 ns/row random
row-gather floor an HBM random-access limit (then a VMEM-resident table
should beat it) or the gather ISSUE rate of the compute unit itself
(then 2D edge tiling with VMEM src slabs has no headroom and the windowed
XLA path already sits at speed-of-light)?

Protocol: table [T, F] f32 with T*F*4 <= ~8MB (fits VMEM alongside the
output tile), indices [E] uniform random, reshaped [n_tiles, TILE_E] so
each grid step's indices arrive as a VMEM block (scalar-prefetch SMEM refs
only allow scalar loads — measured environment constraint).  The table
BlockSpec maps every grid step to block (0, 0): Pallas loads it to VMEM
once and reuses it.  Variants:
  xla    — jnp.take on the same shapes (table in HBM, XLA gather)
  pallas — in-kernel jnp.take from the VMEM-resident table

Run on the real chip: python scripts/profile_vmem_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 2048  # index rows handled per grid step


def pallas_vmem_gather(table, idx2d):
    n_tiles, tile_e = idx2d.shape
    t, f = table.shape

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[0], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile_e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_e, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_e, f), table.dtype),
    )(idx2d, table)


def xla_gather(table, idx2d):
    return jnp.take(table, idx2d.reshape(-1), axis=0)


def timeit(fn, *args, iters=20):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    f = 128
    for t_rows in (8192, 16384):
        table = jnp.asarray(rng.standard_normal((t_rows, f)), jnp.float32)
        for e in (1 << 20,):
            idx = rng.integers(0, t_rows, size=e).astype(np.int32)
            idx2d = jnp.asarray(idx.reshape(-1, TILE_E))
            tx = timeit(jax.jit(xla_gather), table, idx2d)
            try:
                tp = timeit(jax.jit(pallas_vmem_gather), table, idx2d)
            except Exception as ex:  # noqa: BLE001 — report and continue
                tp = float("nan")
                print(f"pallas failed T={t_rows}: {type(ex).__name__}: {ex}")
            print(f"T={t_rows} F={f} E={e}: xla {tx*1e3:8.2f} ms "
                  f"({tx/e*1e9:6.2f} ns/row)  pallas {tp*1e3:8.2f} ms "
                  f"({tp/e*1e9:6.2f} ns/row)")
            if tp == tp:
                a = np.asarray(xla_gather(table, idx2d[:2]))
                b = np.asarray(pallas_vmem_gather(table, idx2d[:2]))
                assert np.array_equal(a, b), "pallas gather mismatch"


if __name__ == "__main__":
    main()
