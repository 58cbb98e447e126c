"""Microbenchmark: in-kernel gather rate from a VMEM-resident table
(Pallas / Mosaic `tpu.dynamic_gather`) vs XLA's HBM dynamic-gather.

Question being answered (docs/PERF.md "Narrow-width chunked SpMM" +
round-2 Pallas negative result): is the measured ~8-12 ns/row random
row-gather floor an HBM random-access limit (then a VMEM-resident table
should beat it) or the gather ISSUE rate of the compute unit itself
(then 2D edge tiling with VMEM src slabs has no headroom and the windowed
XLA path already sits at speed-of-light)?

Mosaic lowering constraints discovered on the way (jax 0.9.0,
pallas/mosaic/lowering.py:_gather_lowering_rule): in-kernel gather lowers
ONLY to `tpu.dynamic_gather` with input.shape == indices.shape ==
output.shape, gathering along dim 0 (sublanes) or dim 1 (lanes) — a
"square shuffle".  Row-major [E, F] row gathers would need the index
column broadcast across lanes, which trips an unsupported [1,8,256] →
[2048,1] shape cast; the F-MAJOR layout gathers along LANES instead:
table [F, T], indices [1, T] broadcast across sublanes (native), out
[F, T].  Each kernel step shuffles the full T-column slab by one
T-length index vector.

Timing: K iterations chained through one lax.scan, synced by float() on a
scalar — jax.block_until_ready is a no-op on this platform (docs/PERF.md).

Run on the real chip: python scripts/profile_vmem_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 2048  # slab columns == gathered columns per step (square shuffle)
K = 8          # scan-chained timing iterations


def pallas_vmem_gather_sum(table_fm, idx3d):
    """table_fm [F, T] f32; idx3d [n_tiles, 8, T] int32 (sublane-replicated
    rows; only row 0 is used).  Per grid step: out[f, e] =
    table[f, idx[e]], summed over lanes to an [8, 128] block so the
    gather output never hits HBM."""
    n_tiles = idx3d.shape[0]
    f, t = table_fm.shape

    def kernel(idx_ref, table_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0, 0:1, :], (f, t))
        rows = jnp.take_along_axis(table_ref[:], idx, axis=1)
        s = jnp.sum(rows, axis=1, keepdims=True)          # [F, 1]
        out_ref[:] = jnp.broadcast_to(s.reshape(1, f), (8, f))

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, f), table_fm.dtype),
    )(idx3d, table_fm)


def xla_gather_sum(table, idx3d):
    # row-major XLA baseline at the same shapes: per-tile row-sum of
    # gathered rows, never an [E, F] HBM temp
    def body(acc, idx):
        return acc + jnp.sum(table[idx[0]], axis=0), None

    out, _ = lax.scan(body, jnp.zeros((table.shape[1],), table.dtype), idx3d)
    return out


def timeit(fn, *args):
    eps = jnp.float32(1e-30)

    @jax.jit
    def run(table, idx):
        def body(c, _):
            return jnp.sum(fn(table + c * eps, idx)) * eps + c, None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / K


def main():
    rng = np.random.default_rng(0)
    f = 128
    t_rows = TILE_E
    table = jnp.asarray(rng.standard_normal((t_rows, f)), jnp.float32)
    table_fm = jnp.asarray(np.asarray(table).T.copy())
    for e in (1 << 20,):
        idx = rng.integers(0, t_rows, size=e).astype(np.int32)
        idx3d = jnp.asarray(
            np.broadcast_to(idx.reshape(-1, 1, TILE_E), (e // TILE_E, 8,
                                                         TILE_E)).copy())
        # validate per-tile sums ON DEVICE (full gather outputs are ~512 MB
        # and the tunnel moves ~14 MB/s)
        a = xla_gather_sum(table, idx3d)
        try:
            b = jnp.sum(pallas_vmem_gather_sum(table_fm, idx3d)[::8],
                        axis=0)
            ok = bool(jnp.allclose(a, b, rtol=1e-3))
            assert ok, "pallas gather mismatch"
            tp = timeit(pallas_vmem_gather_sum, table_fm, idx3d)
        except Exception as ex:  # noqa: BLE001 — report and continue
            tp = float("nan")
            print(f"pallas failed: {type(ex).__name__}: {ex}")
        tx = timeit(xla_gather_sum, table, idx3d)
        print(f"T={t_rows} F={f} E={e}: xla {tx*1e3:8.2f} ms "
              f"({tx/e*1e9:6.2f} ns/row)  pallas {tp*1e3:8.2f} ms "
              f"({tp/e*1e9:6.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
