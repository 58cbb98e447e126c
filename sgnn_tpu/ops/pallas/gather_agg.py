"""Pallas TPU kernel: fused neighbor-gather + weighted reduction.

The sampled-subgraph SpMM (reference CUDA warp-per-destination gather
kernels, cuda/ntsCUDAFuseKernel.cuh:78 `aggregate_kernel_from_src_with_
weight` and the cuSPARSE SpMM path, ntsCUDAGraphOP.cu:425), as a TPU
Mosaic kernel.

Hypothesis: XLA lowers `x[nbr] * w → sum(axis=1)` through an HBM-
materialised [D, K, F] gather (3·D·K·F floats of traffic); streaming the K
rows per destination tile into VMEM with double-buffered async DMA and
accumulating in-register should cut that ~3×.

MEASURED OUTCOME (TPU v5e, D=S=233k, K=10, F=128): XLA 20.5 ms vs this
kernel 67.8 ms.  XLA's native dynamic-gather path fuses the weighting /
reduction well enough that it runs near the random-access bandwidth limit,
while per-row 512-byte DMAs here are issue-rate-bound (~34M DMAs/s).  The
kernel is kept as a correct, tested alternative (`gather_aggregate_auto`)
and as the scaffold for block-sparse variants where rows can be batched,
but the XLA path remains the default — the measured wins on this workload
came from algorithmic restructuring (sort-free dedup, identity bottom hop,
transform-first ordering, fused epochs; see docs/PERF.md).

Forward only — the backward scatter-add stays on the XLA path via the
custom VJP (whose cotangent math is shared with ops/aggregate.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..aggregate import _gather_aggregate_fwd_impl, _gather_aggregate_bwd

# destinations per grid step (sublane-friendly), DMA pipeline depth
_TILE_D = 8
_NBUF = 2


def _kernel(nbr_ref, w_ref, x_hbm, out_ref, rows, sems):
    """Grid step t handles destinations [t*TILE_D, (t+1)*TILE_D).

    nbr_ref: SMEM [TILE_D, K] neighbor indices for this tile (auto-tiled by
             BlockSpec — whole-array scalar prefetch overflows the ~1MB SMEM
             at production sizes)
    w_ref:   VMEM [TILE_D, K] edge weights for this tile
    x_hbm:   ANY  [S, F] source features (stays in HBM)
    out_ref: VMEM [TILE_D, F] output tile
    rows:    VMEM scratch [NBUF, TILE_D, F] per-k row slabs
    sems:    DMA semaphores [NBUF, TILE_D]
    """
    k_total = w_ref.shape[1]

    def row_dma(slot, k, d):
        # descriptor for (slot, k, d); wait MUST rebuild the same descriptor
        idx = nbr_ref[d, k]
        return pltpu.make_async_copy(
            x_hbm.at[idx],
            rows.at[slot, d],
            sems.at[slot, d],
        )

    def start_copy(slot, k):
        for d in range(_TILE_D):
            row_dma(slot, k, d).start()

    def wait_copy(slot, k):
        for d in range(_TILE_D):
            row_dma(slot, k, d).wait()

    start_copy(0, 0)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(k_total):
        slot = k % _NBUF
        if k + 1 < k_total:
            start_copy((k + 1) % _NBUF, k + 1)
        wait_copy(slot, k)
        acc = acc + rows[slot] * w_ref[:, k][:, None]
    out_ref[:] = acc.astype(out_ref.dtype)


def pallas_gather_aggregate_fwd_impl(x, nbr, w, interpret: bool = False):
    d_pad, k = nbr.shape
    s, f = x.shape
    assert d_pad % _TILE_D == 0, f"num_dst {d_pad} % {_TILE_D} != 0"
    grid = (d_pad // _TILE_D,)
    return pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_D, k), lambda t: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_D, k), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_TILE_D, f), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, _TILE_D, f), x.dtype),
            pltpu.SemaphoreType.DMA((_NBUF, _TILE_D)),
        ],
        out_shape=jax.ShapeDtypeStruct((d_pad, f), x.dtype),
    )(nbr, w, x)


@jax.custom_vjp
def pallas_gather_aggregate(x, nbr, w):
    """Fused out[d] = Σ_k w[d,k]·x[nbr[d,k]] (Pallas fwd, XLA bwd)."""
    return pallas_gather_aggregate_fwd_impl(x, nbr, w)


def _fwd(x, nbr, w):
    return pallas_gather_aggregate_fwd_impl(x, nbr, w), (x, nbr, w)


pallas_gather_aggregate.defvjp(_fwd, _gather_aggregate_bwd)


def gather_aggregate_auto(x, nbr, w, use_pallas: bool = False):
    """Dispatch between the XLA reference path and the Pallas kernel."""
    if use_pallas and jax.default_backend() == "tpu":
        return pallas_gather_aggregate(x, nbr, w)
    from ..aggregate import gather_aggregate

    return gather_aggregate(x, nbr, w)
