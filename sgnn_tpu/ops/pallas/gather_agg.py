"""Pallas TPU kernel: fused neighbor-gather + weighted reduction.

The sampled-subgraph SpMM (reference CUDA warp-per-destination gather
kernels, cuda/ntsCUDAFuseKernel.cuh:78 `aggregate_kernel_from_src_with_
weight` and the cuSPARSE SpMM path, ntsCUDAGraphOP.cu:425), as a TPU
Mosaic kernel.

Why a kernel: XLA lowers `x[nbr] * w → sum(axis=1)` through an HBM-
materialised [D, K, F] gather (3·D·K·F floats of traffic).  This kernel
streams the K needed rows per destination tile straight into VMEM scratch
with double-buffered async DMA and accumulates there — ~D·K·F read +
D·F write, i.e. ~3× less HBM traffic on the aggregation, which is the
bandwidth-bound hot op of sampled GNN training.

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

    nbr_ref: SMEM scalar-prefetch, int32 [D_pad * K] (flattened)
    w_ref:   VMEM [TILE_D, K] edge weights for this tile
    x_hbm:   ANY  [S, F] source features (stays in HBM)
    out_ref: VMEM [TILE_D, F] output tile
    rows:    VMEM scratch [NBUF, TILE_D, K rows? no — [NBUF, TILE_D*K? ] —
             [NBUF, TILE_D, F] per-k slabs
    sems:    DMA semaphores [NBUF]
    """
    t = pl.program_id(0)
    k_total = w_ref.shape[1]
    base = t * _TILE_D * k_total

    def start_copy(slot, k):
        # gather TILE_D rows for edge-slot k of every dst in the tile:
        # issue TILE_D row DMAs into rows[slot]
        for d in range(_TILE_D):
            idx = nbr_ref[base + d * k_total + k]
            pltpu.make_async_copy(
                x_hbm.at[idx],
                rows.at[slot, d],
                sems.at[slot, d],
            ).start()

    def wait_copy(slot):
        for d in range(_TILE_D):
            # wait on each row DMA of this slot
            pltpu.make_async_copy(
                x_hbm.at[0], rows.at[slot, d], sems.at[slot, d]
            ).wait()

    start_copy(0, 0)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(k_total):
        slot = k % _NBUF
        if k + 1 < k_total:
            start_copy((k + 1) % _NBUF, k + 1)
        wait_copy(slot)
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
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE_D, k), lambda t, nbr_ref: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((_TILE_D, f), lambda t, nbr_ref: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_NBUF, _TILE_D, f), x.dtype),
                pltpu.SemaphoreType.DMA((_NBUF, _TILE_D)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, f), x.dtype),
    )(nbr.reshape(-1), w, x)


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
