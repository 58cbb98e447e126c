"""COO segment ops for FULL-GRAPH (non-sampled) aggregation.

Reference: the NeutronStar full-batch op family — `SingleCPUSrcDstScatterOp`,
`SingleCPUDstAggregateOp`, `SingleEdgeSoftMax` (core/ntsSingleCPUGraphOp.hpp:
34-439) and their distributed analogues — operate over the whole-graph
CSC/CSR.  On TPU a whole-graph layer is a ragged reduction, expressed with
XLA's segment primitives over a statically padded COO edge list (padded
edges carry weight 0 and point at a real dst slot, contributing nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_coo(
    x: jax.Array,        # [S, F] source features
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destination ids
    weight: jax.Array,   # [E] edge weights (0 ⇒ padded edge)
    num_dst: int,
) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} weight[e] · x[src[e]]  (full-graph SpMM).

    Forward gathers by src and segment-sums by dst (reference CSC forward);
    backward swaps the roles (reference CSR backward,
    ntsSingleGPUSampleGraphOp.hpp:258).
    """
    msgs = x[src] * weight[:, None]
    # accumulate in f32: bf16 segment sums lose updates once the running
    # sum exceeds ~256x a summand (high-degree hub vertices)
    out = jax.ops.segment_sum(
        msgs.astype(jnp.float32), dst, num_segments=num_dst
    )
    return out.astype(x.dtype)


def _spmm_fwd(x, src, dst, weight, num_dst):
    return spmm_coo(x, src, dst, weight, num_dst), (x, src, dst, weight)


def _spmm_bwd(num_dst, res, g):
    x, src, dst, weight = res
    ge = g[dst] * weight[:, None]                       # [E, F]
    dx = jax.ops.segment_sum(
        ge.astype(jnp.float32), src, num_segments=x.shape[0]
    ).astype(x.dtype)
    dw = jnp.einsum("ef,ef->e", g[dst], x[src],
                    preferred_element_type=jnp.float32).astype(weight.dtype)
    return dx, None, None, dw


spmm_coo.defvjp(_spmm_fwd, _spmm_bwd)


def segment_softmax_coo(
    scores: jax.Array, dst: jax.Array, valid: jax.Array, num_dst: int
) -> jax.Array:
    """Numerically-stable softmax over each destination's edge segment.

    Reference `SingleEdgeSoftMax` (ntsSingleCPUGraphOp.hpp) / CUDA
    block-per-dst kernel (ntsCUDADistKernel.cuh:319), COO edition.
    """
    if scores.ndim == 2 and valid.ndim == 1:
        valid = valid[:, None]       # [E, H] multi-head scores
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg)
    seg_max = jax.ops.segment_max(s, dst, num_segments=num_dst)
    e = jnp.exp(s - jax.lax.stop_gradient(seg_max[dst]))
    e = jnp.where(valid, e, 0.0)
    z = jax.ops.segment_sum(
        e.astype(jnp.float32), dst, num_segments=num_dst
    ).astype(e.dtype)
    return e / jnp.maximum(z[dst], jnp.finfo(scores.dtype).tiny)


def spmm_coo_multihead(
    x: jax.Array,        # [S, F] source features, F = H·Fh
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destination ids
    att: jax.Array,      # [E, H] per-head edge weights (0 ⇒ padded edge)
    num_dst: int,
) -> jax.Array:
    """Multi-head SpMM: head h weights its own F/H feature block.

    out[d, h·Fh:(h+1)·Fh] = Σ_{e: dst[e]=d} att[e,h] · x[src[e], h·Fh:...].
    Autodiffed (segment_sum's VJP is the gather/scatter pair spmm_coo
    hand-writes); used by the multi-head COO GAT paths.
    """
    e_total, heads = att.shape
    fh = x.shape[1] // heads
    msgs = x[src].reshape(e_total, heads, fh) * att[:, :, None].astype(x.dtype)
    out = jax.ops.segment_sum(
        msgs.astype(jnp.float32), dst, num_segments=num_dst
    ).astype(x.dtype)
    return out.reshape(num_dst, heads * fh)
