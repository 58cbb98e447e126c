"""GCN / GraphSAGE / GAT forward passes over dense sampled blocks.

Reference model structure (toolkits/ engines):
  GCN/SAGE layer l (GCN_SAMPLE_ALLGPU.hpp:247-260 vertexForward):
      Y   = aggregate(block_l, X_l)              # SpMM with gcn/mean weights
      X'  = dropout(relu(Y · W_l))               # hidden layers
      X'  = log_softmax(Y · W_last)              # last layer
  (GCN uses symmetric-norm weights, SAGE uses mean weights — the only
   difference between the GCN* and GS* engines, GS_SAMPLE_ALLGPU.hpp:296.)

  GAT layer l (GAT_SAMPLE_ALL_GPU.hpp:308-393), two Parameters per layer
  (W: [in,out], a: [2·out,1], :143-146):
      H      = X_l · W_l                              # on the hop's src set
      e      = leaky_relu([H_src ‖ H_dst] · a, 0.2)   # per-edge scalar
      att    = edge_softmax(e)                        # per-destination
      X_{l+1} = relu(Σ_k att·H_src)                   # (src half × attention)
  followed by log_softmax at the loss (GAT_SAMPLE_ALL_GPU.hpp:397-404).

Models are pure functions over a params pytree → jit/grad/shard_map compose
directly; no op tape is needed (reference NtsContext, core/ntsContext.hpp:95,
exists only because libtorch autograd can't see the custom graph ops — JAX's
can, via the custom-VJP ops in sgnn_tpu/ops).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.functional import BN_EPS, dropout, log_softmax
from ..nn.layers import Dense, xavier_uniform_init
from ..ops.aggregate import (
    aggregate_edges_to_dst,
    edge_softmax,
    gather_aggregate,
    scatter_src_to_edges,
)
from ..sampler.blocks import SampledBatch, SampledBlock

MODEL_FAMILIES = ("gcn", "sage", "gat")


class GNNParams(NamedTuple):
    """Per-layer weights; attn is empty for GCN/SAGE, [2F',1]-style for GAT."""

    weights: Tuple[jax.Array, ...]        # W_l: [in_l, out_l]
    attn: Tuple[jax.Array, ...]           # GAT a_l: [2*out_l, 1] (else empty)


def init_model(
    key: jax.Array,
    family: str,
    layer_sizes: Sequence[int],
    dtype=jnp.float32,
) -> GNNParams:
    """W: xavier-uniform (torch parity).  GAT attention vectors `a`: ZEROS.

    Zero attention starts every layer at UNIFORM attention (softmax of all-
    zero scores) — a mean-aggregation warm start; `a` still gets gradients
    (d score/d a = [h_u‖h_v] ≠ 0).  Measured on Cora (40 ep, seeds 0-2):
    xavier-initialized attention makes GAT training an init lottery
    (whole-graph best train acc 0.93/0.995/0.996, sampled 0.93/0.99/0.85 —
    early attention saturates the per-dst softmax before W learns); zeros
    make the whole-graph engine consistently ≥0.995 (beating the external
    torch anchor's ~0.95, which rides the same lottery) and lift the
    sampled mean.  The reference's xavier `a`
    (GAT_SAMPLE_ALL_GPU.hpp:143-146) is a one-line revert if exact-init
    parity is ever needed."""
    assert family in MODEL_FAMILIES, family
    ws, atts = [], []
    for i in range(len(layer_sizes) - 1):
        key, k1, _k2 = jax.random.split(key, 3)
        ws.append(
            xavier_uniform_init(k1, layer_sizes[i], layer_sizes[i + 1], dtype=dtype)
        )
        if family == "gat":
            atts.append(jnp.zeros((2 * layer_sizes[i + 1], 1), dtype=dtype))
    return GNNParams(weights=tuple(ws), attn=tuple(atts))


def _gat_layer(
    w: jax.Array,
    a: jax.Array,
    block: SampledBlock,
    x: jax.Array,
    *,
    negative_slope: float = 0.2,
    pre_act: bool = True,
    heads: int = 1,
) -> jax.Array:
    """One GAT layer; `heads` > 1 splits the F' output columns into
    `heads` blocks, each with its own attention (concat-of-heads GAT —
    param SHAPES are unchanged from the single-head reference layer, the
    head structure reinterprets W's column blocks and a's rows; heads=1
    is bit-identical to the reference single-head rule,
    GAT_SAMPLE_ALL_GPU.hpp:308-393)."""
    h = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)  # [S, F']
    fprime = h.shape[-1]
    h_src_e = scatter_src_to_edges(h, block.nbr)                   # [D, K, F']
    h_dst = h[block.seed_in_src]                                   # [D, F']
    # [H_src ‖ H_dst]·a  ==  H_src·a[:F'] + H_dst·a[F':]  (split the concat)
    a_src = a[:fprime, 0].astype(h.dtype)
    a_dst = a[fprime:, 0].astype(h.dtype)
    mask = block.weight != 0.0
    if heads > 1:
        assert fprime % heads == 0, (fprime, heads)
        fh = fprime // heads
        d, k = h_src_e.shape[0], h_src_e.shape[1]
        src_h = h_src_e.reshape(d, k, heads, fh)
        dst_h = h_dst.reshape(d, heads, fh)
        score = jnp.einsum("dkhf,hf->dkh", src_h, a_src.reshape(heads, fh))
        score = score + jnp.einsum(
            "dhf,hf->dh", dst_h, a_dst.reshape(heads, fh)
        )[:, None, :]
        att = edge_softmax(jax.nn.leaky_relu(score, negative_slope), mask)
        out = aggregate_edges_to_dst(src_h, att).reshape(d, fprime)
    else:
        score = jnp.einsum("dkf,f->dk", h_src_e, a_src) + (h_dst @ a_dst)[:, None]
        score = jax.nn.leaky_relu(score, negative_slope)
        att = edge_softmax(score, mask)
        out = aggregate_edges_to_dst(h_src_e, att)                 # [D, F']
    return out if pre_act else jax.nn.relu(out)


def model_forward(
    params: GNNParams,
    family: str,
    batch: SampledBatch,
    *,
    drop_rate: float = 0.0,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    cache_emb: Optional[jax.Array] = None,
    remat: bool = False,
    heads: int = 1,
    batch_norm: bool = False,
) -> jax.Array:
    """Run the L-layer model; returns log-probs [num_seed_pad, classes].

    blocks are consumed input→output: layer l aggregates over
    batch.blocks[l], whose src set carries X_l (parity with the reference's
    reversed hop indexing, GAT_SAMPLE_ALL_GPU.hpp:323 `hop = L-2-i`).

    batch_norm: the BATCH_NORM cfg key (GraphSegment.cpp:323 — the
    reference parses and prints it but never consumes it; implemented for
    real here, like the full-batch engine's whole-graph variant,
    train/fullbatch.py): standardize each hidden layer's pre-activations
    per feature over the hop's VALID destination rows.  Statistics are
    masked so padded rows never contaminate them; batch-stats mode is used
    at eval too (no running state — pure functions compose under scan).
    """
    n_layers = len(params.weights)
    assert batch.num_layers == n_layers
    x = batch.x0
    keys = (
        jax.random.split(dropout_key, n_layers)
        if (train and drop_rate > 0.0 and dropout_key is not None)
        else [None] * n_layers
    )
    use_cache = (
        cache_emb is not None
        and batch.cache_mask is not None
        and n_layers > 1
    )
    def bn(t, valid):
        if not batch_norm:
            return t
        t32 = t.astype(jnp.float32)  # stats in f32 even for bf16 compute
        m = valid.astype(jnp.float32)[:, None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mu = jnp.sum(t32 * m, axis=0, keepdims=True) / cnt
        var = jnp.sum(jnp.square(t32 - mu) * m, axis=0, keepdims=True) / cnt
        return ((t32 - mu) * jax.lax.rsqrt(var + BN_EPS)).astype(t.dtype)

    # Sublinear activation memory (reference SubLinearMemCostNNOP,
    # ntsSubLinearNNOP.hpp:32): rematerialise hidden layers in backward
    # instead of storing their activations — jax.checkpoint does exactly
    # the recomputation that op stubs out.
    def gat_layer(w, a, block, x, *, heads=1):
        # bind `heads` at the function level (functools.partial) so
        # jax.checkpoint never sees it as a traceable argument
        fn = functools.partial(_gat_layer, heads=heads)
        return (jax.checkpoint(fn) if remat else fn)(w, a, block, x)
    for l in range(n_layers):
        block = batch.blocks[l]
        is_last = l == n_layers - 1
        if family == "gat":
            # multi-head attention on hidden layers (HEADS cfg key); the
            # classification layer stays single-head so heads never split
            # the class logits
            pre = gat_layer(
                params.weights[l], params.attn[l], block, x,
                heads=1 if is_last else heads,
            )
            if l == 0 and use_cache:
                pre = _merge_cache(pre, batch, cache_emb)
            # reference GAT applies relu at EVERY layer (X[i+1]=relu(nbr),
            # GAT_SAMPLE_ALL_GPU.hpp:389) and log_softmax at the loss (:397)
            if not is_last:
                pre = bn(pre, block.dst_valid)
            x = jax.nn.relu(pre)
            if is_last:
                # classification head in f32 regardless of compute dtype
                x = log_softmax(x.astype(jnp.float32))
        else:
            w = params.weights[l]

            # Aggregation is linear, so agg(X)·W == agg(X·W); when the layer
            # SHRINKS the feature dim (in > out), transforming first cuts the
            # gathered [D, K, F] intermediate and HBM traffic by in/out and
            # feeds the MXU one large dense matmul over the src set.  The
            # reference is locked into SpMM-then-GEMM by its op tape; this
            # reordering is a TPU-side win its design can't express.
            def agg_linear(w_, x_, nbr_, wgt_):
                if w_.shape[0] > w_.shape[1]:
                    xw = jnp.dot(x_, w_.astype(x_.dtype),
                                 preferred_element_type=x_.dtype)
                    return gather_aggregate(xw, nbr_, wgt_)
                y_ = gather_aggregate(x_, nbr_, wgt_)
                return jnp.dot(y_, w_.astype(y_.dtype),
                               preferred_element_type=y_.dtype)

            if remat and not is_last:
                agg_linear = jax.checkpoint(agg_linear)
            y = agg_linear(w, x, block.nbr, block.weight)
            if l == 0 and use_cache:
                y = _merge_cache(y, batch, cache_emb)
            if is_last:
                # classification head in f32 regardless of compute dtype
                x = log_softmax(y.astype(jnp.float32))
            else:
                x = jax.nn.relu(bn(y, block.dst_valid))
                if train and drop_rate > 0.0 and keys[l] is not None:
                    x = dropout(keys[l], x, drop_rate, train)
    return x


def _merge_cache(pre_act: jax.Array, batch: SampledBatch,
                 cache_emb: jax.Array) -> jax.Array:
    """Overlay cached hot-vertex pre-activations onto layer-0 output.

    Reference: load_share_embedding overwrites cached rows of Y·W before
    relu/dropout (GCN_SAMPLE_PD_CACHE.hpp:938; CUDA kernel
    dev_load_share_embedding, ntsCUDATransferKernel.cuh:344).  Cached rows
    are constants w.r.t. autodiff (reference PushDownOp sets
    requires_grad_(false), ntsPushdownGraphOp.hpp:122).
    """
    rows = jax.lax.stop_gradient(
        cache_emb[jnp.maximum(batch.cache_slot, 0)].astype(pre_act.dtype)
    )
    return jnp.where(batch.cache_mask[:, None], rows, pre_act)
