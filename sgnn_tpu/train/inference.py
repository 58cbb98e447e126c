"""Layer-wise full-graph inference — exact (non-sampled) serving/eval path.

The reference evaluates test accuracy through SAMPLED forward passes (e.g.
`Test()` in GCN_SAMPLE_PD_CACHE.hpp:264-295 runs the fanout sampler on the
eval nids), so its reported accuracy carries sampling noise and its serving
story inherits the fanout bias.  This module adds the standard remedy for
sample-trained GNNs: compute EXACT embeddings for every vertex, one layer
at a time, so each layer's full [V, F] activation is materialized once and
no neighborhood explosion occurs.

TPU design: per layer, (1) the dense transform H·W runs in vertex row
chunks on the MXU (transform-first always — SpMM and the dense transform
commute, so aggregating the transformed rows is mathematically identical
and moves the matmul to the smaller feature side); (2) aggregation runs in
destination-vertex chunks: the chunk's CSC slice is one padded COO, locally
reindexed to its UNIQUE sources (the reference sampCSC pattern), whose rows
are staged host→device with the native OpenMP row gather (sampler/native).
Chunking bounds device memory by O(chunk·F + S_chunk·F) with S_chunk the
unique-source count — dedup divides staging bytes by the in-chunk source
multiplicity; every chunk uses the same padded shapes, so XLA compiles each
layer-shape exactly once.

Per-destination GAT softmax is chunk-local by construction (a CSC slice
contains ALL in-edges of its destinations), so chunked attention equals
whole-graph attention bit-for-bit up to float reassociation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.adjacency import Adjacency
from ..models.gnn import GNNParams
from ..nn.functional import BN_EPS, log_softmax
from ..ops.segment import (
    SpmmPlanner, segment_softmax_coo, spmm_coo_fwd_sorted, spmm_coo_multihead,
)
from ..sampler.blocks import WeightKind, pad_to
from ..sampler.native import gather_rows
from ..utils.logging import get_logger

log = get_logger("sgnn.infer")


@functools.partial(jax.jit, static_argnames=("rows", "heads", "last",
                                              "raw"))
def _gat_chunk(src_rows, src_local, ht_dst, valid, dst_local, a_vec, rows,
               heads, last, raw=False):
    """One destination chunk of a GAT layer: edge scores → per-dst softmax
    → attention-weighted aggregation (reference BatchGPUEdgeSoftMax +
    AggregateDst pipeline, ntsPushdownGraphOp.hpp:578/:670).

    `src_rows` holds the chunk's UNIQUE transformed source rows;
    `src_local` maps each edge to its row (local reindex, the reference
    sampCSC pattern) — dedup cuts the host→HBM staging by the average
    in-chunk source multiplicity.  `dst_local` must be ascending with its
    padding tail at rows-1 (the chunk builder guarantees this) — the
    segment ops run with indices_are_sorted=True."""
    f = src_rows.shape[-1]
    a_src, a_dst = a_vec[:f, 0], a_vec[f:, 0]
    if heads > 1:
        fh = f // heads
        ha_s = jnp.einsum("shf,hf->sh", src_rows.reshape(-1, heads, fh),
                          a_src.reshape(heads, fh))
        ha_d = jnp.einsum("shf,hf->sh", ht_dst.reshape(-1, heads, fh),
                          a_dst.reshape(heads, fh))
        score = jax.nn.leaky_relu(ha_s[src_local] + ha_d[dst_local], 0.2)
        att = segment_softmax_coo(score, dst_local, valid, rows,
                                  indices_are_sorted=True)
        h = spmm_coo_multihead(src_rows, src_local, dst_local, att, rows,
                               indices_are_sorted=True)
    else:
        score = ((src_rows @ a_src)[src_local]
                 + (ht_dst @ a_dst)[dst_local])
        score = jax.nn.leaky_relu(score, 0.2)
        att = segment_softmax_coo(score, dst_local, valid, rows,
                                  indices_are_sorted=True)
        h = spmm_coo_fwd_sorted(src_rows, src_local, dst_local, att, rows)
    if raw:
        return h  # pre-activation (BN mode normalizes globally, then relu)
    h = jax.nn.relu(h)
    return log_softmax(h) if last else h


@functools.partial(jax.jit, static_argnames=("rows", "last", "raw"))
def _spmm_chunk(src_rows, src_local, weight, dst_local, rows, last,
                raw=False):
    """One destination chunk of a GCN/SAGE layer: weighted segment-sum of
    the (already transformed) unique source rows, edges reindexed local.
    `dst_local` ascending with padding at rows-1 → sorted segment sum."""
    h = spmm_coo_fwd_sorted(src_rows, src_local, dst_local, weight, rows)
    if raw:
        return h  # pre-activation (BN mode normalizes globally, then relu)
    return log_softmax(h) if last else jax.nn.relu(h)


@jax.jit
def _dense_chunk(x, w):
    return jnp.dot(x, w, preferred_element_type=x.dtype)


_full_fwd = {}
_planners = {}


def _planner_for(adj: Adjacency, dstp: np.ndarray,
                 srcp: np.ndarray) -> SpmmPlanner:
    """One SpmmPlanner per Adjacency object (keyed by identity, with the
    object kept alive in the cache) — repeated serving calls on the same
    graph reuse one planner, hence ONE compiled whole-graph program."""
    ent = _planners.get(id(adj))
    if ent is None or ent[0] is not adj:
        v = adj.num_vertices
        ent = (adj, SpmmPlanner(dstp, srcp, num_src=v, num_dst=v,
                                e_real=adj.num_edges))
        _planners[id(adj)] = ent
    return ent[1]


def _jit_full_forward(params, x, src, dst, w, *, family, num_vertices,
                      heads, batch_norm=False, aggregator="sum",
                      x_scale=None, planner=None, mxu=None, mxu_gat=None):
    """Lazily-jitted whole-graph forward (one compile per static config).

    `x_scale` ([F] per-column scales) marks int8-quantized resident
    features (FEATURE_DTYPE:int8) — full_forward folds them into W0.
    `planner` (ops/segment.SpmmPlanner) bounds chunked SpMM accumulation to
    dst windows so big-graph serving passes stay linear in E; it enters the
    compiled program only through static window ints (keyed by identity —
    the cache holds a reference so ids stay unique).
    `mxu`: optional ((srcs, dsts, wbits, visited, meta), (static,)) one-hot
    MXU SpMM forward plan (ops/pallas/mxu_spmm.py) — the 5 arrays are jit
    ARGUMENTS, never closure constants (hundreds of MB of compile payload
    otherwise), the static geometry keys the cache.
    `mxu_gat`: optional ((srcs, dsts, meta, visited), static) one-hot MXU
    attention plan (ops/pallas/mxu_gat.py) for family="gat" — same
    argument discipline."""
    global _full_fwd
    mxu_static = None if mxu is None else mxu[1]
    gat_static = None if mxu_gat is None else mxu_gat[1]
    key = (x_scale is not None,
           id(planner) if planner is not None else None,
           mxu_static, gat_static)
    if key not in _full_fwd:
        from .fullbatch import full_forward

        if key[0]:
            fn = jax.jit(
                lambda p, x, s, d, w, xs, mops, gops, fam, nv, h, bn, agg:
                full_forward(
                    p, fam, x, s, d, w, nv, heads=h, batch_norm=bn,
                    aggregator=agg, x_scale=xs,
                    fwd_sorted=True, planner=planner,
                    mxu=None if mops is None else (mops, mxu_static),
                    mxu_gat=None if gops is None else (gops, gat_static),
                ),
                static_argnums=(8, 9, 10, 11, 12),
            )
        else:
            fn = jax.jit(
                lambda p, x, s, d, w, mops, gops, fam, nv, h, bn, agg:
                full_forward(
                    p, fam, x, s, d, w, nv, heads=h, batch_norm=bn,
                    aggregator=agg,
                    fwd_sorted=True,  # dst is CSC-ascending, padded at nv-1
                    planner=planner,
                    mxu=None if mops is None else (mops, mxu_static),
                    mxu_gat=None if gops is None else (gops, gat_static),
                ),
                static_argnums=(7, 8, 9, 10, 11),
            )
        _full_fwd[key] = (fn, planner)  # keep planner alive (id stability)
    fn = _full_fwd[key][0]
    mops = None if mxu is None else mxu[0]
    gops = None if mxu_gat is None else mxu_gat[0]
    if key[0]:
        return fn(params, x, src, dst, w, x_scale, mops, gops, family,
                  num_vertices, heads, batch_norm, aggregator)
    return fn(params, x, src, dst, w, mops, gops, family, num_vertices,
              heads, batch_norm, aggregator)


def _serving_coo(adj: Adjacency, weight_kind: WeightKind, mean_style: str):
    """Full-graph CSC-order COO + edge weights for exact serving
    (identical arithmetic to fullbatch.build_coo)."""
    v = adj.num_vertices
    indptr = adj.indptr.astype(np.int64)
    src_all = adj.indices.astype(np.int32)
    dst_all = np.repeat(np.arange(v, dtype=np.int32), np.diff(indptr))
    if weight_kind == WeightKind.NONE:
        w_all = np.ones(src_all.size, np.float32)
    elif weight_kind == WeightKind.MEAN and mean_style == "plain":
        w_all = (1.0 / np.maximum(adj.in_degree[dst_all], 1)).astype(
            np.float32)
    else:
        w_all = adj.gcn_edge_weight(src_all, dst_all)
        if weight_kind == WeightKind.MEAN:  # "fullbatch" hybrid
            w_all = w_all / np.maximum(adj.in_degree[dst_all], 1)
        w_all = w_all.astype(np.float32)
    return src_all, dst_all, w_all


def _padded_serving_coo(adj: Adjacency, weight_kind: WeightKind,
                        mean_style: str):
    """`_serving_coo` padded for the single-program whole-graph forward:
    edge extent rounded to 512, `dst` padded at v-1 so the edge list stays
    CSC-ascending (the sorted-segment claim), padded weights 0."""
    v = adj.num_vertices
    src, dst, w = _serving_coo(adj, weight_kind, mean_style)
    pad = pad_to(max(src.size, 1), 512) - src.size
    return (np.pad(src, (0, pad)),
            np.pad(dst, (0, pad), constant_values=v - 1),
            np.pad(w, (0, pad)))


def layerwise_inference(
    params: GNNParams,
    family: str,
    adj: Adjacency,
    features: np.ndarray,
    *,
    weight_kind: Optional[WeightKind] = None,
    heads: int = 1,
    chunk_size: Optional[int] = None,
    mean_style: str = "plain",
    whole_graph: Optional[bool] = None,
    hbm_budget_bytes: Optional[int] = None,
    batch_norm: bool = False,
) -> np.ndarray:
    """Exact log-probabilities for ALL vertices: [V, classes] float32.

    `params` come from ANY trainer (sampled or full-batch) — the model
    families share one parameter pytree.  `chunk_size` bounds device
    residency; None picks 64Ki destinations (or V if smaller).

    `mean_style` selects the MEAN-aggregator weights: "plain" = 1/indeg
    (what the SAMPLED engines train with at full neighborhood — the
    sampled-count mean converges to it); "fullbatch" = the full-batch
    engine's sym-norm/indeg hybrid (fullbatch.build_coo), for models
    trained by FullBatchTrainer.

    `batch_norm`: serve BN-trained models (BATCH_NORM cfg key) — hidden
    pre-activations are standardized per feature over the FULL vertex set
    ("population" statistics; the sampled trainers normalize over each
    minibatch hop, so exact serving uses the deterministic whole-graph
    analogue, exactly like the *FULLBATCH engines' forward).

    `whole_graph` (None = auto by an HBM estimate): when features,
    activations and the COO fit on the device, run the whole pass as ONE
    jitted program per call (fullbatch.full_forward) — no host staging at
    all; chunked mode is the beyond-HBM fallback.
    """
    if weight_kind is None:
        weight_kind = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
                       "gat": WeightKind.NONE}[family]
    v = adj.num_vertices
    chunk = min(v, chunk_size or 65536)
    n_chunks = -(-v // chunk)
    indptr = adj.indptr.astype(np.int64)
    if whole_graph is None:
        # rough residency estimate: features + 2 activations + COO + slack
        dims = [features.shape[1]] + [int(np.asarray(w).shape[1])
                                      for w in params.weights]
        est = 4 * (v * (features.shape[1] + 2 * max(dims))
                   + 3 * adj.num_edges)
        if family == "gat":
            # per-edge score/attention/exp buffers ([E, heads] f32, several
            # alive across segment_softmax_coo) — without this term big-E
            # GAT graphs pick whole_graph mode and OOM instead of chunking
            est += 4 * adj.num_edges * max(heads, 1) * 4
        budget = hbm_budget_bytes or (8 << 30)
        whole_graph = est < budget

    if whole_graph:
        # fits-in-HBM fast path: the whole pass is ONE device program —
        # zero host staging (train/fullbatch.py supplies the program)
        srcp, dstp, wp = _padded_serving_coo(adj, weight_kind, mean_style)
        planner = _planner_for(adj, dstp, srcp)
        logp = _jit_full_forward(
            params,
            jnp.asarray(np.ascontiguousarray(features, np.float32)),
            jnp.asarray(srcp), jnp.asarray(dstp), jnp.asarray(wp),
            family=family, num_vertices=v, heads=heads,
            batch_norm=batch_norm, planner=planner,
        )
        return np.asarray(logp)
    src_all, _, w_all = _serving_coo(adj, weight_kind, mean_style)
    # local reindex per chunk (unique sources), computed once and reused by
    # every layer; one padded (edge, src-row) extent for all chunks → each
    # layer compiles once
    chunks = []
    for c in range(n_chunks):
        a, b = c * chunk, min((c + 1) * chunk, v)
        lo, hi = int(indptr[a]), int(indptr[b])
        uniq, inv = np.unique(src_all[lo:hi], return_inverse=True)
        dst_local = np.repeat(
            np.arange(b - a, dtype=np.int32),
            np.diff(indptr[a:b + 1]).astype(np.int64),
        )
        chunks.append((a, b, lo, hi, uniq.astype(np.int32),
                       inv.astype(np.int32), dst_local))
    e_pad = pad_to(max(max(hi - lo for _, _, lo, hi, *_ in chunks), 1), 512)
    s_pad = pad_to(max(max(u.size for *_, u, _, _ in chunks), 1), 128)

    h = np.ascontiguousarray(features, dtype=np.float32)
    n_layers = len(params.weights)
    for l in range(n_layers):
        wl = np.asarray(params.weights[l], np.float32)
        last = l == n_layers - 1
        hh = 1 if (family == "gat" and last) else heads
        # (1) dense transform, row-chunked on the MXU
        ht = np.empty((v, wl.shape[1]), np.float32)
        for c in range(n_chunks):
            a, b = c * chunk, min((c + 1) * chunk, v)
            ht[a:b] = np.asarray(_dense_chunk(jnp.asarray(h[a:b]),
                                              jnp.asarray(wl)))
        # (2) aggregation, destination-chunked with host row staging
        out_dim = wl.shape[1]
        h_next = np.empty((v, out_dim), np.float32)
        src_rows = np.empty((s_pad, out_dim), np.float32)
        for a, b, lo, hi, uniq, inv, dst_loc in chunks:
            n_e = hi - lo
            # pad at the last local row: dst_local stays ascending so the
            # chunk kernels can claim indices_are_sorted (weight/valid mask
            # the padding out of the result)
            dst_local = np.pad(dst_loc, (0, e_pad - n_e),
                               constant_values=max(b - a - 1, 0))
            src_local = np.pad(inv, (0, e_pad - n_e))
            # native OpenMP gather of the chunk's UNIQUE source rows
            idx = np.pad(uniq, (0, s_pad - uniq.size))
            uvalid = np.zeros(s_pad, bool)
            uvalid[: uniq.size] = True
            gather_rows(ht, idx, valid=uvalid, out=src_rows)
            valid = np.zeros(e_pad, bool)
            valid[:n_e] = True
            raw = batch_norm and not last
            if family == "gat":
                out = _gat_chunk(
                    jnp.asarray(src_rows), jnp.asarray(src_local),
                    jnp.asarray(ht[a:b]), jnp.asarray(valid),
                    jnp.asarray(dst_local),
                    jnp.asarray(np.asarray(params.attn[l], np.float32)),
                    rows=b - a, heads=hh, last=last, raw=raw,
                )
            else:
                wgt = np.zeros(e_pad, np.float32)
                wgt[:n_e] = w_all[lo:hi]
                out = _spmm_chunk(jnp.asarray(src_rows),
                                  jnp.asarray(src_local), jnp.asarray(wgt),
                                  jnp.asarray(dst_local), rows=b - a,
                                  last=last, raw=raw)
            h_next[a:b] = np.asarray(out)
        if batch_norm and not last:
            # whole-graph BN (same arithmetic as fullbatch.full_forward's
            # bn(): f32 stats, shared BN_EPS), then the deferred relu
            mu = h_next.mean(axis=0, keepdims=True, dtype=np.float32)
            var = h_next.var(axis=0, keepdims=True, dtype=np.float32)
            h_next = np.maximum(
                (h_next - mu) / np.sqrt(var + BN_EPS), 0.0
            ).astype(np.float32)
        h = h_next
    return h


def exact_accuracy(
    params: GNNParams,
    family: str,
    adj: Adjacency,
    features: np.ndarray,
    labels: np.ndarray,
    nids: np.ndarray,
    *,
    weight_kind: Optional[WeightKind] = None,
    heads: int = 1,
    chunk_size: Optional[int] = None,
    mean_style: str = "plain",
    logp: Optional[np.ndarray] = None,
    batch_norm: bool = False,
) -> float:
    """Exact (full-neighborhood) accuracy on `nids`; pass `logp` to reuse a
    previous layerwise_inference result across splits."""
    nids = np.asarray(nids)
    if nids.size == 0:
        return 0.0
    if logp is None:
        logp = layerwise_inference(params, family, adj, features,
                                   weight_kind=weight_kind, heads=heads,
                                   chunk_size=chunk_size,
                                   mean_style=mean_style,
                                   batch_norm=batch_norm)
    pred = np.argmax(logp[nids], axis=1)
    return float(np.mean(pred == np.asarray(labels)[nids]))


def _bucket(n: int, minimum: int) -> int:
    """Next power of two ≥ max(n, minimum) — bounds the number of distinct
    compiled shapes per layer to O(log V) across all request sizes."""
    return 1 << max(n - 1, minimum - 1, 1).bit_length()


def _in_edges(indptr: np.ndarray, dsts: np.ndarray):
    """(edge_ids, dst_local) for ALL in-edges of `dsts` (ascending ids).

    `edge_ids` index the global CSC arrays (indices / serving weights);
    `dst_local` is ascending because `dsts` is ascending and each
    destination's edges are contiguous in CSC order."""
    starts = indptr[dsts]
    lens = indptr[dsts + 1] - starts
    total = int(lens.sum())
    pos = np.cumsum(lens) - lens
    edge_ids = (np.arange(total, dtype=np.int64)
                - np.repeat(pos, lens) + np.repeat(starts, lens))
    dst_local = np.repeat(np.arange(dsts.size, dtype=np.int32),
                          lens).astype(np.int32)
    return edge_ids, dst_local


@functools.partial(jax.jit, static_argnames=("family", "heads",
                                              "aggregator"))
def _query_forward(params, x_all, gids0, layers, family, heads,
                   aggregator="sum", x_scale=None):
    """Exact forward over an L-hop query neighborhood (one device program).

    `layers[l] = (src_local, dst_local, w, dst_in_src)`: the layer's edges
    local-reindexed to its source/destination vertex sets, `dst_local`
    ascending with the padding tail at the last row (sorted segment ops),
    `w == 0` marking padded edges, and `dst_in_src[j]` the row of
    destination j inside the source set (sets are nested, so every
    destination IS a source — GAT's h_dst gather).  Arithmetic mirrors
    `fullbatch.full_forward` layer by layer so query results match the
    whole-graph pass on the queried rows.
    """
    h = x_all[gids0]
    if x_scale is not None:  # int8 residency: dequant the gathered rows
        h = h.astype(x_scale.dtype) * x_scale
    n_layers = len(params.weights)
    for l, (src_local, dst_local, w, dst_in_src) in enumerate(layers):
        wl = params.weights[l].astype(h.dtype)
        w_edge = w.astype(h.dtype)
        n_dst = dst_in_src.shape[0]
        last = l == n_layers - 1
        if aggregator in ("min", "max") and family != "gat":
            # AGGREGATOR min/max (always transform-first, like full_forward)
            from ..ops.reductions import segment_max_coo, segment_min_coo

            red = segment_min_coo if aggregator == "min" else segment_max_coo
            h = red(jnp.dot(h, wl, preferred_element_type=h.dtype),
                    src_local, dst_local, w != 0, n_dst,
                    indices_are_sorted=True)
            h = (log_softmax(h.astype(jnp.float32)) if last
                 else jax.nn.relu(h))
            continue
        if family == "gat":
            ht = jnp.dot(h, wl, preferred_element_type=h.dtype)
            f = ht.shape[-1]
            a_src = params.attn[l][:f, 0].astype(ht.dtype)
            a_dst = params.attn[l][f:, 0].astype(ht.dtype)
            valid = w != 0
            edge_dst = dst_in_src[dst_local]  # edge → dst's row in src set
            hh = 1 if last else heads
            if hh > 1:
                fh = f // hh
                ht_h = ht.reshape(-1, hh, fh)
                ha_s = jnp.einsum("shf,hf->sh", ht_h, a_src.reshape(hh, fh))
                ha_d = jnp.einsum("shf,hf->sh", ht_h, a_dst.reshape(hh, fh))
                score = jax.nn.leaky_relu(
                    ha_s[src_local] + ha_d[edge_dst], 0.2)
                att = segment_softmax_coo(score, dst_local, valid, n_dst,
                                          indices_are_sorted=True)
                h = spmm_coo_multihead(ht, src_local, dst_local, att, n_dst,
                                       indices_are_sorted=True)
            else:
                # scalar per-edge gathers of precomputed per-vertex halves
                score = (ht @ a_src)[src_local] + (ht @ a_dst)[edge_dst]
                score = jax.nn.leaky_relu(score, 0.2)
                att = segment_softmax_coo(score, dst_local, valid, n_dst,
                                          indices_are_sorted=True)
                h = spmm_coo_fwd_sorted(ht, src_local, dst_local, att,
                                        n_dst)
            h = jax.nn.relu(h)
            h = log_softmax(h.astype(jnp.float32)) if last else h
        else:
            if wl.shape[0] > wl.shape[1]:  # transform-first
                h = spmm_coo_fwd_sorted(
                    jnp.dot(h, wl, preferred_element_type=h.dtype),
                    src_local, dst_local, w_edge, n_dst)
            else:
                h = jnp.dot(
                    spmm_coo_fwd_sorted(h, src_local, dst_local, w_edge,
                                        n_dst),
                    wl, preferred_element_type=h.dtype)
            h = (log_softmax(h.astype(jnp.float32)) if last
                 else jax.nn.relu(h))
    return h


class InferenceServer:
    """Production serving loop: graph + features RESIDENT in HBM.

    `layerwise_inference` re-stages the feature matrix and the COO from the
    host on every call — right for a one-shot exact eval, wasteful for a
    serving loop (at Reddit scale each pass re-ships ~700 MB).  The server
    uploads the padded COO and features ONCE; every `logprobs()` call is
    then a single jitted device program over resident arrays, and
    `update_params` swaps in fresh weights between passes for free (params
    travel per call as small jit arguments, so serving an actively-training
    model costs one tiny transfer per refresh).

    Reference analog: the engines keep topology and features device-
    resident across Test() epochs (genereate_gpu_data,
    core/ntsDataloador.hpp:481) rather than re-staging per evaluation.
    Exactness is the same full-neighborhood forward as
    `layerwise_inference(whole_graph=True)`.  Graphs beyond HBM stay on the
    chunked `layerwise_inference` path (which exists precisely for them).

    `dtype=jnp.bfloat16` halves residency and upload for bf16-trained
    models (the classification head stays f32 inside the forward).
    """

    def __init__(
        self,
        params: GNNParams,
        family: str,
        adj: Adjacency,
        features: np.ndarray,
        *,
        weight_kind: Optional[WeightKind] = None,
        heads: int = 1,
        mean_style: str = "plain",
        batch_norm: bool = False,
        aggregator: str = "sum",
        dtype=np.float32,
        mxu_spmm: str = "auto",
    ) -> None:
        if weight_kind is None:
            weight_kind = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
                           "gat": WeightKind.NONE}[family]
        self.family = family
        self.heads = heads
        self.batch_norm = batch_norm
        # AGGREGATOR cfg key: serve min/max-trained models with the same
        # reduction they trained with (FullBatchTrainer aggregator param)
        self.aggregator = aggregator
        self._weight_kind = weight_kind
        self._mean_style = mean_style
        self._qrng = np.random.default_rng(0)  # query(fanout=...) draws
        self.num_vertices = adj.num_vertices
        srcp, dstp, wp = _padded_serving_coo(adj, weight_kind, mean_style)
        self._src = jnp.asarray(srcp)
        self._dst = jnp.asarray(dstp)
        self._w = jnp.asarray(wp)
        # dst-window plan: resident passes on big graphs chunk into bounded
        # row windows (linear in E) instead of a [V, F] add per chunk
        self._planner = _planner_for(adj, dstp, srcp)
        # dtype=jnp.int8 (or "int8"): quantized residency — 4x the f32
        # rows per HBM byte (FEATURE_DTYPE:int8 serving analog); the
        # forward folds the per-column scales into W0 (data/quant.py)
        self._x_scale = None
        if dtype in ("int8", np.int8) or dtype == jnp.int8:
            from ..data.quant import quantize_columns

            q, scale = quantize_columns(features)
            self._x = jnp.asarray(q)
            self._x_scale = jnp.asarray(scale)
        else:
            self._x = jnp.asarray(np.ascontiguousarray(features, dtype))
        self.params = params
        # host-side CSC + serving weights for query-neighborhood planning
        # (indices stay int32 — half the planning memory; only the edge
        # OFFSETS need int64)
        self._h_indptr = adj.indptr.astype(np.int64)
        self._h_indices = adj.indices.astype(np.int32)
        self._h_w = wp[: adj.num_edges]
        self._seen_query_shapes: set = set()
        # one-hot MXU SpMM forward plan for the resident exact pass
        # (ops/pallas/mxu_spmm.py; 63.9 vs 178.9 ms per SpMM at Reddit
        # scale).  auto: TPU + bf16 residency + static-weight families —
        # the kernel computes in bf16, so f32 servers keep the exact
        # windowed path unless forced with mxu_spmm="on".
        self._mxu = None
        self._mxu_gat = None
        auto_on = (mxu_spmm == "on" or (
            mxu_spmm != "off" and jax.default_backend() == "tpu"
            and self._x.dtype == jnp.bfloat16))
        if family != "gat" and aggregator == "sum" and auto_on:
            from ..ops.pallas.mxu_spmm import build_mxu_spmm_pair_auto

            plan = build_mxu_spmm_pair_auto(
                srcp[: adj.num_edges], dstp[: adj.num_edges],
                wp[: adj.num_edges], adj.num_vertices, adj.num_vertices,
                fwd_only=True)
            if plan is not None:
                self._mxu = ((*plan.operands, plan.meta), (plan.static,))
        elif family == "gat" and auto_on:
            # one-hot MXU attention tier (ops/pallas/mxu_gat.py): the
            # whole attention layer — score gathers, clamped softmax
            # weights, weighted aggregation, normalizers — runs as one
            # kernel pass per layer (weights computed in-kernel from
            # per-vertex tables, so the plan needs no edge weights)
            from ..ops.pallas.mxu_gat import build_mxu_gat_plan_auto

            plan = build_mxu_gat_plan_auto(
                srcp[: adj.num_edges], dstp[: adj.num_edges],
                adj.num_vertices, adj.num_vertices)
            if plan is not None:
                self._mxu_gat = (plan.operands, plan.static)

    def warmup(self, sizes=(8, 64, 512), reps: int = 3, fanout=None,
               seed: int = 0, adaptive: bool = False, max_reps: int = 12,
               patience: int = 3, neighbors: bool = False) -> int:
        """Pre-compile the query programs for the expected request-size
        buckets, so a warm request stream shows no bucket-boundary compile
        spikes (measured ~1.2 s entries at Reddit scale, docs/PERF.md).

        Request sizes bucket to powers of two, but the EDGE extents depend
        on the drawn neighborhoods — `reps` draws per size cover the
        common edge buckets.  `adaptive=True` keeps drawing per size until
        `patience` consecutive draws discover no new shape (≤ max_reps);
        `neighbors=True` then ALSO pre-compiles the ±1-bucket edge-extent
        variants of every seen shape with synthetic operands — the rare
        neighborhoods that spill one bucket past the warmed grid were the
        measured warm-stream p99 spikes (VERDICT r4 Missing #6).  Returns
        the number of distinct shape buckets compiled."""
        rng = np.random.default_rng(seed)
        before = len(self._seen_query_shapes)
        for s in sizes:
            n = int(min(s, self.num_vertices))
            stale = 0
            for r in range(max_reps if adaptive else reps):
                seen = len(self._seen_query_shapes)
                nids = rng.choice(self.num_vertices, size=n, replace=False)
                self.query(nids, fanout=fanout,
                           seed=int(rng.integers(1 << 31)))
                if adaptive:
                    stale = (stale + 1
                             if len(self._seen_query_shapes) == seen else 0)
                    if stale >= patience:
                        break
        if neighbors:
            cap = _bucket(self.num_vertices, 128)
            for key in list(self._seen_query_shapes):
                set_pads, e_pads = key
                for li in range(len(e_pads)):
                    for nxt in (e_pads[li] * 2, max(e_pads[li] // 2, 512)):
                        var = list(e_pads)
                        var[li] = nxt
                        self._warm_shape((set_pads, tuple(var)))
                # the SET pads spill buckets too (a request whose
                # neighborhood is one bucket larger/smaller than any
                # warmed draw's)
                for si in range(len(set_pads)):
                    for nxt in (min(set_pads[si] * 2, cap),
                                max(set_pads[si] // 2, 128)):
                        var = list(set_pads)
                        var[si] = nxt
                        self._warm_shape((tuple(var), e_pads))
        compiled = len(self._seen_query_shapes) - before
        log.info("warmup: sizes %s -> %d shape buckets (adaptive=%s, "
                 "neighbors=%s)", tuple(sizes), compiled, adaptive,
                 neighbors)
        return compiled

    def _warm_shape(self, shape_key) -> None:
        """Compile the query program for an explicit (set_pads, e_pads)
        bucket with synthetic operands (no host neighborhood planning) —
        results are discarded; only the jit cache entry matters."""
        set_pads, e_pads = shape_key
        if shape_key in self._seen_query_shapes:
            return
        self._seen_query_shapes.add(shape_key)
        layers = []
        for l, e_pad in enumerate(e_pads):
            n_dst = set_pads[l + 1]
            layers.append((
                jnp.zeros(e_pad, jnp.int32),
                jnp.zeros(e_pad, jnp.int32),
                jnp.zeros(e_pad, jnp.float32),
                jnp.zeros(n_dst, jnp.int32),
            ))
        gids0 = jnp.zeros(set_pads[0], jnp.int32)
        logp = _query_forward(self.params, self._x, gids0, tuple(layers),
                              family=self.family, heads=self.heads,
                              aggregator=self.aggregator,
                              x_scale=self._x_scale)
        float(logp[0, 0])  # sync via host read (block_until_ready is a
        #                    no-op on the tunneled platform, docs/PERF.md)

    def update_params(self, params: GNNParams) -> None:
        self.params = params

    def logprobs(self, as_numpy: bool = True):
        """One exact full-graph pass: [V, classes] log-probs.

        `as_numpy=False` keeps the result on the device (skip the
        device→host transfer when only a slice is needed)."""
        logp = _jit_full_forward(
            self.params, self._x, self._src, self._dst, self._w,
            family=self.family, num_vertices=self.num_vertices,
            heads=self.heads, batch_norm=self.batch_norm,
            aggregator=self.aggregator, x_scale=self._x_scale,
            planner=self._planner, mxu=self._mxu, mxu_gat=self._mxu_gat,
        )
        return np.asarray(logp) if as_numpy else logp

    def predict(self) -> np.ndarray:
        """Class predictions for every vertex: [V] int."""
        return np.argmax(self.logprobs(), axis=-1)

    def query(self, nids, fanout=None, seed=None) -> np.ndarray:
        """Low-latency exact log-probs for just `nids`: [len(nids), C].

        Instead of a whole-graph pass, walks the CSC L hops back from the
        queried vertices on the host (the reference Test() walks the same
        neighborhood but SAMPLED, GCN_SAMPLE_PD_CACHE.hpp:264; this is
        exact by default), local-reindexes each hop, and runs ONE jitted
        program over the resident feature matrix — the per-request serving
        path.  All extents are padded to powers of two, so repeated
        request sizes reuse compiled programs; results equal
        `logprobs()[nids]` up to float reassociation.

        `fanout` (int, or one int per hop, seed-hop-first like cfg.fanout:
        fanout[0] applies to the queried seeds, the reference convention,
        ntsFastSampler.hpp:1003) caps the in-edges kept per destination at
        each hop — the reference's sampled-Test semantics.  On power-law graphs a hub's
        exact 2-hop neighborhood can be most of the graph; a fanout bounds
        the worst-case request latency at the cost of sampling noise.
        MEAN/"plain" weights are recomputed as 1/sampled-count (the
        sampled trainers' rule); GCN weights keep the global-degree table
        values (UP_DEGREE=0 semantics).  `seed` makes one call
        reproducible; otherwise the server's own RNG stream advances.
        """
        if self.batch_norm:
            # whole-graph BN statistics need a full pass anyway
            return np.asarray(self.logprobs())[np.asarray(nids)]
        nids = np.asarray(nids, dtype=np.int64)
        uniq, inv = np.unique(nids, return_inverse=True)
        n_layers = len(self.params.weights)
        if fanout is not None:
            fanouts = ([int(fanout)] * n_layers if np.isscalar(fanout)
                       else [int(f) for f in fanout])
            if len(fanouts) != n_layers:
                raise ValueError(
                    f"fanout needs {n_layers} entries, got {len(fanouts)}")
            rng = (np.random.default_rng(seed) if seed is not None
                   else self._qrng)
        # plan hop sets top-down: sets[l] = sources of layer l (nested:
        # every layer's destinations are contained in its sources)
        dst_set = uniq
        plan = []  # per layer, bottom-up after reversal
        for hop in range(n_layers):
            eids, dst_local = _in_edges(self._h_indptr, dst_set)
            if fanout is not None and eids.size:
                # the plan walks top-down (hop 0 = the queried seeds), and
                # cfg.fanout is seed-hop-first — same index order
                k = fanouts[hop]
                # keep k uniform draws per destination: rank each edge by
                # a random key within its dst segment (distinct edges,
                # like the host sampler's Floyd draws)
                order = np.lexsort((rng.random(eids.size), dst_local))
                seg_first = np.searchsorted(dst_local[order],
                                            np.arange(dst_set.size))
                pos = (np.arange(eids.size)
                       - seg_first[dst_local[order]])
                keep = np.sort(order[pos < k])  # back to CSC order
                eids, dst_local = eids[keep], dst_local[keep]
            w = self._h_w[eids]
            if (fanout is not None
                    and self._weight_kind == WeightKind.MEAN
                    and self._mean_style == "plain"):
                cnt = np.bincount(dst_local, minlength=dst_set.size)
                w = (1.0 / np.maximum(cnt[dst_local], 1)).astype(np.float32)
            src_g = self._h_indices[eids]
            src_set = np.union1d(dst_set, src_g)
            plan.append((src_set,
                         np.searchsorted(src_set, src_g).astype(np.int32),
                         dst_local,
                         w,
                         np.searchsorted(src_set, dst_set).astype(np.int32),
                         dst_set))
            dst_set = src_set
        plan.reverse()
        # nested pads: layer l maps rows set_pad[l] → set_pad[l+1]
        set_pads = [
            _bucket(p[0].size, 128) for p in plan
        ] + [_bucket(uniq.size, 128)]
        layers = []
        for l, (src_set, src_local, dst_local, w, dst_in_src, dsts) in (
                enumerate(plan)):
            e_pad = _bucket(src_local.size, 512)
            n_dst_pad = set_pads[l + 1]
            layers.append((
                jnp.asarray(np.pad(src_local, (0, e_pad - src_local.size))),
                # pad tail at the last row keeps dst_local ascending
                jnp.asarray(np.pad(dst_local, (0, e_pad - dst_local.size),
                                   constant_values=n_dst_pad - 1)),
                jnp.asarray(np.pad(w, (0, e_pad - w.size))),
                jnp.asarray(np.pad(dst_in_src,
                                   (0, n_dst_pad - dst_in_src.size))),
            ))
        gids0 = jnp.asarray(np.pad(plan[0][0], (0, set_pads[0]
                                                - plan[0][0].size)))
        # bucket observability: a shape key unseen by this server means a
        # fresh XLA compile (the warm-stream latency spikes); warmup()
        # pre-populates the common buckets
        shape_key = (tuple(set_pads),
                     tuple(int(l[0].shape[0]) for l in layers))
        if shape_key not in self._seen_query_shapes:
            self._seen_query_shapes.add(shape_key)
            log.info("query-shape compile: sets %s edges %s",
                     shape_key[0], shape_key[1])
        logp = _query_forward(self.params, self._x, gids0, tuple(layers),
                              family=self.family, heads=self.heads,
                              aggregator=self.aggregator,
                              x_scale=self._x_scale)
        return np.asarray(logp)[:uniq.size][inv]
