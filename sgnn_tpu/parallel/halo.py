"""Graph-partition parallelism: vertex-sharded full-batch layers.

Reference: the NeutronStar distributed full-batch path — Gemini vertex-range
partitioning with master/mirror replicas; per-layer feature exchange
master→mirror forward and gradient mirror→master backward over MPI
send/recv threads (Graph::process_edges_forward/backward_decoupled,
core/graph.hpp:2535-3530; DistGetDepNbrOp etc.,
core/ntsDistCPUGraphOp.hpp:34-524; SURVEY.md §3.5).

TPU redesign: vertices are range-sharded over the mesh "graph" axis.  The
forward halo exchange is an `all_gather` of the activation shard over ICI
(XLA overlaps it with the local SpMM); the backward mirror→master gradient
push falls out of autodiff — the transpose of all_gather is psum_scatter,
inserted by JAX automatically.  No send/recv threads, no message buffers:
the sharding annotation IS the communication code.

For fanout-bounded sampled training the halo exchange is unnecessary (each
device samples self-contained blocks); this module serves the full-batch
engines and giant-graph scaling.
"""

from __future__ import annotations


from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np



from ..graph.adjacency import Adjacency
from ..sampler.blocks import pad_to
from ..utils.logging import get_logger

log = get_logger("sgnn.halo")


class ShardedGraph(NamedTuple):
    """Vertex-range-sharded COO, padded per shard (device-ready, stacked).

    Shard p owns the contiguous global vertex range [offsets[p],
    offsets[p+1]) and lays it out in SLOT space: global vertex g lives at
    slot `slot_of_vertex[g] = p·rows + (g - offsets[p])`.  With equal
    ranges slots coincide with global ids; degree-BALANCED ranges (the
    reference's tune_chunks cost model, core/graph.hpp:1837) make ranges
    ragged, and the slot layout absorbs the raggedness so every
    vertex-indexed device array stays one uniformly-stacked [n·rows, ...].
    Each shard's edge list holds every in-edge of its owned vertices: dst
    is LOCAL (0-based within the shard), src is a SLOT id (resolved against
    the all-gathered slot-layout activations).
    """

    offsets: np.ndarray          # [n_parts+1] owned-range boundaries
    slot_of_vertex: np.ndarray   # [V] int64 global vertex → slot
    src: jax.Array               # [n_parts, E_pad] int32 SLOT src ids
    dst_local: jax.Array         # [n_parts, E_pad] int32 local dst ids,
                                 #     ASCENDING (padding tail at rows-1)
    weight: jax.Array            # [n_parts, E_pad] f32, 0 = padding
    perm: jax.Array              # [n_parts, E_pad] int32 per-shard stable
                                 #     argsort of src (CSR order, static)
    inv_perm: jax.Array          # [n_parts, E_pad] int32 inverse of perm
    rows_per_shard: int          # padded owned-vertex count per shard

    @property
    def num_parts(self) -> int:
        return int(self.offsets.shape[0] - 1)

    @property
    def shard_meta(self) -> np.ndarray:
        """[n_parts, 2] int32 (global range start, owned count) per shard —
        the tiny per-device operand the sharded programs use for
        layout-invariant dropout slicing and real-row masking."""
        sizes = np.diff(self.offsets)
        return np.stack(
            [self.offsets[:-1], sizes], axis=1).astype(np.int32)


def shard_graph(
    adj: Adjacency, num_parts: int, weights: np.ndarray,
    pad_multiple: int = 512, balance: str = "equal",
) -> ShardedGraph:
    """Partition in-edges by destination owner (contiguous vertex ranges).

    balance="degree" (FullBatchTrainer's default): ranges balanced by the
    α·V + E cost model over in-degrees (tune_chunks, core/graph.hpp:1837;
    graph/partition.degree_balanced_ranges) — on power-law graphs the edge
    pad E_pad (max shard edge count, which EVERY shard pays in compute and
    memory) shrinks toward E/n instead of being set by the hub shard.
    balance="equal" (this function's default — slots coincide with global
    ids, so direct callers keep round-2 semantics): equal vertex ranges.
    Either way the row shard stays uniform (slot layout, see ShardedGraph).
    """
    v = adj.num_vertices
    if balance == "degree":
        from ..graph.partition import degree_balanced_ranges

        offsets = degree_balanced_ranges(adj.in_degree, num_parts)
        rows = pad_to(max(int(np.diff(offsets).max()), 1), 8)
    elif balance == "equal":
        rows = pad_to((v + num_parts - 1) // num_parts, 8)
        offsets = np.minimum(np.arange(num_parts + 1) * rows, v)
    else:
        raise ValueError(
            f"balance must be 'degree' or 'equal', got {balance!r}")
    offsets = offsets.astype(np.int64)
    sizes = np.diff(offsets)
    slot_of_vertex = np.empty(v, np.int64)
    for p in range(num_parts):
        s, e = int(offsets[p]), int(offsets[p + 1])
        slot_of_vertex[s:e] = p * rows + np.arange(e - s, dtype=np.int64)
    dst_of_edge = np.repeat(
        np.arange(v, dtype=np.int64), np.diff(adj.indptr).astype(np.int64)
    )
    owner = np.searchsorted(offsets, dst_of_edge, side="right") - 1
    src_slot_all = slot_of_vertex[adj.indices]
    e_pad = 0
    per_part = []
    for p in range(num_parts):
        sel = owner == p
        src = src_slot_all[sel].astype(np.int32)
        dst = (dst_of_edge[sel] - offsets[p]).astype(np.int32)
        w = weights[sel]
        per_part.append((src, dst, w))
        e_pad = max(e_pad, src.size)
    e_pad = pad_to(e_pad, pad_multiple)
    counts = [s.size for s, _, _ in per_part]
    log.info(
        "shard_graph(%s): %d shards x %d rows, edge counts %s -> E_pad %d "
        "(waste %.1f%%)", balance, num_parts, rows, counts, e_pad,
        100.0 * (num_parts * e_pad - sum(counts)) / max(num_parts * e_pad, 1),
    )
    srcs = np.zeros((num_parts, e_pad), np.int32)
    # pad dst at the last local row: each shard's dst_local stays ascending
    # (CSC order within the shard), so segment sums can run sorted
    dsts = np.full((num_parts, e_pad), rows - 1, np.int32)
    ws = np.zeros((num_parts, e_pad), np.float32)
    for p, (src, dst, w) in enumerate(per_part):
        srcs[p, : src.size] = src
        dsts[p, : dst.size] = dst
        ws[p, : w.size] = w
    perm, inv = _csr_orders(srcs)
    return ShardedGraph(
        offsets=offsets,
        slot_of_vertex=slot_of_vertex,
        src=jnp.asarray(srcs),
        dst_local=jnp.asarray(dsts),
        weight=jnp.asarray(ws),
        perm=jnp.asarray(perm),
        inv_perm=jnp.asarray(inv),
        rows_per_shard=rows,
    )


def _csr_orders(srcs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shard (perm, inv_perm): stable argsort of each row of [n, E_pad]
    srcs — the static CSR ordering that lets the backward scatter run as a
    sorted segment sum (ops/segment.spmm_coo_csc).  Native O(E) counting
    sort per shard (numpy fallback bit-identical)."""
    from ..sampler.native import stable_argsort

    key_range = int(srcs.max()) + 1 if srcs.size else 1
    perm = np.empty(srcs.shape, np.int32)
    inv = np.empty_like(perm)
    ar = np.arange(perm.shape[1], dtype=np.int32)
    for p in range(perm.shape[0]):
        perm[p] = stable_argsort(srcs[p], key_range)
        inv[p, perm[p]] = ar
    return perm, inv


def sharded_aggregate(
    x_shard: jax.Array,       # [rows, F] this device's owned activations
    src: jax.Array,           # [E_pad] global src ids (local shard of stack)
    dst_local: jax.Array,     # [E_pad]
    weight: jax.Array,        # [E_pad]
    perm: "jax.Array | None" = None,      # ShardedGraph.perm row (sorted
    inv_perm: "jax.Array | None" = None,  #   segment sums when provided)
    axis_name: str = "graph",
    planner=None,   # ops/segment.ShardedSpmmPlanner → windowed chunking
) -> jax.Array:
    """One partition-parallel aggregation step (call inside shard_map).

    all_gather(x) over ICI = the reference's master→mirror feature fetch;
    autodiff of the gather yields the mirror→master gradient reduction
    (reference backward decoupled engines) as a psum_scatter.
    """
    from ..ops.segment import spmm_coo, spmm_coo_csc

    x_full = jax.lax.all_gather(x_shard, axis_name, axis=0, tiled=True)
    if perm is not None:
        plan = planner.plan(x_full.shape[1]) if planner is not None else None
        return spmm_coo_csc(x_full, src, dst_local, weight, perm, inv_perm,
                            x_shard.shape[0], plan)
    return spmm_coo(x_full, src, dst_local, weight, x_shard.shape[0])


class TargetedHalo(NamedTuple):
    """Precomputed per-pair halo exchange plan (all_to_all, not broadcast).

    The all_gather halo ships EVERY owner's full activation shard to every
    device.  With graph locality each device only needs its mirror set —
    the reference ships exactly those rows via per-partition message
    buffers (NtsGraphCommunicator, comm/network.cpp:476-790).  TPU
    equivalent: a static send plan per (owner p → needer q) pair, exchanged
    with one `all_to_all` per layer, then local gathers resolve edges
    against [own rows ‖ received rows].

    send_idx[p, q, i] = LOCAL row index (within p's shard) of the i-th
    vertex p sends to q (padded with 0, count in send_cnt).  Per device q,
    `src_local` re-indexes its edge sources into the concat space:
    own rows occupy [0, rows); rows received from p occupy
    [rows + p*H_pad, rows + p*H_pad + send_cnt[p, q]).
    """

    send_idx: jax.Array     # [n, n, H_pad] int32 (dim0 = owner p, dim1 = q)
    src_local: jax.Array    # [n, E_pad] int32 edge srcs in concat space
    dst_local: jax.Array    # [n, E_pad] int32 (ascending, pad at rows-1)
    weight: jax.Array       # [n, E_pad] f32
    perm: jax.Array         # [n, E_pad] int32 per-shard argsort of src_local
    inv_perm: jax.Array     # [n, E_pad] int32 inverse of perm
    rows_per_shard: int
    halo_pad: int


def build_targeted_halo(
    adj: Adjacency, num_parts: int, weights: np.ndarray,
    pad_multiple: int = 256, balance: str = "equal",
) -> TargetedHalo:
    """Host-side construction of the static all_to_all halo plan.

    Works in SLOT space (ShardedGraph layout): a slot's owner is simply
    slot // rows, and a sent row's local index within its owner is
    slot - owner·rows — valid for both equal and degree-balanced ranges."""
    sg = shard_graph(adj, num_parts, weights, pad_multiple, balance=balance)
    rows = sg.rows_per_shard
    src_np = np.asarray(sg.src)     # SLOT ids
    n, e_pad = src_np.shape
    # per (q, p): unique remote src SLOTS q needs from p
    need: list = [[None] * n for _ in range(n)]
    h_pad = 1
    for q in range(n):
        srcs_q = src_np[q][np.asarray(sg.weight[q]) != 0]
        own = srcs_q // rows
        for p in range(n):
            if p == q:
                need[q][p] = np.zeros(0, np.int64)
                continue
            uniq = np.unique(srcs_q[own == p]).astype(np.int64)
            need[q][p] = uniq
            h_pad = max(h_pad, uniq.size)
    h_pad = pad_to(h_pad, 8)
    send_idx = np.zeros((n, n, h_pad), np.int32)
    for q in range(n):
        for p in range(n):
            u = need[q][p]
            send_idx[p, q, : u.size] = (u - p * rows).astype(np.int32)
    # re-index each shard's edge srcs into [own ‖ recv-from-0 ‖ recv-from-1…]
    src_local = np.zeros((n, e_pad), np.int32)
    for q in range(n):
        lookup = np.zeros(n * rows, np.int64)
        lookup[q * rows: (q + 1) * rows] = np.arange(rows)
        for p in range(n):
            u = need[q][p]
            lookup[u] = rows + p * h_pad + np.arange(u.size)
        src_local[q] = lookup[np.maximum(src_np[q], 0)]
    perm, inv = _csr_orders(src_local)
    return TargetedHalo(
        send_idx=jnp.asarray(send_idx),
        src_local=jnp.asarray(src_local),
        dst_local=sg.dst_local,
        weight=sg.weight,
        perm=jnp.asarray(perm),
        inv_perm=jnp.asarray(inv),
        rows_per_shard=rows,
        halo_pad=h_pad,
    )


def sharded_aggregate_targeted(
    x_shard: jax.Array,       # [rows, F] own activations
    send_idx: jax.Array,      # [n, H_pad] this device's send plan (dim0 = q)
    src_local: jax.Array,     # [E_pad] concat-space edge srcs
    dst_local: jax.Array,     # [E_pad]
    weight: jax.Array,        # [E_pad]
    perm: "jax.Array | None" = None,      # TargetedHalo.perm row (sorted
    inv_perm: "jax.Array | None" = None,  #   segment sums when provided)
    axis_name: str = "graph",
    planner=None,   # ops/segment.ShardedSpmmPlanner → windowed chunking
) -> jax.Array:
    """Aggregation with a targeted all_to_all halo (call inside shard_map).

    Ships only the mirror rows each pair actually needs — traffic
    n·H_pad·F instead of the all_gather's V·F — and the autodiff transpose
    routes mirror gradients back through the reverse all_to_all (the
    reference's mirror→master push, graph.hpp:3023).
    """
    from ..ops.segment import spmm_coo, spmm_coo_csc

    ext = targeted_halo_exchange(x_shard, send_idx, axis_name)
    if perm is not None:
        plan = planner.plan(ext.shape[1]) if planner is not None else None
        return spmm_coo_csc(ext, src_local, dst_local, weight, perm,
                            inv_perm, x_shard.shape[0], plan)
    return spmm_coo(ext, src_local, dst_local, weight, x_shard.shape[0])


def targeted_halo_exchange(
    x_shard: jax.Array, send_idx: jax.Array, axis_name: str = "graph"
) -> jax.Array:
    """all_to_all exchange of exactly the needed mirror rows → activations
    in the concat space [own rows ‖ recv-from-0 ‖ recv-from-1 …]."""
    # rows this device sends to each q: [n, H_pad, F]
    send = x_shard[send_idx]
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    # recv[p] = rows from device p; flatten into the concat space
    n = recv.shape[0]
    return jnp.concatenate(
        [x_shard, recv.reshape(n * recv.shape[1], -1)], axis=0
    )


def sharded_gat_layer(
    h_shard: jax.Array,       # [rows, F_in] own activations
    wl: jax.Array,            # [F_in, F_out] layer weight
    attn: jax.Array,          # [2*F_out, 1] attention vector (a_src ‖ a_dst)
    src_idx: jax.Array,       # [E_pad] edge srcs (global or concat space)
    dst_local: jax.Array,     # [E_pad] local dst ids
    valid: jax.Array,         # [E_pad] bool, False on padding
    send_idx: "jax.Array | None" = None,  # targeted-halo plan, else all_gather
    axis_name: str = "graph",
    heads: int = 1,
    perm: "jax.Array | None" = None,      # per-shard CSR order → sorted
    inv_perm: "jax.Array | None" = None,  #   segment ops when provided
    planner=None,   # ops/segment.ShardedSpmmPlanner → windowed chunking
    att_starts: "jax.Array | None" = None,  # [rows] per-shard first-edge
                                            # positions → gather-free
                                            # attention (fast_att)
) -> jax.Array:
    """One partition-parallel GAT layer (call inside shard_map).

    Reference DistEdgeSoftMax / DistGPUEdgeSoftMax
    (ntsDistCPUGraphOp.hpp:34-524, ntsDistGPUGraphOp.hpp:48-383): the master
    computes per-dst softmax over mirror-fetched neighbor scores.  Here the
    edge partition is BY DESTINATION OWNER, so every dst's softmax group is
    shard-local — only the transformed activations cross the mesh (halo),
    and the segment softmax + weighted SpMM run locally.

    With `att_starts` (ShardedSpmmPlanner.softmax_starts row) the layer
    runs the SAME gather-free attention formulation as the single-chip
    full_forward (measured 971→279 ms per layer at Reddit scale,
    docs/PERF.md round-3): per-dst score halves broadcast by telescoping
    scatter+cumsum, max-free clamped exponential, normalization off the
    edge axis.  The reference likewise runs one softmax kernel on both the
    local and distributed paths (DistEdgeSoftMax vs SingleEdgeSoftMax).
    """
    from ..ops.segment import (
        attention_exp,
        broadcast_dst_sorted,
        segment_softmax_coo,
        spmm_coo,
        spmm_coo_csc,
        spmm_coo_multihead,
        spmm_coo_multihead_csc,
    )

    sorted_dst = perm is not None  # new-style shards pad dst at rows-1
    fast_att = att_starts is not None and sorted_dst
    ht = jnp.dot(h_shard, wl, preferred_element_type=h_shard.dtype)
    f = ht.shape[-1]
    if send_idx is None:
        ext = jax.lax.all_gather(ht, axis_name, axis=0, tiled=True)
    else:
        ext = targeted_halo_exchange(ht, send_idx, axis_name)
    rows = h_shard.shape[0]
    e_pad = src_idx.shape[0]

    def dst_half(vec_rows):  # [rows] per-dst score half → [E_pad]
        if fast_att:
            return broadcast_dst_sorted(vec_rows, att_starts, e_pad,
                                        out_dtype=ht.dtype)
        return vec_rows[dst_local]

    def z_of(u):  # exact per-dst normalizer (sorted segment sum)
        return jax.ops.segment_sum(
            u.astype(jnp.float32), dst_local, num_segments=rows,
            indices_are_sorted=True)

    def norm(hagg, z):  # divide-after-aggregation, f32 then back
        z = jnp.maximum(z, jnp.finfo(jnp.float32).tiny)
        z = z.reshape(z.shape + (1,) * (hagg.ndim - z.ndim))
        return (hagg.astype(jnp.float32) / z).astype(ht.dtype)

    if heads > 1:
        fh = f // heads
        a_s = attn[:f, 0].reshape(heads, fh)
        a_d = attn[f:, 0].reshape(heads, fh)
        ha_ext = jnp.einsum("shf,hf->sh", ext.reshape(-1, heads, fh), a_s)
        ha_dst = jnp.einsum("shf,hf->sh", ht.reshape(-1, heads, fh), a_d)
        if fast_att:
            us = []
            for i in range(heads):  # per-head 1-D [E] arrays (fast_att)
                sc = jax.nn.leaky_relu(
                    ha_ext[:, i][src_idx] + dst_half(ha_dst[:, i]), 0.2)
                us.append(attention_exp(sc, valid))
            att = jnp.stack(us, axis=1)                     # [E, H]
        else:
            score = jax.nn.leaky_relu(
                ha_ext[src_idx] + ha_dst[dst_local], 0.2)
            att = segment_softmax_coo(score, dst_local, valid, rows,
                                      indices_are_sorted=sorted_dst)
        if perm is not None:
            plan = (planner.plan(f, live_factor=3)
                    if planner is not None else None)
            h = spmm_coo_multihead_csc(ext, src_idx, dst_local, att,
                                       perm, inv_perm, rows, plan)
        else:
            h = spmm_coo_multihead(ext, src_idx, dst_local, att, rows)
        if fast_att:
            z = jnp.stack([z_of(u) for u in us], axis=1)    # [rows, H]
            h = norm(h.reshape(rows, heads, fh), z).reshape(rows, f)
        return h
    # scalar per-edge gathers of precomputed per-vertex score halves
    score = (ext @ attn[:f, 0])[src_idx] + dst_half(ht @ attn[f:, 0])
    score = jax.nn.leaky_relu(score, 0.2)
    if fast_att:
        u = attention_exp(score, valid)
        plan = planner.plan(f) if planner is not None else None
        h = spmm_coo_csc(ext, src_idx, dst_local, u, perm, inv_perm,
                         rows, plan)
        return norm(h, z_of(u))
    att = segment_softmax_coo(score, dst_local, valid, rows,
                              indices_are_sorted=sorted_dst)
    if perm is not None:
        plan = planner.plan(f) if planner is not None else None
        return spmm_coo_csc(ext, src_idx, dst_local, att, perm, inv_perm,
                            rows, plan)
    return spmm_coo(ext, src_idx, dst_local, att, rows)
