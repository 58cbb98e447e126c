"""On-device fanout sampling (XLA, jit-compatible, static shapes).

Reference analog: the GPU sampler (`sample_gpu_fast`,
core/ntsFastSampler.hpp:648 → warp-traverse kernels
cuda/ntsCUDATransferKernel.cuh:852-1105 with a per-thread LCG `ntsRandom`).

TPU redesign: sampling is expressed as dense vectorised ops under jit —
uniform position draws with `jax.random`, per-row duplicate masking (sort
over the static fanout axis), and `jnp.unique(..., size=N)` for the source
set with a static bound.  The whole-graph CSC lives in HBM as two padded
arrays.  Compared to the host sampler this keeps the entire
sample→gather→train step on device with zero host round-trips; duplicates
within a row are masked rather than redrawn (the reference GPU reservoir
sampler is exact w/o replacement — accuracy impact is negligible and tested).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .blocks import SampledBatch, SampledBlock, WeightKind


def _edge_weights(keep, nbr_local, num_src_pad, fanout, weight_kind,
                  degree_mode="sampled", nbr_global=None, seeds=None,
                  in_degree=None, out_degree=None):
    """Edge weights (get_weight/get_mean_weight kernels,
    cuda/ntsCUDATransferKernel.cuh:293-343).

    degree_mode="global" (reference default, UP_DEGREE=0): degrees come from
    the full-graph HBM tables — no per-batch histogram at all.
    degree_mode="sampled" (UP_DEGREE=1): degrees recomputed within the
    sampled subgraph (UpdateDegree kernel parity)."""
    if weight_kind == WeightKind.NONE:
        return keep.astype(jnp.float32)
    if degree_mode == "global":
        if weight_kind == WeightKind.MEAN:
            # Plain mean aggregator (1/sampled-count) — the standard
            # GraphSAGE rule, needing NO degree tables or histogram.
            # Deliberate deviation: the reference's global-degree mean
            # hybrids (GPU gcn_norm/edges_num ntsCUDATransferKernel.cuh:319,
            # CPU gcn_norm/global_in_deg ntsFastSampler.hpp:1117) are
            # ill-conditioned on high-degree graphs — measured collapse to
            # 5% train acc on the Reddit-scale synthetic where plain mean
            # (and the sampled-degree hybrid) reach 97-99% (docs/PERF.md).
            cnt = jnp.maximum(jnp.sum(keep, axis=1), 1).astype(jnp.float32)
            return jnp.where(keep, 1.0 / cnt[:, None], 0.0)
        od = jnp.maximum(out_degree[jnp.maximum(nbr_global, 0)], 1)
        idg = jnp.maximum(in_degree[seeds], 1)
        w = 1.0 / (
            jnp.sqrt(od.astype(jnp.float32))
            * jnp.sqrt(idg.astype(jnp.float32))[:, None]
        )
        return jnp.where(keep, w, 0.0)
    samp_in = jnp.sum(keep, axis=1).astype(jnp.int32)
    samp_in = jnp.where(samp_in == 0, fanout, samp_in)
    # slot-wise histogram (invalid slots add 0): K 1-D scatters outrun one
    # [D,K]-indexed scatter on TPU, same as the aggregation VJP
    counts = jnp.zeros(num_src_pad, jnp.int32)
    for k in range(fanout):
        counts = counts.at[nbr_local[:, k]].add(
            keep[:, k].astype(jnp.int32), mode="drop"
        )
    out_deg = jnp.maximum(counts[nbr_local], 1)
    w = 1.0 / (
        jnp.sqrt(out_deg.astype(jnp.float32))
        * jnp.sqrt(samp_in.astype(jnp.float32))[:, None]
    )
    if weight_kind == WeightKind.MEAN:
        edges_num = jnp.maximum(jnp.sum(keep, axis=1), 1)
        w = w / edges_num[:, None].astype(jnp.float32)
    return jnp.where(keep, w, 0.0)


def _sample_hop(
    key: jax.Array,
    seeds: jax.Array,          # int32 [B] global ids (padded, use dst_valid)
    dst_valid: jax.Array,      # bool [B]
    indptr: jax.Array,         # int64/int32 [V+1]
    indices: jax.Array,        # int32 [E_pad]
    fanout: int,
    num_src_pad: int,
    weight_kind: WeightKind,
    in_degree: jax.Array,
    out_degree: jax.Array,
    identity_srcs: bool = False,
    omit_map: "jax.Array | None" = None,
    degree_mode: str = "sampled",
) -> Tuple[SampledBlock, jax.Array, jax.Array]:
    b = seeds.shape[0]
    start = indptr[seeds]
    deg = (indptr[seeds + 1] - start).astype(jnp.int32)
    if omit_map is not None:
        # cache-omitting sampling (reference sample_gpu_fast_omit /
        # sample_processing_get_co_gpu_kernel_omit): cached destinations are
        # not expanded — their layer-0 output comes from the hot cache
        deg = jnp.where(omit_map[seeds] >= 0, 0, deg)
    # uniform position draw (with replacement) over each row's degree;
    # the f32 product can round up to exactly deg for large degrees, so clamp
    # to deg-1 (else start+pos reads the next vertex's edge range)
    u = jax.random.uniform(key, (b, fanout))
    draw = jnp.minimum(
        (u * deg[:, None].astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(deg[:, None] - 1, 0),
    )
    pos = jnp.where(
        deg[:, None] <= fanout,
        jnp.broadcast_to(jnp.arange(fanout, dtype=jnp.int32), (b, fanout)),
        draw,
    )
    valid = (jnp.arange(fanout)[None, :] < deg[:, None]) & dst_valid[:, None]
    # mask in-row duplicate positions WITHOUT sort/scatter: slot k is a dup
    # iff an earlier slot j<k drew the same position — an O(K²) pairwise
    # compare that is pure vectorised VPU work (K ≤ fanout ≤ ~25), far
    # cheaper on TPU than the argsort + 2.3M-element scatter-back it
    # replaces.
    eq = pos[:, None, :] == pos[:, :, None]          # [B, K(k), K(j)]
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (fanout, fanout), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (fanout, fanout), 0)
    )  # earlier[k, j] = j < k
    dup = jnp.any(eq & earlier[None], axis=2)
    keep = valid & ~dup
    nbr_global = jnp.where(
        keep, indices[jnp.clip(start[:, None] + pos, 0, indices.shape[0] - 1)], -1
    )
    num_vertices = indptr.shape[0] - 1
    if identity_srcs:
        # Bottom hop whose source bound is the whole vertex set: the local
        # index space IS the global id space, so dedup/reindex (and the
        # caller's feature re-gather) are identity operations — skip them.
        assert num_src_pad == num_vertices
        srcs = jax.lax.broadcasted_iota(jnp.int32, (num_src_pad,), 0)
        block = SampledBlock(
            nbr=jnp.maximum(nbr_global, 0),
            weight=_edge_weights(keep, jnp.maximum(nbr_global, 0),
                                 num_src_pad, fanout, weight_kind,
                                 degree_mode, nbr_global, seeds,
                                 in_degree, out_degree),
            srcs=srcs,
            seeds=seeds,
            dst_valid=dst_valid,
            src_valid=jnp.ones((num_src_pad,), bool),
            seed_in_src=seeds,
        )
        return (block, jnp.asarray(num_src_pad, jnp.int32),
                jnp.zeros((), jnp.int32))
    # source set: unique(valid neighbors ∪ seeds) WITHOUT sorting — a
    # 2.75M-element device sort per hop dominated the step; instead scatter a
    # presence bitmap over [V], prefix-sum it into dense ranks, and scatter
    # the ids into their rank slots (the device analogue of the reference's
    # bitmap + src_index_array reindex, ntsFastSampler.hpp:1062-1080).
    presence = jnp.zeros(num_vertices, jnp.int32)
    presence = presence.at[jnp.where(keep, nbr_global, seeds[0])].max(
        keep.astype(jnp.int32), mode="drop"
    )
    presence = presence.at[seeds].max(
        dst_valid.astype(jnp.int32), mode="drop"
    )
    ranks = jnp.cumsum(presence)            # 1-based rank among present ids
    lookup = (ranks - 1).astype(jnp.int32)  # [V] local index (if present)
    num_src = jnp.minimum(ranks[-1], num_src_pad)
    # srcs[slot] = vertex id with that rank. When num_src_pad is an
    # ESTIMATED bound (src_pad_factor mode) the tail of the rank space can
    # overflow: overflowed vertices go to a dump slot and every edge
    # pointing at them is DROPPED (weight 0) — safe under-sampling instead
    # of silent corruption.  With exact bounds overflow cannot occur.
    slot = jnp.where(
        (presence == 1) & (lookup < num_src_pad), lookup, num_src_pad
    )
    srcs = (
        jnp.zeros(num_src_pad + 1, jnp.int32)
        .at[slot]
        .max(jax.lax.broadcasted_iota(jnp.int32, (num_vertices,), 0))[
            :num_src_pad
        ]
    )
    src_valid = jax.lax.broadcasted_iota(jnp.int32, (num_src_pad,), 0) < num_src
    nbr_rank = lookup[jnp.maximum(nbr_global, 0)]
    keep_fit = keep & (nbr_rank < num_src_pad)
    nbr_local = jnp.where(keep_fit, nbr_rank, 0)
    # Overflow accounting + safety (src_pad_factor mode): edges whose source
    # rank overflows the pad are DROPPED; a SEED whose own rank overflows is
    # marked invalid (NOT clipped onto an arbitrary row — GAT's h_dst and the
    # loss mask both consume seed validity).  Exact bounds ⇒ both counts 0.
    seed_rank = lookup[seeds]
    seed_ok = dst_valid & (seed_rank < num_src_pad)
    seed_in_src = jnp.where(seed_ok, jnp.maximum(seed_rank, 0), 0)
    n_overflow = (
        jnp.sum((keep & ~keep_fit).astype(jnp.int32))
        + jnp.sum((dst_valid & ~seed_ok).astype(jnp.int32))
    )
    w = _edge_weights(keep_fit, nbr_local, num_src_pad, fanout, weight_kind,
                      degree_mode, nbr_global, seeds, in_degree, out_degree)
    return SampledBlock(
        nbr=nbr_local,
        weight=w,
        srcs=srcs,
        seeds=seeds,
        dst_valid=seed_ok,
        src_valid=src_valid,
        seed_in_src=seed_in_src,
    ), num_src, n_overflow


@functools.partial(
    jax.jit,
    static_argnames=("fanouts", "src_pads", "weight_kind", "degree_mode",
                     "gather_features", "compute_dtype"),
)
def device_sample_batch(
    key: jax.Array,
    seeds: jax.Array,
    seed_valid: jax.Array,
    indptr: jax.Array,
    indices: jax.Array,
    in_degree: jax.Array,
    out_degree: jax.Array,
    features: jax.Array,
    labels: jax.Array,
    fanouts: Tuple[int, ...],
    src_pads: Tuple[int, ...],
    weight_kind: WeightKind = WeightKind.GCN,
    omit_map: "jax.Array | None" = None,
    degree_mode: str = "sampled",
    gather_features: bool = True,
    feat_scale: "jax.Array | None" = None,
    compute_dtype=jnp.float32,
) -> SampledBatch:
    """Sample an L-hop batch fully on device and gather its payload.

    `src_pads[h]` is the static source-set bound for hop h (seed-hop first).
    `omit_map` (int32 [V], slot or -1) enables cache-omitting sampling for
    the bottom hop; the batch then carries cache_mask/cache_slot for the
    model's layer-0 merge.
    `feat_scale` ([F] per-column scales) marks `features` as int8-quantized
    storage (FEATURE_DTYPE:int8, data/quant.py): gathered rows are
    dequantized to `compute_dtype` in-program, and the identity-srcs fast
    path is disabled (it would alias the whole quantized matrix as x0).
    Returns blocks in input→output order with features gathered from HBM.
    """
    blocks: List[SampledBlock] = []
    cur_seeds, cur_valid = seeds, seed_valid
    num_vertices = indptr.shape[0] - 1
    bottom_identity = False
    overflow = jnp.zeros((), jnp.int32)
    for h, f in enumerate(fanouts):
        key, sub = jax.random.split(key)
        last = h == len(fanouts) - 1
        # bottom hop covering the whole vertex set → identity local space,
        # and x0 is the feature matrix itself (no re-gather)
        identity = (
            gather_features
            and last
            and src_pads[h] == num_vertices
            and features.shape[0] == num_vertices
            and feat_scale is None
        )
        blk, _, n_over = _sample_hop(
            sub, cur_seeds, cur_valid, indptr, indices, f, src_pads[h],
            weight_kind, in_degree, out_degree, identity_srcs=identity,
            omit_map=omit_map if last else None, degree_mode=degree_mode,
        )
        blocks.append(blk)
        cur_seeds, cur_valid = blk.srcs, blk.src_valid
        bottom_identity = identity
        overflow = overflow + n_over
    blocks.reverse()
    cache_mask = cache_slot = None
    if omit_map is not None:
        b0 = blocks[0]
        slots = omit_map[b0.seeds]
        cache_mask = (slots >= 0) & b0.dst_valid
        cache_slot = jnp.maximum(slots, 0).astype(jnp.int32)
    if not gather_features:
        # caller fetches x0 itself (row-sharded features: the DP wrapper
        # fetches sampled rows from their owner shards over ICI —
        # parallel/sharded_features.py, ntsPeerRPC parity)
        x0 = jnp.zeros((1, 1), jnp.float32)
    elif bottom_identity:
        # The whole feature matrix IS x0 here.  Under shard_map DP the
        # matrix is replicated while the rest of the batch is data-varying;
        # lift it to the batch's vma so the layer-0 custom-VJP aggregation
        # sees consistently-varying operands (its per-device cotangent
        # would otherwise mismatch a replicated primal under strict JAX
        # vma checking — the r4 driver dryrun failure).  pvary on this
        # non-differentiated constant is a pure type cast.
        from ..utils.vma import match_vma

        x0 = match_vma(features, blocks[0].nbr)
    else:
        rows = features[blocks[0].srcs]
        if feat_scale is not None:
            rows = rows.astype(compute_dtype) * feat_scale.astype(
                compute_dtype
            )
        x0 = jnp.where(
            blocks[0].src_valid[:, None], rows, jnp.zeros((), rows.dtype)
        )
    top = blocks[-1]
    y = labels[top.seeds].astype(jnp.int32)
    return SampledBatch(
        blocks=blocks, x0=x0, labels=y, label_valid=top.dst_valid,
        cache_mask=cache_mask, cache_slot=cache_slot, overflow=overflow,
    )
