"""Sampled-minibatch containers in a TPU-native dense-fanout layout.

Reference representation: ragged CSC per sampled layer (`sampCSC`,
core/coocsc.hpp:24 — column_offset/row_indices + global source/destination
maps + per-edge weights), consumed by warp-per-destination CUDA kernels.

TPU redesign: XLA wants STATIC shapes and regular access.  Because fanout
sampling bounds every destination's in-edges by `fanout`, we store each hop
as a dense neighbor matrix instead of ragged CSC:

    nbr    int32  [num_dst_pad, fanout]  — local index into this hop's src set
    weight f32    [num_dst_pad, fanout]  — edge weight, 0.0 for padded slots
    srcs   int32  [num_src_pad]          — global vertex ids of the src set
    seeds  int32  [num_dst_pad]          — global vertex ids of the dst set

Aggregation then is gather + weighted sum over the static fanout axis
(sgnn_tpu/ops/aggregate.py) — fully regular, no ragged segments, and GAT's
per-destination edge softmax collapses to a masked softmax over axis=1.
Padded dst rows have all-zero weights; padded src rows gather feature row 0
harmlessly (weight 0).  This preserves the semantics of the reference's
sampled CSC while mapping directly onto the VPU/MXU tiling model.

Layer ordering: blocks[0] is the INPUT-most hop (its `srcs` index the raw
feature matrix); blocks[-1] is the output hop whose `seeds` are the batch
train vertices.  (The reference samples in the opposite order —
sampled_sgs[0] holds the seed batch, ntsFastSampler.hpp:986 — and walks the
stack backwards during Forward; we store forward order directly.)
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence

import jax
import numpy as np


class WeightKind(enum.Enum):
    """Edge weight schemes, parity with reference WeightType (Sum/Mean/None).

    GCN  = 1/(sqrt(outdeg(src)) * sqrt(indeg(dst)))   [ntsBaseOp.hpp:652]
    MEAN = GCN weight / (# sampled in-edges of dst)   [get_mean_weight kernel,
           cuda/ntsCUDATransferKernel.cuh:319]
    NONE = 1.0 on valid edges (GAT computes its own attention weights)
    """

    GCN = "gcn"
    MEAN = "mean"
    NONE = "none"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SampledBlock:
    """One sampled bipartite hop in dense-fanout layout (device-ready)."""

    nbr: jax.Array      # int32 [num_dst_pad, fanout], local src indices
    weight: jax.Array   # f32   [num_dst_pad, fanout], 0 on invalid slots
    srcs: jax.Array     # int32 [num_src_pad], global ids (padded with 0)
    seeds: jax.Array    # int32 [num_dst_pad], global ids (padded with 0)
    dst_valid: jax.Array  # bool [num_dst_pad], True for real destinations
    src_valid: jax.Array  # bool [num_src_pad]
    # Local index of each seed inside `srcs` (seeds always appear in srcs
    # because self-loop datasets include (v,v); needed for GAT dst features
    # and SAGE concat variants — reference `dst_local_id` merge-src-dst mode,
    # core/coocsc.hpp:407).
    seed_in_src: jax.Array  # int32 [num_dst_pad]

    @property
    def num_dst_pad(self) -> int:
        return self.nbr.shape[0]

    @property
    def num_src_pad(self) -> int:
        return self.srcs.shape[0]

    @property
    def fanout(self) -> int:
        return self.nbr.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SampledBatch:
    """An L-hop sampled minibatch: blocks input→output + gathered payload."""

    blocks: List[SampledBlock]
    x0: jax.Array        # f32 [blocks[0].num_src_pad, F] input features
    labels: jax.Array    # int32 [num_seed_pad]
    label_valid: jax.Array  # bool [num_seed_pad]
    # Hot-vertex embedding-cache merge info for the BOTTOM hop's dst set
    # (None when the cache is off).  cache_mask[d] ⇒ blocks[0].seeds[d] is
    # cached; its layer-0 pre-activation is replaced by
    # cache_emb[cache_slot[d]] (reference load_share_embedding,
    # GCN_SAMPLE_PD_CACHE.hpp:938).
    cache_mask: Optional[jax.Array] = None   # bool [blocks[0].num_dst_pad]
    cache_slot: Optional[jax.Array] = None   # int32 [blocks[0].num_dst_pad]
    # Dropped-edge/seed count from src_pad_factor overflow (device sampler;
    # 0 with exact bounds).  Surfaced so overflow is visible at runtime
    # instead of silently under-sampling.
    overflow: Optional[jax.Array] = None     # int32 scalar
    # Partial-HBM feature cache mode (cache/feature_cache.py): x0 holds a
    # COMPACTED [num_cold_pad, F] buffer of only the cache-MISS rows;
    # cold_pos[i] is each row's position on the bottom src axis (padding
    # entries point one past the end and are scatter-dropped).  The step
    # program scatters x0 out and overlays HBM-cached hot rows.
    cold_pos: Optional[jax.Array] = None     # int32 [num_cold_pad]

    @property
    def num_layers(self) -> int:
        return len(self.blocks)

    @property
    def seeds(self) -> jax.Array:
        return self.blocks[-1].seeds

    def num_sampled_edges(self) -> int:
        """Count of VALID sampled edges (for edges/s accounting)."""
        total = 0
        for b in self.blocks:
            total += int(np.asarray(b.weight != 0.0).sum()) if b.weight.ndim else 0
        return total


def pad_to(n: int, multiple: int) -> int:
    """Round n up to a multiple (static-shape bucketing)."""
    if n == 0:
        return multiple
    return (n + multiple - 1) // multiple * multiple
