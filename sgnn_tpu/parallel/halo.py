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


class ShardedGraph(NamedTuple):
    """Vertex-range-sharded COO, padded per shard (device-ready, stacked).

    Shard p owns vertex rows [offsets[p], offsets[p+1]); its edge list holds
    every in-edge of its owned vertices: dst is LOCAL (0-based within the
    shard), src is GLOBAL (resolved against the all-gathered activations).
    """

    offsets: np.ndarray          # [n_parts+1] owned-range boundaries
    src: jax.Array               # [n_parts, E_pad] int32 global src ids
    dst_local: jax.Array         # [n_parts, E_pad] int32 local dst ids
    weight: jax.Array            # [n_parts, E_pad] f32, 0 = padding
    rows_per_shard: int          # padded owned-vertex count per shard

    @property
    def num_parts(self) -> int:
        return int(self.offsets.shape[0] - 1)


def shard_graph(
    adj: Adjacency, num_parts: int, weights: np.ndarray, pad_multiple: int = 512
) -> ShardedGraph:
    """Partition in-edges by destination owner (equal vertex ranges).

    Equal ranges (not degree-balanced) keep the row shard size uniform —
    required for a single stacked [n_parts, ...] device array.  Edge padding
    absorbs the imbalance; degree-balanced ranges (graph/partition.py) can
    replace this once ragged shards are worth the complexity.
    """
    v = adj.num_vertices
    rows = pad_to((v + num_parts - 1) // num_parts, 8)
    offsets = np.minimum(np.arange(num_parts + 1) * rows, v)
    dst_of_edge = np.repeat(
        np.arange(v, dtype=np.int64), np.diff(adj.indptr).astype(np.int64)
    )
    owner = np.minimum(dst_of_edge // rows, num_parts - 1)
    e_pad = 0
    per_part = []
    for p in range(num_parts):
        sel = owner == p
        src = adj.indices[sel]
        dst = (dst_of_edge[sel] - offsets[p]).astype(np.int32)
        w = weights[sel]
        per_part.append((src, dst, w))
        e_pad = max(e_pad, src.size)
    e_pad = pad_to(e_pad, pad_multiple)
    srcs = np.zeros((num_parts, e_pad), np.int32)
    dsts = np.zeros((num_parts, e_pad), np.int32)
    ws = np.zeros((num_parts, e_pad), np.float32)
    for p, (src, dst, w) in enumerate(per_part):
        srcs[p, : src.size] = src
        dsts[p, : dst.size] = dst
        ws[p, : w.size] = w
    return ShardedGraph(
        offsets=offsets.astype(np.int64),
        src=jnp.asarray(srcs),
        dst_local=jnp.asarray(dsts),
        weight=jnp.asarray(ws),
        rows_per_shard=rows,
    )


def sharded_aggregate(
    x_shard: jax.Array,       # [rows, F] this device's owned activations
    src: jax.Array,           # [E_pad] global src ids (local shard of stack)
    dst_local: jax.Array,     # [E_pad]
    weight: jax.Array,        # [E_pad]
    axis_name: str = "graph",
) -> jax.Array:
    """One partition-parallel aggregation step (call inside shard_map).

    all_gather(x) over ICI = the reference's master→mirror feature fetch;
    autodiff of the gather yields the mirror→master gradient reduction
    (reference backward decoupled engines) as a psum_scatter.
    """
    from ..ops.segment import spmm_coo

    x_full = jax.lax.all_gather(x_shard, axis_name, axis=0, tiled=True)
    return spmm_coo(x_full, src, dst_local, weight, x_shard.shape[0])
