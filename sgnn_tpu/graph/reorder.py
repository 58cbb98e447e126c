"""Vertex renumbering for gather locality (opt-in, REORDER cfg key).

The measured residual super-linearity of the sampled and whole-graph
paths at 2x/4x graph scale is a LOCALITY problem: per-op profiles show
every primitive flat per edge, yet composed passes slow down as the
gather table grows past the HBM subsystem's fast-reach window
(docs/PERF.md round-3 scale sweep).  No kernel fixes that — the id
ASSIGNMENT does.  Renumbering vertices so that ids that are accessed
together sit in nearby rows shrinks the spread of gather/scatter row
addresses per chunk, and (for the one-hot MXU SpMM) the number of
(dst-block x src-slab) tile pairs a graph needs.

Reference analog: Gemini's degree-aware chunk placement
(core/graph.hpp:694-751) lays hot vertices into dense chunk prefixes for
exactly this reason; NeutronOrch inherits it wholesale.

Orders:
- "degree": in-degree descending.  Hot rows (the overwhelming majority
  of sampled-gather traffic under power-law degree) compact into the low
  id range — one contiguous hot region instead of V-spread hits.
- "bfs": community-ish locality — repeated BFS from the highest-degree
  unvisited vertex over the UNDIRECTED adjacency; neighbors get nearby
  ids (a lightweight RCM relative, O(V+E) numpy).

Both return a permutation `order` where `order[new_id] = old_id`; use
`apply_vertex_order` to remap a Dataset (features/labels/masks move with
their vertex) and keep `old_to_new` for external id translation (seed
nids in, predictions out).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..data.dataset import Dataset
from .adjacency import Adjacency


def vertex_order(ds_or_adj, mode: str = "degree") -> np.ndarray:
    """[V] int32 permutation, order[new_id] = old_id."""
    if isinstance(ds_or_adj, Adjacency):
        adj = ds_or_adj
    else:
        adj = Adjacency.from_edges(ds_or_adj.edges, ds_or_adj.num_vertices)
    v = adj.num_vertices
    deg = np.diff(adj.indptr)
    mode = (mode or "none").lower()
    if mode in ("none", ""):
        return np.arange(v, dtype=np.int32)
    if mode == "degree":
        # stable sort keeps equal-degree runs in original order — the
        # renumbering is deterministic for checkpoint/resume
        return np.argsort(-deg, kind="stable").astype(np.int32)
    if mode != "bfs":
        raise ValueError(f"unknown vertex order {mode!r} "
                         "(none | degree | bfs)")
    # undirected view: out-edges = transpose of the CSC
    src = adj.indices.astype(np.int64)
    dst = np.repeat(np.arange(v, dtype=np.int64), deg)
    u = np.concatenate([src, dst])
    w = np.concatenate([dst, src])
    o = np.argsort(u, kind="stable")
    u, w = u[o], w[o]
    nbr_ptr = np.searchsorted(u, np.arange(v + 1, dtype=np.int64))
    order = np.empty(v, np.int32)
    visited = np.zeros(v, bool)
    pos = 0
    by_deg = np.argsort(-deg, kind="stable")
    seed_i = 0
    frontier = np.empty(0, np.int64)
    while pos < v:
        if frontier.size == 0:
            while visited[by_deg[seed_i]]:
                seed_i += 1
            frontier = np.array([by_deg[seed_i]], np.int64)
            visited[frontier[0]] = True
        order[pos:pos + frontier.size] = frontier
        pos += frontier.size
        # vectorized frontier expansion
        spans = [w[nbr_ptr[f]:nbr_ptr[f + 1]] for f in frontier]
        nxt = np.unique(np.concatenate(spans)) if spans else frontier[:0]
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    return order


def apply_vertex_order(
    ds: Dataset, order: np.ndarray,
) -> Tuple[Dataset, np.ndarray]:
    """Remap a Dataset under `order` (order[new_id] = old_id).

    Returns (new_ds, old_to_new); translate external vertex ids with
    old_to_new going in (seed nids) and `order` itself coming out
    (row new_id of any per-vertex result belongs to old vertex
    order[new_id])."""
    v = ds.num_vertices
    order = np.asarray(order, np.int64)
    old_to_new = np.empty(v, np.int32)
    old_to_new[order] = np.arange(v, dtype=np.int32)
    edges = old_to_new[ds.edges.astype(np.int64)].astype(ds.edges.dtype)
    new_ds = Dataset(
        num_vertices=v,
        edges=edges,
        features=None if ds.features is None else ds.features[order],
        labels=None if ds.labels is None else ds.labels[order],
        masks=None if ds.masks is None else ds.masks[order],
        name=f"{ds.name}+reordered",
    )
    return new_ds, old_to_new
