"""Immutable CSC/CSR whole-graph topology containers (host side).

Reference: Graph<EdgeData> (core/graph.hpp:82) + FullyRepGraph
(core/FullyRepGraph.hpp:682) keep a CSC keyed by destination (column_offset /
row_indices, srcs in rows) for sampling, plus global in/out degree tables
used by the GCN symmetric normalisation (nts_norm_degree,
core/ntsBaseOp.hpp:652).

TPU redesign: the whole-graph topology lives on the HOST as numpy arrays —
it is only touched by the (native/numpy) sampler; what reaches the device is
fixed-shape sampled blocks (sgnn_tpu/sampler).  For full-graph (NeutronStar)
ops, `to_padded_device_csc` exports a statically-shaped device copy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Adjacency:
    """In-neighbor CSC: for vertex v, srcs are indices[indptr[v]:indptr[v+1]]."""

    num_vertices: int
    indptr: np.ndarray       # [V+1] int64, CSC column offsets (keyed by dst)
    indices: np.ndarray      # [E]   int32, source vertex ids
    in_degree: np.ndarray    # [V]   int32 (full-graph, = indptr diffs)
    out_degree: np.ndarray   # [V]   int32 (full-graph)

    @property
    def num_edges(self) -> int:
        return int(self.indices.shape[0])

    @staticmethod
    def from_edges(edges: np.ndarray, num_vertices: int) -> "Adjacency":
        """Build from a COO [E, 2] (src, dst) edge list. Stable edge order.

        Fast path: native OpenMP counting sort (sampler/native/sampler.cpp
        sgnn_csc_build — reference graph-builder analog, Graph::load_directed
        core/graph.hpp:1129).  Numpy argsort fallback is bit-identical.
        """
        built = None
        if edges.size:
            from sgnn_tpu.sampler import native  # lazy: avoids import cycle

            built = native.build_csc(edges, num_vertices)
        if built is not None:
            indptr, indices, out_degree = built
            return Adjacency(
                num_vertices=num_vertices,
                indptr=indptr,
                indices=indices,
                in_degree=np.diff(indptr).astype(np.int32),
                out_degree=out_degree,
            )
        src = edges[:, 0].astype(np.int64)
        dst = edges[:, 1].astype(np.int64)
        order = np.argsort(dst, kind="stable")
        indices = edges[order, 0].astype(np.int32)
        counts = np.bincount(dst, minlength=num_vertices)
        indptr = np.zeros(num_vertices + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        out_degree = np.bincount(src, minlength=num_vertices).astype(np.int32)
        return Adjacency(
            num_vertices=num_vertices,
            indptr=indptr,
            indices=indices,
            in_degree=counts.astype(np.int32),
            out_degree=out_degree,
        )

    def neighbors(self, v: int) -> np.ndarray:
        return self.indices[self.indptr[v]:self.indptr[v + 1]]

    def transpose(self) -> "Adjacency":
        """Out-neighbor view (CSR of the same edge set), as an Adjacency.

        Reference analog: Graph::transpose / generate_backward_structure
        (core/graph.hpp:1115/:4332) which materialise the reverse topology
        for backward propagation.

        Fast path: native one-pass transpose (sgnn_csc_transpose) — no
        [E, 2] reversed edge list is materialised; degree tables swap
        roles, so no recount is needed either.
        """
        built = None
        if self.num_edges:
            from sgnn_tpu.sampler import native  # lazy: avoids import cycle

            built = native.transpose_csc(
                self.indptr, self.indices, self.num_vertices
            )
        if built is not None:
            indptr_t, indices_t = built
            return Adjacency(
                num_vertices=self.num_vertices,
                indptr=indptr_t,
                indices=indices_t,
                in_degree=self.out_degree,
                out_degree=self.in_degree,
            )
        dst_of_edge = np.repeat(
            np.arange(self.num_vertices, dtype=np.int32),
            np.diff(self.indptr).astype(np.int64),
        )
        rev_edges = np.stack([dst_of_edge, self.indices], axis=1)
        return Adjacency.from_edges(rev_edges, self.num_vertices)

    def gcn_edge_weight(self, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """Symmetric normalisation 1/(sqrt(outdeg(src))*sqrt(indeg(dst))).

        Parity with nts_norm_degree (core/ntsBaseOp.hpp:652) using full-graph
        degrees (reference default, up_degree=false).
        """
        od = np.maximum(self.out_degree[src], 1).astype(np.float32)
        idg = np.maximum(self.in_degree[dst], 1).astype(np.float32)
        return 1.0 / (np.sqrt(od) * np.sqrt(idg))

    def to_padded_device_csc(
        self, pad_to_multiple: int = 128
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Export (indptr, indices) padded to XLA-friendly static shapes."""
        def pad(a, mult, fill):
            n = a.shape[0]
            m = (n + mult - 1) // mult * mult
            if m == n:
                return a
            return np.concatenate([a, np.full(m - n, fill, dtype=a.dtype)])

        return (
            pad(self.indptr, pad_to_multiple, self.indptr[-1]),
            pad(self.indices, pad_to_multiple, 0),
        )
