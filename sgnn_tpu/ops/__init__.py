from .aggregate import (
    gather_aggregate,
    scatter_src_to_edges,
    scatter_dst_to_edges,
    edge_softmax,
    aggregate_edges_to_dst,
)
from .segment import spmm_coo, segment_softmax_coo

__all__ = [
    "gather_aggregate",
    "scatter_src_to_edges",
    "scatter_dst_to_edges",
    "edge_softmax",
    "aggregate_edges_to_dst",
    "spmm_coo",
    "segment_softmax_coo",
]
