"""Graph container tests: CSC invariants, transpose, partitioning."""

import numpy as np

from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.graph.partition import degree_balanced_ranges, partition_graph


def _toy_adj():
    #  edges (src, dst)
    edges = np.array(
        [[0, 1], [2, 1], [1, 2], [3, 2], [0, 3], [3, 3], [2, 0]], dtype=np.int32
    )
    return Adjacency.from_edges(edges, 4), edges


def test_csc_invariants():
    adj, edges = _toy_adj()
    assert adj.num_edges == len(edges)
    assert adj.indptr[-1] == len(edges)
    # in-neighbors of vertex 1 are {0, 2}
    assert sorted(adj.neighbors(1).tolist()) == [0, 2]
    assert sorted(adj.neighbors(2).tolist()) == [1, 3]
    np.testing.assert_array_equal(adj.in_degree, [1, 2, 2, 2])
    np.testing.assert_array_equal(adj.out_degree, [2, 1, 2, 2])


def test_transpose_roundtrip():
    adj, _ = _toy_adj()
    t = adj.transpose()
    # transpose swaps degree roles
    np.testing.assert_array_equal(t.in_degree, adj.out_degree)
    np.testing.assert_array_equal(t.out_degree, adj.in_degree)
    tt = t.transpose()
    np.testing.assert_array_equal(tt.in_degree, adj.in_degree)
    assert tt.num_edges == adj.num_edges


def test_gcn_edge_weight_parity():
    adj, _ = _toy_adj()
    # reference nts_norm_degree: 1/(sqrt(out(src))*sqrt(in(dst)))
    w = adj.gcn_edge_weight(np.array([0]), np.array([1]))
    assert np.isclose(w[0], 1.0 / (np.sqrt(2) * np.sqrt(2)))


def test_degree_balanced_ranges(tiny_ds):
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    offsets = degree_balanced_ranges(adj.in_degree, 4)
    assert offsets[0] == 0 and offsets[-1] == adj.num_vertices
    weights = adj.in_degree.astype(np.float64) + 8.0
    loads = [weights[offsets[p]:offsets[p + 1]].sum() for p in range(4)]
    assert max(loads) / min(loads) < 1.5  # balanced within 50%


def test_partition_halo(tiny_ds):
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    parts = partition_graph(adj, 4)
    assert sum(p.num_owned for p in parts) == adj.num_vertices
    for p in parts:
        # halo vertices are strictly remote
        assert not np.any((p.halo >= p.start) & (p.halo < p.end))
        # halo owners are correct
        for h, o in zip(p.halo[:50], p.halo_owner[:50]):
            assert parts[o].start <= h < parts[o].end


def test_native_stable_argsort_fuzz():
    """Native counting argsort == numpy stable argsort on edge cases and
    random draws (empty, single key value, maximal key, varied sizes)."""
    from sgnn_tpu.sampler.native import stable_argsort

    rng = np.random.default_rng(3)
    cases = [
        (np.zeros(0, np.int32), 1),
        (np.zeros(17, np.int32), 1),          # all-equal keys
        (np.full(5, 6, np.int32), 7),         # max key value
        (rng.integers(0, 3, 1000).astype(np.int32), 3),
        (rng.integers(0, 100000, 50000).astype(np.int32), 100000),
    ]
    for keys, rng_hi in cases:
        got = stable_argsort(keys, rng_hi)
        ref = np.argsort(keys, kind="stable").astype(np.int32)
        assert np.array_equal(got, ref), (keys.size, rng_hi)
