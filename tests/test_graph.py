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


# ---------------------------------------------------------------------------
# Vertex renumbering (graph/reorder.py, REORDER cfg key — VERDICT r3 #4's
# locality lever; reference: Gemini degree-aware chunk placement,
# core/graph.hpp:694-751)
# ---------------------------------------------------------------------------


def _reorder_ds(v=300, e=1500, seed=0):
    import numpy as np

    from sgnn_tpu.data.dataset import Dataset

    rng = np.random.default_rng(seed)
    edges = np.stack([rng.integers(0, v, e), rng.integers(0, v, e)],
                     1).astype(np.int32)
    return Dataset(num_vertices=v, edges=edges,
                   features=rng.standard_normal((v, 8)).astype(np.float32),
                   labels=rng.integers(0, 4, v).astype(np.int32),
                   masks=rng.integers(0, 3, v).astype(np.int32),
                   name="reorder-test")


def test_vertex_order_is_permutation_and_degree_sorted():
    import numpy as np

    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.graph.reorder import vertex_order

    ds = _reorder_ds()
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    for mode in ("degree", "bfs", "none"):
        order = vertex_order(ds, mode)
        assert np.array_equal(np.sort(order), np.arange(ds.num_vertices))
    deg = np.diff(adj.indptr)
    d_order = vertex_order(adj, "degree")
    assert (np.diff(deg[d_order]) <= 0).all()  # descending in-degree


def test_apply_vertex_order_preserves_graph_semantics():
    """The renumbered graph is the SAME graph: every per-vertex quantity
    moves with its vertex, and whole-graph training reaches the same
    loss trajectory (aggregation is permutation-equivariant)."""
    import numpy as np

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.graph.reorder import apply_vertex_order, vertex_order
    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    ds = _reorder_ds()
    order = vertex_order(ds, "bfs")
    new_ds, old_to_new = apply_vertex_order(ds, order)
    # id maps invert each other; labels/features moved with their vertex
    assert np.array_equal(old_to_new[order], np.arange(ds.num_vertices))
    assert np.array_equal(new_ds.labels[old_to_new], ds.labels)
    assert np.array_equal(new_ds.features[old_to_new], ds.features)
    # edge (s, d) maps to (old_to_new[s], old_to_new[d])
    assert np.array_equal(new_ds.edges, old_to_new[ds.edges])
    cfgs = dict(layer_sizes=[8, 16, 4], epochs=3, learn_rate=0.01,
                drop_rate=0.0, seed=0)
    tr_a = FullBatchTrainer(RunConfig(**cfgs), ds, family="gcn")
    tr_b = FullBatchTrainer(RunConfig(**cfgs), new_ds, family="gcn")
    la = [tr_a.train_epoch()[0] for _ in range(3)]
    lb = [tr_b.train_epoch()[0] for _ in range(3)]
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-5)


def test_run_engine_reorder_key():
    import numpy as np

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train import run_engine

    ds = _reorder_ds(v=200, e=900, seed=3)
    cfg = RunConfig(layer_sizes=[8, 16, 4], epochs=2, learn_rate=0.01,
                    batch_size=64, fanout=[5, 5], vertices=200,
                    algorithm="GCNSAMPLEGPU", reorder="degree", seed=0)
    report = run_engine(cfg, ds)
    assert len(report.train_acc) == 2
    assert np.isfinite(report.train_acc[-1])
    # REORDER provenance (ADVICE r4): the permutation rides the report so
    # per-vertex rows translate back — order[new_id] = old_id, a bijection
    assert report.vertex_order is not None
    assert np.array_equal(np.sort(report.vertex_order), np.arange(200))

    # without REORDER the field stays None
    cfg2 = RunConfig(layer_sizes=[8, 16, 4], epochs=1, learn_rate=0.01,
                     batch_size=64, fanout=[5, 5], vertices=200,
                     algorithm="GCNSAMPLEGPU", seed=0)
    assert run_engine(cfg2, ds).vertex_order is None
