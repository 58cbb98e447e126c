"""Full-batch path tests: single-chip whole-graph training, partition-
parallel equivalence with the single-chip program, and Cora accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.config import RunConfig
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.parallel.mesh import make_mesh
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.train.fullbatch import FullBatchTrainer, build_coo, full_forward
from sgnn_tpu.models.gnn import init_model


def test_fullbatch_single_learns(tiny_ds):
    cfg = RunConfig(layer_sizes=[32, 32, 5], fanout=[1, 1], epochs=80,
                    learn_rate=0.02, vertices=tiny_ds.num_vertices)
    tr = FullBatchTrainer(cfg, tiny_ds, family="gcn")
    hist = tr.run(80)
    # random labels are hard to fit full-batch; require clear memorisation
    # progress rather than a fixed loss ratio
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.9
    assert hist[-1]["train"] > 0.30 > hist[0]["train"]


def test_fullbatch_gat_runs(tiny_ds):
    cfg = RunConfig(layer_sizes=[32, 8, 5], fanout=[1, 1], epochs=3,
                    learn_rate=0.01, vertices=tiny_ds.num_vertices)
    tr = FullBatchTrainer(cfg, tiny_ds, family="gat")
    hist = tr.run(3)
    assert np.isfinite(hist[-1]["loss"])


def test_partition_parallel_matches_single(tiny_ds):
    """Vertex-sharded forward+step == single-chip forward+step."""
    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices)
    single = FullBatchTrainer(cfg, tiny_ds, family="gcn")
    mesh = make_mesh(data=1, graph=4, devices=jax.devices()[:4])
    # re-label axes: FullBatchTrainer uses axis name "graph"
    from jax.sharding import Mesh

    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    sharded = FullBatchTrainer(cfg, tiny_ds, family="gcn", mesh=gmesh)
    for step in range(3):
        l1 = single.train_epoch()
        l2 = sharded.train_epoch()
        # identical loss trajectory is the functional-equivalence check
        assert abs(l1[0] - l2[0]) < 2e-3, (step, l1[0], l2[0])
    # params: near-zero-grad elements sign-flip under different reduction
    # orders and Adam amplifies them to ±lr per step (see test_train.py), so
    # require bulk agreement rather than elementwise allclose
    for ws, wp in zip(single.params.weights, sharded.params.weights):
        g, e = np.asarray(ws), np.asarray(wp)
        assert np.isclose(g, e, rtol=2e-2, atol=1e-3).mean() > 0.85
        assert np.abs(g - e).mean() < 5e-3


@pytest.mark.slow
def test_fullbatch_cora_accuracy(cora):
    cfg = RunConfig(layer_sizes=[1433, 64, 7], fanout=[1, 1], epochs=40,
                    learn_rate=0.01, weight_decay=5e-4, vertices=2708)
    tr = FullBatchTrainer(cfg, cora, family="gcn")
    hist = tr.run(40)
    assert hist[-1]["train"] > 0.90
    assert hist[-1]["val"] > 0.75


def test_targeted_halo_matches_all_gather(tiny_ds):
    """all_to_all targeted halo == all_gather halo == dense reference."""
    import functools

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from sgnn_tpu.parallel.halo import (
        build_targeted_halo,
        shard_graph,
        sharded_aggregate,
        sharded_aggregate_targeted,
    )
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.train.fullbatch import build_coo

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.GCN)
    w_real = w[: adj.num_edges]
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("graph",))
    sg = shard_graph(adj, n, w_real)
    th = build_targeted_halo(adj, n, w_real)
    rows = sg.rows_per_shard
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows * n, 8)).astype(np.float32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"),
    )
    def agg_gather(xs, s, d, wgt):
        return sharded_aggregate(xs, s[0], d[0], wgt[0])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"),
    )
    def agg_targeted(xs, sidx, s, d, wgt):
        return sharded_aggregate_targeted(xs, sidx[0], s[0], d[0], wgt[0])

    out_g = agg_gather(jnp.asarray(x), sg.src, sg.dst_local, sg.weight)
    out_t = agg_targeted(
        jnp.asarray(x), th.send_idx, th.src_local, th.dst_local, th.weight
    )
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_t),
                               rtol=1e-5, atol=1e-5)
    # dense reference on the real vertex range (weights are in build_coo's
    # CSC edge order: dst from indptr runs, src = adj.indices)
    import scipy.sparse as sp

    dst_of_edge = np.repeat(
        np.arange(adj.num_vertices), np.diff(adj.indptr).astype(np.int64)
    )
    A = sp.coo_matrix(
        (w_real, (dst_of_edge, adj.indices)),
        shape=(adj.num_vertices, adj.num_vertices),
    ).tocsr()
    expect = A @ x[: adj.num_vertices]
    np.testing.assert_allclose(
        np.asarray(out_t)[: adj.num_vertices], expect, rtol=1e-4, atol=1e-4
    )


def test_fullbatch_targeted_halo_trainer(tiny_ds):
    """FullBatchTrainer(halo='targeted') matches all_gather training."""
    from jax.sharding import Mesh

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices)
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    a = FullBatchTrainer(cfg, tiny_ds, family="gcn", mesh=gmesh)
    b = FullBatchTrainer(cfg, tiny_ds, family="gcn", mesh=gmesh,
                         halo="targeted")
    for _ in range(3):
        la = a.train_epoch()
        lb = b.train_epoch()
        assert abs(la[0] - lb[0]) < 2e-3, (la[0], lb[0])


def test_partition_parallel_gat_matches_single(tiny_ds):
    """Distributed GAT (sharded edge softmax, DistEdgeSoftMax parity,
    ntsDistCPUGraphOp.hpp:34-524): vertex-sharded loss trajectory matches
    the single-chip full-batch GAT, for BOTH halo modes."""
    from jax.sharding import Mesh

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices)
    single = FullBatchTrainer(cfg, tiny_ds, family="gat")
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    sharded = FullBatchTrainer(cfg, tiny_ds, family="gat", mesh=gmesh)
    targeted = FullBatchTrainer(cfg, tiny_ds, family="gat", mesh=gmesh,
                                halo="targeted")
    for step in range(3):
        l1 = single.train_epoch()
        l2 = sharded.train_epoch()
        l3 = targeted.train_epoch()
        assert abs(l1[0] - l2[0]) < 2e-3, (step, l1[0], l2[0])
        assert abs(l1[0] - l3[0]) < 2e-3, (step, l1[0], l3[0])
    for ws, wp in zip(single.params.weights, sharded.params.weights):
        g, e = np.asarray(ws), np.asarray(wp)
        assert np.isclose(g, e, rtol=2e-2, atol=1e-3).mean() > 0.85
        assert np.abs(g - e).mean() < 5e-3


def test_min_max_aggregator_selectable(tiny_ds):
    """AGGREGATOR cfg key reaches the full-batch engine (reference
    SingleCPUDstAggregateOpMin/Max); sharded matches single for both."""
    from jax.sharding import Mesh

    from sgnn_tpu.ops.reductions import segment_max_coo

    for agg in ("min", "max"):
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                        learn_rate=0.01, seed=3,
                        vertices=tiny_ds.num_vertices, aggregator=agg)
        single = FullBatchTrainer(cfg, tiny_ds, family="gcn")
        assert single.aggregator == agg
        gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
        sharded = FullBatchTrainer(cfg, tiny_ds, family="gcn", mesh=gmesh)
        for _ in range(2):
            l1 = single.train_epoch()
            l2 = sharded.train_epoch()
            assert np.isfinite(l1[0])
            assert abs(l1[0] - l2[0]) < 2e-3, (agg, l1[0], l2[0])

    # value check: one max-aggregated layer == dense numpy max over in-edges
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.NONE)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((tiny_ds.num_vertices, 4)).astype(np.float32)
    out = np.asarray(segment_max_coo(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(w != 0), tiny_ds.num_vertices,
    ))
    for vtx in range(30):
        nbrs = adj.neighbors(vtx)
        exp = x[nbrs].max(axis=0) if nbrs.size else np.zeros(4)
        np.testing.assert_allclose(out[vtx], exp, rtol=1e-6)


def test_fullbatch_multihead_matches_per_head(tiny_ds):
    """Multi-head COO GAT == per-head single-head full_forward over W's
    column blocks (same identity as the sampled-path heads test)."""
    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.NONE)
    src, dst, w = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    x = jnp.asarray(tiny_ds.features)
    v = tiny_ds.num_vertices
    heads, fh = 4, 4
    fp = heads * fh
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    wl = jax.random.normal(k1, (x.shape[1], fp)) * 0.1
    a = jax.random.normal(k2, (2 * fp, 1)) * 0.1
    params = init_model(jax.random.PRNGKey(0), "gat", [x.shape[1], fp, fp])
    # single hidden layer worth of output: run one layer by hand via
    # full_forward on a 1-layer model with heads applied (hidden only →
    # use 2-layer model and compare the FIRST layer's pre-relu output
    # indirectly through a single-layer trick: last layer stays 1-head,
    # so build a 1-hidden-layer comparison directly with the ops)
    from sgnn_tpu.ops.segment import (
        segment_softmax_coo, spmm_coo, spmm_coo_multihead,
    )

    valid = w != 0
    ht = x @ wl
    ha_s = jnp.einsum("shf,hf->sh", ht.reshape(-1, heads, fh),
                      a[:fp, 0].reshape(heads, fh))
    ha_d = jnp.einsum("shf,hf->sh", ht.reshape(-1, heads, fh),
                      a[fp:, 0].reshape(heads, fh))
    score = jax.nn.leaky_relu(ha_s[src] + ha_d[dst], 0.2)
    att = segment_softmax_coo(score, dst, valid, v)
    got = spmm_coo_multihead(ht, src, dst, att, v)

    pieces = []
    for h in range(heads):
        ht_h = ht[:, h * fh:(h + 1) * fh]
        a_s = a[h * fh:(h + 1) * fh, 0]
        a_d = a[fp + h * fh:fp + (h + 1) * fh, 0]
        sc = jax.nn.leaky_relu(ht_h[src] @ a_s + ht_h[dst] @ a_d, 0.2)
        at = segment_softmax_coo(sc, dst, valid, v)
        pieces.append(spmm_coo(ht_h, src, dst, at, v))
    want = jnp.concatenate(pieces, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_partition_parallel_gat_multihead_matches_single(tiny_ds):
    """Sharded multi-head GAT loss trajectory == single-chip multi-head."""
    from jax.sharding import Mesh

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices,
                    heads=4)
    single = FullBatchTrainer(cfg, tiny_ds, family="gat")
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    sharded = FullBatchTrainer(cfg, tiny_ds, family="gat", mesh=gmesh)
    for step in range(3):
        l1 = single.train_epoch()
        l2 = sharded.train_epoch()
        assert abs(l1[0] - l2[0]) < 2e-3, (step, l1[0], l2[0])


def test_fullbatch_engine_strings(tiny_ds):
    """GCN/GS/GATFULLBATCH dispatch through the engine registry with the
    sampled-engine run() contract (TrainReport), and evaluate() works."""
    from sgnn_tpu.train.engines import build_trainer, run_engine

    for algo, fam in [("GCNFULLBATCH", "gcn"), ("GSFULLBATCH", "sage"),
                      ("GATFULLBATCH", "gat")]:
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=3,
                        learn_rate=0.02, vertices=tiny_ds.num_vertices,
                        algorithm=algo)
        tr = build_trainer(cfg, tiny_ds)
        assert tr.base.family == fam
        report = run_engine(cfg, tiny_ds)
        assert len(report.losses) == 3
        assert np.isfinite(report.losses[-1])
        assert report.avg_epoch_time > 0
    # evaluate on explicit ids matches the mask accuracy path
    acc = tr.evaluate(tr.base.val_nids)
    assert 0.0 <= acc <= 1.0


def test_fullbatch_checkpoint_resume(tiny_ds, tmp_path):
    """Interrupted GCNFULLBATCH run + resume == uninterrupted run."""
    from sgnn_tpu.train.checkpoint import run_with_checkpointing
    from sgnn_tpu.train.engines import build_trainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=6,
                    learn_rate=0.02, seed=11, vertices=tiny_ds.num_vertices,
                    algorithm="GCNFULLBATCH")
    base = build_trainer(cfg, tiny_ds)
    run_with_checkpointing(base, str(tmp_path / "a"), 6, resume=False)

    # interrupted: 3 epochs, then a fresh trainer resumes to 6
    first = build_trainer(cfg, tiny_ds)
    run_with_checkpointing(first, str(tmp_path / "b"), 3, resume=False)
    second = build_trainer(cfg, tiny_ds)
    run_with_checkpointing(second, str(tmp_path / "b"), 6, resume=True)

    for a, b in zip(jax.tree.leaves(base.params),
                    jax.tree.leaves(second.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_partition_graph_cfg_key(tiny_ds):
    """PARTITION_GRAPH:1 routes the FULLBATCH engine onto the vertex-sharded
    program; loss trajectory matches the single-device engine, and
    evaluate() (host fallback) still works for checkpoint/exact-eval."""
    from sgnn_tpu.train.engines import build_trainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices,
                    algorithm="GCNFULLBATCH")
    single = build_trainer(cfg, tiny_ds)
    cfg_sh = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                       learn_rate=0.01, seed=3,
                       vertices=tiny_ds.num_vertices,
                       algorithm="GCNFULLBATCH", partition_graph=True)
    sharded = build_trainer(cfg_sh, tiny_ds)
    assert sharded.base.mesh is not None
    for step in range(3):
        l1 = single.base.train_epoch()
        l2 = sharded.base.train_epoch()
        assert abs(l1[0] - l2[0]) < 2e-3, (step, l1[0], l2[0])
    acc_s = single.evaluate(single.base.val_nids)
    acc_p = sharded.evaluate(sharded.base.val_nids)
    assert abs(acc_s - acc_p) < 0.05


def test_batch_norm_sharded_matches_single(tiny_ds):
    """BATCH_NORM:1 (sync batch norm): sharded global statistics (psum over
    the graph axis, padding rows masked) match the single-device program."""
    from jax.sharding import Mesh

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, vertices=tiny_ds.num_vertices,
                    batch_norm=True)
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    for fam in ("gcn", "gat"):
        single = FullBatchTrainer(cfg, tiny_ds, family=fam)
        sharded = FullBatchTrainer(cfg, tiny_ds, family=fam, mesh=gmesh)
        for step in range(2):
            l1 = single.train_epoch()
            l2 = sharded.train_epoch()
            assert abs(l1[0] - l2[0]) < 2e-3, (fam, step, l1[0], l2[0])


def test_batch_norm_changes_forward(tiny_ds):
    """batch_norm=True standardizes hidden activations (different logits,
    still finite and trainable)."""
    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=4,
                    learn_rate=0.02, vertices=tiny_ds.num_vertices,
                    batch_norm=True)
    tr = FullBatchTrainer(cfg, tiny_ds, family="gcn")
    hist = tr.run(4)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_sortedness_invariants(tiny_ds):
    """The indices_are_sorted=True claims rest on builder invariants: a
    builder change that breaks ascending order would corrupt results
    SILENTLY on TPU, so pin each invariant explicitly."""
    from sgnn_tpu.cache.embedding_cache import EmbeddingCache
    from sgnn_tpu.parallel.halo import build_targeted_halo, shard_graph
    from sgnn_tpu.train.fullbatch import build_coo, csr_order

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.GCN)
    assert np.all(np.diff(dst) >= 0), "build_coo dst must be ascending"
    perm, inv = csr_order(src)
    assert np.all(np.diff(src[perm]) >= 0), "csr_order must sort src"
    assert np.array_equal(perm[inv], np.arange(perm.size)), "inv_perm wrong"
    # numpy-fallback parity for the native argsort
    ref = np.argsort(src, kind="stable").astype(np.int32)
    assert np.array_equal(perm, ref), "stable_argsort != numpy stable"

    w_real = w[: adj.num_edges]
    sg = shard_graph(adj, 4, np.asarray(w_real))
    th = build_targeted_halo(adj, 4, np.asarray(w_real))
    for p in range(4):
        assert np.all(np.diff(np.asarray(sg.dst_local[p])) >= 0)
        assert np.all(np.diff(np.asarray(sg.src[p])[np.asarray(sg.perm[p])])
                      >= 0)
        assert np.all(np.diff(np.asarray(th.dst_local[p])) >= 0)
        assert np.all(
            np.diff(np.asarray(th.src_local[p])[np.asarray(th.perm[p])]) >= 0)

    hot = np.array([5, 0, 9, 3], np.int32)  # deliberately unsorted hot ids
    ec = EmbeddingCache.build(adj, hot, "gcn")
    assert np.all(np.diff(np.asarray(ec.coo_slot)) >= 0), \
        "cache plan slots must be slot-major ascending"


def test_sharded_predict_matches_single(tiny_ds):
    """Mesh-sharded predict() (serving without rebuilding the unsharded
    graph on one device) == the single-device exact forward, for GCN and
    GAT, both halo modes."""
    from jax.sharding import Mesh

    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    for family, halo in (("gcn", "all_gather"), ("gcn", "targeted"),
                         ("gat", "all_gather"), ("gat", "targeted")):
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                        learn_rate=0.01, seed=3,
                        vertices=tiny_ds.num_vertices)
        single = FullBatchTrainer(cfg, tiny_ds, family=family)
        sharded = FullBatchTrainer(cfg, tiny_ds, family=family, mesh=gmesh,
                                   halo=halo)
        sharded.params = single.params  # same weights, untrained
        p1 = single.predict()
        p2 = sharded.predict()
        assert p2.shape == p1.shape == (tiny_ds.num_vertices,
                                        cfg.layer_sizes[-1])
        assert np.allclose(p1, p2, rtol=1e-4, atol=1e-5), (
            family, halo, np.abs(p1 - p2).max())
        # evaluate() rides the sharded predict too
        nids = np.arange(0, tiny_ds.num_vertices, 3, dtype=np.int32)
        assert sharded.evaluate(nids) == pytest.approx(
            single.evaluate(nids))


@pytest.mark.parametrize("family,aggregator,heads", [
    ("gcn", "sum", 1),
    ("gat", "sum", 2),
    ("sage", "min", 1),
])
def test_fullbatch_windowed_chunking_matches_direct(
    tiny_ds, monkeypatch, family, aggregator, heads
):
    """End-to-end: FullBatchTrainer under forced-tiny SpMM chunk budgets
    (dst-range windowed accumulation engaged for every layer) trains the
    same trajectory as the direct path — training step, metrics forward,
    and predict().  Covers the SpmmPlanner wiring for GCN, multi-head GAT
    (head-major + CSR backward windows) and the min aggregator."""
    import sgnn_tpu.ops.segment as seg

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=5, heads=heads, drop_rate=0.0,
                    vertices=tiny_ds.num_vertices)
    direct = FullBatchTrainer(cfg, tiny_ds, family=family,
                              aggregator=aggregator)
    losses_d = [direct.train_epoch()[0] for _ in range(3)]
    logp_d = direct.predict()

    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 256 * 32)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 256)
    windowed = FullBatchTrainer(cfg, tiny_ds, family=family,
                                aggregator=aggregator)
    # the plan must actually engage (genuinely windowed, not direct)
    assert windowed.planner.plan(16) is not None
    losses_w = [windowed.train_epoch()[0] for _ in range(3)]
    np.testing.assert_allclose(losses_w, losses_d, rtol=2e-4, atol=2e-5)
    logp_w = windowed.predict()
    # post-TRAINING logits: three optimizer steps amplify float-level
    # reassociation between the two programs (XLA fuses the direct and
    # chunked paths differently), so the bound is looser than the losses'
    # (measured drift ~3e-3 relative on a handful of logits)
    np.testing.assert_allclose(logp_w, logp_d, rtol=6e-3, atol=5e-4)


def test_degree_balanced_sharding_matches_equal():
    """Degree-balanced vertex ranges (reference tune_chunks cost model,
    graph.hpp:1837): identical training trajectory + predictions to equal
    ranges AND to single-device, with a smaller edge pad on a power-law
    graph (VERDICT r2 #7).  Exercises the slot layout end to end (padv
    scatter, dropout offset slice, predict inversion)."""
    import dataclasses as dc

    from jax.sharding import Mesh

    from sgnn_tpu.data.synthetic import powerlaw_graph_dataset
    from sgnn_tpu.parallel.halo import shard_graph

    ds = powerlaw_graph_dataset(600, 12, feature_dim=32, num_classes=5,
                                seed=11)
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    w = np.ones(adj.num_edges, np.float32)
    sg_eq = shard_graph(adj, 4, w, pad_multiple=8, balance="equal")
    sg_deg = shard_graph(adj, 4, w, pad_multiple=8, balance="degree")
    # power-law hubs: the balanced ranges must shrink the shared edge pad
    assert sg_deg.src.shape[1] < sg_eq.src.shape[1], (
        sg_deg.src.shape, sg_eq.src.shape)

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=3, drop_rate=0.5,
                    vertices=ds.num_vertices)
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    single = FullBatchTrainer(cfg, ds, family="gcn")
    trainers = {
        "degree": FullBatchTrainer(cfg, ds, family="gcn", mesh=gmesh),
        "equal": FullBatchTrainer(
            dc.replace(cfg, partition_balance="equal"), ds, family="gcn",
            mesh=gmesh),
    }
    assert trainers["degree"].sharded.offsets.tolist() != (
        trainers["equal"].sharded.offsets.tolist())
    for step in range(3):
        ls = single.train_epoch()[0]
        for name, tr in trainers.items():
            lt = tr.train_epoch()[0]
            assert abs(ls - lt) < 2e-3, (name, step, ls, lt)
    p0 = single.predict()
    for name, tr in trainers.items():
        np.testing.assert_allclose(tr.predict(), p0, rtol=5e-3, atol=5e-4,
                                   err_msg=name)


def test_degree_balanced_targeted_halo_gat():
    """Targeted all_to_all halo + multi-head GAT under degree-balanced
    ranges: loss trajectory equals the single-device program."""
    from jax.sharding import Mesh

    from sgnn_tpu.data.synthetic import powerlaw_graph_dataset

    ds = powerlaw_graph_dataset(400, 10, feature_dim=16, num_classes=4,
                                seed=5)
    cfg = RunConfig(layer_sizes=[16, 8, 4], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=2, drop_rate=0.0, heads=2,
                    vertices=ds.num_vertices)
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    single = FullBatchTrainer(cfg, ds, family="gat")
    sharded = FullBatchTrainer(cfg, ds, family="gat", mesh=gmesh,
                               halo="targeted")
    for step in range(3):
        ls = single.train_epoch()[0]
        lt = sharded.train_epoch()[0]
        assert abs(ls - lt) < 3e-3, (step, ls, lt)


def test_sharded_windowed_chunking_matches_single(tiny_ds, monkeypatch):
    """Sharded full-batch under forced-tiny SpMM budgets: the per-shard
    windowed chunked SpMMs (ShardedSpmmPlanner — worst-shard dst/src
    windows) train the same trajectory as the single-device program, for
    both halo modes and multi-head GAT."""
    import sgnn_tpu.ops.segment as seg
    from jax.sharding import Mesh

    monkeypatch.setattr(seg, "_DIRECT_ELEMS", 0)
    monkeypatch.setattr(seg, "_CHUNK_ELEMS", 256 * 32)
    monkeypatch.setattr(seg, "_CHUNK_FLOOR", 256)
    gmesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("graph",))
    for family, halo, heads in (("gcn", "all_gather", 1),
                                ("gat", "targeted", 2)):
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                        learn_rate=0.01, seed=4, drop_rate=0.0, heads=heads,
                        vertices=tiny_ds.num_vertices)
        single = FullBatchTrainer(cfg, tiny_ds, family=family)
        sharded = FullBatchTrainer(cfg, tiny_ds, family=family, mesh=gmesh,
                                   halo=halo)
        assert sharded.shard_planner.plan(16) is not None  # engaged
        for step in range(2):
            ls = single.train_epoch()[0]
            lt = sharded.train_epoch()[0]
            assert abs(ls - lt) < 3e-3, (family, step, ls, lt)


@pytest.mark.parametrize("heads", [1, 4])
def test_gat_fast_attention_matches_reference_formulation(tiny_ds, heads):
    """The gather-free attention path (fast_att: broadcast_dst_sorted +
    max-free attention_exp + divide-after-aggregation — engaged whenever a
    planner rides a sorted path) computes the same layer as the reference
    segment_softmax_coo formulation, forward AND gradients, single- and
    multi-head.  Guards the round-3 serving rewrite (docs/PERF.md GAT
    profile: 971→279 ms/layer at Reddit scale)."""
    from sgnn_tpu.ops.segment import SpmmPlanner
    from sgnn_tpu.train.fullbatch import csr_order

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    v = adj.num_vertices
    src, dst, w = build_coo(adj, WeightKind.NONE, pad_multiple=64)
    perm, inv = csr_order(src)
    planner = SpmmPlanner(dst, src[perm], num_src=v, num_dst=v,
                          e_real=adj.num_edges)
    params = init_model(jax.random.PRNGKey(2), "gat", [32, 16, 5])
    # non-zero attention vectors (zero-init would make both paths trivially
    # uniform): overwrite with a seeded draw, scaled so scores span ±few
    attn = tuple(0.5 * jax.random.normal(jax.random.PRNGKey(i + 9), a.shape)
                 for i, a in enumerate(params.attn))
    params = params._replace(attn=attn)
    x = jnp.asarray(tiny_ds.features)
    sj, dj, wj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    pj, ij = jnp.asarray(perm), jnp.asarray(inv)

    def run(planner_arg, use_csr):
        def loss(p):
            logp = full_forward(
                p, "gat", x, sj, dj, wj, v, heads=heads,
                csr=(pj, ij) if use_csr else None,
                fwd_sorted=not use_csr, planner=planner_arg)
            return jnp.sum(logp[: v // 2]), logp

        (s, logp), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return logp, grads

    for use_csr in (False, True):  # serving (fwd_sorted) and training (csr)
        ref_logp, ref_g = run(None, use_csr)
        fast_logp, fast_g = run(planner, use_csr)
        np.testing.assert_allclose(np.asarray(fast_logp),
                                   np.asarray(ref_logp),
                                   rtol=5e-4, atol=5e-5)
        for a, b in zip(jax.tree.leaves(fast_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("halo,heads", [("all_gather", 1), ("targeted", 2)])
def test_sharded_gat_fast_attention_matches_reference(tiny_ds, halo, heads):
    """sharded_gat_layer's gather-free path (att_starts: per-shard
    broadcast_dst_sorted + attention_exp + divide-after-aggregation) equals
    its own reference segment_softmax_coo formulation, forward AND grads,
    on the CPU mesh — both halo modes, single- and multi-head (VERDICT r3
    #6: the sharded path must run the same attention kernel as the local
    one, DistEdgeSoftMax parity, ntsDistCPUGraphOp.hpp:34-524)."""
    import functools

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from sgnn_tpu.ops.segment import ShardedSpmmPlanner
    from sgnn_tpu.parallel.halo import (
        build_targeted_halo,
        shard_graph,
        sharded_gat_layer,
    )

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    src_, dst_, w_ = build_coo(adj, WeightKind.NONE)
    w_real = w_[: adj.num_edges]
    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("graph",))
    if halo == "targeted":
        t = build_targeted_halo(adj, n, w_real)
        src_rows, dst_rows, w_rows = t.src_local, t.dst_local, t.weight
        perm_rows, inv_rows, sidx = t.perm, t.inv_perm, t.send_idx
        num_src = t.rows_per_shard + n * t.halo_pad
        rows = t.rows_per_shard
    else:
        sg = shard_graph(adj, n, w_real)
        src_rows, dst_rows, w_rows = sg.src, sg.dst_local, sg.weight
        perm_rows, inv_rows, sidx = sg.perm, sg.inv_perm, None
        num_src = n * sg.rows_per_shard
        rows = sg.rows_per_shard
    planner = ShardedSpmmPlanner(
        np.asarray(dst_rows),
        np.take_along_axis(np.asarray(src_rows), np.asarray(perm_rows), 1),
        num_src=num_src, num_dst=rows,
        e_real=(np.asarray(w_rows) != 0).sum(axis=1))
    starts = jnp.asarray(planner.softmax_starts())
    f_in, f_out = 32, 16 * heads
    k = jax.random.PRNGKey(3)
    wl = jax.random.normal(k, (f_in, f_out), jnp.float32) * 0.3
    attn = jax.random.normal(jax.random.PRNGKey(7), (2 * f_out, 1),
                             jnp.float32) * 0.5
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((rows * n, f_in)), jnp.float32)

    if sidx is None:  # dummy operand so both modes share one signature
        sidx = jnp.zeros((n, 1, 1), jnp.int32)
        use_sidx = False
    else:
        use_sidx = True

    def make_run(fast):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P("graph"), P("graph"), P("graph"),
                      P("graph"), P("graph"), P("graph"), P("graph"),
                      P("graph")),
            out_specs=P("graph"),
        )
        def fwd(wl_, attn_, xs, s, d, wgt, si, pm, iv, st):
            return sharded_gat_layer(
                xs, wl_, attn_, s[0], d[0], wgt[0] != 0,
                send_idx=si[0] if use_sidx else None,
                heads=heads, perm=pm[0], inv_perm=iv[0], planner=planner,
                att_starts=st[0] if fast else None)

        def loss(params):
            wl_, attn_ = params
            out = fwd(wl_, attn_, x, src_rows, dst_rows, w_rows, sidx,
                      perm_rows, inv_rows, starts)
            return jnp.sum(out * out), out

        (_, out), grads = jax.value_and_grad(loss, has_aux=True)((wl, attn))
        return out, grads

    ref_out, ref_g = make_run(False)
    fast_out, fast_g = make_run(True)
    np.testing.assert_allclose(np.asarray(fast_out), np.asarray(ref_out),
                               rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(fast_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_metrics_train_same_trajectory_cheaper_program(tiny_ds):
    """METRICS:train (reference accounting: Train Acc from the training
    forward, GCN_SAMPLE_ALLGPU.hpp:361) must not change the LOSS
    trajectory — it only drops the extra dropout-free metrics forward."""
    import dataclasses

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], epochs=3, learn_rate=0.02,
                    drop_rate=0.5, vertices=tiny_ds.num_vertices)
    clean = FullBatchTrainer(cfg, tiny_ds, family="gcn")
    train = FullBatchTrainer(dataclasses.replace(cfg, metrics="train"),
                             tiny_ds, family="gcn")
    for ep in range(3):
        lc, ac, _, _ = clean.train_epoch()
        lt, at, _, _ = train.train_epoch()
        assert abs(lc - lt) < 1e-6, (ep, lc, lt)
        assert np.isfinite(at)
    # params identical: metrics choice never touches the update
    for wc, wt in zip(clean.params.weights, train.params.weights):
        np.testing.assert_allclose(np.asarray(wc), np.asarray(wt),
                                   rtol=1e-6)


def test_broadcast_dst_sorted_empty_segments():
    """Telescoping scatter-ADD reconstructs vals[dst] exactly through runs
    of EMPTY destinations (consecutive deltas at one position must sum to
    the jump across them)."""
    from sgnn_tpu.ops.segment import SpmmPlanner, broadcast_dst_sorted

    rng = np.random.default_rng(0)
    v, e = 50, 400
    # leave vertices 0, 7-9, 23, 49 with no in-edges at all
    pool = np.setdiff1d(np.arange(v), [0, 7, 8, 9, 23, 49])
    dst = np.sort(rng.choice(pool, size=e).astype(np.int32))
    src = rng.integers(0, v, size=e).astype(np.int32)
    planner = SpmmPlanner(dst, np.sort(src), num_src=v, num_dst=v)
    starts = planner.softmax_starts()
    vals = jnp.asarray(rng.normal(size=v).astype(np.float32) * 3)
    got = broadcast_dst_sorted(vals, starts, e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals)[dst],
                               rtol=1e-5, atol=1e-6)
