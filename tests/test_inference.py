"""Layer-wise full-graph inference (train/inference.py): exact serving/eval.

The reference evaluates through sampled forwards only (Test(),
GCN_SAMPLE_PD_CACHE.hpp:264-295); exact layer-wise inference is this
framework's addition.  Correctness anchor: the chunked layer-wise program
must equal the whole-graph single-program forward (fullbatch.full_forward)
and a dense numpy reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.config import RunConfig
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.models.gnn import init_model
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.train.fullbatch import build_coo, full_forward
from sgnn_tpu.train.inference import exact_accuracy, layerwise_inference

import jax


@pytest.fixture
def adj(tiny_ds):
    return Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)


@pytest.mark.parametrize("family,wk,heads", [
    ("gcn", WeightKind.GCN, 1),
    ("sage", WeightKind.MEAN, 1),
    ("gat", WeightKind.NONE, 1),
    ("gat", WeightKind.NONE, 4),
])
def test_layerwise_matches_full_forward(tiny_ds, adj, family, wk, heads):
    """Chunked layer-wise inference == whole-graph forward, all families.

    chunk_size=128 over 500 vertices forces 4 chunks, so the per-chunk
    staging/padding/softmax-locality logic is genuinely exercised."""
    params = init_model(jax.random.PRNGKey(3), family, [32, 16, 5])
    src, dst, w = build_coo(adj, wk)
    ref = np.asarray(full_forward(
        params, family, jnp.asarray(tiny_ds.features), jnp.asarray(src),
        jnp.asarray(dst), jnp.asarray(w), adj.num_vertices, heads=heads,
    ))
    got = layerwise_inference(
        params, family, adj, tiny_ds.features, weight_kind=wk, heads=heads,
        chunk_size=128, mean_style="fullbatch", whole_graph=False,
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_layerwise_plain_mean_matches_dense(tiny_ds, adj):
    """mean_style='plain' (the sampled SAGE engines' full-neighborhood
    semantics, 1/indeg) against a dense numpy reference."""
    params = init_model(jax.random.PRNGKey(5), "sage", [32, 16, 5])
    v = adj.num_vertices
    A = np.zeros((v, v), np.float32)
    dst_all = np.repeat(np.arange(v), np.diff(adj.indptr))
    np.add.at(A, (dst_all, adj.indices), 1.0)  # keep duplicate edges
    A /= np.maximum(A.sum(axis=1, keepdims=True), 1)

    def dense_forward(x):
        w0, w1 = (np.asarray(w, np.float32) for w in params.weights)
        h = np.maximum(A @ (x @ w0), 0.0)
        z = A @ (h @ w1)
        z = z - z.max(axis=1, keepdims=True)
        return z - np.log(np.exp(z).sum(axis=1, keepdims=True))

    ref = dense_forward(tiny_ds.features.astype(np.float32))
    got = layerwise_inference(params, "sage", adj, tiny_ds.features,
                              chunk_size=200, mean_style="plain", whole_graph=False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_exact_accuracy_on_sampled_trained_model(cora):
    """Serving flow: train with a sampled engine, evaluate EXACTLY with
    full neighborhoods — accuracy must land at/above the sampled eval
    (no fanout truncation) on real Cora."""
    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.data.nts_format import load_from_config
    from sgnn_tpu.train import run_engine
    from sgnn_tpu.train.engines import build_trainer

    cfg = load_cfg("configs/gcn_cora_sample.cfg")
    cfg.algorithm = "GCNSAMPLEGPU"
    cfg.epochs = 5
    tr = build_trainer(cfg, cora)
    tr.run(epochs=5, eval_every=10**9)
    sampled_test = tr.evaluate(tr.test_nids)
    logp = layerwise_inference(tr.params, "gcn", tr.adj, cora.features,
                               chunk_size=1024)
    exact = exact_accuracy(tr.params, "gcn", tr.adj, cora.features,
                           cora.labels, tr.test_nids, logp=logp)
    assert exact > 0.8, (exact, sampled_test)
    # exact eval sees the whole neighborhood: parity or better, minus noise
    assert exact >= sampled_test - 0.03, (exact, sampled_test)
    # reuse across splits
    val = exact_accuracy(tr.params, "gcn", tr.adj, cora.features,
                         cora.labels, tr.val_nids, logp=logp)
    assert 0.0 <= val <= 1.0


def test_whole_graph_mode_matches_chunked(tiny_ds, adj):
    """whole_graph=True (single-program, fits-in-HBM serving path) equals
    the chunked beyond-HBM path; the auto heuristic picks it for a tiny
    graph and falls back to chunked under a forced tiny budget."""
    params = init_model(jax.random.PRNGKey(9), "gcn", [32, 16, 5])
    whole = layerwise_inference(params, "gcn", adj, tiny_ds.features,
                                whole_graph=True)
    chunked = layerwise_inference(params, "gcn", adj, tiny_ds.features,
                                  chunk_size=128, whole_graph=False)
    np.testing.assert_allclose(whole, chunked, rtol=2e-4, atol=2e-5)
    auto = layerwise_inference(params, "gcn", adj, tiny_ds.features)
    np.testing.assert_allclose(auto, whole, rtol=0, atol=0)  # same path
    tiny_budget = layerwise_inference(params, "gcn", adj, tiny_ds.features,
                                      chunk_size=128, hbm_budget_bytes=1)
    np.testing.assert_allclose(tiny_budget, chunked, rtol=0, atol=0)


@pytest.mark.parametrize("family,wk,heads", [
    ("gcn", WeightKind.GCN, 1),
    ("gat", WeightKind.NONE, 2),
])
def test_layerwise_batch_norm_matches_full_forward(tiny_ds, adj, family, wk,
                                                   heads):
    """Serving BN-trained models: chunked layer-wise inference with
    batch_norm=True equals full_forward(batch_norm=True) — the chunked path
    defers relu, normalizes with whole-graph f32 statistics (eps 1e-5) and
    then activates, exactly like the one-program path."""
    params = init_model(jax.random.PRNGKey(5), family, [32, 16, 5])
    src, dst, w = build_coo(adj, wk)
    ref = np.asarray(full_forward(
        params, family, jnp.asarray(tiny_ds.features), jnp.asarray(src),
        jnp.asarray(dst), jnp.asarray(w), adj.num_vertices, heads=heads,
        batch_norm=True,
    ))
    got = layerwise_inference(
        params, family, adj, tiny_ds.features, weight_kind=wk, heads=heads,
        chunk_size=128, mean_style="fullbatch", whole_graph=False,
        batch_norm=True,
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # whole-graph single-program serving path takes the same flag
    got_wg = layerwise_inference(
        params, family, adj, tiny_ds.features, weight_kind=wk, heads=heads,
        mean_style="fullbatch", whole_graph=True, batch_norm=True,
    )
    np.testing.assert_allclose(got_wg, ref, rtol=2e-4, atol=2e-4)
    # and the flag matters: BN-off serving of the same params differs
    off = layerwise_inference(
        params, family, adj, tiny_ds.features, weight_kind=wk, heads=heads,
        chunk_size=128, mean_style="fullbatch", whole_graph=False,
    )
    assert not np.allclose(got, off, atol=1e-3)


@pytest.mark.parametrize("family,wk,heads", [
    ("gcn", WeightKind.GCN, 1),
    ("gat", WeightKind.NONE, 2),
])
def test_inference_server_matches_layerwise(tiny_ds, adj, family, wk, heads):
    """InferenceServer (resident serving loop) == layerwise_inference
    whole-graph mode bit-for-bit: both run the same jitted program over the
    same padded COO; the server just keeps its operands on the device."""
    from sgnn_tpu.train import InferenceServer

    params = init_model(jax.random.PRNGKey(11), family, [32, 16, 5])
    ref = layerwise_inference(params, family, adj, tiny_ds.features,
                              weight_kind=wk, heads=heads, whole_graph=True)
    srv = InferenceServer(params, family, adj, tiny_ds.features,
                          weight_kind=wk, heads=heads)
    np.testing.assert_allclose(srv.logprobs(), ref, rtol=0, atol=0)
    assert srv.predict().shape == (adj.num_vertices,)
    # update_params serves the new weights (not the construction-time ones)
    params2 = init_model(jax.random.PRNGKey(12), family, [32, 16, 5])
    srv.update_params(params2)
    ref2 = layerwise_inference(params2, family, adj, tiny_ds.features,
                               weight_kind=wk, heads=heads, whole_graph=True)
    np.testing.assert_allclose(srv.logprobs(), ref2, rtol=0, atol=0)
    assert not np.allclose(ref, ref2, atol=1e-3)


def test_inference_server_bf16(tiny_ds, adj):
    """dtype=bfloat16 halves residency; the head stays f32 so log-probs
    remain close to the f32 serve (same tolerance as the bf16 trainers)."""
    from sgnn_tpu.train import InferenceServer

    params = init_model(jax.random.PRNGKey(13), "gcn", [32, 16, 5])
    f32 = InferenceServer(params, "gcn", adj, tiny_ds.features).logprobs()
    srv = InferenceServer(params, "gcn", adj, tiny_ds.features,
                          dtype=jnp.bfloat16)
    bf16 = srv.logprobs()
    assert bf16.dtype == np.float32  # f32 classification head
    assert np.mean(np.argmax(bf16, 1) == np.argmax(f32, 1)) > 0.98


@pytest.mark.parametrize("family,wk,heads", [
    ("gcn", WeightKind.GCN, 1),
    ("sage", WeightKind.MEAN, 1),
    ("gat", WeightKind.NONE, 2),
])
def test_query_matches_whole_graph_rows(tiny_ds, adj, family, wk, heads):
    """query(nids) — the per-request L-hop-neighborhood path — equals the
    whole-graph pass on the queried rows for every family, including
    duplicate and unordered request ids."""
    from sgnn_tpu.train import InferenceServer

    params = init_model(jax.random.PRNGKey(21), family, [32, 16, 5])
    srv = InferenceServer(params, family, adj, tiny_ds.features,
                          weight_kind=wk, heads=heads)
    full = srv.logprobs()
    rng = np.random.default_rng(0)
    for nids in (
        np.array([7]),                                   # single vertex
        rng.integers(0, adj.num_vertices, 33),           # dups + unordered
        np.arange(adj.num_vertices),                     # everything
    ):
        got = srv.query(nids)
        assert got.shape == (nids.size, full.shape[1])
        np.testing.assert_allclose(got, full[nids], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family,wk", [
    ("gcn", WeightKind.GCN),
    ("gat", WeightKind.NONE),
])
def test_query_zero_in_degree_vertex(family, wk):
    """A vertex with no in-edges aggregates to zeros exactly like the
    whole-graph forward (no NaNs from an empty softmax/segment).  Vertex 0
    here only SENDS edges, so its 2-hop query neighborhood is just itself."""
    from sgnn_tpu.train import InferenceServer

    rng = np.random.default_rng(5)
    v = 64
    src = rng.integers(0, v, 400)
    dst = rng.integers(1, v, 400)  # nothing ever points at vertex 0
    edges = np.stack([src, dst], axis=1).astype(np.int32)
    a = Adjacency.from_edges(edges, v)
    feats = rng.standard_normal((v, 16)).astype(np.float32)
    params = init_model(jax.random.PRNGKey(22), family, [16, 8, 3])
    srv = InferenceServer(params, family, a, feats, weight_kind=wk)
    got = srv.query(np.array([0]))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[0], srv.logprobs()[0],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("agg", ["max", "min"])
def test_server_serves_minmax_aggregator(tiny_ds, adj, agg):
    """AGGREGATOR min/max-trained models (FullBatchTrainer aggregator
    param) are served with the SAME reduction: server logprobs match the
    trainer's own predict(), and query() matches logprobs rows."""
    from sgnn_tpu.train import InferenceServer
    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=1,
                    learn_rate=0.01, seed=9, vertices=tiny_ds.num_vertices)
    tr = FullBatchTrainer(cfg, tiny_ds, family="gcn", aggregator=agg)
    srv = InferenceServer(tr.params, "gcn", adj, tiny_ds.features,
                          weight_kind=WeightKind.GCN,
                          mean_style="fullbatch", aggregator=agg)
    np.testing.assert_allclose(srv.logprobs(), tr.predict(),
                               rtol=1e-5, atol=1e-5)
    nids = np.array([1, 5, 5, 42, 7])
    np.testing.assert_allclose(srv.query(nids), srv.logprobs()[nids],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_query_fuzz_random_graphs(seed):
    """Fuzz query() against the whole-graph pass on random multigraphs
    (self-loops + duplicate edges included) across families and request
    sizes — the L-hop planner must agree with the resident full pass."""
    from sgnn_tpu.train import InferenceServer

    rng = np.random.default_rng(seed)
    v = int(rng.integers(20, 120))
    e = int(rng.integers(v, v * 8))
    edges = np.stack([rng.integers(0, v, e), rng.integers(0, v, e)],
                     axis=1).astype(np.int32)
    if seed == 0:  # force self-loops and exact-duplicate edges
        edges[: v // 2, 0] = edges[: v // 2, 1]
        edges[-3:] = edges[0]
    a = Adjacency.from_edges(edges, v)
    feats = rng.standard_normal((v, 12)).astype(np.float32)
    fam, wk, heads = [("gcn", WeightKind.GCN, 1),
                      ("sage", WeightKind.MEAN, 1),
                      ("gat", WeightKind.NONE, 2)][seed % 3]
    params = init_model(jax.random.PRNGKey(seed), fam, [12, 8, 4])
    srv = InferenceServer(params, fam, a, feats, weight_kind=wk,
                          heads=heads)
    full = srv.logprobs()
    for _ in range(3):
        nids = rng.integers(0, v, int(rng.integers(1, v)))
        np.testing.assert_allclose(srv.query(nids), full[nids],
                                   rtol=1e-4, atol=1e-5)


def test_query_fanout_semantics(tiny_ds, adj):
    """query(fanout=k): k ≥ max in-degree reproduces the exact result;
    a small k is reproducible under a fixed seed, differs across seeds,
    and recomputes MEAN/'plain' weights as 1/sampled-count (rows stay
    valid log-probs)."""
    from sgnn_tpu.train import InferenceServer

    params = init_model(jax.random.PRNGKey(31), "sage", [32, 16, 5])
    srv = InferenceServer(params, "sage", adj, tiny_ds.features,
                          weight_kind=WeightKind.MEAN)
    nids = np.arange(0, adj.num_vertices, 7)
    exact = srv.query(nids)
    kmax = int(np.max(adj.in_degree))
    np.testing.assert_allclose(srv.query(nids, fanout=kmax), exact,
                               rtol=1e-5, atol=1e-5)
    a = srv.query(nids, fanout=2, seed=0)
    b = srv.query(nids, fanout=2, seed=0)
    c = srv.query(nids, fanout=2, seed=1)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c, atol=1e-4)
    assert np.isfinite(a).all()
    # log-probs: exp-sums to 1 (the 1/sampled-count mean keeps the scale)
    np.testing.assert_allclose(np.exp(a).sum(1), 1.0, rtol=1e-3)
    # per-layer fanout list, bottom-first like cfg.fanout
    d = srv.query(nids, fanout=[3, 2], seed=0)
    assert d.shape == exact.shape and np.isfinite(d).all()
    with pytest.raises(ValueError):
        srv.query(nids, fanout=[1, 2, 3])


def test_server_warmup_precompiles_buckets(tiny_ds):
    """warmup() pre-populates the query shape buckets so a warm request
    stream hits only compiled programs (serving p99; VERDICT r2 #9)."""
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.train.inference import InferenceServer

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    params = init_model(jax.random.PRNGKey(0), "gcn", [32, 16, 5])
    srv = InferenceServer(params, "gcn", adj, tiny_ds.features)
    compiled = srv.warmup(sizes=(4, 16), reps=2)
    assert compiled >= 1
    seen = len(srv._seen_query_shapes)
    # tiny graphs bucket every small request identically (min pads), so a
    # warm query must hit an existing bucket — no new compile event
    out = srv.query(np.array([1, 2, 3, 4]))
    assert len(srv._seen_query_shapes) == seen
    assert out.shape == (4, 5)


def test_server_warmup_adaptive_and_neighbor_buckets(tiny_ds):
    """adaptive warmup stops once draws stop finding new shapes, and
    neighbors=True pre-compiles the ±1 edge-extent bucket variants with
    synthetic operands (the warm-stream p99 spikes, VERDICT r4 #6)."""
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.train.inference import InferenceServer

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    params = init_model(jax.random.PRNGKey(0), "gcn", [32, 16, 5])
    srv = InferenceServer(params, "gcn", adj, tiny_ds.features)
    compiled = srv.warmup(sizes=(4, 16), adaptive=True, neighbors=True)
    assert compiled >= 3  # base shapes + at least some neighbor variants
    # every neighbor variant of every seen shape is already warm
    for set_pads, e_pads in list(srv._seen_query_shapes):
        for li in range(len(e_pads)):
            up = list(e_pads)
            up[li] *= 2
            if (set_pads, tuple(up)) in srv._seen_query_shapes:
                break
        else:
            continue
        break
    else:
        raise AssertionError("no neighbor bucket was pre-warmed")
    # GAT + multihead goes through _warm_shape's synthetic path too
    gparams = init_model(jax.random.PRNGKey(1), "gat", [32, 16, 5])
    gsrv = InferenceServer(gparams, "gat", adj, tiny_ds.features, heads=2)
    assert gsrv.warmup(sizes=(4,), adaptive=True, neighbors=True) >= 2
