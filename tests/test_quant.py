"""FEATURE_DTYPE:int8 — per-column quantized feature storage (capacity).

The int8 path must train equivalently (quantization noise only) across
every consumer: host-sampled device-resident features, the on-device
sampler, the beyond-HBM feature cache (2x the staged rows per HBM byte),
the fused device cache refresh, and sharded features over the mesh.
Extension beyond the reference (its GPU feature cache stores f32 only).
"""

import numpy as np
import pytest

from sgnn_tpu.config import RunConfig
from sgnn_tpu.data.quant import dequantize, quantize_columns


def test_quantize_roundtrip_error_bound(tiny_ds):
    q, scale = quantize_columns(tiny_ds.features)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    err = np.abs(dequantize(q, scale) - tiny_ds.features)
    # symmetric rounding: error ≤ scale/2 per element, columnwise
    assert np.all(err <= scale[None, :] * 0.5 + 1e-7)
    # all-zero column → scale 1, q 0
    z = np.zeros((4, 3), np.float32)
    qz, sz = quantize_columns(z)
    assert np.all(qz == 0) and np.all(sz == 1.0)


def test_quantize_binary_features_exact():
    """Binary bag-of-words features (Cora-like) quantize EXACTLY: the
    int8 run is then bit-equivalent to float32, not just close."""
    rng = np.random.default_rng(0)
    x = (rng.random((64, 16)) > 0.7).astype(np.float32)
    q, scale = quantize_columns(x)
    np.testing.assert_array_equal(dequantize(q, scale), x)


def _mk_cfg(tiny_ds, **kw):
    base = dict(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
                epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices)
    base.update(kw)
    return RunConfig(**base)


def test_host_trainer_int8_matches_f32(tiny_ds):
    """Device-resident int8 features: same sampler seed → loss within the
    quantization noise of the float32 run."""
    from sgnn_tpu.train.trainer import SampleTrainer

    a = SampleTrainer(_mk_cfg(tiny_ds, feature_dtype="int8"), tiny_ds)
    assert a.feature_int8 and a.dev_features.dtype == np.int8
    b = SampleTrainer(_mk_cfg(tiny_ds), tiny_ds)
    for _ in range(2):
        loss_a, acc_a, _ = a.train_epoch()
        loss_b, acc_b, _ = b.train_epoch()
        np.testing.assert_allclose(loss_a, loss_b, rtol=0.05, atol=0.02)
    assert 0.0 <= a.evaluate(a.val_nids) <= 1.0


def test_device_trainer_int8_learns(tiny_ds):
    """On-device sampling with int8 storage: dequant happens in-program
    (identity fast path disabled), training converges like f32."""
    from sgnn_tpu.train.device_trainer import DeviceSampleTrainer

    cfg = _mk_cfg(tiny_ds, feature_dtype="int8", epochs=3)
    t = DeviceSampleTrainer(cfg, tiny_ds, family="sage")
    assert t.dev_features.dtype == np.int8
    losses = [t.train_epoch()[0] for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_feature_cache_int8_doubles_capacity_and_trains(tiny_ds):
    """Beyond-HBM int8: the SAME byte budget stages 2x the rows of bf16
    (4x of f32), cold rows ship as int8, and training matches the
    device-resident int8 run batch for batch."""
    from sgnn_tpu.cache.feature_cache import hbm_feature_capacity
    from sgnn_tpu.train.trainer import SampleTrainer

    budget = 125 * 32 * 4
    assert (hbm_feature_capacity(32, 1, budget_bytes=budget)
            == 4 * hbm_feature_capacity(32, 4, budget_bytes=budget))

    a = SampleTrainer(_mk_cfg(tiny_ds, feature_dtype="int8",
                              feature_cache_rate=0.5),
                      tiny_ds, features_on_device=False,
                      hbm_budget_bytes=budget)
    assert a.feat_cache is not None
    # int8 rows: the f32 budget of 125 rows holds 4x as many (cap 250 by
    # the 0.5 rate)
    assert a.feat_cache.hot_ids.size == 250
    assert a.feat_cache.dev_hot.dtype == np.int8
    b = SampleTrainer(_mk_cfg(tiny_ds, feature_dtype="int8"), tiny_ds)
    for _ in range(2):
        loss_a, _, _ = a.train_epoch()
        loss_b, _, _ = b.train_epoch()
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-4)
    assert a.feat_cache.hit_rate > 0.4, a.feat_cache.hit_rate
    # cold rows crossed the link at 1 byte/element
    assert a.feat_cache.bytes_shipped < a.feat_cache.bytes_full


def test_device_cached_int8_refresh(tiny_ds):
    """Fused device cache (GS_SAMPLE_CACHE analog) with int8 features: the
    in-scan refresh dequantizes via the per-column scale fold — the int8
    loss trajectory must track the f32 one within quantization noise."""
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer

    def run(fd):
        cfg = _mk_cfg(tiny_ds, feature_dtype=fd, epochs=3, cache_rate=0.2)
        t = DeviceCachedSampleTrainer(cfg, tiny_ds, family="sage")
        return [t.train_epoch()[0] for _ in range(3)]

    l8, lf = run("int8"), run("")
    assert np.isfinite(l8).all()
    np.testing.assert_allclose(l8, lf, rtol=0.02, atol=0.01)


def test_cora_int8_engine_accuracy(cora):
    """Real Cora through the cfg surface with FEATURE_DTYPE:int8: binary
    features quantize exactly, so accuracy tracks the f32 engine."""
    from sgnn_tpu.train.engines import run_engine

    cfg = RunConfig(
        algorithm="GCNSAMPLEGPU", layer_sizes=[1433, 64, 7],
        fanout=[5, 5], batch_size=512, epochs=4, learn_rate=0.01,
        weight_decay=1e-4, drop_rate=0.0, vertices=cora.num_vertices,
        feature_dtype="int8",
    )
    report = run_engine(cfg, cora)
    assert report.train_acc[-1] >= 0.75, report.train_acc


def test_bad_feature_dtype_rejected(tiny_ds):
    from sgnn_tpu.train.trainer import SampleTrainer

    with pytest.raises(ValueError, match="FEATURE_DTYPE"):
        SampleTrainer(_mk_cfg(tiny_ds, feature_dtype="fp4"), tiny_ds)


def test_feature_dtype_cfg_key_parses():
    from sgnn_tpu.config import parse_cfg_text

    cfg = parse_cfg_text("FEATURE_DTYPE:int8\nDTYPE:bfloat16\n")
    assert cfg.feature_dtype == "int8" and cfg.dtype == "bfloat16"


def test_shard_features_int8_matches_replicated(tiny_ds):
    """Row-sharded int8 features over the 8-device mesh (ntsPeerRPC analog
    + FEATURE_DTYPE:int8): each shard stores quantized rows, the ICI fetch
    dequantizes after the collective — loss equals the replicated int8
    run's (same seeds, same draws)."""
    from sgnn_tpu.parallel.dp_device import DeviceDataParallelTrainer
    from sgnn_tpu.train.device_trainer import DeviceSampleTrainer

    def run(shard):
        cfg = _mk_cfg(tiny_ds, feature_dtype="int8", epochs=2)
        base = DeviceSampleTrainer(cfg, tiny_ds, family="gcn")
        tr = DeviceDataParallelTrainer(base, shard_features=shard)
        return [tr.train_epoch()[0] for _ in range(2)]

    np.testing.assert_allclose(run(True), run(False), rtol=1e-4)


def test_full_forward_int8_matches_dequant(tiny_ds):
    """Whole-graph forward with int8 x + scale fold == forward over the
    dequantized matrix, for every family/branch (transform-first,
    agg-first, GAT incl. multi-head, min/max aggregator)."""
    import jax.numpy as jnp

    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.train.fullbatch import build_coo, full_forward

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    q, scale = quantize_columns(tiny_ds.features)
    xq = jnp.asarray(q)
    xs = jnp.asarray(scale)
    xf = jnp.asarray(dequantize(q, scale))
    import jax

    cases = [
        ("gcn", [32, 16, 5], 1, "sum"),     # transform-first layer 0
        ("gcn", [32, 64, 5], 1, "sum"),     # agg-first layer 0 (in < out)
        ("gat", [32, 16, 5], 1, "sum"),
        ("gat", [32, 16, 5], 4, "sum"),     # multi-head
        ("sage", [32, 16, 5], 1, "max"),    # min/max aggregator
    ]
    for family, sizes, heads, aggregator in cases:
        wk = WeightKind.NONE if family == "gat" else WeightKind.GCN
        src, dst, w = build_coo(adj, wk)
        src, dst, w = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
        params = init_model(jax.random.PRNGKey(3), family, sizes)
        got = full_forward(params, family, xq, src, dst, w,
                           adj.num_vertices, aggregator=aggregator,
                           heads=heads, x_scale=xs)
        ref = full_forward(params, family, xf, src, dst, w,
                           adj.num_vertices, aggregator=aggregator,
                           heads=heads)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=f"{family}/{sizes}/{heads}h/{aggregator}",
        )


def test_fullbatch_engine_int8_cora(cora):
    """GCNFULLBATCH with FEATURE_DTYPE:int8 on real Cora: binary features
    quantize exactly — accuracy tracks the f32 engine."""
    from sgnn_tpu.train.engines import run_engine

    def run(fd):
        cfg = RunConfig(
            algorithm="GCNFULLBATCH", layer_sizes=[1433, 64, 7],
            epochs=15, learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
            vertices=cora.num_vertices, feature_dtype=fd,
        )
        return run_engine(cfg, cora)

    r8, rf = run("int8"), run("")
    np.testing.assert_allclose(r8.losses, rf.losses, rtol=1e-3, atol=1e-4)


def test_inference_server_int8(tiny_ds):
    """int8-resident InferenceServer: predictions agree with the f32
    server, and query(nids) matches logprobs()[nids]."""
    import jax

    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.train.inference import InferenceServer

    adj = Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)
    params = init_model(jax.random.PRNGKey(0), "gcn", [32, 16, 5])
    srv8 = InferenceServer(params, "gcn", adj, tiny_ds.features,
                           dtype="int8")
    assert srv8._x.dtype == np.int8
    srvf = InferenceServer(params, "gcn", adj, tiny_ds.features)
    lp8, lpf = srv8.logprobs(), srvf.logprobs()
    agree = np.mean(np.argmax(lp8, 1) == np.argmax(lpf, 1))
    assert agree > 0.97, agree
    nids = np.array([0, 3, 17, 255, 499])
    np.testing.assert_allclose(srv8.query(nids), lp8[nids],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("family,halo", [("gcn", "all_gather"),
                                         ("gat", "targeted")])
def test_fullbatch_int8_sharded_matches_single(tiny_ds, family, halo):
    """Vertex-sharded int8 full-batch (quantized shards + scale fold in
    the shard-local forward) trains on the SAME loss trajectory as the
    single-device int8 run — for the SpMM family over both halo modes and
    for distributed GAT."""
    import jax
    from jax.sharding import Mesh

    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    def run(mesh):
        cfg = _mk_cfg(tiny_ds, feature_dtype="int8", epochs=3)
        cfg.fanout = []
        cfg.halo = halo
        t = FullBatchTrainer(cfg, tiny_ds, family=family, mesh=mesh)
        return [t.train_epoch()[0] for _ in range(3)]

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    np.testing.assert_allclose(run(mesh), run(None), rtol=2e-4, atol=1e-5)
