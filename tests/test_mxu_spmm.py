"""One-hot MXU SpMM (ops/pallas/mxu_spmm.py): planner + kernel + VJP
equivalence against the XLA reference ops, and the full_forward /
FullBatchTrainer integration.

Runs in Pallas interpret mode on CPU (the kernel itself is Mosaic-lowered
only on the real chip; scripts/profile_mxu_spmm.py holds the measured
on-chip numbers: 63.9 vs 178.9 ms at Reddit scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgnn_tpu.ops.pallas.mxu_spmm import (
    MxuSpmmPair,
    build_mxu_spmm_pair,
    build_mxu_spmm_plan,
    mxu_spmm_fwd,
)

# tiny geometry: exercises multi-slab, multi-dst-block, window clamping
# and chunk splitting without interpret-mode minutes
KW = dict(s_blk=256, d_blk=512, w_win=128, e_sub=64, e_t=256,
          max_pad_ratio=50.0, chunk_steps=7)


def _rand_graph(rng, v, e, skew=False):
    if skew:
        # power-law-ish dst concentration: exercises >e_sub-edge dst runs
        dst = (rng.zipf(1.5, e) % v).astype(np.int32)
    else:
        dst = rng.integers(0, v, e).astype(np.int32)
    src = rng.integers(0, v, e).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    return src, dst, w


def _ref_spmm(src, dst, w, x, num_dst):
    out = np.zeros((num_dst, x.shape[1]), np.float32)
    np.add.at(out, dst, x[src] * w[:, None])
    return out


@pytest.mark.parametrize("skew", [False, True])
def test_mxu_spmm_forward_matches_reference(skew):
    rng = np.random.default_rng(3)
    v, e = 1100, 5000
    src, dst, w = _rand_graph(rng, v, e, skew)
    x = rng.standard_normal((v, 48)).astype(np.float32)
    plan = build_mxu_spmm_plan(src, dst, w, v, v, **KW)
    assert plan is not None
    assert plan.static.n_chunks >= 2  # the chunk-split path is exercised
    out = np.asarray(mxu_spmm_fwd(jnp.asarray(x), *plan.operands,
                                  plan.meta, plan.static))
    ref = _ref_spmm(src, dst, w, x, v)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 5e-3  # bf16 kernel numerics


def test_mxu_spmm_gradient_is_transposed_spmm():
    rng = np.random.default_rng(5)
    v, e = 900, 4000
    src, dst, w = _rand_graph(rng, v, e)
    x = rng.standard_normal((v, 32)).astype(np.float32)
    pair = build_mxu_spmm_pair(src, dst, w, v, v, **KW)
    assert isinstance(pair, MxuSpmmPair)
    c = rng.standard_normal((v, 32)).astype(np.float32)
    g = jax.grad(lambda t: jnp.sum(pair(t) * c))(jnp.asarray(x))
    refg = np.zeros((v, 32), np.float32)
    np.add.at(refg, src, c[dst] * w[:, None])
    scale = np.abs(refg).max()
    assert np.abs(np.asarray(g) - refg).max() / scale < 5e-3


def test_mxu_planner_drops_weight_zero_pad_edges():
    rng = np.random.default_rng(7)
    v = 600
    src, dst, w = _rand_graph(rng, v, 2000)
    # CSC-style pad tail: weight-0 edges pointing at v-1
    src_p = np.concatenate([src, np.zeros(333, np.int32)])
    dst_p = np.concatenate([dst, np.full(333, v - 1, np.int32)])
    w_p = np.concatenate([w, np.zeros(333, np.float32)])
    a = build_mxu_spmm_plan(src, dst, w, v, v, **KW)
    b = build_mxu_spmm_plan(src_p, dst_p, w_p, v, v, **KW)
    assert a.slot_count == b.slot_count
    x = jnp.asarray(rng.standard_normal((v, 16)), jnp.float32)
    oa = np.asarray(mxu_spmm_fwd(x, *a.operands, a.meta, a.static))
    ob = np.asarray(mxu_spmm_fwd(x, *b.operands, b.meta, b.static))
    np.testing.assert_allclose(oa, ob, rtol=0, atol=0)


def test_mxu_planner_refuses_past_pad_knee():
    # 3 edges scattered across distant blocks: slot pad ratio is enormous
    src = np.array([0, 5000, 9000], np.int32)
    dst = np.array([0, 5000, 9000], np.int32)
    w = np.ones(3, np.float32)
    assert build_mxu_spmm_plan(src, dst, w, 10000, 10000,
                               max_pad_ratio=2.0) is None


def test_mxu_split_src_variant_matches():
    # s_win < s_blk: per-sub-tile source windows into a larger slab
    rng = np.random.default_rng(11)
    v, e = 800, 3000
    src, dst, w = _rand_graph(rng, v, e)
    x = rng.standard_normal((v, 24)).astype(np.float32)
    plan = build_mxu_spmm_plan(src, dst, w, v, v, s_blk=512, s_win=128,
                               d_blk=512, w_win=128, e_sub=64, e_t=256,
                               max_pad_ratio=50.0, chunk_steps=9)
    assert plan is not None and plan.static.s_win < plan.static.s_blk
    out = np.asarray(mxu_spmm_fwd(jnp.asarray(x), *plan.operands,
                                  plan.meta, plan.static))
    ref = _ref_spmm(src, dst, w, x, v)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-3


def _tiny_dataset(rng, v=400, e=1600, f=12, classes=5):
    from sgnn_tpu.data.dataset import Dataset

    edges = np.stack([rng.integers(0, v, e), rng.integers(0, v, e)], 1)
    feats = rng.standard_normal((v, f)).astype(np.float32)
    labels = rng.integers(0, classes, v).astype(np.int32)
    masks = rng.choice([0, 1, 2], v, p=[0.7, 0.15, 0.15]).astype(np.int32)
    return Dataset(edges=edges.astype(np.int32), features=feats,
                   labels=labels, masks=masks, name="mxu-tiny",
                   num_vertices=v)


@pytest.mark.parametrize("family", ["gcn", "sage"])
def test_fullbatch_trainer_mxu_matches_windowed(family):
    """MXU_SPMM:on trains the same trajectory as the windowed path (to
    bf16 kernel tolerance) — the flag only changes the SpMM backend."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.train.fullbatch import FullBatchTrainer

    rng = np.random.default_rng(13)
    ds = _tiny_dataset(rng)
    losses = {}
    for mode in ("off", "on"):
        cfg = RunConfig(layer_sizes=[12, 16, 5], epochs=3, learn_rate=0.01,
                        drop_rate=0.0, seed=0, mxu_spmm=mode)
        tr = FullBatchTrainer(cfg, ds, family=family)
        if mode == "on":
            # the tiny default-geometry plan must exist for the test to
            # mean anything; shrink geometry to the test graph
            from sgnn_tpu.ops.pallas.mxu_spmm import build_mxu_spmm_pair

            src, dst, w = (np.asarray(tr.src), np.asarray(tr.dst),
                           np.asarray(tr.w))
            tr.mxu_pair = build_mxu_spmm_pair(
                src, dst, w, ds.num_vertices, ds.num_vertices, **KW)
            assert tr.mxu_pair is not None
            tr._step = tr._build_single_step()
        hist = [tr.train_epoch()[0] for _ in range(3)]
        losses[mode] = hist
        if mode == "on":
            # serving surface uses the forward plan too
            logp = tr.predict()
            assert logp.shape == (ds.num_vertices, 5)
    np.testing.assert_allclose(losses["on"], losses["off"],
                               rtol=2e-2, atol=2e-2)


def test_mxu_serving_forward_only_matches_full_forward():
    """fwd_sorted serving pass with a forward-only (statics,) mxu tuple."""
    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.graph.adjacency import Adjacency
    from sgnn_tpu.models.gnn import init_model
    from sgnn_tpu.sampler.blocks import WeightKind
    from sgnn_tpu.train.fullbatch import build_coo, full_forward

    rng = np.random.default_rng(17)
    ds = _tiny_dataset(rng)
    adj = Adjacency.from_edges(ds.edges, ds.num_vertices)
    src, dst, w = build_coo(adj, WeightKind.GCN)
    v = ds.num_vertices
    params = init_model(jax.random.PRNGKey(0), "gcn", (12, 16, 5))
    x = jnp.asarray(ds.features)
    base = full_forward(params, "gcn", x, jnp.asarray(src),
                        jnp.asarray(dst), jnp.asarray(w), v,
                        fwd_sorted=True)
    plan = build_mxu_spmm_plan(src, dst, w, v, v, **KW)
    withk = full_forward(params, "gcn", x, jnp.asarray(src),
                         jnp.asarray(dst), jnp.asarray(w), v,
                         fwd_sorted=True,
                         mxu=((*plan.operands, plan.meta),
                              (plan.static,)))
    np.testing.assert_allclose(np.asarray(withk), np.asarray(base),
                               rtol=2e-2, atol=2e-2)


def test_mxu_auto_geometry_selection():
    """build_mxu_spmm_pair_auto: picks a geometry by projected cost and
    refuses when no geometry beats the windowed path."""
    from sgnn_tpu.ops.pallas.mxu_spmm import (
        _WINDOWED_NS_EDGE,
        build_mxu_spmm_pair_auto,
    )

    rng = np.random.default_rng(21)
    # dense-enough random graph: the default geometry should win
    v, e = 4000, 120000
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    w = np.abs(rng.standard_normal(e)).astype(np.float32) + 0.1
    pair = build_mxu_spmm_pair_auto(src, dst, w, v, v)
    assert pair is not None
    assert pair.fwd.pad_ratio(e) * 3.84 < _WINDOWED_NS_EDGE

    # pathologically sparse spread: every geometry pads past the knee
    v2 = 300000
    src2 = (np.arange(50) * 5913).astype(np.int32) % v2
    dst2 = (np.arange(50) * 7717).astype(np.int32) % v2
    w2 = np.ones(50, np.float32)
    assert build_mxu_spmm_pair_auto(src2, dst2, w2, v2, v2) is None
