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
