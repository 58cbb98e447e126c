"""Estimator-regime advisor (train/advisor.py): coverage estimate, the
ESTIMATOR_ADVISOR cfg modes, and the route composition."""

import numpy as np

from sgnn_tpu.config import RunConfig
from sgnn_tpu.graph.adjacency import Adjacency
from sgnn_tpu.train.advisor import (
    advise_estimator_regime,
    expected_hop_rows,
)


def _adj(tiny_ds):
    return Adjacency.from_edges(tiny_ds.edges, tiny_ds.num_vertices)


def test_expected_hop_rows_sane(tiny_ds):
    adj = _adj(tiny_ds)
    rows = expected_hop_rows(adj, [18, 18], 64)
    assert len(rows) == 2 and rows[0] <= rows[1] <= adj.num_vertices
    # empirical check: average unique bottom-hop sources over sampled
    # batches sits near the estimate (same model the pad planner trusts)
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(5):
        seeds = rng.choice(adj.num_vertices, 64, replace=False)
        cur = seeds
        for f in [18, 18]:
            nxt = [cur]
            for d in cur:
                nb = adj.indices[adj.indptr[d]:adj.indptr[d + 1]]
                nxt.append(rng.choice(nb, min(f, nb.size), replace=False)
                           if nb.size else nb)
            cur = np.unique(np.concatenate(nxt))
        samples.append(cur.size)
    emp = float(np.mean(samples))
    assert abs(rows[1] - emp) / emp < 0.25, (rows[1], emp)


def test_advice_triggers_on_saturating_fanout(tiny_ds):
    adj = _adj(tiny_ds)
    advice = advise_estimator_regime(adj, [18, 18], 64, 400)
    assert advice is not None
    assert advice["bottom_coverage"] >= 0.5
    assert advice["steps_per_epoch"] == 7
    assert advise_estimator_regime(adj, [2], 4, 400) is None
    assert advise_estimator_regime(adj, [18, 18], 64, 400,
                                   mode="off") is None


def test_trainer_attaches_advice(tiny_ds):
    from sgnn_tpu.train.trainer import SampleTrainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[18, 18], batch_size=64,
                    epochs=1, vertices=tiny_ds.num_vertices)
    tr = SampleTrainer(cfg, tiny_ds, family="gcn")
    assert tr.estimator_advice is not None
    assert tr.estimator_advice["bottom_coverage"] >= 0.5

    import dataclasses

    off = SampleTrainer(dataclasses.replace(cfg, estimator_advisor="off"),
                        tiny_ds, family="gcn")
    assert off.estimator_advice is None


def test_route_mode_enables_pushdown_composition(tiny_ds):
    """ESTIMATOR_ADVISOR:route on a plain sampled engine in the
    degenerate regime builds the cached (pushdown bottom-hop) trainer."""
    from sgnn_tpu.train.device_cached import DeviceCachedSampleTrainer
    from sgnn_tpu.train.engines import build_trainer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[18, 18], batch_size=64,
                    epochs=1, vertices=tiny_ds.num_vertices,
                    algorithm="GCNSAMPLEALLGPU", cache_rate=0.1,
                    estimator_advisor="route")
    tr = build_trainer(cfg, tiny_ds)
    assert isinstance(tr, DeviceCachedSampleTrainer)
    # sanity: it trains
    l0, _, _ = tr.train_epoch()
    l1, _, _ = tr.train_epoch()
    assert np.isfinite(l1) and l1 < l0

    # below the threshold, route must NOT reroute
    cfg2 = RunConfig(layer_sizes=[32, 16, 5], fanout=[2, 2], batch_size=8,
                     epochs=1, vertices=tiny_ds.num_vertices,
                     algorithm="GCNSAMPLEALLGPU", cache_rate=0.1,
                     estimator_advisor="route")
    tr2 = build_trainer(cfg2, tiny_ds)
    assert not isinstance(tr2, DeviceCachedSampleTrainer)
