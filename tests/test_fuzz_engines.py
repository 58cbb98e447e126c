"""Knob-interaction fuzz over the cfg surface.

Every ALGORITHM string is run with a seeded-random draw of the orthogonal
knobs (DTYPE, FEATURE_DTYPE, OPTIMIZER, BATCH_NORM, REMAT, HEADS,
SRC_PAD_FACTOR, DROP_RATE, PUSHDOWN, SHARD_FEATURES, BATCH_TYPE,
AGGREGATOR, oversized BATCH_SIZE) — the combinations no targeted test
enumerates.  The contract is modest and universal: the engine builds,
trains, and reports finite losses and sane accuracies.  Failures here are
shape/dtype/plumbing bugs at knob intersections (e.g. int8 x remat x
heads), which is exactly what a user flipping cfg keys would hit.
"""

import numpy as np
import pytest

from sgnn_tpu.config import RunConfig
from sgnn_tpu.train.engines import ENGINES, run_engine


def _random_cfg(rng, spec, num_vertices):
    cfg = RunConfig(
        algorithm=spec.name,
        layer_sizes=[32, 16, 5],
        fanout=[] if spec.fullbatch else [4, 3],
        batch_size=int(rng.choice([64, 100000])),  # incl. > train set
        epochs=2,
        learn_rate=0.01,
        weight_decay=float(rng.choice([0.0, 1e-4])),
        drop_rate=float(rng.choice([0.0, 0.5])),
        vertices=num_vertices,
        dtype=str(rng.choice(["float32", "bfloat16"])),
        feature_dtype=str(rng.choice(["", "int8"])),
        optimizer=str(rng.choice(["adam", "sgd"])),
        batch_norm=bool(rng.integers(0, 2)),
        remat=bool(rng.integers(0, 2)),
        seed=int(rng.integers(0, 1000)),
        batch_type=str(rng.choice(["shuffle", "sequence", "random"])),
        cache_rate=0.2,
        up_degree=bool(rng.integers(0, 2)),
    )
    if spec.family == "gat":
        cfg.heads = int(rng.choice([1, 2]))
    if not spec.fullbatch and spec.device_sampling:
        cfg.src_pad_factor = float(rng.choice([0.0, 1.5]))
    if spec.fullbatch:
        cfg.aggregator = str(rng.choice(["sum", "min", "max"]))
        # min/max have no attention analog; keep GAT on sum
        if spec.family == "gat":
            cfg.aggregator = "sum"
    if spec.multi_device and spec.device_sampling:
        cfg.shard_features = bool(rng.integers(0, 2))
    if (not spec.use_cache and not spec.multi_device
            and not spec.fullbatch):
        cfg.pushdown = bool(rng.integers(0, 2))
    return cfg


@pytest.mark.parametrize("algo", sorted(ENGINES))
def test_engine_survives_random_knobs(tiny_ds, algo):
    spec = ENGINES[algo]
    # two seeded draws per engine: different knob intersections each run
    # of the suite would be flaky — fix the seed per engine name instead
    rng = np.random.default_rng(abs(hash(algo)) % (2**32))
    for draw in range(2):
        cfg = _random_cfg(rng, spec, tiny_ds.num_vertices)
        report = run_engine(cfg, tiny_ds)
        assert np.isfinite(report.losses).all(), (cfg, report.losses)
        for accs in (report.train_acc, report.val_acc, report.test_acc):
            assert all(0.0 <= a <= 1.0 for a in accs), (cfg, accs)
