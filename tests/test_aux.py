"""Aux subsystem tests: checkpoint/resume, OGB converter round-trip,
profiling counters."""

import os

import numpy as np
import pytest

from sgnn_tpu.config import RunConfig
from sgnn_tpu.train.trainer import SampleTrainer


@pytest.fixture()
def trainer(tiny_ds):
    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
                    epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices)
    return SampleTrainer(cfg, tiny_ds, family="gcn")


def test_checkpoint_roundtrip(tmp_path, trainer, tiny_ds):
    from sgnn_tpu.train.checkpoint import CheckpointManager

    trainer.train_epoch()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, trainer)
    w_before = np.asarray(trainer.params.weights[0]).copy()
    trainer.train_epoch()  # mutate
    assert not np.allclose(np.asarray(trainer.params.weights[0]), w_before)
    step = mgr.restore(trainer, 0)
    assert step == 0
    np.testing.assert_allclose(
        np.asarray(trainer.params.weights[0]), w_before, rtol=1e-6
    )


def test_checkpoint_latest_and_prune(tmp_path, trainer):
    from sgnn_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "c2"), max_to_keep=2)
    for s in range(4):
        trainer.train_epoch()
        mgr.save(s, trainer)
    step = mgr.restore(trainer)  # latest
    assert step == 3


def test_ogb_export_reload_roundtrip(tmp_path, tiny_ds):
    """export_nts_format output reloads bit-identically via the NTS readers."""
    from sgnn_tpu.data.ogb import export_nts_format
    from sgnn_tpu.data.nts_format import load_nts_dataset

    base = export_nts_format(tiny_ds, str(tmp_path), prefix="toy")
    ds2 = load_nts_dataset(
        edge_file=f"{base}.{tiny_ds.num_vertices}.edge.self",
        feature_file=f"{base}.featuretable",
        label_file=f"{base}.labeltable",
        mask_file=f"{base}.mask",
        num_vertices=tiny_ds.num_vertices,
        feature_dim=tiny_ds.feature_dim,
    )
    np.testing.assert_array_equal(ds2.edges, tiny_ds.edges)
    np.testing.assert_allclose(ds2.features, tiny_ds.features, rtol=1e-6)
    np.testing.assert_array_equal(ds2.labels, tiny_ds.labels)
    np.testing.assert_array_equal(ds2.masks, tiny_ds.masks)


def test_counters():
    from sgnn_tpu.utils.profiling import Counters

    c = Counters()
    c.add("sampled", 100)
    c.add("hits", 25)
    assert c.ratio("hits", "sampled") == 0.25
    assert "hits=25" in c.summary()


def test_memory_stats_shape():
    from sgnn_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    # CPU backend may not expose memory stats; only check the contract
    assert stats is None or isinstance(stats, dict)


def test_checkpoint_numpy_fallback(tmp_path, trainer):
    """The no-orbax fallback writer round-trips state too."""
    from sgnn_tpu.train import checkpoint as ckpt_mod

    mgr = ckpt_mod.CheckpointManager(str(tmp_path / "np_ckpt"))
    mgr._ocp = None
    mgr._mgr = None  # force the numpy path
    trainer.train_epoch()
    w0 = np.asarray(trainer.params.weights[0]).copy()
    mgr.save(1, trainer)
    trainer.train_epoch()
    step = mgr.restore(trainer)
    assert step == 1
    np.testing.assert_allclose(np.asarray(trainer.params.weights[0]), w0,
                               rtol=1e-6)


# ------------------------------------------------- resume equivalence ----
def _resume_equivalence(make_trainer, tmp_path):
    """Resume-vs-uninterrupted bit-equivalence: train 2 epochs, checkpoint,
    train 2 more; a fresh trainer restored from the checkpoint and trained
    2 epochs must land on identical params (requires sampler RNG + dropout
    + cache state in the checkpoint, not just params/moments)."""
    import jax

    from sgnn_tpu.train.checkpoint import CheckpointManager

    a = make_trainer()
    a.train_epoch()
    a.train_epoch()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, a)
    a.train_epoch()
    a.train_epoch()

    b = make_trainer()
    assert mgr.restore(b) == 1
    b.train_epoch()
    b.train_epoch()
    pa = getattr(a, "base", a).params   # DP wrappers keep state on .base
    pb = getattr(b, "base", b).params
    la = jax.tree.leaves(pa)
    lb = jax.tree.leaves(pb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=0, atol=0
        )


def test_resume_equivalence_device_engine(tmp_path, tiny_ds):
    """GCNSAMPLEALLGPU (device-sampled engine) resumes bit-equivalently."""
    from sgnn_tpu.train.engines import build_trainer

    def make():
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3],
                        batch_size=64, epochs=4, drop_rate=0.3,
                        vertices=tiny_ds.num_vertices,
                        algorithm="GCNSAMPLEALLGPU")
        return build_trainer(cfg, tiny_ds)

    _resume_equivalence(make, tmp_path)


def test_resume_equivalence_cached_engine(tmp_path, tiny_ds):
    """GCNSAMPLEPDCACHE (hot-vertex cache engine) resumes bit-equivalently
    including the cache array and staleness-queue version."""
    from sgnn_tpu.train.engines import build_trainer

    def make():
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3],
                        batch_size=64, epochs=4, drop_rate=0.3,
                        vertices=tiny_ds.num_vertices,
                        algorithm="GCNSAMPLEPDCACHE", cache_rate=0.1)
        return build_trainer(cfg, tiny_ds)

    _resume_equivalence(make, tmp_path)


def test_resume_equivalence_fullbatch_engine(tmp_path, tiny_ds):
    """GCNFULLBATCH (whole-graph engine) resumes bit-equivalently —
    closes the checkpoint matrix over the third trainer family (sampled /
    cached / full-batch)."""
    from sgnn_tpu.train.engines import build_trainer

    def make():
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[1, 1],
                        batch_size=64, epochs=4, drop_rate=0.3,
                        vertices=tiny_ds.num_vertices,
                        algorithm="GCNFULLBATCH")
        return build_trainer(cfg, tiny_ds)

    _resume_equivalence(make, tmp_path)


def test_resume_equivalence_dp_engine(tmp_path, tiny_ds):
    """GCNSAMPLEALLMULTI (device-sampled DP over the 8-device mesh)
    restores and keeps training.  Regression: orbax hands back arrays
    COMMITTED to device 0, which the mesh-sharded epoch program rejected
    ("incompatible devices") until restore decommitted them to host."""
    from sgnn_tpu.train.engines import build_trainer

    def make():
        cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3],
                        batch_size=64, epochs=4, drop_rate=0.3,
                        vertices=tiny_ds.num_vertices,
                        algorithm="GCNSAMPLEALLMULTI")
        return build_trainer(cfg, tiny_ds)

    _resume_equivalence(make, tmp_path)


def test_reference_sgd_rule(tiny_ds):
    """OPTIMIZER:sgd reaches the trainer and applies the reference rule
    W' = (W - lr·g)·(1 - wd)  (learnC2C_with_decay_SGD,
    NtsScheduler.hpp:893-898)."""
    import jax.numpy as jnp

    from sgnn_tpu.nn.optim import ReferenceSGD, make_optimizer

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
                    epochs=1, drop_rate=0.0, vertices=tiny_ds.num_vertices,
                    optimizer="sgd", learn_rate=0.1, weight_decay=0.01)
    tr = SampleTrainer(cfg, tiny_ds, family="gcn")
    assert isinstance(tr.optimizer, ReferenceSGD)
    # exact rule on a toy pytree
    opt = make_optimizer(cfg)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, 0.5])}
    new_p, _ = opt.update(g, opt.init(p), p)
    np.testing.assert_allclose(
        np.asarray(new_p["w"]),
        (np.asarray([1.0, -2.0]) - 0.1 * np.asarray([0.5, 0.5])) * 0.99,
        rtol=1e-6,
    )
    # and it trains
    loss0, _, _ = tr.train_epoch()
    loss1, _, _ = tr.train_epoch()
    assert np.isfinite(loss1)


def test_time_skip_and_runs(tiny_ds):
    """TIME_SKIP excludes warmup epochs from the average; RUNS repeats the
    training run (both parsed-but-unconsumed in the reference,
    GraphSegment.h:187/:156 — real semantics here)."""
    from sgnn_tpu.train.trainer import TrainReport
    from sgnn_tpu.utils.timing import PhaseTimer

    r = TrainReport([10.0, 1.0, 1.0, 1.0], [], [], [], [], [],
                    PhaseTimer(), time_skip=2)
    assert abs(r.avg_epoch_time - 1.0) < 1e-9
    r0 = TrainReport([10.0], [], [], [], [], [], PhaseTimer(), time_skip=3)
    assert r0.avg_epoch_time == 10.0  # single epoch: never skip everything

    from sgnn_tpu.train import run_engine

    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
                    epochs=2, drop_rate=0.0, vertices=tiny_ds.num_vertices,
                    algorithm="GCNSAMPLEALLGPU", runs=2, time_skip=1)
    report = run_engine(cfg, tiny_ds)
    assert len(report.epoch_times) == 2


def test_pushdown_knob_routes_to_cache(tiny_ds):
    """PUSHDOWN:1 turns the pushdown/PD-cache path on inside non-PD
    engines (reference GCN_SAMPLE_ALLGPU.hpp:444 samples one fewer layer
    and serves the bottom from PushDown)."""
    from sgnn_tpu.config import parse_cfg_text
    from sgnn_tpu.train.engines import build_trainer

    cfg = parse_cfg_text(
        "ALGORITHM:GCNSAMPLEGPU\nPUSHDOWN:1\nLAYERS:32-16-5\nFANOUT:4-3\n"
        f"BATCH_SIZE:64\nVERTICES:{tiny_ds.num_vertices}\nCACHE_RATE:0.1\n"
        "EPOCHS:1\nDROP_RATE:0.0\n"
    )
    assert cfg.pushdown
    tr = build_trainer(cfg, tiny_ds)
    assert hasattr(tr, "cache")  # the PD-cache trainer
    loss, _, _ = tr.train_epoch()
    assert np.isfinite(loss)


def test_numpy_ckpt_preserves_rng_state(tmp_path, trainer):
    """The numpy fallback must round-trip the uint64 PCG64 state words
    EXACTLY.  Regression: restore used jnp.asarray on every leaf, which
    canonicalizes uint64 → uint32 (x64 disabled) and silently corrupted
    the resumed sampler RNG."""
    from sgnn_tpu.train import checkpoint as ckpt_mod

    mgr = ckpt_mod.CheckpointManager(str(tmp_path / "np_rng"))
    mgr._ocp = None
    mgr._mgr = None  # force the numpy path
    trainer.train_epoch()
    st = trainer.sampler.rng.bit_generator.state
    saved = (st["state"]["state"], st["state"]["inc"])
    mgr.save(1, trainer)
    trainer.train_epoch()  # advances the rng past the saved point
    assert mgr.restore(trainer) == 1
    st2 = trainer.sampler.rng.bit_generator.state
    assert (st2["state"]["state"], st2["state"]["inc"]) == saved
    # the assertion above only bites if high words are nonzero
    assert max(saved) > (1 << 32)


def test_divergence_guard_raises(tiny_ds):
    """Failure detection (guard.py): corrupt input features (NaN rows — the
    classic bad-data divergence) make the first epoch's loss non-finite and
    the run loop raises DivergenceError instead of silently training
    poisoned weights to the end (the reference has no detection — its only
    handler is a SIGSEGV stacktrace printer, main.cpp:37-41)."""
    import dataclasses

    from sgnn_tpu.train.guard import DivergenceError

    feats = tiny_ds.features.copy()
    feats[::7] = np.nan
    bad_ds = dataclasses.replace(tiny_ds, features=feats)
    cfg = RunConfig(layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=64,
                    epochs=5, drop_rate=0.0,
                    vertices=tiny_ds.num_vertices)
    tr = SampleTrainer(cfg, bad_ds, family="gcn")
    with pytest.raises(DivergenceError, match="diverged"):
        tr.run()


def test_divergence_guard_preserves_last_checkpoint(tmp_path, trainer):
    """run_with_checkpointing fires the guard BEFORE saving, so a diverged
    epoch never overwrites the last good checkpoint, and the error names
    the epoch to resume from."""
    from sgnn_tpu.train.checkpoint import CheckpointManager, \
        run_with_checkpointing
    from sgnn_tpu.train.guard import DivergenceError

    real = trainer.train_epoch
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] >= 3:  # epochs 0,1 fine; epoch 2 diverges
            return float("nan"), 0.0, 0
        return real()

    trainer.train_epoch = flaky
    with pytest.raises(DivergenceError) as ei:
        run_with_checkpointing(trainer, str(tmp_path), epochs=5,
                               resume=False)
    assert ei.value.epoch == 2
    assert ei.value.last_good_epoch == 1
    assert "resume" in str(ei.value)
    # last good checkpoint (epoch 1) is intact and restorable
    mgr = CheckpointManager(str(tmp_path))
    trainer.train_epoch = real
    assert mgr.restore(trainer) == 1


def test_cli_train_checkpoint_then_infer(tmp_path):
    """The train→checkpoint→serve workflow through the CLI surface:
    `--checkpoint-dir` trains + saves, then `--infer` restores the params
    WITHOUT training and writes exact full-graph predictions
    (--predictions-out).  The reference can only evaluate inside a training
    run (sampled Test(), GCN_SAMPLE_PD_CACHE.hpp:264-295)."""
    import os

    from sgnn_tpu.__main__ import main

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    cfg = tmp_path / "cli.cfg"
    cfg.write_text("\n".join([
        "ALGORITHM:GCNSAMPLEGPU",
        "VERTICES:2708",
        "LAYERS:1433-32-7",
        "FANOUT:10-5",
        "BATCH_SIZE:1024",
        "EPOCHS:2",
        f"EDGE_FILE:{root}/cora.2708.edge.self",
        f"FEATURE_FILE:{root}/cora.featuretable",
        f"LABEL_FILE:{root}/cora.labeltable",
        f"MASK_FILE:{root}/cora.mask",
        "LEARN_RATE:0.01",
        "DROP_RATE:0.0",
    ]) + "\n")
    ckpt = tmp_path / "ckpt"
    assert main([str(cfg), "--checkpoint-dir", str(ckpt)]) == 0
    preds = tmp_path / "preds.npy"
    assert main([str(cfg), "--infer", str(ckpt),
                 "--predictions-out", str(preds)]) == 0
    logp = np.load(preds)
    assert logp.shape == (2708, 7)
    assert np.isfinite(logp).all()
    np.testing.assert_allclose(np.exp(logp).sum(axis=1), 1.0, atol=1e-3)
    # --infer on an empty dir fails cleanly
    assert main([str(cfg), "--infer", str(tmp_path / "nope")]) == 1


def test_cli_infer_fullbatch_checkpoint(tmp_path):
    """--infer serves *FULLBATCH checkpoints through the trainer's own
    forward (predict(): same edge weights / AGGREGATOR / sync BATCH_NORM),
    not the sampled-path layerwise inference."""
    import os

    from sgnn_tpu.__main__ import main

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    cfg = tmp_path / "fb.cfg"
    cfg.write_text("\n".join([
        "ALGORITHM:GCNFULLBATCH",
        "VERTICES:2708",
        "LAYERS:1433-32-7",
        "FANOUT:1-1",
        "BATCH_SIZE:1024",
        "EPOCHS:3",
        f"EDGE_FILE:{root}/cora.2708.edge.self",
        f"FEATURE_FILE:{root}/cora.featuretable",
        f"LABEL_FILE:{root}/cora.labeltable",
        f"MASK_FILE:{root}/cora.mask",
        "LEARN_RATE:0.01",
        "DROP_RATE:0.0",
        "BATCH_NORM:1",
    ]) + "\n")
    ckpt = tmp_path / "ckpt"
    assert main([str(cfg), "--checkpoint-dir", str(ckpt)]) == 0
    preds = tmp_path / "fb_preds.npy"
    assert main([str(cfg), "--infer", str(ckpt),
                 "--predictions-out", str(preds)]) == 0
    logp = np.load(preds)
    assert logp.shape == (2708, 7)
    assert np.isfinite(logp).all()


def test_fast_io_npy_roundtrip(tmp_path):
    """utils.io load/save are np.save/np.load-compatible both directions."""
    from sgnn_tpu.utils.io import load_npy, read_binary, save_npy

    rng = np.random.default_rng(0)
    cases = [
        rng.standard_normal((37, 11)).astype(np.float32),
        rng.integers(-5, 5, size=(64,)).astype(np.int32),
        np.asfortranarray(rng.standard_normal((8, 9))),
        np.array(42, dtype=np.int64),  # 0-d scalar
        np.zeros((0, 3), np.float32),  # empty
    ]
    for i, a in enumerate(cases):
        ours, theirs = tmp_path / f"a{i}.npy", tmp_path / f"b{i}.npy"
        save_npy(str(ours), a)
        np.save(str(theirs), a)
        got_theirs = load_npy(str(theirs))  # our reader, numpy writer
        got_ours = np.load(str(ours))       # numpy reader, our writer
        np.testing.assert_array_equal(got_theirs, a)
        np.testing.assert_array_equal(got_ours, a)
        assert got_theirs.dtype == a.dtype and got_ours.dtype == a.dtype
    # writability (frombuffer result must not be read-only)
    save_npy(str(tmp_path / "w.npy"), cases[0])
    w = load_npy(str(tmp_path / "w.npy"))
    w[0, 0] = 7.0

    raw = tmp_path / "raw.bin"
    payload = rng.integers(0, 2**32, size=33, dtype=np.uint32)
    raw.write_bytes(payload.astype("<u4").tobytes())
    back = read_binary(str(raw), "<u4")
    np.testing.assert_array_equal(back, payload)


def test_cli_report_out_and_summarizer(tmp_path):
    """--report-out writes a structured TrainReport JSON and
    scripts/summarize_runs.py tabulates a set of them into CSV (the
    reference's get_log_run_time.py log-scrape, made structured)."""
    import csv
    import json
    import subprocess
    import sys

    from sgnn_tpu.__main__ import main

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    cfg = tmp_path / "cli.cfg"
    cfg.write_text("\n".join([
        "ALGORITHM:GCNSAMPLEGPU",
        "VERTICES:2708",
        "LAYERS:1433-32-7",
        "FANOUT:10-5",
        "BATCH_SIZE:1024",
        "EPOCHS:2",
        f"EDGE_FILE:{root}/cora.2708.edge.self",
        f"FEATURE_FILE:{root}/cora.featuretable",
        f"LABEL_FILE:{root}/cora.labeltable",
        f"MASK_FILE:{root}/cora.mask",
        "LEARN_RATE:0.01",
        "DROP_RATE:0.0",
    ]) + "\n")
    rj = tmp_path / "r.json"
    assert main([str(cfg), "--report-out", str(rj)]) == 0
    rec = json.loads(rj.read_text())
    assert rec["algorithm"] == "GCNSAMPLEGPU"
    assert len(rec["epoch_times"]) == 2
    assert rec["phase_counts"]  # phase timers made it through
    assert rec["avg_epoch_time"] > 0
    out_csv = tmp_path / "epoch_time.csv"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "scripts/summarize_runs.py", str(rj), str(rj),
         "-o", str(out_csv)],
        check=True, cwd=repo,
    )
    rows = list(csv.DictReader(out_csv.open()))
    assert len(rows) == 2 and rows[0]["algorithm"] == "GCNSAMPLEGPU"
    assert float(rows[0]["avg_epoch_time_s"]) > 0
