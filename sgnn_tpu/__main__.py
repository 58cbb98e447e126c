"""CLI entry point: `python -m sgnn_tpu <config.cfg>`.

Reference: the `nts` binary (toolkits/main.cpp:44) — reads a KEY:VALUE cfg,
loads the graph, dispatches on ALGORITHM, runs training, prints per-epoch
accuracy and phase timers.  Same contract here, plus --epochs/--device
overrides and optional checkpointing.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    from sgnn_tpu.train.engines import ENGINES

    ap = argparse.ArgumentParser(
        prog="sgnn_tpu", description="TPU-native sample-based GNN training",
        epilog="ALGORITHM strings: " + " ".join(sorted(ENGINES)),
    )
    ap.add_argument("config", help="KEY:VALUE .cfg file (reference format)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save per-epoch checkpoints here (enables resume)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in "
                         "--checkpoint-dir")
    ap.add_argument("--algorithm", default=None,
                    help="override the cfg ALGORITHM string")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator host:port for "
                         "jax.distributed (launch one process per host "
                         "with --nprocs/--pid; reference MPI bootstrap, "
                         "dep/gemini/mpi.hpp:51)")
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--infer", metavar="CKPT_DIR", default=None,
                    help="pure serving: restore trained params from "
                         "CKPT_DIR (no training) and run exact layer-wise "
                         "full-graph inference; reports split accuracies")
    ap.add_argument("--predictions-out", metavar="NPY", default=None,
                    help="with --infer: write the [V, classes] log-prob "
                         "matrix to NPY (np.save format)")
    ap.add_argument("--exact-eval", action="store_true",
                    help="after training, report EXACT val/test accuracy "
                         "via layer-wise full-graph inference (no fanout "
                         "sampling noise; train/inference.py)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the training run "
                         "into DIR (open with xprof/tensorboard; reference "
                         "analog: cpu.sh/gpu.sh + phase timers)")
    ap.add_argument("--report-out", metavar="JSON", default=None,
                    help="write the run's TrainReport (epoch times, "
                         "accuracies, phase timers) as JSON — the "
                         "structured analog of the reference's log/<run>/ "
                         "directory; scripts/summarize_runs.py collects "
                         "many into a CSV (get_log_run_time.py parity)")
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sgnn_tpu.config import load_cfg
    from sgnn_tpu.data.nts_format import load_from_config
    from sgnn_tpu.utils.logging import get_logger

    log = get_logger("sgnn.cli")
    cfg = load_cfg(args.config)
    if args.algorithm:
        cfg.algorithm = args.algorithm
    if args.epochs is not None:
        cfg.epochs = args.epochs
    log.info(
        "ALGORITHM=%s layers=%s fanout=%s batch=%d epochs=%d",
        cfg.algorithm, cfg.layer_sizes, cfg.fanout, cfg.batch_size, cfg.epochs,
    )
    ds = load_from_config(cfg)
    log.info("dataset: %s — %d vertices, %d edges", ds.name, ds.num_vertices,
             ds.num_edges)
    import contextlib

    if args.profile:
        from sgnn_tpu.utils.profiling import trace

        prof_ctx = trace(args.profile)
    else:
        prof_ctx = contextlib.nullcontext()
    with prof_ctx:
        return _run(args, cfg, ds, log)


def _run(args, cfg, ds, log) -> int:
    from sgnn_tpu.train import run_engine
    if args.coordinator:
        # multi-host: every device of every joined process joins one mesh.
        # Sampled engines run data-parallel; *FULLBATCH engines run
        # vertex-sharded graph-partition parallelism (the reference
        # full-batch path's per-rank Gemini partitioning).
        from sgnn_tpu.parallel.multihost import (
            initialize_distributed, run_multihost_device_dp_epochs,
            run_multihost_dp_epochs, run_multihost_fullbatch_epochs,
        )
        from sgnn_tpu.train.engines import engine_from_config

        initialize_distributed(args.coordinator, args.nprocs, args.pid)
        spec = engine_from_config(cfg)
        if spec.fullbatch:
            losses = run_multihost_fullbatch_epochs(
                cfg, ds, epochs=cfg.epochs, family=spec.family,
                halo=getattr(cfg, "halo", "all_gather"),
                weight_kind=spec.weight_kind,
            )
        elif spec.device_sampling:
            # *ALLGPU/*ALLMULTI strings: the fused device-sampled DP scan
            # across processes (SHARD_FEATURES honored)
            losses = run_multihost_device_dp_epochs(
                cfg, ds, epochs=cfg.epochs, family=spec.family,
                shard_features=cfg.shard_features,
            )
        else:
            losses = run_multihost_dp_epochs(
                cfg, ds, epochs=cfg.epochs, family=spec.family
            )
        log.info("multihost final loss: %.5f", losses[-1])
        return 0
    if args.infer:
        # pure serving: restore params from a checkpoint and run exact
        # inference — the train→checkpoint→serve workflow (the reference
        # can only evaluate inside a training run, Test() with sampling,
        # GCN_SAMPLE_PD_CACHE.hpp:264-295)
        import numpy as np

        from sgnn_tpu.train.checkpoint import CheckpointManager
        from sgnn_tpu.train.engines import build_trainer, engine_from_config
        from sgnn_tpu.train.inference import exact_accuracy, \
            layerwise_inference

        trainer = build_trainer(cfg, ds)
        ep = CheckpointManager(args.infer).restore(trainer)
        if ep is None:
            log.error("no checkpoint found in %s", args.infer)
            return 1
        log.info("restored epoch %d from %s", ep, args.infer)
        owner = getattr(trainer, "base", trainer)
        spec = engine_from_config(cfg)
        if spec.fullbatch:
            # *FULLBATCH checkpoints serve through the trainer's OWN forward
            # (same edge weights, AGGREGATOR min/max, sync BATCH_NORM) —
            # layerwise_inference has no aggregator support
            logp = owner.predict()
        else:
            # sample-trained SAGE converges to the plain 1/indeg mean
            logp = layerwise_inference(
                owner.params, spec.family, owner.adj, ds.features,
                heads=cfg.heads, mean_style="plain",
                batch_norm=cfg.batch_norm,
            )
        for split, nids in (("train", owner.train_nids),
                            ("val", owner.val_nids),
                            ("test", owner.test_nids)):
            if len(nids):
                acc = exact_accuracy(owner.params, spec.family, owner.adj,
                                     ds.features, ds.labels, nids, logp=logp)
                log.info("infer %s accuracy: %.4f", split, acc)
        if args.predictions_out:
            from .utils.io import save_npy

            save_npy(args.predictions_out, np.asarray(logp))
            log.info("wrote [%d, %d] log-probs to %s", logp.shape[0],
                     logp.shape[1], args.predictions_out)
        return 0
    if args.checkpoint_dir:
        # checkpointed path: build the engine's trainer, run with per-epoch
        # saves and optional resume (reference has no checkpointing at all)
        from sgnn_tpu.train.checkpoint import run_with_checkpointing
        from sgnn_tpu.train.guard import DivergenceError
        from sgnn_tpu.train.engines import build_trainer

        # build the trainer the ALGORITHM string actually names (engine
        # registry), so e.g. GCNSAMPLEALLGPU checkpoints the device-sampled
        # engine and GCNSAMPLEPDCACHE the cached one
        trainer = build_trainer(cfg, ds)
        try:
            run_with_checkpointing(
                trainer, args.checkpoint_dir, cfg.epochs, resume=args.resume
            )
        except DivergenceError as exc:
            # the poisoned state was NOT saved (guard fires before save);
            # the message names the last good checkpoint to resume from
            log.error("%s", exc)
            return 1
        owner = getattr(trainer, "base", trainer)  # DP wrappers hold nids on .base
        va = trainer.evaluate(owner.val_nids) if owner.val_nids.size else 0
        te = trainer.evaluate(owner.test_nids) if owner.test_nids.size else 0
        log.info("final (checkpointed): val %.4f test %.4f", va, te)
        return 0
    if args.exact_eval:
        from sgnn_tpu.train.engines import build_trainer, engine_from_config
        from sgnn_tpu.train.inference import exact_accuracy, layerwise_inference

        trainer = build_trainer(cfg, ds)
        report = trainer.run(epochs=cfg.epochs)
        owner = getattr(trainer, "base", trainer)
        spec = engine_from_config(cfg)
        if spec.fullbatch:
            # full-batch training IS full-neighborhood — evaluate with the
            # trainer's own forward (same edge weights, BATCH_NORM,
            # AGGREGATOR), not the sampled-engine inference path
            va = trainer.evaluate(owner.val_nids)
            te = trainer.evaluate(owner.test_nids)
        else:
            logp = layerwise_inference(owner.params, spec.family, owner.adj,
                                       ds.features, heads=cfg.heads,
                                       batch_norm=cfg.batch_norm)
            va = exact_accuracy(owner.params, spec.family, owner.adj,
                                ds.features, ds.labels, owner.val_nids,
                                logp=logp)
            te = exact_accuracy(owner.params, spec.family, owner.adj,
                                ds.features, ds.labels, owner.test_nids,
                                logp=logp)
        log.info("exact (full-neighborhood) eval: val %.4f test %.4f", va, te)
    else:
        report = run_engine(cfg, ds)
    # end-of-run summary (reference run() timer dump parity)
    log.info("avg epoch time: %.4fs", report.avg_epoch_time)
    log.info("phase timers: %s", report.timers.summary())
    if report.train_acc:
        log.info(
            "final: train %.4f val %.4f test %.4f loss %.5f",
            report.train_acc[-1], report.val_acc[-1], report.test_acc[-1],
            report.losses[-1],
        )
    if args.report_out:
        import json

        rec = {"config": args.config, "algorithm": cfg.algorithm,
               **report.to_dict()}
        with open(args.report_out, "w") as f:
            json.dump(rec, f, indent=1)
        log.info("wrote run report to %s", args.report_out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
