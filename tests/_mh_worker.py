"""Multi-host DP worker process (launched by tests/test_multihost.py).

Joins a jax.distributed CPU runtime (coordinator on localhost), runs
sgnn_tpu.parallel.multihost.run_multihost_dp_epochs, and (rank 0) writes the
per-epoch losses to --out as JSON.  Run with --nprocs 1 for the
single-process reference trajectory.
"""

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--mode", default="dp",
                choices=["dp", "fullbatch", "fullbatch_ckpt", "device_dp",
                         "device_dp_sf", "device_dp_ckpt", "pcmulti"])
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={a.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # driver parity: run with the strict custom-VJP cotangent typecheck
    # that stock JAX ships with (see tests/conftest.py)
    try:
        jax.config.update("jax_disable_bwd_checks", False)
    except AttributeError:
        pass

    from sgnn_tpu.parallel.multihost import (
        initialize_distributed, run_multihost_device_dp_epochs,
        run_multihost_dp_epochs, run_multihost_fullbatch_epochs,
        run_multihost_pcmulti_epochs,
    )

    if a.nprocs > 1:
        initialize_distributed(f"localhost:{a.port}", a.nprocs, a.pid)
    assert jax.device_count() == 4, jax.device_count()

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.data.synthetic import random_graph_dataset

    ds = random_graph_dataset(
        num_vertices=500, avg_degree=8, feature_dim=32, num_classes=5, seed=7
    )
    if a.mode.startswith("fullbatch"):
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=a.epochs,
            learn_rate=0.02, drop_rate=0.5, vertices=500,
        )
        if a.mode == "fullbatch_ckpt":
            losses = _fullbatch_with_resume(cfg, ds, a)
        else:
            losses = run_multihost_fullbatch_epochs(cfg, ds, epochs=a.epochs)
    elif a.mode.startswith("device_dp"):
        # fused device-sampled DP (*ALLMULTI analog) across processes;
        # _sf adds SHARD_FEATURES (row-sharded feature blocks per process);
        # _ckpt kills after epoch 1, resumes, and must match uninterrupted
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
            epochs=a.epochs, drop_rate=0.0, vertices=500,
            batch_type="sequence",
        )
        if a.mode == "device_dp_ckpt":
            losses = _device_dp_with_resume(cfg, ds, a)
        else:
            losses = run_multihost_device_dp_epochs(
                cfg, ds, epochs=a.epochs,
                shard_features=a.mode.endswith("_sf"),
            )
    elif a.mode == "pcmulti":
        # *PCMULTI fast path across processes: device-sampled DP + in-scan
        # hot cache with one global hot set (GCN_SAMPLE_PC_MULTI.hpp)
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
            epochs=a.epochs, drop_rate=0.0, vertices=500,
            batch_type="sequence", pipeline_num=2, cache_rate=0.1,
            algorithm="GCNSAMPLEPCMULTI",
        )
        losses = run_multihost_pcmulti_epochs(cfg, ds, epochs=a.epochs)
    else:
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
            epochs=a.epochs, drop_rate=0.0, vertices=500,
        )
        losses = run_multihost_dp_epochs(cfg, ds, epochs=a.epochs)
    if a.pid == 0:
        with open(a.out, "w") as f:
            json.dump(losses, f)


def _device_dp_with_resume(cfg, ds, a):
    """Multihost checkpoint/resume: run epochs in two half-runs through
    CheckpointManager (process-0 writes, every process restores) and return
    the concatenated losses — test asserts equality with one uninterrupted
    run (VERDICT r2 #8)."""
    import numpy as np

    import jax

    from sgnn_tpu.parallel.multihost import (
        multihost_checkpoint_restore, multihost_checkpoint_save,
        run_multihost_device_dp_epochs,
    )

    # SHARED directory (both ranks' --out files live in the same tmp dir):
    # rank 0 writes, every rank restores — the orbax shared-fs contract
    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(a.out)),
                            "mh_ckpt")
    half = max(a.epochs // 2, 1)
    state = {}
    losses = run_multihost_device_dp_epochs(
        cfg, ds, epochs=half, state_out=state)
    multihost_checkpoint_save(ckpt_dir, half, state)
    # fresh RNG-polluted run resumed from the checkpoint
    state2 = multihost_checkpoint_restore(ckpt_dir)
    assert state2 is not None and int(state2["step"]) == half
    losses2 = run_multihost_device_dp_epochs(
        cfg, ds, epochs=a.epochs - half, resume_state=state2)
    return losses + losses2


def _fullbatch_with_resume(cfg, ds, a):
    """Multihost fullbatch checkpoint/resume (VERDICT r3 #8): two half-runs
    through save/restore must equal one uninterrupted run — the state is
    params/opt + the dropout key chain (the fullbatch step's only RNG)."""
    from sgnn_tpu.parallel.multihost import (
        multihost_checkpoint_restore, multihost_checkpoint_save,
        run_multihost_fullbatch_epochs,
    )

    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(a.out)),
                            "mh_fb_ckpt")
    half = max(a.epochs // 2, 1)
    state = {}
    losses = run_multihost_fullbatch_epochs(
        cfg, ds, epochs=half, state_out=state)
    multihost_checkpoint_save(ckpt_dir, half, state)
    state2 = multihost_checkpoint_restore(ckpt_dir)
    assert state2 is not None and int(state2["step"]) == half
    losses2 = run_multihost_fullbatch_epochs(
        cfg, ds, epochs=a.epochs - half, resume_state=state2)
    return losses + losses2


if __name__ == "__main__":
    main()
