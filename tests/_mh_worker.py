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
    ap.add_argument("--mode", default="dp", choices=["dp", "fullbatch"])
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={a.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgnn_tpu.parallel.multihost import (
        initialize_distributed, run_multihost_dp_epochs,
        run_multihost_fullbatch_epochs,
    )

    if a.nprocs > 1:
        initialize_distributed(f"localhost:{a.port}", a.nprocs, a.pid)
    assert jax.device_count() == 4, jax.device_count()

    from sgnn_tpu.config import RunConfig
    from sgnn_tpu.data.synthetic import random_graph_dataset

    ds = random_graph_dataset(
        num_vertices=500, avg_degree=8, feature_dim=32, num_classes=5, seed=7
    )
    if a.mode == "fullbatch":
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[1, 1], epochs=a.epochs,
            learn_rate=0.02, drop_rate=0.5, vertices=500,
        )
        losses = run_multihost_fullbatch_epochs(cfg, ds, epochs=a.epochs)
    else:
        cfg = RunConfig(
            layer_sizes=[32, 16, 5], fanout=[4, 3], batch_size=32,
            epochs=a.epochs, drop_rate=0.0, vertices=500,
        )
        losses = run_multihost_dp_epochs(cfg, ds, epochs=a.epochs)
    if a.pid == 0:
        with open(a.out, "w") as f:
            json.dump(losses, f)


if __name__ == "__main__":
    main()
