"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-chip TPU hardware is unavailable in CI; all sharding paths are
exercised on the CPU backend with xla_force_host_platform_device_count=8
(the approach recommended by jax's own test suite).
"""

import os

# Force CPU: the session environment points JAX at a tunneled TPU
# (JAX_PLATFORMS=axon, registered by a sitecustomize hook), which is reserved
# for bench.py — tests always run on the virtual 8-device CPU mesh.  The
# sitecustomize runs before us, so the env var alone is not enough; the
# explicit config.update wins over whatever the plugin registration set.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Driver-environment parity: this machine's TPU-tunnel sitecustomize flips
# jax_disable_bwd_checks=True as a side effect of registering the backend,
# which silently disables the custom-VJP cotangent typecheck (dtype/shape/
# varying-manual-axes).  Stock JAX ships with the check ON — round 4 shipped
# a shard_map vma bug invisible locally for exactly this reason.  Force the
# strict check so every test runs with driver-equivalent typing.
try:
    jax.config.update("jax_disable_bwd_checks", False)
except AttributeError:
    pass  # flag retired in a future jax: strict is then the only mode

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cora():
    """The real Cora dataset shipped with the repo (reference data/ parity)."""
    from sgnn_tpu.data.nts_format import load_nts_dataset

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    return load_nts_dataset(
        edge_file=os.path.join(root, "cora.2708.edge.self"),
        feature_file=os.path.join(root, "cora.featuretable"),
        label_file=os.path.join(root, "cora.labeltable"),
        mask_file=os.path.join(root, "cora.mask"),
        num_vertices=2708,
        feature_dim=1433,
        name="cora",
    )


@pytest.fixture(scope="session")
def tiny_ds():
    """Small synthetic dataset for fast unit tests."""
    from sgnn_tpu.data.synthetic import random_graph_dataset

    return random_graph_dataset(
        num_vertices=500, avg_degree=8, feature_dim=32, num_classes=5, seed=7
    )
