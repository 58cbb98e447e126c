"""Device mesh construction for multi-chip/multi-host training.

Reference communication stacks (SURVEY.md §2.6): MPI rings + NCCL
AllReduce/Bcast/AllGather + MPI-RPC.  TPU-native equivalent: ONE
`jax.sharding.Mesh` over all chips; collectives are XLA `psum`/`all_gather`/
`all_to_all` riding ICI (and DCN across hosts), inserted from sharding
annotations — no hand-written send/recv threads.

Axis conventions:
  "data"  — data parallelism (seed-batch split; grads psum-reduced)
  "graph" — graph/vertex-range partition parallelism (full-batch path)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    data: Optional[int] = None,
    graph: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "graph") mesh covering `data*graph` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devs) // graph
    n = data * graph
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    arr = np.asarray(devs[:n]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis split over the data axis (seed batches, blocks)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
