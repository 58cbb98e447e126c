"""Multi-host initialization and mesh construction.

Reference: MPI_Instance RAII bootstrap (dep/gemini/mpi.hpp:51,
MPI_Init_thread) + per-rank vertex ranges established in Graph::init
(core/graph.hpp:391).  TPU-native: `jax.distributed.initialize` joins all
hosts into one runtime; every chip on every host lands in a single
`jax.sharding.Mesh`, and the same `psum`/`all_gather` collectives ride ICI
within a slice and DCN across slices — no host-level communication code.

On a single host this is a no-op and the local devices form the mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils.logging import get_logger

log = get_logger("sgnn.dist")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime; returns (process_id, num_processes).

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS etc. /
    TPU pod metadata); single-process when none are present.
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _env_int("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    if coord or (nproc and nproc > 1):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=pid,
        )
        log.info(
            "distributed init: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def global_mesh(data: Optional[int] = None, graph: int = 1) -> Mesh:
    """Mesh over ALL devices across hosts: ("data", "graph").

    Lay the data axis across hosts (gradient psum crosses DCN once per
    step) and keep the graph axis within a host so halo all_gathers ride
    ICI — the layout SURVEY.md §2.8 prescribes.
    """
    devs = jax.devices()
    n = len(devs)
    if data is None:
        data = n // graph
    assert data * graph <= n
    arr = np.asarray(devs[: data * graph]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))
