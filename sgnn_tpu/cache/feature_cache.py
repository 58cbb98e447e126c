"""Partial HBM feature cache for graphs whose features exceed device memory.

Reference: GPU feature cache — the highest-degree `feature_cache_rate`
fraction of vertices' raw features are staged into GPU memory
(gater_cpu_cache_feature_and_trans_to_gpu, GCN_SAMPLE_PD_CACHE.hpp:1079;
capacity probed from free HBM, determine_cache_node_idx :1039), and the
feature loader consults the cache map before falling back to zero-copy host
reads (load_feature_gpu_cache, ntsFastSampler.hpp:263).

TPU redesign: when the full matrix fits in HBM, the trainer keeps it
device-resident and this cache is unnecessary (trainer.features_on_device).
Otherwise: hot rows live in HBM ([C, F] array + slot map); a batch's x0 is
assembled in-program from the HBM cache plus a host-gathered array of only
the COLD rows — shrinking host→device traffic by the cache hit rate.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FeatureCache:
    hot_ids: np.ndarray        # [C] global ids cached in HBM
    slot_map: np.ndarray       # [V] int32 slot or -1 (host)
    dev_slot_map: "jax.Array | None"  # [V] int32 (device; None until upload)
    dev_hot: "jax.Array | None"       # [C, F] cached rows (None until upload)
    hits: int = 0
    misses: int = 0
    bytes_shipped: int = 0   # cold-row bytes actually sent host→device
    bytes_full: int = 0      # what full-matrix shipping would have sent

    @staticmethod
    def build(
        features: np.ndarray, hot_ids: np.ndarray, dtype=None,
        device: bool = True,
    ) -> "FeatureCache":
        """`device=False` defers the HBM upload (`upload()`) — per-SB plans
        keep only the ACTIVE super-batch's [C, F] rows resident (two sets
        would double the probed capacity budget)."""
        v = features.shape[0]
        slot_map = np.full(v, -1, dtype=np.int32)
        slot_map[hot_ids] = np.arange(hot_ids.size, dtype=np.int32)
        fc = FeatureCache(
            hot_ids=hot_ids.astype(np.int32),
            slot_map=slot_map,
            dev_slot_map=None,
            dev_hot=None,
        )
        if device:
            fc.upload(features, dtype)
        return fc

    def upload(self, features: np.ndarray, dtype=None) -> None:
        """Stage this plan's hot rows (and slot map) into HBM, releasing any
        previously-held device arrays first (per-SB swap keeps ONE [C, F]
        set live — reference new_cache_var/set_cache_index swap,
        ntsDataloador.hpp:285/:440)."""
        self.dev_hot = None  # drop the old buffer before allocating the new
        from ..sampler.native import gather_rows

        rows = np.empty((self.hot_ids.size, features.shape[1]),
                        features.dtype)
        if self.hot_ids.size:
            gather_rows(features, self.hot_ids, out=rows)
        self.dev_slot_map = jnp.asarray(self.slot_map)
        self.dev_hot = jnp.asarray(rows, dtype=dtype)

    # ------------------------------------------------------------------
    def gather_host_cold(
        self, features: np.ndarray, srcs: np.ndarray, src_valid: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host side: gather ONLY cold rows; cached rows ship as zeros.

        Returns (x0_cold [S, F], is_cold [S] bool).  Cache-hit accounting
        mirrors the reference's total_sample_num/total_cache_hit counters
        (cuda/ntsCUDA.hpp:182).
        """
        slots = self.slot_map[np.maximum(srcs, 0)]
        cold = (slots < 0) & src_valid
        x0 = np.zeros((srcs.shape[0], features.shape[1]), features.dtype)
        x0[cold] = features[srcs[cold]]
        nvalid = int(src_valid.sum())
        ncold = int(cold.sum())
        self.misses += ncold
        self.hits += nvalid - ncold
        return x0, cold

    def merge_device(
        self, x0_cold: jax.Array, srcs: jax.Array, src_valid: jax.Array
    ) -> jax.Array:
        """Device side: overlay cached hot rows onto the cold-gathered x0."""
        slots = self.dev_slot_map[srcs]
        hot_rows = self.dev_hot[jnp.maximum(slots, 0)]
        use_hot = (slots >= 0) & src_valid
        return jnp.where(use_hot[:, None], hot_rows, x0_cold)

    # ----------------------------------------------- compacted cold path
    def gather_cold_compact(
        self, features: np.ndarray, srcs: np.ndarray, src_valid: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Gather cache-miss rows into a COMPACT bucketed buffer.

        Returns (x0_cold [P, F], cold_pos [P] int32) with P the smallest
        power-of-two multiple of 128 ≥ the miss count — so only O(log S)
        distinct XLA programs compile, and host→device feature traffic
        shrinks by the hit rate (reference ships only uncached rows too:
        load_feature_gpu_cache, ntsFastSampler.hpp:263).  Padding entries of
        cold_pos point one past the src axis (scatter mode='drop').
        """
        slots = self.slot_map[np.maximum(srcs, 0)]
        cold = (slots < 0) & src_valid
        pos = np.nonzero(cold)[0].astype(np.int32)
        nvalid = int(src_valid.sum())
        self.misses += pos.size
        self.hits += nvalid - pos.size
        pad = _cold_bucket(pos.size, srcs.shape[0])
        x0 = np.zeros((pad, features.shape[1]), features.dtype)
        if pos.size:
            from ..sampler.native import gather_rows

            gather_rows(features, srcs[pos], out=x0[: pos.size])
        cold_pos = np.full(pad, srcs.shape[0], np.int32)  # pad → dropped
        cold_pos[: pos.size] = pos
        self.bytes_shipped += x0.nbytes
        self.bytes_full += srcs.shape[0] * features.shape[1] * features.itemsize
        return x0, cold_pos

    @property
    def hit_rate(self) -> float:
        tot = self.hits + self.misses
        return self.hits / tot if tot else 0.0


def _cold_bucket(n: int, cap: int) -> int:
    """Smallest power-of-two multiple of 128 ≥ n, clamped to ≥128 and ≤cap."""
    b = 128
    while b < n:
        b *= 2
    return min(max(b, 128), max(cap, 128))


def hbm_feature_capacity(
    feature_dim: int,
    itemsize: int,
    budget_bytes: "int | None" = None,
    headroom_fraction: float = 0.5,
) -> int:
    """How many feature rows fit in free device memory.

    Reference determine_cache_node_idx (GCN_SAMPLE_PD_CACHE.hpp:1039-1077):
    probe idle GPU memory during warmup, cache_node_num = free/row_bytes.
    Here: device.memory_stats() when the backend exposes it (TPU does),
    else a caller-forced `budget_bytes` (tests / CPU backend).  Only
    `headroom_fraction` of free memory is offered — activations, the graph,
    and XLA scratch share the same HBM.
    """
    if budget_bytes is None:
        from ..utils.profiling import device_memory_stats

        stats = device_memory_stats()
        if stats and stats.get("bytes_limit"):
            free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
            budget_bytes = int(free * headroom_fraction)
        else:  # backend exposes no stats and no forced budget: be generous
            budget_bytes = 1 << 30
    return max(int(budget_bytes) // max(feature_dim * itemsize, 1), 0)


def degree_ranked_hot_ids(adj, max_rows: int) -> np.ndarray:
    """Highest-degree vertices first (reference cache_high_degree,
    GCN_SAMPLE_PD_CACHE.hpp:1026-1037 sorts by out_degree_for_backward)."""
    max_rows = int(min(max_rows, adj.num_vertices))
    if max_rows <= 0:
        return np.zeros(0, np.int32)
    order = np.argsort(-adj.out_degree.astype(np.int64), kind="stable")
    return np.sort(order[:max_rows].astype(np.int32))
