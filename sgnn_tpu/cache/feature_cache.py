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
    dev_slot_map: jax.Array    # [V] int32 (device)
    dev_hot: jax.Array         # [C, F] cached feature rows (device)
    hits: int = 0
    misses: int = 0

    @staticmethod
    def build(features: np.ndarray, hot_ids: np.ndarray) -> "FeatureCache":
        v = features.shape[0]
        slot_map = np.full(v, -1, dtype=np.int32)
        slot_map[hot_ids] = np.arange(hot_ids.size, dtype=np.int32)
        return FeatureCache(
            hot_ids=hot_ids.astype(np.int32),
            slot_map=slot_map,
            dev_slot_map=jnp.asarray(slot_map),
            dev_hot=jnp.asarray(features[hot_ids]),
        )

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

    @property
    def hit_rate(self) -> float:
        tot = self.hits + self.misses
        return self.hits / tot if tot else 0.0
