"""Hotness pre-sampling: rank vertices by expected sampling frequency.

Reference: nts::op::preSample (core/ntsBaseOp.hpp:409/:427) — per super-batch,
propagate visit counts L-1 hops from the train vertices over the full CSC
(get_most_neighbor :267/:332), sort by count, take the top cache_rate
fraction as the hot-vertex cache; persists the result to a
`<edge>.pre_sample_b{B}_f{fanouts}_p{P}.bin` file and reloads it on later
runs (:432-541).  nts_local_shuffle (:73/:145) keeps super-batch membership
stable across epochs while still shuffling within each super-batch.

TPU redesign: the count propagation is a sparse matvec over the transposed
adjacency — expressed as numpy bincount passes (host, runs once), with the
same fanout-clamped expected-visit model.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph.adjacency import Adjacency
from ..utils.io import read_binary
from ..utils.logging import get_logger

log = get_logger("sgnn.cache")

_MAGIC = 0x53474E4E  # "SGNN"


def hotness_scores(
    adj: Adjacency,
    train_nids: np.ndarray,
    fanouts: Sequence[int],
    dst_of_edge: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Expected visit counts per vertex under fanout sampling from train nids.

    Hop h spreads each destination's count over its in-neighbors, scaled by
    min(fanout_h, deg)/deg (the probability mass fanout sampling puts on each
    in-edge) — the same counting model as the reference's preSample BFS.
    """
    v = adj.num_vertices
    frontier = np.zeros(v, dtype=np.float64)
    frontier[train_nids] = 1.0
    deg = np.maximum(adj.in_degree.astype(np.float64), 1.0)
    total = np.zeros(v, dtype=np.float64)
    # loop-invariant: dst id of every CSC edge (O(E); per-SB planning
    # passes it in to avoid rebuilding it n_sb times)
    if dst_of_edge is None:
        dst_of_edge = np.repeat(
            np.arange(v, dtype=np.int64),
            np.diff(adj.indptr).astype(np.int64),
        )
    for f in fanouts:
        # per-dst mass pushed to each in-edge
        scale = np.minimum(float(f), deg) / deg
        per_edge = (frontier * scale)  # [V] mass per in-edge of each dst
        # scatter to sources: for each edge (src -> dst): src += per_edge[dst]
        contrib = per_edge[dst_of_edge]
        nxt = np.bincount(adj.indices.astype(np.int64), weights=contrib,
                          minlength=v)
        total += nxt
        frontier = nxt
    return total


def presample_hotness(
    adj: Adjacency,
    train_nids: np.ndarray,
    fanouts: Sequence[int],
    cache_rate: float,
    edge_file: Optional[str] = None,
    batch_size: int = 0,
) -> np.ndarray:
    """Top cache_rate·V hottest vertex ids, with .bin persistence parity.

    Cache file name mirrors the reference's
    `<edge>.pre_sample_b{B}_f{fanouts}_p1.bin` convention
    (ntsBaseOp.hpp:432); our format: [magic, n] uint32 header + ids.
    """
    n_cache = int(adj.num_vertices * cache_rate)
    if n_cache == 0:
        return np.zeros(0, dtype=np.int32)
    path = None
    if edge_file:
        fan_s = "-".join(str(f) for f in fanouts)
        path = f"{edge_file}.sgnn_pre_sample_b{batch_size}_f{fan_s}.bin"
        if os.path.exists(path):
            raw = read_binary(path, dtype="<u4")
            if (raw.size >= 2 and raw[0] == _MAGIC
                    and raw[1] == raw.size - 2
                    and raw.size - 2 >= n_cache):
                # the filename omits cache_rate (reference convention), so a
                # file written under a SMALLER rate must not silently shrink
                # the requested hot set — the >= n_cache check regenerates it
                ids = raw[2:].astype(np.int32)
                log.info("presample: loaded %d hot ids from %s", ids.size, path)
                return ids[:n_cache]
    scores = hotness_scores(adj, train_nids, fanouts)
    order = np.argsort(-scores, kind="stable")
    ids = order[:n_cache].astype(np.int32)
    if path:
        with open(path, "wb") as f:
            f.write(np.concatenate(
                [np.array([_MAGIC, ids.size], dtype="<u4"), ids.astype("<u4")]
            ).tobytes())
        log.info("presample: wrote %d hot ids to %s", ids.size, path)
    return ids


def super_batch_stable_shuffle(
    nids: np.ndarray, super_batch_size: int, rng: np.random.Generator
) -> np.ndarray:
    """Shuffle WITHIN super-batches, keeping membership stable across epochs.

    Reference nts_local_shuffle (ntsBaseOp.hpp:73/:145): the hot-vertex cache
    is planned per super-batch, so epoch shuffling must not move vertices
    between super-batches.
    """
    out = np.array(nids, copy=True)
    for s in range(0, len(out), super_batch_size):
        seg = out[s:s + super_batch_size]
        rng.shuffle(seg)
        out[s:s + super_batch_size] = seg
    return out


def presample_hotness_per_sb(
    adj: Adjacency,
    train_nids: np.ndarray,
    fanouts: Sequence[int],
    cache_rate: float,
    super_batch_size: int,
    edge_file: Optional[str] = None,
    batch_size: int = 0,
) -> np.ndarray:
    """Per-SUPER-BATCH hot sets: [n_sb, C] int32 vertex ids.

    Reference preSample ranks hotness per super-batch and installs a
    different cache index per SB (batch_cache_num, ntsBaseOp.hpp:427-541;
    new_cache_var/set_cache_index ntsDataloador.hpp:285/:440) — a vertex
    hot for SB k's seeds may be cold for SB k+1's, so per-SB planning
    raises the hit rate far above one global set.  Membership follows the
    STABLE super-batch partition (nts_local_shuffle keeps it fixed across
    epochs), so the plan computed once stays valid.
    """
    c = int(adj.num_vertices * cache_rate)
    n_sb = max(-(-len(train_nids) // super_batch_size), 1)
    if c == 0:
        return np.zeros((n_sb, 0), dtype=np.int32)
    path = None
    if edge_file:
        fan_s = "-".join(str(f) for f in fanouts)
        path = (f"{edge_file}.sgnn_pre_sample_b{batch_size}_f{fan_s}"
                f"_psb{n_sb}.bin")
        if os.path.exists(path):
            raw = read_binary(path, dtype="<u4")
            if (raw.size >= 3 and raw[0] == _MAGIC
                    and raw[1] * raw[2] == raw.size - 3):
                ids = raw[3:].astype(np.int32).reshape(raw[1], raw[2])
                if ids.shape[0] == n_sb and ids.shape[1] >= c:
                    log.info("presample: loaded %dx%d per-SB hot ids from %s",
                             ids.shape[0], c, path)
                    return ids[:, :c]
    per = np.zeros((n_sb, c), dtype=np.int32)
    doe = np.repeat(
        np.arange(adj.num_vertices, dtype=np.int64),
        np.diff(adj.indptr).astype(np.int64),
    )
    for k in range(n_sb):
        sb = train_nids[k * super_batch_size:(k + 1) * super_batch_size]
        scores = hotness_scores(adj, sb, fanouts, dst_of_edge=doe)
        per[k] = np.argsort(-scores, kind="stable")[:c].astype(np.int32)
    if path:
        with open(path, "wb") as f:
            f.write(np.concatenate([
                np.array([_MAGIC, n_sb, c], dtype="<u4"),
                per.astype("<u4").ravel(),
            ]).tobytes())
        log.info("presample: wrote %dx%d per-SB hot ids to %s", n_sb, c, path)
    return per
