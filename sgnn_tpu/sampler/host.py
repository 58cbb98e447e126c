"""Host-side fanout neighbor sampler producing fixed-shape dense blocks.

Reference: FastSampler::sample_fast (core/ntsFastSampler.hpp:962) — per-hop
OpenMP BFS over the whole-graph CSC: clamp fanout, draw DISTINCT edge
positions per destination (unordered_map rejection loop :1028-1040), dedup
sources with a bitmap, local-reindex via src_index_array, compute edge
weights, async-copy to device.

TPU redesign: the same hop loop, but vectorised numpy producing the dense
[num_dst_pad, fanout] neighbor layout of sampler/blocks.py, padded to static
shapes so the jitted train step compiles once.  A C++/OpenMP drop-in
(sampler/native) provides the exact without-replacement draw at speed; the
numpy path has `exact=True` (Floyd's algorithm, slower, used in tests) and a
fast approximate mode (with-replacement draw + in-row dedup; duplicate slots
masked out).

Degree modes (both exist in the reference):
  - "global":  weights from full-graph degrees (CPU engines, up_degree=0)
  - "sampled": weights from degrees of the sampled subgraph (GPU engines —
    ReFreshDegree/UpdateDegree, cuda/ntsCUDATransferKernel.cuh:228-290)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph.adjacency import Adjacency
from .blocks import SampledBatch, SampledBlock, WeightKind, pad_to

try:  # native C++ sampler (built lazily; numpy fallback always works)
    from .native import lib as _native_lib
except Exception:  # pragma: no cover
    _native_lib = None


@dataclasses.dataclass
class _HopPlan:
    """Static shapes for one hop (fixed across batches → one XLA program)."""

    fanout: int
    num_dst_pad: int
    num_src_pad: int


class HostSampler:
    """Layer-wise fanout sampler over a host-resident whole-graph CSC.

    One instance per (graph, seed-set, fanout, batch_size); call
    `sample(batch_seeds)` per minibatch or iterate `epoch_batches(rng)`.
    """

    def __init__(
        self,
        adj: Adjacency,
        fanouts: Sequence[int],
        batch_size: int,
        weight_kind: WeightKind = WeightKind.GCN,
        degree_mode: str = "global",
        pad_multiple: int = 128,
        exact: bool = False,
        seed: int = 0,
        use_native: bool = True,
    ) -> None:
        self.adj = adj
        # fanouts given seed-hop first (cfg order "25-10", fanout[0] applies
        # to the seed batch, ntsFastSampler.hpp:1003). Internally we sample
        # seed-hop first too, then reverse into input→output block order.
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.weight_kind = weight_kind
        self.degree_mode = degree_mode
        self.pad_multiple = pad_multiple
        self.exact = exact
        self.rng = np.random.default_rng(seed)
        self.use_native = use_native and _native_lib is not None
        self._lookup = np.zeros(adj.num_vertices, dtype=np.int32)
        self.plans = self._make_plans()

    # ---------------------------------------------------------------- plans
    def _make_plans(self) -> List[_HopPlan]:
        v_pad = pad_to(self.adj.num_vertices, self.pad_multiple)
        plans: List[_HopPlan] = []
        ndst = pad_to(self.batch_size, self.pad_multiple)
        for f in self.fanouts:
            # src set = sampled neighbors ∪ seeds, bounded by dst*(f+1) and V
            nsrc = min(pad_to(ndst * (f + 1), self.pad_multiple), v_pad)
            plans.append(_HopPlan(fanout=f, num_dst_pad=ndst, num_src_pad=nsrc))
            ndst = nsrc  # next hop's dst set is this hop's src set
        return plans

    # ------------------------------------------------------------- sampling
    def _draw_positions(self, deg: np.ndarray, fanout: int) -> Tuple[np.ndarray, np.ndarray]:
        """Sample ≤fanout edge positions per row, without replacement.

        Returns (pos[B, fanout] int64, valid[B, fanout] bool).
        Rows with deg<=fanout take all positions (parity with reference
        ntsFastSampler.hpp:1041-1049).
        """
        b = deg.shape[0]
        pos = np.zeros((b, fanout), dtype=np.int64)
        slot = np.arange(fanout, dtype=np.int64)[None, :]
        take_all = deg[:, None] <= fanout
        valid = slot < deg[:, None]
        # rows fully taken: position == slot index
        pos = np.where(take_all, np.minimum(slot, np.maximum(deg[:, None] - 1, 0)), 0)
        big = np.nonzero(deg > fanout)[0]
        if big.size:
            if self.exact:
                for i in big:  # Floyd's algorithm, exact w/o replacement
                    pos[i] = self.rng.choice(deg[i], size=fanout, replace=False)
            else:
                # with-replacement draw + in-row dedup (duplicates masked out)
                draws = (self.rng.random((big.size, fanout)) * deg[big, None]).astype(np.int64)
                draws.sort(axis=1)
                dup = np.zeros_like(draws, dtype=bool)
                dup[:, 1:] = draws[:, 1:] == draws[:, :-1]
                pos[big] = draws
                valid[big] = ~dup
        return pos, valid

    def _sample_hop(self, seeds: np.ndarray, fanout: int):
        """One hop: seeds (global ids) → (nbr_global[B,f], valid[B,f])."""
        indptr, indices = self.adj.indptr, self.adj.indices
        start = indptr[seeds]
        deg = (indptr[seeds + 1] - start).astype(np.int64)
        pos, valid = self._draw_positions(deg, fanout)
        nbr_global = indices[np.minimum(start[:, None] + pos,
                                        indptr[-1] - 1)]
        nbr_global = np.where(valid, nbr_global, -1)
        return nbr_global, valid

    def sample(
        self, batch_seeds: np.ndarray, omit_map: Optional[np.ndarray] = None
    ) -> "HostSampledBatch":
        """Sample an L-hop block stack for `batch_seeds` (≤ batch_size ids).

        `omit_map`: optional [V] int32 map (slot or -1).  Destinations of the
        BOTTOM hop with a cache slot are not expanded — the cache-omitting
        sampler (reference sample_gpu_fast_omit, ntsFastSampler.hpp:711,
        kernel sample_processing_get_co_gpu_kernel_omit,
        ntsCUDATransferKernel.cuh:754) — shrinking both sampling work and the
        bottom-hop source set.
        """
        if self.use_native:
            return self._sample_native(batch_seeds, omit_map)
        return self._sample_numpy(batch_seeds, omit_map)

    def _sample_numpy(
        self, batch_seeds: np.ndarray, omit_map: Optional[np.ndarray] = None
    ) -> "HostSampledBatch":
        hops = []  # seed-hop first
        seeds = np.asarray(batch_seeds, dtype=np.int32)
        nseed = seeds.shape[0]
        last = len(self.plans) - 1
        for h, plan in enumerate(self.plans):
            n = seeds.shape[0]
            nbr_global, valid = self._sample_hop(seeds.astype(np.int64), plan.fanout)
            if omit_map is not None and h == last:
                omitted = omit_map[seeds] >= 0
                valid = valid & ~omitted[:, None]
                nbr_global = np.where(valid, nbr_global, -1)
            # src set = unique valid neighbors ∪ seeds (guarantees
            # seed_in_src exists; reference merge-src-dst mode coocsc.hpp:407)
            flat = nbr_global[valid]
            srcs = np.union1d(np.unique(flat), seeds).astype(np.int32)
            if srcs.size and srcs[0] < 0:
                srcs = srcs[srcs >= 0]
            # local reindex (reference src_index_array, ntsFastSampler.hpp:1075)
            self._lookup[srcs] = np.arange(srcs.size, dtype=np.int32)
            nbr_local = np.where(valid, self._lookup[np.maximum(nbr_global, 0)], 0)
            seed_in_src = self._lookup[seeds]
            hops.append(
                dict(
                    seeds=seeds, nbr_global=nbr_global, nbr_local=nbr_local,
                    valid=valid, srcs=srcs, seed_in_src=seed_in_src, plan=plan,
                )
            )
            seeds = srcs  # expand next hop from this hop's src set
        return self._finalize(hops, nseed)

    # ------------------------------------------------------ weights/padding
    def _hop_weights(self, hop: dict) -> np.ndarray:
        """Edge weights per WeightKind/degree_mode (see module docstring)."""
        valid = hop["valid"]
        nbrg = np.maximum(hop["nbr_global"], 0)
        seeds = hop["seeds"].astype(np.int64)
        if self.weight_kind == WeightKind.NONE:
            return valid.astype(np.float32)
        if self.degree_mode == "global" and self.weight_kind == WeightKind.MEAN:
            # Plain mean (1/sampled-count), matching the device sampler.
            # Deliberate deviation from the reference's global-degree mean
            # hybrids (ntsCUDATransferKernel.cuh:319 / ntsFastSampler.hpp:
            # 1117), which collapse on high-degree graphs — see
            # sampler/device.py::_edge_weights and docs/PERF.md.
            div = np.maximum(valid.sum(axis=1), 1)
            return np.where(valid, 1.0 / div[:, None], 0.0).astype(np.float32)
        if self.degree_mode == "sampled":
            # in_degree[dst] = # sampled in-edges (0 → fanout, UpdateDegree
            # kernel parity); out_degree[src] = # sampled out-edges this hop.
            samp_in = valid.sum(axis=1).astype(np.int64)
            samp_in = np.where(samp_in == 0, hop["plan"].fanout, samp_in)
            counts = np.bincount(
                hop["nbr_local"][valid].ravel(), minlength=hop["srcs"].size
            )
            out_deg = counts[hop["nbr_local"]]
            w = 1.0 / (
                np.sqrt(np.maximum(out_deg, 1)) * np.sqrt(samp_in)[:, None]
            )
        else:
            od = np.maximum(self.adj.out_degree[nbrg], 1)
            idg = np.maximum(self.adj.in_degree[seeds], 1)
            w = 1.0 / (np.sqrt(od) * np.sqrt(idg)[:, None])
        if self.weight_kind == WeightKind.MEAN:
            # sampled-degree mean divides by the sampled edge count (GPU
            # get_mean_weight kernel, ntsCUDATransferKernel.cuh:319-343)
            div = np.maximum(valid.sum(axis=1), 1)
            w = w / div[:, None]
        return np.where(valid, w, 0.0).astype(np.float32)

    def _finalize(self, hops: List[dict], nseed: int) -> "HostSampledBatch":
        """Pad hops to plan shapes and reverse into input→output order."""
        blocks = []
        for hop in hops:
            plan: _HopPlan = hop["plan"]
            nd, ns = hop["seeds"].shape[0], hop["srcs"].shape[0]
            if ns > plan.num_src_pad:
                raise RuntimeError(
                    f"src overflow: {ns} > {plan.num_src_pad}; raise pad cap"
                )
            w = hop.get("weight")
            if w is None:  # native path precomputes weights in C++
                w = self._hop_weights(hop)
            nbr = np.zeros((plan.num_dst_pad, plan.fanout), dtype=np.int32)
            wgt = np.zeros((plan.num_dst_pad, plan.fanout), dtype=np.float32)
            seeds_p = np.zeros(plan.num_dst_pad, dtype=np.int32)
            sis_p = np.zeros(plan.num_dst_pad, dtype=np.int32)
            srcs_p = np.zeros(plan.num_src_pad, dtype=np.int32)
            nbr[:nd] = hop["nbr_local"]
            wgt[:nd] = w
            seeds_p[:nd] = hop["seeds"]
            sis_p[:nd] = hop["seed_in_src"]
            srcs_p[:ns] = hop["srcs"]
            dstv = np.zeros(plan.num_dst_pad, dtype=bool); dstv[:nd] = True
            srcv = np.zeros(plan.num_src_pad, dtype=bool); srcv[:ns] = True
            blocks.append(
                HostBlock(
                    nbr=nbr, weight=wgt, srcs=srcs_p, seeds=seeds_p,
                    dst_valid=dstv, src_valid=srcv, seed_in_src=sis_p,
                    num_dst=nd, num_src=ns,
                )
            )
        blocks.reverse()  # input→output order
        return HostSampledBatch(blocks=blocks, num_seeds=nseed)

    # ----------------------------------------------------------- native path
    def _sample_native(
        self, batch_seeds: np.ndarray, omit_map: Optional[np.ndarray] = None
    ) -> "HostSampledBatch":
        from . import native

        return native.sample_batch(
            self, np.asarray(batch_seeds, dtype=np.int32), omit_map
        )

    # ------------------------------------------------------------ epoch iter
    def epoch_seed_batches(self, train_nids: np.ndarray, shuffle: bool = True):
        """Yield per-step seed arrays; last partial batch is padded by plan."""
        nids = np.asarray(train_nids, dtype=np.int32)
        if shuffle:
            nids = self.rng.permutation(nids)
        for i in range(0, nids.shape[0], self.batch_size):
            yield nids[i:i + self.batch_size]


@dataclasses.dataclass
class HostBlock:
    """Host-side (numpy) mirror of SampledBlock + actual sizes."""

    nbr: np.ndarray
    weight: np.ndarray
    srcs: np.ndarray
    seeds: np.ndarray
    dst_valid: np.ndarray
    src_valid: np.ndarray
    seed_in_src: np.ndarray
    num_dst: int
    num_src: int

    def num_valid_edges(self) -> int:
        return int((self.weight != 0).sum()) if self.weight is not None else 0


@dataclasses.dataclass
class HostSampledBatch:
    """Host block stack; `.payload(dataset)` gathers features/labels."""

    blocks: List[HostBlock]
    num_seeds: int

    def num_valid_edges(self) -> int:
        return sum(b.num_valid_edges() for b in self.blocks)

    def payload(self, features: np.ndarray, labels: np.ndarray):
        """Gather input features (bottom src set) + seed labels, padded."""
        b0, btop = self.blocks[0], self.blocks[-1]
        from .native import gather_rows

        x0 = gather_rows(features, b0.srcs, valid=b0.src_valid)
        y = labels[np.maximum(btop.seeds, 0)].astype(np.int32)
        return x0, y, btop.dst_valid.copy()
