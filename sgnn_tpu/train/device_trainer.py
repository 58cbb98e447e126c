"""Fully on-device training: sampling + gather + train in ONE XLA program.

Reference: the *ALLGPU engines (GCN_SAMPLE_ALLGPU.hpp:268-400) — GPU-resident
graph topology, GPU sampling kernels, zero host round-trips inside the
pipeline (the CPU only orchestrates streams).

TPU redesign: the whole-graph CSC (int32 indptr/indices), features and
labels live in HBM; each train step receives ONLY the seed ids (a few KB)
and runs sample → unique/reindex → weight → L-layer forward/backward → Adam
as a single jitted program.  Besides being the idiomatic TPU design, this
makes throughput independent of host→device bandwidth (the dense block
upload of the host-sampler path is ~MBs/batch).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.dataset import Dataset
from ..graph.adjacency import Adjacency
from ..models.gnn import init_model, model_forward
from ..nn.functional import masked_accuracy, nll_loss_masked
from ..nn.optim import ReferenceAdam
from ..sampler.blocks import WeightKind, pad_to
from ..sampler.device import device_sample_batch
from .trainer import SampleTrainer, TrainReport
from ..utils.logging import get_logger

log = get_logger("sgnn.dev")


class FeaturesExceedHbm(ValueError):
    """The feature matrix cannot be device-resident at ANY storage dtype.

    Device sampling discovers source ids INSIDE the fused XLA program, so
    (unlike the reference's UVA zero-copy reads over PCIe) there is no
    per-row host fallback mid-program — beyond-int8-HBM graphs must train
    through the host-sampled engines, whose partial-HBM feature cache ships
    only cache-miss rows (trainer.py + cache/feature_cache.py).  The engine
    registry catches this and falls back automatically."""


class DeviceSampleTrainer(SampleTrainer):
    """SampleTrainer variant with on-device sampling (ALLGPU-engine analog)."""

    def __init__(
        self,
        cfg: RunConfig,
        dataset: Dataset,
        family: str = "gcn",
        weight_kind: WeightKind = WeightKind.GCN,
        degree_mode: Optional[str] = None,  # None → cfg.up_degree decides
        bias_correction: bool = False,
        adj: Optional[Adjacency] = None,
        hbm_budget_bytes: Optional[int] = None,
    ) -> None:
        # UP_DEGREE parity (GraphSegment.cpp:273, default false): global-
        # degree weights come straight from the HBM degree tables — no
        # per-batch sampled-degree histogram (UpdateDegree) at all, which
        # deletes the costliest part of the sampling step.
        if degree_mode is None:
            degree_mode = "sampled" if cfg.up_degree else "global"
        self.dev_degree_mode = degree_mode
        # Residency probe (reference determine_cache_node_idx,
        # GCN_SAMPLE_PD_CACHE.hpp:1039): device sampling REQUIRES resident
        # features.  If they miss at the requested dtype but fit at int8,
        # auto-quantize (FEATURE_DTYPE:int8 — 4x rows/byte, accuracy within
        # rounding, docs/PERF.md); if even int8 misses, raise
        # FeaturesExceedHbm so the engine registry can fall back to the
        # host-sampled path with the partial-HBM feature cache.
        if hbm_budget_bytes is None and getattr(cfg, "hbm_budget", 0) > 0:
            hbm_budget_bytes = cfg.hbm_budget
        if dataset.features is not None:
            from ..cache.feature_cache import hbm_feature_capacity

            f_dim = dataset.features.shape[1]
            v = dataset.features.shape[0]
            fd = (cfg.feature_dtype or cfg.dtype).lower()
            itemsize = {"int8": 1, "bfloat16": 2}.get(fd, 4)
            cap = hbm_feature_capacity(f_dim, itemsize,
                                       budget_bytes=hbm_budget_bytes)
            if cap < v:
                cap8 = hbm_feature_capacity(f_dim, 1,
                                            budget_bytes=hbm_budget_bytes)
                if fd != "int8" and cap8 >= v:
                    log.warning(
                        "features exceed HBM at %s (%d of %d rows fit): "
                        "auto-switching FEATURE_DTYPE to int8 (capacity "
                        "probe; set FEATURE_DTYPE explicitly to silence)",
                        fd, cap, v,
                    )
                    cfg = dataclasses.replace(cfg, feature_dtype="int8")
                else:
                    raise FeaturesExceedHbm(
                        f"feature matrix needs {v} rows but only {cap8} fit "
                        "in the HBM budget even at int8 — use a host-sampled "
                        "engine (e.g. GCNSAMPLEGPU/GCNSAMPLEPDCACHE) with "
                        "FEATURE_CACHE_RATE for beyond-HBM graphs"
                    )
        super().__init__(
            cfg, dataset, family=family, weight_kind=weight_kind,
            degree_mode=degree_mode, bias_correction=bias_correction, adj=adj,
            features_on_device=True, hbm_budget_bytes=hbm_budget_bytes,
        )
        v_pad = pad_to(self.adj.num_vertices, 128)
        # int32 CSC in HBM (indices padded to 128)
        indptr = self.adj.indptr.astype(np.int32)
        self.dev_indptr = jnp.asarray(
            np.concatenate([indptr, np.full(v_pad + 1 - indptr.size,
                                            indptr[-1], np.int32)])
        )
        e_pad = pad_to(max(self.adj.num_edges, 1), 128)
        idx = np.zeros(e_pad, np.int32)
        idx[: self.adj.num_edges] = self.adj.indices
        self.dev_indices = jnp.asarray(idx)
        # pad features/labels to v_pad rows so the bottom hop can use the
        # identity-srcs fast path (x0 = the feature matrix, no re-gather)
        v = self.adj.num_vertices
        if v_pad > v:
            feat_pad = np.zeros((v_pad - v, dataset.features.shape[1]),
                                dataset.features.dtype)
            self.dev_features = jnp.concatenate(
                [self.dev_features, jnp.asarray(
                    feat_pad, dtype=self.dev_features.dtype)], axis=0
            )
            self.dev_labels = jnp.concatenate(
                [self.dev_labels, jnp.zeros(v_pad - v, jnp.int32)]
            )
        self.dev_in_deg = jnp.asarray(self.adj.in_degree.astype(np.int32))
        self.dev_out_deg = jnp.asarray(self.adj.out_degree.astype(np.int32))
        self.weight_kind = (
            WeightKind.NONE if family == "gat" else weight_kind
        )
        # static per-hop source bounds (same plan rule as the host sampler);
        # with SRC_PAD_FACTOR > 0, shrink bounds to factor × expected unique
        # source count (coupon-collector estimate) — the sampler drops edges
        # safely on the rare overflow
        self.seed_pad = pad_to(cfg.batch_size, 128)
        self.src_pads = self.compute_src_pads(cfg.batch_size)
        self._dev_step = self._build_device_step()
        self._dev_eval = self._build_device_eval()
        self._epoch_fn = self._build_epoch_fn()
        # one fused epoch program by default; per-step mode for debugging
        self.fused_epoch = True
        self._sample_key = jax.random.PRNGKey(cfg.seed + 17)

    def compute_src_pads(self, batch_size: int) -> Tuple[int, ...]:
        """Static per-hop source bounds for a given seed-batch size.

        Same plan rule as the host sampler (src = neighbors ∪ seeds,
        bounded by dst·(f+1) and V); with SRC_PAD_FACTOR > 0, shrink to
        factor × expected unique sources (coupon-collector estimate) — the
        sampler drops edges safely and COUNTS them on the rare overflow.
        DP wrappers call this with the per-device shard chunk so small
        shards aren't padded to the full batch size."""
        cfg = self.cfg
        v_pad = pad_to(self.adj.num_vertices, 128)
        exact = []
        ndst = pad_to(max(batch_size, 1), 128)
        for f in cfg.fanout:
            nsrc = min(pad_to(ndst * (f + 1), 128), v_pad)
            exact.append(nsrc)
            ndst = nsrc
        if cfg.src_pad_factor <= 0:
            return tuple(exact)
        # Degree-aware expected-unique sources (VERDICT r2 #5).  A source v
        # is reached iff some sampled edge (v→d) lands in the hop; with a
        # random dst set of size ndst, edge (v→d) is sampled with
        # probability (ndst/V)·min(f/indeg(d), 1) — the fanout SUBSAMPLES
        # high-in-degree destinations' edge lists, which the naive
        # pooled-draws model misses.  Poissonizing per source:
        #     E[unique] = Σ_v (1 - e^{-(ndst/V)·c_v}),
        #     c_v = Σ_{d: v→d} min(f/indeg(d), 1)
        # with c_v computed ONCE per fanout from the host CSC in O(E).  On
        # power-law graphs this sits far below the uniform coupon-collector
        # bound V(1-e^{-draws/V}) that made bottom-hop pads saturate at V
        # and cost 30% throughput per 4x vertices (docs/PERF.md scale
        # sweep).  Reference analog: exact per-batch extents via prefix-sum
        # (ntsCUDATransferKernel.cuh:754); here the extent must be static,
        # so it is an expectation with the overflow counter as safety net.
        v_f = float(self.adj.num_vertices)
        dst_of_edge = np.repeat(
            np.arange(self.adj.num_vertices, dtype=np.int64),
            np.diff(self.adj.indptr).astype(np.int64),
        )
        indeg_e = np.maximum(
            self.adj.in_degree[dst_of_edge].astype(np.float64), 1.0)
        est_pads = []
        ndst = float(batch_size)
        for h, f in enumerate(cfg.fanout):
            c_v = np.bincount(
                self.adj.indices.astype(np.int64),
                weights=np.minimum(f / indeg_e, 1.0),
                minlength=self.adj.num_vertices,
            )
            uniq_sampled = float(-np.expm1(-(ndst / v_f) * c_v).sum())
            # sources = sampled neighbors ∪ the dst seeds themselves
            expected_unique = uniq_sampled + ndst
            est = pad_to(int(expected_unique * cfg.src_pad_factor), 128)
            est = min(est, exact[h])
            # Measured round-4 (docs/PERF.md scale sweep): snapping a
            # near-V bottom estimate UP to V (the sampler's no-dedup
            # identity branch) improves the STANDALONE step 139 -> 98 ms
            # at 4x scale, but the fused-epoch trainer measured 4% SLOWER
            # (10.46 -> 10.87 s): the pipelined scan already hides most of
            # the dedup cost behind fwd/bwd, while identity x0 adds real
            # +9% bottom-layer rows every step.  The estimate is kept.
            est_pads.append(est)
            ndst = float(est)
        log.info("src pads (b=%d): exact %s -> degree-aware estimate %s",
                 batch_size, exact, tuple(est_pads))
        return tuple(est_pads)

    # ------------------------------------------------------------- programs
    def _build_device_step(self):
        family, drop_rate = self.family, self.cfg.drop_rate
        heads = self.cfg.heads
        bn = self.cfg.batch_norm
        optimizer = self.optimizer
        remat = self.cfg.remat
        fanouts = tuple(self.cfg.fanout)
        src_pads = self.src_pads
        wk = self.weight_kind
        dm = self.dev_degree_mode
        fs, cd = self._feat_scale, self.compute_dtype

        @jax.jit
        def step(params, opt_state, seeds, seed_valid, skey, dkey,
                 indptr, indices, in_deg, out_deg, features, labels):
            batch = device_sample_batch(
                skey, seeds, seed_valid, indptr, indices, in_deg, out_deg,
                features, labels, fanouts, src_pads, wk,
                degree_mode=dm, feat_scale=fs, compute_dtype=cd,
            )

            def loss_fn(p):
                logp = model_forward(
                    p, family, batch, drop_rate=drop_rate, train=True,
                    dropout_key=dkey, remat=remat, heads=heads,
                    batch_norm=bn,
                )
                return (
                    nll_loss_masked(logp, batch.labels, batch.label_valid),
                    logp,
                )

            (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_p, new_o = optimizer.update(grads, opt_state, params)
            acc = masked_accuracy(logp, batch.labels, batch.label_valid)
            n_edges = sum(jnp.sum(b.weight != 0) for b in batch.blocks)
            return new_p, new_o, loss, acc, n_edges

        return step

    def _build_epoch_fn(self):
        """Whole epoch as ONE program: lax.scan over stacked seed batches.

        With on-device sampling there is no host work between steps, so the
        entire epoch (sample → train → Adam, ×n_steps) compiles into a
        single XLA while-loop — one dispatch per epoch, zero host round
        trips, and the compiler overlaps adjacent steps' gathers/compute.
        """
        family, drop_rate = self.family, self.cfg.drop_rate
        heads = self.cfg.heads
        bn = self.cfg.batch_norm
        optimizer = self.optimizer
        remat = self.cfg.remat
        fanouts = tuple(self.cfg.fanout)
        src_pads = self.src_pads
        wk = self.weight_kind
        dm = self.dev_degree_mode
        fs, cd = self._feat_scale, self.compute_dtype
        unroll = max(1, self.cfg.scan_unroll)

        @jax.jit
        def epoch(params, opt_state, seeds_all, valid_all, key,
                  indptr, indices, in_deg, out_deg, features, labels):
            def body(carry, xs):
                params, opt_state, key = carry
                seeds, valid = xs
                key, sk, dk = jax.random.split(key, 3)
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    degree_mode=dm, feat_scale=fs, compute_dtype=cd,
                )

                def loss_fn(p):
                    logp = model_forward(
                        p, family, batch, drop_rate=drop_rate, train=True,
                        dropout_key=dk, remat=remat, heads=heads,
                        batch_norm=bn,
                    )
                    return (
                        nll_loss_masked(logp, batch.labels, batch.label_valid),
                        logp,
                    )

                (loss, logp), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                new_p, new_o = optimizer.update(grads, opt_state, params)
                acc = masked_accuracy(logp, batch.labels, batch.label_valid)
                n_edges = sum(jnp.sum(b.weight != 0) for b in batch.blocks)
                return (new_p, new_o, key), (loss, acc, n_edges)

            # SCAN_UNROLL > 1 duplicates the step body so XLA's
            # scheduler can overlap step t+1's sampling gathers (which
            # depend only on the RNG-key chain) with step t's backward
            (params, opt_state, _), (losses, accs, edges) = jax.lax.scan(
                body, (params, opt_state, key), (seeds_all, valid_all),
                unroll=unroll,
            )
            return (
                params, opt_state, jnp.mean(losses),
                jnp.sum(accs, axis=0), jnp.sum(edges),
            )

        return epoch

    def _build_device_eval(self):
        family, heads = self.family, self.cfg.heads
        bn = self.cfg.batch_norm
        fanouts = tuple(self.cfg.fanout)
        src_pads = self.src_pads
        wk = self.weight_kind
        dm = self.dev_degree_mode
        fs, cd = self._feat_scale, self.compute_dtype

        @jax.jit
        def evaluate(params, seeds, seed_valid, skey,
                     indptr, indices, in_deg, out_deg, features, labels):
            batch = device_sample_batch(
                skey, seeds, seed_valid, indptr, indices, in_deg, out_deg,
                features, labels, fanouts, src_pads, wk,
                degree_mode=dm, feat_scale=fs, compute_dtype=cd,
            )
            logp = model_forward(params, family, batch, train=False,
                     heads=heads, batch_norm=bn)
            return masked_accuracy(logp, batch.labels, batch.label_valid)

        return evaluate

    def _build_eval_epoch_fn(self):
        """Fused evaluation: one scan program over all eval batches."""
        family, heads = self.family, self.cfg.heads
        bn = self.cfg.batch_norm
        fanouts = tuple(self.cfg.fanout)
        src_pads = self.src_pads
        wk = self.weight_kind
        dm = self.dev_degree_mode
        fs, cd = self._feat_scale, self.compute_dtype

        @jax.jit
        def eval_epoch(params, seeds_all, valid_all, key,
                       indptr, indices, in_deg, out_deg, features, labels):
            def body(key, xs):
                seeds, valid = xs
                key, sk = jax.random.split(key)
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    degree_mode=dm, feat_scale=fs, compute_dtype=cd,
                )
                logp = model_forward(params, family, batch, train=False,
                     heads=heads, batch_norm=bn)
                return key, masked_accuracy(
                    logp, batch.labels, batch.label_valid
                )

            _, accs = jax.lax.scan(body, key, (seeds_all, valid_all))
            return jnp.sum(accs, axis=0)

        return eval_epoch

    # ------------------------------------------------------------ checkpoint
    def checkpoint_state(self):
        st = super().checkpoint_state()
        st["sample_key"] = self._sample_key
        return st

    def load_checkpoint_state(self, state) -> None:
        super().load_checkpoint_state(state)
        self._sample_key = state["sample_key"]

    # --------------------------------------------------------------- loops
    def _seed_batches(self, nids: np.ndarray, shuffle: bool):
        nids = np.asarray(nids, dtype=np.int32)
        if shuffle:
            nids = self.sampler.rng.permutation(nids)
        for i in range(0, nids.shape[0], self.cfg.batch_size):
            chunk = nids[i:i + self.cfg.batch_size]
            seeds = np.zeros(self.seed_pad, np.int32)
            seeds[: chunk.size] = chunk
            valid = np.zeros(self.seed_pad, bool)
            valid[: chunk.size] = True
            yield jnp.asarray(seeds), jnp.asarray(valid)

    def train_epoch(self) -> Tuple[float, float, int]:
        if self.fused_epoch:
            return self._train_epoch_fused()
        # device-array accumulation only — one host sync per epoch, so XLA's
        # async dispatch keeps step t+1 enqueued while t executes (the
        # reference needs pipeline_num threads + streams for this overlap)
        losses, accs, edge_counts = [], [], []
        for seeds, valid in self._seed_batches(
            self._epoch_order(self.train_nids), False
        ):
            self._sample_key, sk = jax.random.split(self._sample_key)
            self._dropout_key, dk = jax.random.split(self._dropout_key)
            with self.timers.phase("device_step"):
                (self.params, self.opt_state, loss, acc, ne) = self._dev_step(
                    self.params, self.opt_state, seeds, valid, sk, dk,
                    self.dev_indptr, self.dev_indices, self.dev_in_deg,
                    self.dev_out_deg, self.dev_features, self.dev_labels,
                )
            losses.append(loss)
            accs.append(acc)
            edge_counts.append(ne)
        if not losses:
            return 0.0, 0.0, 0
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        acc_sum = np.asarray(jnp.sum(jnp.stack(accs), axis=0))
        edges = int(np.asarray(jnp.sum(jnp.stack(edge_counts))))
        return mean_loss, int(acc_sum[0]) / max(int(acc_sum[1]), 1), edges

    def _train_epoch_fused(self) -> Tuple[float, float, int]:
        """One XLA program for the whole epoch (scan over seed batches)."""
        nids = self._epoch_order(self.train_nids)
        seeds_l, valid_l = [], []
        for seeds, valid in self._seed_batches(nids, False):
            seeds_l.append(seeds)
            valid_l.append(valid)
        if not seeds_l:
            return 0.0, 0.0, 0
        seeds_all = jnp.stack(seeds_l)
        valid_all = jnp.stack(valid_l)
        self._sample_key, key = jax.random.split(self._sample_key)
        with self.timers.phase("device_epoch"):
            (self.params, self.opt_state, loss, acc_sum, edges) = (
                self._epoch_fn(
                    self.params, self.opt_state, seeds_all, valid_all, key,
                    self.dev_indptr, self.dev_indices, self.dev_in_deg,
                    self.dev_out_deg, self.dev_features, self.dev_labels,
                )
            )
            acc_np = np.asarray(acc_sum)
        return (
            float(loss),
            int(acc_np[0]) / max(int(acc_np[1]), 1),
            int(np.asarray(edges)),
        )

    def evaluate(self, nids: np.ndarray) -> float:
        if getattr(self, "_eval_epoch_fn", None) is None:
            self._eval_epoch_fn = self._build_eval_epoch_fn()
        seeds_l, valid_l = [], []
        for seeds, valid in self._seed_batches(nids, False):
            seeds_l.append(seeds)
            valid_l.append(valid)
        if not seeds_l:
            return 0.0
        self._sample_key, key = jax.random.split(self._sample_key)
        with self.timers.phase("device_eval"):
            acc = np.asarray(
                self._eval_epoch_fn(
                    self.params, jnp.stack(seeds_l), jnp.stack(valid_l), key,
                    self.dev_indptr, self.dev_indices, self.dev_in_deg,
                    self.dev_out_deg, self.dev_features, self.dev_labels,
                )
            )
        return int(acc[0]) / max(int(acc[1]), 1)
