"""Fully-fused cached training: device sampling + hot cache in one program.

Reference: GS_SAMPLE_CACHE (toolkits/GS_SAMPLE_CACHE.hpp:616-700) — the
hot-vertex embedding cache refreshed ON the accelerator by a dedicated
stream (`cache_gpu_sampler` + GPUPushDownBatchOp) instead of the CPU helper
thread, combined with the cache-omitting GPU sampler.

TPU redesign, taken to its fused conclusion: the epoch scan's body carries
`cache_emb` as loop state — at every super-batch boundary
(step % pipeline_num == 0) the body refreshes the whole hot cache from the
static hot-set COO using the CURRENT weights (bounded staleness: the cache
then serves the next pipeline_num steps unchanged), samples with the
cache-omit map, and splices cached rows into layer 0.  Sampling, cache
refresh, training and Adam all live in ONE compiled program; there are no
helper threads, streams, or host round trips to orchestrate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.embedding_cache import EmbeddingCache
from ..cache.hotness import presample_hotness, super_batch_stable_shuffle
from ..config import RunConfig
from ..data.dataset import Dataset
from ..models.gnn import model_forward
from ..nn.functional import masked_accuracy, nll_loss_masked

from ..sampler.blocks import WeightKind
from ..sampler.device import device_sample_batch
from ..utils.logging import get_logger
from .device_trainer import DeviceSampleTrainer

log = get_logger("sgnn.devcache")


class DeviceCachedSampleTrainer(DeviceSampleTrainer):
    """DeviceSampleTrainer + in-scan hot-vertex cache (GS_SAMPLE_CACHE)."""

    # this trainer IS the estimator-regime recommendation (hot bottom
    # layers reused across batches) — advisor reports numbers, no warning
    _advisor_remedied = True

    def __init__(
        self,
        cfg: RunConfig,
        dataset: Dataset,
        family: str = "sage",
        weight_kind: WeightKind = WeightKind.MEAN,
        bias_correction: bool = False,
        adj=None,
        per_sb: bool = True,   # False → ONE global hot set (the *PCMULTI
        #                        discipline: concurrent per-device streams
        #                        share one cache, ntsDataloador.hpp:735)
        **_: object,
    ) -> None:
        if len(cfg.layer_sizes) < 3:
            # the hot-vertex cache stores LAYER-0 hidden embeddings that
            # layer 1 consumes (model_forward merges only when n_layers > 1);
            # a 1-layer model would sample omitted seeds as zero rows and
            # silently train on them
            raise ValueError(
                "cached engines need >= 2 layers (LAYERS with a hidden "
                "dim): the embedding cache holds layer-0 hidden outputs "
                "consumed by layer 1 — use the non-cached engine for "
                "single-layer models"
            )
        super().__init__(
            cfg, dataset, family=family, weight_kind=weight_kind,
            bias_correction=bias_correction, adj=adj,
        )
        cache_rate = cfg.cache_rate if cfg.cache_rate > 0 else 0.1
        agg_kind = weight_kind if family != "gat" else WeightKind.MEAN
        self.super_batch_steps = max(cfg.pipeline_num, 1)
        sb_size = cfg.batch_size * self.super_batch_steps
        # Per-super-batch plans (reference batch_cache_num): one hot set per
        # SB, all stacked into device arrays so the SCAN swaps plans with a
        # dynamic index at each SB boundary — the fused-program analogue of
        # set_cache_index (ntsDataloador.hpp:440).
        self.per_sb = per_sb and len(self.train_nids) > sb_size
        if self.per_sb:
            from ..cache.hotness import presample_hotness_per_sb

            per_ids = presample_hotness_per_sb(
                self.adj, self.train_nids, cfg.fanout, cache_rate, sb_size,
                edge_file=cfg.edge_file or None, batch_size=cfg.batch_size,
            )
        else:
            per_ids = presample_hotness(
                self.adj, self.train_nids, cfg.fanout, cache_rate,
                edge_file=cfg.edge_file or None, batch_size=cfg.batch_size,
            )[None]
        # cache weights must match the sampler's (global → plain mean)
        ms = "plain" if self.dev_degree_mode == "global" else "hybrid"
        self.sb_caches = [
            EmbeddingCache.build(self.adj, ids, agg_kind, mean_style=ms)
            for ids in per_ids
        ]
        self.cache = self.sb_caches[0]
        v_pad = self.dev_features.shape[0]
        n_sb = len(self.sb_caches)
        cmaps = np.full((n_sb, v_pad), -1, np.int32)
        for k, c in enumerate(self.sb_caches):
            cmaps[k, : self.adj.num_vertices] = c.cache_map_host
        self.cache_maps = jnp.asarray(cmaps)
        # One-time weight-independent PushDown aggregates per SB plan
        # (embedding_cache class doc): the in-scan refresh collapses from an
        # E_hot-edge gather + segment-sum to ONE [C, F]·[F, H] matmul, and
        # the stacked [n_sb, C, F] aggregates replace the [n_sb, E_pad]
        # COO triples as scan inputs (C·F ≪ 3·E_hot at real cache rates).
        for c in self.sb_caches:
            c.precompute_aggregate(self.dev_features, self._feat_scale)
        self.cache_agg_all = jnp.stack([c.cache_agg for c in self.sb_caches])
        self.cache.cache_map = self.cache_maps[0]
        self._cached_epoch_fn = self._build_cached_epoch_fn()
        log.info(
            "device cache: %d hot vertices x %d super-batch plans, refresh "
            "every %d steps in-scan",
            self.cache.num_cached, n_sb, self.super_batch_steps,
        )

    # ------------------------------------------------------------- programs
    def _build_cached_epoch_fn(self):
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
        sb_steps = self.super_batch_steps

        @jax.jit
        def epoch(params, opt_state, cache_emb, seeds_all, valid_all, key,
                  indptr, indices, in_deg, out_deg, features, labels,
                  omit_maps, cache_agg_all):
            n_sb = omit_maps.shape[0]

            def refresh(w0, sb):
                # this SB plan's PRECOMPUTED hot-set aggregate ·W0 (the
                # reference's PushDown + X·W; the aggregation itself is
                # weight-independent and ran once at init)
                return jnp.dot(cache_agg_all[sb].astype(jnp.float32), w0,
                               preferred_element_type=jnp.float32)

            def body(carry, xs):
                params, opt_state, cache_emb, step_i, key = carry
                seeds, valid = xs
                key, sk, dk = jax.random.split(key, 3)
                sb = (step_i // sb_steps) % n_sb
                # super-batch boundary: install this SB's plan + republish
                # the cache with current W0 (set_cache_index parity)
                cache_emb = jax.lax.cond(
                    step_i % sb_steps == 0,
                    lambda: refresh(params.weights[0], sb),
                    lambda: cache_emb,
                )
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    omit_map=omit_maps[sb], degree_mode=dm,
                    feat_scale=fs, compute_dtype=cd,
                )

                def loss_fn(p):
                    logp = model_forward(
                        p, family, batch, drop_rate=drop_rate, train=True,
                        dropout_key=dk, cache_emb=cache_emb, remat=remat, heads=heads,
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
                hits = jnp.sum(batch.cache_mask) if batch.cache_mask is not None else 0
                lookups = jnp.sum(batch.blocks[0].dst_valid)
                n_edges = sum(jnp.sum(b.weight != 0) for b in batch.blocks)
                return (
                    (new_p, new_o, cache_emb, step_i + 1, key),
                    (loss, acc, n_edges, hits, lookups),
                )

            init = (params, opt_state, cache_emb, jnp.zeros((), jnp.int32), key)
            (params, opt_state, cache_emb, _, _), outs = jax.lax.scan(
                body, init, (seeds_all, valid_all)
            )
            losses, accs, edges, hits, lookups = outs
            return (
                params, opt_state, cache_emb, jnp.mean(losses),
                jnp.sum(accs, axis=0), jnp.sum(edges),
                jnp.sum(hits), jnp.sum(lookups),
            )

        return epoch

    # ---------------------------------------------------------------- loops
    def train_epoch(self) -> Tuple[float, float, int]:
        nids = super_batch_stable_shuffle(
            self.train_nids, self.cfg.batch_size * self.super_batch_steps,
            self.sampler.rng,
        )
        seeds_l, valid_l = [], []
        for seeds, valid in self._seed_batches(nids, False):
            seeds_l.append(seeds)
            valid_l.append(valid)
        if not seeds_l:
            return 0.0, 0.0, 0
        seeds_all = jnp.stack(seeds_l)
        valid_all = jnp.stack(valid_l)
        if self.cache.cache_emb is None:
            hidden = self.cfg.layer_sizes[1]
            self.cache.cache_emb = jnp.zeros(
                (self.cache.num_cached, hidden), jnp.float32
            )
        self._sample_key, key = jax.random.split(self._sample_key)
        with self.timers.phase("device_epoch"):
            (self.params, self.opt_state, self.cache.cache_emb, loss,
             acc_sum, edges, hits, lookups) = self._cached_epoch_fn(
                self.params, self.opt_state, self.cache.cache_emb,
                seeds_all, valid_all, key,
                self.dev_indptr, self.dev_indices, self.dev_in_deg,
                self.dev_out_deg, self.dev_features, self.dev_labels,
                self.cache_maps, self.cache_agg_all,
            )
            acc_np = np.asarray(acc_sum)
        self.cache_hits = int(np.asarray(hits))
        self.cache_lookups = int(np.asarray(lookups))
        return (
            float(loss),
            int(acc_np[0]) / max(int(acc_np[1]), 1),
            int(np.asarray(edges)),
        )

    @property
    def cache_hit_rate(self) -> float:
        return getattr(self, "cache_hits", 0) / max(
            getattr(self, "cache_lookups", 1), 1
        )

    # ------------------------------------------------------------ checkpoint
    def checkpoint_state(self):
        st = super().checkpoint_state()
        hidden = self.cfg.layer_sizes[1]
        emb = self.cache.cache_emb
        st["cache_emb"] = (
            emb if emb is not None
            else jnp.zeros((self.cache.num_cached, hidden), jnp.float32)
        )
        return st

    def load_checkpoint_state(self, state) -> None:
        super().load_checkpoint_state(state)
        self.cache.cache_emb = state["cache_emb"]
