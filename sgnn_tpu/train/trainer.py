"""Mini-batch GNN trainer: sample → transfer → jitted train step.

Reference: the engines' run()/Train()/Forward() skeleton (e.g.
GCN_SAMPLE_ALLGPU.hpp:268-400): per-epoch shuffle of train nids, a pipeline
of sample → H2D transfer → forward/backward/update, plus per-split accuracy
logging and phase timers.

TPU redesign: the whole forward+backward+Adam step is ONE jitted XLA program
over statically-shaped blocks; pipelining (reference pipeline_num threads ×
CUDA streams) falls out of JAX's async dispatch — the host sampler prepares
batch t+1 while the device executes step t, with a 1-deep prefetch queue.
Gradient DP reduction hooks in via parallel/dp.py.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.dataset import Dataset, MASK_TRAIN, MASK_VAL, MASK_TEST
from ..graph.adjacency import Adjacency
from ..models.gnn import GNNParams, init_model, model_forward
from ..nn.functional import masked_accuracy, nll_loss_masked
from ..nn.optim import AdamState, ReferenceAdam, make_optimizer
from ..sampler.blocks import SampledBatch, SampledBlock, WeightKind
from ..sampler.host import HostSampledBatch, HostSampler
from ..utils.logging import get_logger
from ..utils.timing import PhaseTimer
from .guard import check_finite_loss

log = get_logger("sgnn.train")


@dataclasses.dataclass
class TrainReport:
    epoch_times: List[float]
    train_acc: List[float]
    val_acc: List[float]
    test_acc: List[float]
    losses: List[float]
    edges_per_epoch: List[int]
    timers: PhaseTimer
    # TIME_SKIP semantics (reference parses it at GraphSegment.cpp:326 but
    # never consumes it — implemented for real here): the first `time_skip`
    # epochs (compile + cache warmup) are excluded from the average.
    time_skip: int = 1
    # REORDER provenance: order[new_id] = old_id when the engine renumbered
    # vertices (graph/reorder.py) — row new_id of any per-vertex result in
    # this report belongs to original vertex order[new_id]; None otherwise.
    vertex_order: "np.ndarray | None" = None

    @property
    def avg_epoch_time(self) -> float:
        n = len(self.epoch_times)
        if n == 0:
            return 0.0
        skip = min(n - 1, max(self.time_skip, 0))
        times = self.epoch_times[skip:]
        return float(np.mean(times)) if times else 0.0

    def to_dict(self) -> dict:
        """JSON-ready run record (CLI `--report-out`; the structured
        analog of the reference's per-run log directory that its
        get_log_run_time.py/get_rate.py scripts scrape back out of text
        logs)."""
        return {
            "epoch_times": [float(t) for t in self.epoch_times],
            "train_acc": [float(a) for a in self.train_acc],
            "val_acc": [float(a) for a in self.val_acc],
            "test_acc": [float(a) for a in self.test_acc],
            "losses": [float(x) for x in self.losses],
            "edges_per_epoch": [int(e) for e in self.edges_per_epoch],
            "time_skip": int(self.time_skip),
            "avg_epoch_time": self.avg_epoch_time,
            "phase_totals_s": {k: round(v, 6)
                               for k, v in self.timers.totals.items()},
            "phase_counts": dict(self.timers.counts),
        }


def host_batch_to_device(hb: HostSampledBatch, x0, y, y_valid) -> SampledBatch:
    blocks = [
        SampledBlock(
            nbr=jnp.asarray(b.nbr),
            weight=jnp.asarray(b.weight),
            srcs=jnp.asarray(b.srcs),
            seeds=jnp.asarray(b.seeds),
            dst_valid=jnp.asarray(b.dst_valid),
            src_valid=jnp.asarray(b.src_valid),
            seed_in_src=jnp.asarray(b.seed_in_src),
        )
        for b in hb.blocks
    ]
    return SampledBatch(
        blocks=blocks,
        x0=jnp.asarray(x0),
        labels=jnp.asarray(y),
        label_valid=jnp.asarray(y_valid),
    )


class SampleTrainer:
    """Single-chip sampled training engine (multi-chip wrapper in parallel/)."""

    def __init__(
        self,
        cfg: RunConfig,
        dataset: Dataset,
        family: str = "gcn",
        weight_kind: WeightKind = WeightKind.GCN,
        degree_mode: str = "global",
        bias_correction: bool = False,
        adj: Optional[Adjacency] = None,
        features_on_device: Optional[bool] = None,
        hbm_budget_bytes: Optional[int] = None,
    ) -> None:
        if len(cfg.fanout) != len(cfg.layer_sizes) - 1:
            raise ValueError(
                f"FANOUT has {len(cfg.fanout)} hops but LAYERS defines "
                f"{len(cfg.layer_sizes) - 1} layers; they must match"
            )
        self.cfg = cfg
        self.dataset = dataset
        self.family = family
        self.adj = adj if adj is not None else Adjacency.from_edges(
            dataset.edges, dataset.num_vertices
        )
        self.train_nids = dataset.nids_with_mask(MASK_TRAIN)
        self.val_nids = dataset.nids_with_mask(MASK_VAL)
        self.test_nids = dataset.nids_with_mask(MASK_TEST)
        # BATCH_TYPE semantics (reference parses these at GraphSegment.cpp:304
        # but never consumes them — implemented for real here):
        # dellow/delhigh drop the DEL_FRAC lowest/highest-degree train seeds.
        bt = cfg.batch_type.lower()
        if bt in ("dellow", "delhigh") and cfg.del_frac > 0:
            order = np.argsort(self.adj.in_degree[self.train_nids],
                               kind="stable")
            k = int(len(self.train_nids) * cfg.del_frac)
            keep = order[k:] if bt == "dellow" else order[: len(order) - k]
            self.train_nids = np.sort(self.train_nids[keep])
        # Estimator-regime advisor (train/advisor.py): detect near-whole-
        # graph bottom-hop coverage and recommend FULLBATCH/PD-cache
        # (ESTIMATOR_ADVISOR cfg key; cache/pushdown trainers set
        # _advisor_remedied and get the numbers without the warning)
        from .advisor import advise_estimator_regime

        self.estimator_advice = advise_estimator_regime(
            self.adj, cfg.fanout, cfg.batch_size, len(self.train_nids),
            mode=getattr(cfg, "estimator_advisor", "warn"),
            remedied=getattr(type(self), "_advisor_remedied", False),
            context=type(self).__name__,
        )
        wk = WeightKind.NONE if family == "gat" else weight_kind
        self.sampler = HostSampler(
            self.adj,
            fanouts=cfg.fanout,
            batch_size=cfg.batch_size,
            weight_kind=wk,
            degree_mode=degree_mode,
            seed=cfg.seed,
        )
        # compute dtype: bf16 halves feature-gather HBM traffic; params and
        # the loss head stay f32 (DTYPE cfg key)
        self.compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        # feature STORAGE dtype (FEATURE_DTYPE cfg key, "" → follow DTYPE):
        # int8 stores per-column-quantized features — a CAPACITY knob (4x
        # f32 rows per HBM byte; the gather itself is ~10% slower than bf16,
        # docs/PERF.md "Feature-gather dtype"), dequantized in-program
        fd = (cfg.feature_dtype or cfg.dtype).lower()
        if fd not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"FEATURE_DTYPE must be float32|bfloat16|int8, got {fd!r}"
            )
        self.feature_int8 = fd == "int8"
        # HBM-resident payload: when the feature matrix fits on device,
        # gather x0/labels INSIDE the jitted step from int32 src ids — the
        # TPU-native replacement for the reference's pinned-host zero-copy
        # feature loads (load_feature_gpu, ntsFastSampler.hpp:227) and GPU
        # feature cache.  Host mode remains for graphs larger than HBM.
        # HBM_BUDGET (cfg) forces the residency limit (determine_cache_node
        # _idx parity, GCN_SAMPLE_PD_CACHE.hpp:1039 — testable anywhere).
        if hbm_budget_bytes is None and getattr(cfg, "hbm_budget", 0) > 0:
            hbm_budget_bytes = cfg.hbm_budget
        self._hbm_budget_bytes = hbm_budget_bytes
        store_itemsize = {"int8": 1, "bfloat16": 2}.get(fd, 4)
        if features_on_device is None:
            limit = (hbm_budget_bytes if hbm_budget_bytes is not None
                     else 4 << 30)
            features_on_device = (
                dataset.features is not None
                and dataset.features.shape[0] * dataset.features.shape[1]
                * store_itemsize < limit
            )
        self.features_on_device = features_on_device
        self._feat_scale = None   # [F] f32 per-column scales (int8 mode)
        self._host_q = None       # host int8 matrix (int8 + host-mode)
        feat_store_dtype = (
            jnp.int8 if self.feature_int8
            else (jnp.bfloat16 if fd == "bfloat16" else jnp.float32)
        )
        if features_on_device:
            if self.feature_int8:
                from ..data.quant import quantize_columns

                q, scale = quantize_columns(dataset.features)
                self.dev_features = jnp.asarray(q)
                self._feat_scale = jnp.asarray(scale)
            else:
                self.dev_features = jnp.asarray(dataset.features,
                                                dtype=feat_store_dtype)
            self.dev_labels = jnp.asarray(dataset.labels.astype(np.int32))
        else:
            self.dev_features = None
            self.dev_labels = None
        # Partial-HBM feature cache: when the matrix does NOT fit on device,
        # stage the hottest (highest-degree) FEATURE_CACHE_RATE rows in HBM,
        # sized by a free-memory probe, and ship only cache-miss rows per
        # batch (reference load_feature_gpu_cache ntsFastSampler.hpp:263 +
        # determine_cache_node_idx GCN_SAMPLE_PD_CACHE.hpp:1039).
        self.feat_cache = None
        # Per-super-batch feature-cache plans (FEATURE_CACHE_PLAN:per_sb):
        # the reference's batch_cache_num discipline (ntsBaseOp.hpp:427-541)
        # applied to the FEATURE cache — each super-batch stages the rows
        # presampling says ITS seeds will actually touch, swapped at SB
        # boundaries, instead of one global degree-ranked set.  Producer
        # and consumer track the active SB with separate counters (the
        # prefetch thread samples ahead): the producer gathers cold rows
        # under batch's OWN SB slot map, the consumer uploads that SB's
        # [C, F] rows before stepping it (only ONE set resident at a time —
        # two would double the probed capacity budget).
        self._fc_sb_caches = None
        self._fc_sb_size = 0
        self._fc_dev_sb = 0
        self._fc_produce_idx = 0
        self._fc_consume_idx = 0
        self._fc_train_mode = False
        self._fc_host_store = None
        self._fc_store_dtype = None
        if not features_on_device and cfg.feature_cache_rate > 0:
            from ..cache.feature_cache import (
                FeatureCache, degree_ranked_hot_ids, hbm_feature_capacity,
            )

            cap = hbm_feature_capacity(
                dataset.features.shape[1],
                1 if self.feature_int8
                else jnp.dtype(self.compute_dtype).itemsize,
                budget_bytes=hbm_budget_bytes,
            )
            rows = min(int(cfg.feature_cache_rate * dataset.num_vertices), cap)
            if self.feature_int8:
                # quantize ONCE on the host; hot rows stage as int8 (2x the
                # rows of bf16 per HBM byte) and cold rows also SHIP as int8
                # (half the host→device bytes per miss)
                from ..data.quant import quantize_columns

                self._host_q, scale = quantize_columns(dataset.features)
                self._feat_scale = jnp.asarray(scale)
                self._fc_host_store = self._host_q
            else:
                self._fc_host_store = dataset.features
                self._fc_store_dtype = self.compute_dtype
            plan = (getattr(cfg, "feature_cache_plan", "global")
                    or "global").lower()
            sb_size = cfg.batch_size * max(cfg.pipeline_num, 1)
            if (plan == "per_sb" and rows > 0
                    and len(self.train_nids) > sb_size):
                from ..cache.hotness import presample_hotness_per_sb

                v = dataset.num_vertices
                per = presample_hotness_per_sb(
                    self.adj, self.train_nids, cfg.fanout,
                    min(1.0, (rows + 0.5) / v), sb_size,
                    edge_file=cfg.edge_file or None,
                    batch_size=cfg.batch_size,
                )[:, :rows]
                self._fc_sb_caches = [
                    FeatureCache.build(self._fc_host_store, ids,
                                       dtype=self._fc_store_dtype,
                                       device=False)
                    for ids in per
                ]
                self._fc_sb_size = sb_size
                self.feat_cache = self._fc_sb_caches[0]
                self.feat_cache.upload(self._fc_host_store,
                                       self._fc_store_dtype)
                rows_staged = per.shape[1]
            else:
                hot = degree_ranked_hot_ids(self.adj, rows)
                self.feat_cache = FeatureCache.build(
                    self._fc_host_store, hot, dtype=self._fc_store_dtype)
                rows_staged = hot.size
            log.info(
                "feature cache: %d/%d rows (%.1f%%) staged in HBM "
                "(capacity probe allowed %d, plan %s%s)",
                rows_staged, dataset.num_vertices,
                100.0 * rows_staged / max(dataset.num_vertices, 1), cap,
                plan,
                f" x {len(self._fc_sb_caches)} SBs"
                if self._fc_sb_caches else "",
            )
        key = jax.random.PRNGKey(cfg.seed)
        self.params = init_model(key, family, cfg.layer_sizes)
        # OPTIMIZER cfg key picks Adam (default) or the reference's SGD
        # rule (Parameter carries both, NtsScheduler.hpp:680-1029)
        self.optimizer = make_optimizer(cfg, bias_correction)
        self.opt_state = self.optimizer.init(self.params)
        self._dropout_key = jax.random.PRNGKey(cfg.seed + 1)
        self.timers = PhaseTimer()
        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    # ------------------------------------------------------------- programs
    def _materialize(
        self, batch: SampledBatch, features, labels,
        cache_rows=None, slot_map=None,
    ) -> SampledBatch:
        """In device mode, gather x0/labels in-program from src/seed ids."""
        if cache_rows is not None:
            # feature-cache mode: batch.x0 is the compacted cold buffer —
            # scatter it onto the src axis (padding scatter-dropped), then
            # overlay HBM-cached hot rows
            b0 = batch.blocks[0]
            s = b0.srcs.shape[0]
            x0 = jnp.zeros((s, cache_rows.shape[1]), cache_rows.dtype)
            x0 = x0.at[batch.cold_pos].set(
                batch.x0.astype(cache_rows.dtype), mode="drop"
            )
            slots = slot_map[b0.srcs]
            hot = cache_rows[jnp.maximum(slots, 0)]
            use_hot = (slots >= 0) & b0.src_valid
            x0 = jnp.where(use_hot[:, None], hot, x0)
            x0 = self._dequant(x0)
            return dataclasses.replace(batch, x0=x0, cold_pos=None)
        if not self.features_on_device:
            return batch
        b0, top = batch.blocks[0], batch.blocks[-1]
        rows = self._dequant(features[b0.srcs])
        x0 = jnp.where(b0.src_valid[:, None], rows, jnp.zeros((), rows.dtype))
        y = labels[top.seeds]
        return dataclasses.replace(batch, x0=x0, labels=y)

    def _dequant(self, rows: jax.Array) -> jax.Array:
        """int8-stored rows → compute dtype (per-column scales); pass-through
        otherwise.  The [F] scale vector is closed over deliberately — it is
        a few KB, unlike the feature matrix (which must stay an argument)."""
        if rows.dtype != jnp.int8:
            return rows.astype(self.compute_dtype)
        return rows.astype(self.compute_dtype) * self._feat_scale.astype(
            self.compute_dtype
        )

    def _build_step(self):
        family, drop_rate = self.family, self.cfg.drop_rate
        heads = self.cfg.heads
        bn = self.cfg.batch_norm
        optimizer = self.optimizer
        remat = self.cfg.remat

        @jax.jit
        def step(params: GNNParams, opt_state: AdamState, batch: SampledBatch,
                 key: jax.Array, features, labels, cache_rows=None,
                 slot_map=None):
            batch_m = self._materialize(batch, features, labels,
                                        cache_rows, slot_map)

            def loss_fn(p):
                logp = model_forward(
                    p, family, batch_m,
                    drop_rate=drop_rate, train=True, dropout_key=key,
                    remat=remat, heads=heads, batch_norm=bn,
                )
                return (
                    nll_loss_masked(logp, batch_m.labels, batch_m.label_valid),
                    logp,
                )

            (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_params, new_opt = optimizer.update(grads, opt_state, params)
            acc = masked_accuracy(logp, batch_m.labels, batch_m.label_valid)
            return new_params, new_opt, loss, acc

        return step

    def _build_eval(self):
        family, heads = self.family, self.cfg.heads
        bn = self.cfg.batch_norm

        @jax.jit
        def evaluate(params: GNNParams, batch: SampledBatch, features, labels,
                     cache_rows=None, slot_map=None):
            batch_m = self._materialize(batch, features, labels,
                                        cache_rows, slot_map)
            logp = model_forward(params, family, batch_m, train=False,
                                 heads=heads, batch_norm=bn)
            return masked_accuracy(logp, batch_m.labels, batch_m.label_valid)

        return evaluate

    def _cache_args(self):
        """Extra step args in feature-cache mode (passed, not closed over —
        closing over big arrays bakes them into the HLO)."""
        if self.feat_cache is None:
            return ()
        return (self.feat_cache.dev_hot, self.feat_cache.dev_slot_map)

    # --------------------------------------- per-SB feature-cache plumbing
    def _fc_producer_cache(self, sampler=None):
        """The FeatureCache whose HOST slot map this batch gathers under.

        Per-SB mode maps the producer's batch counter to its super-batch
        (membership is stable — super_batch_stable_shuffle).  DP wrappers
        pass their own sampler streams and run their own epoch loops, so
        they stay on the single resident plan (`self.feat_cache`)."""
        if (self._fc_sb_caches is None or not self._fc_train_mode
                or sampler is not None):
            return self.feat_cache
        k = (self._fc_produce_idx * self.cfg.batch_size) // self._fc_sb_size
        self._fc_produce_idx += 1
        return self._fc_sb_caches[min(k, len(self._fc_sb_caches) - 1)]

    def _fc_consume_advance(self):
        """Consumer side: before stepping the next batch, make the DEVICE
        arrays match the super-batch that batch was gathered under
        (reference new_cache_var/set_cache_index swap,
        ntsDataloador.hpp:285/:440); the outgoing SB's [C, F] rows are
        released first so only one set is ever resident."""
        if self._fc_sb_caches is None or not self._fc_train_mode:
            return
        k = (self._fc_consume_idx * self.cfg.batch_size) // self._fc_sb_size
        self._fc_consume_idx += 1
        self._fc_install_sb(min(k, len(self._fc_sb_caches) - 1))

    @property
    def feature_cache_stats(self):
        """Aggregate (hit_rate, bytes_shipped, bytes_full) across every
        feature-cache plan (per-SB mode spreads counters over n_sb
        objects; `feat_cache` alone would report only the last SB's)."""
        caches = (self._fc_sb_caches if self._fc_sb_caches is not None
                  else ([self.feat_cache] if self.feat_cache else []))
        hits = sum(c.hits for c in caches)
        misses = sum(c.misses for c in caches)
        return (hits / max(hits + misses, 1),
                sum(c.bytes_shipped for c in caches),
                sum(c.bytes_full for c in caches))

    def _fc_install_sb(self, k: int) -> None:
        if k == self._fc_dev_sb and self._fc_sb_caches[k].dev_hot is not None:
            return
        prev = self._fc_sb_caches[self._fc_dev_sb]
        prev.dev_hot = None
        prev.dev_slot_map = None
        with self.timers.phase("cache_refresh"):
            self._fc_sb_caches[k].upload(self._fc_host_store,
                                         self._fc_store_dtype)
        self.feat_cache = self._fc_sb_caches[k]
        self._fc_dev_sb = k

    # ------------------------------------------------------------- batching
    def _make_batch(
        self, seeds: np.ndarray, sampler: Optional[HostSampler] = None
    ) -> Tuple[SampledBatch, int]:
        """Sample + payload one batch.  `sampler` overrides self.sampler so
        DP wrappers can run one sampler STREAM per device on worker threads
        (reference: one FastSampler per GPU, GCN_SAMPLE_ALL_MULTI.hpp:564)."""
        cold_pos = None
        with self.timers.phase("sample"):
            hb = (sampler or self.sampler).sample(seeds)
            if self.features_on_device:
                # x0/labels are gathered in-program; ship ids only
                top = hb.blocks[-1]
                x0 = np.zeros((1, 1), np.float32)
                y = np.zeros((top.seeds.shape[0],), np.int32)
                yv = top.dst_valid
            elif self.feat_cache is not None:
                # ship ONLY cache-miss feature rows (compacted); int8 mode
                # gathers from the pre-quantized host matrix so misses also
                # cross the link at 1 byte/element
                b0, top = hb.blocks[0], hb.blocks[-1]
                feat_src = (self._host_q if self._host_q is not None
                            else self.dataset.features)
                x0, cold_pos = self._fc_producer_cache(
                    sampler).gather_cold_compact(
                    feat_src, b0.srcs, b0.src_valid
                )
                y = self.dataset.labels[np.maximum(top.seeds, 0)].astype(
                    np.int32
                )
                yv = top.dst_valid
            else:
                x0, y, yv = hb.payload(
                    self.dataset.features, self.dataset.labels
                )
        with self.timers.phase("transfer"):
            batch = host_batch_to_device(hb, x0, y, yv)
            if cold_pos is not None:
                batch = dataclasses.replace(
                    batch, cold_pos=jnp.asarray(cold_pos)
                )
        return batch, hb.num_valid_edges()

    def _batch_stream(self, nids: np.ndarray, shuffle: bool):
        """Prefetching iterator: sample batch t+1 while device runs step t.

        The reference overlaps sampling/transfer/compute with pipeline_num
        threads + stage mutexes (GCN_SAMPLE_ALLGPU.hpp:286-400); JAX's async
        dispatch plus one background sampling thread achieves the same
        overlap with a bounded queue.
        """
        q: "queue.Queue" = queue.Queue(maxsize=max(2, self.cfg.pipeline_num))
        seed_list = list(self.sampler.epoch_seed_batches(nids, shuffle))

        def producer():
            # a raised sampler error must still reach the consumer — without
            # the sentinel/exception handoff q.get() would block forever
            try:
                for seeds in seed_list:
                    q.put(self._make_batch(seeds))
            except BaseException as exc:  # noqa: BLE001 — re-raised on main
                q.put(exc)
            else:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()

    # ------------------------------------------------------------ checkpoint
    def checkpoint_state(self) -> Dict:
        """Everything needed for bit-equivalent resume (train/checkpoint.py).

        Beyond params/moments this captures the host sampler's RNG so a
        resumed run draws the SAME neighbor samples an uninterrupted run
        would (the reference has no checkpointing; SURVEY §5 designates it
        an improvement)."""
        from .checkpoint import encode_np_rng

        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "dropout_key": self._dropout_key,
            "host_rng": encode_np_rng(self.sampler.rng),
        }

    def load_checkpoint_state(self, state: Dict) -> None:
        from .checkpoint import decode_np_rng

        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self._dropout_key = state["dropout_key"]
        decode_np_rng(self.sampler.rng, state["host_rng"])

    # ---------------------------------------------------------------- loops
    def _epoch_order(self, nids: np.ndarray) -> np.ndarray:
        """Seed ordering per BATCH_TYPE: shuffle|sequence|random(+replace)."""
        bt = self.cfg.batch_type.lower()
        if bt == "sequence":
            return nids
        if bt == "random":
            return self.sampler.rng.choice(nids, size=len(nids), replace=True)
        return self.sampler.rng.permutation(nids)

    def train_epoch(self) -> Tuple[float, float, int]:
        """One epoch over train nids → (mean loss, train acc, edges sampled)."""
        losses, accs, edges = [], [], 0
        if self._fc_sb_caches is not None:
            # per-SB feature plans require stable SB membership across
            # epochs (nts_local_shuffle parity) and fresh SB counters;
            # BATCH_TYPE sequence keeps membership stable by construction
            from ..cache.hotness import super_batch_stable_shuffle

            order = (self.train_nids
                     if self.cfg.batch_type.lower() == "sequence"
                     else super_batch_stable_shuffle(
                         self.train_nids, self._fc_sb_size,
                         self.sampler.rng))
            self._fc_train_mode = True
            self._fc_produce_idx = 0
            self._fc_consume_idx = 0
        else:
            order = self._epoch_order(self.train_nids)
        try:
            for batch, nedges in self._batch_stream(order, shuffle=False):
                self._fc_consume_advance()
                self._dropout_key, sub = jax.random.split(self._dropout_key)
                with self.timers.phase("train_step"):
                    self.params, self.opt_state, loss, acc = self._step_fn(
                        self.params, self.opt_state, batch, sub,
                        self.dev_features, self.dev_labels,
                        *self._cache_args(),
                    )
                # device-array accumulation — one host sync per epoch keeps
                # async dispatch pipelining host sampling with device compute
                losses.append(loss)
                accs.append(acc)
                edges += nedges
        finally:
            self._fc_train_mode = False
        if not losses:
            return 0.0, 0.0, 0
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        acc_sum = np.asarray(jnp.sum(jnp.stack(accs), axis=0))
        return mean_loss, int(acc_sum[0]) / max(int(acc_sum[1]), 1), edges

    def evaluate(self, nids: np.ndarray) -> float:
        corrects, totals = 0, 0
        for batch, _ in self._batch_stream(nids, shuffle=False):
            with self.timers.phase("eval_step"):
                acc = self._eval_fn(
                    self.params, batch, self.dev_features, self.dev_labels,
                    *self._cache_args(),
                )
            corrects += int(acc[0])
            totals += int(acc[1])
        return corrects / max(totals, 1)

    def run(self, epochs: Optional[int] = None, eval_every: int = 1) -> TrainReport:
        """Full training run with per-epoch logging (reference run() parity)."""
        import time

        epochs = epochs if epochs is not None else self.cfg.epochs
        report = TrainReport([], [], [], [], [], [], self.timers,
                             time_skip=self.cfg.time_skip)
        for ep in range(epochs):
            t0 = time.perf_counter()
            loss, tr_acc, edges = self.train_epoch()
            check_finite_loss(loss, ep, type(self).__name__)
            jax.block_until_ready(self.params.weights[0])
            dt = time.perf_counter() - t0
            report.epoch_times.append(dt)
            report.losses.append(loss)
            report.train_acc.append(tr_acc)
            report.edges_per_epoch.append(edges)
            if (ep + 1) % eval_every == 0 or ep == epochs - 1:
                va = self.evaluate(self.val_nids) if self.val_nids.size else 0.0
                te = self.evaluate(self.test_nids) if self.test_nids.size else 0.0
            else:
                va = report.val_acc[-1] if report.val_acc else 0.0
                te = report.test_acc[-1] if report.test_acc else 0.0
            report.val_acc.append(va)
            report.test_acc.append(te)
            log.info(
                "epoch %d: loss %.5f train %.4f val %.4f test %.4f time %.3fs edges %d",
                ep, loss, tr_acc, va, te, dt, edges,
            )
        if self.feat_cache is not None:
            fc = self.feat_cache
            log.info(
                "feature cache: hit rate %.3f, shipped %.1f MiB cold rows "
                "(full gather would be %.1f MiB)",
                fc.hit_rate, fc.bytes_shipped / (1 << 20),
                fc.bytes_full / (1 << 20),
            )
        return report
