"""Full-batch (whole-graph) training — the NeutronStar-lineage path.

Reference: the single-node and distributed full-graph op families
(SingleCPU*/SingleGPU*/Dist* graph ops, core/ntsSingleCPUGraphOp.hpp,
ntsDistCPUGraphOp.hpp) driven by Gemini's push/pull engines
(core/graph.hpp:2535-4331).  The sample-based engines superseded these for
training speed, but the capability remains part of the framework.

TPU redesign: the whole graph is ONE padded COO; a full-batch epoch is a
single jitted program (L× spmm_coo + dense matmuls + masked loss).
Multi-chip: vertex-range sharding over the mesh "graph" axis with
all_gather halo exchange (parallel/halo.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.dataset import Dataset, MASK_TRAIN, MASK_VAL, MASK_TEST
from ..graph.adjacency import Adjacency
from ..models.gnn import GNNParams, init_model
from ..nn.functional import BN_EPS, dropout, log_softmax, nll_loss_masked
from .guard import check_finite_loss
from ..nn.optim import make_optimizer
from ..ops.segment import (
    SpmmPlanner, _eff_feat, attention_exp, broadcast_dst_sorted,
    gather_rows_hm, segment_softmax_coo, spmm_coo, spmm_coo_csc,
    spmm_coo_fwd_sorted, spmm_coo_multihead_hm,
)
from ..sampler.blocks import WeightKind, pad_to
from ..utils.logging import get_logger

log = get_logger("sgnn.full")


def build_coo(
    adj: Adjacency, weight_kind: WeightKind, pad_multiple: int = 512
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-graph (src, dst, weight) arrays, padded with weight-0 edges."""
    v = adj.num_vertices
    dst = np.repeat(np.arange(v, dtype=np.int32),
                    np.diff(adj.indptr).astype(np.int64))
    src = adj.indices.astype(np.int32)
    if weight_kind == WeightKind.GCN:
        w = adj.gcn_edge_weight(src, dst)
    elif weight_kind == WeightKind.MEAN:
        w = adj.gcn_edge_weight(src, dst) / np.maximum(adj.in_degree[dst], 1)
    else:
        w = np.ones(src.size, np.float32)
    e_pad = pad_to(src.size, pad_multiple)
    pad = e_pad - src.size
    if pad:
        src = np.concatenate([src, np.zeros(pad, np.int32)])
        # padding dst = v-1 keeps the CSC edge list ASCENDING end to end, so
        # segment reductions can run with indices_are_sorted=True (weight 0
        # still contributes nothing wherever the padding points)
        dst = np.concatenate([dst, np.full(pad, v - 1, np.int32)])
        w = np.concatenate([w, np.zeros(pad, np.float32)])
    return src, dst, w.astype(np.float32)


def csr_order(src: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv_perm) putting the CSC edge list into CSR (src-sorted)
    order.  Computed ONCE at graph build — the static analogue of the
    reference's csc_to_csr (coocsc.hpp:82) — so the backward scatter can run
    as a sorted segment sum (see ops/segment.spmm_coo_csc).  Uses the native
    O(E) OpenMP counting sort (numpy argsort is the measured CSC-build
    bottleneck at scale, docs/PERF.md)."""
    from ..sampler.native import stable_argsort

    key_range = int(src.max()) + 1 if src.size else 1
    perm = stable_argsort(src, key_range)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def full_forward(
    params: GNNParams,
    family: str,
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    w_edge: jax.Array,
    num_vertices: int,
    aggregator: str = "sum",
    heads: int = 1,
    batch_norm: bool = False,
    drop_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    csr: Optional[Tuple[jax.Array, jax.Array]] = None,
    fwd_sorted: bool = False,
    x_scale: Optional[jax.Array] = None,
    planner: Optional[SpmmPlanner] = None,
    mxu=None,
    mxu_gat=None,
) -> jax.Array:
    """L-layer whole-graph forward (GCN/SAGE via SpMM; GAT via COO softmax).

    mxu: optional (ops, statics) pair routing the STATIC-weight SpMMs
    (the GCN/SAGE weighted-sum aggregations, NOT GAT's attention weights
    or the min/max reductions) through the one-hot MXU kernel
    (ops/pallas/mxu_spmm.py — measured 5.4 vs 15.1 ns/edge on the
    windowed XLA path at Reddit scale).  `ops` is the 10-tuple of traced
    plan arrays (pass them as jit ARGUMENTS — closing over them embeds
    hundreds of MB of constants in the compile payload), `statics` the
    (fwd, bwd) MxuSpmmStatic pair.  The plan bakes the same edge weights
    `w_edge` carries; callers are responsible for building it from the
    identical arrays (FullBatchTrainer does).

    csr: optional (perm, inv_perm) from `csr_order` — requires `dst`
    ascending (build_coo order).  Routes the SpMMs through the
    double-sorted segment-sum path (ops/segment.spmm_coo_csc).

    aggregator "min"/"max" (AGGREGATOR cfg key) replaces the weighted-sum
    SpMM with the elementwise extreme over each destination's in-edge
    messages — reference SingleCPUDstAggregateOpMin/Max
    (ntsSingleCPUGraphOp.hpp) / DistAggregateDstMin/Max
    (ntsDistCPUGraphOp.hpp); autodiff routes the cotangent to the
    arg-extreme edge (the reference's subgradient convention).

    batch_norm: the BATCH_NORM cfg key (GraphSegment.cpp:323 — the
    reference parses and prints it but never consumes it; implemented for
    real here): standardize each hidden layer's activations per feature
    over the full vertex axis before relu.  Whole-graph "batch" statistics
    are deterministic (the batch IS the graph), so this needs no running
    state and train/eval see identical normalization.
    """
    from ..ops.reductions import segment_max_coo, segment_min_coo

    def bn(t):
        if not batch_norm:
            return t
        t32 = t.astype(jnp.float32)  # stats in f32 even for bf16 compute
        mu = jnp.mean(t32, axis=0, keepdims=True)
        var = jnp.var(t32, axis=0, keepdims=True)
        return ((t32 - mu) * jax.lax.rsqrt(var + BN_EPS)).astype(t.dtype)

    if x.dtype == jnp.int8:
        # FEATURE_DTYPE:int8 whole-graph storage (data/quant.py): the
        # per-COLUMN dequant diag(x_scale) commutes with the layer-0
        # matmul every family performs (transform-first / GAT's X·W /
        # min-max's X·W) AND with the agg-first SpMM (aggregation is
        # linear in x), so fold the scales into W0 once and feed the raw
        # int8 levels as floats — no [V, F]-sized dequant multiply.
        assert x_scale is not None, "int8 features need x_scale"
        w0 = params.weights[0] * x_scale.astype(
            params.weights[0].dtype)[:, None]
        params = params._replace(weights=(w0,) + tuple(params.weights[1:]))
        x = x.astype(x_scale.dtype)
    h = x
    w_edge = w_edge.astype(x.dtype)  # bf16 compute when DTYPE:bfloat16
    n_layers = len(params.weights)
    train_drop = drop_rate > 0.0 and dropout_key is not None
    dkeys = (jax.random.split(dropout_key, n_layers) if train_drop
             else [None] * n_layers)

    def drop(t, l):
        # DROP_RATE on hidden layers, dropout(relu(.)) like the sampled
        # models (models/gnn.py); eval passes omit dropout_key
        return dropout(dkeys[l], t, drop_rate, train_drop)

    valid = w_edge != 0
    sorted_dst = csr is not None or fwd_sorted

    def plan_for(t, live_factor=1):
        # host-side window plan (SpmmPlanner): chunked SpMMs accumulate into
        # bounded dst/src row windows — whole-graph cost stays linear in E
        # (reference dst-range chunk segments, core/GraphSegment.h:60)
        if planner is None or not sorted_dst:
            return None
        return planner.plan(t.shape[-1], live_factor)

    def agg(t, wgt):
        if csr is not None:
            return spmm_coo_csc(t, src, dst, wgt, csr[0], csr[1],
                                num_vertices, plan_for(t))
        if fwd_sorted:  # inference paths: dst ascending, no grads taken
            return spmm_coo_fwd_sorted(t, src, dst, wgt, num_vertices,
                                       plan_for(t))
        return spmm_coo(t, src, dst, wgt, num_vertices)

    def agg_static(t):
        # static-weight aggregation (weights == w_edge, baked in the plan)
        if mxu is not None and t.shape[-1] <= 128:
            from ..ops.pallas.mxu_spmm import mxu_spmm, mxu_spmm_fwd

            ops, statics = mxu
            if len(statics) == 1:  # forward-only plan (serving passes)
                return mxu_spmm_fwd(t, *ops, statics[0])
            return mxu_spmm(t, *ops, *statics)
        return agg(t, w_edge)

    for l in range(n_layers):
        wl = params.weights[l].astype(h.dtype)
        if aggregator in ("min", "max") and family != "gat":
            ht = jnp.dot(h, wl, preferred_element_type=h.dtype)
            red = segment_min_coo if aggregator == "min" else segment_max_coo
            h = red(ht, src, dst, valid, num_vertices,
                    indices_are_sorted=sorted_dst, plan=plan_for(ht))
            h = (log_softmax(h.astype(jnp.float32))
                 if l == n_layers - 1
                 else drop(jax.nn.relu(bn(h)), l))
            continue
        if family == "gat":
            ht = jnp.dot(h, wl, preferred_element_type=h.dtype)
            f = ht.shape[-1]
            a_src = params.attn[l][:f, 0].astype(ht.dtype)
            a_dst = params.attn[l][f:, 0].astype(ht.dtype)
            hh = 1 if l == n_layers - 1 else heads  # logits stay 1-head
            # Gather-free attention (sorted paths with a planner): the
            # per-dst score half broadcasts via telescoping scatter+cumsum
            # (11.7 vs 92 ms at 11.9M edges), the exponential is max-free
            # (attention_exp clamp — kills a 114 ms segment_max and a
            # 92 ms [E] broadcast-back), and normalization moves OFF the
            # edge axis: aggregate UNNORMALIZED, divide by the per-dst
            # weight sum z afterwards (a [V]-divide replaces a 92 ms z[dst]
            # gather + [E] divide).  Measured: whole GAT layer 971→279 ms
            # at Reddit scale (docs/PERF.md round-3 GAT serving profile).
            fast_att = planner is not None and sorted_dst and hasattr(
                planner, "softmax_starts")
            if fast_att:
                att_starts = planner.softmax_starts()

            # One-hot MXU attention tier (ops/pallas/mxu_gat.py): weights
            # computed IN-KERNEL from per-vertex score tables — the whole
            # attention layer (score gathers + softmax-weighted SpMM + z)
            # collapses into one kernel pass per layer.
            # mxu_gat = (ops, static) with a single static → forward-only
            # plan (serving/eval); (ops8, (fwd_static, bwd_static)) →
            # TRAINABLE pair (mxu_gat_train's two-pass kernel backward).
            # Arrays are jit ARGUMENTS like `mxu`'s.
            if (mxu_gat is not None and f <= 128 and hh <= 8
                    and f % hh == 0):
                gops, gstatic = mxu_gat
                if len(gops) == 8:      # trainable pair (fwd + bwd plans)
                    from ..ops.pallas.mxu_gat import mxu_gat_train

                    h = mxu_gat_train(ht, a_src, a_dst, *gops,
                                      gstatic[0], gstatic[1], hh)
                else:
                    from ..ops.pallas.mxu_gat import mxu_gat_aggregate

                    h = mxu_gat_aggregate(ht, a_src, a_dst, *gops,
                                          gstatic, heads=hh)
                h = jax.nn.relu(h if l == n_layers - 1 else bn(h))
                if l == n_layers - 1:
                    h = log_softmax(h.astype(jnp.float32))
                else:
                    h = drop(h, l)
                continue

            def dst_half(vec_v):  # [V] per-dst score half → [E]
                if fast_att:
                    return broadcast_dst_sorted(vec_v, att_starts,
                                                src.shape[0],
                                                out_dtype=ht.dtype)
                return vec_v[dst]

            def z_of(u):  # exact per-dst normalizer (scatter segment sum)
                return jax.ops.segment_sum(
                    u.astype(jnp.float32), dst, num_segments=num_vertices,
                    indices_are_sorted=sorted_dst)

            # z can ride the aggregation as a FREE ones-column whenever
            # F+1 stays inside the same 128-lane tile (the [E, F] message
            # temps move identical HBM bytes) — kills the remaining 111 ms
            # scalar segment_sum on narrow layers (the F=41 logits layer,
            # and every multi-head block: fh=32→33 pads to 128 either way)
            def z_rides_free(width):
                return _eff_feat(width + 1) == _eff_feat(width)

            def norm(hagg, z):  # divide-after-aggregation, f32 then back
                z = jnp.maximum(z, jnp.finfo(jnp.float32).tiny)
                z = z.reshape(z.shape + (1,) * (hagg.ndim - z.ndim))
                return (hagg.astype(jnp.float32) / z).astype(ht.dtype)

            if hh > 1:
                # HEAD-MAJOR [H, E] scores/attention: an edge-major [E, H]
                # f32 array tile-pads its minor dim 4→128 (measured 5.67 GB
                # per temp at 11.9M edges — whole-graph 4-head serving
                # OOM'd a 16 GB chip); [H, E] keeps E minor and pads only
                # H→8.  See ops/segment.py "HEAD-MAJOR" block.
                fh = f // hh
                ht_h = ht.reshape(-1, hh, fh)
                a_s_h = a_src.reshape(hh, fh)
                a_d_h = a_dst.reshape(hh, fh)
                z_free = fast_att and z_rides_free(fh)
                atts, zs = [], []
                # src-half scores: ONE lane-padded row gather of the
                # packed [V, hh] table replaces hh scalar gathers
                # (~4x92 -> ~131 ms at Reddit scale for 4 heads;
                # ops/segment.gather_rows_hm) — dst halves stay per-head
                # (broadcast_dst_sorted at 11.7 ms/head is cheaper than a
                # second row gather)
                s_packed = None
                if hh >= 2:
                    s_all = jnp.einsum("vhf,hf->vh", ht_h, a_s_h)
                    s_packed = gather_rows_hm(
                        s_all, src,
                        planner.plan(128) if planner is not None and
                        sorted_dst else None)
                for i in range(hh):  # per-head 1-D [E] arrays throughout
                    src_half = (s_packed[i] if s_packed is not None
                                else (ht_h[:, i, :] @ a_s_h[i])[src])
                    sc = jax.nn.leaky_relu(
                        src_half
                        + dst_half(ht_h[:, i, :] @ a_d_h[i]), 0.2)
                    if fast_att:
                        u = attention_exp(sc, valid)
                        atts.append(u)
                        if not z_free:
                            zs.append(z_of(u))
                    else:
                        atts.append(segment_softmax_coo(
                            sc, dst, valid, num_vertices,
                            indices_are_sorted=sorted_dst))
                fh_x = fh + 1 if z_free else fh
                if z_free:  # per-head ones-column: z_i rides head block i
                    ones = jnp.ones(ht_h.shape[:2] + (1,), ht.dtype)
                    x_hm = jnp.concatenate([ht_h, ones], axis=2).reshape(
                        -1, hh * fh_x)
                else:
                    x_hm = ht
                hm_plan = (planner.plan_hm(fh_x)
                           if planner is not None and sorted_dst else None)
                h = spmm_coo_multihead_hm(
                    x_hm, src, dst, jnp.stack(atts), num_vertices,
                    indices_are_sorted=sorted_dst, plan=hm_plan,
                    perm=csr[0] if csr is not None else None,
                    inv_perm=csr[1] if csr is not None else None,
                )
                if z_free:
                    h3 = h.reshape(-1, hh, fh_x)
                    h = norm(h3[:, :, :fh],
                             h3[:, :, fh].astype(jnp.float32)).reshape(-1, f)
                elif fast_att:
                    h = norm(h.reshape(-1, hh, fh),
                             jnp.stack(zs, axis=1)).reshape(-1, f)
            else:
                # per-VERTEX score halves first ([V,F]·[F] matvecs), then
                # SCALAR per-edge gathers — 4 B instead of 4·F B per edge
                # (the whole-graph pass has no per-edge [E, F'] temps left
                # outside the attention SpMM itself); the backward is a
                # scalar [E]→[V] scatter-add, far lighter than the VJP of
                # two [E, F'] row gathers
                ha_s = ht @ a_src
                ha_d = ht @ a_dst
                score = jax.nn.leaky_relu(ha_s[src] + dst_half(ha_d), 0.2)
                if fast_att:
                    # z stays a separate scalar segment_sum here: measured
                    # 0.803 s vs 0.827 s for the ones-column variant at
                    # Reddit scale — on the single-head path XLA already
                    # overlaps the scalar scatter with the row scatter,
                    # while the +1 column re-copies [V, F] (docs/PERF.md)
                    u = attention_exp(score, valid)
                    h = norm(agg(ht, u), z_of(u))
                else:
                    att = segment_softmax_coo(score, dst, valid,
                                              num_vertices,
                                              indices_are_sorted=sorted_dst)
                    h = agg(ht, att)
            h = jax.nn.relu(h if l == n_layers - 1 else bn(h))
            if l == n_layers - 1:
                h = log_softmax(h.astype(jnp.float32))
            else:
                h = drop(h, l)
        else:
            if wl.shape[0] > wl.shape[1]:  # transform-first (see models/gnn)
                h = agg_static(
                    jnp.dot(h, wl, preferred_element_type=h.dtype))
            else:
                h = jnp.dot(
                    agg_static(h), wl,
                    preferred_element_type=h.dtype,
                )
            if l == n_layers - 1:
                h = log_softmax(h.astype(jnp.float32))
            else:
                h = drop(jax.nn.relu(bn(h)), l)
    return h


class FullBatchTrainer:
    """Whole-graph training engine; optional vertex-sharded multi-chip mode."""

    def __init__(
        self,
        cfg: RunConfig,
        dataset: Dataset,
        family: str = "gcn",
        weight_kind: WeightKind = WeightKind.GCN,
        mesh=None,
        adj: Optional[Adjacency] = None,
        halo: str = "all_gather",  # or "targeted" (all_to_all mirror rows)
        aggregator: Optional[str] = None,  # None → cfg.aggregator
    ) -> None:
        self.cfg = cfg
        self.dataset = dataset
        self.family = family
        self.aggregator = (
            aggregator if aggregator is not None
            else getattr(cfg, "aggregator", "sum")
        ).lower()
        self.adj = adj or Adjacency.from_edges(dataset.edges, dataset.num_vertices)
        self.weight_kind = weight_kind
        wk = WeightKind.NONE if family == "gat" else weight_kind
        src, dst, w = build_coo(self.adj, wk)
        self.mesh = mesh
        self.compute_dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                              else jnp.float32)
        # FEATURE_DTYPE:int8 (data/quant.py): store the whole-graph x
        # quantized — 4x the f32 rows per HBM byte; full_forward folds the
        # per-column scales into W0
        fd = (cfg.feature_dtype or cfg.dtype).lower()
        self.feature_int8 = fd == "int8"
        self.x_scale = None
        if mesh is None:  # sharded init replaces these with padded copies
            if self.feature_int8:
                from ..data.quant import quantize_columns

                q, scale = quantize_columns(dataset.features)
                self.x = jnp.asarray(q)
                self.x_scale = jnp.asarray(scale, dtype=self.compute_dtype)
            else:
                self.x = jnp.asarray(dataset.features,
                                     dtype=self.compute_dtype)
            self.y = jnp.asarray(dataset.labels.astype(np.int32))
            self.train_mask = jnp.asarray(dataset.masks == MASK_TRAIN)
            self.val_mask = jnp.asarray(dataset.masks == MASK_VAL)
            self.test_mask = jnp.asarray(dataset.masks == MASK_TEST)
        self.params = init_model(
            jax.random.PRNGKey(cfg.seed), family, cfg.layer_sizes
        )
        self._dropout_key = jax.random.PRNGKey(cfg.seed + 7919)
        # OPTIMIZER cfg key (adam | sgd), bias-corrected like the CPU
        # engines' learnC2C_with_decay_Adam (NtsScheduler.hpp:863)
        self.optimizer = make_optimizer(cfg, bias_correction=True)
        self.opt_state = self.optimizer.init(self.params)
        halo = (halo or "all_gather").lower()
        if halo not in ("all_gather", "targeted"):
            raise ValueError(
                f"HALO must be 'all_gather' or 'targeted', got {halo!r}"
            )
        self.halo = halo
        if mesh is None:
            self.src, self.dst, self.w = (
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
            )
            # static CSR-order permutation → sorted segment sums in both
            # SpMM directions (measured win over scatter-add, docs/PERF.md)
            perm, inv = csr_order(src)
            self.perm, self.inv_perm = jnp.asarray(perm), jnp.asarray(inv)
            # host-side window planner: chunked SpMMs accumulate into
            # bounded dst/src row windows, keeping whole-graph epochs
            # linear in E (the reference's CSC_segment_pinned dst-range
            # chunks, core/GraphSegment.h:60 / graph.hpp:67)
            v = self.adj.num_vertices
            self.planner = SpmmPlanner(dst, src[perm], num_src=v, num_dst=v,
                                       e_real=self.adj.num_edges)
            # one-hot MXU SpMM tile plan (ops/pallas/mxu_spmm.py): routes
            # the static-weight aggregations around XLA's ~15 ns/edge
            # random-access floor (measured 5.4 ns/edge at Reddit scale).
            # auto: TPU + bf16 + weighted-sum families only — GAT's
            # attention weights are dynamic and min/max are not SpMMs.
            self.mxu_pair = None
            self.mxu_gat_pair = None
            mode = getattr(cfg, "mxu_spmm", "auto").lower()
            auto_on = (mode == "on" or (
                mode != "off" and jax.default_backend() == "tpu"
                and self.compute_dtype == jnp.bfloat16))
            if family != "gat" and self.aggregator == "sum" and auto_on:
                from ..ops.pallas.mxu_spmm import build_mxu_spmm_pair_auto

                self.mxu_pair = build_mxu_spmm_pair_auto(
                    src[: self.adj.num_edges], dst[: self.adj.num_edges],
                    w[: self.adj.num_edges], v, v)
            elif family == "gat" and auto_on:
                # TRAINABLE kernel-tier attention (ops/pallas/mxu_gat.py):
                # forward + the two-pass kernel backward — one kernel
                # family for all three model families, GAT included
                # (reference parity: ntsCUDADistKernel.cuh:319-441)
                from ..ops.pallas.mxu_gat import build_mxu_gat_pair_auto

                self.mxu_gat_pair = build_mxu_gat_pair_auto(
                    src[: self.adj.num_edges], dst[: self.adj.num_edges],
                    v, v)
            self._step = self._build_single_step()
        else:
            self._init_sharded(src, dst, w)

    # ------------------------------------------------------------- singles
    def _build_single_step(self):
        family, v = self.family, self.adj.num_vertices
        optimizer = self.optimizer
        aggregator = self.aggregator
        heads = self.cfg.heads
        use_bn = bool(getattr(self.cfg, "batch_norm", False))
        drop_rate = float(self.cfg.drop_rate)
        xs = self.x_scale  # [F] or None — small enough to close over
        planner = self.planner  # host object; contributes only static ints
        mxu_statics = (None if self.mxu_pair is None else
                       (self.mxu_pair.fwd.static, self.mxu_pair.bwd.static))
        gat_statics = (None if self.mxu_gat_pair is None else
                       self.mxu_gat_pair.statics)
        clean_metrics = getattr(self.cfg, "metrics", "clean") != "train"

        @jax.jit
        def step(params, opt_state, x, y, mask, src, dst, w, perm, invp,
                 mxu_ops, gat_ops, dkey):
            csr = (perm, invp)
            mxu = None if mxu_ops is None else (mxu_ops, mxu_statics)
            mxu_gat = (None if gat_ops is None
                       else (gat_ops, gat_statics))

            def loss_fn(p):
                logp = full_forward(p, family, x, src, dst, w, v,
                                    aggregator=aggregator, heads=heads,
                                    batch_norm=use_bn, drop_rate=drop_rate,
                                    dropout_key=dkey, csr=csr, x_scale=xs,
                                    planner=planner, mxu=mxu,
                                    mxu_gat=mxu_gat)
                return nll_loss_masked(logp, y, mask), logp

            (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_p, new_o = optimizer.update(grads, opt_state, params)
            if drop_rate > 0.0 and clean_metrics:
                # METRICS:clean — an extra dropout-free forward for exact
                # accuracies; METRICS:train reuses the training logp (the
                # reference's accounting: getCorrect on the SAME X the
                # loss used, GCN_SAMPLE_ALLGPU.hpp:361 — saves a full
                # forward per epoch)
                logp = full_forward(params, family, x, src, dst, w, v,
                                    aggregator=aggregator, heads=heads,
                                    batch_norm=use_bn, csr=csr, x_scale=xs,
                                    planner=planner, mxu=mxu,
                                    mxu_gat=mxu_gat)
            pred = jnp.argmax(logp, axis=-1)
            return new_p, new_o, loss, pred

        return step

    def _mxu_ops(self):
        """The 10 traced plan arrays, or None — passed as step ARGUMENTS
        (closing over them would embed them as compile-payload constants;
        the tunneled compile service rejects such requests outright)."""
        if getattr(self, "mxu_pair", None) is None:
            return None
        p = self.mxu_pair
        return (*p.fwd.operands, p.fwd.meta, *p.bwd.operands, p.bwd.meta)

    def _mxu_gat_ops(self):
        """The 8 traced attention-plan arrays, or None (same argument
        discipline as _mxu_ops)."""
        if getattr(self, "mxu_gat_pair", None) is None:
            return None
        return self.mxu_gat_pair.operands

    # ------------------------------------------------------------- sharded
    def _init_sharded(self, src, dst, w):
        from .. import parallel
        from ..parallel.halo import shard_graph
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        import functools

        n = int(np.prod(self.mesh.devices.shape))
        w_real = np.asarray(w[: self.adj.num_edges])
        # PARTITION_BALANCE cfg key: "degree" (default — tune_chunks-style
        # α·V+E balancing, graph.hpp:1837) or "equal" (round-2 behavior)
        balance = getattr(self.cfg, "partition_balance", "degree")
        self.sharded = shard_graph(self.adj, n, w_real, balance=balance)
        self.targeted = None
        if self.halo == "targeted":
            from ..parallel.halo import build_targeted_halo

            self.targeted = build_targeted_halo(self.adj, n, w_real,
                                                balance=balance)
        rows = self.sharded.rows_per_shard
        v = self.adj.num_vertices
        vpad = rows * n
        slot_of_vertex = self.sharded.slot_of_vertex
        # worst-shard dst/src window plans → the shard-local chunked SpMMs
        # accumulate into bounded row windows (same linearity-in-E property
        # as the single-device planner; ops/segment.ShardedSpmmPlanner)
        from ..ops.segment import ShardedSpmmPlanner

        sg = self.sharded
        e_real_p = (np.asarray(sg.weight) != 0).sum(axis=1)
        self.shard_planner = ShardedSpmmPlanner(
            np.asarray(sg.dst_local),
            np.take_along_axis(np.asarray(sg.src), np.asarray(sg.perm), 1),
            num_src=vpad, num_dst=rows, e_real=e_real_p,
        )
        if self.targeted is not None:
            t = self.targeted
            self.shard_planner = ShardedSpmmPlanner(
                np.asarray(t.dst_local),
                np.take_along_axis(np.asarray(t.src_local),
                                   np.asarray(t.perm), 1),
                num_src=t.rows_per_shard + n * t.halo_pad, num_dst=rows,
                e_real=(np.asarray(t.weight) != 0).sum(axis=1),
            )
        # lay vertex-indexed arrays out in SLOT space (see ShardedGraph):
        # shard p's owned range lands at rows [p·rows, p·rows+size_p)
        # Multi-process: keep vertex arrays host-side numpy — the multihost
        # runner slices each process's row block before any device upload
        # (a full-graph device copy per process would defeat the memory
        # point of partitioning).  Single process: upload once here.
        to_dev = jnp.asarray if jax.process_count() == 1 else (lambda a: a)

        def padv(a, fill=0):
            out = np.full((vpad, *a.shape[1:]), fill, dtype=a.dtype)
            out[slot_of_vertex] = np.asarray(a)
            return to_dev(out)

        if self.feature_int8:
            # int8 shards: 4x the f32 rows per HBM byte AND 4x less halo
            # traffic for layer 0's agg-first case; the shard-local forward
            # folds the per-column scales into W0 (same rule as
            # full_forward)
            from ..data.quant import quantize_columns

            q, scale = quantize_columns(np.asarray(self.dataset.features))
            self.x = padv(q)
            self.x_scale = jnp.asarray(scale, dtype=self.compute_dtype)
        else:
            self.x = padv(np.asarray(self.dataset.features,
                                     dtype=self.compute_dtype))
        self.y = padv(self.dataset.labels.astype(np.int32))
        self.train_mask = padv(np.asarray(self.dataset.masks == MASK_TRAIN))
        self.val_mask = padv(np.asarray(self.dataset.masks == MASK_VAL))
        self.test_mask = padv(np.asarray(self.dataset.masks == MASK_TEST))
        family = self.family
        optimizer = self.optimizer
        n_layers = len(self.params.weights)
        aggregator = self.aggregator
        heads = self.cfg.heads
        use_bn = bool(getattr(self.cfg, "batch_norm", False))
        v_real = v
        drop_rate = float(self.cfg.drop_rate)
        xs = self.x_scale  # [F] per-column scales or None (small capture)
        shard_planner = self.shard_planner  # host object → static ints only

        halo_mode = self.halo

        def _forward_local(p, dk, x, src, dstl, w_edge, sidx, perm, invp,
                           smeta, starts):
            """Shard-local L-layer forward (inside a shard_map body).

            Shared by the training step and the sharded predict program —
            returns this shard's [rows, classes] log-probs.  `dk=None`
            disables dropout (the eval/serving mode)."""
            from ..parallel.halo import (
                sharded_aggregate,
                sharded_aggregate_targeted,
                sharded_gat_layer,
            )

            if halo_mode == "targeted":
                def agg(h_):
                    return sharded_aggregate_targeted(
                        h_, sidx[0], src[0], dstl[0],
                        w_edge[0].astype(h_.dtype), perm[0], invp[0],
                        planner=shard_planner,
                    )
            else:
                def agg(h_):
                    return sharded_aggregate(
                        h_, src[0], dstl[0], w_edge[0].astype(h_.dtype),
                        perm[0], invp[0], planner=shard_planner,
                    )

            def fwd(p, dk):
                from ..ops.reductions import segment_max_coo, segment_min_coo
                from ..parallel.halo import targeted_halo_exchange

                dkeys = (jax.random.split(dk, n_layers)
                         if (drop_rate > 0.0 and dk is not None) else None)

                def drop(t, l):
                    # layout-invariant dropout: the keep mask is drawn for
                    # the FULL [V, F] array with the same key/shape as the
                    # single-device program (nn.functional.dropout), then
                    # each shard slices its own GLOBAL range (smeta carries
                    # the shard's range start — exact under both equal and
                    # degree-balanced ranges) — so sharded training is
                    # bit-equal to single-device training under dropout
                    if dkeys is None:
                        return t
                    keep = jax.random.bernoulli(
                        dkeys[l], 1.0 - drop_rate, (v_real, t.shape[1])
                    )
                    keep = jnp.pad(keep, ((0, vpad - v_real), (0, 0)))
                    local = jax.lax.dynamic_slice(
                        keep, (smeta[0, 0], 0),
                        (t.shape[0], t.shape[1]),
                    )
                    return jnp.where(
                        local, t / (1.0 - drop_rate), 0.0
                    ).astype(t.dtype)

                def bn(t):
                    # synchronized batch norm (BATCH_NORM cfg key): global
                    # per-feature statistics over the REAL vertices only
                    # (padding rows masked), psum'd across the graph axis —
                    # bit-matches the single-device full_forward stats
                    if not use_bn:
                        return t
                    # real rows of this shard = the first smeta[0,1] slots
                    m = (jnp.arange(t.shape[0]) < smeta[0, 1])[:, None]
                    # stats in f32: bf16 can neither count 233k vertices
                    # nor accumulate their sums without rounding away
                    t32 = t.astype(jnp.float32)
                    cnt = jnp.float32(v_real)
                    mu = jax.lax.psum(
                        jnp.sum(jnp.where(m, t32, 0), axis=0), "graph"
                    ) / cnt
                    d = jnp.where(m, t32 - mu, 0)
                    var = jax.lax.psum(jnp.sum(d * d, axis=0), "graph") / cnt
                    return ((t32 - mu) * jax.lax.rsqrt(var + BN_EPS)).astype(
                        t.dtype
                    )

                h = x
                if h.dtype == jnp.int8:
                    # FEATURE_DTYPE:int8 shards: fold diag(x_scale) into W0
                    # (commutes with every layer-0 branch below, incl. the
                    # halo-exchanged aggregation — it is linear in x)
                    w0 = p.weights[0] * xs.astype(p.weights[0].dtype)[:, None]
                    p = p._replace(weights=(w0,) + tuple(p.weights[1:]))
                    h = h.astype(xs.dtype)
                for l in range(n_layers):
                    wl = p.weights[l].astype(h.dtype)
                    if aggregator in ("min", "max") and family != "gat":
                        # DistAggregateDstMin/Max parity: min/max over
                        # in-edges is shard-local after the halo (edges are
                        # partitioned by destination owner)
                        ht = jnp.dot(h, wl, preferred_element_type=h.dtype)
                        if halo_mode == "targeted":
                            ext = targeted_halo_exchange(ht, sidx[0])
                        else:
                            ext = jax.lax.all_gather(
                                ht, "graph", axis=0, tiled=True
                            )
                        red = (segment_min_coo if aggregator == "min"
                               else segment_max_coo)
                        h = red(ext, src[0], dstl[0], w_edge[0] != 0,
                                h.shape[0], indices_are_sorted=True,
                                plan=shard_planner.plan(ext.shape[1]))
                        h = (log_softmax(h.astype(jnp.float32))
                             if l == n_layers - 1
                             else drop(jax.nn.relu(bn(h)), l))
                        continue
                    if family == "gat":
                        # distributed attention (DistEdgeSoftMax parity):
                        # dst-partitioned edges make the softmax shard-local
                        h = sharded_gat_layer(
                            h, wl, p.attn[l].astype(h.dtype), src[0],
                            dstl[0],
                            w_edge[0] != 0,
                            send_idx=sidx[0] if halo_mode == "targeted"
                            else None,
                            heads=1 if l == n_layers - 1 else heads,
                            perm=perm[0], inv_perm=invp[0],
                            planner=shard_planner,
                            att_starts=starts[0],
                        )
                        h = jax.nn.relu(h if l == n_layers - 1 else bn(h))
                        if l == n_layers - 1:
                            h = log_softmax(h.astype(jnp.float32))
                        else:
                            h = drop(h, l)
                        continue
                    if wl.shape[0] > wl.shape[1]:
                        h = agg(
                            jnp.dot(h, wl, preferred_element_type=h.dtype)
                        )
                    else:
                        h = jnp.dot(
                            agg(h), wl, preferred_element_type=h.dtype,
                        )
                    h = (log_softmax(h.astype(jnp.float32))
                         if l == n_layers - 1
                         else drop(jax.nn.relu(bn(h)), l))
                return h

            return fwd(p, dk)

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(), P("graph"), P("graph"), P("graph"),
                      P("graph"), P("graph"), P("graph"), P("graph"),
                      P("graph"), P("graph"), P("graph"), P("graph"), P()),
            out_specs=(P(), P(), P(), P("graph")),
        )
        def step(params, opt_state, x, y, mask, src, dstl, w_edge, sidx,
                 perm, invp, smeta, starts, dkey):
            def fwd(p, dk):
                h = _forward_local(p, dk, x, src, dstl, w_edge, sidx,
                                   perm, invp, smeta, starts)
                # masked NLL over the local shard, reduced globally
                picked = jnp.take_along_axis(
                    h, y[:, None].astype(jnp.int32), axis=1
                )[:, 0]
                local_sum = jnp.sum(jnp.where(mask, -picked, 0.0))
                local_n = jnp.sum(mask)
                total = jax.lax.psum(local_sum, "graph")
                count = jax.lax.psum(local_n, "graph")
                return total / jnp.maximum(count, 1), h

            def loss_fn(p):
                return fwd(p, dkey)

            (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # the loss is already the GLOBAL mean (psummed above), so under
            # vma-typed JAX grads come back as the exact global gradient;
            # psum only per-shard partials (non-vma JAX) — utils/vma.py
            from ..utils.vma import psum_grads

            grads = psum_grads(grads, "graph", logp)
            new_p, new_o = optimizer.update(grads, opt_state, params)
            if drop_rate > 0.0:
                # metrics from a dropout-free forward (reference ctx->eval())
                _, logp = fwd(params, None)
            pred = jnp.argmax(logp, axis=-1)
            return new_p, new_o, loss, pred

        self._step = jax.jit(step)

        # Sharded serving program: the SAME shard-local forward without
        # dropout, log-probs returned still vertex-sharded over the mesh —
        # a graph that only fits partitioned across chips is served
        # partitioned (the single-device rebuild predict() used before
        # cannot exist for such graphs).
        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P("graph"), P("graph"), P("graph"), P("graph"),
                      P("graph"), P("graph"), P("graph"), P("graph"),
                      P("graph")),
            out_specs=P("graph"),
        )
        def predict_local(params, x, src, dstl, w_edge, sidx, perm, invp,
                          smeta, starts):
            return _forward_local(params, None, x, src, dstl, w_edge, sidx,
                                  perm, invp, smeta, starts)

        self._predict_step = jax.jit(predict_local)

    def _sharded_operands(self):
        """Edge operands for the sharded step/predict programs, in the
        (src, dst_local, weight, send_idx, perm, inv_perm, shard_meta,
        softmax_starts) argument order."""
        smeta = jnp.asarray(self.sharded.shard_meta)
        # per-shard first-edge positions (gather-free GAT attention, one
        # stacked static operand — passed as an operand rather than closed
        # over: this runtime rejects programs with large baked-in constants)
        starts = jnp.asarray(self.shard_planner.softmax_starts())
        if self.targeted is not None:
            t = self.targeted
            return (t.src_local, t.dst_local, t.weight, t.send_idx,
                    t.perm, t.inv_perm, smeta, starts)
        sidx = jnp.zeros(
            (int(np.prod(self.mesh.devices.shape)), 1, 1), jnp.int32
        )
        s = self.sharded
        return (s.src, s.dst_local, s.weight, sidx, s.perm, s.inv_perm,
                smeta, starts)

    # ---------------------------------------------------------------- run
    def train_epoch(self) -> Tuple[float, float, float, float]:
        self._dropout_key, dkey = jax.random.split(self._dropout_key)
        if self.mesh is None:
            self.params, self.opt_state, loss, pred = self._step(
                self.params, self.opt_state, self.x, self.y, self.train_mask,
                self.src, self.dst, self.w, self.perm, self.inv_perm,
                self._mxu_ops(), self._mxu_gat_ops(), dkey,
            )
        else:
            self.params, self.opt_state, loss, pred = self._step(
                self.params, self.opt_state, self.x, self.y, self.train_mask,
                *self._sharded_operands(), dkey,
            )
        correct = pred == self.y

        def acc(mask):
            m = np.asarray(mask)
            return float(np.asarray(correct)[m].mean()) if m.any() else 0.0

        return float(loss), acc(self.train_mask), acc(self.val_mask), acc(self.test_mask)

    # -------------------------------------------------- engine-surface ----
    # nid properties are GLOBAL vertex ids (the device-side mask/label
    # arrays live in slot layout when sharded — see ShardedGraph)
    @property
    def train_nids(self) -> np.ndarray:
        return self.dataset.nids_with_mask(MASK_TRAIN)

    @property
    def val_nids(self) -> np.ndarray:
        return self.dataset.nids_with_mask(MASK_VAL)

    @property
    def test_nids(self) -> np.ndarray:
        return self.dataset.nids_with_mask(MASK_TEST)

    def evaluate(self, nids: np.ndarray) -> float:
        """Exact whole-graph accuracy over the given vertex ids.

        Rides `predict()`: in sharded mode that is the vertex-sharded
        serving program over the mesh (each chip computes its own vertex
        range — no single-device rebuild), gathered to the host here only
        to index the requested ids."""
        nids = np.asarray(nids)
        if nids.size == 0:
            return 0.0
        pred = np.argmax(self.predict(), axis=-1)   # global vertex order
        labels = np.asarray(self.dataset.labels)
        return float((pred[nids] == labels[nids]).mean())

    def predict(self) -> np.ndarray:
        """Whole-graph [V, classes] log-probs via the trainer's OWN forward
        (same edge weights, AGGREGATOR, BATCH_NORM) — the serving surface
        the CLI --infer uses for *FULLBATCH checkpoints.

        Sharded mode runs the SHARDED forward over the mesh (each chip
        holds only its vertex range — a graph that only fits partitioned is
        also served partitioned; reference Dist* engines likewise evaluate
        through their distributed forward, ntsDistCPUGraphOp.hpp:34).
        Multi-process serving goes through run_multihost_fullbatch_epochs;
        this method handles the single-process meshes."""
        if self.mesh is not None and jax.process_count() == 1:
            logp = self._predict_step(
                self.params, self.x, *self._sharded_operands()
            )
            # slot layout → global vertex order (identity for equal ranges)
            return np.asarray(
                logp, dtype=np.float32
            )[self.sharded.slot_of_vertex]
        if self.mesh is None:
            src, dst, w = self.src, self.dst, self.w
            x = self.x
            planner = self.planner
        else:
            if not hasattr(self, "_eval_coo"):
                wk = (WeightKind.NONE if self.family == "gat"
                      else self.weight_kind)
                s_, d_, w_ = build_coo(self.adj, wk)
                v_ = self.adj.num_vertices
                # forward-only pass: only the dst windows matter (src spans
                # are computed on the unsorted src — unused here)
                self._eval_planner = SpmmPlanner(
                    d_, s_, num_src=v_, num_dst=v_,
                    e_real=self.adj.num_edges)
                self._eval_coo = (
                    jnp.asarray(s_), jnp.asarray(d_), jnp.asarray(w_)
                )
            src, dst, w = self._eval_coo
            planner = self._eval_planner
            # self.x is SLOT-layout padded; the unsharded forward (and
            # batch-norm statistics) needs the real vertices in GLOBAL order
            x = np.asarray(self.x)[self.sharded.slot_of_vertex]
        mxu_ops = self._mxu_ops() if self.mesh is None else None
        mxu = (None if mxu_ops is None else
               (mxu_ops, (self.mxu_pair.fwd.static,
                          self.mxu_pair.bwd.static)))
        gat_ops = self._mxu_gat_ops() if self.mesh is None else None
        mxu_gat = (None if gat_ops is None
                   else (gat_ops, self.mxu_gat_pair.statics))
        logp = full_forward(
            self.params, self.family, x, src, dst, w,
            self.adj.num_vertices, aggregator=self.aggregator,
            heads=self.cfg.heads,
            batch_norm=bool(getattr(self.cfg, "batch_norm", False)),
            x_scale=self.x_scale, fwd_sorted=True, planner=planner,
            mxu=mxu, mxu_gat=mxu_gat,
        )
        return np.asarray(logp, dtype=np.float32)

    def checkpoint_state(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "dropout_key": self._dropout_key}

    def load_checkpoint_state(self, state) -> None:
        self.params = jax.tree.map(lambda x: x, state["params"])
        self.opt_state = state["opt_state"]
        self._dropout_key = state["dropout_key"]

    def run(self, epochs: Optional[int] = None):
        epochs = epochs or self.cfg.epochs
        hist = []
        for ep in range(epochs):
            t0 = time.perf_counter()
            loss, tr, va, te = self.train_epoch()
            check_finite_loss(loss, ep, type(self).__name__)
            jax.block_until_ready(self.params.weights[0])
            dt = time.perf_counter() - t0
            hist.append(dict(loss=loss, train=tr, val=va, test=te, time=dt))
            log.info(
                "full epoch %d: loss %.5f train %.4f val %.4f test %.4f (%.3fs)",
                ep, loss, tr, va, te, dt,
            )
        return hist
