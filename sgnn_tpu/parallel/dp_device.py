"""Data-parallel fused training: device sampling sharded over the mesh.

Reference: *ALLMULTI engines = per-GPU samplers + NCCL AllReduce
(GCN_SAMPLE_ALL_MULTI.hpp).  Here each device of the "data" axis runs the
full on-device pipeline (sample → gather → fwd/bwd) on ITS seed shard with
the replicated graph/features, gradients psum over ICI, replicated Adam.
The whole epoch is a lax.scan inside shard_map — per epoch: one dispatch,
one psum per step riding ICI, zero host involvement.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gnn import model_forward
from ..nn.functional import masked_accuracy, nll_loss_masked
from ..sampler.device import device_sample_batch
from ..train.device_trainer import DeviceSampleTrainer
from ..train.guard import check_finite_loss
from ..train.trainer import TrainReport
from ..utils.logging import get_logger
from ..utils.vma import psum_grads

log = get_logger("sgnn.dpdev")


def _fetch_sharded_x0(features, batch, feat_scale=None, compute_dtype=None):
    """Assemble x0 from row-sharded features: ICI fetch + invalid-row mask.

    int8-sharded storage (FEATURE_DTYPE:int8): each shard holds quantized
    rows; fetched rows dequantize to `compute_dtype` with the per-column
    scales (data/quant.py) after the collective."""
    import dataclasses as _dc

    from .sharded_features import fetch_feature_rows

    b0 = batch.blocks[0]
    rows = fetch_feature_rows(features, b0.srcs)
    if feat_scale is not None:
        rows = rows.astype(compute_dtype) * feat_scale.astype(compute_dtype)
    x0 = jnp.where(b0.src_valid[:, None], rows, jnp.zeros((), rows.dtype))
    return _dc.replace(batch, x0=x0)


class DeviceDataParallelTrainer:
    """Wraps a DeviceSampleTrainer for DP over the mesh "data" axis."""

    def __init__(self, base: DeviceSampleTrainer, mesh: Optional[Mesh] = None,
                 shard_features: bool = False):
        from .mesh import make_mesh

        self.base = base
        self.mesh = mesh if mesh is not None else make_mesh(graph=1)
        self.n_dev = int(np.prod(self.mesh.devices.shape))
        self.timers = base.timers
        # SHARD_FEATURES: row-shard the feature matrix over the "data" axis
        # (each chip holds V/n rows; sampled rows fetched over ICI —
        # parallel/sharded_features.py, reference ntsPeerRPC capability).
        self.shard_features = shard_features
        if shard_features:
            vpad, f = base.dev_features.shape
            rows = -(-vpad // self.n_dev)
            total = rows * self.n_dev
            feats = base.dev_features
            if total > vpad:
                feats = jnp.concatenate(
                    [feats, jnp.zeros((total - vpad, f), feats.dtype)], axis=0
                )
            self.feat_rows = rows
            self.feat_sharded = feats
            # drop the replicated copy: train AND eval both run through
            # the sharded array (evaluate() has its own DP program)
            base.dev_features = None
        # programs cached per src-pad plan: per-device pads follow the
        # actual shard chunk (≤ batch_size), not the full batch size
        self._fn_cache = {}

    def _get_epoch_fn(self, src_pads):
        if src_pads not in self._fn_cache:
            self._fn_cache[src_pads] = self._build_dp_epoch(src_pads)
        return self._fn_cache[src_pads]

    def _build_dp_epoch(self, src_pads):
        base = self.base
        family, drop_rate = base.family, base.cfg.drop_rate
        heads = base.cfg.heads
        optimizer = base.optimizer
        fanouts = tuple(base.cfg.fanout)
        wk = base.weight_kind
        dm = base.dev_degree_mode
        fs, cd = base._feat_scale, base.compute_dtype
        remat = base.cfg.remat
        bn = base.cfg.batch_norm
        shard_feats = self.shard_features

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            # params/opt/graph replicated; seeds sharded over data; features
            # replicated OR row-sharded over data (SHARD_FEATURES)
            in_specs=(P(), P(), P(None, "data"), P(None, "data"), P("data"),
                      P(), P(), P(), P(),
                      P("data") if shard_feats else P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        )
        def epoch(params, opt_state, seeds_all, valid_all, keys,
                  indptr, indices, in_deg, out_deg, features, labels):
            # seeds_all: [n_steps, n_dev*B] sharded → local [n_steps, B]
            key = keys[0]

            def body(carry, xs):
                params, opt_state, key = carry
                seeds, valid = xs
                key, sk, dk = jax.random.split(key, 3)
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    degree_mode=dm, gather_features=not shard_feats,
                    feat_scale=None if shard_feats else fs,
                    compute_dtype=cd,
                )
                if shard_feats:
                    batch = _fetch_sharded_x0(features, batch, fs, cd)

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
                # reference NCCL AllReduce SUM parity; version-adaptive
                # (utils/vma.py) — vma-typed JAX already totals
                # replicated-param grads
                grads = psum_grads(grads, "data", loss)
                new_p, new_o = optimizer.update(grads, opt_state, params)
                acc = masked_accuracy(logp, batch.labels, batch.label_valid)
                n_edges = sum(jnp.sum(b.weight != 0) for b in batch.blocks)
                return (new_p, new_o, key), (loss, acc, n_edges)

            (params, opt_state, _), (losses, accs, edges) = jax.lax.scan(
                body, (params, opt_state, key), (seeds_all, valid_all)
            )
            # cross-device reductions for reporting
            loss = jax.lax.pmean(jnp.mean(losses), "data")
            acc = jax.lax.psum(jnp.sum(accs, axis=0), "data")
            e = jax.lax.psum(jnp.sum(edges), "data")
            return params, opt_state, loss, acc, e

        return jax.jit(epoch)

    # ------------------------------------------------------------------
    def _shard_seed_arrays(self, nids: np.ndarray):
        """Split nids across devices → ([n_steps, n_dev·pad] seeds/valid,
        src_pads for the chunk-sized plan).

        Per-device seed pad = the largest actual chunk (≤ batch_size):
        padding every device to the full batch size would multiply padded
        sampling/compute by n_dev at small scales."""
        from ..sampler.blocks import pad_to

        base = self.base
        shards = np.array_split(np.asarray(nids, np.int32), self.n_dev)
        bs = base.cfg.batch_size
        n_steps = max((len(s) + bs - 1) // bs for s in shards)
        chunk_max = max(min(bs, len(s)) for s in shards)
        seed_pad = pad_to(max(chunk_max, 1), 128)
        src_pads = (base.src_pads if seed_pad == base.seed_pad
                    else base.compute_src_pads(chunk_max))
        seeds_all = np.zeros((n_steps, self.n_dev, seed_pad), np.int32)
        valid_all = np.zeros((n_steps, self.n_dev, seed_pad), bool)
        for d, sh in enumerate(shards):
            for t in range(n_steps):
                chunk = sh[t * bs:(t + 1) * bs]
                seeds_all[t, d, : chunk.size] = chunk
                valid_all[t, d, : chunk.size] = True
        return (seeds_all.reshape(n_steps, -1),
                valid_all.reshape(n_steps, -1), src_pads)

    def _features_arg(self):
        return (self.feat_sharded if self.shard_features
                else self.base.dev_features)

    def train_epoch(self) -> Tuple[float, float, int]:
        base = self.base
        nids = self._epoch_nids()
        seeds_all, valid_all, src_pads = self._shard_seed_arrays(nids)
        epoch_fn = self._get_epoch_fn(src_pads)
        base._sample_key, key = jax.random.split(base._sample_key)
        keys = jax.random.split(key, self.n_dev)
        with self.timers.phase("dp_device_epoch"):
            (base.params, base.opt_state, loss, acc, edges) = epoch_fn(
                base.params, base.opt_state, jnp.asarray(seeds_all),
                jnp.asarray(valid_all), keys,
                base.dev_indptr, base.dev_indices, base.dev_in_deg,
                base.dev_out_deg, self._features_arg(), base.dev_labels,
            )
            acc_np = np.asarray(acc)
        return (
            float(loss),
            int(acc_np[0]) / max(int(acc_np[1]), 1),
            int(np.asarray(edges)),
        )

    def _epoch_nids(self):
        return self.base._epoch_order(self.base.train_nids)

    def _build_dp_eval(self, src_pads):
        base = self.base
        family, heads = base.family, base.cfg.heads
        bn = base.cfg.batch_norm
        fanouts = tuple(base.cfg.fanout)
        wk = base.weight_kind
        dm = base.dev_degree_mode
        fs, cd = base._feat_scale, base.compute_dtype
        shard_feats = self.shard_features

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(None, "data"), P(None, "data"), P("data"),
                      P(), P(), P(), P(),
                      P("data") if shard_feats else P(), P()),
            out_specs=P(),
        )
        def eval_epoch(params, seeds_all, valid_all, keys,
                       indptr, indices, in_deg, out_deg, features, labels):
            key = keys[0]

            def body(key, xs):
                seeds, valid = xs
                key, sk = jax.random.split(key)
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    degree_mode=dm, gather_features=not shard_feats,
                    feat_scale=None if shard_feats else fs,
                    compute_dtype=cd,
                )
                if shard_feats:
                    batch = _fetch_sharded_x0(features, batch, fs, cd)
                logp = model_forward(params, family, batch, train=False,
                                     heads=heads, batch_norm=bn)
                return key, masked_accuracy(
                    logp, batch.labels, batch.label_valid
                )

            _, accs = jax.lax.scan(body, key, (seeds_all, valid_all))
            return jax.lax.psum(jnp.sum(accs, axis=0), "data")

        return jax.jit(eval_epoch)

    def evaluate(self, nids):
        if not self.shard_features:
            return self.base.evaluate(nids)
        # sharded-feature mode has no replicated copy: evaluate through the
        # same DP + ICI-fetch program as training
        base = self.base
        nids = np.asarray(nids, np.int32)
        if nids.size == 0:
            return 0.0
        seeds_all, valid_all, src_pads = self._shard_seed_arrays(nids)
        key = ("eval", src_pads)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_dp_eval(src_pads)
        base._sample_key, k = jax.random.split(base._sample_key)
        keys = jax.random.split(k, self.n_dev)
        acc = np.asarray(self._fn_cache[key](
            base.params, jnp.asarray(seeds_all), jnp.asarray(valid_all),
            keys, base.dev_indptr, base.dev_indices, base.dev_in_deg,
            base.dev_out_deg, self._features_arg(), base.dev_labels,
        ))
        return int(acc[0]) / max(int(acc[1]), 1)

    def run(self, epochs: Optional[int] = None, eval_every: int = 1):
        import time

        base = self.base
        epochs = epochs if epochs is not None else base.cfg.epochs
        report = TrainReport([], [], [], [], [], [], self.timers,
                             time_skip=base.cfg.time_skip)
        for ep in range(epochs):
            t0 = time.perf_counter()
            loss, tr_acc, edges = self.train_epoch()
            check_finite_loss(loss, ep, type(self).__name__)
            dt = time.perf_counter() - t0
            report.epoch_times.append(dt)
            report.losses.append(loss)
            report.train_acc.append(tr_acc)
            report.edges_per_epoch.append(edges)
            if (ep + 1) % eval_every == 0 or ep == epochs - 1:
                va = (self.evaluate(base.val_nids)
                      if base.val_nids.size else 0.0)
                te = (self.evaluate(base.test_nids)
                      if base.test_nids.size else 0.0)
            else:
                va = report.val_acc[-1] if report.val_acc else 0.0
                te = report.test_acc[-1] if report.test_acc else 0.0
            report.val_acc.append(va)
            report.test_acc.append(te)
            log.info(
                "dp-device epoch %d (%d dev): loss %.5f train %.4f val %.4f "
                "time %.3fs",
                ep, self.n_dev, loss, tr_acc, va, dt,
            )
        return report


class DeviceCachedDataParallelTrainer(DeviceDataParallelTrainer):
    """*PCMULTI on the fast path: device-sampled DP + in-scan hot cache.

    Reference: GCN/GS/GAT_SAMPLE_PC_MULTI — PD-cache combined with multi-GPU
    data parallelism, the cache shared across devices (distributed by NCCL
    AllGather, core/ntsDataloador.hpp:735-762).  Here the cache plan is ONE
    global hot set (concurrent per-device streams, same discipline as the
    reference's multi-GPU cache engines); params are replicated, so every
    device recomputes the identical `agg @ W0` refresh at each super-batch
    boundary — a [C, F]·[F, H] matmul, far cheaper than a collective to
    share it.  Sampling omits cached destinations via the replicated omit
    map (sample_gpu_fast_omit parity), gradients psum over ICI.

    `base` must be a DeviceCachedSampleTrainer (built with per_sb=False).
    """

    def _build_dp_epoch(self, src_pads):
        base = self.base
        family, drop_rate = base.family, base.cfg.drop_rate
        heads = base.cfg.heads
        optimizer = base.optimizer
        fanouts = tuple(base.cfg.fanout)
        wk = base.weight_kind
        dm = base.dev_degree_mode
        fs, cd = base._feat_scale, base.compute_dtype
        remat = base.cfg.remat
        bn = base.cfg.batch_norm
        shard_feats = self.shard_features
        sb_steps = base.super_batch_steps

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(None, "data"), P(None, "data"),
                      P("data"), P(), P(), P(), P(),
                      P("data") if shard_feats else P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        )
        def epoch(params, opt_state, cache_emb, seeds_all, valid_all, keys,
                  indptr, indices, in_deg, out_deg, features, labels,
                  omit_map, cache_agg):
            key = keys[0]

            def refresh(w0):
                return jnp.dot(cache_agg.astype(jnp.float32), w0,
                               preferred_element_type=jnp.float32)

            def body(carry, xs):
                params, opt_state, cache_emb, step_i, key = carry
                seeds, valid = xs
                key, sk, dk = jax.random.split(key, 3)
                # super-batch boundary: republish the cache with current W0
                # (every device computes the identical replicated refresh)
                cache_emb = jax.lax.cond(
                    step_i % sb_steps == 0,
                    lambda: refresh(params.weights[0]),
                    lambda: cache_emb,
                )
                batch = device_sample_batch(
                    sk, seeds, valid, indptr, indices, in_deg, out_deg,
                    features, labels, fanouts, src_pads, wk,
                    omit_map=omit_map, degree_mode=dm,
                    gather_features=not shard_feats,
                    feat_scale=None if shard_feats else fs,
                    compute_dtype=cd,
                )
                if shard_feats:
                    batch = _fetch_sharded_x0(features, batch, fs, cd)

                def loss_fn(p):
                    logp = model_forward(
                        p, family, batch, drop_rate=drop_rate, train=True,
                        dropout_key=dk, cache_emb=cache_emb, remat=remat,
                        heads=heads, batch_norm=bn,
                    )
                    return (
                        nll_loss_masked(logp, batch.labels,
                                        batch.label_valid),
                        logp,
                    )

                (loss, logp), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                grads = psum_grads(grads, "data", loss)
                new_p, new_o = optimizer.update(grads, opt_state, params)
                acc = masked_accuracy(logp, batch.labels, batch.label_valid)
                hits = (jnp.sum(batch.cache_mask)
                        if batch.cache_mask is not None else 0)
                lookups = jnp.sum(batch.blocks[0].dst_valid)
                n_edges = sum(jnp.sum(b.weight != 0) for b in batch.blocks)
                return ((new_p, new_o, cache_emb, step_i + 1, key),
                        (loss, acc, n_edges, hits, lookups))

            init = (params, opt_state, cache_emb,
                    jnp.zeros((), jnp.int32), key)
            (params, opt_state, cache_emb, _, _), outs = jax.lax.scan(
                body, init, (seeds_all, valid_all)
            )
            losses, accs, edges, hits, lookups = outs
            loss = jax.lax.pmean(jnp.mean(losses), "data")
            acc = jax.lax.psum(jnp.sum(accs, axis=0), "data")
            e = jax.lax.psum(jnp.sum(edges), "data")
            h = jax.lax.psum(jnp.sum(hits), "data")
            lk = jax.lax.psum(jnp.sum(lookups), "data")
            return params, opt_state, cache_emb, loss, acc, e, h, lk

        return jax.jit(epoch)

    def _epoch_nids(self):
        from ..cache.hotness import super_batch_stable_shuffle

        base = self.base
        return super_batch_stable_shuffle(
            base.train_nids,
            base.cfg.batch_size * base.super_batch_steps,
            base.sampler.rng,
        )

    def train_epoch(self) -> Tuple[float, float, int]:
        base = self.base
        nids = self._epoch_nids()
        seeds_all, valid_all, src_pads = self._shard_seed_arrays(nids)
        epoch_fn = self._get_epoch_fn(src_pads)
        if base.cache.cache_emb is None:
            hidden = base.cfg.layer_sizes[1]
            base.cache.cache_emb = jnp.zeros(
                (base.cache.num_cached, hidden), jnp.float32
            )
        base._sample_key, key = jax.random.split(base._sample_key)
        keys = jax.random.split(key, self.n_dev)
        with self.timers.phase("dp_device_epoch"):
            (base.params, base.opt_state, base.cache.cache_emb, loss, acc,
             edges, hits, lookups) = epoch_fn(
                base.params, base.opt_state, base.cache.cache_emb,
                jnp.asarray(seeds_all), jnp.asarray(valid_all), keys,
                base.dev_indptr, base.dev_indices, base.dev_in_deg,
                base.dev_out_deg, self._features_arg(), base.dev_labels,
                base.cache_maps[0], base.cache_agg_all[0],
            )
            acc_np = np.asarray(acc)
        base.cache_hits = int(np.asarray(hits))
        base.cache_lookups = int(np.asarray(lookups))
        return (
            float(loss),
            int(acc_np[0]) / max(int(acc_np[1]), 1),
            int(np.asarray(edges)),
        )

    @property
    def cache_hit_rate(self) -> float:
        return self.base.cache_hit_rate
