"""Data-parallel training over a device mesh (multi-GPU engine parity).

Reference: GCN/GS/GAT *ALLMULTI/PCMULTI engines — train nids split per
device (GCN_SAMPLE_ALL_MULTI.hpp:564-575), per-device sampler/stream, NCCL
AllReduce SUM of gradients each step (Update :367-377 →
NCCL_Communicator::AllReduce cuda/ntsCUDA.hpp:160); multi-node uses
MPI_Allreduce (Parameter::all_reduce_to_gradient NtsScheduler.hpp:825).

TPU redesign: `shard_map` over the "data" mesh axis; each device computes
grads on its own sampled shard, grads are `psum`-reduced over ICI (exact
parity with the reference's SUM-reduce), and the replicated Adam update
runs per-device.  Host-side, one sampler stream per device feeds a stacked
[n_dev, ...] batch pytree; XLA overlaps the psum with backward compute.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.gnn import model_forward
from ..nn.functional import masked_accuracy, nll_loss_masked
from ..train.guard import check_finite_loss
from ..utils.logging import get_logger

log = get_logger("sgnn.dp")


def make_dp_step(family: str, drop_rate: float, optimizer, mesh: Mesh,
                 materialize=None, heads: int = 1, batch_norm: bool = False):
    """Build the jitted DP train step: per-device grads → psum → update.

    `materialize(batch, features, labels)` optionally gathers x0/labels from
    device-resident arrays inside the program (trainer._materialize).
    The returned step also accepts `cache_emb` (replicated hot-vertex cache,
    reference PC_MULTI: cache shards NCCL-AllGathered to every device,
    ntsDataloador.hpp:735-762 — on a mesh the replicated array plays that
    role); pass None when the cache is off.
    """

    def local_loss(params, batch, key, features, labels, cache_emb,
                   cache_rows, slot_map):
        if materialize is not None:
            batch = materialize(batch, features, labels, cache_rows, slot_map)

        def loss_fn(p):
            logp = model_forward(
                p, family, batch, drop_rate=drop_rate, train=True,
                dropout_key=key, cache_emb=cache_emb, heads=heads,
                batch_norm=batch_norm,
            )
            return nll_loss_masked(logp, batch.labels, batch.label_valid), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        acc = masked_accuracy(logp, batch.labels, batch.label_valid)
        return loss, grads, acc

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P("data"), P("data")),
    )
    def dp_step(params, opt_state, batch, key, features, labels, cache_emb,
                cache_rows, slot_map):
        # leading device axis has local extent 1 inside the shard
        local_batch = jax.tree.map(lambda x: x[0], batch)
        loss, grads, acc = local_loss(params, local_batch, key[0], features,
                                      labels, cache_emb, cache_rows, slot_map)
        # SUM-reduce like the reference's NCCL/MPI AllReduce (no averaging).
        # Version-adaptive (utils/vma.py): under vma-typed JAX the grads of
        # replicated params are ALREADY the cross-device total and a raw
        # psum would scale them by n_dev.
        from ..utils.vma import psum_grads

        grads = psum_grads(grads, "data", loss)
        new_params, new_opt = optimizer.update(grads, opt_state, params)
        return new_params, new_opt, loss[None], acc[None]

    return jax.jit(dp_step)


def stack_batches(batches):
    """Stack per-device batch pytrees along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


class DataParallelTrainer:
    """Wraps a SampleTrainer to run its model data-parallel over all devices.

    Seed-space split parity with the reference multi-GPU engines: the
    epoch's shuffled train nids are split contiguously across devices, each
    device samples and trains its own shard, gradients are summed.
    """

    def __init__(self, base, mesh: Optional[Mesh] = None) -> None:
        from .mesh import make_mesh
        from ..sampler.host import HostSampler

        self.base = base
        self.mesh = mesh if mesh is not None else make_mesh(graph=1)
        self.n_dev = int(np.prod(self.mesh.devices.shape))
        self.timers = base.timers
        # PC_MULTI composition: base may be a CachedSampleTrainer
        self.cached = hasattr(base, "cache")
        # One sampler STREAM per device (reference: one FastSampler per GPU,
        # GCN_SAMPLE_ALL_MULTI.hpp:564-575) — independent RNG per device so
        # worker threads sample concurrently (the native C++ sampler and
        # large numpy ops release the GIL).
        s0 = base.sampler
        # Per-device batch = the shard chunk each device actually trains on
        # (≤ cfg.batch_size) — padding every device to the full batch size
        # multiplies padded compute by n_dev at small scales for nothing.
        shard = -(-len(base.train_nids) // self.n_dev)  # ceil
        self.dev_batch = max(1, min(base.cfg.batch_size, shard))
        self.samplers = [
            HostSampler(
                base.adj, fanouts=base.cfg.fanout,
                batch_size=self.dev_batch, weight_kind=s0.weight_kind,
                degree_mode=s0.degree_mode, pad_multiple=s0.pad_multiple,
                exact=s0.exact, seed=base.cfg.seed + 101 * d + 1,
                use_native=s0.use_native,
            )
            for d in range(self.n_dev)
        ]
        self._dp_step = make_dp_step(
            base.family, base.cfg.drop_rate, base.optimizer, self.mesh,
            materialize=base._materialize, heads=base.cfg.heads,
            batch_norm=base.cfg.batch_norm,
        )

    # ------------------------------------------------------------------
    def _device_batches(self, nids: np.ndarray, shuffle: bool):
        """Yield stacked [n_dev, ...] batches, sampled CONCURRENTLY.

        Per-device sampler streams run on a thread pool, and step t+1's
        sampling is submitted before step t is yielded — so all device
        shards sample in parallel AND sampling overlaps the consumer's
        device step (the reference's per-GPU sampler threads + pipelined
        streams, GCN_SAMPLE_ALL_MULTI.hpp:564-620)."""
        import dataclasses as _dc
        from concurrent.futures import ThreadPoolExecutor

        base = self.base
        nids = np.asarray(nids, dtype=np.int32)
        if shuffle:
            nids = base.sampler.rng.permutation(nids)
        shards = np.array_split(nids, self.n_dev)
        bs = base.cfg.batch_size
        n_steps = max((len(s) + bs - 1) // bs for s in shards)

        def make(d: int, step: int):
            seeds = shards[d][step * bs:(step + 1) * bs]
            dummy = seeds.size == 0
            if dummy:
                seeds = np.zeros(1, dtype=np.int32)
            batch, ne = base._make_batch(seeds, sampler=self.samplers[d])
            if dummy:
                batch = _dc.replace(
                    batch, label_valid=jnp.zeros_like(batch.label_valid)
                )
                ne = 0
            return batch, ne

        # ONE single-worker executor per device: sampler streams are
        # stateful (rng, reindex scratch), so step t+1 for device d must
        # never run concurrently with step t on the SAME sampler — the
        # per-device queue serializes them while devices stay parallel.
        pools = [ThreadPoolExecutor(max_workers=1) for _ in range(self.n_dev)]
        try:
            futs = [pools[d].submit(make, d, 0) for d in range(self.n_dev)]
            for step in range(n_steps):
                nxt = (
                    [pools[d].submit(make, d, step + 1)
                     for d in range(self.n_dev)]
                    if step + 1 < n_steps else None
                )
                results = [f.result() for f in futs]
                per_dev = [b for b, _ in results]
                yield stack_batches(per_dev), sum(ne for _, ne in results)
                futs = nxt
        finally:
            for p in pools:
                p.shutdown(wait=False, cancel_futures=True)

    # ------------------------------------------------------------------
    def train_epoch(self) -> Tuple[float, float, int]:
        base = self.base
        losses, corrects, edges = [], [], 0
        if self.cached:
            base._cache_active = True
        try:
            for i, (batch, nedges) in enumerate(
                self._device_batches(base.train_nids, True)
            ):
                cache_emb = None
                if self.cached:
                    # super-batch boundary refresh (one version per SB, as in
                    # the single-chip orchestrator)
                    if i % max(base.cfg.pipeline_num, 1) == 0:
                        base._refresh_cache()
                    cache_emb = base.cache.cache_emb
                base._dropout_key, sub = jax.random.split(base._dropout_key)
                keys = jax.random.split(sub, self.n_dev)
                cache_rows, slot_map = (
                    base._cache_args() if base.feat_cache is not None
                    else (None, None)
                )
                with self.timers.phase("dp_train_step"):
                    base.params, base.opt_state, loss, acc = self._dp_step(
                        base.params, base.opt_state, batch, keys,
                        base.dev_features, base.dev_labels, cache_emb,
                        cache_rows, slot_map,
                    )
                # device-array accumulation: no host sync inside the loop so
                # async dispatch keeps the next step enqueued
                losses.append(jnp.mean(loss))
                corrects.append(jnp.sum(acc, axis=0))
                edges += nedges
        finally:
            if self.cached:
                base._cache_active = False
        if not losses:
            return 0.0, 0.0, 0
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        acc_sum = np.asarray(jnp.sum(jnp.stack(corrects), axis=0))
        return mean_loss, int(acc_sum[0]) / max(int(acc_sum[1]), 1), edges

    def evaluate(self, nids: np.ndarray) -> float:
        return self.base.evaluate(nids)

    def run(self, epochs: Optional[int] = None, eval_every: int = 1):
        """Same epoch-loop/reporting contract as SampleTrainer.run."""
        import time

        from ..train.trainer import TrainReport

        base = self.base
        epochs = epochs if epochs is not None else base.cfg.epochs
        report = TrainReport([], [], [], [], [], [], self.timers,
                             time_skip=base.cfg.time_skip)
        for ep in range(epochs):
            t0 = time.perf_counter()
            loss, tr_acc, edges = self.train_epoch()
            check_finite_loss(loss, ep, type(self).__name__)
            jax.block_until_ready(base.params.weights[0])
            dt = time.perf_counter() - t0
            report.epoch_times.append(dt)
            report.losses.append(loss)
            report.train_acc.append(tr_acc)
            report.edges_per_epoch.append(edges)
            if (ep + 1) % eval_every == 0 or ep == epochs - 1:
                va = (base.evaluate(base.val_nids)
                      if base.val_nids.size else 0.0)
                te = (base.evaluate(base.test_nids)
                      if base.test_nids.size else 0.0)
            else:
                va = report.val_acc[-1] if report.val_acc else 0.0
                te = report.test_acc[-1] if report.test_acc else 0.0
            report.val_acc.append(va)
            report.test_acc.append(te)
            log.info(
                "dp epoch %d (%d dev): loss %.5f train %.4f val %.4f test %.4f "
                "time %.3fs",
                ep, self.n_dev, loss, tr_acc, va, te, dt,
            )
        return report
