"""Multi-host initialization and mesh construction.

Reference: MPI_Instance RAII bootstrap (dep/gemini/mpi.hpp:51,
MPI_Init_thread) + per-rank vertex ranges established in Graph::init
(core/graph.hpp:391).  TPU-native: `jax.distributed.initialize` joins all
hosts into one runtime; every chip on every host lands in a single
`jax.sharding.Mesh`, and the same `psum`/`all_gather` collectives ride ICI
within a slice and DCN across slices — no host-level communication code.

On a single host this is a no-op and the local devices form the mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..train.guard import check_finite_loss
from ..utils.logging import get_logger

log = get_logger("sgnn.dist")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime; returns (process_id, num_processes).

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS etc. /
    TPU pod metadata); single-process when none are present.
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _env_int("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    if coord or (nproc and nproc > 1):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=pid,
        )
        log.info(
            "distributed init: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def make_multihost_dp_step(family, drop_rate, optimizer, mesh: Mesh,
                           materialize=None, heads: int = 1,
                           batch_norm: bool = False):
    """DP train step over a (possibly multi-process) global mesh.

    Like dp.make_dp_step (per-device grads → psum SUM → replicated Adam,
    reference Parameter::all_reduce_to_gradient NtsScheduler.hpp:825 over
    MPI), but loss/acc come back mesh-REPLICATED so every process can read
    them without cross-process gathers.
    """
    import functools

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..models.gnn import model_forward
    from ..nn.functional import masked_accuracy, nll_loss_masked

    def local_loss(params, batch, key, features, labels, cache_rows,
                   slot_map):
        if materialize is not None:
            batch = materialize(batch, features, labels, cache_rows, slot_map)

        def loss_fn(p):
            logp = model_forward(p, family, batch, drop_rate=drop_rate,
                                 train=True, dropout_key=key, heads=heads,
                                 batch_norm=batch_norm)
            return nll_loss_masked(logp, batch.labels, batch.label_valid), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        acc = masked_accuracy(logp, batch.labels, batch.label_valid)
        return loss, grads, acc

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def dp_step(params, opt_state, batch, key, features, labels,
                cache_rows, slot_map):
        local_batch = jax.tree.map(lambda x: x[0], batch)
        loss, grads, acc = local_loss(params, local_batch, key[0],
                                      features, labels, cache_rows, slot_map)
        # SUM parity w/ MPI_Allreduce; version-adaptive (utils/vma.py) —
        # vma-typed JAX already totals replicated-param grads
        from ..utils.vma import psum_grads

        grads = psum_grads(grads, "data", loss)
        new_params, new_opt = optimizer.update(grads, opt_state, params)
        return (new_params, new_opt, jax.lax.pmean(loss, "data"),
                jax.lax.psum(acc, "data"))

    return jax.jit(dp_step)


def run_multihost_dp_epochs(cfg, dataset, epochs: int = 1,
                            family: str = "gcn"):
    """Data-parallel training over EVERY device of EVERY joined process.

    Call after initialize_distributed().  Each process host-samples only the
    seed shards its own devices own (per-rank split, reference per-rank
    partitioning graph.hpp:391 + GCN_SAMPLE_ALL_MULTI.hpp:564) and
    contributes them to one global [n_global, ...] batch; gradients
    psum-reduce across the whole mesh (DCN between hosts, ICI within).
    Sampling RNG is keyed by (seed, epoch, step, global_device) so the math
    is IDENTICAL for any process layout over the same global device count —
    a 2-process run matches a single-process run loss-for-loss (tested in
    tests/test_multihost.py).

    Returns the per-epoch mean losses (same values on every process).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..sampler.blocks import WeightKind
    from ..train.trainer import SampleTrainer
    from .dp import stack_batches

    wk = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
          "gat": WeightKind.NONE}[family]
    base = SampleTrainer(cfg, dataset, family=family, weight_kind=wk)
    mesh = global_mesh(graph=1)
    n_global = int(np.prod(mesh.devices.shape))
    pid = jax.process_index()
    local_ids = [
        g for g, d in enumerate(mesh.devices.reshape(-1))
        if d.process_index == pid
    ]

    def to_global(tree, spec):
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, spec
        )

    step_fn = make_multihost_dp_step(
        base.family, cfg.drop_rate, base.optimizer, mesh,
        materialize=base._materialize, heads=cfg.heads,
        batch_norm=cfg.batch_norm,
    )
    params_g = to_global(base.params, P())
    opt_g = to_global(base.opt_state, P())
    # Features may be host-resident (beyond-HBM): the batches then carry
    # full x0 (payload path) or compacted cold rows + an HBM hot cache
    # (feature-cache path) — only device-resident arrays go global.
    feats_g = (to_global(base.dev_features, P())
               if base.dev_features is not None else None)
    labels_g = (to_global(base.dev_labels, P())
                if base.dev_labels is not None else None)
    if base.feat_cache is not None:
        cache_g = to_global(base.feat_cache.dev_hot, P())
        slot_g = to_global(base.feat_cache.dev_slot_map, P())
    else:
        cache_g = slot_g = None

    import dataclasses as _dc

    bs = cfg.batch_size
    epoch_losses = []
    for ep in range(epochs):
        order = np.random.default_rng(
            (cfg.seed, 11, ep)
        ).permutation(base.train_nids).astype(np.int32)
        shards = np.array_split(order, n_global)
        n_steps = max((len(s) + bs - 1) // bs for s in shards)
        losses = []
        for st in range(n_steps):
            per_local = []
            for g in local_ids:
                seeds = shards[g][st * bs:(st + 1) * bs]
                dummy = seeds.size == 0
                if dummy:
                    seeds = np.zeros(1, dtype=np.int32)
                # per-(epoch, step, device) RNG stream: process-layout
                # independent determinism
                base.sampler.rng = np.random.default_rng(
                    (cfg.seed, 13, ep, st, g)
                )
                batch, _ = base._make_batch(seeds)
                if dummy:
                    batch = _dc.replace(
                        batch, label_valid=jnp.zeros_like(batch.label_valid)
                    )
                per_local.append(batch)
            batch_g = to_global(stack_batches(per_local), P("data"))
            dkey = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed + 1), ep * 100003 + st
            )
            keys = jax.random.split(dkey, n_global)
            keys_local = keys[np.asarray(local_ids)]
            keys_g = to_global(keys_local, P("data"))
            params_g, opt_g, loss, _acc = step_fn(
                params_g, opt_g, batch_g, keys_g, feats_g, labels_g,
                cache_g, slot_g,
            )
            # loss is fully replicated: read this process's shard
            losses.append(float(np.asarray(loss.addressable_shards[0].data)))
        epoch_losses.append(float(np.mean(losses)))
        check_finite_loss(epoch_losses[-1], ep, "run_multihost_dp_epochs")
        log.info("multihost dp epoch %d (%d proc, %d dev): loss %.6f",
                 ep, jax.process_count(), n_global, epoch_losses[-1])
    return epoch_losses


def global_mesh(data: Optional[int] = None, graph: int = 1) -> Mesh:
    """Mesh over ALL devices across hosts: ("data", "graph").

    Lay the data axis across hosts (gradient psum crosses DCN once per
    step) and keep the graph axis within a host so halo all_gathers ride
    ICI — the layout SURVEY.md §2.8 prescribes.
    """
    devs = jax.devices()
    n = len(devs)
    if data is None:
        data = n // graph
    assert data * graph <= n
    arr = np.asarray(devs[: data * graph]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def run_multihost_fullbatch_epochs(
    cfg, dataset, epochs: Optional[int] = None, family: str = "gcn",
    halo: str = "all_gather", weight_kind=None,
    state_out: Optional[dict] = None,
    resume_state: Optional[dict] = None,
):
    """Vertex-sharded full-batch training over EVERY device of EVERY process.

    The reference full-batch path IS multi-node (NeutronStar: Gemini
    vertex-range partitioning per MPI rank + master/mirror halo exchange,
    core/graph.hpp:640-1115/:2535-3530).  Here the same topology is one
    global ("graph",) mesh across processes: every process builds the same
    sharded COO (deterministic from the dataset), contributes the row
    blocks its own devices own, and the shard_map step's all_gather /
    all_to_all halo and grad psum ride DCN between hosts, ICI within.

    Loss (and the step math) is process-layout independent: an N-process
    run equals a single-process run over the same global device count,
    dropout included (the keep mask is drawn layout-invariantly for the
    full vertex array).  Returns per-epoch losses (same on every process).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..sampler.blocks import WeightKind
    from ..train.fullbatch import FullBatchTrainer

    if weight_kind is None:  # same family defaults as the engine registry
        weight_kind = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
                       "gat": WeightKind.NONE}[family]
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(len(devs)), ("graph",))
    tr = FullBatchTrainer(cfg, dataset, family=family, mesh=mesh, halo=halo,
                          weight_kind=weight_kind)
    if resume_state is not None:
        # kill-and-resume parity (device-DP analog above): params/opt + the
        # dropout key chain, so a resumed run reproduces the uninterrupted
        # trajectory exactly (the fullbatch step has no other RNG state)
        template = {"params": tr.params, "opt_state": tr.opt_state,
                    "dropout_key": tr._dropout_key}
        flat, treedef = jax.tree.flatten(template)
        leaves = resume_state["leaves"]
        assert len(leaves) == len(flat), (len(leaves), len(flat))
        restored = jax.tree.unflatten(treedef, leaves)
        tr.params = jax.tree.map(np.asarray, restored["params"])
        tr.opt_state = jax.tree.map(np.asarray, restored["opt_state"])
        tr._dropout_key = jnp.asarray(restored["dropout_key"])
    n = len(devs)
    rows = tr.sharded.rows_per_shard
    pid = jax.process_index()
    local_ids = [i for i, d in enumerate(devs) if d.process_index == pid]
    assert local_ids == list(range(min(local_ids), max(local_ids) + 1)), (
        "expected process-contiguous device ordering"
    )
    lo_dev, hi_dev = min(local_ids), max(local_ids) + 1

    def to_g(tree, spec):
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, spec
        )

    def rows_block(a):  # [vpad, ...] vertex-indexed → this process's rows
        return to_g(np.asarray(a)[lo_dev * rows:hi_dev * rows], P("graph"))

    def dev_block(a):   # [n, ...] stacked per-device → this process's stack
        return to_g(np.asarray(a)[lo_dev:hi_dev], P("graph"))

    params_g = to_g(tr.params, P())
    opt_g = to_g(tr.opt_state, P())
    x_g = rows_block(tr.x)
    y_g = rows_block(tr.y)
    mask_g = rows_block(tr.train_mask)
    if tr.targeted is not None:
        sidx_g = dev_block(tr.targeted.send_idx)
        src_g = dev_block(tr.targeted.src_local)
        dst_g = dev_block(tr.targeted.dst_local)
        w_g = dev_block(tr.targeted.weight)
        perm_g = dev_block(tr.targeted.perm)
        inv_g = dev_block(tr.targeted.inv_perm)
    else:
        sidx_g = dev_block(np.zeros((n, 1, 1), np.int32))
        src_g = dev_block(tr.sharded.src)
        dst_g = dev_block(tr.sharded.dst_local)
        w_g = dev_block(tr.sharded.weight)
        perm_g = dev_block(tr.sharded.perm)
        inv_g = dev_block(tr.sharded.inv_perm)
    smeta_g = dev_block(tr.sharded.shard_meta)
    starts_g = dev_block(tr.shard_planner.softmax_starts())

    losses = []
    for ep in range(epochs or cfg.epochs):
        # single source of truth for the key schedule (matches train_epoch)
        tr._dropout_key, dkey = jax.random.split(tr._dropout_key)
        params_g, opt_g, loss, _pred = tr._step(
            params_g, opt_g, x_g, y_g, mask_g, src_g, dst_g, w_g, sidx_g,
            perm_g, inv_g, smeta_g, starts_g, to_g(dkey, P()),
        )
        losses.append(float(np.asarray(loss.addressable_shards[0].data)))
        check_finite_loss(losses[-1], ep, "run_multihost_fullbatch_epochs")
        log.info("multihost fullbatch epoch %d (%d proc, %d dev): loss %.6f",
                 ep, jax.process_count(), n, losses[-1])
    if state_out is not None:
        state_out.update({
            "params": _host_copy(params_g),
            "opt_state": _host_copy(opt_g),
            "dropout_key": np.asarray(tr._dropout_key),
        })
    return losses

def _host_copy(tree):
    """Pytree → host numpy, reading one shard of replicated global arrays
    (each shard of a P()-replicated array holds the full value)."""
    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree.map(f, tree)


def multihost_checkpoint_save(directory: str, step: int, state: dict) -> None:
    """Process-0 writes the (host-numpy) state; every process barriers so a
    subsequent restore on any rank sees the file (VERDICT r2 #8; the
    reference has no checkpointing — SURVEY §5 improvement axis)."""
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        leaves, _ = jax.tree.flatten(state)
        os.makedirs(directory, exist_ok=True)
        np.savez(os.path.join(directory, f"step_{int(step)}.npz"),
                 step=np.int64(step),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices("sgnn_multihost_ckpt_save")
    log.info("multihost checkpoint saved: step %d -> %s", step, directory)


def multihost_checkpoint_restore(directory: str,
                                 step: Optional[int] = None):
    """Latest (or given) checkpoint → {"step": int, "leaves": [np ...]} or
    None.  Every process reads the same file (process-0 wrote it; shared
    filesystem assumed, as for orbax)."""
    import glob

    files = glob.glob(os.path.join(directory, "step_*.npz"))
    if not files:
        return None
    by_step = {int(os.path.basename(f)[5:-4]): f for f in files}
    step = max(by_step) if step is None else step
    z = np.load(by_step[step])
    n = sum(1 for k in z.files if k.startswith("leaf_"))
    return {"step": int(z["step"]),
            "leaves": [z[f"leaf_{i}"] for i in range(n)]}


def run_multihost_device_dp_epochs(
    cfg, dataset, epochs: Optional[int] = None, family: str = "gcn",
    shard_features: bool = False,
    state_out: Optional[dict] = None,
    resume_state: Optional[dict] = None,
):
    """Device-sampled DP (*ALLMULTI engines) over EVERY device of EVERY
    joined process — the fused sample→train→Adam scan of
    parallel/dp_device.py runs unchanged; only the operand placement is
    multi-process (host_local_array_to_global_array per block).

    Reference parity: MPI ranks each driving their own GPUs with NCCL
    AllReduce inside the node (GCN_SAMPLE_ALL_MULTI.hpp:564 + mpi.hpp:51).
    Determinism is process-layout independent: device g's sampling stream
    comes from split(epoch_key)[g] and its seed shard from a global
    partition of the (seed-keyed) epoch order, so an N-process run equals
    a single-process run over the same global device count loss-for-loss
    (tests/test_multihost.py).  SHARD_FEATURES rides along: each process
    contributes its devices' feature row blocks (ntsPeerRPC analog).

    Returns per-epoch mean losses (same on every process).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..sampler.blocks import WeightKind
    from ..train.device_trainer import DeviceSampleTrainer
    from .dp_device import DeviceDataParallelTrainer

    wk = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
          "gat": WeightKind.NONE}[family]
    base = DeviceSampleTrainer(cfg, dataset, family=family, weight_kind=wk)
    if resume_state is not None:
        # kill-and-resume parity: params/opt + BOTH RNG streams (the
        # device sample-key chain and the host epoch-order generator) so a
        # resumed run reproduces the uninterrupted trajectory exactly
        from ..train.checkpoint import decode_np_rng, encode_np_rng

        template = {
            "params": base.params, "opt_state": base.opt_state,
            "sample_key": base._sample_key,
            "host_rng": encode_np_rng(base.sampler.rng),
        }
        flat, treedef = jax.tree.flatten(template)
        leaves = resume_state["leaves"]
        assert len(leaves) == len(flat), (len(leaves), len(flat))
        restored = jax.tree.unflatten(treedef, leaves)
        base.params = jax.tree.map(np.asarray, restored["params"])
        base.opt_state = jax.tree.map(np.asarray, restored["opt_state"])
        base._sample_key = jnp.asarray(restored["sample_key"])
        decode_np_rng(base.sampler.rng, restored["host_rng"])
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))
    dp = DeviceDataParallelTrainer(base, mesh=mesh,
                                   shard_features=shard_features)
    n = dp.n_dev
    pid = jax.process_index()
    local_ids = [i for i, d in enumerate(devs) if d.process_index == pid]
    assert local_ids == list(range(min(local_ids), max(local_ids) + 1)), (
        "expected process-contiguous device ordering"
    )
    lo, hi = min(local_ids), max(local_ids) + 1

    def to_g(tree, spec):
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, spec
        )

    def rep(a):
        return to_g(np.asarray(a), P())

    params_g = to_g(base.params, P())
    opt_g = to_g(base.opt_state, P())
    indptr_g, indices_g = rep(base.dev_indptr), rep(base.dev_indices)
    indeg_g, outdeg_g = rep(base.dev_in_deg), rep(base.dev_out_deg)
    labels_g = rep(base.dev_labels)
    if shard_features:
        rows = dp.feat_rows
        feats_g = to_g(np.asarray(dp.feat_sharded)[lo * rows:hi * rows],
                       P("data"))
    else:
        feats_g = rep(base.dev_features)

    losses = []
    for ep in range(epochs or cfg.epochs):
        nids = base._epoch_order(base.train_nids)
        seeds_all, valid_all, src_pads = dp._shard_seed_arrays(nids)
        epoch_fn = dp._get_epoch_fn(src_pads)
        base._sample_key, key = jax.random.split(base._sample_key)
        keys = np.asarray(jax.random.split(key, n))
        n_steps = seeds_all.shape[0]
        pad = seeds_all.shape[1] // n

        def local_cols(a):  # [n_steps, n·pad] → this process's device block
            return to_g(
                a.reshape(n_steps, n, pad)[:, lo:hi].reshape(n_steps, -1),
                P(None, "data"),
            )

        params_g, opt_g, loss, _acc, _edges = epoch_fn(
            params_g, opt_g, local_cols(seeds_all), local_cols(valid_all),
            to_g(keys[lo:hi], P("data")),
            indptr_g, indices_g, indeg_g, outdeg_g, feats_g, labels_g,
        )
        losses.append(float(np.asarray(loss.addressable_shards[0].data)))
        check_finite_loss(losses[-1], ep, "run_multihost_device_dp_epochs")
        log.info(
            "multihost device-dp epoch %d (%d proc, %d dev%s): loss %.6f",
            ep, jax.process_count(), n,
            ", sharded features" if shard_features else "", losses[-1],
        )
    if state_out is not None:
        from ..train.checkpoint import encode_np_rng

        state_out.update({
            "params": _host_copy(params_g),
            "opt_state": _host_copy(opt_g),
            "sample_key": np.asarray(base._sample_key),
            "host_rng": encode_np_rng(base.sampler.rng),
        })
    return losses


def run_multihost_pcmulti_epochs(
    cfg, dataset, epochs: Optional[int] = None, family: str = "gcn",
):
    """*PCMULTI (PD-cache + data-parallel) over EVERY device of EVERY
    joined process — the in-scan cached device-DP epoch of
    parallel/dp_device.DeviceCachedDataParallelTrainer with multi-process
    operand placement.

    Reference parity: the multi-GPU cache engines (GCN_SAMPLE_PC_MULTI.hpp)
    with the cache shared across devices (NCCL AllGather of cache shards,
    core/ntsDataloador.hpp:735-762) — here ONE global hot set whose refresh
    every device recomputes (replicated params make it identical), with the
    cache-embedding carry, omit map and precomputed aggregate placed as
    replicated global arrays.  Determinism is process-layout independent
    exactly as in run_multihost_device_dp_epochs, so a 2-process run equals
    the single-process run over the same global device count loss-for-loss
    (tests/test_multihost.py) — the distributed-process regression test the
    round-4 vma failure showed this engine was missing.

    Returns per-epoch mean losses (same on every process).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..sampler.blocks import WeightKind
    from ..train.device_cached import DeviceCachedSampleTrainer
    from .dp_device import DeviceCachedDataParallelTrainer

    wk = {"gcn": WeightKind.GCN, "sage": WeightKind.MEAN,
          "gat": WeightKind.NONE}[family]
    base = DeviceCachedSampleTrainer(cfg, dataset, family=family,
                                     weight_kind=wk, per_sb=False)
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))
    dp = DeviceCachedDataParallelTrainer(base, mesh=mesh)
    n = dp.n_dev
    pid = jax.process_index()
    local_ids = [i for i, d in enumerate(devs) if d.process_index == pid]
    assert local_ids == list(range(min(local_ids), max(local_ids) + 1)), (
        "expected process-contiguous device ordering"
    )
    lo, hi = min(local_ids), max(local_ids) + 1

    def to_g(tree, spec):
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, spec
        )

    def rep(a):
        return to_g(np.asarray(a), P())

    params_g = to_g(base.params, P())
    opt_g = to_g(base.opt_state, P())
    indptr_g, indices_g = rep(base.dev_indptr), rep(base.dev_indices)
    indeg_g, outdeg_g = rep(base.dev_in_deg), rep(base.dev_out_deg)
    labels_g = rep(base.dev_labels)
    feats_g = rep(base.dev_features)
    omit_g = rep(base.cache_maps[0])
    agg_g = rep(base.cache_agg_all[0])
    hidden = cfg.layer_sizes[1]
    cache_g = rep(np.zeros((base.cache.num_cached, hidden), np.float32))

    losses = []
    for ep in range(epochs or cfg.epochs):
        nids = dp._epoch_nids()
        seeds_all, valid_all, src_pads = dp._shard_seed_arrays(nids)
        epoch_fn = dp._get_epoch_fn(src_pads)
        base._sample_key, key = jax.random.split(base._sample_key)
        keys = np.asarray(jax.random.split(key, n))
        n_steps = seeds_all.shape[0]
        pad = seeds_all.shape[1] // n

        def local_cols(a):  # [n_steps, n·pad] → this process's device block
            return to_g(
                a.reshape(n_steps, n, pad)[:, lo:hi].reshape(n_steps, -1),
                P(None, "data"),
            )

        (params_g, opt_g, cache_g, loss, _acc, _edges, hits,
         lookups) = epoch_fn(
            params_g, opt_g, cache_g, local_cols(seeds_all),
            local_cols(valid_all), to_g(keys[lo:hi], P("data")),
            indptr_g, indices_g, indeg_g, outdeg_g, feats_g, labels_g,
            omit_g, agg_g,
        )
        losses.append(float(np.asarray(loss.addressable_shards[0].data)))
        check_finite_loss(losses[-1], ep, "run_multihost_pcmulti_epochs")
        log.info(
            "multihost pcmulti epoch %d (%d proc, %d dev): loss %.6f "
            "cache %d/%d",
            ep, jax.process_count(), n, losses[-1],
            int(np.asarray(hits.addressable_shards[0].data)),
            int(np.asarray(lookups.addressable_shards[0].data)),
        )
    return losses
