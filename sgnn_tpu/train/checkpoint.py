"""Checkpoint / resume for training state.

Reference status (SURVEY.md §5): NO model checkpointing — only a generic
dump/restore_vertex_array pair (core/graph.hpp:528/:563, unused by engines)
and the pre-sample cache file.  This module supplies real checkpointing as
the survey's designated improvement: params + optimizer moments + epoch +
RNG keys, via orbax (async-capable, multi-host-safe), with a plain-numpy
fallback writer so checkpoints work without orbax too.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.logging import get_logger
from .guard import check_finite_loss

log = get_logger("sgnn.ckpt")


_M64 = (1 << 64) - 1


def encode_np_rng(rng: np.random.Generator) -> np.ndarray:
    """Serialize a PCG64 Generator's state as a fixed-shape [6] uint64 array.

    Fixed shape (128-bit state/inc split hi/lo) so it round-trips through
    both orbax StandardSave and the numpy fallback without shape drift.
    """
    st = rng.bit_generator.state
    s, inc = st["state"]["state"], st["state"]["inc"]
    return np.array(
        [s >> 64, s & _M64, inc >> 64, inc & _M64,
         st["has_uint32"], st["uinteger"]],
        dtype=np.uint64,
    )


def decode_np_rng(rng: np.random.Generator, arr) -> None:
    """Restore a Generator state saved by encode_np_rng (in place)."""
    a = [int(x) for x in np.asarray(arr, dtype=np.uint64).ravel()]
    st = rng.bit_generator.state
    st["state"]["state"] = (a[0] << 64) | a[1]
    st["state"]["inc"] = (a[2] << 64) | a[3]
    st["has_uint32"], st["uinteger"] = int(a[4]), int(a[5])
    rng.bit_generator.state = st


def _state_owner(trainer):
    """DP wrappers keep training state on `.base`; single-chip trainers own it."""
    return getattr(trainer, "base", trainer)


def _flatten_state(trainer) -> Dict[str, Any]:
    owner = _state_owner(trainer)
    if hasattr(owner, "checkpoint_state"):
        return owner.checkpoint_state()
    return {
        "params": owner.params,
        "opt_state": owner.opt_state,
        "dropout_key": owner._dropout_key,
    }


class CheckpointManager:
    """Save/restore training state under `directory/step_N/`."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        try:
            import orbax.checkpoint as ocp

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        except Exception:  # orbax unavailable → numpy fallback
            self._ocp = None
            self._mgr = None

    # ------------------------------------------------------------------
    def save(self, step: int, trainer) -> None:
        state = _flatten_state(trainer)
        if self._mgr is not None:
            self._mgr.save(
                step, args=self._ocp.args.StandardSave(state)
            )
            self._mgr.wait_until_finished()
        else:
            self._numpy_save(step, state)
        log.info("checkpoint saved: step %d → %s", step, self.directory)

    def restore(self, trainer, step: Optional[int] = None) -> Optional[int]:
        """Restore into the trainer in place; returns the restored step."""
        if self._mgr is not None:
            if step is None:
                step = self._mgr.latest_step()
            if step is None:
                return None
            state = _flatten_state(trainer)
            restored = self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(state)
            )
        else:
            step, restored = self._numpy_restore(step, trainer)
            if step is None:
                return None
        # Decommit to host: orbax hands back arrays COMMITTED to the device
        # they were restored onto (device 0).  Mesh-sharded trainers (the
        # *MULTI DP wrappers, sharded full-batch) then reject them —
        # "incompatible devices ... device ids [0] vs [0..7]" — whereas
        # fresh-init params are uncommitted and place freely.  Host numpy
        # leaves behave like fresh init for every trainer family.
        # LIMITATION (single-process checkpoints only): np.asarray forces a
        # device→host copy of the whole state, and would raise on a
        # non-fully-addressable GLOBAL array if a true multi-host sharded
        # restore ever flowed through here.  Multi-host resume goes through
        # parallel/multihost.py, which restores on process 0 and re-shards
        # explicitly; a sharding-aware orbax restore (ShapeDtypeStruct +
        # target sharding in StandardRestore) is the upgrade path if global
        # arrays ever need to restore in place.
        restored = jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            restored,
        )
        owner = _state_owner(trainer)
        if hasattr(owner, "load_checkpoint_state"):
            owner.load_checkpoint_state(restored)
        else:
            owner.params = jax.tree.map(lambda x: x, restored["params"])
            owner.opt_state = restored["opt_state"]
            owner._dropout_key = restored["dropout_key"]
        log.info("checkpoint restored: step %s", step)
        return step

    # ------------------------------------------------- numpy fallback ----
    def _numpy_save(self, step: int, state) -> None:
        d = os.path.join(self.directory, f"step_{step}")
        os.makedirs(d, exist_ok=True)
        leaves, treedef = jax.tree.flatten(state)
        np.savez(
            os.path.join(d, "state.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump({"num_leaves": len(leaves), "step": step}, f)
        # prune old steps
        steps = sorted(
            int(n.split("_")[1]) for n in os.listdir(self.directory)
            if n.startswith("step_")
        )
        for s in steps[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(os.path.join(self.directory, f"step_{s}"),
                          ignore_errors=True)

    def _numpy_restore(self, step, trainer):
        steps = sorted(
            int(n.split("_")[1]) for n in os.listdir(self.directory)
            if n.startswith("step_")
        )
        if not steps:
            return None, None
        step = step if step is not None else steps[-1]
        d = os.path.join(self.directory, f"step_{step}")
        data = np.load(os.path.join(d, "state.npz"))
        template = _flatten_state(trainer)
        leaves, treedef = jax.tree.flatten(template)
        # Device-array leaves go back through jnp; host-side leaves (e.g.
        # the uint64 PCG64 state words of the sampler RNG) must stay numpy —
        # jnp.asarray would canonicalize uint64 → uint32 (x64 disabled) and
        # silently corrupt the restored RNG state.
        new_leaves = [
            jax.numpy.asarray(data[f"leaf_{i}"])
            if isinstance(leaves[i], jax.Array) else data[f"leaf_{i}"]
            for i in range(len(leaves))
        ]
        return step, jax.tree.unflatten(treedef, new_leaves)


def run_with_checkpointing(
    trainer, directory: str, epochs: int, save_every: int = 1,
    resume: bool = True,
):
    """Epoch loop with periodic checkpointing and automatic resume."""
    mgr = CheckpointManager(directory)
    start = 0
    if resume:
        restored = mgr.restore(trainer)
        if restored is not None:
            start = restored + 1
    last_saved = start - 1 if start > 0 else None
    for ep in range(start, epochs):
        loss, acc, edges = trainer.train_epoch()
        # guard BEFORE saving: a poisoned state must never overwrite the
        # last good checkpoint (train/guard.py)
        check_finite_loss(loss, ep, type(trainer).__name__,
                          last_good_epoch=last_saved)
        log.info("epoch %d: loss %.5f train %.4f", ep, loss, acc)
        if (ep + 1) % save_every == 0 or ep == epochs - 1:
            mgr.save(ep, trainer)
            last_saved = ep
    return trainer
