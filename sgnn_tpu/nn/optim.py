"""Hand-rolled Adam with exact reference-parity update rules.

Reference: Parameter's optimizers (core/NtsScheduler.hpp):
  - `learn_local_with_decay_Adam` (:937, the GPU engines' update):
        g   = grad + weight_decay·W
        M   = β1·M + (1-β1)·g
        V   = β2·V + (1-β2)·g²
        W  -= α · M / (√V + ε)          # NO bias correction
  - `learnC2C_with_decay_Adam` (:863, the CPU engines' update): same but
    with bias correction M̂ = M/(1-β1ᵗ), V̂ = V/(1-β2ᵗ).
Hyperparameters from the engines (GCN_SAMPLE_PD_CACHE.hpp:189-194):
α = LEARN_RATE, β1 = 0.9, β2 = 0.999, ε = 1e-9; weight decay is L2-style
(added to the gradient), not decoupled.

Implemented as a pytree-to-pytree transformation so it composes with
`jax.jit`/`shard_map`; gradient cross-replica reduction (reference
all_reduce_to_gradient / NCCL AllReduce) happens in parallel/dp.py via
`psum` before `update` is applied.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any            # first-moment pytree (same structure as params)
    v: Any            # second-moment pytree
    step: jax.Array   # int32 scalar (epochs for bias correction / lr decay)


@dataclasses.dataclass(frozen=True)
class ReferenceAdam:
    learn_rate: float
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-9
    bias_correction: bool = False  # False = GPU-engine rule (flagship)
    decay_rate: float = 1.0        # LR decay: α·decay_rate^(step/decay_epoch)
    decay_epoch: int = 0

    def init(self, params: Any) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                         step=jnp.zeros((), jnp.int32))

    def update(
        self, grads: Any, state: AdamState, params: Any
    ) -> Tuple[Any, AdamState]:
        step = state.step + 1
        lr = jnp.asarray(self.learn_rate, jnp.float32)
        if self.decay_epoch > 0 and self.decay_rate != 1.0:
            lr = lr * jnp.power(
                jnp.asarray(self.decay_rate, jnp.float32),
                (step // self.decay_epoch).astype(jnp.float32),
            )

        def upd(p, g, m, v):
            g = g.astype(jnp.float32) + self.weight_decay * p.astype(jnp.float32)
            m = self.beta1 * m + (1.0 - self.beta1) * g
            v = self.beta2 * v + (1.0 - self.beta2) * jnp.square(g)
            if self.bias_correction:
                t = step.astype(jnp.float32)
                m_hat = m / (1.0 - jnp.power(self.beta1, t))
                v_hat = v / (1.0 - jnp.power(self.beta2, t))
            else:
                m_hat, v_hat = m, v
            newp = p.astype(jnp.float32) - lr * m_hat / (jnp.sqrt(v_hat) + self.epsilon)
            return newp.astype(p.dtype), m, v

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        outs = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        new_p = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        return new_p, AdamState(m=new_m, v=new_v, step=step)


class SGDState(NamedTuple):
    step: jax.Array   # int32 scalar (kept for interface/ckpt symmetry)


@dataclasses.dataclass(frozen=True)
class ReferenceSGD:
    """SGD with the reference's multiplicative decay.

    Parameter::learnC2C_with_decay_SGD (core/NtsScheduler.hpp:893-898):
        W = (W - lr·grad) · (1 - weight_decay)
    — decay is applied multiplicatively AFTER the step, not folded into the
    gradient like the Adam rules.  Same update interface as ReferenceAdam
    so trainers/DP wrappers take either.
    """

    learn_rate: float
    weight_decay: float = 1e-4

    def init(self, params: Any) -> SGDState:
        return SGDState(step=jnp.zeros((), jnp.int32))

    def update(
        self, grads: Any, state: SGDState, params: Any
    ) -> Tuple[Any, SGDState]:
        lr = jnp.asarray(self.learn_rate, jnp.float32)
        decay = 1.0 - self.weight_decay

        def upd(p, g):
            newp = (p.astype(jnp.float32) - lr * g.astype(jnp.float32)) * decay
            return newp.astype(p.dtype)

        new_p = jax.tree.map(upd, params, grads)
        return new_p, SGDState(step=state.step + 1)


def make_optimizer(cfg, bias_correction: bool = False):
    """Optimizer from cfg.optimizer ("adam" | "sgd"), reference defaults."""
    if getattr(cfg, "optimizer", "adam").lower() == "sgd":
        return ReferenceSGD(learn_rate=cfg.learn_rate,
                            weight_decay=cfg.weight_decay)
    return ReferenceAdam(
        learn_rate=cfg.learn_rate,
        weight_decay=cfg.weight_decay,
        bias_correction=bias_correction,
        decay_rate=cfg.decay_rate,
        decay_epoch=cfg.decay_epoch,
    )
