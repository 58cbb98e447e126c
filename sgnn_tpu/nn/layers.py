"""Parameter containers and initialisation.

Reference: Parameter (core/NtsScheduler.hpp:680) holds one weight matrix per
layer, xavier_uniform-initialised (NtsScheduler.hpp:733, gain 1.0), updated
by the hand-rolled Adam in nn/optim.py.  Models here are plain pytrees of
jnp arrays — functional, jit/shard_map-friendly, no framework classes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform_init(
    key: jax.Array, in_dim: int, out_dim: int, gain: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """torch::nn::init::xavier_uniform_ parity: U(-a, a), a = gain·√(6/(fi+fo))."""
    a = gain * float(np.sqrt(6.0 / (in_dim + out_dim)))
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -a, a)


class Dense(NamedTuple):
    """A bias-free linear layer (reference Parameter::forward = x·W)."""

    w: jax.Array

    @staticmethod
    def init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> "Dense":
        return Dense(w=xavier_uniform_init(key, in_dim, out_dim, dtype=dtype))

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.dot(x, self.w.astype(x.dtype),
                       preferred_element_type=x.dtype)
