"""NN math with reference-parity semantics (relu/dropout/log_softmax/nll).

Reference engines use torch::relu, torch::dropout, log_softmax + nll_loss
(e.g. toolkits/GCN_SAMPLE_PD_CACHE.hpp vertexForward/Loss).  Padded rows in
our dense blocks are excluded from loss/accuracy via the validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Batch-norm epsilon shared by EVERY BN site (sampled model,
# full-batch forward, sharded sync-BN, exact layer-wise serving) so
# train/serve parity cannot drift.
BN_EPS = 1e-5



def dropout(key: jax.Array, x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout, torch::dropout parity (scale by 1/(1-rate))."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def log_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.log_softmax(x, axis=axis)


def nll_loss_masked(
    log_probs: jax.Array, labels: jax.Array, valid: jax.Array
) -> jax.Array:
    """Mean NLL over valid rows (torch::nll_loss 'mean' reduction parity).

    Padded seed rows (valid=False) contribute nothing; the mean divides by
    the VALID count, matching the reference where no padding exists.
    """
    picked = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    per_row = jnp.where(valid, -picked, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(per_row) / n.astype(log_probs.dtype)


def masked_accuracy(
    logits: jax.Array, labels: jax.Array, valid: jax.Array
) -> jax.Array:
    """(correct_count, valid_count) for accuracy aggregation across batches.

    Reference: getCorrect / acc logging (GCN_SAMPLE_PD_CACHE.hpp:264-295).
    """
    pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
    correct = jnp.sum((pred == labels) & valid)
    return jnp.stack([correct, jnp.sum(valid)])
