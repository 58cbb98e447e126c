"""Row-sharded feature storage for the sampled path.

Reference: ntsPeerRPC remote feature rows (core/ntsPeerRPC.hpp:154), used by
the distributed minibatch ops via `get_feature_from_global`
(core/ntsMiniBatchGraphOp.hpp:92) — the feature matrix is partitioned
across workers and each minibatch RPC-fetches exactly the rows it sampled.

TPU redesign: the feature matrix is row-sharded over the mesh "data" axis
(each chip holds V/n rows instead of V — the trainable feature size scales
with the device count).  A batch's sampled src rows are fetched with:
  1. all_gather of the (tiny, int32) request ids — every owner sees every
     device's requests,
  2. owner-side gather of the rows it holds,
  3. psum_scatter (reduce-scatter) of the response stack — each device
     receives the sum of all owners' contributions, i.e. exactly its rows.
All three collectives ride ICI; the [n, chunk, F] response buffer is
chunked to bound memory.  No RPC threads, no serialization — the sharding
annotation is the communication code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fetch_feature_rows(
    feat_local: jax.Array,     # [rows_per_shard, F] this device's rows
    src_global: jax.Array,     # [S] int32 global vertex ids to fetch
    axis_name: str = "data",
    chunk: int = 4096,
) -> jax.Array:
    """Fetch feature rows from their owner shards (call inside shard_map).

    Returns [S, F] in feat_local's dtype.  Ids outside [0, n·rows) yield
    zero rows (padding-safe).
    """
    rows = feat_local.shape[0]
    p = jax.lax.axis_index(axis_name)
    offset = (p * rows).astype(jnp.int32)
    reqs = jax.lax.all_gather(src_global, axis_name)        # [n, S]
    n, s = reqs.shape
    chunk = min(chunk, s)
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s
    if pad:
        reqs = jnp.concatenate(
            [reqs, jnp.full((n, pad), -1, reqs.dtype)], axis=1
        )
    # [n_chunks, n, chunk] so the scan bounds the response buffer
    reqs = reqs.reshape(n, n_chunks, chunk).transpose(1, 0, 2)

    def body(_, req_c):
        rel = req_c - offset
        mine = (rel >= 0) & (rel < rows)
        vals = feat_local[jnp.clip(rel, 0, rows - 1)]       # [n, chunk, F]
        contrib = jnp.where(mine[..., None], vals,
                            jnp.zeros((), feat_local.dtype))
        # reduce-scatter: device q receives Σ_p contrib_p[q] = its rows
        out = jax.lax.psum_scatter(
            contrib, axis_name, scatter_dimension=0, tiled=True
        )
        return 0, out.reshape(chunk, -1)

    _, outs = jax.lax.scan(body, 0, reqs)                   # [n_chunks, c, F]
    return outs.reshape(n_chunks * chunk, -1)[:s]
