"""Min/max neighbor aggregation and edge-tensor views.

Reference: `SingleCPUDstAggregateOpMin/Max` and `DistAggregateDstMin/Max`
(core/ntsSingleCPUGraphOp.hpp:34-439, ntsDistCPUGraphOp.hpp) — elementwise
min/max over each destination's in-edge messages, with the usual
subgradient convention (gradient flows to the arg-extreme edge).  In the
dense-fanout layout these are masked reductions over axis 1, which XLA
differentiates correctly (min/max VJP routes cotangents to the selected
elements) — no custom backward needed.

`edge_view` replaces the reference's `ntsEdgeTensor` (NtsEdgeTensor.hpp:22)
per-destination edge-major views: in dense layout the view IS the
[D, K, F] tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_min(x_src: jax.Array, nbr: jax.Array, edge_mask: jax.Array) -> jax.Array:
    """out[d] = min_k x_src[nbr[d,k]] over valid slots; +inf-free: rows with
    no valid edge return 0."""
    gathered = x_src[nbr]                                  # [D, K, F]
    big = jnp.asarray(jnp.finfo(x_src.dtype).max, x_src.dtype)
    masked = jnp.where(edge_mask[:, :, None], gathered, big)
    out = jnp.min(masked, axis=1)
    any_valid = jnp.any(edge_mask, axis=1)[:, None]
    return jnp.where(any_valid, out, 0.0)


def gather_max(x_src: jax.Array, nbr: jax.Array, edge_mask: jax.Array) -> jax.Array:
    gathered = x_src[nbr]
    small = jnp.asarray(jnp.finfo(x_src.dtype).min, x_src.dtype)
    masked = jnp.where(edge_mask[:, :, None], gathered, small)
    out = jnp.max(masked, axis=1)
    any_valid = jnp.any(edge_mask, axis=1)[:, None]
    return jnp.where(any_valid, out, 0.0)


def _segment_extreme_windowed(x, src, dst, valid, num_dst, plan, kind):
    """Edge-chunked min/max with bounded dst windows (SpmmPlanner plan).

    Requires dst ascending (CSC order).  The direct path materializes an
    [E, F] message tensor — past the element budget, chunks of `plan.chunk`
    edges each reduce into a [dst_span, F] window combined into the carried
    accumulator via elementwise min/max (ops/segment.py windowed-SpMM
    pattern; reference dst-range chunk segments, core/GraphSegment.h:60).
    Autodiff flows through scan + dynamic_update_slice + segment_min/max —
    the subgradient still routes to the arg-extreme edge."""
    from .segment import _pad_chunks, _window_ids

    seg_red = jax.ops.segment_min if kind == "min" else jax.ops.segment_max
    comb = jnp.minimum if kind == "min" else jnp.maximum
    fin = jnp.finfo(x.dtype)
    init_f = float(fin.max if kind == "min" else fin.min)
    init = jnp.asarray(init_f, x.dtype)
    chunk, window = plan.chunk, plan.dst_span
    e_total = src.shape[0]
    f = x.shape[1]
    # narrow-table GATHERS hit a slow scan lowering (segment.
    # _pad_feat_tile); pad the gathered table with `init` and slice each
    # window reduction back so the carried accumulator stays narrow
    from .segment import _eff_feat

    fp = _eff_feat(f)
    if fp != f:
        x = jnp.pad(x, ((0, 0), (0, fp - f)), constant_values=init_f)
    src_c, dst_c, v_c = _pad_chunks(
        (src, dst, valid), e_total, chunk, fills=(0, num_dst - 1, False))

    def body(acc, args):
        s, d, vld = args
        r0, dl = _window_ids(d, window)
        msgs = jnp.where(vld[:, None], x[s], init)
        local = seg_red(msgs, dl, num_segments=window,
                        indices_are_sorted=True)[:, :f]
        win = jax.lax.dynamic_slice(acc, (r0, 0), (window, f))
        return jax.lax.dynamic_update_slice(acc, comb(win, local),
                                            (r0, 0)), None

    from .segment import _acc_init

    acc0 = _acc_init((num_dst + window, f), x, fill=init_f, dtype=x.dtype)
    acc, _ = jax.lax.scan(body, acc0, (src_c, dst_c, v_c))
    out = acc[:num_dst]
    ok = (jnp.isfinite(out)
          & ((out < init) if kind == "min" else (out > init)))
    return jnp.where(ok, out, 0.0)


def segment_min_coo(x, src, dst, valid, num_dst, indices_are_sorted=False,
                    plan=None):
    """COO full-graph min (reference DistAggregateDstMin).  Pass
    indices_are_sorted=True only when dst is ascending (build_coo /
    shard_graph order) — invalid edges are masked but must still point at
    in-order ids.  `plan` (ops/segment.SpmmPlanner) chunks the [E, F]
    message tensor into bounded dst windows (sorted order required)."""
    if plan is not None and indices_are_sorted:
        return _segment_extreme_windowed(x, src, dst, valid, num_dst, plan,
                                         "min")
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    msgs = jnp.where(valid[:, None], x[src], big)
    out = jax.ops.segment_min(msgs, dst, num_segments=num_dst,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out) & (out < big), out, 0.0)


def segment_max_coo(x, src, dst, valid, num_dst, indices_are_sorted=False,
                    plan=None):
    if plan is not None and indices_are_sorted:
        return _segment_extreme_windowed(x, src, dst, valid, num_dst, plan,
                                         "max")
    small = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    msgs = jnp.where(valid[:, None], x[src], small)
    out = jax.ops.segment_max(msgs, dst, num_segments=num_dst,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out) & (out > small), out, 0.0)


def edge_view(x_src: jax.Array, nbr: jax.Array) -> jax.Array:
    """Edge-major [D, K, F] view of source features (ntsEdgeTensor parity)."""
    return x_src[nbr]
