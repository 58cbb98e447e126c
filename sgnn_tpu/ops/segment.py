"""COO segment ops for FULL-GRAPH (non-sampled) aggregation.

Reference: the NeutronStar full-batch op family — `SingleCPUSrcDstScatterOp`,
`SingleCPUDstAggregateOp`, `SingleEdgeSoftMax` (core/ntsSingleCPUGraphOp.hpp:
34-439) and their distributed analogues — operate over the whole-graph
CSC/CSR.  On TPU a whole-graph layer is a ragged reduction, expressed with
XLA's segment primitives over a statically padded COO edge list (padded
edges carry weight 0 and point at a real dst slot, contributing nothing).

Edge chunking: the naive SpMM materializes an [E, F] message tensor in BOTH
directions (backward additionally converts it to f32 for accumulation), so
one chip tops out near E·F·(2+4+4) bytes of HBM — measured OOM at 23.8M
edges × 128 features (17.3 GB program) on a 16 GB v5e.  Past a direct-path
threshold, forward and backward run as a `lax.scan` over fixed-size edge
chunks, bounding the temps at [chunk, F] while the [num_dst, F] f32
accumulator is carried — whole-graph training then scales with V, not E,
on a single chip.  The reference never hits this wall only because its
full-batch path is multi-node-partitioned from the start (graph.hpp:2535).

The TRIGGER and the CHUNK SIZE are separate knobs: the direct path is the
fastest whenever it fits (11.9M edges × 128 feats = 1.5 G elements runs
direct at 1.28 s/epoch, docs/PERF.md), so the trigger stays high (2 G
elements ≈ 12+ GB of message temps); once chunking engages, each chunk is
sized to keep its temps around ~1 GB (256 M elements).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.vma import match_cotangent_vma

# direct path allowed up to this many E·F elements (≈2G ⇒ ~12 GB of live
# message temps at f32-backward — the v5e ceiling); SGNN_SPMM_DIRECT_ELEMS
# overrides (tests force tiny values to exercise chunking).
_DIRECT_ELEMS = int(os.environ.get("SGNN_SPMM_DIRECT_ELEMS",
                                   2 * 1024 * 1024 * 1024))
# [E, F] element budget for one materialized message chunk (f32 ≈ 1 GiB);
# override with SGNN_SPMM_CHUNK_ELEMS for tuning/tests.
_CHUNK_ELEMS = int(os.environ.get("SGNN_SPMM_CHUNK_ELEMS", 256 * 1024 * 1024))


# lower bound on the edge-chunk length (tests shrink it to force genuinely
# multi-chunk programs on small graphs)
_CHUNK_FLOOR = 8192


def _eff_feat(feat: int) -> int:
    """TILE-PADDED feature width: TPU tiling pads an array's minor dim to
    128 lanes, so an [E, F<128] message temp occupies (and moves)
    ceil(F/128)·128 lanes of HBM per row.  Budgeting on the LOGICAL width
    let narrow-F whole-graph layers stay on the direct path far past the
    memory they actually consume — measured: the F=41 classification-layer
    SpMM at 23.8M edges ran direct in 4.5 s while the F=128 layer ran
    chunked+windowed in 0.42 s (docs/PERF.md round 3)."""
    return -(-max(feat, 1) // 128) * 128


def _edge_chunk(e_total: int, feat: int, live_factor: int = 1) -> int | None:
    """Chunk length (edges) or None when the direct path fits the budget.

    Budgets count TILE-PADDED elements (`_eff_feat`).  `live_factor`
    scales the element count by how many [E, F]-sized temps the caller's
    direct path keeps alive RELATIVE to the single-head forward the budget
    was calibrated on.  The multi-head paths pass 3: their direct path
    materializes x[src] reshaped, the att-weighted product, and an f32
    copy as SEPARATE [E, H, Fh] buffers (measured OOM: 4-head GAT serving
    at 11.9M edges x 128 feats compiled to a 24.3 GB program on the 17 GB
    v5e while the single-head pass fit)."""
    eff = _eff_feat(feat)
    if e_total * eff * live_factor <= max(_DIRECT_ELEMS, _CHUNK_ELEMS):
        return None
    return max(_CHUNK_ELEMS // eff, _CHUNK_FLOOR)


def _shrink_chunk_divisor(plan_chunk: int, target: int) -> int:
    """Shrink a PLAN chunk toward `target` while keeping it an exact
    divisor of the plan chunk.

    The head-blocked multihead paths scan with a smaller chunk than the
    plan's (wider tile ⇒ same element budget at fewer edges) but reuse the
    plan's dst_span/src_span, which were measured over plan.chunk-aligned
    edge runs.  A sub-chunk that straddles a measured boundary can span
    more rows than the window, and _window_ids would then clamp REAL edges
    onto wrong rows — silently wrong outputs/grads.  Divisor sub-chunks
    tile the measured runs exactly, and any contiguous sub-run's span is
    ≤ its parent run's span, so the plan's windows stay valid."""
    if target >= plan_chunk:
        return plan_chunk
    n = -(-plan_chunk // target)          # ceil: number of sub-chunks
    while plan_chunk % n:
        n += 1
    return plan_chunk // n


def _pad_chunks(arrs, e_total: int, chunk: int, fills=None):
    """Pad [E]/[E, ...] edge arrays to a multiple of `chunk` and reshape to
    [n_chunks, chunk, ...].  Padding edges carry weight 0 and point at slot
    0 — the same nothing-contributes convention as the COO padding.  When an
    index array is claimed sorted (`indices_are_sorted=True` downstream), its
    `fill` must be the max segment id so the claim stays true in the tail."""
    n = -(-e_total // chunk)
    pad = n * chunk - e_total
    out = []
    for i, a in enumerate(arrs):
        if pad:
            fill = 0 if fills is None else fills[i]
            a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                        constant_values=fill)
        out.append(a.reshape((n, chunk) + a.shape[1:]))
    return out


# ---------------------------------------------------------------------------
# Destination-range window plans.  The reference's full-batch engines never
# touch a whole [V, F] accumulator per chunk: each CSC_segment_pinned chunk
# covers a BOUNDED destination row range (core/GraphSegment.h:60, CHUNK_LENGTH
# core/graph.hpp:67), so chunked cost is linear in E.  The sorted whole-graph
# COO here gives the same property for free: a run of `chunk` consecutive
# dst-sorted edges spans a bounded dst-id window (and the CSR-permuted view a
# bounded src-id window).  A host-side SpmmPlanner measures the worst-case
# window ONCE per (graph, chunk length); the chunked scans then accumulate
# each chunk into a [window, F] slice via dynamic_update_slice instead of
# adding a full [num_rows, F] segment_sum — per-chunk cost O(chunk·F +
# window·F), so whole-graph training/serving scales with E, not E·V.
# Measured consequence of the old full-accumulator chunking: 6x epoch cost
# for 2x edges the moment chunking engaged (docs/PERF.md scale sweep).


class SpmmPlan(NamedTuple):
    """Static (hashable) chunk plan for the sorted SpMM family."""

    chunk: int      # edges per scan chunk
    dst_span: int   # max dst-id window of any chunk (sublane-aligned)
    src_span: int   # max src-id window of any CSR-ordered chunk


def _chunk_span(ids: np.ndarray, chunk: int, num_segments: int) -> int:
    """Max id-span of any length-`chunk` slice of a sorted host id array,
    +8 because window starts are aligned DOWN to a sublane multiple, rounded
    up to a multiple of 8 and clamped to num_segments."""
    e = ids.size
    if e == 0:
        return min(8, max(num_segments, 1))
    n = -(-e // chunk)
    starts = ids[np.arange(n, dtype=np.int64) * chunk]
    ends = ids[np.minimum(np.arange(1, n + 1, dtype=np.int64) * chunk, e) - 1]
    span = int((ends.astype(np.int64) - starts.astype(np.int64)).max()) + 1
    span += 8
    return min(-(-span // 8) * 8, max(num_segments, 1))


class SpmmPlanner:
    """Host-side window planner for a statically double-sorted edge list.

    Built once per graph from the arrays the ops will actually see:
    `dst_csc` (ascending; only the first `e_real` entries are real — the
    weight-0 padding tail at num_dst-1 is excluded from span measurement and
    handled by runtime clamping) and `src_csr` = src[perm] (ascending;
    weight-0 pads carry src 0 inside the first block and never inflate a
    span).  `plan(feat)` returns None when the direct path fits the element
    budget (same rule as `_edge_chunk`) or an SpmmPlan for the chunk length
    the op will pick.
    """

    def __init__(self, dst_csc: np.ndarray, src_csr: np.ndarray,
                 num_src: int, num_dst: int,
                 e_real: Optional[int] = None) -> None:
        dst = np.asarray(dst_csc)
        self._e_pad = int(dst.size)
        e_real = int(e_real) if e_real is not None else self._e_pad
        self._dst = dst[:e_real]
        self._src = np.asarray(src_csr)
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self._cache: dict = {}

    def _spans(self, chunk: int) -> SpmmPlan:
        return SpmmPlan(
            chunk=int(chunk),
            dst_span=_chunk_span(self._dst, chunk, self.num_dst),
            src_span=_chunk_span(self._src, chunk, self.num_src),
        )

    def plan(self, feat: int, live_factor: int = 1) -> Optional[SpmmPlan]:
        key = ("ef", int(feat), int(live_factor))
        if key not in self._cache:
            chunk = _edge_chunk(self._e_pad, feat, live_factor)
            self._cache[key] = None if chunk is None else self._spans(chunk)
        return self._cache[key]

    def plan_hm(self, fh: int) -> Optional[SpmmPlan]:
        """Plan for the head-major per-head [*, fh] SpMMs (`_hm_chunk`)."""
        key = ("hm", int(fh))
        if key not in self._cache:
            chunk = _hm_chunk(self._e_pad, fh)
            self._cache[key] = None if chunk is None else self._spans(chunk)
        return self._cache[key]

    def softmax_starts(self) -> np.ndarray:
        """[num_dst] int32 first-edge position of every destination in the
        sorted edge list (vertices with no in-edges get their successor's
        position — `broadcast_dst_sorted`'s telescoping scatter-ADD makes
        that exact).  Host-computed once; enters traced code as a ~4·V-byte
        constant.  Feeds the gather-free GAT attention path
        (docs/PERF.md round-3 GAT serving profile)."""
        if "softmax_starts" not in self._cache:
            self._cache["softmax_starts"] = np.searchsorted(
                self._dst, np.arange(self.num_dst, dtype=self._dst.dtype),
                side="left",
            ).astype(np.int32)
        return self._cache["softmax_starts"]


class ShardedSpmmPlanner(SpmmPlanner):
    """SpmmPlanner over STACKED per-shard edge lists ([n, E_pad] rows).

    One shard_map program serves every shard, so the window must cover the
    worst shard: spans are the max of per-shard spans, each measured on the
    shard's REAL edge prefix (`e_real[p]`) — per-shard weight-0 tails
    (dst fill rows-1, CSR src fill) are excluded from measurement and
    clamp at runtime like any pad."""

    def __init__(self, dst_rows: np.ndarray, src_csr_rows: np.ndarray,
                 num_src: int, num_dst: int, e_real) -> None:
        self._dst_rows = np.asarray(dst_rows)
        self._src_rows = np.asarray(src_csr_rows)
        self._e_real = [int(e) for e in e_real]
        self._e_pad = int(self._dst_rows.shape[1])
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self._cache = {}

    def softmax_starts(self) -> np.ndarray:
        """[n, num_dst] int32 per-shard first-edge positions (stacked
        edition of SpmmPlanner.softmax_starts): row p is searchsorted over
        shard p's FULL padded dst row — the weight-0 pad tail sits at
        num_dst-1, keeping the row ascending, and pad edges are masked by
        `valid` wherever the broadcast result is consumed.  Feeds the
        sharded gather-free GAT attention (parallel/halo.sharded_gat_layer
        fast path, one stacked static operand through shard_map)."""
        if "softmax_starts" not in self._cache:
            n = self._dst_rows.shape[0]
            ids = np.arange(self.num_dst, dtype=self._dst_rows.dtype)
            self._cache["softmax_starts"] = np.stack([
                np.searchsorted(self._dst_rows[p], ids, side="left")
                for p in range(n)
            ]).astype(np.int32)
        return self._cache["softmax_starts"]

    def _spans(self, chunk: int) -> SpmmPlan:
        n = self._dst_rows.shape[0]
        dst_span = max(
            _chunk_span(self._dst_rows[p][: self._e_real[p]], chunk,
                        self.num_dst)
            for p in range(n)
        )
        # CSR-ordered src rows: weight-0 pads sit inside the low-src block
        # (fill 0 for all_gather shards / own-row block for targeted) so the
        # full padded row measures safely
        src_span = max(
            _chunk_span(self._src_rows[p], chunk, self.num_src)
            for p in range(n)
        )
        return SpmmPlan(chunk=int(chunk), dst_span=dst_span,
                        src_span=src_span)


def _window_ids(ids: jax.Array, window: int):
    """(window start, clamped local segment ids) for one sorted chunk.

    The start aligns down to a sublane multiple (cheap dynamic slices);
    local ids clamp to window-1 — safe because the planner guarantees every
    REAL edge fits the window and the only clamped edges are weight-0 pads
    (which contribute nothing wherever they land), and the clamp preserves
    the ascending order the sorted segment emitter relies on."""
    r0 = (ids[0] // 8) * 8
    return r0, jnp.minimum(ids - r0, window - 1)


def _window_add(acc: jax.Array, local: jax.Array, r0) -> jax.Array:
    w, f = local.shape
    win = jax.lax.dynamic_slice(acc, (r0, 0), (w, f))
    return jax.lax.dynamic_update_slice(acc, win + local, (r0, 0))


def _acc_init(shape, ref: jax.Array, fill: float = 0.0,
              dtype=jnp.float32) -> jax.Array:
    """Scan-carry accumulator init, made VARYING like `ref`.

    Inside shard_map a literal jnp.zeros carry is unvarying while the body
    updates it with shard-varying data — jax rejects the carry-type
    mismatch.  Adding a zero derived from a varying operand fixes the
    variance without changing the value (folded away by XLA outside
    shard_map)."""
    z = (ref.reshape(-1)[0] * 0).astype(dtype)
    return jnp.full(shape, fill, dtype) + z


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_coo(
    x: jax.Array,        # [S, F] source features
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destination ids
    weight: jax.Array,   # [E] edge weights (0 ⇒ padded edge)
    num_dst: int,
) -> jax.Array:
    """out[d] = Σ_{e: dst[e]=d} weight[e] · x[src[e]]  (full-graph SpMM).

    Forward gathers by src and segment-sums by dst (reference CSC forward);
    backward swaps the roles (reference CSR backward,
    ntsSingleGPUSampleGraphOp.hpp:258).  Both directions chunk the edge
    axis beyond _CHUNK_ELEMS (see module docstring).
    """
    return _spmm_fwd_impl(x, src, dst, weight, num_dst)


def _spmm_fwd_impl(x, src, dst, weight, num_dst):
    chunk = _edge_chunk(src.shape[0], x.shape[1])
    if chunk is None:
        msgs = x[src] * weight[:, None]
        # accumulate in f32: bf16 segment sums lose updates once the running
        # sum exceeds ~256x a summand (high-degree hub vertices)
        out = jax.ops.segment_sum(
            msgs.astype(jnp.float32), dst, num_segments=num_dst
        )
        return out.astype(x.dtype)
    feat = x.shape[1]
    out_dtype = x.dtype
    x = _pad_feat_tile(x)  # narrow-table gathers hit a slow scan lowering
    src_c, dst_c, w_c = _pad_chunks((src, dst, weight), src.shape[0], chunk)

    def body(acc, args):
        s, d, w = args
        m = (x[s] * w[:, None]).astype(jnp.float32)
        return acc + jax.ops.segment_sum(
            m, d, num_segments=num_dst)[:, :feat], None

    acc0 = jnp.zeros((num_dst, feat), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (src_c, dst_c, w_c))
    return out.astype(out_dtype)


def _spmm_fwd(x, src, dst, weight, num_dst):
    return _spmm_fwd_impl(x, src, dst, weight, num_dst), (x, src, dst, weight)


def _spmm_bwd(num_dst, res, g):
    x, src, dst, weight = res
    chunk = _edge_chunk(src.shape[0], x.shape[1])
    if chunk is None:
        ge = g[dst] * weight[:, None]                       # [E, F]
        dx = jax.ops.segment_sum(
            ge.astype(jnp.float32), src, num_segments=x.shape[0]
        ).astype(x.dtype)
        dw = jnp.einsum("ef,ef->e", g[dst], x[src],
                        preferred_element_type=jnp.float32
                        ).astype(weight.dtype)
        return (match_cotangent_vma(dx, x), None, None,
                match_cotangent_vma(dw, weight))
    e_total = src.shape[0]
    feat = x.shape[1]
    out_dtype = x.dtype
    num_src = x.shape[0]
    x = _pad_feat_tile(x)  # narrow-table gathers hit a slow scan lowering
    g = _pad_feat_tile(g)
    src_c, dst_c, w_c = _pad_chunks((src, dst, weight), e_total, chunk)

    def body(acc, args):
        s, d, w = args
        gd = g[d]                                           # [chunk, F]
        ge = (gd * w[:, None]).astype(jnp.float32)
        acc = acc + jax.ops.segment_sum(
            ge, s, num_segments=num_src)[:, :feat]
        dw_c = jnp.einsum("ef,ef->e", gd, x[s],
                          preferred_element_type=jnp.float32)
        return acc, dw_c

    acc0 = jnp.zeros((num_src, feat), jnp.float32)
    dx, dw = jax.lax.scan(body, acc0, (src_c, dst_c, w_c))
    return (match_cotangent_vma(dx.astype(out_dtype), res[0]), None, None,
            match_cotangent_vma(
                dw.reshape(-1)[:e_total].astype(weight.dtype), weight))


spmm_coo.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Sorted-order SpMM: exploits the static CSC/CSR orderings of a WHOLE-graph
# edge list.  The full-batch COO comes straight out of the CSC (edges sorted
# by dst), and the src-sorted permutation is computed ONCE at graph build —
# so both the forward segment sum (by dst) and the backward segment sum (by
# src) can run with `indices_are_sorted=True`, which XLA lowers to a faster
# TPU emitter than the general scatter-add.  This mirrors the reference
# keeping BOTH structures: CSC for forward, CSR for backward
# (ntsSingleGPUSampleGraphOp.hpp:258, coocsc.hpp:82 csc_to_csr) — there the
# CSR buys locality for the scatter; here it buys the sorted-segment emitter.
# The sampled path can NOT use this (per-batch sort costs more than it saves,
# measured in docs/PERF.md); for the full graph the sort is free.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def spmm_coo_csc(
    x: jax.Array,        # [S, F] source features
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destinations, ASCENDING (CSC order;
                         #     weight-0 padding tail must point at num_dst-1)
    weight: jax.Array,   # [E] edge weights (0 ⇒ padded edge)
    perm: jax.Array,     # [E] int32 stable argsort of src (CSR order)
    inv_perm: jax.Array, # [E] int32 inverse of perm
    num_dst: int,
    plan: Optional[SpmmPlan] = None,  # SpmmPlanner window plan → chunked
                                      # scans accumulate into bounded dst/src
                                      # row windows (O(E) total) instead of a
                                      # full [num_rows, F] add per chunk
) -> jax.Array:
    """`spmm_coo` for statically double-sorted whole-graph edge lists."""
    return _spmm_csc_fwd_impl(x, src, dst, weight, num_dst, plan)


def _pad_feat_tile(t: jax.Array) -> jax.Array:
    """Pad a [*, F] array's minor dim up to the 128-lane tile width.

    The chunked/windowed scan bodies hit a SLOW XLA lowering when the
    gathered/scattered minor dim is narrower than a tile: measured on v5e
    at 47.5M edges, the windowed F=41 SpMM ran 3033 ms while the IDENTICAL
    computation padded to 128 lanes ran 738 ms (= the F=128 cost — the
    HBM bytes moved are the same either way, since arrays are (8,128)-
    tiled regardless).  Zero columns flow through weighted sums and
    segment reductions as exact zeros; callers slice the result back.
    See docs/PERF.md round-3 'narrow-width windowed SpMM' entry."""
    f = t.shape[-1]
    eff = _eff_feat(f)
    if f == eff:
        return t
    return jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, eff - f)])


def _spmm_csc_fwd_impl(x, src, dst, weight, num_dst, plan=None):
    # weight multiplies under jnp promotion (f32 weights promote bf16 rows
    # to f32 messages) — identical arithmetic to spmm_coo.  int8-quantized
    # x (FEATURE_DTYPE:int8 refresh paths) returns f32: weighted sums are
    # not representable in the storage dtype.
    out_dtype = jnp.float32 if x.dtype == jnp.int8 else x.dtype
    feat = x.shape[1]
    chunk = plan.chunk if plan is not None else _edge_chunk(
        src.shape[0], feat)
    if chunk is None:
        msgs = x[src] * weight[:, None]
        out = jax.ops.segment_sum(
            msgs.astype(jnp.float32), dst, num_segments=num_dst,
            indices_are_sorted=True,
        )
        return out.astype(out_dtype)
    # narrow-table GATHERS hit a slow scan lowering (_pad_feat_tile) — pad
    # the gathered table only; the per-chunk [window, F] reduction slices
    # back to `feat` so accumulators stay NARROW (the padded-accumulator
    # variant measured the same 738-749 ms but OOM'd scale-2 training)
    x = _pad_feat_tile(x)
    src_c, dst_c, w_c = _pad_chunks(
        (src, dst, weight), src.shape[0], chunk, fills=(0, num_dst - 1, 0))
    if plan is not None:
        window = plan.dst_span

        def bodyw(acc, args):
            s, d, w = args
            r0, dl = _window_ids(d, window)
            m = (x[s] * w[:, None]).astype(jnp.float32)
            local = jax.ops.segment_sum(
                m, dl, num_segments=window, indices_are_sorted=True)
            return _window_add(acc, local[:, :feat], r0), None

        acc0 = _acc_init((num_dst + window, feat), weight)
        out, _ = jax.lax.scan(bodyw, acc0, (src_c, dst_c, w_c))
        return out[:num_dst].astype(out_dtype)

    def body(acc, args):
        s, d, w = args
        m = (x[s] * w[:, None]).astype(jnp.float32)
        return acc + jax.ops.segment_sum(
            m, d, num_segments=num_dst, indices_are_sorted=True)[:, :feat], \
            None

    acc0 = jnp.zeros((num_dst, feat), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (src_c, dst_c, w_c))
    return out.astype(out_dtype)


def _spmm_csc_fwd(x, src, dst, weight, perm, inv_perm, num_dst, plan=None):
    return (_spmm_csc_fwd_impl(x, src, dst, weight, num_dst, plan),
            (x, src, dst, weight, perm, inv_perm))


def _spmm_csc_bwd(num_dst, plan, res, g):
    dx, _, _, dw, _, _ = _spmm_csc_bwd_impl(num_dst, plan, res, g)
    return (match_cotangent_vma(dx, res[0]), None, None,
            match_cotangent_vma(dw, res[3]), None, None)


def _spmm_csc_bwd_impl(num_dst, plan, res, g):
    x, src, dst, weight, perm, inv_perm = res
    # CSR-order views: [E] int32 gathers, trivially cheap next to the [E, F]
    # row work; sp is ascending so the dx segment sum runs sorted too.
    sp, dp, wp = src[perm], dst[perm], weight[perm]
    num_src = x.shape[0]
    chunk = plan.chunk if plan is not None else _edge_chunk(
        src.shape[0], x.shape[1])
    if chunk is None:
        gd = g[dp]                                           # [E, F]
        ge = (gd * wp[:, None]).astype(jnp.float32)
        dx = jax.ops.segment_sum(
            ge, sp, num_segments=num_src, indices_are_sorted=True
        ).astype(x.dtype)
        dw_p = jnp.einsum("ef,ef->e", gd, x[sp],
                          preferred_element_type=jnp.float32)
        dw = dw_p[inv_perm].astype(weight.dtype)  # back to caller edge order
        return dx, None, None, dw, None, None
    e_total = src.shape[0]
    feat = x.shape[1]
    out_dtype = x.dtype
    # narrow-table GATHERS hit a slow scan lowering (_pad_feat_tile); the
    # zero columns contribute exact zeros to dx/dw, reductions slice back
    # so accumulators stay narrow
    x = _pad_feat_tile(x)
    g = _pad_feat_tile(g)
    sp_c, dp_c, wp_c = _pad_chunks(
        (sp, dp, wp), e_total, chunk, fills=(num_src - 1, 0, 0))
    if plan is not None:
        window = plan.src_span

        def bodyw(acc, args):
            s, d, w = args
            r0, sl = _window_ids(s, window)
            gd = g[d]
            ge = (gd * w[:, None]).astype(jnp.float32)
            local = jax.ops.segment_sum(
                ge, sl, num_segments=window, indices_are_sorted=True)
            acc = _window_add(acc, local[:, :feat], r0)
            dw_c = jnp.einsum("ef,ef->e", gd, x[s],
                              preferred_element_type=jnp.float32)
            return acc, dw_c

        acc0 = _acc_init((num_src + window, feat), g)
        dx, dw_p = jax.lax.scan(bodyw, acc0, (sp_c, dp_c, wp_c))
        dw = dw_p.reshape(-1)[:e_total][inv_perm].astype(weight.dtype)
        return (dx[:num_src].astype(out_dtype), None, None, dw,
                None, None)

    def body(acc, args):
        s, d, w = args
        gd = g[d]
        ge = (gd * w[:, None]).astype(jnp.float32)
        acc = acc + jax.ops.segment_sum(
            ge, s, num_segments=num_src, indices_are_sorted=True)[:, :feat]
        dw_c = jnp.einsum("ef,ef->e", gd, x[s],
                          preferred_element_type=jnp.float32)
        return acc, dw_c

    acc0 = jnp.zeros((num_src, feat), jnp.float32)
    dx, dw_p = jax.lax.scan(body, acc0, (sp_c, dp_c, wp_c))
    dw = dw_p.reshape(-1)[:e_total][inv_perm].astype(weight.dtype)
    return dx.astype(out_dtype), None, None, dw, None, None


spmm_coo_csc.defvjp(_spmm_csc_fwd, _spmm_csc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def spmm_coo_multihead_csc(
    x: jax.Array,        # [S, F] source features, F = H·Fh
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destinations, ASCENDING (CSC)
    att: jax.Array,      # [E, H] per-head edge weights (0 ⇒ padded edge)
    perm: jax.Array,     # [E] int32 stable argsort of src (CSR order)
    inv_perm: jax.Array, # [E] int32 inverse of perm
    num_dst: int,
    plan: Optional[SpmmPlan] = None,  # from SpmmPlanner.plan(F, live=3)
) -> jax.Array:
    """`spmm_coo_multihead` for statically double-sorted edge lists: both
    the forward (by dst) and the dx backward (by src) run as sorted segment
    sums; d_att comes back in caller edge order via inv_perm."""
    return _mh_csc_fwd_impl(x, src, dst, att, num_dst, plan)


def _mh_csc_fwd_impl(x, src, dst, att, num_dst, plan=None):
    e_total, heads = att.shape
    fh = x.shape[1] // heads
    chunk = plan.chunk if plan is not None else _edge_chunk(
        e_total, x.shape[1], live_factor=3)
    if chunk is None:
        msgs = (x[src].reshape(e_total, heads, fh)
                * att[:, :, None].astype(x.dtype))
        out = jax.ops.segment_sum(
            msgs.astype(jnp.float32), dst, num_segments=num_dst,
            indices_are_sorted=True,
        ).astype(x.dtype)
        return out.reshape(num_dst, heads * fh)
    src_c, dst_c, att_c = _pad_chunks(
        (src, dst, att), e_total, chunk, fills=(0, num_dst - 1, 0))
    if plan is not None:
        window = plan.dst_span

        def bodyw(acc, args):
            s, d, a = args
            r0, dl = _window_ids(d, window)
            m = (x[s].reshape(chunk, heads, fh)
                 * a[:, :, None].astype(x.dtype)).astype(jnp.float32)
            local = jax.ops.segment_sum(
                m.reshape(chunk, heads * fh), dl, num_segments=window,
                indices_are_sorted=True)
            return _window_add(acc, local, r0), None

        acc0 = _acc_init((num_dst + window, heads * fh), att)
        out, _ = jax.lax.scan(bodyw, acc0, (src_c, dst_c, att_c))
        return out[:num_dst].astype(x.dtype)

    def body(acc, args):
        s, d, a = args
        m = (x[s].reshape(chunk, heads, fh)
             * a[:, :, None].astype(x.dtype)).astype(jnp.float32)
        return acc + jax.ops.segment_sum(
            m, d, num_segments=num_dst, indices_are_sorted=True), None

    acc0 = jnp.zeros((num_dst, heads, fh), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (src_c, dst_c, att_c))
    return out.astype(x.dtype).reshape(num_dst, heads * fh)


def _mh_csc_fwd(x, src, dst, att, perm, inv_perm, num_dst, plan=None):
    return (_mh_csc_fwd_impl(x, src, dst, att, num_dst, plan),
            (x, src, dst, att, perm, inv_perm))


def _mh_csc_bwd(num_dst, plan, res, g):
    dx, _, _, da, _, _ = _mh_csc_bwd_impl(num_dst, plan, res, g)
    return (match_cotangent_vma(dx, res[0]), None, None,
            match_cotangent_vma(da, res[3]), None, None)


def _mh_csc_bwd_impl(num_dst, plan, res, g):
    x, src, dst, att, perm, inv_perm = res
    e_total, heads = att.shape
    fh = x.shape[1] // heads
    num_src = x.shape[0]
    sp, dp, attp = src[perm], dst[perm], att[perm]
    g2 = g.reshape(num_dst, heads, fh)
    chunk = plan.chunk if plan is not None else _edge_chunk(
        e_total, x.shape[1], live_factor=3)
    if chunk is None:
        gd = g2[dp]                                        # [E, H, Fh]
        ge = (gd * attp[:, :, None].astype(g.dtype)).astype(jnp.float32)
        dx = jax.ops.segment_sum(
            ge.reshape(e_total, heads * fh), sp, num_segments=num_src,
            indices_are_sorted=True,
        ).astype(x.dtype)
        da_p = jnp.einsum("ehf,ehf->eh", gd,
                          x[sp].reshape(e_total, heads, fh),
                          preferred_element_type=jnp.float32)
        da = da_p[inv_perm].astype(att.dtype)
        return dx, None, None, da, None, None
    sp_c, dp_c, attp_c = _pad_chunks(
        (sp, dp, attp), e_total, chunk, fills=(num_src - 1, 0, 0))
    if plan is not None:
        window = plan.src_span

        def bodyw(acc, args):
            s, d, a = args
            r0, sl = _window_ids(s, window)
            gd = g2[d]
            ge = (gd * a[:, :, None].astype(g.dtype)).astype(jnp.float32)
            local = jax.ops.segment_sum(
                ge.reshape(chunk, heads * fh), sl, num_segments=window,
                indices_are_sorted=True)
            acc = _window_add(acc, local, r0)
            da_c = jnp.einsum("ehf,ehf->eh", gd,
                              x[s].reshape(chunk, heads, fh),
                              preferred_element_type=jnp.float32)
            return acc, da_c

        acc0 = _acc_init((num_src + window, heads * fh), g)
        dx, da_p = jax.lax.scan(bodyw, acc0, (sp_c, dp_c, attp_c))
        da = da_p.reshape(-1, heads)[:e_total][inv_perm].astype(att.dtype)
        return dx[:num_src].astype(x.dtype), None, None, da, None, None

    def body(acc, args):
        s, d, a = args
        gd = g2[d]
        ge = (gd * a[:, :, None].astype(g.dtype)).astype(jnp.float32)
        acc = acc + jax.ops.segment_sum(
            ge.reshape(chunk, heads * fh), s, num_segments=num_src,
            indices_are_sorted=True)
        da_c = jnp.einsum("ehf,ehf->eh", gd, x[s].reshape(chunk, heads, fh),
                          preferred_element_type=jnp.float32)
        return acc, da_c

    acc0 = jnp.zeros((num_src, heads * fh), jnp.float32)
    dx, da_p = jax.lax.scan(body, acc0, (sp_c, dp_c, attp_c))
    da = da_p.reshape(-1, heads)[:e_total][inv_perm].astype(att.dtype)
    return dx.astype(x.dtype), None, None, da, None, None


spmm_coo_multihead_csc.defvjp(_mh_csc_fwd, _mh_csc_bwd)


def spmm_coo_fwd_sorted(x, src, dst, weight, num_dst, plan=None):
    """Forward-only sorted SpMM: `dst` must be ascending (CSC order, padding
    tail at num_dst-1).  For inference/serving paths that never take grads —
    under autodiff this still differentiates correctly (segment_sum's VJP is
    a gather; x[src]'s is a scatter-add), just without the sorted-backward
    speedup of spmm_coo_csc.  `plan` (SpmmPlanner) bounds chunked
    accumulation to dst windows, making serving passes linear in E."""
    return _spmm_csc_fwd_impl(x, src, dst, weight, num_dst, plan)


def segment_softmax_coo(
    scores: jax.Array, dst: jax.Array, valid: jax.Array, num_dst: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically-stable softmax over each destination's edge segment.

    Reference `SingleEdgeSoftMax` (ntsSingleCPUGraphOp.hpp) / CUDA
    block-per-dst kernel (ntsCUDADistKernel.cuh:319), COO edition.
    Pass `indices_are_sorted=True` only when `dst` is ascending (the
    whole-graph CSC order) — invalid (padded) edges may point anywhere
    since they are masked, but the ids themselves must be sorted.
    """
    if scores.ndim == 2 and valid.ndim == 1:
        valid = valid[:, None]       # [E, H] multi-head scores
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg)
    seg_max = jax.ops.segment_max(
        s, dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted)
    e = jnp.exp(s - jax.lax.stop_gradient(seg_max[dst]))
    e = jnp.where(valid, e, 0.0)
    z = jax.ops.segment_sum(
        e.astype(jnp.float32), dst, num_segments=num_dst,
        indices_are_sorted=indices_are_sorted,
    ).astype(e.dtype)
    return e / jnp.maximum(z[dst], jnp.finfo(scores.dtype).tiny)


def broadcast_dst_sorted(vals: jax.Array, starts, num_edges: int,
                         out_dtype=None) -> jax.Array:
    """[V] → [E] per-destination broadcast over a dst-SORTED edge list
    WITHOUT a per-edge gather: scatter telescoping deltas at each
    destination's first-edge position, then cumsum.  Measured 11.7 ms vs
    92 ms for the equivalent `vals[dst]` gather at E=11.9M on v5e (XLA
    gathers pay the random-access floor even on sorted indices —
    docs/PERF.md round-3 GAT profile).

    Exactness: scatter-ADD makes empty destinations telescope correctly
    (consecutive deltas at the same position sum to the jump across them);
    the cumsum runs in f32 and its roundoff is CONSTANT within each
    segment (interior positions add exact zeros), so any downstream
    per-destination softmax cancels it exactly — the residual per-edge
    effect enters only through the slope change of leaky_relu and is
    ≤ ~6e-5 absolute (random walk over V f32 adds).

    `starts` is the host-static [V] int32 array from
    `SpmmPlanner.softmax_starts()`."""
    v32 = vals.astype(jnp.float32)
    delta = v32 - jnp.concatenate([jnp.zeros((1,), jnp.float32), v32[:-1]])
    d = jnp.zeros((num_edges,), jnp.float32).at[starts].add(
        delta, indices_are_sorted=True)
    out = jnp.cumsum(d)
    return out.astype(out_dtype or vals.dtype)


# |score| clamp for the max-free attention exponential: exp(60)=1.14e26
# cannot overflow an f32/bf16 sum over any realistic edge count, and
# exp(-60)=8.8e-27 sits far above the smallest f32 normal, so a
# destination whose every in-score is at the low clamp still normalizes
# exactly.  Softmax is shift-invariant, so results equal the max-shifted
# form whenever |score| < 60; beyond it attention is one-hot-saturated
# and the clamp only flattens ties among already-saturated edges.
_ATT_CLIP = 60.0


def attention_exp(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """UNNORMALIZED attention weights exp(clip(s, ±60)) with invalid-edge
    masking — the per-destination max pass (a 114 ms [E]→[V] segment_max
    plus a 92 ms [E] broadcast-back at Reddit scale) is unnecessary for
    numerical safety once scores are clamped (see _ATT_CLIP).  Pair with a
    per-destination weight sum and divide AFTER aggregation:
        u = attention_exp(s, valid)
        h = spmm(x, u) / max(segment_sum(u, dst), tiny)[:, None]
    """
    s = jnp.clip(scores, -_ATT_CLIP, _ATT_CLIP)
    return jnp.where(valid, jnp.exp(s), jnp.zeros((), scores.dtype))


def spmm_coo_multihead(
    x: jax.Array,        # [S, F] source features, F = H·Fh
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destination ids
    att: jax.Array,      # [E, H] per-head edge weights (0 ⇒ padded edge)
    num_dst: int,
    indices_are_sorted: bool = False,  # dst ascending (pad at num_dst-1)
) -> jax.Array:
    """Multi-head SpMM: head h weights its own F/H feature block.

    out[d, h·Fh:(h+1)·Fh] = Σ_{e: dst[e]=d} att[e,h] · x[src[e], h·Fh:...].
    Autodiffed (segment_sum's VJP is the gather/scatter pair spmm_coo
    hand-writes; scan's VJP chunks the backward exactly like the forward);
    used by the multi-head COO GAT paths.  The sorted hint only affects
    the forward segment sum (its VJP is a gather), so it is autodiff-safe.
    """
    e_total, heads = att.shape
    fh = x.shape[1] // heads
    chunk = _edge_chunk(e_total, x.shape[1], live_factor=3)
    if chunk is None:
        msgs = (x[src].reshape(e_total, heads, fh)
                * att[:, :, None].astype(x.dtype))
        out = jax.ops.segment_sum(
            msgs.astype(jnp.float32), dst, num_segments=num_dst,
            indices_are_sorted=indices_are_sorted,
        ).astype(x.dtype)
        return out.reshape(num_dst, heads * fh)
    src_c, dst_c, att_c = _pad_chunks(
        (src, dst, att), e_total, chunk,
        fills=(0, num_dst - 1 if indices_are_sorted else 0, 0))

    def body(acc, args):
        s, d, a = args
        m = (x[s].reshape(chunk, heads, fh)
             * a[:, :, None].astype(x.dtype)).astype(jnp.float32)
        return acc + jax.ops.segment_sum(
            m, d, num_segments=num_dst,
            indices_are_sorted=indices_are_sorted), None

    acc0 = jnp.zeros((num_dst, heads, fh), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (src_c, dst_c, att_c))
    return out.astype(x.dtype).reshape(num_dst, heads * fh)


# ---------------------------------------------------------------------------
# HEAD-MAJOR multi-head attention ops.  TPU tiling pads an f32 array's minor
# dim to 128 (second-minor to 8), so an edge-major [E, H] score/attention
# array wastes 128/H x HBM — measured: 4-head whole-graph GAT serving at
# 11.9M edges compiled [E, 4] f32 temps of 5.67 GB each (181 MB unpadded,
# 32x tile padding) and OOM'd the 16 GB chip.  Head-major [H, E] keeps E in
# the minor dim (perfectly tiled) and pads only H→8.  These variants power
# the WHOLE-GRAPH multi-head path (full_forward heads>1); the edge-major
# ops above remain for bounded-E chunk-local callers.


def gather_rows_hm(
    table: jax.Array,    # [V, H] per-vertex per-head values (H small)
    idx: jax.Array,      # [E] int32 vertex ids
    plan: Optional[SpmmPlan] = None,
) -> jax.Array:
    """[H, E] head-major per-edge gather of a narrow per-head table.

    Packs H per-head scalar gathers (H x ~8 ns/edge each at Reddit scale)
    into ONE lane-padded row gather (~11 ns/edge): the [V, H] table pads
    to the 128-lane tile (narrow gathers hit the slow lowering,
    _pad_feat_tile) and each chunk transposes its [chunk, H] slice to
    head-major — no [E, H] edge-major temp ever materializes at full
    length.  Win for H >= 2; callers keep the scalar path for H == 1.
    Feeds the multi-head GAT attention scores (fullbatch.full_forward).
    Differentiable as plain jax ops (gather VJP = scatter-add)."""
    e_total = idx.shape[0]
    h = table.shape[1]
    tp = _pad_feat_tile(table)
    chunk = plan.chunk if plan is not None else _edge_chunk(e_total, 128)
    if chunk is None:
        return tp[idx][:, :h].T
    (idx_c,) = _pad_chunks((idx,), e_total, chunk, fills=(0,))

    def body(_, ic):
        return None, tp[ic][:, :h].T          # [H, chunk]

    _, ys = jax.lax.scan(body, None, idx_c)   # [n_chunks, H, chunk]
    return jnp.moveaxis(ys, 0, 1).reshape(h, -1)[:, :e_total]


def segment_softmax_hm(
    scores: jax.Array,   # [H, E] head-major edge scores
    dst: jax.Array,      # [E] int32 destinations
    valid: jax.Array,    # [E] bool (False ⇒ padded edge)
    num_dst: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """`segment_softmax_coo` with head-major layout: returns [H, E].

    A Python loop over heads (H is small and static), each head pure 1-D
    [E]/[num_dst] arrays — NOT a vmap: vmap's scatter batching rule and
    axis-1 gathers normalize intermediates back to index-leading [E, H]
    layout, re-creating the 32x tile-padded temps this op exists to
    avoid (confirmed in an OOM dump: the vmap edition still compiled
    f32[11.9M, 4] gather temps of 5.67 GB)."""
    return jnp.stack([
        segment_softmax_coo(scores[i], dst, valid, num_dst,
                            indices_are_sorted=indices_are_sorted)
        for i in range(scores.shape[0])
    ])


def _hm_chunk(e_total: int, fh: int) -> int | None:
    """Chunk length for the per-head [chunk, fh] message temps, counting
    TILE-PADDED elements (minor dim rounds up to 128) with 2 live temps."""
    eff = -(-max(fh, 1) // 128) * 128
    if e_total * eff * 2 <= max(_DIRECT_ELEMS, _CHUNK_ELEMS):
        return None
    return max(_CHUNK_ELEMS // eff, _CHUNK_FLOOR)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def spmm_coo_multihead_hm(
    x: jax.Array,        # [S, F] source features, F = H·Fh
    src: jax.Array,      # [E] int32 edge source ids
    dst: jax.Array,      # [E] int32 edge destination ids
    att_hm: jax.Array,   # [H, E] HEAD-MAJOR per-head edge weights
    num_dst: int,
    indices_are_sorted: bool = False,
    plan: Optional[SpmmPlan] = None,  # SpmmPlanner.plan_hm(fh); needs
                                      # indices_are_sorted=True (CSC order)
    perm: Optional[jax.Array] = None,      # [E] CSR order (argsort of src) —
    inv_perm: Optional[jax.Array] = None,  # lets the planned BACKWARD window
                                           # its src accumulation too
) -> jax.Array:
    """`spmm_coo_multihead` with head-major attention: H per-head flat
    SpMMs over [*, Fh] slices (never an [E, H(, Fh)] edge-major temp),
    each edge-chunked on tile-padded element counts.  Hand-written VJP
    keeps the backward chunked the same way.

    With `plan`, each chunk accumulates into a bounded dst window
    (forward); pass `perm`/`inv_perm` as well so the backward dx runs over
    src windows in CSR order (otherwise the planned backward falls back to
    the full [S, Fh] accumulator per head)."""
    return _hm_fwd_impl(x, src, dst, att_hm, num_dst, indices_are_sorted,
                        plan)


def _head_cols(a_chunk, fh: int, width: int, dtype):
    """[chunk, H] per-head weights → [chunk, width] column-expanded mask
    matching the CONCATENATED head layout (head i owns columns
    [i·fh, (i+1)·fh); pad columns beyond H·fh are zero)."""
    rep = jnp.repeat(a_chunk.astype(dtype), fh, axis=1)
    pad = width - rep.shape[1]
    if pad:
        rep = jnp.pad(rep, ((0, 0), (0, pad)))
    return rep


def _hm_fwd_impl(x, src, dst, att_hm, num_dst, indices_are_sorted,
                 plan=None):
    heads = att_hm.shape[0]
    fh = x.shape[1] // heads
    e_total = src.shape[0]
    chunk = plan.chunk if plan is not None else _hm_chunk(e_total, fh)
    windowed = plan is not None and indices_are_sorted
    # HEAD-BLOCKED path (VERDICT r3 #5): whenever ONE gather of the
    # concatenated [chunk, pad128(H·fh)] layout moves fewer bytes than H
    # sequential gathers of tile-padded [chunk, pad128(fh)] slabs (fh=32
    # pads 4x; 4 heads plus the z-rides-free ones-column pad only 2x),
    # run one windowed scan expanding the per-head weights to columns.
    # The chunk shrinks to keep the SAME element budget at the wider
    # tile — smaller chunks keep the plan's measured window spans valid.
    # Measured: 4-head GAT resident pass 1.773 → see docs/PERF.md round
    # 4.  Reference analog: block-per-dst multi-head kernels,
    # cuda/ntsCUDADistKernel.cuh:319.
    eff_hb = _eff_feat(heads * fh)
    if (heads > 1 and eff_hb < heads * _eff_feat(fh) and windowed
            and chunk is not None):
        chunk = _shrink_chunk_divisor(
            chunk, max(_CHUNK_ELEMS // eff_hb, _CHUNK_FLOOR))
        window = plan.dst_span
        f = heads * fh
        xp = _pad_feat_tile(x)
        sc, dc, ac = _pad_chunks(
            (src, dst, att_hm.T), e_total, chunk,
            fills=(0, num_dst - 1, 0))

        def bodyhb(acc, args):
            s, d, a = args
            r0, dl = _window_ids(d, window)
            cols = _head_cols(a, fh, xp.shape[1], xp.dtype)
            m = (xp[s] * cols).astype(jnp.float32)
            local = jax.ops.segment_sum(
                m, dl, num_segments=window, indices_are_sorted=True)
            return _window_add(acc, local[:, :f], r0), None

        o, _ = jax.lax.scan(
            bodyhb, _acc_init((num_dst + window, f), att_hm), (sc, dc, ac))
        return o[:num_dst].astype(x.dtype)
    outs = []
    for i in range(heads):
        xi = x[:, i * fh:(i + 1) * fh]
        ai = att_hm[i]
        if chunk is None:
            m = (xi[src] * ai[:, None].astype(xi.dtype)).astype(jnp.float32)
            o = jax.ops.segment_sum(m, dst, num_segments=num_dst,
                                    indices_are_sorted=indices_are_sorted)
        elif windowed:
            window = plan.dst_span
            # narrow-table gathers hit a slow scan lowering; reductions
            # slice back so accumulators stay narrow (_pad_feat_tile)
            xi = _pad_feat_tile(xi)
            sc, dc, ac = _pad_chunks(
                (src, dst, ai), e_total, chunk, fills=(0, num_dst - 1, 0))

            def bodyw(acc, args, xi=xi):
                s, d, a = args
                r0, dl = _window_ids(d, window)
                m = (xi[s] * a[:, None].astype(xi.dtype)).astype(jnp.float32)
                local = jax.ops.segment_sum(
                    m, dl, num_segments=window, indices_are_sorted=True)
                return _window_add(acc, local[:, :fh], r0), None

            o, _ = jax.lax.scan(
                bodyw, _acc_init((num_dst + window, fh), ai),
                (sc, dc, ac))
            o = o[:num_dst]
        else:
            xi = _pad_feat_tile(xi)
            sc, dc, ac = _pad_chunks(
                (src, dst, ai), e_total, chunk,
                fills=(0, num_dst - 1 if indices_are_sorted else 0, 0))

            def body(acc, args, xi=xi):
                s, d, a = args
                m = (xi[s] * a[:, None].astype(xi.dtype)).astype(jnp.float32)
                return acc + jax.ops.segment_sum(
                    m, d, num_segments=num_dst,
                    indices_are_sorted=indices_are_sorted)[:, :fh], None

            o, _ = jax.lax.scan(body, jnp.zeros((num_dst, fh), jnp.float32),
                                (sc, dc, ac))
        outs.append(o.astype(x.dtype))
    return jnp.concatenate(outs, axis=1)


def _hm_fwd(x, src, dst, att_hm, num_dst, indices_are_sorted, plan=None,
            perm=None, inv_perm=None):
    return (_hm_fwd_impl(x, src, dst, att_hm, num_dst, indices_are_sorted,
                         plan),
            (x, src, dst, att_hm, perm, inv_perm))


def _hm_bwd(num_dst, indices_are_sorted, plan, res, g):
    dx, _, _, da, _, _ = _hm_bwd_impl(num_dst, indices_are_sorted, plan,
                                      res, g)
    return (match_cotangent_vma(dx, res[0]), None, None,
            match_cotangent_vma(da, res[3]), None, None)


def _hm_bwd_impl(num_dst, indices_are_sorted, plan, res, g):
    x, src, dst, att_hm, perm, inv_perm = res
    heads = att_hm.shape[0]
    fh = x.shape[1] // heads
    e_total = src.shape[0]
    num_src = x.shape[0]
    chunk = plan.chunk if plan is not None else _hm_chunk(e_total, fh)
    eff_hb = _eff_feat(heads * fh)
    if (heads > 1 and eff_hb < heads * _eff_feat(fh) and chunk is not None
            and plan is not None and indices_are_sorted
            and perm is not None):
        # head-blocked CSR backward (see _hm_fwd_impl): one windowed scan
        # over the concatenated [chunk, H·fh] layout for BOTH dx and da
        chunk = _shrink_chunk_divisor(
            chunk, max(_CHUNK_ELEMS // eff_hb, _CHUNK_FLOOR))
        window = plan.src_span
        f = heads * fh
        sp, dp = src[perm], dst[perm]
        xp, gp = _pad_feat_tile(x), _pad_feat_tile(g)
        sc, dc, ac = _pad_chunks(
            (sp, dp, att_hm.T[perm]), e_total, chunk,
            fills=(num_src - 1, 0, 0))

        def bodyhb(acc, args):
            s, d, a = args
            r0, sl = _window_ids(s, window)
            gd = gp[d]
            cols = _head_cols(a, fh, gp.shape[1], gd.dtype)
            ge = (gd * cols).astype(jnp.float32)
            local = jax.ops.segment_sum(
                ge, sl, num_segments=window, indices_are_sorted=True)
            acc = _window_add(acc, local[:, :f], r0)
            # da[i, e] = <g[dst], x[src]> over head i's columns: one
            # elementwise product, per-head partial row sums
            prod = (gd[:, :f] * xp[s][:, :f]).astype(jnp.float32)
            da_c = prod.reshape(prod.shape[0], heads, fh).sum(-1)
            return acc, da_c

        dx, da_p = jax.lax.scan(
            bodyhb, _acc_init((num_src + window, f), g), (sc, dc, ac))
        da = da_p.reshape(-1, heads)[:e_total][inv_perm].T
        return (dx[:num_src].astype(x.dtype), None, None,
                da.astype(att_hm.dtype), None, None)
    if chunk is not None and plan is not None and perm is not None:
        # windowed CSR backward: reorder edges by src once ([E]-int gathers,
        # cheap next to the row work), then each chunk's dx lands in a
        # bounded src window
        window = plan.src_span
        sp, dp = src[perm], dst[perm]
        dxs, das = [], []
        for i in range(heads):
            # narrow-table gathers hit a slow scan lowering — pad the
            # gathered tables only; reductions slice back to fh so the
            # carried accumulator stays narrow (_pad_feat_tile)
            xi = _pad_feat_tile(x[:, i * fh:(i + 1) * fh])
            ap = att_hm[i][perm]
            gi = _pad_feat_tile(g[:, i * fh:(i + 1) * fh])
            sc, dc, ac = _pad_chunks(
                (sp, dp, ap), e_total, chunk, fills=(num_src - 1, 0, 0))

            def bodyw(acc, args, xi=xi, gi=gi):
                s, d, a = args
                r0, sl = _window_ids(s, window)
                gd = gi[d]
                ge = (gd * a[:, None].astype(gd.dtype)).astype(jnp.float32)
                local = jax.ops.segment_sum(
                    ge, sl, num_segments=window, indices_are_sorted=True)
                acc = _window_add(acc, local[:, :fh], r0)
                da_c = jnp.einsum("ef,ef->e", gd, xi[s],
                                  preferred_element_type=jnp.float32)
                return acc, da_c

            dx, da_c = jax.lax.scan(
                bodyw, _acc_init((num_src + window, fh), g),
                (sc, dc, ac))
            dxs.append(dx[:num_src].astype(x.dtype))
            das.append(
                da_c.reshape(-1)[:e_total][inv_perm].astype(att_hm.dtype))
        return (jnp.concatenate(dxs, axis=1), None, None,
                jnp.stack(das, axis=0), None, None)
    dxs, das = [], []
    for i in range(heads):
        xi = x[:, i * fh:(i + 1) * fh]
        ai = att_hm[i]
        gi = g[:, i * fh:(i + 1) * fh]
        if chunk is None:
            gd = gi[dst]
            ge = (gd * ai[:, None].astype(gd.dtype)).astype(jnp.float32)
            dx = jax.ops.segment_sum(ge, src, num_segments=num_src)
            da = jnp.einsum("ef,ef->e", gd, xi[src],
                            preferred_element_type=jnp.float32)
        else:
            xi = _pad_feat_tile(xi)
            gi = _pad_feat_tile(gi)
            sc, dc, ac = _pad_chunks((src, dst, ai), e_total, chunk)

            def body(acc, args, xi=xi, gi=gi):
                s, d, a = args
                gd = gi[d]
                ge = (gd * a[:, None].astype(gd.dtype)).astype(jnp.float32)
                acc = acc + jax.ops.segment_sum(
                    ge, s, num_segments=num_src)[:, :fh]
                da_c = jnp.einsum("ef,ef->e", gd, xi[s],
                                  preferred_element_type=jnp.float32)
                return acc, da_c

            dx, da_c = jax.lax.scan(
                body, jnp.zeros((num_src, fh), jnp.float32), (sc, dc, ac))
            da = da_c.reshape(-1)[:e_total]
        dxs.append(dx.astype(x.dtype))
        das.append(da.astype(att_hm.dtype))
    return (jnp.concatenate(dxs, axis=1), None, None,
            jnp.stack(das, axis=0), None, None)


spmm_coo_multihead_hm.defvjp(_hm_fwd, _hm_bwd)
