"""One-hot MXU attention aggregation: whole-graph GAT on the kernel tier.

Round 4 built the one-hot masked-matmul SpMM (ops/pallas/mxu_spmm.py) but
scoped it to STATIC edge weights, excluding GAT — the assumption was that
per-pass attention weights would need an [E]-sized permutation into tile
order costing what the kernel saves.  This module removes the need for
any per-pass edge permutation: attention weights are computed IN-KERNEL
from per-VERTEX score tables, so the only per-pass device inputs are
[V]-sized vectors.

    score half tables (outside, [V]-vector work):
        ts[v, h] = <h_v, a_src_h>      td[v, h] = <h_v, a_dst_h>
    in-kernel, per sub-tile (same one-hot masks the SpMM kernel builds):
        have = oh_srcᵀ @ ts_slab        # per-edge src half  [e, 8]
        hadd = oh_dstᵀ @ td_window      # per-edge dst half  [e, 8]
        u    = exp(clip(leaky_relu(have + hadd)))            [e, 8]
        out += oh_dst @ ((oh_srcᵀ @ slab) * expand(u))       [w, F]
        z   += oh_dst @ u               # per-dst weight sums [w, 8]
    outside: h[d] = out[d] / z[d, head]   (divide-after-aggregation,
    the max-free attention_exp normalization of ops/segment.py)

Per-edge weights multiply the MESSAGES on the VPU between the two
matmuls (not the one-hot mask), which also generalizes to multi-head for
free: `expand` is a static [8, 128] head→column mask, so one kernel pass
serves H heads of fh = F/H columns at the SAME cost as single-head.

Pad slots carry SENTINEL local ids (s_blk / w_win) instead of weight-0:
their one-hot columns are all-zero, so they contribute nothing to out OR
z — no per-edge mask operand at all.

Mosaic feasibility of every new piece ([e, 8]-lane dot outputs, in-kernel
exp/leaky_relu on computed f32, the head-expansion matmul, dual outputs,
dynamic window reads of the [d_blk, 8] table) verified on the real chip:
scripts/probe_gat_kernel_parts.py (rel err 4.8e-3 vs numpy at bf16).

Reference analog: the CUDA edge-softmax + aggregate kernel family serves
GAT with the same warp-per-destination machinery as GCN/SAGE
(cuda/ntsCUDADistKernel.cuh:319-441, ntsCUDAFuseKernel.cuh:78-515); this
gives the TPU build the matching property — one kernel tier for all
three model families (VERDICT r4 #3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu_spmm import (
    _M_DBLK,
    _M_FIRST,
    _M_HDR,
    _M_SLAB,
    MxuSpmmStatic,
    _interpret_default,
    build_mxu_spmm_plan,
)

_ATT_CLIP = 60.0  # == ops/segment._ATT_CLIP (attention_exp parity)


class MxuGatPlan(NamedTuple):
    """Static tile plan with sentinel-padded edge ids (weights come per
    pass, computed in-kernel from per-vertex tables)."""

    srcs: jax.Array     # [n_chunks, chunk, 1, e_t] i32, pad = s_blk
    dsts: jax.Array     # [n_chunks, chunk, 1, e_t] i32, pad = w_win
    meta: jax.Array     # [n_chunks, chunk, _M_HDR + 2*n_sub] i32
    visited: jax.Array  # [n_chunks, n_db] f32
    static: MxuSpmmStatic

    @property
    def operands(self):
        return self.srcs, self.dsts, self.meta, self.visited


def build_mxu_gat_plan(
    src: np.ndarray, dst: np.ndarray, num_src: int, num_dst: int, **kw,
) -> Optional[MxuGatPlan]:
    """Tile plan over the (unweighted) edge list for in-kernel attention.

    Reuses the SpMM planner with unit weights, then replaces pad slots'
    zero ids with out-of-range sentinels so their one-hot columns vanish
    (pads must contribute nothing to the z sums, which have no weight
    operand to zero them)."""
    src = np.asarray(src)
    base = build_mxu_spmm_plan(
        src, np.asarray(dst), np.ones(src.shape[0], np.float32),
        num_src, num_dst, **kw)
    if base is None:
        return None
    st = base.static
    assert st.s_win == st.s_blk, "GAT kernel runs per-step gather mode"
    live = np.asarray(base.wbits) != 0
    srcs = np.where(live, np.asarray(base.srcs), st.s_blk).astype(np.int32)
    dsts = np.where(live, np.asarray(base.dsts), st.w_win).astype(np.int32)
    return MxuGatPlan(srcs=jnp.asarray(srcs), dsts=jnp.asarray(dsts),
                      meta=base.meta, visited=base.visited, static=st)


def build_mxu_gat_plan_auto(
    src: np.ndarray, dst: np.ndarray, num_src: int, num_dst: int,
    *, margin: float = 0.95, geometries=None,
) -> Optional[MxuGatPlan]:
    """Geometry-ladder plan selection for the attention kernel.

    Mirrors mxu_spmm.build_mxu_spmm_pair_auto: project each geometry's
    cost from its measured SpMM ns/slot rate scaled by the attention
    kernel's overhead (the three extra narrow matmuls + exp measured
    ~1.2x the plain kernel per slot), accept only if it beats the
    windowed fast_att layer's measured per-edge cost."""
    from .mxu_spmm import _estimate_slots

    e_real = int(np.asarray(src).size)
    if e_real == 0:
        return None
    best, best_cost = None, margin * _GAT_WINDOWED_NS_EDGE
    for kw, rate in geometries or _GAT_GEOMETRIES:
        est = _estimate_slots(np.asarray(src), np.asarray(dst), num_src,
                              **kw)
        cost = rate * _GAT_RATE_FACTOR * est / e_real
        if cost < best_cost:
            best, best_cost = (kw, rate), cost
    if best is None:
        return None
    kw, rate = best
    plan = build_mxu_gat_plan(src, dst, num_src, num_dst,
                              max_pad_ratio=6.0, **kw)
    if plan is None:
        return None
    pad = plan.static.n_steps * plan.static.e_t / e_real
    if rate * _GAT_RATE_FACTOR * pad > margin * _GAT_WINDOWED_NS_EDGE:
        return None
    return plan


# The attention kernel's VMEM stack carries more than the SpMM kernel's:
# the [s_blk, e_t] one-hot intermediate PLUS a second output block (z),
# the td table and the score temps.  s_blk=2048 materializes an 8 MB
# one-hot and measured 20.6 MB of scoped vmem (> the 16 MB limit) at
# Reddit scale; d_blk=8192 measured 17 MB.  The ladder therefore stays at
# s_blk=1024 / d_blk=4096 (≈13 MB) — sparser graphs that would want the
# bigger slab fall back to the windowed path via the cost gate below.
# Mosaic double-buffers BOTH output blocks, so d_blk is capped at 4096
# (8192 → 17.0 MB, 6144 → 17.5 MB scoped-vmem stack, limit 16 MB).  The
# pad driver at small dst blocks is per-(dst-block, slab) group rounding
# to whole steps — smaller e_t fights it directly.  Rates are MEASURED
# ns/slot on the chip (scripts/profile_mxu_gat.py sweep, Reddit scale):
# the four narrow [*, 8]-lane matmuls tile-pad to 128 lanes, so the
# attention kernel runs ~6 full MXU passes per sub-tile vs the SpMM
# kernel's 2; e_sub=512 measured WORSE overall (w_win splits push its pad
# to 2.33).  Winner end-to-end: e_t=512 at pad 1.31 → 15.6 ns/edge
# (windowed fast_att: 32.9 single-head / 54.1 4-head — the kernel's cost
# is HEAD-COUNT-INDEPENDENT, one pass serves all heads).
_GAT_GEOMETRIES = (
    (dict(s_blk=1024, d_blk=4096, w_win=1280, e_sub=256, e_t=512), 11.9),
    (dict(s_blk=1024, d_blk=4096, w_win=1280, e_sub=256, e_t=2048), 10.2),
)
# ladder rates above are ABSOLUTE measured ns/slot; the windowed fast_att
# layer cost the kernel must beat is ~32.9 ns/edge single-head / 54.1
# 4-head measured on-chip (scripts/profile_mxu_gat.py) — gate against the
# single-head figure so the kernel only engages where it wins for every
# head count
_GAT_RATE_FACTOR = 1.0
_GAT_WINDOWED_NS_EDGE = 32.9


def _head_expand(heads: int, fh: int) -> jax.Array:
    """Static [8, 128] mask mapping head row h to its fh feature columns."""
    col_head = lax.broadcasted_iota(jnp.int32, (8, 128), 1) // fh
    row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return ((col_head == row) & (col < heads * fh)).astype(jnp.bfloat16)


def _gat_kernel(meta_ref, src_ref, dst_ref, slab_ref, ts_ref, td_ref,
                out_ref, z_ref, *, static: MxuSpmmStatic, heads: int,
                fh: int, neg_slope: float):
    st = static
    n_sub = st.e_t // st.e_sub
    step = pl.program_id(0)

    @pl.when(meta_ref[step, _M_FIRST] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        z_ref[:] = jnp.zeros_like(z_ref)

    # one-hots are built PER SUB-TILE ([s_blk, e_sub] instead of the SpMM
    # kernel's per-step [s_blk, e_t]): the attention kernel also carries a
    # second output block (z), the td table and the score temps, and the
    # 4 MB per-step one-hot pushed the VMEM stack past the 16 MB scoped
    # limit at d_blk=8192 (measured 17.0 MB / 20.6 MB Mosaic OOMs) —
    # shrinking d_blk instead costs far more (pad 1.40 → 2.36 at Reddit
    # scale, nearly doubling the slot count).
    expand = _head_expand(heads, fh)
    rows_s = lax.broadcasted_iota(jnp.int32, (st.s_blk, st.e_sub), 0)
    rows_w = lax.broadcasted_iota(jnp.int32, (st.w_win, st.e_sub), 0)
    for j in range(n_sub):
        sl = slice(j * st.e_sub, (j + 1) * st.e_sub)
        # the planner 8-aligns every window start (_align_down); Mosaic
        # needs the proof spelled out for the narrow td window load
        r0 = pl.multiple_of(meta_ref[step, _M_HDR + j], 8)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, sl], (st.s_blk, st.e_sub))
        oh_s = (rows_s == srcb).astype(jnp.bfloat16)
        msg_j = lax.dot_general(
            oh_s, slab_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                                 # [e_sub, F]
        have = lax.dot_general(
            oh_s, ts_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [e_sub, 8]
        dstb = jnp.broadcast_to(dst_ref[0, 0:1, sl], (st.w_win, st.e_sub))
        oh_d = (rows_w == dstb).astype(jnp.bfloat16)
        td_win = td_ref[0, pl.ds(r0, st.w_win), :]
        hadd = lax.dot_general(
            oh_d, td_win,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [e_sub, 8]
        score = have + hadd
        score = jnp.where(score >= 0, score, neg_slope * score)
        u = jnp.exp(jnp.clip(score, -_ATT_CLIP, _ATT_CLIP))    # f32
        ub = u.astype(jnp.bfloat16)
        ucols = lax.dot_general(
            ub, expand,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                                 # [e_sub, F]
        contrib = lax.dot_general(
            oh_d, msg_j * ucols,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [w_win, F]
        out_ref[0, pl.ds(r0, st.w_win), :] += contrib
        # z summands quantize to bf16 (0.4% each) but ACCUMULATE in f32
        # (preferred_element_type) — and the final division uses the same
        # z for every summand, so the quantization largely cancels
        zc = lax.dot_general(
            oh_d, ub,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [w_win, 8]
        z_ref[0, pl.ds(r0, st.w_win), :] += zc


def _pad_rows(a: jax.Array, rows: int, dtype) -> jax.Array:
    out = jnp.zeros((rows, a.shape[1]), dtype)
    return lax.dynamic_update_slice(out, a.astype(dtype), (0, 0))


def _gat_apply(ht, ts, td, srcs, dsts, meta, visited,
               static: MxuSpmmStatic, heads: int,
               interpret: Optional[bool] = None):
    """Unnormalized attention aggregation + per-dst weight sums.

    ht: [num_src, F] (F = heads·fh ≤ 128); ts/td: [num_src, 8] /
    [num_dst, 8] per-vertex score halves (head h in column h).
    Returns (out [num_dst, F] f32 unnormalized, z [num_dst, heads] f32).
    """
    st = static
    feat = ht.shape[1]
    f_pad = 128
    assert feat <= f_pad and feat % heads == 0 and heads <= 8
    fh = feat // heads
    n_sb = -(-st.num_src // st.s_blk)
    n_db = -(-st.num_dst // st.d_blk)
    xs = _pad_rows(ht, n_sb * st.s_blk, jnp.bfloat16)
    xs = jnp.pad(xs, ((0, 0), (0, f_pad - feat))).reshape(
        n_sb, st.s_blk, f_pad)
    tss = _pad_rows(ts, n_sb * st.s_blk, jnp.bfloat16).reshape(
        n_sb, st.s_blk, 8)
    tds = _pad_rows(td, n_db * st.d_blk, jnp.bfloat16).reshape(
        n_db, st.d_blk, 8)
    interp = _interpret_default() if interpret is None else interpret

    def run_chunk(mt, sr, ds):
        def espec():
            return pl.BlockSpec((1, 1, st.e_t), lambda i, m: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(st.chunk_steps,),
            in_specs=[
                espec(), espec(),
                pl.BlockSpec((1, st.s_blk, f_pad),
                             lambda i, m: (m[i, _M_SLAB], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, st.s_blk, 8),
                             lambda i, m: (m[i, _M_SLAB], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, st.d_blk, 8),
                             lambda i, m: (m[i, _M_DBLK], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, st.d_blk, f_pad),
                             lambda i, m: (m[i, _M_DBLK], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, st.d_blk, 8),
                             lambda i, m: (m[i, _M_DBLK], 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )
        return pl.pallas_call(
            functools.partial(_gat_kernel, static=st, heads=heads, fh=fh,
                              neg_slope=0.2),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_db, st.d_blk, f_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_db, st.d_blk, 8), jnp.float32),
            ),
            interpret=interp,
        )(mt, sr, ds, xs, tss, tds)

    def body(acc, ops):
        mt, sr, ds, vis = ops
        part, zpart = run_chunk(mt, sr, ds)
        acc_o, acc_z = acc
        # where, NOT multiply: unvisited blocks hold uninitialized VMEM
        m = vis[:, None, None] > 0
        return (acc_o + jnp.where(m, part, 0.0),
                acc_z + jnp.where(m, zpart, 0.0)), None

    acc0 = (jnp.zeros((n_db, st.d_blk, f_pad), jnp.float32),
            jnp.zeros((n_db, st.d_blk, 8), jnp.float32))
    (out, z), _ = lax.scan(body, acc0, (meta, srcs, dsts, visited))
    out = out.reshape(n_db * st.d_blk, f_pad)[:st.num_dst, :feat]
    z = z.reshape(n_db * st.d_blk, 8)[:st.num_dst, :heads]
    return out, z


def pack_score_tables(ht: jax.Array, a_src: jax.Array, a_dst: jax.Array,
                      heads: int) -> Tuple[jax.Array, jax.Array]:
    """Per-vertex score-half tables [V, 8] from the layer activations.

    a_src/a_dst: [F] (the split halves of the GAT attention vector, F =
    heads·fh); head h's vectors are their fh-column blocks — the same
    head structure as models/gnn._gat_layer."""
    f = ht.shape[1]
    fh = f // heads
    hh = ht.reshape(-1, heads, fh)
    ts = jnp.einsum("vhf,hf->vh", hh, a_src.reshape(heads, fh),
                    preferred_element_type=jnp.float32)
    td = jnp.einsum("vhf,hf->vh", hh, a_dst.reshape(heads, fh),
                    preferred_element_type=jnp.float32)
    pad = ((0, 0), (0, 8 - heads))
    return jnp.pad(ts, pad), jnp.pad(td, pad)


def mxu_gat_aggregate(
    ht: jax.Array, a_src: jax.Array, a_dst: jax.Array,
    srcs, dsts, meta, visited, static: MxuSpmmStatic, heads: int = 1,
) -> jax.Array:
    """Full attention-softmax aggregation on the kernel tier.

    h_out[d] = Σ_e softmax_d(leaky_relu(score))·ht[src_e]  per head block —
    arithmetic parity with the windowed fast_att path (attention_exp clamp
    + divide-after-aggregation, train/fullbatch.py)."""
    ts, td = pack_score_tables(ht, a_src, a_dst, heads)
    out, z = _gat_apply(ht, ts, td, srcs, dsts, meta, visited, static,
                        heads)
    z = jnp.maximum(z, jnp.finfo(jnp.float32).tiny)
    fh = ht.shape[1] // heads
    out3 = out.reshape(-1, heads, fh) / z[:, :, None]
    return out3.reshape(-1, heads * fh).astype(ht.dtype)


# ---------------------------------------------------------------------------
# Training backward on the kernel tier.
#
# With ã_e = u_e / z_d the layer is h[d] = Σ_e ã_e m_e (m_e = ht[src_e],
# per head block).  For cotangent G = dL/dh, the chain gives per edge
#     t_e  = <G_d, m_e>          r_d = <G_d, h_d>
#     ds_e = ã_e (t_e − r_d) · leaky_relu'(score_e)
# and the gradients  dht[s] += Σ_e ã_e G_d   (aggregation transpose),
# dts[v] = Σ_{src=v} ds_e,  dtd[v] = Σ_{dst=v} ds_e  (score-table
# cotangents, which expand to dht/da via per-vertex outer products).
# Folding z into the per-VERTEX operands (Gz = G/z, rz = r/z) leaves only
# u and score to recompute in-kernel — the same tables the forward reads:
#     q_e = u_e · lrelu'(score_e) · (<Gz_d, m_e> − rz_d)      (== ds_e)
# Two generalized passes cover everything:
#     B1 (TRANSPOSED plan, slab=dst side):  dht_agg[s] = Σ u_e Gz_d  AND
#        dts[s] = Σ q_e  — dual outputs on the src (window/out) side
#     B2 (forward plan, slab=src side):     dtd[d] = Σ q_e
# No per-edge state crosses passes: both recompute u/score/q from the
# SAME per-vertex tables, so the two plans need no common edge order —
# the property that makes a kernel-tier GAT backward possible at all.
# ---------------------------------------------------------------------------


class MxuGatPair(NamedTuple):
    """Forward + transposed plans — the trainable kernel-tier GAT."""

    fwd: MxuGatPlan
    bwd: MxuGatPlan

    @property
    def operands(self):
        return (*self.fwd.operands, *self.bwd.operands)

    @property
    def statics(self):
        return (self.fwd.static, self.bwd.static)


def build_mxu_gat_pair_auto(
    src: np.ndarray, dst: np.ndarray, num_src: int, num_dst: int,
    *, margin: float = 0.95,
) -> Optional[MxuGatPair]:
    fwd = build_mxu_gat_plan_auto(src, dst, num_src, num_dst,
                                  margin=margin)
    if fwd is None:
        return None
    bwd = build_mxu_gat_plan_auto(dst, src, num_dst, num_src,
                                  margin=margin)
    if bwd is None:
        return None
    return MxuGatPair(fwd=fwd, bwd=bwd)


def _gat_bwd_kernel(meta_ref, src_ref, dst_ref, slab_x_ref, slab_t_ref,
                    win_x_ref, win_t_ref, r_ref, *outs,
                    static: MxuSpmmStatic, heads: int, fh: int,
                    neg_slope: float, rz_on_slab: bool, emit_agg: bool):
    st = static
    n_sub = st.e_t // st.e_sub
    step = pl.program_id(0)
    if emit_agg:
        agg_ref, dq_ref = outs
    else:
        (dq_ref,) = outs
        agg_ref = None

    @pl.when(meta_ref[step, _M_FIRST] == 1)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        if agg_ref is not None:
            agg_ref[:] = jnp.zeros_like(agg_ref)

    expand = _head_expand(heads, fh)
    rows_s = lax.broadcasted_iota(jnp.int32, (st.s_blk, st.e_sub), 0)
    rows_w = lax.broadcasted_iota(jnp.int32, (st.w_win, st.e_sub), 0)
    for j in range(n_sub):
        sl = slice(j * st.e_sub, (j + 1) * st.e_sub)
        r0 = pl.multiple_of(meta_ref[step, _M_HDR + j], 8)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, sl], (st.s_blk, st.e_sub))
        oh_s = (rows_s == srcb).astype(jnp.bfloat16)
        dstb = jnp.broadcast_to(dst_ref[0, 0:1, sl], (st.w_win, st.e_sub))
        oh_w = (rows_w == dstb).astype(jnp.bfloat16)
        x1 = lax.dot_general(                     # slab-side rows per edge
            oh_s, slab_x_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                                 # [e, F]
        t1 = lax.dot_general(
            oh_s, slab_t_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [e, 8]
        win_x = win_x_ref[0, pl.ds(r0, st.w_win), :]
        x2 = lax.dot_general(                     # window-side rows
            oh_w, win_x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                                 # [e, F]
        t2 = lax.dot_general(
            oh_w, win_t_ref[0, pl.ds(r0, st.w_win), :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [e, 8]
        score = t1 + t2
        lr_grad = jnp.where(score >= 0, 1.0, neg_slope)
        score = jnp.where(score >= 0, score, neg_slope * score)
        u = jnp.exp(jnp.clip(score, -_ATT_CLIP, _ATT_CLIP))    # [e, 8]
        if rz_on_slab:
            rz = lax.dot_general(
                oh_s, r_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            rz = lax.dot_general(
                oh_w, r_ref[0, pl.ds(r0, st.w_win), :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [e, 8]
        # per-edge per-head <slab_row, win_row> over the head's columns
        tdot = lax.dot_general(
            (x1 * x2), expand,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [e, 8]
        q = u * lr_grad * (tdot - rz)                          # [e, 8] f32
        dq_c = lax.dot_general(
            oh_w.astype(jnp.float32), q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [w_win, 8]
        dq_ref[0, pl.ds(r0, st.w_win), :] += dq_c
        if agg_ref is not None:
            ucols = lax.dot_general(
                u.astype(jnp.bfloat16), expand,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            agg_c = lax.dot_general(
                oh_w, x1 * ucols,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [w_win, F]
            agg_ref[0, pl.ds(r0, st.w_win), :] += agg_c


def _gat_bwd_apply(slab_x, slab_t, win_x, win_t, r_tbl, srcs, dsts, meta,
                   visited, static: MxuSpmmStatic, heads: int, feat: int,
                   *, rz_on_slab: bool, emit_agg: bool,
                   interpret: Optional[bool] = None):
    """Run one generalized backward pass over a plan's chunks.

    slab_* live on the plan's SLAB (source) side; win_*/outputs on its
    window (destination) side.  Returns (agg [num_dst, feat] or None,
    dq [num_dst, heads])."""
    st = static
    f_pad = 128
    fh = feat // heads
    n_sb = -(-st.num_src // st.s_blk)
    n_db = -(-st.num_dst // st.d_blk)

    def rows(a, n, blk, dtype, width):
        out = _pad_rows(a, n * blk, dtype)
        if width > a.shape[1]:
            out = jnp.pad(out, ((0, 0), (0, width - a.shape[1])))
        return out.reshape(n, blk, width)

    sx = rows(slab_x, n_sb, st.s_blk, jnp.bfloat16, f_pad)
    stb = rows(slab_t, n_sb, st.s_blk, jnp.bfloat16, 8)
    wx = rows(win_x, n_db, st.d_blk, jnp.bfloat16, f_pad)
    wt = rows(win_t, n_db, st.d_blk, jnp.bfloat16, 8)
    # rz rides in bf16: it subtracts against tdot, itself built from bf16
    # row products, so the quantization is consistent noise — and the f32
    # window table measured 116 KB past the 16 MB scoped-vmem limit on
    # the forward-plan (B2) pass at Reddit scale
    if rz_on_slab:
        rt = rows(r_tbl, n_sb, st.s_blk, jnp.bfloat16, 8)
    else:
        rt = rows(r_tbl, n_db, st.d_blk, jnp.bfloat16, 8)
    interp = _interpret_default() if interpret is None else interpret

    def run_chunk(mt, sr, ds):
        def espec():
            return pl.BlockSpec((1, 1, st.e_t), lambda i, m: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def sspec(width):
            return pl.BlockSpec((1, st.s_blk, width),
                                lambda i, m: (m[i, _M_SLAB], 0, 0),
                                memory_space=pltpu.VMEM)

        def wspec(width):
            return pl.BlockSpec((1, st.d_blk, width),
                                lambda i, m: (m[i, _M_DBLK], 0, 0),
                                memory_space=pltpu.VMEM)

        out_specs = ((wspec(f_pad), wspec(8)) if emit_agg
                     else (wspec(8),))
        out_shape = tuple(
            jax.ShapeDtypeStruct((n_db, st.d_blk, w), jnp.float32)
            for w in ((f_pad, 8) if emit_agg else (8,)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(st.chunk_steps,),
            in_specs=[espec(), espec(), sspec(f_pad), sspec(8),
                      wspec(f_pad), wspec(8),
                      sspec(8) if rz_on_slab else wspec(8)],
            out_specs=out_specs,
        )
        res = pl.pallas_call(
            functools.partial(_gat_bwd_kernel, static=st, heads=heads,
                              fh=fh, neg_slope=0.2, rz_on_slab=rz_on_slab,
                              emit_agg=emit_agg),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interp,
        )(mt, sr, ds, sx, stb, wx, wt, rt)
        return res if emit_agg else (None, res[0])

    def body(acc, ops):
        mt, sr, ds, vis = ops
        agg_p, dq_p = run_chunk(mt, sr, ds)
        acc_a, acc_q = acc
        m = vis[:, None, None] > 0
        acc_q = acc_q + jnp.where(m, dq_p, 0.0)
        if acc_a is not None:
            acc_a = acc_a + jnp.where(m, agg_p, 0.0)
        return (acc_a, acc_q), None

    acc0 = (jnp.zeros((n_db, st.d_blk, f_pad), jnp.float32)
            if emit_agg else None,
            jnp.zeros((n_db, st.d_blk, 8), jnp.float32))
    (agg, dq), _ = lax.scan(body, acc0, (meta, srcs, dsts, visited))
    dq = dq.reshape(n_db * st.d_blk, 8)[:st.num_dst, :heads]
    if agg is not None:
        agg = agg.reshape(n_db * st.d_blk, f_pad)[:st.num_dst, :feat]
    return agg, dq


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def mxu_gat_train(ht, a_src, a_dst,
                  f_srcs, f_dsts, f_meta, f_vis,
                  b_srcs, b_dsts, b_meta, b_vis,
                  fwd_static: MxuSpmmStatic, bwd_static: MxuSpmmStatic,
                  heads: int):
    """Differentiable attention aggregation on the kernel tier (whole
    graph, num_src == num_dst).  Forward == mxu_gat_aggregate; backward =
    two generalized kernel passes (see module section comment)."""
    ts, td = pack_score_tables(ht, a_src, a_dst, heads)
    out, z = _gat_apply(ht, ts, td, f_srcs, f_dsts, f_meta, f_vis,
                        fwd_static, heads)
    return _gat_norm(out, z, ht, heads)


def _gat_norm(out, z, ht, heads):
    z = jnp.maximum(z, jnp.finfo(jnp.float32).tiny)
    fh = ht.shape[1] // heads
    out3 = out.reshape(-1, heads, fh) / z[:, :, None]
    return out3.reshape(-1, heads * fh).astype(ht.dtype)


def _gat_train_fwd(ht, a_src, a_dst, f_srcs, f_dsts, f_meta, f_vis,
                   b_srcs, b_dsts, b_meta, b_vis,
                   fwd_static, bwd_static, heads):
    ts, td = pack_score_tables(ht, a_src, a_dst, heads)
    out, z = _gat_apply(ht, ts, td, f_srcs, f_dsts, f_meta, f_vis,
                        fwd_static, heads)
    h = _gat_norm(out, z, ht, heads)
    res = (ht, a_src, a_dst, out, z, ts, td,
           f_srcs, f_dsts, f_meta, f_vis, b_srcs, b_dsts, b_meta, b_vis)
    return h, res


def _gat_train_bwd(fwd_static, bwd_static, heads, res, g):
    (ht, a_src, a_dst, out, z, ts, td,
     f_srcs, f_dsts, f_meta, f_vis, b_srcs, b_dsts, b_meta, b_vis) = res
    v, f = ht.shape
    fh = f // heads
    g32 = g.astype(jnp.float32).reshape(v, heads, fh)
    # z-folded per-vertex operands: Gz = G/z, rz = <G, out>/z² (per head).
    # z == 0 rows (no in-edges) have ã ≡ 0 — their cotangents through the
    # attention are exactly zero, so the fold uses 0, not 1/tiny (inf)
    zinv = jnp.where(z > 0, 1.0 / jnp.maximum(z, 1e-30), 0.0)  # [V, H]
    gz = (g32 * zinv[:, :, None]).reshape(v, f)             # [V, F]
    rz = jnp.einsum("vhf,vhf->vh", g32,
                    out.reshape(v, heads, fh)) * zinv * zinv  # [V, H]
    rz8 = jnp.pad(rz, ((0, 0), (0, 8 - heads)))
    # B1 (transposed plan): slab = dst side (Gz, td, rz);
    # window/out = src side (ht, ts) → dht_agg + dts
    dht_agg, dts = _gat_bwd_apply(
        gz, td, ht, ts, rz8, b_srcs, b_dsts, b_meta, b_vis, bwd_static,
        heads, f, rz_on_slab=True, emit_agg=True)
    # B2 (forward plan): slab = src side (ht, ts);
    # window/out = dst side (Gz, td, rz) → dtd
    _, dtd = _gat_bwd_apply(
        ht, ts, gz, td, rz8, f_srcs, f_dsts, f_meta, f_vis, fwd_static,
        heads, f, rz_on_slab=False, emit_agg=False)
    # expand table cotangents: d ts[v,h] → dht[v, block h] += dts·a_src_h,
    # da_src_h += Σ_v dts[v,h]·ht[v, block h]  (and the td analogues)
    a_s_h = a_src.astype(jnp.float32).reshape(heads, fh)
    a_d_h = a_dst.astype(jnp.float32).reshape(heads, fh)
    ht3 = ht.astype(jnp.float32).reshape(v, heads, fh)
    dht = (dht_agg.reshape(v, heads, fh)
           + jnp.einsum("vh,hf->vhf", dts, a_s_h)
           + jnp.einsum("vh,hf->vhf", dtd, a_d_h)).reshape(v, f)
    da_src = jnp.einsum("vh,vhf->hf", dts, ht3).reshape(f)
    da_dst = jnp.einsum("vh,vhf->hf", dtd, ht3).reshape(f)
    from ...utils.vma import match_cotangent_vma

    return (match_cotangent_vma(dht.astype(ht.dtype), ht),
            match_cotangent_vma(da_src.astype(a_src.dtype), a_src),
            match_cotangent_vma(da_dst.astype(a_dst.dtype), a_dst),
            None, None, None, None, None, None, None, None)


mxu_gat_train.defvjp(_gat_train_fwd, _gat_train_bwd)
