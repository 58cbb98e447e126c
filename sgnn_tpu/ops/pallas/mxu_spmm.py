"""One-hot MXU SpMM: whole-graph aggregation as masked matmuls.

The platform's XLA gather/scatter emitter pins every sparse op at the
~8-12 ns/edge random-row-access floor (docs/PERF.md round-3 per-op
profile; the windowed F=128 SpMM runs 15.4 ns/edge).  Mosaic's only
in-kernel gather primitive is a single-vreg square shuffle
(scripts/probe_dyngather_shapes.py), so slab-DMA + in-VMEM gather is
toolchain-dead — but BOTH the source gather and the destination scatter
can instead be expressed as matmuls against one-hot masks built from
iota/compare, which Mosaic fuses into the MXU pipeline without
materializing the mask in VMEM:

    msgs            = onehot_src[S_BLK, E_T]^T @ slab[S_BLK, F]
    out[r0:r0+W]   += (onehot_dst[W, E_sub] * w) @ msgs_sub[E_sub, F]

Measured END-TO-END on the Reddit-scale bench graph (11.88M edges, v5e,
scripts/profile_mxu_spmm.py, round 4): 63.9 ms vs 178.9 ms for the
windowed XLA path — 5.38 vs 15.06 ns/edge, 2.80x — at the default
geometry S_BLK=1024, W=1280, E_SUB=256, E_T=2048 (slot pad ratio 1.40).
Larger E_T measured faster on dense synthetic tiles (6.09 ns/slot at
E_T=4096) but pads real graphs more; the default wins end to end.

Reference analog: this is the vendor-kernel tier the reference gets from
cuSPARSE SpMM (`Gather_By_Dst_From_Src_Spmm`, cuda/ntsCUDAGraphOP.cu:425-511)
and the hand-tuned warp-per-destination fused kernels
(cuda/ntsCUDAFuseKernel.cuh:78-515) — re-derived for a systolic-array part
where the fastest "gather" is a masked matmul.

Design (host planner + one Pallas kernel):

- Edges are partitioned into STEPS.  Each step owns one source slab
  (s_blk contiguous source rows, DMA'd contiguously — sequential HBM
  bandwidth) and one destination block (d_blk contiguous output rows,
  resident in VMEM across consecutive steps).  Steps are ordered
  dst-block-major so every output block is visited in consecutive grid
  steps (Pallas keeps it in VMEM; the first step of a block zeroes it).
- Within a step, edges form n_sub SUB-TILES of e_sub edges; each sub-tile
  declares a dst window start r0 (all its destinations fall in
  [r0, r0+w_win)) and a src window start s0 (sources in [s0, s0+s_win)
  relative to the slab).  Windows keep the one-hot masks small: per-edge
  MXU work is 2·F·(s_win + w_win) FLOPs.
- Pad edges carry weight 0 and local ids 0 — they contribute exact zeros.
- Per-edge operands ride three single-sublane int32 arrays
  [n_steps, 1, e_t] (src id relative to s0 / dst id relative to r0 /
  f32 weight bits).  Mosaic can only broadcast a ref-read across
  sublanes from sublane OFFSET 0 — packing the three operands as rows
  of one [n_steps, 8, e_t] array dies with "Invalid input layout" on
  the row-1/row-2 reads, and bf16 values computed in-kernel cannot be
  sublane-broadcast at all, so weights travel as i32 BITS and are
  bitcast AFTER the [w_win, e_sub] broadcast.  Scalar metadata (slab
  id, dst-block id, first-visit flag, per-sub-tile r0/s0) rides the
  scalar-prefetch operand so the index maps can steer the slab/output
  DMAs.

Numerics: the slab and the edge weights are cast to bf16; both matmuls
accumulate in f32 (preferred_element_type).  This matches the bf16
compute path (DTYPE:bfloat16) the trainers already run; the f32 windowed
path remains the default elsewhere (MXU_SPMM cfg key).

Scope: static edge weights only (GCN norm / unweighted mean) — the
weights are baked into the packed operand at plan time, so attention-
weighted (GAT) aggregation stays on the windowed XLA path.  F is padded
to one 128-lane tile; wider layers fall back (hidden dims here are
<=128 after the transform-first ordering every family uses).
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

# meta columns: [slab_id, dst_block_id, first_visit, pad, r0*n_sub, s0*n_sub]
_M_SLAB, _M_DBLK, _M_FIRST, _M_HDR = 0, 1, 2, 4


class MxuSpmmStatic(NamedTuple):
    """Hashable static geometry of a plan (nondiff argnum for the VJP)."""

    s_blk: int     # slab rows (contiguous source rows per step)
    s_win: int     # per-sub-tile source window (== s_blk ⇒ per-step gather)
    d_blk: int     # output block rows
    w_win: int     # per-sub-tile destination window
    e_sub: int     # edges per sub-tile
    e_t: int       # edges per step (n_sub = e_t // e_sub)
    n_steps: int
    num_src: int
    num_dst: int
    feat: int      # caller feature width (kernel runs one 128-lane tile)
    # Mosaic allocates ~0.5 KB of SMEM per GRID STEP on this toolchain (a
    # 2048-step grid dies with "Ran out of memory in memory space smem.
    # Used 1.00M of 1.00M"), so the step sequence is padded to a multiple
    # of chunk_steps and run as ONE pallas_call inside a lax.scan over
    # chunks (distinct inlined Mosaic payloads also overflow the compile
    # transport: 7 chunked calls in one jit die with HTTP 413).  A dst
    # block split across a chunk cut is re-zeroed at the later chunk's
    # first visit; the masked accumulate adds the partials back together.
    chunk_steps: int = 0
    n_chunks: int = 1


class MxuSpmmPlan(NamedTuple):
    """Device operands + static geometry for one aggregation direction."""

    srcs: jax.Array    # [n_chunks, chunk, 1, e_t] i32 src ids rel. to s0
    dsts: jax.Array    # [n_chunks, chunk, 1, e_t] i32 dst ids rel. to r0
    wbits: jax.Array   # [n_chunks, chunk, 1, e_t] i32 f32 weight bits
    meta: jax.Array    # [n_chunks, chunk, _M_HDR + 2*n_sub] i32 scalars
    visited: jax.Array  # [n_chunks, n_db] f32 1.0 where the chunk owns rows
    static: MxuSpmmStatic

    @property
    def operands(self):
        return self.srcs, self.dsts, self.wbits, self.visited

    @property
    def slot_count(self) -> int:
        return self.static.n_steps * self.static.e_t

    def pad_ratio(self, e_real: int) -> float:
        return self.slot_count / max(e_real, 1)


def _align_down(v: int, m: int = 8) -> int:
    return (v // m) * m


def build_mxu_spmm_plan(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_src: int,
    num_dst: int,
    *,
    s_blk: int = 1024,
    s_win: Optional[int] = None,
    d_blk: int = 8192,
    w_win: int = 1280,
    e_sub: int = 256,
    e_t: int = 2048,
    max_pad_ratio: float = 2.0,
    chunk_steps: int = 1024,
) -> Optional[MxuSpmmPlan]:
    """Host-side 2-D tile plan over an arbitrary COO edge list.

    Groups edges by (dst block, slab) pairs, cuts each group's dst-sorted
    run into w_win-bounded sub-tiles of <= e_sub edges, pads each group to
    whole steps, and orders steps dst-block-major (consecutive output-
    block visits).  Returns None when the padded slot count exceeds
    max_pad_ratio x E — the windowed XLA path is then the better choice
    (the kernel's 6 ns/slot beats 15.4 ns/edge only while slots/E < ~2.5;
    the planner refuses earlier to keep HBM for the operand bounded)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    live = weight != 0  # drop pad edges from the reference edge list
    src, dst, weight = src[live], dst[live], weight[live]
    e_real = src.size
    if e_real == 0:
        return None
    s_win = s_blk if s_win is None else s_win
    n_sub = e_t // e_sub
    assert e_t % e_sub == 0 and w_win % 8 == 0 and s_win % 8 == 0

    sb = src // s_blk
    db = dst // d_blk
    order = np.lexsort((dst, sb, db))
    src, dst, weight = src[order], dst[order], weight[order]
    sb, db = sb[order], db[order]

    # group boundaries: one (db, sb) pair per group, dst ascending inside
    n_sb = -(-num_src // s_blk)
    key = db * n_sb + sb
    g_start = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    g_end = np.r_[g_start[1:], e_real]

    # pass 1: greedy sub-tile cuts.  Per group (dst ascending): slide a
    # w_win destination window; when s_win < s_blk, sort each window's run
    # by src IN PLACE (the one-hot kernel needs no intra-tile order; only
    # the planner's binary searches need local sortedness, and later
    # searches only touch the untouched suffix dst[i:end]) and cut it
    # into (src span <= s_win, count <= e_sub) sub-tiles.
    tiles: list[Tuple[int, int, int, int]] = []  # (beg, end, r0, s0)
    per_group_tiles: list[int] = []
    split_src = s_win < s_blk
    for gi in range(g_start.size):
        beg, end = int(g_start[gi]), int(g_end[gi])
        blk_base = int(db[beg]) * d_blk
        slab_base = int(sb[beg]) * s_blk
        cnt = 0
        i = beg
        while i < end:
            r0 = min(_align_down(int(dst[i]) - blk_base), d_blk - w_win)
            run_end = i + int(np.searchsorted(dst[i:end],
                                              blk_base + r0 + w_win))
            if not split_src:
                j = min(i + e_sub, run_end)
                tiles.append((i, j, r0, 0))
                cnt += 1
                i = j
                continue
            o = np.argsort(src[i:run_end], kind="stable")
            for arr in (src, dst, weight):
                arr[i:run_end] = arr[i:run_end][o]
            k = i
            while k < run_end:
                s0 = min(_align_down(int(src[k]) - slab_base),
                         s_blk - s_win)
                m = min(k + e_sub,
                        k + int(np.searchsorted(src[k:run_end],
                                                slab_base + s0 + s_win)))
                tiles.append((k, m, r0, s0))
                cnt += 1
                k = m
            i = run_end
        per_group_tiles.append(cnt)

    # pass 2: pad each group to whole steps; iterate dst blocks in order
    # (consecutive output-block visits) and give EMPTY dst blocks one
    # all-pad step so their rows are zeroed, not left as garbage
    n_db = -(-num_dst // d_blk)
    group_db = db[g_start].astype(np.int64)
    steps_per_group = [-(-c // n_sub) for c in per_group_tiles]
    n_steps = sum(steps_per_group) + int(
        np.setdiff1d(np.arange(n_db), group_db).size)
    if n_steps * e_t > max_pad_ratio * e_real:
        return None

    # group gi's tiles start at tile_base[gi] in `tiles`
    tile_base = np.r_[0, np.cumsum(per_group_tiles)]
    srcs = np.zeros((n_steps, 1, e_t), np.int32)
    dsts = np.zeros((n_steps, 1, e_t), np.int32)
    wbits = np.zeros((n_steps, 1, e_t), np.int32)
    meta = np.zeros((n_steps, _M_HDR + 2 * n_sub), np.int32)
    step = 0
    gi = 0
    for dblk in range(n_db):
        first = 1
        if gi >= g_start.size or group_db[gi] != dblk:
            meta[step, _M_DBLK] = dblk       # empty block: one zeroing step
            meta[step, _M_FIRST] = 1
            step += 1
            continue
        blk_base = dblk * d_blk
        while gi < g_start.size and group_db[gi] == dblk:
            g_slab = int(sb[g_start[gi]])
            slab_base = g_slab * s_blk
            for s in range(steps_per_group[gi]):
                meta[step, _M_SLAB] = g_slab
                meta[step, _M_DBLK] = dblk
                meta[step, _M_FIRST] = first
                first = 0
                lo = tile_base[gi] + s * n_sub
                hi = min(lo + n_sub, tile_base[gi + 1])
                for slot, t in enumerate(range(lo, hi)):
                    beg, end, r0, s0 = tiles[t]
                    n = end - beg
                    col = slot * e_sub
                    srcs[step, 0, col:col + n] = src[beg:end] - slab_base - s0
                    dsts[step, 0, col:col + n] = dst[beg:end] - blk_base - r0
                    wbits[step, 0, col:col + n] = (
                        weight[beg:end].view(np.int32))
                    meta[step, _M_HDR + slot] = r0
                    meta[step, _M_HDR + n_sub + slot] = s0
                step += 1
            gi += 1
    assert step == n_steps and gi == g_start.size

    # pad to whole chunks of chunk_steps (SMEM grid-length cap + one-
    # payload lax.scan execution; MxuSpmmStatic.chunk_steps): pad steps
    # are all-pad-edge no-ops aimed at the previous step's dst block
    chunk_steps = min(chunk_steps, n_steps)
    pad_steps = (-n_steps) % chunk_steps
    if pad_steps:
        srcs = np.concatenate(
            [srcs, np.zeros((pad_steps,) + srcs.shape[1:], np.int32)])
        dsts = np.concatenate(
            [dsts, np.zeros((pad_steps,) + dsts.shape[1:], np.int32)])
        wbits = np.concatenate(
            [wbits, np.zeros((pad_steps,) + wbits.shape[1:], np.int32)])
        tail = np.zeros((pad_steps, meta.shape[1]), np.int32)
        tail[:, _M_DBLK] = meta[n_steps - 1, _M_DBLK]
        meta = np.concatenate([meta, tail])
    n_total = n_steps + pad_steps
    n_chunks = n_total // chunk_steps
    visited = np.zeros((n_chunks, n_db), np.float32)
    for ci in range(n_chunks):
        lo = ci * chunk_steps
        meta[lo, _M_FIRST] = 1
        visited[ci, meta[lo:lo + chunk_steps, _M_DBLK]] = 1.0

    def chunked(a):
        return jnp.asarray(a.reshape((n_chunks, chunk_steps) + a.shape[1:]))

    static = MxuSpmmStatic(
        s_blk=s_blk, s_win=s_win, d_blk=d_blk, w_win=w_win, e_sub=e_sub,
        e_t=e_t, n_steps=n_steps, num_src=int(num_src),
        num_dst=int(num_dst), feat=0, chunk_steps=chunk_steps,
        n_chunks=n_chunks,
    )
    return MxuSpmmPlan(srcs=chunked(srcs), dsts=chunked(dsts),
                       wbits=chunked(wbits), meta=chunked(meta),
                       visited=jnp.asarray(visited), static=static)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(meta_ref, src_ref, dst_ref, w_ref, slab_ref, out_ref, *,
            static: MxuSpmmStatic):
    st = static
    n_sub = st.e_t // st.e_sub
    step = pl.program_id(0)

    @pl.when(meta_ref[step, _M_FIRST] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    if st.s_win == st.s_blk:
        # per-step gather: one [s_blk, e_t] one-hot matmul for the whole step
        rows = lax.broadcasted_iota(jnp.int32, (st.s_blk, st.e_t), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (st.s_blk, st.e_t))
        oh_s = (rows == srcb).astype(jnp.bfloat16)
        msgs = lax.dot_general(
            oh_s, slab_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                                # [e_t, F]

    rows_w = lax.broadcasted_iota(jnp.int32, (st.w_win, st.e_sub), 0)
    for j in range(n_sub):
        sl = slice(j * st.e_sub, (j + 1) * st.e_sub)
        if st.s_win < st.s_blk:
            # planner 8-aligns s0 (_align_down); Mosaic can't prove it
            s0 = pl.multiple_of(meta_ref[step, _M_HDR + n_sub + j], 8)
            rows_s = lax.broadcasted_iota(
                jnp.int32, (st.s_win, st.e_sub), 0)
            srcb = jnp.broadcast_to(src_ref[0, 0:1, sl],
                                    (st.s_win, st.e_sub))
            oh_s = (rows_s == srcb).astype(jnp.bfloat16)
            msg_j = lax.dot_general(
                oh_s, slab_ref[0, pl.ds(s0, st.s_win), :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                            # [e_sub, F]
        else:
            msg_j = msgs[sl]
        dstb = jnp.broadcast_to(dst_ref[0, 0:1, sl], (st.w_win, st.e_sub))
        # weights broadcast as i32 BITS and bitcast after: Mosaic cannot
        # sublane-broadcast a computed bf16 [1, N] vector ("Invalid input
        # layout"; see module docstring)
        wb = lax.bitcast_convert_type(
            jnp.broadcast_to(w_ref[0, 0:1, sl], (st.w_win, st.e_sub)),
            jnp.float32).astype(jnp.bfloat16)
        # NOT jnp.where(eq, wb, 0): that select crashes this toolchain's
        # Mosaic compile helper (scripts/probe_onehot_parts2.py case b)
        oh_d = (rows_w == dstb).astype(jnp.bfloat16) * wb
        contrib = lax.dot_general(
            oh_d, msg_j,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [w_win, F]
        r0 = meta_ref[step, _M_HDR + j]
        out_ref[0, pl.ds(r0, st.w_win), :] += contrib


def _apply(x: jax.Array, srcs: jax.Array, dsts: jax.Array,
           wbits: jax.Array, visited: jax.Array, meta: jax.Array,
           static: MxuSpmmStatic,
           interpret: Optional[bool] = None) -> jax.Array:
    """out[d] = sum_{e: dst[e]=d} w[e] * x[src[e]] via the one-hot kernel.

    x: [num_src, feat] (feat <= 128 after lane padding); returns
    [num_dst, feat] f32.  Runs one pallas_call per step chunk (the SMEM
    grid-length cap, MxuSpmmStatic.chunks) and mask-sums the partials:
    a chunk's output block holds garbage unless the chunk visited it, and
    a block split across chunks holds partial sums that add back up."""
    st = static
    feat = x.shape[1]
    f_pad = 128
    assert feat <= f_pad, "mxu_spmm runs one 128-lane tile"
    n_sb = -(-st.num_src // st.s_blk)
    n_db = -(-st.num_dst // st.d_blk)
    xs = jnp.zeros((n_sb * st.s_blk, f_pad), jnp.bfloat16)
    xs = lax.dynamic_update_slice(xs, x.astype(jnp.bfloat16), (0, 0))
    xs = xs.reshape(n_sb, st.s_blk, f_pad)
    interp = _interpret_default() if interpret is None else interpret

    def run_chunk(mt, sr, ds, wb):
        def espec():
            return pl.BlockSpec((1, 1, st.e_t), lambda i, m: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(st.chunk_steps,),
            in_specs=[
                espec(), espec(), espec(),
                pl.BlockSpec((1, st.s_blk, f_pad),
                             lambda i, m: (m[i, _M_SLAB], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, st.d_blk, f_pad),
                                   lambda i, m: (m[i, _M_DBLK], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_kernel, static=st),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_db, st.d_blk, f_pad),
                                           jnp.float32),
            interpret=interp,
        )(mt, sr, ds, wb, xs)

    def body(acc, ops):
        mt, sr, ds, wb, vis = ops
        part = run_chunk(mt, sr, ds, wb)
        # where, NOT multiply: unvisited blocks hold uninitialized VMEM
        # write-back (can be NaN/inf; NaN * 0 == NaN)
        return acc + jnp.where(vis[:, None, None] > 0, part, 0.0), None

    acc0 = jnp.zeros((n_db, st.d_blk, f_pad), jnp.float32)
    out, _ = lax.scan(body, acc0, (meta, srcs, dsts, wbits, visited))
    return out.reshape(n_db * st.d_blk, f_pad)[:st.num_dst, :feat]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def mxu_spmm(x: jax.Array,
             fs: jax.Array, fd: jax.Array, fw: jax.Array, fv: jax.Array,
             fm: jax.Array,
             bs: jax.Array, bd: jax.Array, bw: jax.Array, bv: jax.Array,
             bm: jax.Array,
             fwd_static: MxuSpmmStatic,
             bwd_static: MxuSpmmStatic) -> jax.Array:
    """Differentiable whole-graph SpMM on the one-hot MXU kernel.

    The backward plan is the same planner run on the TRANSPOSED edge list
    (dst->src roles swapped): dx = A^T @ g is the identical kernel shape
    (reference CSR backward, ntsSingleGPUSampleGraphOp.hpp:258).  Edge
    weights are plan-time constants (GCN norm): no dw cotangent exists on
    this path — attention-weighted aggregation uses the windowed ops."""
    return _apply(x, fs, fd, fw, fv, fm, fwd_static).astype(
        jnp.float32 if x.dtype == jnp.int8 else x.dtype)


def _mxu_fwd(x, fs, fd, fw, fv, fm, bs, bd, bw, bv, bm,
             fwd_static, bwd_static):
    # zero-size token carries x's dtype AND shard_map vma through the
    # residuals (a dtype object itself is not a JAX type; a fresh zeros
    # array would be typed replicated even when x is varying)
    tok = x[:0, 0]
    return mxu_spmm(x, fs, fd, fw, fv, fm, bs, bd, bw, bv, bm,
                    fwd_static, bwd_static), (tok, bs, bd, bw, bv, bm)


def _mxu_bwd(fwd_static, bwd_static, res, g):
    tok, bs, bd, bw, bv, bm = res
    dx = _apply(g, bs, bd, bw, bv, bm, bwd_static).astype(
        jnp.float32 if tok.dtype == jnp.int8 else tok.dtype)
    # shard_map vma typing: the cotangent must vary over every mesh axis
    # the primal x does (utils/vma.py; pure type cast, no reduction)
    from ...utils.vma import match_cotangent_vma

    return (match_cotangent_vma(dx, tok),) + (None,) * 10


mxu_spmm.defvjp(_mxu_fwd, _mxu_bwd)


def mxu_spmm_fwd(x: jax.Array, srcs, dsts, wbits, visited, meta,
                 static: MxuSpmmStatic) -> jax.Array:
    """Forward-only apply (serving paths take no gradients — skip the VJP
    machinery and the backward plan entirely)."""
    return _apply(x, srcs, dsts, wbits, visited, meta, static).astype(
        jnp.float32 if x.dtype == jnp.int8 else x.dtype)


class MxuSpmmPair(NamedTuple):
    """Forward + transposed-backward plans for one static-weight graph."""

    fwd: MxuSpmmPlan
    bwd: MxuSpmmPlan

    def __call__(self, x: jax.Array) -> jax.Array:
        return mxu_spmm(x, *self.fwd.operands, self.fwd.meta,
                        *self.bwd.operands, self.bwd.meta,
                        self.fwd.static, self.bwd.static)


def build_mxu_spmm_pair(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
    num_src: int, num_dst: int, **kw,
) -> Optional[MxuSpmmPair]:
    """Plan both directions; None when either side pads past the knee."""
    fwd = build_mxu_spmm_plan(src, dst, weight, num_src, num_dst, **kw)
    if fwd is None:
        return None
    bwd = build_mxu_spmm_plan(dst, src, weight, num_dst, num_src, **kw)
    if bwd is None:
        return None
    return MxuSpmmPair(fwd=fwd, bwd=bwd)


# Measured on-chip kernel rates per SLOT for the geometry ladder
# (scripts/profile_mxu_spmm.py round 4: 63.9 ms / 16.64M slots and
# 86.2 ms / 15.28M slots on the 11.88M-edge graph; round 5 cfgs 12-13
# for the split-window rungs) and the windowed XLA baseline the kernel
# must beat (178.9 ms / 11.88M edges).  Bigger slabs cost more MXU FLOPs
# per slot but pack sparser graphs with less padding; the SPLIT-WINDOW
# rungs (s_win < s_blk, unlocked by the r5 pl.multiple_of fix) merge the
# sparse (dst-block x slab) groups of large-V graphs while paying only
# the (s_win + w_win) window rate — at 4x bench scale they cut pad
# 2.35 -> ~1.3 (docs/PERF.md r5 scale-4 entry).
_GEOMETRIES = (
    (dict(s_blk=1024, w_win=1280, e_sub=256, e_t=2048), 3.84),
    (dict(s_blk=2048, w_win=1280, e_sub=256, e_t=2048), 5.64),
    (dict(s_blk=4096, s_win=2048, w_win=2048, e_sub=256, e_t=2048), 7.27),
    (dict(s_blk=8192, s_win=2048, w_win=2048, e_sub=256, e_t=2048), 7.79),
)
_WINDOWED_NS_EDGE = 15.06


def _estimate_slots(src: np.ndarray, dst: np.ndarray, num_src: int,
                    *, s_blk: int, d_blk: int = 8192, e_sub: int,
                    e_t: int, **_) -> int:
    """Cheap LOWER bound on a geometry's slot count: per-(dst block,
    slab) group sizes rounded up to sub-tiles and steps, ignoring
    window-split losses (vectorized O(E log E); the full planner's
    python-loop pass is ~minutes at 47M edges, too slow to run per
    candidate)."""
    n_sb = -(-num_src // s_blk)
    key = (dst.astype(np.int64) // d_blk) * n_sb + src.astype(np.int64) // s_blk
    _, counts = np.unique(key, return_counts=True)
    n_sub = e_t // e_sub
    subtiles = -(-counts // e_sub)
    steps = -(-subtiles // n_sub)
    return int(steps.sum()) * e_t


def build_mxu_spmm_pair_auto(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
    num_src: int, num_dst: int, *, margin: float = 0.95,
    fwd_only: bool = False,
):
    """Pick the geometry whose projected cost (measured ns/slot x
    estimated pad ratio) is lowest, build it, and accept only if it
    still beats the windowed XLA path by `margin`.  Returns an
    MxuSpmmPair (or a single fwd MxuSpmmPlan when fwd_only) or None."""
    live = np.asarray(weight) != 0
    e_real = int(live.sum())
    if e_real == 0:
        return None
    s_l, d_l = np.asarray(src)[live], np.asarray(dst)[live]
    # rank candidates by projected cost (measured ns/slot x estimated
    # pad), then build REAL plans in that order and accept the first
    # winner: the estimator ignores window-split losses, which bite the
    # split-window rungs hardest, so a single best-estimate pick could
    # select a geometry whose real plan loses while a runner-up wins
    ranked = []
    for kw, rate in _GEOMETRIES:
        est = max(_estimate_slots(s_l, d_l, num_src, **kw),
                  _estimate_slots(d_l, s_l, num_dst, **kw))
        cost = rate * est / e_real
        if cost < margin * _WINDOWED_NS_EDGE:
            ranked.append((cost, kw, rate))
    ranked.sort(key=lambda t: t[0])
    for _, kw, rate in ranked:
        fwd = build_mxu_spmm_plan(s_l, d_l, weight[live], num_src, num_dst,
                                  max_pad_ratio=6.0, **kw)
        if (fwd is None
                or rate * fwd.pad_ratio(e_real) > margin * _WINDOWED_NS_EDGE):
            continue
        if fwd_only:
            return fwd
        bwd = build_mxu_spmm_plan(d_l, s_l, weight[live], num_dst, num_src,
                                  max_pad_ratio=6.0, **kw)
        if (bwd is not None
                and rate * bwd.pad_ratio(e_real)
                <= margin * _WINDOWED_NS_EDGE):
            return MxuSpmmPair(fwd=fwd, bwd=bwd)
    return None
