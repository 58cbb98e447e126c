"""Prototype measurement: one-hot MXU SpMM tile kernel rate (round 4).

The slab-DMA + in-VMEM-gather design (VERDICT r3 #1) is toolchain-dead:
Mosaic's only in-kernel gather primitive, tpu.dynamic_gather, is a square
single-vreg shuffle (measured 47 ns/elem at [8,128]; the compiler crashes
at [128,128] — scripts/probe_dyngather_shapes.py).  The one remaining
formulation that avoids XLA's ~8-12 ns/edge gather issue-rate floor is to
express BOTH the source gather and the destination scatter as masked
matmuls on the MXU:

    onehotS[s, e] = (src_rel[e] == s)            [S_BLK, E_T]  bf16
    msgs          = onehotS^T @ slab             [E_T, F]      f32->bf16
    onehotD[r, e] = (dst_rel[e] == r) ? w[e] : 0 [W, E_sub]    bf16
    out[r0:r0+W] += onehotD @ msgs_sub           [W, F]        f32

Cost model (per edge): MXU 2F·(S_BLK + W) FLOP, VPU ~2·(S_BLK + W)
elem-ops for the one-hot builds.  With the balanced blocks a Reddit-scale
graph forces (S_BLK·W >= E_sub·V^2/E  =>  S_BLK=W ~ 1.1-1.5k), that is
~0.5-0.8 MFLOP/edge -> >= 25-50 ms at bf16 peak for an 11.9M-edge pass
BEFORE padding waste and grid overhead — against 183 ms for the XLA
windowed SpMM.  This script measures the achievable per-edge rate of the
tile kernel itself (synthetic indices, one resident out tile) to turn
that model into a go/no-go number.

Run on the real chip: python scripts/profile_onehot_spmm.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 128
K_ITERS = 4


def onehot_spmm(slab, srcr, dstr, wts, r0s, d_blk, e_sub, w_win):
    """slab [S_BLK, F] bf16; srcr/dstr [n_steps, 8, E_T] i32 (row 0 live,
    dst relative to its sub-tile's window start); wts same shape bf16;
    r0s [n_steps, n_sub] i32 window starts (sublane-aligned).
    Returns out [D_BLK, F] f32 (all steps accumulate into one block)."""
    n_steps, _, e_t = srcr.shape
    s_blk = slab.shape[0]
    n_sub = e_t // e_sub

    def kernel(r0_ref, src_ref, dst_ref, w_ref, slab_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # gather one-hot: [S_BLK, E_T] bf16, src broadcast across sublanes
        rows = lax.broadcasted_iota(jnp.int32, (s_blk, e_t), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (s_blk, e_t))
        oh_s = (rows == srcb).astype(jnp.bfloat16)
        # msgs[e, f] = slab[src[e], f]
        msgs = lax.dot_general(
            oh_s, slab_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                            # [E_T, F]

        rows_w = lax.broadcasted_iota(jnp.int32, (w_win, e_sub), 0)
        for j in range(n_sub):
            sl = slice(j * e_sub, (j + 1) * e_sub)
            dstb = jnp.broadcast_to(dst_ref[0, 0:1, sl], (w_win, e_sub))
            wb = jnp.broadcast_to(w_ref[0, 0:1, sl], (w_win, e_sub))
            # NOT jnp.where(eq, wb, 0): that select crashes this
            # toolchain's compile helper (probe_onehot_parts2.py case b);
            # bool-cast × broadcast multiply compiles
            oh_d = (rows_w == dstb).astype(jnp.bfloat16) * wb  # [W, E_sub]
            contrib = lax.dot_general(
                oh_d, msgs[sl], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [W, F]
            r0 = r0_ref[step, j]
            out_ref[pl.ds(r0, w_win), :] += contrib

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 8, e_t), lambda i, r0s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, e_t), lambda i, r0s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, e_t), lambda i, r0s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk, F), lambda i, r0s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_blk, F), lambda i, r0s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_blk, F), jnp.float32),
    )(r0s, srcr, dstr, wts, slab)


def reference(slab, srcr, dstr, wts, r0s, d_blk, e_sub):
    n_steps, _, e_t = srcr.shape
    n_sub = e_t // e_sub
    out = np.zeros((d_blk, F), np.float32)
    slab_np = np.asarray(slab, np.float32)
    for i in range(n_steps):
        for j in range(n_sub):
            sl = slice(j * e_sub, (j + 1) * e_sub)
            s = np.asarray(srcr[i, 0, sl])
            d = np.asarray(dstr[i, 0, sl]) + int(r0s[i, j])
            w = np.asarray(wts[i, 0, sl], np.float32)
            np.add.at(out, d, slab_np[s] * w[:, None])
    return out


def run_config(s_blk, d_blk, e_t, e_sub, w_win, check=False):
    rng = np.random.default_rng(0)
    n_steps = 512                      # ~1M edges measured per pass
    e_total = n_steps * e_t

    slab = jnp.asarray(rng.standard_normal((s_blk, F)), jnp.bfloat16)
    src = rng.integers(0, s_blk, size=(n_steps, 1, e_t)).astype(np.int32)
    dst = rng.integers(0, w_win, size=(n_steps, 1, e_t)).astype(np.int32)
    w = rng.standard_normal((n_steps, 1, e_t)).astype(np.float32)
    n_sub = e_t // e_sub
    r0 = rng.integers(0, (d_blk - w_win) // 8,
                      size=(n_steps, n_sub)).astype(np.int32) * 8

    srcr = jnp.asarray(np.broadcast_to(src, (n_steps, 8, e_t)).copy())
    dstr = jnp.asarray(np.broadcast_to(dst, (n_steps, 8, e_t)).copy())
    wts = jnp.asarray(np.broadcast_to(w, (n_steps, 8, e_t)).copy(),
                      jnp.bfloat16)
    r0s = jnp.asarray(r0)

    fn = lambda sl: onehot_spmm(sl, srcr, dstr, wts, r0s, d_blk, e_sub,
                                w_win)
    try:
        if check:
            ref = reference(slab, srcr[:4], dstr[:4], wts[:4], r0[:4],
                            d_blk, e_sub)
            got = np.asarray(
                onehot_spmm(slab, srcr[:4], dstr[:4], wts[:4],
                            jnp.asarray(r0[:4]), d_blk, e_sub, w_win))
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            print(f"correctness (4 steps): max rel err {err:.2e}")

        eps = jnp.float32(1e-30)

        @jax.jit
        def run(sl):
            def body(c, _):
                o = fn(sl + c * eps)
                return jnp.sum(o) * eps + c, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=K_ITERS)
            return c

        float(run(slab))
        t0 = time.perf_counter()
        float(run(slab))
        dt = (time.perf_counter() - t0) / K_ITERS
        flop = 2 * F * (s_blk + w_win) * e_total
        print(f"S={s_blk} W={w_win} E_sub={e_sub} E_T={e_t}: "
              f"{dt*1e3:.2f} ms / {e_total} edges = "
              f"{dt/e_total*1e9:.2f} ns/edge  "
              f"({flop/dt/1e12:.1f} TFLOP/s eff; "
              f"11.9M-edge pass ~{dt/e_total*11.9e6*1e3:.0f} ms vs "
              f"XLA 183 ms)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"S={s_blk} W={w_win} E_sub={e_sub}: FAILED "
              f"{type(ex).__name__}: {str(ex)[:300]}")


if __name__ == "__main__":
    import sys

    cfgs = {
        "0": (1024, 8192, 2048, 256, 1280),   # baseline: 8.78 ns/edge
        "1": (768, 8192, 2048, 128, 768),
        "2": (1024, 8192, 2048, 128, 1024),
        "3": (1536, 8192, 2048, 512, 1536),
        "4": (768, 8192, 2048, 256, 1024),
        # round-4 follow-ups: rate is flat in S/W (not FLOP-bound), so push
        # block sizes up (less real-graph padding) and E_T up (less per-step
        # overhead) to find where the knee is
        "5": (1024, 8192, 4096, 256, 1280),
        "6": (2048, 8192, 2048, 512, 2048),
        "7": (1536, 8192, 4096, 512, 1536),
        "8": (1024, 8192, 2048, 512, 1280),
        "9": (2048, 8192, 4096, 1024, 2048),
        "10": (1024, 8192, 8192, 256, 1280),
        "11": (1024, 8192, 4096, 128, 1280),
        "12": (1536, 8192, 8192, 256, 1536),
        "13": (1536, 8192, 4096, 256, 1536),
    }
    for k in (sys.argv[1:] or ["0"]):
        run_config(*cfgs[k], check=(k == "0"))
