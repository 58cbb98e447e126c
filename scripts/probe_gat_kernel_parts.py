"""Mosaic feasibility probe for the GAT one-hot kernel's new pieces.

The whole-graph SpMM kernel (ops/pallas/mxu_spmm.py) validated the core
one-hot matmuls in round 4.  The GAT variant adds, per sub-tile:
  (a) [e, 8]-output dot_generals extracting per-edge score halves from
      per-vertex tables (oh^T @ table);
  (b) leaky_relu + clip + exp on a computed f32 [e, 8] tensor;
  (c) head→column expansion via a tiny [8, 128] matmul;
  (d) a SECOND output ref of different width ([d_blk, 8] z accumulator);
  (e) a pl.ds dynamic-sliced read of a block-resident [d_blk, 8] operand.
Each has plausible Mosaic layout failure modes on this toolchain (round-4
findings: no computed-bf16 sublane broadcast, select-on-broadcast-compare
crash).  This probe compiles and numerically checks one kernel using all
five against a numpy reference, on whatever backend is active.

Run on the chip:  timeout 900 python scripts/probe_gat_kernel_parts.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

S_BLK, W_WIN, E_SUB, F = 256, 128, 256, 128
HEADS = 4
CLIP = 60.0


def kernel(src_ref, dst_ref, slab_ref, ts_ref, td_ref, out_ref, z_ref):
    rows_s = lax.broadcasted_iota(jnp.int32, (S_BLK, E_SUB), 0)
    srcb = jnp.broadcast_to(src_ref[0:1, :], (S_BLK, E_SUB))
    oh_s = (rows_s == srcb).astype(jnp.bfloat16)
    rows_w = lax.broadcasted_iota(jnp.int32, (W_WIN, E_SUB), 0)
    dstb = jnp.broadcast_to(dst_ref[0:1, :], (W_WIN, E_SUB))
    oh_d = (rows_w == dstb).astype(jnp.bfloat16)

    msg = lax.dot_general(oh_s, slab_ref[:],
                          dimension_numbers=(((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)                 # [e, F]
    # (a) per-edge score halves from per-vertex tables
    have = lax.dot_general(oh_s, ts_ref[:],
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)   # [e, 8]
    # (e) dynamic window read of the dst-side table
    r0 = 0
    td_win = td_ref[pl.ds(r0, W_WIN), :]
    hadd = lax.dot_general(oh_d, td_win.astype(jnp.bfloat16),
                           dimension_numbers=(((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)   # [e, 8]
    # (b) activation chain on computed f32
    score = have + hadd
    score = jnp.where(score >= 0, score, 0.2 * score)            # leaky_relu
    u = jnp.exp(jnp.clip(score, -CLIP, CLIP))                    # [e, 8] f32
    # (c) head→column expansion
    fh = F // HEADS
    head_of_col = jax.lax.broadcasted_iota(jnp.int32, (8, F), 1) // fh
    head_row = jax.lax.broadcasted_iota(jnp.int32, (8, F), 0)
    expand = (head_of_col == head_row).astype(jnp.bfloat16)      # [8, F]
    ucols = lax.dot_general(u.astype(jnp.bfloat16), expand,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)               # [e, F]
    contrib = lax.dot_general(oh_d, msg * ucols,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[:] = contrib                                         # [w, F]
    # (d) second, narrower output: per-dst per-head weight sums
    zc = lax.dot_general(oh_d.astype(jnp.float32), u,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    z_ref[:] = zc                                                # [w, 8]


def main():
    rng = np.random.default_rng(0)
    n_live = 200
    src = np.full(E_SUB, S_BLK, np.int32)   # sentinel pads
    dst = np.full(E_SUB, W_WIN, np.int32)
    src[:n_live] = rng.integers(0, S_BLK, n_live)
    dst[:n_live] = np.sort(rng.integers(0, W_WIN, n_live))
    slab = rng.standard_normal((S_BLK, F)).astype(np.float32)
    ts = np.zeros((S_BLK, 8), np.float32)
    td = np.zeros((W_WIN, 8), np.float32)
    ts[:, :HEADS] = rng.standard_normal((S_BLK, HEADS)) * 0.3
    td[:, :HEADS] = rng.standard_normal((W_WIN, HEADS)) * 0.3

    interp = jax.default_backend() != "tpu"
    out, z = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((W_WIN, F), jnp.float32),
                   jax.ShapeDtypeStruct((W_WIN, 8), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interp,
    )(jnp.asarray(src.reshape(1, -1)), jnp.asarray(dst.reshape(1, -1)),
      jnp.asarray(slab, jnp.bfloat16), jnp.asarray(ts, jnp.bfloat16),
      jnp.asarray(td))
    out, z = np.asarray(out), np.asarray(z)

    # numpy reference (bf16-quantized inputs like the kernel sees)
    slab_b = slab.astype(jnp.bfloat16).astype(np.float32)
    ts_b = ts.astype(jnp.bfloat16).astype(np.float32)
    fh = F // HEADS
    ref = np.zeros((W_WIN, F), np.float32)
    zref = np.zeros((W_WIN, 8), np.float32)
    for e in range(n_live):
        s, d = src[e], dst[e]
        sc = ts_b[s] + td[d]
        sc = np.where(sc >= 0, sc, 0.2 * sc)
        u = np.exp(np.clip(sc, -CLIP, CLIP))
        zref[d] += u
        for h in range(HEADS):
            m = slab_b[s, h * fh:(h + 1) * fh]
            ref[d, h * fh:(h + 1) * fh] += (
                np.float32(np.float32(u[h]).astype(jnp.bfloat16)) * m)
    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    zerr = np.abs(z - zref).max() / max(np.abs(zref).max(), 1e-6)
    print(f"backend={jax.default_backend()} interp={interp} "
          f"rel_err out={err:.2e} z={zerr:.2e}")
    assert err < 3e-2 and zerr < 1e-2, (err, zerr)
    print("PROBE OK")


if __name__ == "__main__":
    main()
