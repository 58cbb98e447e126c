"""Bisect which construct of the one-hot SpMM tile kernel crashes the
Mosaic compile helper (round-4 diagnostic)."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 128
S_BLK = 1024
E_T = 2048
W = 1280
D_BLK = 8192


def try_case(name, fn):
    try:
        out = fn()
        out = jnp.sum(out)
        v = float(out)
        print(f"  {name}: OK (sum={v:.3f})", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"  {name}: FAIL {type(ex).__name__}: {str(ex)[:140]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.standard_normal((S_BLK, F)), jnp.bfloat16)
    src = jnp.asarray(np.broadcast_to(
        rng.integers(0, S_BLK, size=(4, 1, E_T)).astype(np.int32),
        (4, 8, E_T)).copy())
    w8 = jnp.asarray(np.broadcast_to(
        rng.standard_normal((4, 1, E_T)).astype(np.float32),
        (4, 8, E_T)).copy(), jnp.bfloat16)
    r0s = jnp.asarray((rng.integers(0, (D_BLK - W) // 8, size=(4, 8))
                       * 8).astype(np.int32))

    # case 1: one-hot build + gather matmul only
    def k1(src_ref, slab_ref, out_ref):
        rows = lax.broadcasted_iota(jnp.int32, (S_BLK, E_T), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (S_BLK, E_T))
        oh = (rows == srcb).astype(jnp.bfloat16)
        out_ref[:] = lax.dot_general(
            oh, slab_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def c1():
        return pl.pallas_call(
            k1, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((E_T, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * E_T, F), jnp.float32),
        )(src, slab)

    try_case("gather one-hot matmul", c1)

    # case 2: + scatter one-hot matmul to STATIC window, big out block
    def k2(src_ref, w_ref, slab_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = lax.broadcasted_iota(jnp.int32, (S_BLK, E_T), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (S_BLK, E_T))
        oh = (rows == srcb).astype(jnp.bfloat16)
        msgs = lax.dot_general(
            oh, slab_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        rw = lax.broadcasted_iota(jnp.int32, (W, E_T), 0)
        dstb = jnp.broadcast_to(src_ref[0, 0:1, :] % W, (W, E_T))
        wb = jnp.broadcast_to(w_ref[0, 0:1, :], (W, E_T))
        ohd = jnp.where(rw == dstb, wb, jnp.zeros((), jnp.bfloat16))
        contrib = lax.dot_general(
            ohd, msgs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0:W, :] += contrib

    def c2():
        return pl.pallas_call(
            k2, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((D_BLK, F), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D_BLK, F), jnp.float32),
        )(src, w8, slab)

    try_case("+ static-window scatter, revisited big out", c2)

    # case 3: dynamic window start from prefetched scalars
    def k3(r0_ref, src_ref, w_ref, slab_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = lax.broadcasted_iota(jnp.int32, (S_BLK, E_T), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (S_BLK, E_T))
        oh = (rows == srcb).astype(jnp.bfloat16)
        msgs = lax.dot_general(
            oh, slab_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        rw = lax.broadcasted_iota(jnp.int32, (W, E_T), 0)
        dstb = jnp.broadcast_to(src_ref[0, 0:1, :] % W, (W, E_T))
        wb = jnp.broadcast_to(w_ref[0, 0:1, :], (W, E_T))
        ohd = jnp.where(rw == dstb, wb, jnp.zeros((), jnp.bfloat16))
        contrib = lax.dot_general(
            ohd, msgs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r0 = r0_ref[step, 0]
        out_ref[pl.ds(r0, W), :] += contrib

    def c3():
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i, r: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, E_T), lambda i, r: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((D_BLK, F), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k3, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((D_BLK, F), jnp.float32),
        )(r0s, src, w8, slab)

    try_case("+ dynamic pl.ds window start", c3)


if __name__ == "__main__":
    main()
