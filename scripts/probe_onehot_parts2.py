"""Second-stage bisect of the one-hot SpMM scatter-side compiler crash."""
from __future__ import annotations

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
        v = float(jnp.sum(fn()))
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

    def gather_msgs(src_ref, slab_ref):
        rows = lax.broadcasted_iota(jnp.int32, (S_BLK, E_T), 0)
        srcb = jnp.broadcast_to(src_ref[0, 0:1, :], (S_BLK, E_T))
        oh = (rows == srcb).astype(jnp.bfloat16)
        return lax.dot_general(
            oh, slab_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # a: big revisited out block + zero/accumulate, NO second matmul
    def ka(src_ref, slab_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        msgs = gather_msgs(src_ref, slab_ref)
        out_ref[0:E_T, :] += msgs

    def ca():
        return pl.pallas_call(
            ka, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((D_BLK, F), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D_BLK, F), jnp.float32),
        )(src, slab)

    try_case("a: revisited big out + partial +=", ca)

    # b: second one-hot where + scatter matmul, own [W, F] out per step
    def kb(src_ref, w_ref, slab_ref, out_ref):
        msgs = gather_msgs(src_ref, slab_ref).astype(jnp.bfloat16)
        rw = lax.broadcasted_iota(jnp.int32, (W, E_T), 0)
        dstb = jnp.broadcast_to(src_ref[0, 0:1, :] % W, (W, E_T))
        wb = jnp.broadcast_to(w_ref[0, 0:1, :], (W, E_T))
        ohd = jnp.where(rw == dstb, wb, jnp.zeros((), jnp.bfloat16))
        out_ref[:] = lax.dot_general(
            ohd, msgs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def cb():
        return pl.pallas_call(
            kb, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * W, F), jnp.float32),
        )(src, w8, slab)

    try_case("b: scatter one-hot matmul, own out", cb)

    # c: like b but bool one-hot cast (no where/select)
    def kc(src_ref, slab_ref, out_ref):
        msgs = gather_msgs(src_ref, slab_ref).astype(jnp.bfloat16)
        rw = lax.broadcasted_iota(jnp.int32, (W, E_T), 0)
        dstb = jnp.broadcast_to(src_ref[0, 0:1, :] % W, (W, E_T))
        ohd = (rw == dstb).astype(jnp.bfloat16)
        out_ref[:] = lax.dot_general(
            ohd, msgs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def cc():
        return pl.pallas_call(
            kc, grid=(4,),
            in_specs=[
                pl.BlockSpec((1, 8, E_T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S_BLK, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((W, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * W, F), jnp.float32),
        )(src, slab)

    try_case("c: scatter one-hot (bool cast) matmul", cc)


if __name__ == "__main__":
    main()
