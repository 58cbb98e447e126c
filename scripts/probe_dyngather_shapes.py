"""Probe which in-kernel take_along_axis (tpu.dynamic_gather) shapes the
installed Mosaic toolchain compiles, and at what rate.  One-off diagnostic
for the tiled-SpMM kernel design (round 4)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8


def probe(m, n, axis, iters=K):
    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        # pseudo-random but cheap in-kernel indices, avoids index delivery
        r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        lim = m if axis == 0 else n
        idx = ((r * 131 + c * 7 + i * 13) % lim).astype(jnp.int32)
        g = jnp.take_along_axis(x_ref[:], idx, axis=axis)
        out_ref[:] = g

    n_steps = 64

    @jax.jit
    def run(x):
        def body(carry, _):
            y = pl.pallas_call(
                kernel,
                grid=(n_steps,),
                in_specs=[pl.BlockSpec((m, n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            )(carry)
            return y, None

        y, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, n)),
                    jnp.float32)
    try:
        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        dt = (time.perf_counter() - t0) / (iters * n_steps)
        nel = m * n
        print(f"  [{m},{n}] axis={axis}: OK  {dt*1e6:9.1f} us/shuffle "
              f"({dt/nel*1e9:6.3f} ns/elem)", flush=True)
    except Exception as ex:  # noqa: BLE001
        msg = str(ex).split("\n")[0][:100]
        print(f"  [{m},{n}] axis={axis}: FAIL {type(ex).__name__}: {msg}",
              flush=True)


if __name__ == "__main__":
    for shape, ax in [
        ((8, 128), 0),
        ((8, 128), 1),
        ((128, 128), 0),
        ((256, 128), 0),
        ((1024, 128), 0),
        ((2048, 128), 0),
        ((128, 256), 1),
        ((128, 1024), 1),
        ((512, 512), 0),
    ]:
        probe(shape[0], shape[1], ax)
