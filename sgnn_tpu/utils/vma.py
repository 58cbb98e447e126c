"""Varying-manual-axes (vma) typing helpers for shard_map code paths.

Under `jax.shard_map` with vma checking (stock-JAX default), every traced
array carries a set of mesh axes it is *varying* over; values built only
from replicated operands are typed replicated.  Custom-VJP backward rules
must return cotangents whose vma matches the primal inputs' — a cotangent
derived from per-device data is varying, so a REPLICATED array flowing
into a differentiated custom-VJP operand is a type error under the strict
check (and silently version-dependent without it).

The framework's convention is per-device partial gradients with ONE
explicit `psum(grads)` at the trainer level (reference NCCL/MPI AllReduce
parity, GCN_SAMPLE_ALL_MULTI.hpp:367).  The type-correct AND
numerics-preserving fix is therefore to lift replicated values to the
varying type at the point they join per-device data — `pvary` on a
non-differentiated source is a pure type cast whose transpose never runs.
Never psum inside a backward rule: that would double-count against the
trainer's explicit all-reduce.
"""

from __future__ import annotations

import jax


def _vma_of(x) -> frozenset:
    try:
        return frozenset(getattr(jax.typeof(x), "vma", frozenset()))
    except Exception:
        return frozenset()


def _pvary(x, axes):
    # jax.lax.pvary is deprecated in favour of pcast(..., to='varying');
    # prefer the successor so newer driver-side JAX stays warning-free.
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, tuple(axes), to="varying")
    return jax.lax.pvary(x, tuple(axes))


def match_vma(x, ref):
    """Lift `x` so its varying-manual-axes cover `ref`'s.

    No-op outside shard_map (vma sets are empty), when vma checking is off,
    or when `x` already varies over every axis `ref` does.  Use this on
    REPLICATED inputs (feature matrices, cache tables) right where they
    join per-device data on a differentiated path.
    """
    missing = _vma_of(ref) - _vma_of(x)
    if not missing:
        return x
    return _pvary(x, sorted(missing))


def psum_grads(grads, axis: str, witness):
    """Cross-device gradient TOTAL (reference NCCL/MPI AllReduce-SUM parity,
    GCN_SAMPLE_ALL_MULTI.hpp:367, NtsScheduler.hpp:825), robust to the JAX
    version's shard_map gradient semantics.

    Under vma typing (stock JAX ≥0.9 with check_vma, the default), the
    gradient of a REPLICATED param w.r.t. a varying loss is ALREADY the
    cross-axis total: the matmul auto-lifts the replicated param with
    pvary, whose transpose inserts the psum.  A further explicit psum would
    multiply by the axis size (measured: 8 devices → exactly 8× on this
    toolchain).  Without vma typing, grads come back as per-device partials
    and the explicit psum IS the reduction.  `witness` must be any
    data-varying value of the surrounding program (the per-device loss, a
    seed array): its vma set tells which regime is live.
    """
    if axis in _vma_of(witness):
        # vma typing live: psum only leaves still typed varying (none, for
        # replicated params — their totals were already inserted by AD)
        return jax.tree.map(
            lambda g: jax.lax.psum(g, axis) if axis in _vma_of(g) else g,
            grads,
        )
    return jax.lax.psum(grads, axis)


def match_cotangent_vma(ct, primal):
    """Make a backward-rule cotangent's vma match its primal input's.

    Handles only the SAFE direction: the cotangent missing axes the primal
    varies over (pvary is a pure type cast).  The opposite direction — a
    varying cotangent for a replicated primal — is NOT repaired here
    because the convention-preserving fix lives at the call site
    (match_vma on the input); reducing in the backward rule would
    double-count against the trainer's explicit psum.
    """
    if ct is None:
        return None
    missing = _vma_of(primal) - _vma_of(ct)
    if not missing:
        return ct
    return _pvary(ct, sorted(missing))
