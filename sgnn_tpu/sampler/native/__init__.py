"""Native (C++/OpenMP) sampler backend — built on demand, numpy fallback.

Reference analog: FastSampler's OpenMP hop loop (core/ntsFastSampler.hpp:962)
is C++; our native backend plays the same role for host-side sampling speed.
Built lazily via `build.ensure_built()`; `lib` stays None (pure-numpy
fallback in sampler/host.py) if no toolchain is available.
"""

lib = None

try:  # pragma: no cover - exercised when the C++ lib is built
    from .build import load_library

    lib = load_library()
except Exception:
    lib = None


def sample_batch(sampler, seeds, omit_map=None):
    from .bindings import sample_batch as _sb

    return _sb(sampler, seeds, omit_map, lib)


def gather_rows(features, idx, valid=None, out=None):
    """Parallel host feature-row gather (numpy fallback when lib is None)."""
    from .bindings import gather_rows as _gr

    return _gr(features, idx, valid=valid, out=out, lib=lib)


def build_csc(edges, num_vertices):
    """Native stable CSC build; returns None when the lib is unavailable
    (caller falls back to the numpy argsort path)."""
    if lib is None:
        return None
    from .bindings import build_csc as _bc

    return _bc(edges, num_vertices, lib)


def transpose_csc(indptr, indices, num_vertices):
    """Native CSC transpose; None when the lib is unavailable."""
    if lib is None:
        return None
    from .bindings import transpose_csc as _tc

    return _tc(indptr, indices, num_vertices, lib)


def stable_argsort(keys, key_range):
    """Stable argsort of int32 keys in [0, key_range) — native O(E) OpenMP
    counting sort, numpy fallback bit-identical."""
    if lib is None:
        import numpy as np

        return np.argsort(keys, kind="stable").astype(np.int32)
    from .bindings import stable_argsort as _sa

    return _sa(keys, key_range, lib)
