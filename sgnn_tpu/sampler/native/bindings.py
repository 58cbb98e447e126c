"""ctypes bindings: drive the native sampler, reuse the host sampler's
weight/padding logic so numpy and native paths share one finalizer."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class _Workspace:
    """Per-sampler reusable buffers (bitmap, lookup, srcs)."""

    def __init__(self, num_vertices: int) -> None:
        self.bitmap = np.zeros(((num_vertices + 63) // 64,), dtype=np.uint64)
        self.lookup = np.zeros(num_vertices, dtype=np.int32)
        self.srcs = np.zeros(num_vertices, dtype=np.int32)


def sample_batch(sampler, batch_seeds: np.ndarray,
                 omit_map: Optional[np.ndarray], lib) -> "object":
    """Native analogue of HostSampler._sample_numpy (same hop-dict contract)."""
    adj = sampler.adj
    if not hasattr(sampler, "_native_ws"):
        sampler._native_ws = _Workspace(adj.num_vertices)
    ws: _Workspace = sampler._native_ws
    indptr = np.ascontiguousarray(adj.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(adj.indices, dtype=np.int32)
    omit_arr = None
    if omit_map is not None:
        omit_arr = np.ascontiguousarray(omit_map, dtype=np.int32)

    hops = []
    seeds = np.ascontiguousarray(batch_seeds, dtype=np.int32)
    nseed = seeds.shape[0]
    last = len(sampler.plans) - 1
    for h, plan in enumerate(sampler.plans):
        assert plan.fanout <= 1024, "native sampler supports fanout <= 1024"
        n = seeds.shape[0]
        nbr_global = np.empty((n, plan.fanout), dtype=np.int32)
        valid_u8 = np.empty((n, plan.fanout), dtype=np.uint8)
        ws.bitmap[:] = 0
        use_omit = omit_arr if (omit_arr is not None and h == last) else None
        lib.sgnn_sample_hop(
            _ptr(indptr, ctypes.c_int64),
            _ptr(indices, ctypes.c_int32),
            adj.num_vertices,
            _ptr(seeds, ctypes.c_int32),
            n,
            plan.fanout,
            _ptr(use_omit, ctypes.c_int32) if use_omit is not None else None,
            np.uint64(sampler.rng.integers(0, 2**63, dtype=np.int64)),
            _ptr(nbr_global, ctypes.c_int32),
            _ptr(valid_u8, ctypes.c_uint8),
            _ptr(ws.bitmap, ctypes.c_uint64),
        )
        # srcs = sampled neighbors ∪ seeds (sorted unique via bitmap scan)
        lib.sgnn_bitmap_add(
            _ptr(ws.bitmap, ctypes.c_uint64), _ptr(seeds, ctypes.c_int32), n
        )
        n_src = lib.sgnn_collect_srcs(
            _ptr(ws.bitmap, ctypes.c_uint64),
            adj.num_vertices,
            _ptr(ws.srcs, ctypes.c_int32),
            _ptr(ws.lookup, ctypes.c_int32),
        )
        srcs = ws.srcs[:n_src].copy()
        nbr_local = np.empty_like(nbr_global)
        lib.sgnn_reindex(
            _ptr(nbr_global, ctypes.c_int32),
            _ptr(valid_u8, ctypes.c_uint8),
            nbr_global.size,
            _ptr(ws.lookup, ctypes.c_int32),
            _ptr(nbr_local, ctypes.c_int32),
        )
        valid = valid_u8.astype(bool)
        seed_in_src = ws.lookup[seeds]
        weight = _native_weights(
            sampler, lib, nbr_local, valid_u8, seeds, srcs, plan.fanout
        )
        hops.append(
            dict(
                seeds=seeds, nbr_global=np.where(valid, nbr_global, -1),
                nbr_local=nbr_local, valid=valid, srcs=srcs,
                seed_in_src=seed_in_src, plan=plan, weight=weight,
            )
        )
        seeds = srcs
    return sampler._finalize(hops, nseed)


def gather_rows(
    features: np.ndarray,
    idx: np.ndarray,
    valid: Optional[np.ndarray] = None,
    out: Optional[np.ndarray] = None,
    lib=None,
) -> np.ndarray:
    """Parallel host row gather: out[i] = features[idx[i]], zeroed where
    ~valid.  OpenMP memcpy per row (sgnn_gather_rows) — numpy fancy indexing
    does the identical copies single-threaded, and this sits on the host
    critical path of feature staging (reference load_feature_gpu pinned-block
    assembly, ntsFastSampler.hpp:227).  Falls back to numpy when the native
    library is unavailable or layouts are non-contiguous."""
    n = int(idx.shape[0])
    if out is None:
        out = np.empty((n, features.shape[1]), features.dtype)
    if (
        lib is None
        or not features.flags.c_contiguous
        or not out.flags.c_contiguous
        or out.dtype != features.dtype
    ):
        np.take(features, np.maximum(idx, 0), axis=0, out=out)
        if valid is not None:
            out[~valid.astype(bool)] = 0
        return out
    idx32 = np.ascontiguousarray(np.maximum(idx, 0), dtype=np.int32)
    v8 = (
        None
        if valid is None
        else np.ascontiguousarray(valid, dtype=np.uint8)
    )
    row_bytes = features.shape[1] * features.itemsize
    lib.sgnn_gather_rows(
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        row_bytes,
        _ptr(idx32, ctypes.c_int32),
        n,
        _ptr(v8, ctypes.c_uint8) if v8 is not None else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def build_csc(edges: np.ndarray, num_vertices: int, lib):
    """Stable CSC build (counting sort by dst) — bit-identical to
    ``np.argsort(dst, kind="stable")`` assembly but O(E) and OpenMP-parallel.
    Returns (indptr[V+1] i64, indices[E] i32, out_degree[V] i32)."""
    e = np.ascontiguousarray(edges, dtype=np.int32)
    n_edges = int(e.shape[0])
    if n_edges and (e.max() >= num_vertices or e.min() < 0):
        raise ValueError(
            f"edge endpoint out of range [0, {num_vertices})"
        )
    indptr = np.empty(num_vertices + 1, dtype=np.int64)
    indices = np.empty(n_edges, dtype=np.int32)
    out_degree = np.empty(num_vertices, dtype=np.int32)
    lib.sgnn_csc_build(
        _ptr(e, ctypes.c_int32),
        n_edges,
        num_vertices,
        _ptr(indptr, ctypes.c_int64),
        _ptr(indices, ctypes.c_int32),
        _ptr(out_degree, ctypes.c_int32),
    )
    return indptr, indices, out_degree


def stable_argsort(keys: np.ndarray, key_range: int, lib) -> np.ndarray:
    """Stable argsort of int32 keys in [0, key_range) — OpenMP counting
    sort, bit-identical to ``np.argsort(keys, kind="stable")`` (used for
    the static CSR-order permutations of whole-graph edge lists,
    ops/segment.spmm_coo_csc)."""
    k = np.ascontiguousarray(keys, dtype=np.int32)
    n = int(k.shape[0])
    if n and (int(k.max()) >= key_range or int(k.min()) < 0):
        raise ValueError(f"key out of range [0, {key_range})")
    perm = np.empty(n, dtype=np.int32)
    lib.sgnn_stable_argsort(
        _ptr(k, ctypes.c_int32), n, key_range, _ptr(perm, ctypes.c_int32))
    return perm


def transpose_csc(indptr: np.ndarray, indices: np.ndarray,
                  num_vertices: int, lib):
    """CSC transpose without materialising the reversed edge list; output
    bit-identical to build_csc over stack([dst_of_edge, indices])."""
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    ix = np.ascontiguousarray(indices, dtype=np.int32)
    n_edges = int(ix.shape[0])
    indptr_t = np.empty(num_vertices + 1, dtype=np.int64)
    indices_t = np.empty(n_edges, dtype=np.int32)
    lib.sgnn_csc_transpose(
        _ptr(ip, ctypes.c_int64),
        _ptr(ix, ctypes.c_int32),
        num_vertices,
        n_edges,
        _ptr(indptr_t, ctypes.c_int64),
        _ptr(indices_t, ctypes.c_int32),
    )
    return indptr_t, indices_t


_MODE = {  # (WeightKind.value, degree_mode) → sgnn_weights mode enum
    ("gcn", "sampled"): 0,
    ("mean", "sampled"): 1,
    ("gcn", "global"): 2,
    ("mean", "global"): 3,
}


def _native_weights(sampler, lib, nbr_local, valid_u8, seeds, srcs, fanout):
    mode = _MODE.get((sampler.weight_kind.value, sampler.degree_mode), 4)
    if sampler.weight_kind.value == "none":
        mode = 4
    n_dst = seeds.shape[0]
    weight = np.empty((n_dst, fanout), dtype=np.float32)
    adj = sampler.adj
    out_deg = np.ascontiguousarray(adj.out_degree, dtype=np.int32)
    in_deg = np.ascontiguousarray(adj.in_degree, dtype=np.int32)
    lib.sgnn_weights(
        _ptr(nbr_local, ctypes.c_int32),
        _ptr(valid_u8, ctypes.c_uint8),
        n_dst,
        fanout,
        srcs.shape[0],
        _ptr(out_deg, ctypes.c_int32),
        _ptr(in_deg, ctypes.c_int32),
        _ptr(srcs, ctypes.c_int32),
        _ptr(seeds, ctypes.c_int32),
        mode,
        _ptr(weight, ctypes.c_float),
    )
    return weight
