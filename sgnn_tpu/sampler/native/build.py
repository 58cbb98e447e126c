"""Build + load the native sampler shared library (g++ -O3 -fopenmp).

Compiled once into ~/.cache/sgnn_tpu/ keyed by a source hash; silently
unavailable (numpy fallback) when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "sampler.cpp")


def _cache_dir() -> str:
    d = os.environ.get(
        "SGNN_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sgnn_tpu"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def build_library(force: bool = False) -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libsgnn_sampler_{digest}.so")
    if os.path.exists(out) and not force:
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "lib.so")
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-fopenmp", _SRC, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    return out


def load_library() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    c_i64 = ctypes.c_int64
    c_u64 = ctypes.c_uint64
    c_i32 = ctypes.c_int32
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_u64 = ctypes.POINTER(ctypes.c_uint64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.sgnn_sample_hop.argtypes = [
        p_i64, p_i32, c_i64, p_i32, c_i64, c_i32, p_i32, c_u64,
        p_i32, p_u8, p_u64,
    ]
    lib.sgnn_sample_hop.restype = None
    lib.sgnn_bitmap_add.argtypes = [p_u64, p_i32, c_i64]
    lib.sgnn_bitmap_add.restype = None
    lib.sgnn_collect_srcs.argtypes = [p_u64, c_i64, p_i32, p_i32]
    lib.sgnn_collect_srcs.restype = c_i64
    lib.sgnn_reindex.argtypes = [p_i32, p_u8, c_i64, p_i32, p_i32]
    lib.sgnn_reindex.restype = None
    p_f32 = ctypes.POINTER(ctypes.c_float)
    lib.sgnn_weights.argtypes = [
        p_i32, p_u8, c_i64, c_i32, c_i64, p_i32, p_i32, p_i32, p_i32, c_i32,
        p_f32,
    ]
    lib.sgnn_weights.restype = None
    lib.sgnn_num_threads.argtypes = []
    lib.sgnn_num_threads.restype = ctypes.c_int
    lib.sgnn_gather_rows.argtypes = [p_u8, c_i64, p_i32, c_i64, p_u8, p_u8]
    lib.sgnn_gather_rows.restype = None
    lib.sgnn_csc_build.argtypes = [p_i32, c_i64, c_i64, p_i64, p_i32, p_i32]
    lib.sgnn_csc_build.restype = None
    lib.sgnn_stable_argsort.argtypes = [p_i32, c_i64, c_i64, p_i32]
    lib.sgnn_stable_argsort.restype = None
    lib.sgnn_csc_transpose.argtypes = [p_i64, p_i32, c_i64, c_i64, p_i64,
                                       p_i32]
    lib.sgnn_csc_transpose.restype = None
    return lib
