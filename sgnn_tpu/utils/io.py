"""Fast bulk array IO.

numpy's ``np.fromfile`` / ``np.load`` / ``arr.tofile`` move ~6 MB/s on this
class of VM (per-chunk overhead in numpy's file loop amplified by slow
guest page faults), while a single ``f.read()`` + ``np.frombuffer`` streams
at disk/page-cache speed (measured 0.4 s vs 122 s for a 535 MB array —
300×).  These helpers are drop-in fast paths for the framework's bulk
loads: the binary edge list (reference Graph::load_directed reads the same
format with raw ``read()`` chunks, core/graph.hpp:1129), the bench dataset
cache, and .npy round-trips.
"""

from __future__ import annotations

import numpy as np


def read_binary(path: str, dtype) -> np.ndarray:
    """Whole-file typed read via one read() + frombuffer (writable copy)."""
    with open(path, "rb") as f:
        buf = f.read()
    return np.frombuffer(bytearray(buf), dtype=dtype)


def save_npy(path: str, arr: np.ndarray) -> None:
    """np.save equivalent that bypasses arr.tofile's slow write loop."""
    arr = np.ascontiguousarray(arr)
    with open(path, "wb") as f:
        np.lib.format.write_array_header_1_0(
            f, np.lib.format.header_data_from_array_1_0(arr)
        )
        f.write(arr.tobytes())


def load_npy(path: str) -> np.ndarray:
    """np.load equivalent via one read() + frombuffer (writable array)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
        elif version == (2, 0):
            shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
        else:  # pragma: no cover - future format
            return np.load(path)
        if dtype.hasobject:  # pragma: no cover - not used for bulk data
            return np.load(path, allow_pickle=True)
        buf = f.read()
    a = np.frombuffer(bytearray(buf), dtype=dtype, count=int(np.prod(shape)))
    return a.reshape(shape, order="F" if fortran else "C")
