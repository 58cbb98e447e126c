"""Per-column symmetric int8 feature quantization (FEATURE_DTYPE:int8).

Capacity feature, not a speed feature: storing the feature matrix (and the
HBM hot-row cache) as int8 fits 4x the rows of float32 / 2x of bfloat16 in
the same device memory, multiplying the graph size that trains with
device-resident features and the hit rate of the beyond-HBM feature cache
(reference GPU feature cache, load_feature_gpu_cache
ntsFastSampler.hpp:263, is capacity-bound the same way).  The gather itself
measures ~10% SLOWER than bf16 (per-row-overhead-bound — docs/PERF.md
"Feature-gather dtype"), which is why int8 is opt-in and never the default.

Per-COLUMN scales (scale[f] = max_v |x[v, f]| / 127) rather than per-row:
  * dequantization commutes with row aggregation and with the layer-0
    matmul (Agg(Q)·diag(s) and (Q·diag(s))·W = Q·(s⊙W)), so the scale can
    be applied to tiny tensors instead of per-gathered-row, and
  * no [V]-sized scale array has to ride along every feature gather —
    the [F] vector is a few KB.
The reference has no quantized storage; this is a capability extension.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

FEATURE_DTYPES = ("", "float32", "bfloat16", "int8")


def quantize_columns(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """features [V, F] float → (q int8 [V, F], scale float32 [F]).

    Symmetric per-column: q = round(x / scale), scale = colmax(|x|)/127.
    All-zero columns get scale 1 (q stays 0).  Exact for binary/integer
    features with ≤127 distinct magnitude steps (e.g. Cora's bag-of-words).
    """
    x = np.asarray(features, dtype=np.float32)
    absmax = np.max(np.abs(x), axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def dequantize(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Host-side inverse (tests / reference values)."""
    return q.astype(np.float32) * scale[None, :].astype(np.float32)
