"""Engine registry: reference ALGORITHM strings → trainer policies.

Reference: toolkits/main.cpp:46-183 dispatches 14 hard-coded engine classes,
one per (model × placement × caching × #GPU).  TPU redesign: ONE trainer
parameterised by policy knobs — model family, edge-weight kind, hot-vertex
cache on/off, device count — so every reference ALGORITHM string maps to a
configuration, not a copy-pasted training loop.

Placement semantics translation:
  *SAMPLESINGLE / *_CPU_*  → single-chip, global-degree weights (CPU engines)
  *SAMPLEGPU / *ALLGPU     → single-chip, sampled-degree weights (GPU engines)
  *PDCACHE / *CACHE        → + hot-vertex embedding cache w/ bounded staleness
  *ALLMULTI / *PCMULTI     → + data-parallel over the device mesh
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..config import RunConfig
from ..data.dataset import Dataset
from ..sampler.blocks import WeightKind


@dataclasses.dataclass(frozen=True)
class EngineSpec:
    name: str                   # reference ALGORITHM string
    family: str                 # gcn | sage | gat
    weight_kind: WeightKind
    degree_mode: str            # global | sampled
    use_cache: bool = False     # NeutronOrch hot-vertex embedding cache
    cache_on_device: bool = True  # GS_SAMPLE_CACHE: refresh on accelerator
    multi_device: bool = False  # data-parallel over mesh
    bias_correction: bool = False  # CPU engines use bias-corrected Adam
    device_sampling: bool = False  # ALLGPU engines: sample on-accelerator


def _spec(name, family, wk, degree_mode="sampled", **kw) -> EngineSpec:
    return EngineSpec(name=name, family=family, weight_kind=wk,
                      degree_mode=degree_mode, **kw)


# One entry per reference engine (toolkits/main.cpp:68-183).
ENGINES = {
    s.name: s
    for s in [
        # GCN family
        _spec("GCNSAMPLESINGLE", "gcn", WeightKind.GCN, "global",
              bias_correction=True),
        _spec("GCNSAMPLEGPU", "gcn", WeightKind.GCN, "global"),
        _spec("GCNSAMPLEALLGPU", "gcn", WeightKind.GCN, device_sampling=True),
        _spec("GCNSAMPLEPDCACHE", "gcn", WeightKind.GCN, use_cache=True,
              cache_on_device=False),
        _spec("GCNSAMPLEALLMULTI", "gcn", WeightKind.GCN, multi_device=True,
              device_sampling=True),
        _spec("GCNSAMPLEPCMULTI", "gcn", WeightKind.GCN, use_cache=True,
              cache_on_device=False, multi_device=True),
        # GraphSAGE family (mean aggregator)
        _spec("GSSAMPLEALLGPU", "sage", WeightKind.MEAN, device_sampling=True),
        _spec("GSSAMPLECACHE", "sage", WeightKind.MEAN, use_cache=True,
              cache_on_device=True),
        _spec("GSSAMPLEPDCACHE", "sage", WeightKind.MEAN, use_cache=True,
              cache_on_device=False),
        _spec("GSSAMPLEPCMULTI", "sage", WeightKind.MEAN, use_cache=True,
              cache_on_device=False, multi_device=True),
        # GAT family (attention weights computed by the model itself)
        _spec("GATSAMPLEALLGPU", "gat", WeightKind.NONE, device_sampling=True),
        _spec("GATSAMPLEPDCACHE", "gat", WeightKind.NONE, use_cache=True,
              cache_on_device=False),
        _spec("GATSAMPLEALLMULTI", "gat", WeightKind.NONE, multi_device=True,
              device_sampling=True),
        _spec("GATSAMPLEPCMULTI", "gat", WeightKind.NONE, use_cache=True,
              cache_on_device=False, multi_device=True),
    ]
}


def engine_from_config(cfg: RunConfig) -> EngineSpec:
    algo = cfg.algorithm.upper()
    if algo not in ENGINES:
        raise KeyError(
            f"unknown ALGORITHM '{cfg.algorithm}'; known: {sorted(ENGINES)}"
        )
    return ENGINES[algo]


def run_engine(cfg: RunConfig, dataset: Dataset, epochs: Optional[int] = None):
    """Build + run the trainer an ALGORITHM string names (main.cpp parity)."""
    from .trainer import SampleTrainer

    spec = engine_from_config(cfg)
    if spec.use_cache and spec.cache_on_device and not spec.multi_device:
        # GS_SAMPLE_CACHE: cache refreshed on the accelerator — fully-fused
        # device-sampled + in-scan cached trainer
        from .device_cached import DeviceCachedSampleTrainer

        trainer = DeviceCachedSampleTrainer(
            cfg, dataset,
            family=spec.family,
            weight_kind=spec.weight_kind,
            bias_correction=spec.bias_correction,
        )
    elif spec.use_cache:
        from ..cache.orchestrator import CachedSampleTrainer

        trainer = CachedSampleTrainer(
            cfg, dataset,
            family=spec.family,
            weight_kind=spec.weight_kind,
            degree_mode=spec.degree_mode,
            bias_correction=spec.bias_correction,
        )
    elif spec.device_sampling:
        from .device_trainer import DeviceSampleTrainer

        trainer = DeviceSampleTrainer(
            cfg, dataset,
            family=spec.family,
            weight_kind=spec.weight_kind,
            bias_correction=spec.bias_correction,
        )
        if spec.multi_device:
            from ..parallel.dp_device import DeviceDataParallelTrainer

            trainer = DeviceDataParallelTrainer(trainer)
        return trainer.run(epochs=epochs)
    else:
        trainer = SampleTrainer(
            cfg, dataset,
            family=spec.family,
            weight_kind=spec.weight_kind,
            degree_mode=spec.degree_mode,
            bias_correction=spec.bias_correction,
        )
    if spec.multi_device:
        from ..parallel.dp import DataParallelTrainer

        trainer = DataParallelTrainer(trainer)
    return trainer.run(epochs=epochs)
