from .blocks import SampledBlock, SampledBatch, WeightKind
from .host import HostSampler
from .device import device_sample_batch

__all__ = [
    "SampledBlock",
    "SampledBatch",
    "WeightKind",
    "HostSampler",
    "device_sample_batch",
]
