from .gather_agg import pallas_gather_aggregate, gather_aggregate_auto
from .mxu_spmm import (
    MxuSpmmPair,
    MxuSpmmPlan,
    MxuSpmmStatic,
    build_mxu_spmm_pair,
    build_mxu_spmm_plan,
    mxu_spmm,
    mxu_spmm_fwd,
)

__all__ = [
    "pallas_gather_aggregate",
    "gather_aggregate_auto",
    "MxuSpmmPair",
    "MxuSpmmPlan",
    "MxuSpmmStatic",
    "build_mxu_spmm_pair",
    "build_mxu_spmm_plan",
    "mxu_spmm",
    "mxu_spmm_fwd",
]
