from .gather_agg import pallas_gather_aggregate, gather_aggregate_auto

__all__ = ["pallas_gather_aggregate", "gather_aggregate_auto"]
