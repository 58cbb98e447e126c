from .hotness import presample_hotness, super_batch_stable_shuffle
from .feature_cache import FeatureCache
from .embedding_cache import EmbeddingCache, StalenessQueue

__all__ = [
    "presample_hotness",
    "super_batch_stable_shuffle",
    "FeatureCache",
    "EmbeddingCache",
    "StalenessQueue",
]
