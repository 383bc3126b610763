from .embedding import EmbeddingCollection, feature_mask, pool_sequence

__all__ = ["EmbeddingCollection", "feature_mask", "pool_sequence"]
