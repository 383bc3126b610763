"""Retrieval serving: exact TPU top-k + ANN backends behind one ABC.

``builder_factory`` parity with ``torch_rechub/serving/__init__.py:12-47``
plus two backends the reference doesn't have: ``"bruteforce"`` (exact,
accelerator-backed) and ``"hnsw"`` (in-repo native C++ index, no pip deps).
"""

from .base import BaseBuilder, BaseIndexer
from .retrieval import brute_force_topk, match_evaluation, multi_interest_topk


def builder_factory(model: str, **builder_config) -> BaseBuilder:
    """Create a vector-index builder: annoy | faiss | milvus | bruteforce | hnsw."""
    if model == "annoy":
        from .annoy import AnnoyBuilder

        return AnnoyBuilder(**builder_config)
    if model == "faiss":
        from .faiss import FaissBuilder

        return FaissBuilder(**builder_config)
    if model == "milvus":
        from .milvus import MilvusBuilder

        return MilvusBuilder(**builder_config)
    if model == "bruteforce":
        from .bruteforce import BruteForceBuilder

        return BruteForceBuilder(**builder_config)
    if model == "hnsw":
        from .hnsw import HnswBuilder

        return HnswBuilder(**builder_config)
    raise NotImplementedError(f"model={model!r} is not implemented yet!")


__all__ = ["builder_factory", "BaseBuilder", "BaseIndexer", "brute_force_topk", "multi_interest_topk", "match_evaluation"]
