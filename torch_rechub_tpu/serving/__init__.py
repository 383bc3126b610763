from .retrieval import brute_force_topk, match_evaluation, multi_interest_topk

__all__ = ["brute_force_topk", "multi_interest_topk", "match_evaluation"]
