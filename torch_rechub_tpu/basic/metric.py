"""Evaluation metrics (accuracy + beyond-accuracy), numpy host-side.

Parity with ``torch_rechub/basic/metric.py``: auc_score, gauc_score, log_loss,
topk_metrics (NDCG/MRR/Recall/Hit/Precision with the reference's formatted
string outputs), diversity_score (ILD), coverage_score, novelty_score.

Differences from the reference:
- AUC is an exact tie-aware rank statistic (Mann-Whitney U), equivalent to
  ``sklearn.roc_auc_score`` but dependency-free.
- topk accumulation is vectorized; semantics (including the reference's
  idcg-truncation and "hits normalized by total ground truths" conventions,
  ``metric.py:112-195``) are preserved bit-for-bit at the rounded output.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def auc_score(y_true, y_pred):
    """Exact ROC-AUC via average ranks (tie-aware Mann-Whitney)."""
    y_true = np.asarray(y_true).ravel().astype(np.float64)
    y_pred = np.asarray(y_pred).ravel().astype(np.float64)
    n_pos = float(np.sum(y_true > 0))
    n_neg = float(len(y_true) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("AUC undefined: y_true contains a single class")
    order = np.argsort(y_pred, kind="mergesort")
    sorted_pred = y_pred[order]
    ranks = np.empty(len(y_pred), dtype=np.float64)
    # average ranks over tied groups (1-based)
    _, inv, counts = np.unique(sorted_pred, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank = cum - (counts - 1) / 2.0
    ranks[order] = avg_rank[inv]
    pos_rank_sum = np.sum(ranks[y_true > 0])
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def auc_histogram(y_true, y_score, n_bins: int = 65536, lo: float = 0.0, hi: float = 1.0, weight=None):
    """Per-shard (pos, neg) score histograms — the device-side AUC primitive.

    Pure jnp, shardable: histograms from different batches/shards/hosts ADD
    (or ``psum`` over a mesh axis) before :func:`auc_from_histogram`, so exact
    bucketed AUC never funnels raw scores through the host (the reference's
    sklearn path is host-only, ``torch_rechub/basic/metric.py:47-74``).
    """
    import jax.numpy as jnp

    y_true = jnp.asarray(y_true).reshape(-1).astype(jnp.float32)
    s = jnp.asarray(y_score).reshape(-1).astype(jnp.float32)
    w = jnp.ones_like(y_true) if weight is None else jnp.asarray(weight).reshape(-1).astype(jnp.float32)
    bins = jnp.clip(((s - lo) / (hi - lo) * n_bins).astype(jnp.int32), 0, n_bins - 1)
    pos = jnp.zeros((n_bins,), jnp.float32).at[bins].add(y_true * w)
    neg = jnp.zeros((n_bins,), jnp.float32).at[bins].add((1.0 - y_true) * w)
    return pos, neg


def auc_from_histogram(pos, neg):
    """Tie-aware AUC from (pos, neg) score histograms.

    Exact for scores quantized to the bins; error O(1/n_bins) otherwise
    (within 1e-4 of sklearn at the default 65536 bins for [0, 1] scores).
    """
    import jax.numpy as jnp

    pos = jnp.asarray(pos, jnp.float32)
    neg = jnp.asarray(neg, jnp.float32)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    neg_below = jnp.cumsum(neg) - neg  # negatives strictly below each bin
    auc = jnp.sum(pos * (neg_below + 0.5 * neg)) / (n_pos * n_neg)
    return auc


def auc_score_bucketed(y_true, y_score, n_bins: int = 65536):
    """Histogram AUC in one call (host convenience wrapper)."""
    pos, neg = auc_histogram(y_true, y_score, n_bins=n_bins)
    return float(auc_from_histogram(pos, neg))


def get_user_pred(y_true, y_pred, users):
    """Group labels/scores by user id — reference helper (``metric.py:26-44``)."""
    user_pred = {}
    for t, p, u in zip(y_true, y_pred, users):
        entry = user_pred.setdefault(u, {"y_true": [], "y_pred": []})
        entry["y_true"].append(t)
        entry["y_pred"].append(p)
    return user_pred


def gauc_score(y_true, y_pred, users, weights=None):
    """Per-user AUC averaged with impression-count (or given) weights."""
    assert len(y_true) == len(y_pred) == len(users)
    user_pred = get_user_pred(y_true, y_pred, users)
    total, norm = 0.0, 0.0
    for u, d in user_pred.items():
        auc = auc_score(d["y_true"], d["y_pred"])
        w = len(d["y_true"]) if weights is None else weights[u]
        total += auc * w
        norm += w
    return total / norm


def log_loss(y_true, y_pred):
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_pred = np.clip(np.asarray(y_pred, dtype=np.float64).ravel(), 1e-15, 1 - 1e-15)
    return float(-np.mean(y_true * np.log(y_pred) + (1 - y_true) * np.log(1 - y_pred)))


def topk_metrics(y_true, y_pred, topKs=None):
    """NDCG/MRR/Recall/Hit/Precision@K over per-user recommendation lists.

    Args/semantics mirror the reference (``metric.py:112-195``): dict inputs
    ``{user: [items]}``; Hit is normalized by total ground-truth count, the
    others by user count; outputs are formatted strings ``"Metric@K: value"``.
    """
    if topKs is None:
        topKs = [5]
    if not isinstance(topKs, (tuple, list)):
        raise ValueError("topKs wrong, it should be tuple or list")
    assert len(y_true) == len(y_pred)

    users = list(y_true.keys())
    n_users = len(users)
    results = defaultdict(list)
    for k in topKs:
        ndcgs = mrrs = hits = precisions = recalls = 0.0
        gts = 0
        for u in users:
            truth = y_true[u]
            if len(truth) == 0:
                continue
            truth_set = set(truth)
            rec = y_pred[u][:k]
            rel = np.array([1.0 if it in truth_set else 0.0 for it in rec])
            discounts = 1.0 / np.log2(np.arange(len(rec)) + 2.0)
            hit_cnt = float(rel.sum())
            dcg = float((rel * discounts).sum())
            idcg = float(discounts[: min(k, len(truth))].sum())
            first_hit = np.flatnonzero(rel)
            gts += len(truth)
            hits += hit_cnt
            mrrs += 1.0 / (1.0 + first_hit[0]) if first_hit.size else 0.0
            recalls += hit_cnt / len(truth)
            precisions += hit_cnt / k
            if idcg > 0:
                ndcgs += dcg / idcg
        results["NDCG"].append(f"NDCG@{k}: {round(ndcgs / n_users, 4)}")
        results["MRR"].append(f"MRR@{k}: {round(mrrs / n_users, 4)}")
        results["Recall"].append(f"Recall@{k}: {round(recalls / n_users, 4)}")
        results["Hit"].append(f"Hit@{k}: {round(hits / gts, 4)}")
        results["Precision"].append(f"Precision@{k}: {round(precisions / n_users, 4)}")
    return results


def ndcg_score(y_true, y_pred, topKs=None):
    return topk_metrics(y_true, y_pred, topKs or [5])["NDCG"]


def mrr_score(y_true, y_pred, topKs=None):
    return topk_metrics(y_true, y_pred, topKs or [5])["MRR"]


def recall_score(y_true, y_pred, topKs=None):
    return topk_metrics(y_true, y_pred, topKs or [5])["Recall"]


def hit_score(y_true, y_pred, topKs=None):
    return topk_metrics(y_true, y_pred, topKs or [5])["Hit"]


def precision_score(y_true, y_pred, topKs=None):
    return topk_metrics(y_true, y_pred, topKs or [5])["Precision"]


def diversity_score(y_pred, item_embeddings, topKs=None):
    """Intra-List Diversity: mean pairwise cosine distance inside each list."""
    if topKs is None:
        topKs = [5]
    results = defaultdict(list)
    emb_is_dict = isinstance(item_embeddings, dict)
    for k in topKs:
        per_user = []
        for u, rec in y_pred.items():
            items = rec[:k]
            embs = []
            for it in items:
                if emb_is_dict:
                    if it in item_embeddings:
                        embs.append(np.asarray(item_embeddings[it], dtype=np.float64))
                elif it < len(item_embeddings):
                    embs.append(np.asarray(item_embeddings[it], dtype=np.float64))
            n = len(embs)
            if n < 2:
                continue
            mat = np.stack(embs)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-10)
            sims = mat @ mat.T
            dist_sum = float((1.0 - sims)[np.triu_indices(n, k=1)].sum())
            per_user.append(dist_sum / (n * (n - 1) / 2))
        score = round(float(np.mean(per_user)), 4) if per_user else 0.0
        results["Diversity"].append(f"Diversity@{k}: {score}")
    return results


def coverage_score(y_pred, all_items, topKs=None):
    """Catalog coverage: fraction of catalog appearing in any top-k list."""
    if topKs is None:
        topKs = [5]
    results = defaultdict(list)
    for k in topKs:
        rec = set()
        for u, items in y_pred.items():
            rec.update(items[:k])
        results["Coverage"].append(f"Coverage@{k}: {round(len(rec) / len(all_items), 4)}")
    return results


def novelty_score(y_pred, item_popularity, topKs=None):
    """Mean self-information ``-log2(popularity)`` of recommended items."""
    if topKs is None:
        topKs = [5]
    results = defaultdict(list)
    for k in topKs:
        per_user = []
        for u, items in y_pred.items():
            rec = items[:k]
            if len(rec) == 0:
                continue
            info = [-np.log2(max(item_popularity.get(it, 1e-10), 1e-10)) for it in rec]
            per_user.append(float(np.mean(info)))
        score = round(float(np.mean(per_user)), 4) if per_user else 0.0
        results["Novelty"].append(f"Novelty@{k}: {score}")
    return results
