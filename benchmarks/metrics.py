"""Benchmark metric registry + retrieval eval (parity with reference ``benchmarks/metrics.py``)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from torch_rechub_tpu.basic.metric import auc_score, log_loss
from torch_rechub_tpu.serving import match_evaluation


# single source of truth for ranking metric names; schema.py validates against it
BINARY_RANKING_METRICS = {
    "AUC": lambda y, p: auc_score(y, p),
    "LogLoss": lambda y, p: log_loss(y, p),
    "Accuracy": lambda y, p: float(np.mean((p > 0.5) == (y > 0.5))),
    "MSE": lambda y, p: float(np.mean((y - p) ** 2)),
}


def evaluate_binary_ranking(y_true, y_pred, metric_names) -> Dict[str, float]:
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    out = {}
    for name in metric_names:
        if name not in BINARY_RANKING_METRICS:
            raise KeyError(f"unknown metric {name!r}; registry: {sorted(BINARY_RANKING_METRICS)}")
        out[name] = BINARY_RANKING_METRICS[name](y_true, y_pred)
    return out


def evaluate_retrieval(user_emb, item_emb, test_user, all_item, user_col, item_col, topk: int, beyond_accuracy: bool = False) -> Dict[str, float]:
    """Exact top-k retrieval metrics (replacing the reference's Annoy path).

    With ``beyond_accuracy=True`` the same exact top-k lists additionally
    yield GAUC (per-user rank of the held-out item vs the whole catalog),
    intra-list Diversity, catalog Coverage and self-information Novelty —
    the reference ships these metric functions
    (``torch_rechub/basic/metric.py:203-313``) but never wires them into an
    eval; here one matching config exercises them under ``--check-baseline``.
    """
    res = match_evaluation(user_emb, item_emb, test_user, all_item, user_col=user_col, item_col=item_col, topk=topk)
    out = {}
    for name, values in res.items():
        out[f"{name}@{topk}"] = float(values[0].split(": ")[1])
    if beyond_accuracy:
        out.update(beyond_accuracy_scores(user_emb, item_emb, test_user, all_item, user_col, item_col, topk))
    return out


def beyond_accuracy_scores(user_emb, item_emb, test_user, all_item, user_col, item_col, topk: int) -> Dict[str, float]:
    """GAUC + Diversity/Coverage/Novelty from exact catalog-wide scores."""
    from torch_rechub_tpu.basic.metric import coverage_score, diversity_score, novelty_score
    from torch_rechub_tpu.serving import brute_force_topk

    user_emb = np.asarray(user_emb)
    item_emb = np.asarray(item_emb)
    if user_emb.ndim == 3:  # multi-interest: best-interest score per item
        scores = np.einsum("ukd,id->uki", user_emb, item_emb).max(axis=1)
        idx = np.argsort(-scores, axis=1)[:, :topk]
    else:
        scores = user_emb @ item_emb.T
        idx, _ = brute_force_topk(user_emb, item_emb, topk)
        idx = np.asarray(idx)
    item_ids = np.asarray(all_item[item_col])
    targets = np.asarray(test_user[item_col]) if item_col in test_user else None

    out = {}
    # GAUC: one positive (the held-out item) vs the whole catalog per user =
    # 1 - normalized rank of the target; mean over users with a known target.
    if targets is not None:
        id_to_row = {int(i): r for r, i in enumerate(item_ids)}
        aucs = []
        for u, t in enumerate(targets):
            r = id_to_row.get(int(t))
            if r is None:
                continue
            s = scores[u]
            aucs.append((np.sum(s < s[r]) + 0.5 * (np.sum(s == s[r]) - 1)) / max(len(s) - 1, 1))
        if aucs:
            out[f"GAUC@{len(item_ids)}"] = float(np.mean(aucs))

    rec_lists = {u: [int(item_ids[j]) for j in idx[u]] for u in range(idx.shape[0])}
    emb_by_id = {int(i): item_emb[r] for r, i in enumerate(item_ids)}
    div = diversity_score(rec_lists, emb_by_id, topKs=[topk])
    out[f"Diversity@{topk}"] = float(div["Diversity"][0].split(": ")[1])
    cov = coverage_score(rec_lists, [int(i) for i in item_ids], topKs=[topk])
    out[f"Coverage@{topk}"] = float(cov["Coverage"][0].split(": ")[1])
    counts = np.ones(len(item_ids))  # uniform popularity prior on the sample
    pop = {int(i): c / counts.sum() for i, c in zip(item_ids, counts)}
    nov = novelty_score(rec_lists, pop, topKs=[topk])
    out[f"Novelty@{topk}"] = float(nov["Novelty"][0].split(": ")[1])
    return out


def multitask_scores(task_types, targets, predicts) -> Dict[str, float]:
    """Per-task ``AUC[task_i]`` + NaN-excluded mean (reference ``metrics.py:123-145``)."""
    out = {}
    vals = []
    for i, t in enumerate(task_types):
        try:
            s = auc_score(targets[:, i], predicts[:, i]) if t == "classification" else float(np.mean((targets[:, i] - predicts[:, i]) ** 2))
        except ValueError:
            s = float("nan")
        out[f"AUC[task_{i}]"] = s
        vals.append(s)
    vals = [v for v in vals if not np.isnan(v)]
    out["AUC_mean"] = float(np.mean(vals)) if vals else float("nan")
    return out
