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


def evaluate_retrieval(user_emb, item_emb, test_user, all_item, user_col, item_col, topk: int) -> Dict[str, float]:
    """Exact top-k retrieval metrics (replacing the reference's Annoy path)."""
    res = match_evaluation(user_emb, item_emb, test_user, all_item, user_col=user_col, item_col=item_col, topk=topk)
    out = {}
    for name, values in res.items():
        out[f"{name}@{topk}"] = float(values[0].split(": ")[1])
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
