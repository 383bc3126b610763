"""Whitelist config validation (parity with reference ``benchmarks/schema.py:12-74``)."""

from __future__ import annotations

COMMON_KEYS = {"task", "name", "model", "dataset", "seed", "epochs", "batch_size", "learning_rate", "weight_decay", "embed_dim", "device", "output_dir", "model_params", "mesh"}
TASK_KEYS = {
    "ranking": COMMON_KEYS | {"metrics"},
    "matching": COMMON_KEYS | {"topk", "neg_ratio", "mode", "seq_max_len"},
    "multitask": COMMON_KEYS | {"task_types", "adaptive_method"},
}
RANKING_METRICS = {"AUC", "LogLoss", "Accuracy", "MSE"}


def validate_config(config: dict) -> None:
    task = config.get("task")
    if task not in TASK_KEYS:
        raise ValueError(f"task must be one of {sorted(TASK_KEYS)}, got {task!r}")
    allowed = TASK_KEYS[task]
    unknown = set(config) - allowed
    if unknown:
        raise ValueError(f"unknown config keys for task {task!r}: {sorted(unknown)} (allowed: {sorted(allowed)})")
    for required in ("model", "dataset"):
        if required not in config:
            raise ValueError(f"config missing required key {required!r}")
    for metric in config.get("metrics", []):
        if metric not in RANKING_METRICS:
            raise ValueError(f"unknown metric {metric!r}; registry: {sorted(RANKING_METRICS)}")
