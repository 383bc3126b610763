"""Whitelist config validation for benchmark YAMLs.

Parity with the reference's hand-rolled validator
(``/root/reference/benchmarks/schema.py:12-74``): the goal is to catch typos
like ``batchsize`` that would otherwise fall through to a default and silently
skew benchmark numbers. Our configs are flat (one YAML mapping per run) with
two nested sections: ``model_params`` (model kwargs) and ``mesh``
(device-mesh axis sizes), so validation covers

- per-task required + allowed key whitelists,
- value-type checks on every known scalar key,
- nested-section validation (``mesh`` axis whitelist, ``model_params`` keys),
- metric names checked against the live registry in ``benchmarks.metrics``
  (single source of truth — a metric the runner can't compute is rejected
  here, not at the end of a run).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

ALLOWED_TASKS = ("ranking", "matching", "multitask")

# key -> accepted python types (flat scalar keys shared by every task)
COMMON_KEY_TYPES: Dict[str, Tuple[type, ...]] = {
    "task": (str,),
    "name": (str,),
    "model": (str,),
    "dataset": (str,),
    "seed": (int,),
    "epochs": (int,),
    "batch_size": (int,),
    "learning_rate": (float, int),
    "weight_decay": (float, int),
    "embed_dim": (int,),
    "device": (str,),
    "output_dir": (str,),
    "model_params": (dict,),
    "mesh": (dict,),
    "precision": (str,),
}

TASK_KEY_TYPES: Dict[str, Dict[str, Tuple[type, ...]]] = {
    "ranking": {"metrics": (list,)},
    "matching": {"topk": (int,), "neg_ratio": (int,), "mode": (int,), "seq_max_len": (int,), "beyond_accuracy": (bool,)},
    "multitask": {"task_types": (list,), "adaptive_method": (str,)},
}

# values with a closed domain
MESH_AXES = {"data", "model"}
MATCHING_MODES = {0, 1, 2}
PRECISIONS = {"f32", "float32", "fp32", "bf16", "bfloat16", "mixed"}
ADAPTIVE_METHODS = {"uwl", "gradnorm", "metabalance"}
POSITIVE_INT_KEYS = {"epochs", "batch_size", "embed_dim", "topk", "neg_ratio", "seq_max_len"}

REQUIRED_KEYS = {"task", "model", "dataset"}


def _type_name(types: Iterable[type]) -> str:
    return "/".join(t.__name__ for t in types)


def _check_types(config: Dict[str, Any], allowed: Dict[str, Tuple[type, ...]]) -> None:
    for key, value in config.items():
        types = allowed[key]
        # bool is an int subclass; an accidental `epochs: true` must not pass
        if isinstance(value, bool) and bool not in types:
            raise ValueError(f"config key {key!r} must be {_type_name(types)}, got bool {value!r}")
        if not isinstance(value, types):
            raise ValueError(f"config key {key!r} must be {_type_name(types)}, got {type(value).__name__} {value!r}")
        if key in POSITIVE_INT_KEYS and value <= 0:
            raise ValueError(f"config key {key!r} must be a positive integer, got {value}")


def validate_config(config: Any) -> None:
    """Raise ValueError on missing, misspelled, or mistyped config entries."""
    if not isinstance(config, dict):
        raise ValueError(f"benchmark config must be a mapping, got {type(config).__name__}")

    task = config.get("task")
    if task not in ALLOWED_TASKS:
        raise ValueError(f"task must be one of {list(ALLOWED_TASKS)}, got {task!r}")

    allowed = dict(COMMON_KEY_TYPES)
    allowed.update(TASK_KEY_TYPES[task])
    unknown = sorted(set(config) - set(allowed))
    if unknown:
        raise ValueError(f"unknown config keys for task {task!r}: {unknown} (allowed: {sorted(allowed)})")
    missing = sorted(REQUIRED_KEYS - set(config))
    if missing:
        raise ValueError(f"config missing required keys: {missing}")

    _check_types(config, allowed)

    mesh = config.get("mesh")
    if mesh is not None:
        bad_axes = sorted(set(mesh) - MESH_AXES)
        if bad_axes:
            raise ValueError(f"mesh has unknown axes {bad_axes} (allowed: {sorted(MESH_AXES)})")
        for axis, size in mesh.items():
            if not isinstance(size, int) or isinstance(size, bool) or size <= 0:
                raise ValueError(f"mesh axis {axis!r} size must be a positive int, got {size!r}")

    model_params = config.get("model_params")
    if model_params is not None:
        bad = [k for k in model_params if not isinstance(k, str)]
        if bad:
            raise ValueError(f"model_params keys must be strings, got {bad}")

    precision = config.get("precision")
    if precision is not None and precision.lower() not in PRECISIONS:
        raise ValueError(f"precision must be one of {sorted(PRECISIONS)}, got {precision!r}")

    if task == "ranking":
        metrics = config.get("metrics")
        if metrics is not None:
            from benchmarks.metrics import BINARY_RANKING_METRICS
            if not isinstance(metrics, list):
                raise ValueError("ranking 'metrics' must be a list of metric names")
            unknown_metrics = sorted(set(metrics) - set(BINARY_RANKING_METRICS))
            if unknown_metrics:
                raise ValueError(f"metrics has unknown entries {unknown_metrics}; registry: {sorted(BINARY_RANKING_METRICS)}")

    if task == "matching" and "mode" in config and config["mode"] not in MATCHING_MODES:
        raise ValueError(f"matching mode must be one of {sorted(MATCHING_MODES)}, got {config['mode']!r}")

    if task == "multitask" and config.get("adaptive_method") is not None:
        method = config["adaptive_method"].lower()
        if method not in ADAPTIVE_METHODS:
            raise ValueError(f"adaptive_method must be one of {sorted(ADAPTIVE_METHODS)}, got {config['adaptive_method']!r}")
