"""Benchmark harness tests: schema validation, baseline diffing, one real run."""

import numpy as np
import pytest

from benchmarks.baselines import compare_to_baseline
from benchmarks.schema import validate_config


def test_schema_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown config keys"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "criteo-sample", "learning_rte": 0.1})
    with pytest.raises(ValueError, match="task must be"):
        validate_config({"task": "rankin", "model": "DeepFM", "dataset": "x"})
    with pytest.raises(ValueError, match="unknown entries"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "metrics": ["AUC", "NDCG"]})
    validate_config({"task": "ranking", "model": "DeepFM", "dataset": "criteo-sample", "metrics": ["AUC"]})


def test_schema_rejects_task_mismatched_keys():
    # matching-only keys are rejected for ranking and vice versa
    with pytest.raises(ValueError, match="unknown config keys"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "topk": 10})
    with pytest.raises(ValueError, match="unknown config keys"):
        validate_config({"task": "matching", "model": "DSSM", "dataset": "x", "metrics": ["AUC"]})


def test_schema_type_and_domain_checks():
    with pytest.raises(ValueError, match="must be int"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "epochs": "3"})
    with pytest.raises(ValueError, match="positive integer"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "batch_size": 0})
    with pytest.raises(ValueError, match="got bool"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "epochs": True})
    with pytest.raises(ValueError, match="mode must be one of"):
        validate_config({"task": "matching", "model": "DSSM", "dataset": "x", "mode": 5})
    with pytest.raises(ValueError, match="adaptive_method"):
        validate_config({"task": "multitask", "model": "MMOE", "dataset": "x", "adaptive_method": "gradno"})
    validate_config({"task": "multitask", "model": "MMOE", "dataset": "x", "adaptive_method": "MetaBalance"})


def test_schema_mesh_section():
    validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "mesh": {"data": 4, "model": 2}})
    with pytest.raises(ValueError, match="unknown axes"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "mesh": {"dta": 4}})
    with pytest.raises(ValueError, match="positive int"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "mesh": {"data": 0}})


def test_schema_registry_is_live():
    # schema validates against the same registry the runner evaluates with
    from benchmarks.metrics import BINARY_RANKING_METRICS, evaluate_binary_ranking

    names = sorted(BINARY_RANKING_METRICS)
    out = evaluate_binary_ranking(np.array([0.0, 1.0, 1.0, 0.0]), np.array([0.1, 0.9, 0.7, 0.3]), names)
    assert set(out) == set(names)
    validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "metrics": names})


def test_baseline_direction_awareness():
    diffs = compare_to_baseline({"AUC": 0.70, "LogLoss": 0.60}, {"AUC": {"expected": 0.65, "tolerance": 0.02}, "LogLoss": {"expected": 0.65, "tolerance": 0.02}})
    by_name = {d.metric: d for d in diffs}
    assert by_name["AUC"].passed  # higher than expected: good
    assert by_name["LogLoss"].passed  # lower than expected: good
    diffs = compare_to_baseline({"AUC": 0.55, "LogLoss": 0.75}, {"AUC": {"expected": 0.65, "tolerance": 0.02}, "LogLoss": {"expected": 0.65, "tolerance": 0.02}})
    assert not any(d.passed for d in diffs)


def test_suite_missing_baseline_is_a_regression():
    from benchmarks.suite import _diff_for

    diffs = _diff_for({"task": "ranking"}, {"name": "not_in_baselines", "metrics": {"AUC": 0.9}})
    assert len(diffs) == 1 and diffs[0].metric == "<no baseline>" and not diffs[0].passed


@pytest.mark.slow
def test_ranking_benchmark_end_to_end(tmp_path):
    from benchmarks.runner import run_benchmark

    config = {"task": "ranking", "name": "criteo_deepfm", "model": "DeepFM", "dataset": "criteo-sample", "seed": 2022, "epochs": 1, "batch_size": 256, "metrics": ["AUC", "LogLoss"], "output_dir": str(tmp_path)}
    result = run_benchmark(config)
    assert 0.0 <= result["metrics"]["AUC"] <= 1.0
    assert result["runtime"]["train_seconds"] > 0
    assert "examples_per_s" in result["runtime"]
    assert result["parameter_count"] > 0
    assert result["model"] == "DeepFM" and result["dataset"] == "criteo-sample"
