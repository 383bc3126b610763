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
    with pytest.raises(ValueError, match="unknown metric"):
        validate_config({"task": "ranking", "model": "DeepFM", "dataset": "x", "metrics": ["AUC", "NDCG"]})
    validate_config({"task": "ranking", "model": "DeepFM", "dataset": "criteo-sample", "metrics": ["AUC"]})


def test_baseline_direction_awareness():
    diffs = compare_to_baseline({"AUC": 0.70, "LogLoss": 0.60}, {"AUC": {"expected": 0.65, "tolerance": 0.02}, "LogLoss": {"expected": 0.65, "tolerance": 0.02}})
    by_name = {d.metric: d for d in diffs}
    assert by_name["AUC"].passed  # higher than expected: good
    assert by_name["LogLoss"].passed  # lower than expected: good
    diffs = compare_to_baseline({"AUC": 0.55, "LogLoss": 0.75}, {"AUC": {"expected": 0.65, "tolerance": 0.02}, "LogLoss": {"expected": 0.65, "tolerance": 0.02}})
    assert not any(d.passed for d in diffs)


@pytest.mark.slow
def test_ranking_benchmark_end_to_end(tmp_path):
    from benchmarks.runner import run_benchmark

    config = {"task": "ranking", "name": "criteo_deepfm", "model": "DeepFM", "dataset": "criteo-sample", "seed": 2022, "epochs": 1, "batch_size": 256, "metrics": ["AUC", "LogLoss"], "output_dir": str(tmp_path)}
    result = run_benchmark(config)
    assert 0.0 <= result["metrics"]["AUC"] <= 1.0
    assert result["runtime"]["train_seconds"] > 0
    assert "examples_per_s" in result["runtime"]
