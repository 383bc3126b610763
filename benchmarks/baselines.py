"""Direction-aware baseline regression checks (parity with reference ``benchmarks/baselines.py:16-98``)."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import yaml

_LOWER_IS_BETTER = {"LogLoss", "MSE"}


@dataclasses.dataclass
class BaselineDiff:
    metric: str
    expected: float
    tolerance: float
    actual: float
    passed: bool
    direction: str

    def row(self) -> str:
        flag = "OK" if self.passed else "REGRESSION"
        return f"| {self.metric} | {self.expected:.4f} | ±{self.tolerance:.4f} | {self.actual:.4f} | {flag} |"


def load_baselines(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def compare_to_baseline(result_metrics: Dict[str, float], baseline_entry: Dict) -> List[BaselineDiff]:
    """``baseline_entry`` maps metric -> {expected, tolerance}.

    Lower-is-better metrics (LogLoss/MSE) pass when
    ``actual <= expected + tolerance``; others when
    ``actual >= expected - tolerance``.
    """
    diffs = []
    for metric, spec in (baseline_entry or {}).items():
        if metric not in result_metrics:
            continue
        expected = float(spec["expected"])
        tol = float(spec.get("tolerance", 0.0))
        actual = float(result_metrics[metric])
        base_name = metric.split("@")[0].split("[")[0]
        if base_name in _LOWER_IS_BETTER:
            passed = actual <= expected + tol
            direction = "lower"
        else:
            passed = actual >= expected - tol
            direction = "higher"
        diffs.append(BaselineDiff(metric, expected, tol, actual, passed, direction))
    return diffs
