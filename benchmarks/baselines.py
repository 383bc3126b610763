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


def record_baseline(path: str, name: str, result_metrics: Dict[str, float], default_tolerance: float = 0.15) -> Dict:
    """Rewrite ``name``'s expected values from a fresh run (``runner --record``).

    Keeps each metric's existing tolerance (so deliberate slack choices
    survive), tracks the same metric SET the entry already tracks (all
    metrics for a new entry), and rewrites the whole file coherently —
    the round-4 failure mode was a single metric of a shifted triple being
    re-recorded by hand.
    """
    baselines = load_baselines(path) if os.path.exists(path) else {}
    entry = baselines.get(name) or {}
    tracked = list(entry.keys()) or list(result_metrics.keys())
    new_entry = {}
    for metric in tracked:
        tol = float(entry.get(metric, {}).get("tolerance", default_tolerance))
        if metric not in result_metrics:
            # NEVER silently drop a tracked metric (that would shrink
            # regression coverage without notice) — keep the old spec and warn
            import warnings

            warnings.warn(f"record_baseline({name!r}): tracked metric {metric!r} missing from this run's metrics {sorted(result_metrics)} — keeping the previous expected value")
            new_entry[metric] = dict(entry[metric])
            continue
        new_entry[metric] = {"expected": round(float(result_metrics[metric]), 4), "tolerance": tol}
    baselines[name] = new_entry
    header = (
        "# Pipeline regression sentinels on the committed tiny samples / synthetic\n"
        "# generators — NOT statements about model quality.  Refresh any entry with\n"
        "#   python benchmarks/runner.py --config <cfg> --record\n"
        "# after an intentional change or environment shift (one command, one diff).\n"
    )
    with open(path, "w") as f:
        f.write(header)
        yaml.safe_dump(baselines, f, sort_keys=True)
    return new_entry


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
