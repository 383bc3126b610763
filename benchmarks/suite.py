"""Run many benchmark configs and emit a side-by-side comparison report.

Parity with reference ``benchmarks/suite.py:37-172``: the suite does not
re-implement per-benchmark logic — it calls ``run_benchmark`` for each config,
writes each run's artifacts via ``write_result``, and produces a top-level
``suite.yaml`` + ``suite.md`` so multiple models can be compared at a glance.
With ``--check-baseline``, every run's metrics are diffed against
``benchmarks/baselines/<task>.yaml``; a config with NO baseline entry is
reported as a failing ``<no baseline>`` sentinel row (silent gaps in baseline
coverage count as regressions, matching the reference's behavior).

Usage::

    python benchmarks/suite.py --configs 'benchmarks/configs/ranking/*.yaml' [--check-baseline]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.baselines import BaselineDiff, compare_to_baseline, load_baselines
from benchmarks.report import write_result
from benchmarks.runner import run_benchmark
from benchmarks.schema import validate_config


def _missing_baseline_sentinel(name: str) -> BaselineDiff:
    """A synthetic failing diff for a config that has no baseline entry."""
    return BaselineDiff(metric="<no baseline>", expected=float("nan"), actual=float("nan"), tolerance=0.0, passed=False, direction="higher")


def _diff_for(config: dict, result: dict) -> list:
    baseline_file = os.path.join(os.path.dirname(__file__), "baselines", f"{config['task']}.yaml")
    if not os.path.exists(baseline_file):
        return [_missing_baseline_sentinel(result["name"])]
    entry = load_baselines(baseline_file).get(result["name"], {})
    diffs = compare_to_baseline(result["metrics"], entry)
    return diffs or [_missing_baseline_sentinel(result["name"])]


def run_suite(config_paths, check_baseline: bool = False, output_dir: str = "/tmp/bench_suite"):
    os.makedirs(output_dir, exist_ok=True)
    rows = []
    any_regression = False
    for path in config_paths:
        with open(path) as f:
            config = yaml.safe_load(f)
        validate_config(config)
        config.setdefault("output_dir", os.path.join(output_dir, config.get("name", os.path.basename(path))))
        result = run_benchmark(config)
        diffs = _diff_for(config, result) if check_baseline else None
        if diffs:
            any_regression |= any(not d.passed for d in diffs)
        write_result(config["output_dir"], result, diffs)
        rows.append({
            "name": result["name"],
            "task": config["task"],
            "model": result.get("model", config.get("model", "")),
            "dataset": result.get("dataset", config.get("dataset", "")),
            "parameter_count": result.get("parameter_count"),
            "metrics": result["metrics"],
            "runtime": result["runtime"],
            "diffs": [d.__dict__ for d in diffs] if diffs else None,
        })

    with open(os.path.join(output_dir, "suite.yaml"), "w") as f:
        yaml.safe_dump(rows, f, sort_keys=False)
    lines = ["# Benchmark suite", "", "| config | task | model | dataset | params | metrics | train_s |", "|---|---|---|---|---|---|---|"]
    for r in rows:
        metrics_str = ", ".join(f"{k}={v:.4f}" for k, v in r["metrics"].items() if isinstance(v, float))
        params = f"{r['parameter_count']:,}" if r.get("parameter_count") else "-"
        lines.append(f"| {r['name']} | {r['task']} | {r['model']} | {r['dataset']} | {params} | {metrics_str} | {r['runtime'].get('train_seconds', 0):.2f} |")
    if check_baseline:
        lines += ["", "## Baseline diffs", "| config | metric | expected | actual | status |", "|---|---|---|---|---|"]
        for r in rows:
            for d in r["diffs"] or []:
                lines.append(f"| {r['name']} | {d['metric']} | {d['expected']:.4f}±{d['tolerance']:.4f} | {d['actual']:.4f} | {'OK' if d['passed'] else 'REGRESSION'} |")
    with open(os.path.join(output_dir, "suite.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return rows, any_regression


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True, help="glob of config yamls")
    parser.add_argument("--check-baseline", action="store_true")
    parser.add_argument("--output-dir", default="/tmp/bench_suite")
    args = parser.parse_args(argv)
    paths = sorted(glob.glob(args.configs))
    if not paths:
        print(f"no configs matched {args.configs}", file=sys.stderr)
        return 2
    rows, regression = run_suite(paths, args.check_baseline, args.output_dir)
    print(f"ran {len(rows)} configs -> {args.output_dir}/suite.md")
    return 1 if regression else 0


if __name__ == "__main__":
    sys.exit(main())
