"""result.yaml + summary.md writers (parity with reference ``benchmarks/report.py:13-50``)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import yaml


def write_result(output_dir: str, result: Dict, diffs: Optional[List] = None) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "result.yaml"), "w") as f:
        yaml.safe_dump(result, f, sort_keys=False)
    lines = [f"# Benchmark: {result.get('name', result.get('config', {}).get('name', 'unnamed'))}", ""]
    lines.append("## Metrics")
    for k, v in result.get("metrics", {}).items():
        lines.append(f"- **{k}**: {v:.6f}" if isinstance(v, float) else f"- **{k}**: {v}")
    rt = result.get("runtime", {})
    if rt:
        lines.append("")
        lines.append("## Runtime (seconds)")
        for k, v in rt.items():
            lines.append(f"- {k}: {v:.3f}")
    if diffs:
        lines += ["", "## Baseline comparison", "| metric | expected | tolerance | actual | status |", "|---|---|---|---|---|"]
        lines += [d.row() for d in diffs]
    with open(os.path.join(output_dir, "summary.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
