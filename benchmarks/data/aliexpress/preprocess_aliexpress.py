"""Assemble the public AliExpress multi-task dataset (AITM paper release,
already shipped as encoded CSVs per country) into the single CSV consumed by
``benchmarks/datasets.build_aliexpress_multitask_dataset`` and
``examples/ranking/run_aliexpress.py``.

The raw download (e.g. ``US_train.csv`` / ``US_test.csv``) already has the
final schema — ``search_id``, 16 ``categorical_*`` ids, 63 ``numerical_*``
floats, ``click``/``conversion`` labels (the format the reference consumes in
``/root/reference/examples/ranking/run_aliexpress.py:23-46``) — so this
script only concatenates the parts, validates the schema, and optionally
truncates to a committed sample.

    python preprocess_aliexpress.py --parts US_train.csv US_test.csv --out aliexpress_sample.csv --n-rows 120
"""

from __future__ import annotations

import argparse

import pandas as pd


def convert(part_paths, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    parts = [pd.read_csv(p) for p in part_paths]
    df = pd.concat(parts, axis=0, ignore_index=True)
    for col in ("click", "conversion"):
        if col not in df.columns:
            raise ValueError(f"expected label column {col!r}; got columns {list(df.columns)[:5]}...")
    if not any(c.startswith("categorical_") for c in df.columns):
        raise ValueError("no categorical_* columns found — is this the AITM-format release?")
    if n_rows:
        df = df.head(n_rows)
    df.to_csv(out_path, index=False)
    return df


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--parts", nargs="+", default=["./US_train.csv", "./US_test.csv"])
    p.add_argument("--out", default="./aliexpress_sample.csv")
    p.add_argument("--n-rows", type=int, default=None)
    a = p.parse_args()
    df = convert(a.parts, a.out, a.n_rows)
    print(f"wrote {len(df)} rows x {len(df.columns)} cols -> {a.out}")
