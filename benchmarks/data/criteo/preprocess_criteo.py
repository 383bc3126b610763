"""Convert the raw Criteo Display Advertising Challenge dump into the
headered CSV consumed by ``benchmarks/datasets.build_criteo_ranking_dataset``
and ``examples/ranking/run_criteo.py``.

Raw input: ``train.txt`` from the public Kaggle release — tab-separated, no
header, 40 columns (label, 13 integer features, 26 hashed categorical
features).  Output columns: ``label,I1..I13,C1..C26`` — the exact schema of
the committed ``criteo_sample.csv`` (and of the reference repo's committed
sample, ``/root/reference/examples/ranking/data/criteo/criteo_sample.csv``).

    python preprocess_criteo.py --raw train.txt --out criteo_full.csv
    python preprocess_criteo.py --raw train.txt --out criteo_sample.csv --n-rows 115
"""

from __future__ import annotations

import argparse

import pandas as pd

COLUMNS = ["label"] + [f"I{i}" for i in range(1, 14)] + [f"C{i}" for i in range(1, 27)]


def convert(raw_path: str, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    df = pd.read_csv(raw_path, sep="\t", header=None, names=COLUMNS, nrows=n_rows)
    df.to_csv(out_path, index=False)
    return df


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw", default="./train.txt", help="raw Kaggle train.txt (TSV, no header)")
    p.add_argument("--out", default="./criteo_sample.csv")
    p.add_argument("--n-rows", type=int, default=None, help="truncate to the first N rows (sample mode)")
    a = p.parse_args()
    df = convert(a.raw, a.out, a.n_rows)
    print(f"wrote {len(df)} rows x {len(df.columns)} cols -> {a.out}")
