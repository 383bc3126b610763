"""Convert the raw Avazu CTR ``train.csv`` into the label-encoded CSV
consumed by ``benchmarks/datasets.build_avazu_ranking_dataset`` and
``examples/ranking/run_avazu.py``.

Raw input: the public Kaggle release — 24 columns (``id, click, hour, C1,
banner_pos, site_id, ..., C21``).  ``id`` is dropped, ``click`` becomes
``label``, and the remaining 22 features (including ``hour``) are integer
label-encoded to ``feat_1..feat_22`` — the schema of the committed
``avazu_sample.csv`` (matches the preprocessed parts the reference repo
ships, consumed by ``/root/reference/examples/ranking/run_avazu.py:25-60``).

    python preprocess_avazu.py --raw train.csv --out avazu_full.csv
    python preprocess_avazu.py --raw train.csv --out avazu_sample.csv --n-rows 100
"""

from __future__ import annotations

import argparse

import pandas as pd


def convert(raw_path: str, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    df = pd.read_csv(raw_path, nrows=n_rows, dtype=str)
    if "id" in df.columns:
        df = df.drop(columns=["id"])
    label = df.pop("click").astype(int)
    out = pd.DataFrame({"label": label})
    for i, col in enumerate(df.columns, start=1):
        codes, _ = pd.factorize(df[col], sort=True)
        out[f"feat_{i}"] = codes.astype("int64")
    out.to_csv(out_path, index=False)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw", default="./train.csv", help="raw Kaggle Avazu train.csv")
    p.add_argument("--out", default="./avazu_sample.csv")
    p.add_argument("--n-rows", type=int, default=None)
    a = p.parse_args()
    df = convert(a.raw, a.out, a.n_rows)
    print(f"wrote {len(df)} rows x {len(df.columns)} cols -> {a.out}")
