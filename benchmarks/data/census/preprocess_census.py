"""Convert the raw UCI Census-Income (KDD) files into the encoded multitask
CSV consumed by ``benchmarks/datasets.build_census_multitask_dataset`` and
``examples/ranking/run_census.py``.

Semantics match the reference pipeline
(``/root/reference/examples/ranking/data/census-income/preprocess_census.py:1-92``):

- drop ``instance weight`` (per the census-income.names doc);
- two binary labels: ``income`` (1 if " 50000+.") is the main task and
  ``marital status`` (1 if " Never married") the auxiliary task, following
  the MMOE/PLE papers;
- 7 continuous features min-max scaled and rounded to 4 decimals, the other
  33 integer label-encoded (fit over train+test jointly).

    python preprocess_census.py --train census-income.data --test census-income.test --out-dir .
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

COL_NAMES = [
    "age", "class of worker", "industry code", "occupation code", "education", "wage per hour", "enrolled in edu inst last wk", "marital status", "major industry code", "major occupation code", "race", "hispanic origin", "sex", "member of a labor union", "reason for unemployment",
    "full or part time employment stat", "capital gains", "capital losses", "divdends from stocks", "tax filer status", "region of previous residence", "state of previous residence", "detailed household and family stat", "detailed household summary in household", "instance weight",
    "migration code-change in msa", "migration code-change in reg", "migration code-move within reg", "live in this house 1 year ago", "migration prev res in sunbelt", "num persons worked for employer", "family members under 18", "country of birth father", "country of birth mother",
    "country of birth self", "citizenship", "own business or self employed", "fill inc questionnaire for veterans admin", "veterans benefits", "weeks worked in year", "year", "income"
]
CONTINUOUS = ["age", "wage per hour", "capital gains", "capital losses", "divdends from stocks", "num persons worked for employer", "weeks worked in year"]


def convert(train_path: str, test_path: str, out_dir: str, sample_rows: int | None = None):
    train = pd.read_csv(train_path, header=None, names=COL_NAMES)
    test = pd.read_csv(test_path, header=None, names=COL_NAMES)
    n_train = len(train)
    data = pd.concat([train, test], axis=0).drop(columns=["instance weight"])

    data["income"] = (data["income"] == " 50000+.").astype(int)
    data["marital status"] = (data["marital status"] == " Never married").astype(int)

    for col in data.columns:
        if col in CONTINUOUS:
            lo, hi = data[col].min(), data[col].max()
            data[col] = ((data[col] - lo) / max(hi - lo, 1e-12)).round(4)
        elif col not in ("income", "marital status"):
            data[col], _ = pd.factorize(data[col], sort=True)

    df_train, df_test = data.iloc[:n_train], data.iloc[n_train:]
    half = len(df_test) // 2
    df_train.to_csv(os.path.join(out_dir, "census_income_train.csv"), index=False)
    df_test.iloc[:half].to_csv(os.path.join(out_dir, "census_income_val.csv"), index=False)
    df_test.iloc[half:].to_csv(os.path.join(out_dir, "census_income_test.csv"), index=False)
    if sample_rows:
        data.head(sample_rows).to_csv(os.path.join(out_dir, "census_income_sample.csv"), index=False)
    return data


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", default="./census-income.data")
    p.add_argument("--test", default="./census-income.test")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--sample-rows", type=int, default=120, help="also emit census_income_sample.csv with the first N rows")
    a = p.parse_args()
    df = convert(a.train, a.test, a.out_dir, a.sample_rows)
    print(f"processed {len(df)} rows x {len(df.columns)} cols -> {a.out_dir}")
